package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the R7 geo batch: tile pyramid conservation,
  * rhumb-vs-great-circle inequality, IDW convexity.
  */
class GeoPyramidSpec extends SparkSpecBase {

  test("geo_tile_pyramid: every level partitions the point set") {
    val df = run("geo_tile_pyramid").cache()
    val total = Tables.events(spark, sf).count()
    val perLevel = df.groupBy("z").agg(sum("n_points").as("n")).collect()
    assert(perLevel.length == 7)
    perLevel.foreach(r => assert(r.getAs[Long]("n") == total, s"level ${r.get(0)}"))
    // parent tile count == sum of its children (shift level 10 up one)
    val child = df.filter(col("z") === 10)
      .groupBy((col("tx") / 2).cast("long").as("tx"),
        (col("ty") / 2).cast("long").as("ty"))
      .agg(sum("n_points").as("cn"))
    val parent = df.filter(col("z") === 9)
      .select(col("tx"), col("ty"), col("n_points").as("pn"))
    val mism = parent.join(child, Seq("tx", "ty"), "full")
      .filter(col("pn").isNull || col("cn").isNull || col("pn") =!= col("cn"))
    assert(mism.count() == 0)
  }

  test("geo_rhumb: loxodrome is never shorter than the great circle") {
    val df = run("geo_rhumb").cache()
    assert(df.count() > 0)
    assert(df.filter(col("rhumb_km") < col("gc_km") - 0.01).count() == 0)
    assert(df.filter(col("rhumb_brg") < 0 || col("rhumb_brg") >= 360.0)
      .count() == 0)
    // same-point legs (if any) have both distances 0
    assert(df.filter(col("gc_km") === 0.0 && col("rhumb_km") > 0.01)
      .count() == 0)
  }

  test("geo_idw: estimate stays inside the station value hull") {
    val df = run("geo_idw").cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_stations") =!= 10).count() == 0)
    // station values are s_suppkey*31 % 100 -> [0, 99]
    assert(df.filter(col("idw_est") < 0.0 || col("idw_est") > 99.0)
      .count() == 0)
  }
}
