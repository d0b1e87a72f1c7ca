package graft

import graft.functions.GeoFunctions
import graft.plans.HaversineBBoxRule
import org.apache.spark.sql.functions._

/** The bbox-injection optimizer rule: soundness (never drops a matching
  * row), sargability (the injected ranges reach parquet PushedFilters —
  * the entire point), pole/antimeridian guards, idempotency.
  */
class HaversineBBoxRuleSpec extends SparkSpecBase {

  private lazy val ruleOn: Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ HaversineBBoxRule

  private def pts = {
    import spark.implicits._
    (0 until 4000).map { i =>
      val lat = (i * 37 % 1600) / 10.0 - 80.0
      val lon = (i * 91 % 3600) / 10.0 - 180.0
      (i.toLong, lat, lon)
    }.toDF("id", "lat", "lon")
  }

  test("radius filter results are identical with and without the rule") {
    ruleOn
    val base = pts.cache()
    val cond = GeoFunctions.haversine_km(
      col("lat"), col("lon"), lit(37.0), lit(-122.0)) <= lit(500.0)
    val expected = base.collect().filter { r =>
      graft.functions.GeoMath.haversineKm(
        r.getDouble(1), r.getDouble(2), 37.0, -122.0) <= 500.0
    }.map(_.getLong(0)).toSet
    val got = base.filter(cond).collect().map(_.getLong(0)).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the optimized plan carries the injected lat range
    val opt = base.filter(cond).queryExecution.optimizedPlan.toString
    assert(opt.contains("lat#") && opt.contains(">=") && opt.contains("<="))
  }

  import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, Expression, GreaterThanOrEqual, LessThanOrEqual, Literal => CLit}
  import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}

  private def rangeConjuncts(df: org.apache.spark.sql.DataFrame,
      name: String): Int = {
    def split(e: Expression): Seq[Expression] = e match {
      case And(l, r) => split(l) ++ split(r)
      case x => Seq(x)
    }
    df.queryExecution.optimizedPlan
      .collect { case LFilter(c, _) => c }
      .flatMap(split)
      .count {
        case GreaterThanOrEqual(a: AttributeReference, _: CLit) => a.name == name
        case LessThanOrEqual(a: AttributeReference, _: CLit) => a.name == name
        case _ => false
      }
  }

  test("injected ranges reach the parquet scan as pushed filters") {
    ruleOn
    val dir = java.nio.file.Files.createTempDirectory("graft_bbox").toString + "/pts"
    pts.write.mode("overwrite").parquet(dir)
    val scan = spark.read.parquet(dir)
      .filter(GeoFunctions.haversine_km(
        col("lat"), col("lon"), lit(37.0), lit(-122.0)) <= lit(50.0))
    val physical = scan.queryExecution.executedPlan.toString
    // without the rule the haversine expression is opaque and
    // PushedFilters is empty; with it the lat (and lon) ranges push down
    assert(physical.contains("PushedFilters: [GreaterThanOrEqual(lat"))
  }

  test("pole and antimeridian guards drop only the unsafe longitude bound") {
    ruleOn
    // near-pole center: longitude bound would be unsound, latitude stays
    val nearPole = pts.filter(GeoFunctions.haversine_km(
      col("lat"), col("lon"), lit(89.5), lit(0.0)) <= lit(200.0))
    assert(rangeConjuncts(nearPole, "lat") == 2)
    assert(rangeConjuncts(nearPole, "lon") == 0)
    // normal mid-latitude query carries all four bounds
    val normal = pts.filter(GeoFunctions.haversine_km(
      col("lat"), col("lon"), lit(37.0), lit(-122.0)) <= lit(50.0))
    assert(rangeConjuncts(normal, "lat") == 2)
    assert(rangeConjuncts(normal, "lon") == 2)
    // antimeridian-crossing box: latitude bound only, results exact
    val cross = pts.filter(GeoFunctions.haversine_km(
      col("lat"), col("lon"), lit(0.0), lit(179.9)) <= lit(100.0))
    assert(rangeConjuncts(cross, "lon") == 0)
    val exact = pts.collect().filter(r => graft.functions.GeoMath
      .haversineKm(r.getDouble(1), r.getDouble(2), 0.0, 179.9) <= 100.0)
      .map(_.getLong(0)).toSet
    assert(cross.collect().map(_.getLong(0)).toSet == exact)
  }

  test("the rule is idempotent under repeated application") {
    val cond = GeoFunctions.haversine_km(
      col("lat"), col("lon"), lit(10.0), lit(10.0)) <= lit(100.0)
    val once = HaversineBBoxRule(pts.filter(cond).queryExecution.analyzed)
    val twice = HaversineBBoxRule(once)
    assert(once.toString == twice.toString)
  }
  test("geodesic radius predicates gain the same sargable box") {
    ruleOn
    // cache so ConvertToLocalRelation cannot fold the filter away before
    // the plan is inspected (same reason the earlier tests cache)
    val base = pts.cache()
    base.count()
    val g = base.filter(GeoFunctions.geodesic_km(
      col("lat"), col("lon"), lit(37.0), lit(-122.0)) <= lit(500.0))
    assert(rangeConjuncts(g, "lat") == 2)
    assert(rangeConjuncts(g, "lon") == 2)
    // soundness: optimized result equals the direct per-row evaluation
    val exact = base.collect().filter { r =>
      graft.functions.GeoMath.vincentyKm(
        r.getDouble(1), r.getDouble(2), 37.0, -122.0) <= 500.0
    }.map(_.getLong(0)).toSet
    assert(g.collect().map(_.getLong(0)).toSet == exact)
    assert(exact.nonEmpty)
  }
}
