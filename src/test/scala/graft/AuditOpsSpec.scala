package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the third R7 batch: weighted median, KDE
  * smoothing, cluster purity.
  */
class AuditOpsSpec extends SparkSpecBase {

  test("q47_weighted_median: half the volume trades at or below it") {
    val df = run("q47_weighted_median").cache()
    assert(df.count() > 0)
    val li = Tables.t(spark, sf, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_extendedprice*100) AS BIGINT)").as("pc"),
        expr("CAST(round(l_quantity*100) AS BIGINT)").as("qc"))
    df.collect().foreach { r =>
      val (f, st) = (r.getString(0), r.getString(1))
      val wm = math.round(r.getAs[Double]("weighted_median_price") * 100)
      val g = li.filter(col("l_returnflag") === f && col("l_linestatus") === st)
      val tot = g.agg(sum("qc")).head.getLong(0)
      val below = g.filter(col("pc") <= wm).agg(sum("qc")).head.getLong(0)
      val strictlyBelow = g.filter(col("pc") < wm).agg(sum("qc"))
        .head.getLong(0)
      assert(below * 2 >= tot, s"$f/$st: median too low")
      assert(strictlyBelow * 2 < tot, s"$f/$st: median too high")
    }
  }

  test("geo_kde_smooth: kernel mass is conserved (sum sm16 = 16 x points)") {
    val df = run("geo_kde_smooth").cache()
    val events = Tables.events(spark, sf).count()
    val total = df.agg(sum("sm16")).head.getLong(0)
    assert(total == 16L * events)
    // raw counts reconcile too
    assert(df.agg(sum("n_raw")).head.getLong(0) == events)
    assert(df.filter(col("density") < 0).count() == 0)
  }

  test("emb_cluster_purity: partition of the store, purity in (0,1]") {
    val df = run("emb_cluster_purity").cache()
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(df.agg(sum("n_vecs")).head.getLong(0) == n)
    assert(df.filter(col("purity") <= 0.0 || col("purity") > 1.0).count() == 0)
    assert(df.filter(col("n_major") > col("n_vecs")).count() == 0)
    // label-seeded centroids must classify their own label decently:
    // majority label should equal the cell for most cells
    val agree = df.filter(col("major_label") === col("cell")).count()
    assert(agree * 2 > df.count(), s"only $agree cells self-majoritized")
  }
}
