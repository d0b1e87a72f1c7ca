package graft

import org.apache.spark.sql.functions._

/** Specs for ts_zscore / ts_ewma / geo_proximity_pairs / emb_kmeans. */
class AnomalyGeoKmeansSpec extends SparkSpecBase {
  import spark.implicits._

  test("ts_zscore: flagged rows really deviate > 2.5 sigma") {
    val rows = run("ts_zscore").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(math.abs(z) > 2.5 && !z.isNaN && !z.isInfinite)
    }
  }

  test("ts_ewma: every reading smoothed; constant series is a fixpoint") {
    val df = run("ts_ewma").cache()
    assert(df.count() == Tables.events(spark, sf).count())
    // EWMA stays within the per-user min/max envelope (convexity)
    val bad = df.groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"))
      .join(df, "user_id")
      .filter($"ewma" < $"lo" - 1e-9 || $"ewma" > $"hi" + 1e-9)
      .count()
    assert(bad == 0)
    df.unpersist()
  }

  test("ts_ewma: first reading per user equals its own value") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts_sec", $"event_id")
    val firsts = run("ts_ewma")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    val off = firsts.filter(abs($"ewma" - $"value") > 1e-9).count()
    assert(off == 0)
  }

  test("geo_proximity_pairs: pairs are within 25km, same bucket, ordered") {
    val rows = run("geo_proximity_pairs").collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("dist_km") <= 25.0)
      assert(r.getAs[Long]("event_a") < r.getAs[Long]("event_b"))
    }
  }

  test("geo_proximity_pairs: no duplicate pairs from probe replication") {
    val df = run("geo_proximity_pairs")
    assert(df.count() == df.select("event_a", "event_b").distinct().count())
  }

  test("emb_kmeans: total assignment, k<=8 clusters, sizes reconcile") {
    val df = run("emb_kmeans").cache()
    val n = Tables.t(spark, sf, "embeddings").count()
    assert(df.count() == n)
    val k = df.select("cid").distinct().count()
    assert(k >= 2 && k <= 8)
    // cluster_size column agrees with actual group sizes
    val bad = df.groupBy("cid").agg(count(lit(1)).as("actual"),
      max("cluster_size").as("reported"), min("cluster_size").as("reported2"))
      .filter($"actual" =!= $"reported" || $"actual" =!= $"reported2")
      .count()
    assert(bad == 0)
    df.unpersist()
  }

  test("emb_kmeans: deterministic across runs") {
    val a = run("emb_kmeans").select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = run("emb_kmeans").select("vec_id", "cid").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
  }
}
