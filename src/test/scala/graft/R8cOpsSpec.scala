package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the third R8 batch: AR(2) fit, Welch's t, hex
  * binning, shingle novelty.
  */
class R8cOpsSpec extends SparkSpecBase {

  test("ts_ar2_forecast: Yule-Walker identities hold per entity") {
    val df = run("ts_ar2_forecast").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      val (r1, r2) = (r.getAs[Double]("r1"), r.getAs[Double]("r2"))
      val (p1, p2) = (r.getAs[Double]("phi1"), r.getAs[Double]("phi2"))
      // the fitted coefficients satisfy the Yule-Walker equations
      assert(math.abs(p1 + p2 * r1 - r1) < 1e-9)
      assert(math.abs(p1 * r1 + p2 - r2) < 1e-9)
      assert(math.abs(r1) <= 1.0 && math.abs(r2) <= 1.0)
    }
  }

  test("ts_welch_ab: t statistic matches an imperative recompute") {
    val df = run("ts_welch_ab").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    def vals(t: String) = Tables.events(spark, sf)
      .filter(col("user_id") === u && col("event_type") === t)
      .select(expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(_.getLong(0).toDouble)
    val (a, b) = (vals("purchase"), vals("view"))
    def mv(x: Array[Double]) = {
      val m = x.sum / x.length
      (m, x.map(v => (v - m) * (v - m)).sum / (x.length - 1))
    }
    val ((m1, v1), (m2, v2)) = (mv(a), mv(b))
    val t = (m1 - m2) / math.sqrt(v1 / a.length + v2 / b.length)
    val got = df.filter(col("user_id") === u).head
    assert(math.abs(got.getAs[Double]("t_stat") - t) < 1e-6)
    assert(got.getAs[Long]("n1") == a.length && got.getAs[Long]("n2") == b.length)
  }

  test("geo_hexbin: bins partition the points; centers within one hex radius") {
    val df = run("geo_hexbin").cache()
    val total = df.agg(sum(col("n_points"))).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // cube-round invariant: every point's hex center is the NEAREST hex
    // center in axial distance; equivalently the point sits within the
    // hex, i.e. axial distance to center < 1 (in hex units)
    val h = 2.5
    df.collect().foreach { r =>
      val lat = r.getAs[Double]("mean_lat"); val lon = r.getAs[Double]("mean_lon")
      val q = (lon / math.sqrt(3.0) - lat / 3.0) / h
      val rr = (2.0 * lat / 3.0) / h
      val dq = q - r.getAs[Long]("hq"); val dr = rr - r.getAs[Long]("hr")
      val ds = -dq - dr
      val dist = (math.abs(dq) + math.abs(dr) + math.abs(ds)) / 2
      assert(dist < 1.0 + 1e-6) // member mean stays inside/near the cell
    }
  }

  test("doc_ngram_novelty: doc with smallest id is fully novel; ratios bounded") {
    val df = run("doc_ngram_novelty").cache()
    assert(df.count() > 0)
    val first = df.orderBy(col("doc_id")).head
    assert(first.getAs[Double]("novelty") == 1.0)
    df.collect().foreach { r =>
      val nv = r.getAs[Double]("novelty")
      assert(nv >= 0.0 && nv <= 1.0)
      assert(r.getAs[Long]("n_novel") <= r.getAs[Long]("n_shingles"))
    }
  }
}
