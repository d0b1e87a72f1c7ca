package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the R7 time-series batch: M4 downsampling,
  * prominence-filtered peak detection, and the Western-Electric SPC
  * rule battery.
  */
class SpcM4Spec extends SparkSpecBase {

  test("ts_m4: frames preserve extremes and bounds hold") {
    val df = run("ts_m4").cache()
    assert(df.count() > 0)
    // every frame's min <= first/last <= max
    assert(df.filter(col("v_min") > col("v_first") ||
      col("v_min") > col("v_last") || col("v_max") < col("v_first") ||
      col("v_max") < col("v_last")).count() == 0)
    // frame sizes are 1..16 and all but the per-user tail are exactly 16
    assert(df.filter(col("n_pts") < 1 || col("n_pts") > 16).count() == 0)
    val ragged = df.filter(col("n_pts") =!= 16)
    val perUserRagged = ragged.groupBy("user_id").count()
      .filter(col("count") > 1).count()
    assert(perUserRagged == 0, "at most one ragged tail frame per user")
    // global max of the series survives downsampling exactly
    val rawMax = Tables.events(spark, sf)
      .agg(max(expr("CAST(round(value*100) AS BIGINT)"))).head.getLong(0)
    val m4Max = df.agg(max(expr("CAST(round(v_max*100) AS BIGINT)")))
      .head.getLong(0)
    assert(rawMax == m4Max)
    // time ordering within a frame: t_first <= t_min/t_max <= t_last
    assert(df.filter(col("t_first") > col("t_last")).count() == 0)
  }

  test("ts_peak_prominence: peaks beat both flanks by the floor") {
    val df = run("ts_peak_prominence").cache()
    assert(df.count() > 0)
    assert(df.filter(col("prominence") < 0.5).count() == 0)
    // cross-check one peak against the raw series neighborhood
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("ts_sec"), col("event_id"),
        expr("CAST(round(value*100) AS BIGINT)").as("vc"))
    val peak = df.head
    val (u, t) = (peak.getAs[Long]("user_id"), peak.getAs[Long]("ts_sec"))
    val series = ev.filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .collect().map(r => (r.getAs[Long]("ts_sec"), r.getAs[Long]("vc")))
    val i = series.indexWhere(_._1 == t)
    assert(i >= 3 && i < series.length - 3)
    val v = series(i)._2
    assert((1 to 3).forall(k => v > series(i - k)._2 && v > series(i + k)._2))
  }

  test("ts_spc_rules: counts bounded by points and rule-3 sanity") {
    val df = run("ts_spc_rules").cache()
    assert(df.count() > 0)
    Seq("r1_beyond3", "r2_run9", "r3_trend6", "r4_alt14").foreach { c =>
      assert(df.filter(col(c) < 0 || col(c) > col("n_points")).count() == 0, c)
    }
    // recompute rule 3 for the densest entity imperatively
    val top = df.orderBy(col("n_points").desc).head
    val u = top.getAs[Long]("user_id")
    val vals = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(_.getLong(0))
    val inc = vals.sliding(2).map { case Array(a, b) =>
      java.lang.Long.signum(b - a)
    }.toArray
    // a row fires when the trailing 5 diffs are all +1 (or all -1)
    var hits = 0
    for (j <- 4 until inc.length) {
      val w = inc.slice(j - 4, j + 1)
      if (w.forall(_ == 1) || w.forall(_ == -1)) hits += 1
    }
    assert(top.getAs[Long]("r3_trend6") == hits)
  }
}
