package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.{Crossing, FenceSeg, Fix, FixEv}

/** Batch-equivalence on a REPLAYED feed — the strongest check available
  * for the two live monitors without a driver oracle for streams (r9
  * verdict item 5): the full fixture feed is replayed through the
  * streaming operator in several micro-batches, and the complete output
  * must equal a batch computation over the same rows.
  *
  *  - stream_cpa is checked against a driver-side BRUTE-FORCE over all
  *    fix pairs (no grid bucketing at all) that mirrors the batch
  *    operator's clamped-solve arithmetic term by term — so both the
  *    3x3 neighbor-cell candidate generation and the CPA math are
  *    validated against an independent implementation;
  *  - stream_fence is checked against the batch kernel (lag-window
  *    segments + the exact-integer orientation SQL predicate — the
  *    geo_fence_crossings formula) evaluated over the whole replay.
  */
class StreamReplaySpec extends SparkSpecBase {

  // deterministic multi-user fixture: integer-hash walks, no RNG object
  private def h(k: Long): Long = {
    var z = k + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def frac(k: Long): Double = // in [0, 1)
    (h(k) >>> 11).toDouble / (1L << 53).toDouble

  test("stream_cpa over a replayed feed == brute force over all pairs") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // 8 users x 6 fixes over ~50 min in a 2x2-degree box, |v| <= 0.06
    // deg/min: every qualifying pair stays within one cell of its
    // counterpart, the operator's documented candidate scope
    val all = for {
      u <- 0 until 8
      k <- 0 until 6
    } yield Fix(
      user_id = u.toLong,
      ts_sec = 1000L + k * 600L + (h(u * 31 + k) & 0xFF),
      lat = 10.0 + 2.0 * frac(u * 101 + k * 7 + 1),
      lon = 20.0 + 2.0 * frac(u * 103 + k * 11 + 2),
      vlat = 0.12 * frac(u * 107 + k * 13 + 3) - 0.06,
      vlon = 0.12 * frac(u * 109 + k * 17 + 4) - 0.06)
    val batches = all.sortBy(_.ts_sec).grouped(12).toSeq

    val fixes = MemoryStream[Fix]
    // lateness far beyond the feed span: no watermark evictions, so the
    // streamed output must be the COMPLETE pair set
    val q = Streams.cpaStream(fixes.toDS(), maxKm = 100.0,
        bandSec = 900L, lateness = "2 hours")
      .writeStream.format("memory").queryName("cpa_replay")
      .outputMode("append").start()
    batches.foreach { b => fixes.addData(b: _*); q.processAllAvailable() }
    val streamed = spark.table("cpa_replay").collect().map { r =>
      (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
        r.getAs[java.sql.Timestamp]("ts_a").getTime / 1000,
        r.getAs[java.sql.Timestamp]("ts_b").getTime / 1000,
        r.getAs[Double]("t_cpa_min"), r.getAs[Double]("d_cpa_km"))
    }.toSet
    q.stop()

    // brute force, mirroring Streams.cpaStream's arithmetic term by term
    def r6(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
    def r3(v: Double) = java.math.BigDecimal.valueOf(v)
      .setScale(3, java.math.RoundingMode.HALF_UP).doubleValue
    val expected = (for {
      a <- all; b <- all
      if a.user_id < b.user_id
      if math.abs(b.ts_sec - a.ts_sec) <= 900L
      if math.abs(math.floor(a.lat) - math.floor(b.lat)) <= 1.0
      if math.abs(math.floor(a.lon) - math.floor(b.lon)) <= 1.0
    } yield {
      val kx = r6(math.cos(math.toRadians((a.lat + b.lat) / 2.0))) * 111.195
      val dx = (b.lon - a.lon) * kx
      val dy = (b.lat - a.lat) * 111.195
      val dvx = (b.vlon - a.vlon) * kx
      val dvy = (b.vlat - a.vlat) * 111.195
      val den = dvx * dvx + dvy * dvy
      val t = if (den <= 1e-12) 0.0
        else math.min(math.max(-(dx * dvx + dy * dvy) / den, 0.0), 30.0) + 0.0
      val d = math.sqrt(math.pow(dx + dvx * t, 2) + math.pow(dy + dvy * t, 2))
      (a.user_id, b.user_id, a.ts_sec, b.ts_sec, r3(t), r3(d), d)
    }).filter(_._7 <= 100.0)
      .map(x => (x._1, x._2, x._3, x._4, x._5, x._6)).toSet

    assert(expected.nonEmpty, "degenerate fixture: no qualifying pairs")
    assert(streamed == expected,
      s"stream-only: ${(streamed -- expected).take(3)}; " +
        s"batch-only: ${(expected -- streamed).take(3)}")
  }

  test("stream_fence over a replayed feed == batch lag-window kernel") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val S = 100000L
    val fences = Seq(
      FenceSeg(1, 10 * S, -2 * S, 10 * S, 2 * S),   // vertical at lon 10
      FenceSeg(2, 9 * S, 1 * S, 12 * S, 1 * S))     // horizontal at lat 1

    // 6 users x 10 fixes zig-zagging across lon 10 / lat 1 on whole-ish
    // 1e-5-exact coordinates; ts strictly increasing per user
    val all = for {
      u <- 0 until 6
      k <- 0 until 10
    } yield FixEv(
      user_id = u.toLong,
      event_id = (u * 100 + k).toLong,
      ts_sec = 5000L + k * 60L + u,
      lat = ((h(u * 7 + k * 3) % 400).toDouble / 100.0), // -3.99..3.99
      lon = 8.0 + ((h(u * 5 + k * 11 + 1) & 0x3FF).toDouble / 256.0)) // 8..12
    val batches = all.sortBy(e => (e.ts_sec, e.event_id)).grouped(15).toSeq

    val fixes = MemoryStream[FixEv]
    val q = Streams.fenceStream(fixes.toDS(), fences)
      .writeStream.format("memory").queryName("fence_replay")
      .outputMode("append").start()
    batches.foreach { b => fixes.addData(b: _*); q.processAllAvailable() }
    val streamed = spark.table("fence_replay").as[Crossing].collect().toSet
    q.stop()

    // batch kernel: lag-window segments per user ordered by
    // (ts_sec, event_id), then the exact-integer orientation predicate —
    // the geo_fence_crossings SQL, evaluated over the full replay
    val fenceDf = fences.toDF("fence", "ax", "ay", "bx", "by")
    def o(a: String, b: String, c: String, d: String, e: String, f: String) =
      s"sign(($c-$a)*($f-$b) - ($d-$b)*($e-$a))"
    val segs = all.toDF()
      .withColumn("qx", expr(s"CAST(floor(lon * 100000.0e0) AS BIGINT)"))
      .withColumn("qy", expr(s"CAST(floor(lat * 100000.0e0) AS BIGINT)"))
      .withColumn("px", expr(
        "lag(qx) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)"))
      .withColumn("py", expr(
        "lag(qy) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)"))
      .withColumn("e_from", expr(
        "lag(event_id) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)"))
      .withColumn("seg_ts", expr(
        "lag(ts_sec) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id)"))
      .filter(col("px").isNotNull)
    val expected = segs.crossJoin(broadcast(fenceDf))
      .filter(expr(
        s"${o("px", "py", "qx", "qy", "ax", "ay")} * ${o("px", "py", "qx", "qy", "bx", "by")} < 0 AND " +
          s"${o("ax", "ay", "bx", "by", "px", "py")} * ${o("ax", "ay", "bx", "by", "qx", "qy")} < 0"))
      .select(col("user_id"), col("e_from"), col("event_id").as("e_to"),
        col("fence"), col("seg_ts").as("ts_sec"))
      .as[Crossing].collect().toSet

    assert(expected.nonEmpty, "degenerate fixture: no crossings")
    assert(streamed == expected,
      s"stream-only: ${(streamed -- expected).take(3)}; " +
        s"batch-only: ${(expected -- streamed).take(3)}")
  }
}
