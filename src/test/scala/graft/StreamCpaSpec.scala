package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.streaming.Streams.Fix

/** stream_cpa: the live closest-point-of-approach monitor (streaming
  * twin of geo_cpa / odin_adsb's closing-rate watch). Pins: converging
  * neighbors alarm with the batch operator's arithmetic; far-apart or
  * out-of-band fixes never pair; the pair set matches the batch formula
  * computed by hand.
  */
class StreamCpaSpec extends SparkSpecBase {

  test("converging pair alarms; distant and out-of-band fixes do not") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[Fix]
    val q = Streams.cpaStream(fixes.toDS(), maxKm = 100.0, bandSec = 900L)
      .writeStream.format("memory").queryName("cpa_out")
      .outputMode("append").start()
    // user 1 and 2: same cell (10.x, 20.x), closing head-on at
    // 0.1 deg lat / min toward each other => d_cpa ~ 0
    // user 3: same time band but ~30 degrees away (different cell)
    // user 4: same cell as 1 but 2 hours later (outside the join band)
    fixes.addData(
      Fix(1L, 1000L, 10.2, 20.5, 0.05, 0.0),
      Fix(2L, 1100L, 10.8, 20.5, -0.05, 0.0),
      Fix(3L, 1050L, 40.2, 50.5, 0.0, 0.0),
      Fix(4L, 8200L, 10.4, 20.5, 0.0, 0.0))
    q.processAllAvailable()
    val rows = spark.table("cpa_out").collect()
    q.stop()
    assert(rows.length == 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Long]("user_a") == 1L && r.getAs[Long]("user_b") == 2L)
    // hand-computed batch arithmetic: dy = 0.6*111.195 km,
    // dvy = -0.1*111.195 km/min => t* = 6 min, d* = 0
    assert(r.getAs[Double]("t_cpa_min") == 6.0)
    assert(r.getAs[Double]("d_cpa_km") == 0.0)
  }

  test("cross-cell neighbors pair through the 3x3 probe replication") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[Fix]
    val q = Streams.cpaStream(fixes.toDS(), maxKm = 100.0)
      .writeStream.format("memory").queryName("cpa_out2")
      .outputMode("append").start()
    // adjacent 1-degree cells: 10.95 vs 11.05 lat — only reachable via
    // the neighbor replication (home cells differ)
    fixes.addData(
      Fix(5L, 2000L, 10.95, 20.5, 0.0, 0.0),
      Fix(6L, 2060L, 11.05, 20.5, 0.0, 0.0))
    q.processAllAvailable()
    val rows = spark.table("cpa_out2").collect()
    q.stop()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("user_a") == 5L && r.getAs[Long]("user_b") == 6L)
    // static pair: t* = 0, d* = 0.1 deg * 111.195 = 11.12 km (rounded 3)
    assert(r.getAs[Double]("t_cpa_min") == 0.0)
    assert(math.abs(r.getAs[Double]("d_cpa_km") - 11.12) < 0.01)
  }

  test("density cap bounds an overdense cell; sparse cells unaffected") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[Fix]
    // cap 4: 10 static entities crowd one (cell, 30-min bucket); two
    // more converge in a far-away sparse cell
    val hot = (0 until 10).map(i =>
      Fix(10L + i, 1000L + i * 10L, 10.1 + i * 0.02, 20.5, 0.0, 0.0))
    val sparse = Seq(
      Fix(100L, 1000L, -30.2, 50.5, 0.05, 0.0),
      Fix(101L, 1100L, -30.8 + 1.0, 50.5, -0.05, 0.0))
    val q = Streams.cpaStream(fixes.toDS(), maxKm = 100.0, cellCap = 4)
      .writeStream.format("memory").queryName("cpa_cap")
      .outputMode("append").start()
    fixes.addData(hot ++ sparse: _*)
    q.processAllAvailable()
    val rows = spark.table("cpa_cap").collect()
    q.stop()
    val hotPairs = rows.filter(_.getAs[Long]("user_a") < 100L)
    val sparsePairs = rows.filter(_.getAs[Long]("user_a") >= 100L)
    // first 4 distinct home users (10..13, ts order) pair freely: C(4,2);
    // users 14..19 are rejected, so NO pair touches them
    assert(hotPairs.length == 6, rows.mkString("; "))
    assert(hotPairs.forall(r => r.getAs[Long]("user_b") <= 13L))
    // the sparse cell is byte-for-byte unaffected by the hot cell
    assert(sparsePairs.length == 1)
    assert(sparsePairs.head.getAs[Long]("user_a") == 100L
      && sparsePairs.head.getAs[Long]("user_b") == 101L)
  }

  test("overflow side-output reports each rejected home fix") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val fixes = MemoryStream[Fix]
    val hot = (0 until 10).map(i =>
      Fix(10L + i, 1000L + i * 10L, 10.1 + i * 0.02, 20.5, 0.0, 0.0))
    val q = Streams.cpaOverflowStream(fixes.toDS(), cellCap = 4)
      .writeStream.format("memory").queryName("cpa_over")
      .outputMode("append").start()
    fixes.addData(hot: _*)
    q.processAllAvailable()
    val rows = spark.table("cpa_over").collect()
    q.stop()
    // 10 entities, cap 4 => 6 rejected home fixes, all in tb 0 / (10,20)
    assert(rows.length == 6, rows.mkString("; "))
    assert(rows.map(_.getAs[Long]("user_id")).sorted.toSeq
      == (14L to 19L).toSeq)
    assert(rows.forall(r => r.getAs[Long]("tb") == 0L
      && r.getAs[Long]("cl") == 10L && r.getAs[Long]("cn") == 20L))
  }
}
