package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** r12: stream_soft_dedup's TTL is EVENT-time (watermark + event-time
  * timeout, the stream_cpa pattern). The previous ProcessingTimeTimeout
  * design was replay-nondeterministic AND livelocked any
  * processAllAvailable-driven harness (a configured processing-time
  * timeout makes the engine treat every batch as requiring another, so
  * "all available processed" never arrives — the r12 StreamBench hang).
  * This spec IS the regression: it completes (no livelock), counters
  * persist inside the ttl window, and a hash idle past the ttl is
  * evicted — its next copy restarts at copy_idx = 1.
  */
class SoftDedupTtlSpec extends SparkSpecBase {

  test("event-time ttl: counters live within the window, evict after it") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.Streams
    val in = MemoryStream[Streams.DocIn]
    val q = Streams.softDedupStream(in.toDS(), ttl = Some(3600L))
      .writeStream.format("memory").queryName("sdttl_out")
      .outputMode("append").start()
    // two copies of hash "aa" inside one hour of event time
    in.addData(Streams.DocIn(1L, "aa", 1000L), Streams.DocIn(2L, "aa", 1100L))
    q.processAllAvailable()
    // unrelated hash far in the future: watermark jumps past aa's ttl
    in.addData(Streams.DocIn(3L, "bb", 20000L))
    q.processAllAvailable()
    // aa returns after its idle eviction: the counter must restart
    in.addData(Streams.DocIn(4L, "aa", 20001L))
    q.processAllAvailable()
    val rows = spark.table("sdttl_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("content_hash"),
        r.getAs[Long]("copy_idx"))).sortBy(_._1)
    q.stop()
    assert(rows.toSeq == Seq((1L, "aa", 1L), (2L, "aa", 2L),
      (3L, "bb", 1L), (4L, "aa", 1L)),
      s"got ${rows.toSeq}")
  }

  test("late arrival below the watermark is dropped, not double-counted") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import graft.streaming.Streams
    val in = MemoryStream[Streams.DocIn]
    val q = Streams.softDedupStream(in.toDS(), ttl = Some(100L))
      .writeStream.format("memory").queryName("sdttl_late")
      .outputMode("append").start()
    in.addData(Streams.DocIn(1L, "cc", 50000L))
    q.processAllAvailable()
    // watermark is now 50000-100; an event at ts 10 is below it
    in.addData(Streams.DocIn(2L, "cc", 10L))
    q.processAllAvailable()
    val rows = spark.table("sdttl_late").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet == Set(1L),
      "sub-watermark arrival must be dropped by the watermark filter")
  }
}
