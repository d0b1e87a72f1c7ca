package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates — the 100 TB substitutes for exact distinct/
  * percentile (no DuckDB oracle: estimates are engine-specific).
  */
class ApproxSpec extends SparkSpecBase {

  test("approx_count_distinct within 5% of exact") {
    val li = Tables.t(spark, sf, "lineitem")
    val exact = li.select(countDistinct("l_orderkey")).head.getLong(0)
    val approx = li.select(approx_count_distinct("l_orderkey", 0.02)).head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"$approx vs $exact")
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.t(spark, sf, "orders")
    val approxMed = o.select(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head.getDouble(0)
    val sorted = o.select("o_totalprice").orderBy("o_totalprice").collect().map(_.getDouble(0))
    val exactMed = sorted(sorted.length / 2)
    assert(math.abs(approxMed - exactMed) / exactMed < 0.05)
  }
}

class StreamingDedupSpec extends SparkSpecBase {
  import graft.streaming.Streams

  test("stream_enrich joins events to trailing-hour reference records") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val ev = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val rf = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long, String)]
    val refs = rf.toDS().toDF("ref_user_id", "ref_sec", "ref_tag")
    val q = Streams.enrichStream(ev.toDS().toDF(), refs)
      .select("event_id", "ref_tag")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    ev.addData(Streams.Ev(1, 7200, 5, "view", 1.0))   // event at t=7200
    rf.addData((5L, 7000L, "in-window"),              // 200s before: joins
      (5L, 1000L, "too-old"),                         // > 1h before: no
      (9L, 7100L, "other-user"))                      // key mismatch: no
    q.processAllAvailable()
    val rows = spark.table("enrich_out").collect()
    q.stop()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet == Set((1L, "in-window")))
  }

  test("stream_sessions groups by gap and emits on watermark close") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val q = Streams.sessionStream(in.toDS().toDF())
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    in.addData(
      Streams.Ev(1, 1000, 7, "a", 1.0), Streams.Ev(2, 1600, 7, "a", 2.0), // session 1
      Streams.Ev(3, 9000, 7, "a", 3.0),                                   // session 2 (gap > 30m)
      Streams.Ev(4, 1200, 8, "a", 4.0))                                   // other user
    q.processAllAvailable()
    val rows = spark.table("sess_out").collect()
    q.stop()
    assert(rows.length == 3)
    val u7 = rows.filter(_.getAs[Long]("user_id") == 7)
    assert(u7.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("streaming file sink writes exactly-once with checkpoint") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = "target/tmp-streaming/sink-" + System.nanoTime()
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val q = in.toDS().toDF()
      .writeStream.format("parquet")
      .option("path", s"$dir/data")
      .option("checkpointLocation", s"$dir/chk")
      .outputMode("append").start()
    in.addData(Streams.Ev(1, 100, 1, "a", 1.0), Streams.Ev(2, 200, 1, "b", 2.0))
    q.processAllAvailable()
    in.addData(Streams.Ev(3, 300, 2, "c", 3.0))
    q.processAllAvailable()
    q.stop()
    val out = spark.read.parquet(s"$dir/data")
    assert(out.count() == 3)
    assert(out.select("event_id").distinct().count() == 3)
  }

  test("stream_dedup drops re-delivered events across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val q = Streams.dedupStream(in.toDS().toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(Streams.Ev(1, 100, 7, "view", 1.0), Streams.Ev(2, 200, 7, "click", 2.0))
    q.processAllAvailable()
    in.addData(Streams.Ev(1, 100, 7, "view", 1.0), // re-delivery
      Streams.Ev(3, 300, 8, "view", 3.0))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("stream_soft_dedup counts copies per content hash across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.DocIn]
    val q = Streams.softDedupStream(in.toDS(), ttl = None)
      .writeStream.format("memory").queryName("softdedup_out")
      .outputMode("append").start()
    in.addData(Streams.DocIn(1, "aaa"), Streams.DocIn(2, "bbb"),
      Streams.DocIn(3, "aaa"))
    q.processAllAvailable()
    in.addData(Streams.DocIn(4, "aaa"), Streams.DocIn(5, "bbb"))
    q.processAllAvailable()
    val out = spark.table("softdedup_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("content_hash"),
        r.getAs[Long]("copy_idx"))).sortBy(_._1)
    q.stop()
    // copy index increments within AND across batches, per hash
    assert(out.toSeq == Seq((1L, "aaa", 1L), (2L, "bbb", 1L),
      (3L, "aaa", 2L), (4L, "aaa", 3L), (5L, "bbb", 2L)))
  }

  test("stream_hampel repairs a spike at 3-sample latency across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streams.Ev]
    val q = Streams.hampelStream(in.toDS())
      .writeStream.format("memory").queryName("hampel_out")
      .outputMode("append").start()
    // spike at event 4; first batch fills only 5 of the 7-slot window
    in.addData((1 to 5).map(i =>
      Streams.Ev(i, i * 60L, 9, "t", if (i == 4) 100.0 else 1.0)): _*)
    q.processAllAvailable()
    assert(spark.table("hampel_out").count() == 0) // window not full yet
    in.addData(Streams.Ev(6, 360, 9, "t", 1.0), Streams.Ev(7, 420, 9, "t", 1.0),
      Streams.Ev(8, 480, 9, "t", 1.0))
    q.processAllAvailable()
    val out = spark.table("hampel_out").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Boolean]("is_outlier"),
        r.getAs[Double]("repaired"))).sortBy(_._1)
    q.stop()
    // windows centered at events 4 and 5 emitted; the spike is repaired
    // to the local median, its clean neighbor passes through
    assert(out.toSeq == Seq((4L, true, 1.0), (5L, false, 1.0)))
  }
}
