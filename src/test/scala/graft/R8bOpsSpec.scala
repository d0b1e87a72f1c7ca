package graft

import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Semantics checks for the second R8 batch: LTTB downsampling, DEFLATE
  * compressibility, integral images, stream-stream interval join.
  */
class R8bOpsSpec extends SparkSpecBase {

  test("ts_lttb: endpoints pinned, one point per bucket, max-area winner") {
    val df = run("ts_lttb").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    val mine = df.filter(col("user_id") === u).collect()
    val pts = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("event_id"), col("ts_sec"),
        expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nb = (pts.length + 29) / 30
    // one selected point per bucket, first/last pinned to the endpoints
    assert(mine.length == nb)
    assert(mine.head.getAs[Long]("event_id") == pts.head._1)
    assert(mine.last.getAs[Long]("event_id") == pts.last._1)
    // interior winner beats every bucket-mate on triangle area
    if (nb > 2) {
      val t0 = pts.map(_._2).min
      val buckets = pts.zipWithIndex.groupBy(_._2 / 30)
      def avg(b: Int) = {
        val g = buckets(b).map(_._1)
        (g.map(p => (p._2 - t0).toDouble).sum / g.length,
          g.map(_._3.toDouble).sum / g.length)
      }
      val b = 1
      val (tp, vp) = avg(0); val (tn, vn) = avg(2)
      def area(p: (Long, Long, Long)) =
        math.abs((tp - tn) * (p._3 - vp) - (tp - (p._2 - t0)) * (vn - vp))
      val winner = mine(1).getAs[Long]("event_id")
      val wPt = buckets(b).map(_._1).find(_._1 == winner).get
      buckets(b).map(_._1).foreach { p =>
        assert(area(p) <= area(wPt) + 1e-6)
      }
    }
  }

  test("doc_compress_ratio: repetitive text deflates far below random") {
    val df = run("doc_compress_ratio").cache()
    val n = Tables.t(spark, sf, "documents").count()
    assert(df.count() == n)
    df.collect().foreach { r =>
      // order-0 entropy estimate: 0 < H/8 <= log2(256)/8 = 1
      val ratio = r.getAs[Double]("est_ratio")
      assert(ratio > 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_distinct_chars") > 0)
      assert(Set("boilerplate", "ok", "gibberish")(r.getAs[String]("flag")))
    }
    // direct codec sanity: repeated text compresses much better than noise
    val rep = ("the quick brown fox " * 100).getBytes("UTF-8")
    val rnd = Array.tabulate[Byte](2000) { i =>
      var z = i + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      ((z ^ (z >>> 31)) & 0xff).toByte
    }
    val rr = graft.functions.Compress.deflateLen(rep).toDouble / rep.length
    val rn = graft.functions.Compress.deflateLen(rnd).toDouble / rnd.length
    assert(rr < 0.05 && rn > 0.5)
  }

  test("mm_integral_image: box sums via four corner lookups") {
    val df = run("mm_integral_image").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("doc_id")
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === u).head.getAs[String]("text")
    val px = Array.tabulate(16, 16)((y, x) => text.charAt(y * 16 + x).toLong)
    val ii = df.filter(col("doc_id") === u).collect()
      .map(r => ((r.getAs[Number]("x").intValue,
        r.getAs[Number]("y").intValue), r.getAs[Long]("ii"))).toMap
    // every emitted corner equals the brute-force rectangle sum
    ii.foreach { case ((x, y), v) =>
      val brute = (0 to y).flatMap(yy => (0 to x).map(xx => px(yy)(xx))).sum
      assert(v == brute)
    }
    // box sum via inclusion-exclusion between two emitted corners
    val a = ii((7, 7)); val b = ii((15, 15))
    val c = ii((15, 7)); val dd = ii((7, 15))
    val box = (8 to 15).flatMap(yy => (8 to 15).map(xx => px(yy)(xx))).sum
    assert(b - c - dd + a == box)
  }

  test("stream_interval_join: acks match within horizon, state bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val cmds = MemoryStream[Ev]
    val acks = MemoryStream[Ev]
    val q = Streams.intervalJoinStream(cmds.toDS(), acks.toDS(),
      horizonSec = 600L)
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    cmds.addData(Ev(1, 1000, 7, "cmd", 1.0), Ev(2, 5000, 7, "cmd", 2.0),
      Ev(3, 1000, 8, "cmd", 3.0))
    acks.addData(
      Ev(10, 1200, 7, "ack", 1.5), // matches cmd 1 (dt=200)
      Ev(11, 1700, 7, "ack", 1.7), // outside horizon of cmd 1? dt=700 -> no
      Ev(12, 5300, 7, "ack", 2.5), // matches cmd 2
      Ev(13, 900, 8, "ack", 3.5))  // before cmd 3 -> no
    q.processAllAvailable()
    val rows = spark.table("ij_out").collect()
    q.stop()
    val got = rows.map(r => (r.getAs[Long]("cmd_id"), r.getAs[Long]("ack_id"),
      r.getAs[Long]("latency_sec"))).toSet
    assert(got == Set((1L, 10L, 200L), (2L, 12L, 300L)))
  }
}
