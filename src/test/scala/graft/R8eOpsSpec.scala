package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the fifth R8 batch: hillshade, incremental agg
  * maintenance, audio VAD, CDC chunking, coverage gaps.
  */
class R8eOpsSpec extends SparkSpecBase {

  test("geo_hillshade: shade bounded and brightest facing the sun") {
    // 4-neighbor stencil occupancy needs the denser sf0.01 grid
    val df = SparkEntry.queries("geo_hillshade")(spark,
      "/root/testdata/sf0.01").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      val s = r.getAs[Double]("shade")
      assert(s >= 0.0 && s <= 255.01)
      // flat terrain shades to 255*cos(45°)
      if (r.getAs[Double]("dzdx") == 0.0 && r.getAs[Double]("dzdy") == 0.0)
        assert(math.abs(s - 255.0 * math.cos(math.toRadians(45))) < 0.01)
    }
  }

  test("q50_incremental_agg: merged partials equal a full rescan") {
    val df = run("q50_incremental_agg").cache()
    assert(df.count() > 0)
    val full = Tables.t(spark, sf, "orders")
      .filter(col("o_orderdate") < "1998-03-01")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(expr("CAST(o_totalprice AS DECIMAL(12,2))")).cast("double")
          .as("rev"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    df.collect().foreach { r =>
      val k = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("cnt_total") == full(k)._1)
      assert(math.abs(r.getAs[Double]("rev_total") - full(k)._2) < 1e-6)
      assert(r.getAs[Long]("cnt_base") + r.getAs[Long]("cnt_delta")
        == r.getAs[Long]("cnt_total"))
    }
  }

  test("mm_audio_vad: segments are maximal runs of loud frames") {
    val df = run("mm_audio_vad").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("doc_id")
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === u).head.getAs[String]("text")
    val nFrames = text.length / 64
    val loud = (0 until nFrames).filter { f =>
      val e = (0 until 64).map { j =>
        val s0 = text.charAt(f * 64 + j).toInt - 128; s0 * s0
      }.sum
      e > 30000
    }.toSet
    // reconstruct segments imperatively
    val segs = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    var start = -1
    for (f <- 0 until nFrames) {
      if (loud(f) && start < 0) start = f
      if ((!loud(f) || f == nFrames - 1) && start >= 0) {
        val end = if (loud(f)) f else f - 1
        if (end - start + 1 >= 2) segs += ((start.toLong, end.toLong))
        start = -1
      }
    }
    val got = df.filter(col("doc_id") === u)
      .select(col("seg_start"), col("seg_end"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == segs.toSet)
  }

  test("doc_cdc_chunks: chunks tile the document; identical docs share chunks") {
    val df = run("doc_cdc_chunks").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("doc_id")
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === u).head.getAs[String]("text")
    val mine = df.filter(col("doc_id") === u)
      .orderBy(col("chunk_idx")).collect()
    // chunks cover [1, len] contiguously
    assert(mine.head.getAs[Int]("start") == 1)
    var expectStart = 1L
    mine.foreach { r =>
      assert(r.getAs[Int]("start").toLong == expectStart)
      expectStart += r.getAs[Int]("clen").toLong
    }
    assert(expectStart == text.length + 1)
    // md5 really is the chunk digest
    val r0 = mine.head
    val chunk = text.substring(0, r0.getAs[Int]("clen"))
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(chunk.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r0.getAs[String]("chunk_md5") == md)
  }

  test("geo_coverage_gap: worst-served ranking is genuine") {
    val df = run("geo_coverage_gap").cache()
    assert(df.count() > 0 && df.count() <= 20)
    val ds = df.collect().map(_.getAs[Double]("dist_km"))
    ds.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1))
    }
    // cross-check one row against a brute-force nearest-station scan
    if (df.count() > 0) {
      val r = df.head
      val clat = r.getAs[Long]("ci") * 2.0 + 1.0
      val clon = r.getAs[Long]("cj") * 2.0 + 1.0
      def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
        val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
        2 * 6371.0 * math.asin(math.min(1.0, math.sqrt(
          math.pow(math.sin((p2 - p1) / 2), 2) + math.cos(p1) * math.cos(p2)
            * math.pow(math.sin(math.toRadians(lon2 - lon1) / 2), 2))))
      }
      val best = Tables.t(spark, sf, "supplier")
        .filter(col("s_suppkey") <= 100)
        .select(col("s_suppkey"),
          (col("s_suppkey") * 53 % 140 - 70).cast("double"),
          (col("s_suppkey") * 97 % 360 - 180).cast("double"))
        .collect()
        .map(s => hav(clat, clon, s.getDouble(1), s.getDouble(2))).min
      assert(math.abs(best - r.getAs[Double]("dist_km")) < 0.01)
    }
  }
}
