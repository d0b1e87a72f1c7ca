package graft

import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Semantics checks for the second R7 batch: Theil–Sen trend, matrix-
  * profile motif/discord, route linear referencing, SpaceSaving top-k.
  */
class R7OpsSpec extends SparkSpecBase {

  test("ts_theil_sen: median of banded slopes (imperative cross-check)") {
    val df = run("ts_theil_sen").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    val rows = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("ts_sec"), expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val slopes = (for {
      i <- rows.indices; j <- (i + 1) until math.min(i + 17, rows.length)
      if rows(j)._1 > rows(i)._1
    } yield (rows(j)._2 - rows(i)._2) * 36.0 / (rows(j)._1 - rows(i)._1))
      .sorted
    val n = slopes.length
    val med =
      if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
    val got = df.filter(col("user_id") === u).head
    assert(got.getAs[Long]("n_pairs") == n)
    assert(math.abs(got.getAs[Double]("trend_per_hour") - med) < 1e-9)
  }

  test("ts_motif_discord: discord dominates motif; ids well-formed") {
    val df = run("ts_motif_discord").cache()
    assert(df.count() > 0)
    assert(df.filter(col("discord_d2") < col("motif_d2")).count() == 0)
    assert(df.filter(col("motif_a") >= col("motif_b")).count() == 0)
    assert(df.filter(col("motif_d2") < 0).count() == 0)
  }

  test("geo_route_snap: projection bounds and a brute-force witness") {
    val df = run("geo_route_snap").cache()
    assert(df.count() > 0)
    assert(df.filter(col("t_frac") < 0.0 || col("t_frac") > 1.0).count() == 0)
    assert(df.filter(col("cross_m") < 0.0).count() == 0)
    // along is within the total route length
    // part keys are 0..21 at this SF -> 22 vertices, 21 segments
    val verts = (0 to 21).map(k => (k * 3.0, (k * k * 7) % 40 - 20.0))
    val totalLen = verts.zip(verts.tail).map { case ((ax, ay), (bx, by)) =>
      math.hypot(bx - ax, by - ay)
    }.sum
    assert(df.filter(col("along_m") > totalLen + 1e-6).count() == 0)
    // witness: the reported cross distance matches a brute-force min
    val r = df.head
    val ev = Tables.events(spark, sf)
      .filter(col("event_id") === r.getAs[Long]("event_id"))
      .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast("double")
        + col("value") / 1000.0)
      .withColumn("lon", (col("event_id") * 73 % 360 - 180).cast("double")
        + col("value") / 2000.0)
      .select("lat", "lon").head
    val (px, py) = ((ev.getDouble(1) + 180.0) / 360.0 * 60.0 + 1.5,
      ev.getDouble(0) / 3.5)
    val best = verts.zip(verts.tail).map { case ((ax, ay), (bx, by)) =>
      val (dx, dy) = (bx - ax, by - ay)
      val t = math.max(0.0, math.min(1.0,
        ((px - ax) * dx + (py - ay) * dy) / (dx * dx + dy * dy)))
      math.hypot(px - (ax + t * dx), py - (ay + t * dy))
    }.min
    assert(math.abs(r.getAs[Double]("cross_m") - best) < 1e-9)
  }

  test("stream_topk: bounded state surfaces the heavy hitter") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.topkStream(in.toDS(), capacity = 8)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode("update").start()
    // 30 distinct tail users (> capacity) + one heavy hitter (user 999)
    val tail = (1 to 30).map(u => Ev(u.toLong, 100L + u, u.toLong, "t", 1.0))
    val heavy = (1 to 20).map(i => Ev(1000L + i, 200L + i, 999L, "t", 1.0))
    in.addData(tail ++ heavy: _*)
    q.processAllAvailable()
    in.addData((1 to 5).map(i => Ev(2000L + i, 300L + i, 999L, "t", 1.0)): _*)
    q.processAllAvailable()
    val rows = spark.table("topk_out").orderBy(col("n_seen").desc).collect()
    q.stop()
    val last = rows.head
    assert(last.getAs[Long]("n_seen") == 55)
    val users = last.getAs[scala.collection.Seq[Long]]("top_users")
    val counts = last.getAs[scala.collection.Seq[Long]]("top_counts")
    // SpaceSaving guarantee: true freq 25 > n/capacity, so 999 is present
    // and first; its estimate is >= the true count
    assert(users.head == 999L)
    assert(counts.head >= 25L)
    assert(users.length == 5)
  }
}
