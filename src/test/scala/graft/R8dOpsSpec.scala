package graft

import graft.sources.Sources
import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Semantics checks for the fourth R8 batch: Poisson rate test,
  * great-circle waypoints, versioned snapshot sink, streaming upsert.
  */
class R8dOpsSpec extends SparkSpecBase {

  test("ts_poisson_rate_test: halves partition the counts") {
    val df = run("ts_poisson_rate_test").cache()
    assert(df.count() > 0)
    val totals = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(r.getAs[Long]("n1") + r.getAs[Long]("n2") == totals(u))
      val z = (r.getAs[Long]("n1") - r.getAs[Long]("n2")).toDouble /
        math.sqrt(totals(u).toDouble)
      assert(math.abs(r.getAs[Double]("z") - z) < 1e-12)
    }
  }

  test("geo_gc_waypoints: waypoints lie on the great circle, ordered") {
    val df = run("geo_gc_waypoints").cache()
    assert(df.count() > 0)
    // each waypoint's distance from leg start grows with f, and
    // d(start,wp) + d(wp,end) ~= d(start,end) (on-the-geodesic witness)
    def hav(lat1: Double, lon1: Double, lat2: Double, lon2: Double) = {
      val (p1, p2) = (math.toRadians(lat1), math.toRadians(lat2))
      val (dl, dn) = (p2 - p1, math.toRadians(lon2 - lon1))
      2 * 6371.0 * math.asin(math.min(1.0, math.sqrt(
        math.pow(math.sin(dl / 2), 2)
          + math.cos(p1) * math.cos(p2) * math.pow(math.sin(dn / 2), 2))))
    }
    val legs = df.collect().groupBy(r => r.getAs[Long]("leg"))
    legs.values.foreach { wps =>
      val s = wps.sortBy(_.getAs[Double]("f"))
      // monotone along-track: f ordering == along-circle ordering
      val supp = Tables.t(spark, sf, "supplier")
        .filter(col("s_suppkey") === s.head.getAs[Long]("leg"))
        .select((col("s_suppkey") * 53 % 140 - 70).cast("double"),
          (col("s_suppkey") * 97 % 360 - 180).cast("double")).head
      val (lat1, lon1) = (supp.getDouble(0), supp.getDouble(1))
      val ds = s.map(r =>
        hav(lat1, lon1, r.getAs[Double]("w_lat"), r.getAs[Double]("w_lon")))
      ds.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) <= w(1) + 1e-6)
      }
    }
  }

  test("snk_versioned: atomic commits, time travel, lost race is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vtab").toString
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    // empty table reads empty
    assert(Sources.readVersion(spark, dir, schema).count() == 0)
    val v0 = Sources.commitVersion(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val v1 = Sources.commitVersion(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), dir)
    assert(v0 == 0 && v1 == 1)
    // latest sees v1, time travel sees v0
    val latest = Sources.readVersion(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest == Map(1L -> "a2", 3L -> "c"))
    val asOf0 = Sources.readVersion(spark, dir, schema, Some(0L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(asOf0 == Map(1L -> "a", 2L -> "b"))
    // replaying version 1 loses the race and changes nothing
    val dup = Sources.commitVersion(Seq((9L, "x")).toDF("k", "v"), dir, Some(1L))
    assert(dup == -1L)
    assert(Sources.readVersion(spark, dir, schema)
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("snk_versioned: expireVersions vacuums old snapshots, keeps time-travel window") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vexp").toString
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    (0 until 4).foreach { i =>
      Sources.commitVersion(Seq((i.toLong, s"v$i")).toDF("k", "v"), dir)
    }
    assert(Sources.expireVersions(spark, dir, keepLast = 2) == 2)
    // latest and the kept predecessor still read
    assert(Sources.readVersion(spark, dir, schema)
      .collect().map(_.getString(1)).toSeq == Seq("v3"))
    assert(Sources.readVersion(spark, dir, schema, Some(2L))
      .collect().map(_.getString(1)).toSeq == Seq("v2"))
    // expired versions resolve to the OLDEST surviving at-or-below? No:
    // asOf below the retention window finds no version -> empty table
    assert(Sources.readVersion(spark, dir, schema, Some(1L)).count() == 0)
    // the expired snapshot dirs are physically gone (vacuum, not soft)
    val dirs = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.startsWith("v="))
    assert(dirs.count(_.startsWith("v=0-")) == 0)
    assert(dirs.count(_.startsWith("v=1-")) == 0)
    assert(dirs.count(_.startsWith("v=2-")) == 1)
    assert(dirs.count(_.startsWith("v=3-")) == 1)
  }

  test("snk_versioned: concurrent committers — exactly one wins, no dangling pointer") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vrace").toString
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType)))
    Sources.commitVersion(Seq((0L, "base")).toDF("k", "v"), dir)
    // four threads race to publish version 1 (same expect), repeatedly
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(4)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    val start = new CountDownLatch(1)
    (0 until 4).foreach { t =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          val v = Sources.commitVersion(
            Seq((t.toLong + 10L, s"w$t")).toDF("k", "v"), dir, Some(1L))
          results.add((t, v))
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    val rs = results.asScala.toSeq
    // exactly one winner; losers report -1 and leave no damage
    assert(rs.count(_._2 == 1L) == 1)
    assert(rs.count(_._2 == -1L) == 3)
    val winner = rs.find(_._2 == 1L).get._1
    // the published version reads the WINNER's data (pointer not clobbered
    // by a loser's staged entry — the r5 per-attempt-tmp fix)
    val got = Sources.readVersion(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(winner.toLong + 10L -> s"w$winner"))
  }

  test("stream_upsert_sink: foreachBatch upsert keeps latest per key") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val in = MemoryStream[Ev]
    val q = in.toDS().toDF()
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        Streams.upsertBatch(b, id, dir); ()
      }
      .outputMode("append").start()
    in.addData(Ev(1, 100, 7, "t", 1.0), Ev(2, 200, 7, "t", 2.0),
      Ev(3, 100, 8, "t", 3.0))
    q.processAllAvailable()
    in.addData(Ev(4, 300, 7, "t", 4.0), Ev(5, 50, 8, "t", 5.0))
    q.processAllAvailable()
    q.stop()
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("event_id", LongType), StructField("ts_sec", LongType),
      StructField("value", DoubleType)))
    val t = Sources.readVersion(spark, dir, schema)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // user 7: event 4 (latest ts); user 8: event 3 wins (ts 100 > 50)
    assert(t == Map(7L -> (4L, 4.0), 8L -> (3L, 3.0)))
    // replaying batch 1 is a no-op (version already committed)
    val batch1 = Seq(Ev(99, 999, 7, "t", 99.0)).toDF()
    assert(Streams.upsertBatch(batch1, 1L, dir) == -1L)
    assert(Sources.readVersion(spark, dir, schema)
      .filter(col("user_id") === 7).head.getLong(1) == 4L)
  }
  test("snk_bloom: point lookups open one file, misses open none") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bloom").toString + "/t"
    val data = (0L until 1000L).map(k => (k, s"payload$k")).toDF("k", "v")
    Sources.writeWithBloom(data, dir, "k", nFiles = 8)
    // every present key: found; a key lives in ONE file and bloom false
    // positives may open the occasional extra one (4096-bit filter, 125
    // keys/file -> ~0.4% FP per other file)
    val hitScans = (0L until 50L by 7L).map { k =>
      val (df, scanned) = Sources.bloomPointRead(spark, dir, "k", k)
      val rows = df.collect()
      assert(rows.length == 1 && rows(0).getString(1) == s"payload$k")
      assert(scanned >= 1L && scanned <= 3L)
      scanned
    }
    assert(hitScans.count(_ == 1L) >= hitScans.length - 1)
    // absent keys: nothing returned; almost all prune to zero files
    val missScans = (10000L until 10040L).map { k =>
      val (df, scanned) = Sources.bloomPointRead(spark, dir, "k", k)
      assert(df.count() == 0)
      scanned
    }
    // 4096-bit filter => ~0.4% FP per file; allow a couple of unlucky keys
    assert(missScans.count(_ == 0L) >= 36)
  }
}
