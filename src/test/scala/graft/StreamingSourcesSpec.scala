package graft

import graft.streaming.Streams
import graft.streaming.Streams.Ev
import graft.sources.Sources
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StreamingSpec extends SparkSpecBase {

  private def mem(): MemoryStream[Ev] = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    MemoryStream[Ev]
  }

  test("stream_latest_state: state converges to latest event across batches") {
    import spark.implicits._
    val in = mem()
    val q = Streams.latestState(in.toDS())
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()
    in.addData(Ev(1, 100, 7, "view", 1.0), Ev(2, 200, 7, "click", 2.0))
    q.processAllAvailable()
    in.addData(Ev(3, 150, 7, "view", 9.0)) // late event: must NOT win
    q.processAllAvailable()
    val st = spark.table("latest_out").orderBy(col("n_seen").desc)
      .head
    q.stop()
    assert(st.getAs[Long]("last_event_id") == 2 && st.getAs[Long]("n_seen") == 3)
  }

  test("stream_drift: same-mix batches score low, a vocabulary shift alarms") {
    import spark.implicits._
    import Streams.DocEv
    implicit val sq = spark.sqlContext
    val in = MemoryStream[DocEv]
    val q = Streams.driftStream(in.toDS())
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("append").start()
    val base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    in.addData(DocEv(1, "en", base), DocEv(2, "en", base)) // seeds baseline
    q.processAllAvailable()
    in.addData(DocEv(3, "en", base)) // same mix: low KL
    q.processAllAvailable()
    in.addData(DocEv(4, "en", "xx1 xx2 xx3 xx4 xx5 xx6 xx7 xx8 " * 8)) // shift
    q.processAllAvailable()
    val rows = spark.table("drift_out").orderBy(col("n_base")).collect()
    q.stop()
    assert(rows.length == 2) // first batch seeded silently
    assert(!rows(0).getAs[Boolean]("drifted"),
      s"same-mix batch alarmed: ${rows(0)}")
    assert(rows(1).getAs[Boolean]("drifted"),
      s"vocab shift missed: ${rows(1)}")
    assert(rows(1).getAs[Double]("kl_nats") > rows(0).getAs[Double]("kl_nats"))
  }

  test("stream_holt: state carries the exact recursion across batches") {
    import spark.implicits._
    val in = mem()
    val q = Streams.holtStream(in.toDS())
      .writeStream.format("memory").queryName("holt_out")
      .outputMode("append").start()
    in.addData(Ev(1, 100, 7, "t", 10.0), Ev(2, 200, 7, "t", 12.0))
    q.processAllAvailable()
    in.addData(Ev(3, 300, 7, "t", 14.0))
    q.processAllAvailable()
    val rows = spark.table("holt_out").orderBy(col("event_id")).collect()
    q.stop()
    assert(rows.length == 3)
    // replicate the recursion: init (l=10, b=0)
    var (l, b) = (10.0, 0.0)
    assert(math.abs(rows(0).getAs[Double]("level") - l) < 1e-12)
    Seq(12.0, 14.0).zip(rows.drop(1)).foreach { case (y, r) =>
      val lp = l
      l = 0.5 * y + 0.5 * (l + b)
      b = 0.3 * (l - lp) + 0.7 * b
      assert(math.abs(r.getAs[Double]("level") - l) < 1e-12)
      assert(math.abs(r.getAs[Double]("trend") - b) < 1e-12)
      assert(math.abs(r.getAs[Double]("forecast_1") - (l + b)) < 1e-12)
    }
  }

  test("stream_cusum: drift alarms once at the first threshold crossing") {
    import spark.implicits._
    val in = mem()
    val q = Streams.cusumMonitor(in.toDS(), refMean = 10.0, threshold = 5.0)
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").start()
    // entity 7 drifts +2 per event; entity 8 oscillates around the mean
    in.addData(Ev(1, 100, 7, "t", 12.0), Ev(2, 200, 7, "t", 12.0),
      Ev(10, 100, 8, "t", 11.0), Ev(11, 200, 8, "t", 9.0))
    q.processAllAvailable()
    // state persists across batches: third event pushes |cum|=6 >= 5
    in.addData(Ev(3, 300, 7, "t", 12.0), Ev(4, 400, 7, "t", 12.0),
      Ev(12, 300, 8, "t", 11.0))
    q.processAllAvailable()
    val rows = spark.table("cusum_out").collect()
    q.stop()
    assert(rows.length == 1) // one latch-once alarm, only the drifting entity
    val r = rows(0)
    assert(r.getAs[Long]("user_id") == 7 && r.getAs[Long]("event_id") == 3)
    assert(math.abs(r.getAs[Double]("cum_dev") - 6.0) < 1e-9)
    assert(r.getAs[Long]("n_seen") == 3)
  }

  test("stream_gap_alarm: event-time timeout fires for the silent device only") {
    import spark.implicits._
    val in = mem()
    val q = Streams.gapAlarm(in.toDS(), gapSec = 1800L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("gap_out")
      .outputMode("append").start()
    // device 7 reports once; device 8 keeps reporting
    in.addData(Ev(1, 100, 7, "hb", 1.0), Ev(2, 100, 8, "hb", 1.0))
    q.processAllAvailable()
    // watermark advances to 3000 - 600 = 2400 > 7's deadline (1900)...
    in.addData(Ev(3, 3000, 8, "hb", 1.0))
    q.processAllAvailable()
    // ...and the timeout fires on the following trigger
    in.addData(Ev(4, 3100, 8, "hb", 1.0))
    q.processAllAvailable()
    val rows = spark.table("gap_out").collect()
    q.stop()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getAs[Long]("user_id") == 7L)
    assert(r.getAs[Long]("last_event_id") == 1L)
    assert(r.getAs[Long]("deadline_sec") == 1900L)
  }

  test("stream_schedule: histogram state accumulates, compaction + next-poll predict") {
    import spark.implicits._
    val in = mem()
    val q = Streams.scheduleLearner(in.toDS())
      .writeStream.format("memory").queryName("sched_out")
      .outputMode("update").start()
    // entity 7 publishes at :05 and :06 (a span), and at :30 exactly
    in.addData(
      Ev(1, 300, 7, "t", 0.0),        // 00:05:00 -> minute 5 (no round-up)
      Ev(2, 3610, 7, "t", 0.0),       // 01:00:10 -> rounds up to minute 1
      Ev(3, 7500, 7, "t", 0.0))       // 02:05:00 -> minute 5
    q.processAllAvailable()
    in.addData(Ev(4, 3960, 7, "t", 0.0)) // 01:06:00 -> minute 6: span 5-6
    q.processAllAvailable()
    val st = spark.table("sched_out").orderBy(col("n_seen").desc).head
    q.stop()
    assert(st.getAs[Long]("n_seen") == 4)
    // histogram: minute 1 (rounded), 5, 6 -> right-edge compaction keeps
    // 1 and 6 (5-6 is a span); last arrival minute = 6 -> wraps to 1
    assert(st.getAs[scala.collection.Seq[Int]]("sched").toList == List(1, 6))
    assert(st.getAs[Int]("next_minute") == 1)
  }

  test("stream_sbs_state: fields merge from their own message types; only positions advance the store time") {
    import spark.implicits._
    import graft.streaming.Streams.SbsMsg
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SbsMsg]
    val q = Streams.sbsStateStream(in.toDS())
      .writeStream.format("memory").queryName("sbs_out")
      .outputMode("update").start()
    def msg(ts: Long, eid: Long, mt: Int, cs: Option[String] = None,
        lat: Option[Double] = None, lon: Option[Double] = None,
        alt: Option[Long] = None, gs: Option[Long] = None): SbsMsg =
      SbsMsg("A1B2C3", ts, eid, mt, cs, lat, lon, alt, gs, None, None)
    in.addData(
      msg(100, 1, 1, cs = Some("UAL814")),
      msg(110, 2, 3, lat = Some(37.17), lon = Some(-122.03), alt = Some(11025)))
    q.processAllAvailable()
    in.addData(
      msg(120, 3, 4, gs = Some(316)),          // velocity: position untouched
      msg(130, 4, 3, alt = Some(12000)))       // position msg WITHOUT position
    q.processAllAvailable()
    val st = spark.table("sbs_out").orderBy(col("n_msgs").desc).head
    q.stop()
    assert(st.getAs[String]("callsign") == "UAL814")
    assert(st.getAs[Double]("lat") == 37.17)          // still the MSG,3 fix
    assert(st.getAs[Long]("alt_ft") == 12000)         // altitude did advance
    assert(st.getAs[Long]("gs_kt") == 316)
    assert(st.getAs[Long]("last_update_sec") == 130)
    assert(st.getAs[Long]("last_pos_sec") == 110)     // only real positions count
    assert(st.getAs[Long]("n_msgs") == 4 && st.getAs[Long]("n_pos") == 1)
  }

  test("stream_windowed_agg: watermarked hourly counts") {
    import spark.implicits._
    val in = mem()
    val q = Streams.windowedAgg(in.toDS().toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    in.addData(Ev(1, 0, 1, "view", 1.0), Ev(2, 1800, 1, "view", 2.0),
      Ev(3, 3700, 2, "view", 4.0))
    q.processAllAvailable()
    val rows = spark.table("win_out").collect()
    q.stop()
    assert(rows.map(_.getAs[Long]("n_events")).sum == 3)
    assert(rows.length == 2) // two distinct hours
  }

  test("stream_alarm_evidence: same evidence suppressed, new evidence alarms") {
    import spark.implicits._
    import Streams.SensorEv
    implicit val sq = spark.sqlContext
    val in = MemoryStream[SensorEv]
    val q = Streams.alarmEvidence(in.toDS())
      .writeStream.format("memory").queryName("evalarm_out")
      .outputMode("append").start()
    // device 5: three context events establish evidence {1,2,3}, then an
    // alarm from sensor 1; a repeat 100 s later with identical evidence
    // must be suppressed
    in.addData(
      SensorEv(1, 10, 5, 1, is_alarm = false),
      SensorEv(2, 20, 5, 2, is_alarm = false),
      SensorEv(3, 30, 5, 3, is_alarm = false),
      SensorEv(4, 40, 5, 1, is_alarm = true))
    q.processAllAvailable()
    // state persists across micro-batches
    in.addData(SensorEv(5, 140, 5, 1, is_alarm = true)) // evidence now {1,2,3}->{1,3,1}... recompute
    q.processAllAvailable()
    val afterTwo = spark.table("evalarm_out").orderBy("event_id").collect()
    // second alarm: its evidence is sensors of events 2,3,4 = {2,3,1} —
    // the same signature "1-2-3", same sensor, within the hour: suppressed
    assert(afterTwo.map(_.getAs[Long]("event_id")).toSeq == Seq(4L))
    // an alarm whose evidence DIFFERS is always new (alarm.rs: different
    // cameras of the same device), even seconds later
    in.addData(
      SensorEv(6, 150, 5, 7, is_alarm = false), // changes evidence set
      SensorEv(7, 160, 5, 1, is_alarm = true))
    q.processAllAvailable()
    val afterDiff = spark.table("evalarm_out").orderBy("event_id").collect()
    assert(afterDiff.map(_.getAs[Long]("event_id")).toSeq == Seq(4L, 7L))
    // after the new-alarm window passes, the same pair re-alarms
    in.addData(
      SensorEv(8, 4000, 5, 2, is_alarm = false),
      SensorEv(9, 4010, 5, 3, is_alarm = false),
      SensorEv(10, 4020, 5, 1, is_alarm = false),
      SensorEv(11, 4030, 5, 1, is_alarm = true))
    q.processAllAvailable()
    val finalRows = spark.table("evalarm_out").orderBy("event_id").collect()
    q.stop()
    assert(finalRows.map(_.getAs[Long]("event_id")).toSeq == Seq(4L, 7L, 11L))
    assert(finalRows.last.getAs[String]("ev_sig") == "1-2-3")
  }

  test("stream_threshold: alarm fires only on upward crossing") {
    import spark.implicits._
    val in = mem()
    val q = Streams.thresholdAlarm(in.toDS(), 100.0)
      .writeStream.format("memory").queryName("alarm_out")
      .outputMode("append").start()
    in.addData(Ev(1, 10, 5, "s", 50.0), Ev(2, 20, 5, "s", 150.0), // crossing
      Ev(3, 30, 5, "s", 160.0), // stays above: no alarm
      Ev(4, 40, 5, "s", 90.0), Ev(5, 50, 5, "s", 120.0)) // second crossing
    q.processAllAvailable()
    val alarms = spark.table("alarm_out").orderBy("event_id").collect()
    q.stop()
    assert(alarms.map(_.getAs[Long]("event_id")).toSeq == Seq(2L, 5L))
  }

  test("stream_static_enrich: every batch row picks up its dim attributes") {
    import spark.implicits._
    val in = mem()
    val dim = Seq((7L, "sensor-A", "ridge"), (8L, "sensor-B", "valley"))
      .toDF("user_id", "sensor_name", "site")
    val q = Streams.enrichStatic(in.toDF(), dim)
      .writeStream.format("memory").queryName("enrich_static_out")
      .outputMode("append").start()
    in.addData(Ev(1, 100, 7, "view", 1.0), Ev(2, 110, 9, "view", 2.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("enrich_static_out").collect()
    assert(rows.length == 2)
    val known = rows.find(_.getAs[Long]("user_id") == 7L).get
    assert(known.getAs[String]("sensor_name") == "sensor-A")
    // unmatched keys survive with null dim attrs (left join)
    val unknown = rows.find(_.getAs[Long]("user_id") == 9L).get
    assert(unknown.getAs[String]("sensor_name") == null)
  }

  test("stream_lsh_dedup: near-identical docs pair against the keeper, once per band") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val q = Streams.lshDedupStream(docs)
      .writeStream.format("memory").queryName("lsh_dedup_out")
      .outputMode("append").start()
    val base = "the quick brown fox jumps over the lazy dog again and again in the morning"
    in.addData((10L, base), (99L, "completely unrelated content with different shingles throughout the text"))
    q.processAllAvailable()
    assert(spark.table("lsh_dedup_out").count() == 0, "no dups yet")
    in.addData((20L, base)) // exact near-dup arrives later
    q.processAllAvailable()
    val dups = spark.table("lsh_dedup_out").collect()
    assert(dups.nonEmpty, "duplicate not detected")
    assert(dups.forall(r => r.getAs[Long]("doc_id") == 20L
      && r.getAs[Long]("keeper_id") == 10L))
    val bandsHit = dups.map(_.getAs[Int]("band")).toSet
    assert(bandsHit.size == dups.length, "a band reported the same pair twice")
    in.addData((5L, base)) // late smaller id takes over as keeper
    q.processAllAvailable()
    val all = spark.table("lsh_dedup_out").collect()
    val displaced = all.filter(r => r.getAs[Long]("keeper_id") == 5L)
    assert(displaced.nonEmpty && displaced.forall(_.getAs[Long]("doc_id") == 10L))
    q.stop()
  }

}

class SourcesSpec extends SparkSpecBase {

  private val tmp = "target/tmp-sources"

  test("src_csv_json: schema'd round trips preserve data") {
    val df = Tables.t(spark, sf, "nation")
    val schema = df.schema
    Sources.writeCsv(df, s"$tmp/nation_csv")
    val back = Sources.readCsv(spark, s"$tmp/nation_csv", schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).count() == 0)

    Sources.writeJsonl(df, s"$tmp/nation_json")
    val backJ = Sources.readJsonl(spark, s"$tmp/nation_json", schema)
    assert(backJ.exceptAll(df).count() == 0)
  }

  test("src_replay: per-entity shards are time-ordered") {
    val replay = Sources.replayOrdered(Tables.events(spark, sf), "user_id", "ts_sec")
    import spark.implicits._
    val violations = replay.select("user_id", "ts_sec").as[(Long, Long)]
      .mapPartitions { it =>
        var bad = 0L
        var prev: Option[(Long, Long)] = None
        it.foreach { cur =>
          prev.foreach { p =>
            if (p._1 == cur._1 && p._2 > cur._2) bad += 1
          }
          prev = Some(cur)
        }
        Iterator(bad)
      }.collect().sum
    assert(violations == 0)
  }

  test("snk_partitioned: date-partitioned layout prunes on read") {
    Sources.writePartitioned(
      Tables.events(spark, sf).select("event_id", "user_id", "value", "ts_sec"),
      s"$tmp/events_part", "ts_sec")
    val back = spark.read.parquet(s"$tmp/events_part")
    val pruned = back.filter(col("event_date") === "2024-01-05")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("event_date"))
    assert(pruned.count() > 0)
  }

  test("snk_compact: many small files collapse to the target count") {
    val src = s"$tmp/small-files"
    Tables.events(spark, sf).repartition(64)
      .write.mode("overwrite").parquet(src)
    val before = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before > 30)
    val est = Sources.compact(spark, src, s"$tmp/compacted", targetMB = 128)
    val after = new java.io.File(s"$tmp/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after.toLong == est && after < before)
    assert(spark.read.parquet(s"$tmp/compacted").count()
      == Tables.events(spark, sf).count())
  }

  test("snk_stats: manifest prunes files; pruned read returns exact rows") {
    val path = s"$tmp/manifested"
    val data = Tables.t(spark, sf, "lineitem")
    val manifest = Sources.writeWithManifest(data, path, "l_orderkey", nFiles = 8)
    val files = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(manifest.count() == files)
    // manifest totals reconcile with the table
    assert(manifest.agg(sum("n_rows")).head.getLong(0) == data.count())
    // a narrow key range must open a strict subset of files...
    val keys = data.agg(min("l_orderkey"), max("l_orderkey")).head
    val lo = keys.getLong(0)
    val hi = lo + (keys.getLong(1) - lo) / 16
    val (pruned, scanned) = Sources.prunedRead(spark, path, "l_orderkey", lo, hi)
    assert(scanned < files, s"no pruning: $scanned of $files files")
    // ...and still return exactly the rows a full-scan filter returns
    val expect = data
      .filter(col("l_orderkey") >= lo && col("l_orderkey") <= hi).count()
    assert(pruned.count() == expect)
    // an out-of-range probe opens nothing
    val (empty, zero) = Sources.prunedRead(spark, path, "l_orderkey",
      hi * 1000, hi * 1000 + 1)
    assert(zero == 0 && empty.count() == 0)
  }

  test("snk_zorder: morton code interleaves bits; files cover disjoint ranges") {
    import spark.implicits._
    // reference interleave in plain Scala
    def ref(x: Long, y: Long): Long = {
      var r = 0L
      (0 until 16).foreach { i =>
        r |= ((x >> i) & 1L) << (2 * i)
        r |= ((y >> i) & 1L) << (2 * i + 1)
      }
      r
    }
    val samples = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val got = samples.toDF("x", "y")
      .select(Sources.mortonCode(col("x"), col("y")).as("m"))
      .collect().map(_.getLong(0))
    samples.map { case (x, y) => ref(x, y) }.zip(got).foreach {
      case (want, g) => assert(g == want)
    }

    val out = s"$tmp/events_zorder"
    val pts = Tables.events(spark, sf)
      .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast("double")
        + col("value") / 1000.0)
      .withColumn("lon", (col("event_id") * 73 % 360 - 180).cast("double")
        + col("value") / 2000.0)
      .select("event_id", "lat", "lon")
    Sources.writeZOrdered(pts, out, "lat", "lon", files = 6)
    val back = spark.read.parquet(out)
      .select(input_file_name().as("f"), col("zorder"))
      .groupBy("f").agg(min("zorder").as("lo"), max("zorder").as("hi"))
      .orderBy("lo").collect()
    assert(back.length > 1)
    back.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("hi") <= b.getAs[Long]("lo"),
        "z-order file ranges overlap")
      case _ =>
    }
  }

  test("src_parquet: projection pruning reaches the scan") {
    val df = Tables.t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") && !plan.contains("l_extendedprice"),
      s"scan reads more columns than projected:\n$plan")
  }

}
