package graft

import org.apache.spark.sql.functions._

/** DataSource V2 replay-feed source: correctness, determinism, and the
  * two scale behaviors (shard pruning from pushed filters, column
  * pruning into the reader).
  */
class ReplayFeedSpec extends SparkSpecBase {

  private def feed = spark.read
    .format("graft.sources.ReplayFeedProvider")
    .option("days", "4").option("stations", "8").option("eventsPerDay", "64")
    .load()

  test("reads days*stations*eventsPerDay deterministic rows") {
    assert(feed.count() == 4L * 8 * 64)
    val a = feed.orderBy("event_id").collect()
    val b = feed.orderBy("event_id").collect()
    assert(a.sameElements(b))
    // event ids dense and unique; values inside the generator range
    assert(feed.select(countDistinct("event_id")).head.getLong(0) == 4L * 8 * 64)
    assert(feed.agg(min("value"), max("value")).head match {
      case r => r.getDouble(0) >= 0.0 && r.getDouble(1) <= 200.0
    })
  }

  test("station equality prunes to one shard per day") {
    val one = feed.filter(col("station") === 3)
    assert(one.rdd.getNumPartitions == 4) // 4 days x 1 station
    assert(one.count() == 4L * 64)
    assert(one.select("station").distinct().collect().map(_.getInt(0)).toSeq == Seq(3))
  }

  test("time-range predicate prunes day shards") {
    val start = 1704067200L
    val day2 = feed.filter(col("ts_sec") >= start + 2 * 86400
      && col("ts_sec") < start + 3 * 86400)
    assert(day2.rdd.getNumPartitions == 8) // 1 day x 8 stations
    assert(day2.count() == 8L * 64)
    // exact row filtering still applies on top of shard pruning
    val narrow = feed.filter(col("ts_sec") === start) // first tick of day 0
    assert(narrow.count() == narrow.select("event_id").distinct().count())
    assert(narrow.rdd.getNumPartitions == 8)
  }

  test("column pruning reaches the scan description") {
    val df = feed.select("event_id", "value")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("read=[event_id,value]"), plan)
  }

  test("micro-batch streaming read delivers the whole archive") {
    val q = spark.readStream
      .format("graft.sources.ReplayFeedProvider")
      .option("days", "3").option("stations", "4").option("eventsPerDay", "32")
      .load()
      .writeStream.format("memory").queryName("replay_stream_out")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("replay_stream_out")
    assert(got.count() == 3L * 4 * 32)
    assert(got.select(countDistinct("event_id")).head.getLong(0) == 3L * 4 * 32)
    // batch read of the same conf sees the identical record set
    val batch = spark.read.format("graft.sources.ReplayFeedProvider")
      .option("days", "3").option("stations", "4").option("eventsPerDay", "32")
      .load()
    assert(got.exceptAll(batch).count() == 0 && batch.exceptAll(got).count() == 0)
  }

  test("streaming restart from checkpoint re-delivers nothing (exactly-once)") {
    val dir = java.nio.file.Files.createTempDirectory("replay-restart").toString
    def start() = spark.readStream
      .format("graft.sources.ReplayFeedProvider")
      .option("days", "2").option("stations", "3").option("eventsPerDay", "16")
      .load()
      .writeStream.format("parquet")
      .option("path", s"$dir/data").option("checkpointLocation", s"$dir/chk")
      .outputMode("append").start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    val n1 = spark.read.parquet(s"$dir/data").count()
    assert(n1 == 2L * 3 * 16)
    val q2 = start() // same checkpoint: offsets already committed
    q2.processAllAvailable(); q2.stop()
    val n2 = spark.read.parquet(s"$dir/data").count()
    assert(n2 == n1, s"restart re-delivered rows: $n1 -> $n2")
  }

  test("source rows behave as a normal DataFrame (join + agg)") {
    val enriched = feed.groupBy("station")
      .agg(count(lit(1)).as("n"), max("value").as("vmax"))
    assert(enriched.count() == 8)
    enriched.collect().foreach(r => assert(r.getAs[Long]("n") == 4L * 64))
  }
}
