package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end drive of the streaming layer against real files: replays the
  * events table through a file-source stream into windowedAgg and the
  * stateful latest-state store, printing both results. Usage:
  *   runMain graft.streaming.StreamingDemo <sfDir>
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage the batch table as a streaming file source (parquet dir)
    val staged = "target/tmp-streaming/events"
    Tables.events(spark, sfDir)
      .select("event_id", "ts_sec", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(staged)
    val schema = spark.read.parquet(staged).schema
    val stream = spark.readStream.schema(schema).parquet(staged)

    val winQ = Streams.windowedAgg(stream)
      .writeStream.format("memory").queryName("demo_win")
      .outputMode("complete").start()
    val stateQ = Streams.latestState(stream.as[Streams.Ev])
      .writeStream.format("memory").queryName("demo_state")
      .outputMode("update").start()
    winQ.processAllAvailable(); stateQ.processAllAvailable()
    winQ.stop(); stateQ.stop()

    // stream-stream enrich: events joined to a staged reference stream
    val refStaged = "target/tmp-streaming/refs"
    Tables.events(spark, sfDir)
      .select(col("user_id").as("ref_user_id"), col("ts_sec").as("ref_sec"),
        col("event_type").as("ref_tag"))
      .write.mode("overwrite").parquet(refStaged)
    val refSchema = spark.read.parquet(refStaged).schema
    val refStream = spark.readStream.schema(refSchema).parquet(refStaged)
    val enrichQ = Streams.enrichStream(stream, refStream)
      .writeStream.format("memory").queryName("demo_enrich")
      .outputMode("append").start()
    enrichQ.processAllAvailable(); enrichQ.stop()

    val win = spark.table("demo_win")
    val st = spark.table("demo_state")
    println(s"windowed rows=${win.count()} events=${win.agg(sum("n_events")).head.getLong(0)}")
    println(s"state entities=${st.select("user_id").distinct().count()}")
    println(s"enriched rows=${spark.table("demo_enrich").count()}")
    win.orderBy(desc("n_events")).show(5, false)
    st.orderBy("user_id").show(5, false)
    spark.stop()
  }
}
