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

    val win = spark.table("demo_win")
    val st = spark.table("demo_state")
    println(s"windowed rows=${win.count()} events=${win.agg(sum("n_events")).head.getLong(0)}")
    println(s"state entities=${st.select("user_id").distinct().count()}")
    win.orderBy(desc("n_events")).show(5, false)
    st.orderBy("user_id").show(5, false)
    spark.stop()
  }
}
