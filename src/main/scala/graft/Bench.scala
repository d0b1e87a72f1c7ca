package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: JIT + codegen + per-table file-index/footer caches, untimed
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings").foreach { t =>
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      }
      Tables.events(spark, sfDir).count() // nanos flag + index
      SparkEntry.queries("q1_agg")(spark, sfDir).count()
    } catch { case _: Throwable => }
    // steady-state timing: best of 3 back-to-back runs per query
    // (JMH-style min; run 1 absorbs codegen+JIT of the query's fresh
    // classes, runs 2-3 measure steady state). A GC between queries keeps
    // one query's shuffle-buffer collection out of the next one's timing.
    val runs = 3
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      System.gc()
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        (System.nanoTime() - t0) / 1e9
      }
      val best = times.min
      // progress to stderr so a truncated capture still shows the tail
      System.err.println(f"[bench] $name%-28s ${best}%.3f s")
      name -> best
    }
    def f3(v: Double): String = f"$v%.3f"
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":$qs,"sf":"$sfDir","runs":$runs,"n_queries":${results.size}}"""
    // the full per-query map also lands in its own file: driver-side
    // stdout capture has truncated mid-map before, which loses the suite
    Files.write(Paths.get("BENCH_FULL.json"),
      line.getBytes(StandardCharsets.UTF_8))
    println(line)
    spark.stop()
  }
}
