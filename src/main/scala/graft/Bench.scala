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
      // r14 (guide §2.2 "fewer, larger reduce partitions" / VERDICT r13
      // item 8): size-based AQE coalescing instead of parallelism-first.
      // parallelismFirst=true (the default) keeps up to `cpus` post-shuffle
      // partitions however tiny the data, so every stage of every
      // sub-second query schedules 32 tasks — pure scheduler overhead at
      // local SFs, and at 100 TB the same setting produces millions of
      // ~1 MB reduce partitions (the guide's quadratic-block regime).
      // Size-based coalescing targets advisoryPartitionSizeInBytes
      // (default 64 MB) at ANY scale: tiny iterative rounds collapse to
      // one task, production shuffles land in the guide's 100 MB–1 GB
      // band. Overridable via env for scale experiments.
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARALLELISM_FIRST", "false"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY_PARTITION", "64m"))
      // r14 (guide §1.2 step 2, measured): the Janino class cache defaults
      // to 100 entries; one iterative query (CC / BPE / Lloyd rounds ×
      // 3 timed runs) cycles through several hundred generated classes, so
      // every round recompiled every stage — 30–80 ms × stages × rounds of
      // pure driver-side compilation (geo_contour_rings 9.6→7.2 s,
      // doc_cc_clusters 5.4→3.8 s from this one setting). Scale-safe: the
      // cache is keyed on generated source, bounded (LRU), and identical
      // plan shapes recur at every SF — a 100 TB iterative job recompiles
      // the same round plan the same way.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "2000"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: the partition-less Window ops over tiny aggregated
    // frames (all 15 audited safe — see VERDICT r4) each emit a
    // `WindowExec: No Partition Defined` WARN per run, ~2000 chars of
    // which drowned the driver's ~2KB capture window in r4 and cost the
    // round its parsed bench entry (BENCH_r04 parsed:null)
    spark.sparkContext.setLogLevel("ERROR")
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
    // opt-in subset for standalone re-timing (comma-separated names);
    // the driver never sets this, so the per-round contract is unchanged
    val only = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val results = SparkEntry.queries.toSeq
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .sortBy(_._1).map { case (name, fn) =>
      // iterative queries (CC, k-means, BPE, streamline) localCheckpoint
      // per round and those blocks outlive the query; once a few such
      // queries have run, the block manager carries GBs of dead blocks
      // and later queries pay eviction+GC for them (measured: 1.7 s
      // geo_wind_streamline → 20 s inside the full suite, 2.3 s again
      // standalone). Dropping leftover persisted RDDs between queries
      // makes per-query times order-independent.
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
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
    // Locale.ROOT: a comma-decimal default locale would make the line
    // invalid JSON (ADVICE r3)
    def f3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // full per-query map in its own file; stdout gets ONLY the headline
    // subset: the driver's capture window is ~2KB and the 132-query map
    // (~3.5KB) overflowed it every round so far (BENCH_r{1,2,3}.json all
    // record parsed:null) — the printed line must fit the window
    val full =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${qmap(results)},"sf":"$sfDir","runs":$runs,"n_queries":${results.size}}"""
    // a filtered re-timing run must not clobber the full-suite record
    if (only.isEmpty)
      Files.write(Paths.get("BENCH_FULL.json"),
        full.getBytes(StandardCharsets.UTF_8))
    val headline = SparkEntry.benchQueries.toSet
    // a filtered run (SPARK_GRAFT_BENCH_QUERIES) marks itself and drops the
    // queries_full pointer — its headline must not read as a full-suite
    // record to anything parsing stdout (ADVICE r9)
    val tail =
      if (only.isEmpty) ""","queries_full":"BENCH_FULL.json"""" else ""","filtered":true"""
    val line =
      s"""{"metric":"total","value":${f3(total)},"unit":"sec","queries":${qmap(results.filter(r => headline(r._1)))},"sf":"$sfDir","runs":$runs,"n_queries":${results.size}$tail}"""
    println(line)
    // make the JSON line the LAST thing in the combined capture: flush
    // stdout before spark.stop() can interleave anything after it
    System.out.flush()
    spark.stop()
  }
}
