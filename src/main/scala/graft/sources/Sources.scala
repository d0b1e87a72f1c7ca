package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** §2.H sources/sinks — the ingest layer ODIN implements per-feed
  * (CSV/JSON decode in odin_adsb/src/sbs.rs, GeoJSON in odin_geolayer,
  * archive replay throughout) re-expressed as schema'd Spark readers and
  * scale-friendly writers.
  */
object Sources {

  /** Schema'd CSV read — schema supplied, not inferred (inference is a
    * full extra pass at 100 TB).
    */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** Schema'd JSON-lines read. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Archive replay: deliver records time-ordered per entity, the batch
    * equivalent of ODIN's replay actors. Range-partitioned by entity then
    * sorted within partitions — each partition is an independently
    * replayable, time-ordered shard (no global sort, no driver funnel).
    */
  def replayOrdered(df: DataFrame, entityCol: String, tsCol: String): DataFrame =
    df.repartitionByRange(col(entityCol))
      .sortWithinPartitions(col(entityCol), col(tsCol))

  /** Scale-layout sink: date-bucketed partitioned parquet, the layout that
    * makes partition pruning work on a 100 TB event archive.
    */
  def writePartitioned(df: DataFrame, path: String, tsSecCol: String): Unit =
    df.withColumn("event_date",
        to_date(timestamp_seconds(col(tsSecCol))).cast("string"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(path)

  /** Morton (Z-order) code: interleave the low 16 bits of two cell
    * indices into a 32-bit curve position, as a pure codegen'd column
    * expression (shift/mask chain, no UDF). Used by `writeZOrdered`.
    */
  def mortonCode(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    // spread 16 bits to even positions: classic mask ladder
    def spread(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
      val m = Seq(
        (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))
      m.foldLeft(c.bitwiseAND(0xFFFFL)) { case (acc, (s, mask)) =>
        (acc.bitwiseOR(shiftleft(acc, s))).bitwiseAND(mask)
      }
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** Z-order-clustered parquet sink: range-partition + sort by the Morton
    * code of the (lat,lon) grid cell, so spatially close records land in
    * the same files and parquet min/max stats prune 2-D bounding-box
    * queries — the layout that turns a full 100 TB scan into a handful of
    * file reads. `bits`-bit cells over [-90,90]x[-180,180].
    */
  def writeZOrdered(df: DataFrame, path: String, latCol: String,
      lonCol: String, files: Int = 8, bits: Int = 16): Unit = {
    val scale = (1 << bits).toDouble
    val cx = floor((col(lonCol) + 180.0) / 360.0 * scale).cast("long")
    val cy = floor((col(latCol) + 90.0) / 180.0 * scale).cast("long")
    df.withColumn("zorder", mortonCode(cx, cy))
      .repartitionByRange(files, col("zorder"))
      .sortWithinPartitions(col("zorder"))
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Small-file compaction: rewrite a directory into ~targetMB output
    * files. The target count comes straight from the input files' on-disk
    * parquet bytes (a filesystem listing — no data ever reaches the
    * driver, and encoded bytes beat any row-sample estimate). The
    * maintenance op every long-running ingest needs — thousands of tiny
    * files kill both the driver's file index and scan throughput at scale.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetMB: Int = 128): Long = {
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listStatus(p)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val files = math.max(1L, totalBytes / (targetMB.toLong * 1024 * 1024))
    spark.read.parquet(inPath)
      .repartition(files.toInt).write.mode(SaveMode.Overwrite).parquet(outPath)
    files
  }

  /** snk_stats: file-statistics manifest for data skipping — the
    * Iceberg/Delta-style sidecar a 100 TB table needs so a point/range
    * query opens only the files that can match. `writeWithManifest`
    * range-partitions on the stats column (so per-file ranges are tight,
    * the same reason Z-order exists) and derives a per-file (min, max,
    * rows) manifest from the written data itself via `_metadata.file_path`
    * — one distributed aggregation, no footer reads on the driver.
    * `prunedRead` consults the manifest FIRST and hands Spark only the
    * surviving file list: at cluster scale that is the difference between
    * listing+opening 10^6 footers and reading a 10^3-row manifest.
    */
  def writeWithManifest(df: DataFrame, path: String, statsCol: String,
      nFiles: Int): DataFrame = {
    df.repartitionByRange(nFiles, col(statsCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    val manifest = spark.read.parquet(path)
      .select(col(statsCol), col("_metadata.file_path").as("file_path"))
      .groupBy(col("file_path"))
      .agg(min(col(statsCol)).as("stat_min"), max(col(statsCol)).as("stat_max"),
        count(lit(1)).as("n_rows"))
    manifest.write.mode(SaveMode.Overwrite).parquet(s"$path.manifest")
    manifest
  }

  /** snk_bloom: per-file Bloom-filter sidecar for POINT-lookup skipping —
    * the complement of snk_stats' min/max manifest, which only prunes
    * RANGE queries on the clustered column. A per-file Bloom filter
    * (bit_or-aggregated longs, 2 xxhash64 probes — the
    * doc_bloom_dedup machinery applied per file) answers "can this file
    * contain key k?" from the manifest alone. With hash-partitioned
    * writes each key lives in exactly one file, so a point read opens 1
    * file instead of all of them, and a MISSING key usually opens 0 —
    * at 10^6 files that is the entire difference between a point lookup
    * and a table scan. Probe positions are computed with the SAME Spark
    * xxhash64 expression at write and read time, so there is no
    * hash-implementation drift.
    */
  private val BloomBits = 4096L // ~6% fill at 125 keys/file -> 0.4% FP

  private def bloomProbeCols(keyCol: String) = Seq(
    pmod(xxhash64(col(keyCol), lit(1)), lit(BloomBits)),
    pmod(xxhash64(col(keyCol), lit(2)), lit(BloomBits)))

  def writeWithBloom(df: DataFrame, path: String, keyCol: String,
      nFiles: Int): DataFrame = {
    df.repartition(nFiles, col(keyCol))
      .write.mode(SaveMode.Overwrite).parquet(path)
    val spark = df.sparkSession
    val probes = bloomProbeCols(keyCol)
    val manifest = spark.read.parquet(path)
      .select(col("_metadata.file_path").as("file_path"),
        explode(array(probes: _*)).as("pos"))
      .select(col("file_path"), (col("pos") / 64).cast("long").as("word"),
        expr("shiftleft(1L, CAST(pos % 64 AS INT))").as("bit"))
      .groupBy(col("file_path"), col("word"))
      .agg(bit_or(col("bit")).as("bits"))
    manifest.write.mode(SaveMode.Overwrite).parquet(s"$path.bloom")
    manifest
  }

  /** Bloom-pruned point read: returns (dataframe, filesScanned). A file
    * survives only if BOTH probe bits for the key are set in its filter.
    */
  def bloomPointRead(spark: SparkSession, path: String, keyCol: String,
      key: Long): (DataFrame, Long) = {
    import spark.implicits._
    // same hash expressions as the writer, evaluated on a 1-row frame
    val probes = Seq(key).toDF(keyCol)
      .select(bloomProbeCols(keyCol): _*)
      .collect()(0)
    val positions = Seq(probes.getLong(0), probes.getLong(1))
    val manifest = spark.read.parquet(s"$path.bloom")
    val keep = positions
      .map { p =>
        manifest.filter(col("word") === p / 64
          && (col("bits").bitwiseAND(lit(1L << (p % 64).toInt)) =!= 0L))
          .select(col("file_path"))
      }
      .reduce(_.intersect(_))
      .collect().map(_.getString(0)) // manifest-sized, never data-sized
    val df =
      if (keep.isEmpty) spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (df.filter(col(keyCol) === key), keep.length.toLong)
  }

  /** Manifest-pruned range read: returns (dataframe, filesScanned). */
  def prunedRead(spark: SparkSession, path: String, statsCol: String,
      lo: Any, hi: Any): (DataFrame, Long) = {
    val manifest = spark.read.parquet(s"$path.manifest")
    val keep = manifest
      .filter(col("stat_max") >= lit(lo) && col("stat_min") <= lit(hi))
      .select(col("file_path"))
      .collect().map(_.getString(0)) // file list: manifest-sized, not data-sized
    val df =
      if (keep.isEmpty)
        spark.read.parquet(path).filter(lit(false))
      else spark.read.parquet(keep.toIndexedSeq: _*)
    (df.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi)),
      keep.length.toLong)
  }

  // ---- snk_versioned: transactional snapshot sink with a commit log ----
  // The mini table-format pattern (Delta/Iceberg shape): each commit
  // writes a fresh snapshot directory, then publishes it by atomically
  // renaming a JSON entry into `_log/` (HDFS/posix rename is atomic, so
  // readers never observe a half-written commit). Readers list the tiny
  // log — never the data — pick the latest version at-or-below `asOf`,
  // and read exactly that snapshot: time travel, concurrent-reader
  // safety, and idempotent re-commit (a version that already exists is
  // not overwritten — the foundation stream_upsert_sink builds on for
  // exactly-once batches).

  /** Commit `df` as the next version (or `expect`). Returns the version
    * actually committed; a lost race (version already published) returns
    * -1 and leaves the table unchanged. Data lands in a UNIQUE staging
    * directory per attempt — only the atomic log rename publishes it, so
    * a losing writer never clobbers the winner's snapshot.
    */
  def commitVersion(df: DataFrame, tablePath: String,
      expect: Option[Long] = None): Long = {
    val spark = df.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_log")
    val fs = logDir.getFileSystem(conf)
    fs.mkdirs(logDir)
    val v = expect.getOrElse(latestVersion(spark, tablePath) + 1)
    val fin = new org.apache.hadoop.fs.Path(logDir, s"$v.json")
    if (fs.exists(fin)) return -1L // already published (e.g. batch replay)
    val attempt = java.util.UUID.randomUUID.toString.take(8)
    val dirName = s"v=$v-$attempt"
    df.write.mode(SaveMode.Overwrite).parquet(s"$tablePath/$dirName")
    // the staged log entry is ALSO unique per attempt: a shared
    // `.$v.json.tmp` would let a concurrent committer overwrite this
    // attempt's content before the rename, publishing a log entry that
    // points at a staging dir its loser then deletes — only the atomic
    // rename below may arbitrate the race
    val tmp = new org.apache.hadoop.fs.Path(logDir, s".$v.$attempt.json.tmp")
    val out = fs.create(tmp, false)
    out.write(s"""{"version":$v,"dir":"$dirName"}""".getBytes("UTF-8"))
    out.close()
    if (fs.exists(fin) || !fs.rename(tmp, fin)) {
      // lost the race after staging: discard our orphan snapshot
      fs.delete(tmp, false)
      fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$dirName"), true)
      -1L
    } else v
  }

  /** Expire all but the newest `keepLast` published versions: delete the
    * old log entries FIRST (so no reader can resolve them anymore), then
    * their snapshot directories — the vacuum half of the mini table
    * format. Staging directories of in-flight commits are never touched
    * (only dirs referenced by an expired log entry are deleted). Returns
    * the number of versions expired.
    */
  def expireVersions(spark: SparkSession, tablePath: String,
      keepLast: Int): Int = {
    require(keepLast >= 1, "must keep at least the latest version")
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) return 0
    val versions = fs.listStatus(logDir)
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong)
      .sorted
    val expire = versions.dropRight(keepLast)
    expire.foreach { v =>
      val entry = new org.apache.hadoop.fs.Path(logDir, s"$v.json")
      val in = fs.open(entry)
      val body = try {
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      val dir = """"dir":"([^"]+)"""".r.findFirstMatchIn(body).map(_.group(1))
      fs.delete(entry, false) // unpublish first: readers can't resolve it
      dir.foreach(d =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/$d"), true))
    }
    expire.length
  }

  /** Latest committed version, -1 if the table is empty. */
  def latestVersion(spark: SparkSession, tablePath: String): Long = {
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) -1L
    else fs.listStatus(logDir).iterator
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  /** Snapshot read at `asOf` (default: latest). Empty table → empty df
    * with the caller-supplied schema. The snapshot directory comes from
    * the committed log entry, never from listing data paths.
    */
  def readVersion(spark: SparkSession, tablePath: String,
      schema: StructType, asOf: Option[Long] = None): DataFrame = {
    val logDir = new org.apache.hadoop.fs.Path(s"$tablePath/_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val versions =
      if (!fs.exists(logDir)) Array.empty[Long]
      else fs.listStatus(logDir)
        .map(_.getPath.getName)
        .filter(n => n.endsWith(".json") && !n.startsWith("."))
        .map(_.stripSuffix(".json").toLong)
        .filter(v => asOf.forall(v <= _))
    if (versions.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val entry = new org.apache.hadoop.fs.Path(logDir, s"${versions.max}.json")
      val in = fs.open(entry)
      val body = try {
        // read to EOF — a single read() may legally return short on HDFS
        val bos = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
        bos.toString("UTF-8")
      } finally in.close()
      val dir = """"dir":"([^"]+)"""".r.findFirstMatchIn(body)
        .map(_.group(1))
        .getOrElse(sys.error(s"corrupt log entry $entry"))
      spark.read.schema(schema).parquet(s"$tablePath/$dir")
    }
  }
}
