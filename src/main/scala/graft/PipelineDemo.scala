package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end training-data pipeline composed from graft operators:
  * ingest → clean → exact-dedup (keep best) → quality filter → MinHash-LSH
  * near-dup prune → embedding join → partitioned write. One declarative
  * DAG — Catalyst fuses the narrow stages; the only shuffles are the two
  * dedup groupings, the LSH band join, and the final write partitioning.
  * Usage: runMain graft.PipelineDemo [sfDir] [outDir]
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/pipeline_out")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.t(spark, sfDir, "documents")
    println(s"ingested: ${docs.count()}")

    // clean
    val cleaned = docs.withColumn("clean_text",
      regexp_replace(trim(regexp_replace(lower(col("text")), "[^a-z0-9 ]", " ")),
        " +", " "))

    // exact dedup, keep the longest copy per content hash
    val wBest = Window.partitionBy(col("content_hash"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val exactDeduped = cleaned
      .withColumn("content_hash", md5(col("clean_text").cast(BinaryType)))
      .withColumn("rn", row_number().over(wBest))
      .filter(col("rn") === 1).drop("rn")
    println(s"after exact dedup: ${exactDeduped.count()}")

    // quality filter
    val quality = exactDeduped
      .withColumn("n_tokens",
        (length(col("clean_text")) - length(regexp_replace(col("clean_text"), " ", "")) + 1)
          .cast(LongType))
      .filter(col("n_tokens") >= 25)
    println(s"after quality filter: ${quality.count()}")

    // near-dup prune via MinHash-LSH banding (keep the lowest doc_id)
    val sigs = quality.select(col("doc_id"),
      functions.TextFunctions.minhash_signature(col("clean_text")).as("sig"))
    val bands = sigs.select(col("doc_id"), posexplode(
      expr("transform(sequence(0, 7), b -> xxhash64(slice(sig, b*4 + 1, 4)))"))
      .as(Seq("band", "bsig")))
    val dropIds = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bsig") === col("y.bsig")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("y.doc_id").as("doc_id")).distinct()
    val pruned = quality.join(dropIds, Seq("doc_id"), "left_anti")
    println(s"after near-dup prune: ${pruned.count()}")

    // attach embeddings (broadcastable dim at this scale)
    val emb = Tables.t(spark, sfDir, "embeddings")
      .select(col("vec_id").as("doc_id"), col("embedding"))
    val enriched = pruned.join(emb, Seq("doc_id"), "left")
    println(s"with embeddings: ${enriched.filter(col("embedding").isNotNull).count()}")

    // partitioned write (lang-bucketed layout for downstream pruning)
    enriched.select("doc_id", "lang", "source", "clean_text", "n_tokens", "embedding")
      .write.mode("overwrite").partitionBy("lang").parquet(outDir)
    val back = spark.read.parquet(outDir)
    println(s"written+readback: ${back.count()} rows, langs=${back.select("lang").distinct().count()}")
    spark.stop()
  }
}
