package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the R7 doc/emb batch: CCNet perplexity buckets,
  * tokenizer fertility, RRF fusion, hard-negative mining.
  */
class FusionPruneSpec extends SparkSpecBase {

  test("doc_perplexity_prune: deciles balanced per lang, buckets consistent") {
    val df = run("doc_perplexity_prune").cache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(df.count() == nDocs)
    // within each lang the decile sizes differ by at most 1 (ntile law)
    val sizes = df.groupBy("lang", "decile").count()
      .groupBy("lang").agg((max("count") - min("count")).as("spread"))
    assert(sizes.filter(col("spread") > 1).count() == 0)
    // bucket labels follow the decile
    assert(df.filter(
      (col("decile") <= 3 && col("bucket") =!= "head") ||
        (col("decile") > 3 && col("decile") <= 7 && col("bucket") =!= "middle") ||
        (col("decile") > 7 && col("bucket") =!= "tail")).count() == 0)
    // head docs have lower mean_nll than tail docs, per lang
    val agg = df.groupBy("lang").agg(
      max(when(col("bucket") === "head", col("mean_nll"))).as("hmax"),
      min(when(col("bucket") === "tail", col("mean_nll"))).as("tmin"))
    assert(agg.filter(col("hmax") > col("tmin")).count() == 0)
  }

  test("doc_tokenizer_fertility: every word yields at least one token") {
    val df = run("doc_tokenizer_fertility").cache()
    assert(df.count() > 0)
    assert(df.filter(col("fertility") < 1.0).count() == 0)
    assert(df.filter(col("chars_per_token") <= 0.0).count() == 0)
    // group doc counts reconcile with the corpus
    val total = df.agg(sum("n_docs")).head.getLong(0)
    assert(total == Tables.t(spark, sf, "documents").count())
  }

  test("emb_rank_fusion: five fused hits per probe, from a contributing list") {
    val df = run("emb_rank_fusion").cache()
    assert(df.groupBy("q_vec_id").count().filter(col("count") =!= 5).count() == 0)
    assert(df.select("q_vec_id").distinct().count() == 10)
    // every fused hit is in at least one retriever's top-10
    assert(df.filter(col("rank_cos") > 10 && col("rank_l2") > 10).count() == 0)
    // rrf bound: two first-place votes
    val cap = 2L * (1000000000000L / 61L)
    assert(df.filter(col("rrf_q") > cap).count() == 0)
  }

  test("emb_hard_negatives: margins and similarity ranges") {
    val df = run("emb_hard_negatives").cache()
    assert(df.count() == 50)
    Seq("pos_sim", "neg_sim").foreach { c =>
      assert(df.filter(col(c) < -1.001 || col(c) > 1.001).count() == 0, c)
    }
    // margin is exactly pos - neg
    assert(df.filter(
      abs(col("margin") - (col("pos_sim") - col("neg_sim"))) > 1e-12)
      .count() == 0)
    // positives/negatives have the right label relationship (spot check)
    val e = Tables.t(spark, sf, "embeddings").select("vec_id", "label")
    val joined = df.join(e.withColumnRenamed("vec_id", "pos_id")
      .withColumnRenamed("label", "pos_label"), "pos_id")
      .join(e.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("label", "neg_label"), "neg_id")
    assert(joined.filter(col("pos_label") =!= col("a_label")).count() == 0)
    assert(joined.filter(col("neg_label") === col("a_label")).count() == 0)
  }
}
