package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

class TextKernelSpec extends SparkSpecBase {

  test("winnow kernel: deterministic, sorted, distinct") {
    import spark.implicits._
    val df = Seq((1L, "a" * 10 + "the quick brown fox jumps over the lazy dog " * 5))
      .toDF("id", "text")
    val fps = df.select(winnow_fingerprints(col("text")).as("f"))
      .head.getSeq[Long](0)
    assert(fps.nonEmpty)
    assert(fps == fps.sorted && fps.distinct == fps)
    // identical input -> identical fingerprints
    val fps2 = df.select(winnow_fingerprints(col("text")).as("f"))
      .head.getSeq[Long](0)
    assert(fps == fps2)
  }

  test("minhash kernel: near-identical texts share most of the signature") {
    import spark.implicits._
    val base = "spark filter join group window batch stream value data " * 10
    val near = base.dropRight(6) + "xyzzy!"
    val far = "completely different content with other words entirely " * 10
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("id", "text")
    val sigs = df.select(col("id"), minhash_signature(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def overlap(a: Seq[Long], b: Seq[Long]) = a.zip(b).count { case (x, y) => x == y }
    assert(sigs(1).length == 32)
    assert(overlap(sigs(1), sigs(2)) >= 24, s"near: ${overlap(sigs(1), sigs(2))}/32")
    assert(overlap(sigs(1), sigs(3)) <= 8, s"far: ${overlap(sigs(1), sigs(3))}/32")
  }

  test("doc_fingerprint: stable, positive counts, min_fp is a member") {
    val a = run("doc_fingerprint").collect()
    val b = run("doc_fingerprint").collect()
    assert(a.nonEmpty && a.sameElements(b))
    a.foreach { r =>
      assert(r.getAs[Long]("n_fingerprints") > 0)
    }
    // identical documents produce identical fingerprint profiles
    val byText = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), md5(col("text").cast("binary")).as("h")).collect()
      .groupBy(_.getAs[String]("h")).values.filter(_.length > 1)
    val fps = a.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_fingerprints"), r.getAs[Long]("min_fp"))).toMap
    byText.foreach { group =>
      val vals = group.flatMap(g => fps.get(g.getAs[Long]("doc_id"))).distinct
      assert(vals.length <= 1, s"dup docs disagree: $vals")
    }
  }

  test("doc_minhash_lsh still covers all exact-duplicate pairs (kernel path)") {
    val dups = Tables.t(spark, sf, "documents")
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(collect_list("doc_id").as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(ids, a -> transform(ids, b -> struct(least(a,b) AS a, greatest(a,b) AS b))))"))
        .as("p"))
      .filter(col("p.a") < col("p.b"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b")).distinct()
    val missed = dups.join(run("doc_minhash_lsh"), Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0)
  }
}
