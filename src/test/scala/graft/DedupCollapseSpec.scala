package graft

import org.apache.spark.sql.functions._

/** doc_cc_clusters' exact-first collapse (r8): identical texts must land
  * in one cluster with the group-min id, and the collapse must be
  * output-invariant — the cluster of every doc equals what the
  * uncollapsed pair graph would assign. Validated on sf0.001 where each
  * text is unique (collapse is the identity) and on a synthetic
  * duplicated corpus where it is not.
  */
class DedupCollapseSpec extends SparkSpecBase {

  test("sf corpus: every doc appears once, cluster_id <= doc_id semantics") {
    val out = run("doc_cc_clusters").collect()
    val n = Tables.t(spark, sf, "documents").count()
    assert(out.length == n)
    assert(out.forall(r => r.getAs[Long]("cluster_id") <= r.getAs[Long]("doc_id")))
    // cluster_size is consistent: sum of distinct (cluster, size) = n
    val sizes = out.groupBy(_.getAs[Long]("cluster_id")).map { case (c, rs) =>
      val s = rs.map(_.getAs[Long]("cluster_size")).distinct
      assert(s.length == 1, s"cluster $c has inconsistent sizes $s")
      s.head
    }
    assert(sizes.sum == n)
  }

  test("duplicated corpus: replicas join their original's cluster") {
    import spark.implicits._
    val base = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    // 3 byte-identical replicas per doc at shifted ids (the ScaleUp shape)
    val dup = (0 until 3).map(i => base.withColumn("doc_id",
      col("doc_id") + lit(i * 1000000000L))).reduce(_ union _)
    val dir = java.nio.file.Files.createTempDirectory("dupcorpus").toString
    dup.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("doc_cc_clusters")(spark, dir).collect()
    assert(out.length == base.count() * 3)
    val byDoc = out.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("cluster_id")).toMap
    // every replica must share its original's cluster (identical text =>
    // jaccard 1.0 via the collapse), and the label is the ORIGINAL id
    byDoc.foreach { case (id, cl) =>
      val orig = id % 1000000000L
      assert(byDoc(orig) == cl, s"replica $id split from original $orig")
    }
    // cluster sizes are multiples of 3 (every member triplicated)
    out.groupBy(_.getAs[Long]("cluster_id")).values.foreach { rs =>
      assert(rs.length % 3 == 0)
      assert(rs.head.getAs[Long]("cluster_size") == rs.length)
    }
  }

  test("duplicated SHORT texts stay singleton clusters (oracle parity)") {
    import spark.implicits._
    // texts < 20 chars have no shingles, hence no edges in the pair
    // graph: byte-identical copies must NOT be merged by the collapse
    val rows = Seq(
      (1L, "tiny dup", "en", "s1", 8),
      (2L, "tiny dup", "en", "s1", 8),
      (3L, "tiny dup", "en", "s2", 8),
      (4L, "another short one", "en", "s1", 17),
      (5L, "another short one", "en", "s2", 17),
      // and a long duplicated pair as the positive control
      (6L, "this text is comfortably longer than twenty characters", "en", "s1", 54),
      (7L, "this text is comfortably longer than twenty characters", "en", "s2", 54))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("shortdup").toString
    rows.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("doc_cc_clusters")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("cluster_id"), r.getAs[Long]("cluster_size"))).toMap
    assert(out.size == 7)
    Seq(1L, 2L, 3L, 4L, 5L).foreach { id =>
      assert(out(id) == (id, 1L), s"short doc $id not a singleton: ${out(id)}")
    }
    assert(out(6L) == (6L, 2L) && out(7L) == (6L, 2L))
  }
}
