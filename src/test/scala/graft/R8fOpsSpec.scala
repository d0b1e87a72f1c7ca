package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the sixth R8 batch: LID confusion matrix,
  * drawdown/records, similarity calibration.
  */
class R8fOpsSpec extends SparkSpecBase {

  test("doc_lid_confusion: rows partition docs; fractions sum to 1 per truth") {
    val df = run("doc_lid_confusion").cache()
    assert(df.count() > 0)
    val total = df.agg(sum(col("n_docs"))).head.getLong(0)
    val nDocs = Tables.t(spark, sf, "documents")
      .filter(length(col("text")) >= 3).count()
    assert(total == nDocs)
    df.collect().groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val fsum = rows.map(_.getAs[Double]("frac")).sum
      assert(math.abs(fsum - 1.0) < 1e-9)
      rows.foreach { r =>
        assert(r.getAs[Boolean]("diagonal")
          == (r.getAs[String]("lang") == r.getAs[String]("pred_lang")))
      }
    }
  }

  test("ts_drawdown: imperative replay of one entity") {
    val df = run("ts_drawdown").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    val vs = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(_.getLong(0))
    var peak = Long.MinValue; var dd = 0L; var rec = 0L
    vs.foreach { v =>
      if (v > peak) { peak = v; rec += 1 }
      dd = math.max(dd, peak - v)
    }
    val got = df.filter(col("user_id") === u).head
    assert(got.getAs[Double]("max_drawdown") == dd / 100.0)
    assert(got.getAs[Long]("n_records") == rec)
    assert(got.getAs[Double]("peak_value") == peak / 100.0)
  }

  test("emb_sim_calibration: counts bounded by block pairing; rates valid") {
    val df = run("emb_sim_calibration").cache()
    assert(df.count() > 0)
    val nPairs = df.agg(sum(col("n_pairs"))).head.getLong(0)
    // blocks of 10 -> at most C(10,2) pairs per block
    val nVec = Tables.t(spark, sf, "embeddings").count()
    assert(nPairs <= (nVec / 10 + 1) * 45)
    df.collect().foreach { r =>
      val rate = r.getAs[Double]("same_rate")
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getAs[Long]("n_same") <= r.getAs[Long]("n_pairs"))
      val d = r.getAs[Long]("decile")
      assert(d >= -10 && d <= 9)
    }
  }

  test("doc_prefix_dedup: groups really share the prefix") {
    val df = run("doc_prefix_dedup").cache()
    assert(df.count() > 0)
    val r = df.head
    val pfx = r.getAs[String]("prefix")
    val n = Tables.t(spark, sf, "documents")
      .filter(substring(col("text"), 1, 40) === pfx).count()
    assert(n == r.getAs[Long]("n_docs") && n >= 2)
  }

  test("geo_wind_rose: shares sum to one; dominant sector has max count") {
    val df = run("geo_wind_rose").cache()
    assert(df.count() > 0)
    df.collect().groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
      val maxN = rows.map(_.getAs[Long]("n")).max
      rows.filter(_.getAs[Boolean]("dominant")).foreach { r =>
        assert(r.getAs[Long]("n") == maxN)
      }
      assert(rows.count(_.getAs[Boolean]("dominant")) == 1)
      rows.foreach { r =>
        val sct = r.getAs[Long]("sector")
        assert(sct >= 0 && sct <= 15)
      }
    }
  }

  test("emb_ivf_balance: shares sum to 1, balance averages to 1") {
    val df = run("emb_ivf_balance").cache()
    assert(df.count() > 0)
    val rows = df.collect()
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 1e-9)
    val meanBal = rows.map(_.getAs[Double]("balance")).sum / rows.length
    assert(math.abs(meanBal - 1.0) < 1e-9)
    val total = rows.map(_.getAs[Long]("n_vecs")).sum
    assert(total == Tables.t(spark, sf, "embeddings").count())
  }

  test("doc_triangle_count: brute-force triangle census agrees") {
    val df = run("doc_triangle_count").cache()
    assert(df.count() > 0)
    // rebuild the near-dup edge set imperatively from the op's own output
    // degrees, then recount triangles from a brute-force adjacency pass
    val pairs = SparkEntry.queries("doc_ngram_dedup")(spark, sf)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triCount = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    pairs.foreach { case (a, b) =>
      val common = adj(a).intersect(adj(b))
      common.foreach { c =>
        // every triangle (x<y<z) is credited exactly once: from its
        // lowest edge (x,y) with the third vertex z greatest
        if (a < b && b < c) {
          triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
        }
      }
    }
    df.collect().foreach { r =>
      assert(r.getAs[Long]("n_triangles")
        == triCount(r.getAs[Long]("doc_id")))
    }
  }

  test("doc_triangle_count: group algebra == brute force on a dup corpus") {
    // 3x duplicated corpus (id shift preserves nothing about text, so
    // replicas are byte-identical): every text group is a 3-clique, and
    // the r11 rep-graph decomposition must reproduce the brute-force
    // per-doc degree/triangle counts exactly
    val base = Tables.t(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
    val dup = (0 until 3).map(i => base.withColumn("doc_id",
      col("doc_id") + lit(i * 1000000000L))).reduce(_ union _)
    val dir = java.nio.file.Files.createTempDirectory("tridup").toString
    dup.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val df = SparkEntry.queries("doc_triangle_count")(spark, dir)
    val pairs = SparkEntry.queries("doc_ngram_dedup")(spark, dir)
      .select(col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triCount = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    pairs.foreach { case (a, b) =>
      adj(a).intersect(adj(b)).foreach { c =>
        if (a < b && b < c) {
          triCount(a) += 1; triCount(b) += 1; triCount(c) += 1
        }
      }
    }
    val rows = df.collect()
    assert(rows.nonEmpty)
    val outDocs = rows.map(_.getAs[Long]("doc_id")).toSet
    assert(outDocs == adj.keySet, // same doc universe as the edge set
      s"doc set mismatch: ${(outDocs -- adj.keySet).take(3)} / ${(adj.keySet -- outDocs).take(3)}")
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Long]("degree") == adj(id).size.toLong, s"degree $id")
      assert(r.getAs[Long]("n_triangles") == triCount(id), s"tri $id")
    }
    // duplication engaged the within-group terms: every doc has degree
    // >= 2 (its two clones) and >= 1 triangle (the clone 3-clique)
    assert(rows.forall(_.getAs[Long]("degree") >= 2))
    assert(rows.forall(_.getAs[Long]("n_triangles") >= 1))
  }

  test("q51_kmv_distinct: merge is lossless and estimates track exact") {
    val df = run("q51_kmv_distinct").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      assert(r.getAs[Boolean]("merge_lossless"))
      assert(r.getAs[Double]("est_full") == r.getAs[Double]("est_merged"))
      val exact = r.getAs[Long]("exact_distinct").toDouble
      val est = r.getAs[Double]("est_full")
      // saturated sketch: standard error ~ 1/sqrt(k-1) ~ 13%; allow 4 sigma.
      // unsaturated: the estimate IS the exact count
      if (r.getAs[Long]("n_kept") < 64) assert(est == exact)
      else assert(math.abs(est - exact) / exact < 0.52)
    }
  }
}
