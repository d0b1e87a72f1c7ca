package graft

import org.apache.spark.sql.functions._

/** Specs for the corpus-curation ops: CC dedup clustering, deterministic
  * sampling / splitting / capping, TF-IDF.
  */
class PipelineOpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("connectedComponents: converges on a 60-node chain plus extras") {
    // chain 0-1-...-59 (diameter 60 — needs pointer jumping, not just
    // k-hop propagation), a separate triangle, and a singleton.
    val chain = (0L until 59L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L))
    val pairs = (chain ++ tri).toDF("src", "dst")
    val edges = pairs.union(pairs.select($"dst", $"src"))
    val nodes = ((0L to 59L) ++ Seq(100L, 101L, 102L, 500L)).toDF("node")
    val got = operators.TextOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 59L).foreach(n => assert(got(n) == 0L, s"chain node $n"))
    Seq(100L, 101L, 102L).foreach(n => assert(got(n) == 100L))
    assert(got(500L) == 500L) // singleton labels itself
    assert(got.size == 64)
  }

  test("connectedComponents: agrees with union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { _ =>
      val n = 80
      val edges = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      // union-find reference
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = (0 until n).map { i =>
        // component min = min of all members sharing the root
        val r = find(i)
        (0 until n).filter(j => find(j) == r).min.toLong
      }
      val pairsDf = edges.toDF("src", "dst")
      val sym = pairsDf.union(pairsDf.select($"dst", $"src"))
      val nodes = (0L until n.toLong).toDF("node")
      val got = operators.TextOps.connectedComponents(nodes, sym)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until n).foreach(i => assert(got(i.toLong) == want(i), s"node $i"))
    }
  }

  test("mortonCode: bit-exact roundtrip against reference interleave") {
    val rnd = new scala.util.Random(7)
    val samples = Seq.fill(50)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val got = samples.toDF("x", "y")
      .select(sources.Sources.mortonCode(col("x"), col("y")).as("m"))
      .collect().map(_.getLong(0))
    samples.map((ref _).tupled).zip(got).foreach { case (w, g) => assert(w == g) }
  }

  test("doc_cc_clusters: partition of the corpus; pairs land in one cluster") {
    val cc = run("doc_cc_clusters").cache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(cc.count() == nDocs) // every doc exactly once
    assert(cc.select("doc_id").distinct().count() == nDocs)
    // cluster_id is the min doc_id of its cluster
    val bad = cc.groupBy("cluster_id").agg(min("doc_id").as("mn"))
      .filter($"cluster_id" =!= $"mn").count()
    assert(bad == 0)
    // cluster sizes reconcile
    assert(cc.select(sum("cluster_size")).head.getLong(0) >= nDocs)
    cc.unpersist()
  }

  test("doc_sample_hash: deterministic across runs, plausible rate") {
    val a = run("doc_sample_hash").collect().map(_.getLong(0))
    val b = run("doc_sample_hash").collect().map(_.getLong(0))
    assert(a.sameElements(b))
    val n = Tables.t(spark, sf, "documents").count().toDouble
    assert(a.length > 0 && a.length < n * 0.35) // ~12.5% expected
  }

  test("doc_stratified_sample: exactly ceil(n/5) per language") {
    val perLang = run("doc_stratified_sample")
      .groupBy("lang").agg(count(lit(1)).as("k"), max("n_lang").as("n"))
      .collect()
    perLang.foreach { r =>
      assert(r.getAs[Long]("k") == (r.getAs[Long]("n") + 4) / 5)
    }
  }

  test("doc_train_test_split: covers the whole corpus, train dominates") {
    val rows = run("doc_train_test_split").collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total == Tables.t(spark, sf, "documents").count())
    val bySplit = rows.groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n_docs")).sum)
    assert(bySplit("train") > bySplit.getOrElse("valid", 0L))
    assert(bySplit("train") > bySplit.getOrElse("test", 0L))
  }

  test("doc_domain_cap: kept <= 20 and <= total per bucket") {
    run("doc_domain_cap").collect().foreach { r =>
      val (tot, kept) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_kept"))
      assert(kept <= 20 && kept <= tot && kept == math.min(tot, 20L))
    }
  }

  test("doc_unigram_logprob: every doc scored; common-token docs are fluent") {
    val rows = run("doc_unigram_logprob").collect()
    assert(rows.length == Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val nll = r.getAs[Double]("mean_nll")
      assert(nll > 0 && nll < 20.0) // surprisal of a seen token is bounded
      val v = r.getAs[String]("verdict")
      assert(if (nll <= 4.0) v == "fluent" else v == "rare")
    }
  }

  test("geo_dem_bilinear: interpolation stays inside the corner value range") {
    // elev values lie in [100, 600); bilinear is a convex combination
    val rows = run("geo_dem_bilinear").collect()
    assert(rows.length == Tables.events(spark, sf).count())
    rows.foreach { r =>
      val e = r.getAs[Double]("elev_m")
      assert(e >= 100.0 && e < 600.0)
    }
  }

  test("emb_pq_topk: 5 ADC hits per query, distances ascending") {
    val rows = run("emb_pq_topk").collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_vec_id"))
    assert(byQ.size == 10)
    byQ.values.foreach { rs =>
      assert(rs.length == 5)
      val sorted = rs.sortBy(_.getAs[Int]("rn"))
      val ds = sorted.map(_.getAs[Double]("adc_dist"))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      val ids = rs.map(_.getAs[Long]("n_vec_id"))
      assert(ids.distinct.length == ids.length)
    }
  }

  test("doc_tfidf: <=3 terms per doc, rarer same-tf term ranks higher") {
    val rows = run("doc_tfidf").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      rs.sortBy(_.getAs[Int]("rn")).sliding(2).foreach {
        case Array(hi, lo) =>
          val (tfH, dfH) = (hi.getAs[Long]("tf"), hi.getAs[Long]("df"))
          val (tfL, dfL) = (lo.getAs[Long]("tf"), lo.getAs[Long]("df"))
          assert(tfH > tfL || (tfH == tfL && dfH <= dfL))
        case _ =>
      }
    }
  }
}
