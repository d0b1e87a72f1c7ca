package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the late round-6 additions: Hampel repair,
  * context-window chunking invariants, Heaps-curve monotonicity, and the
  * three compression-path probes (JL projection, sign-binarized hamming,
  * RLE masks, gray-world gains).
  */
class R11OpsSpec extends SparkSpecBase {

  test("ts_hampel: repairs are medians, non-outliers pass through") {
    val rows = run("ts_hampel").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("value")
      val med = r.getAs[Double]("local_median")
      val rep = r.getAs[Double]("repaired")
      if (r.getAs[Boolean]("is_outlier")) assert(rep == med)
      // non-outlier pass-through up to the cents quantization
      else assert(math.abs(rep - v) < 0.005 + 1e-9, s"$rep vs $v")
    }
  }

  test("doc_chunk_windows: stride-48 starts, 64-cap, full doc coverage") {
    val rows = run("doc_chunk_windows").collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("chunk_idx"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i)
        assert(r.getAs[Long]("tok_start") == i * 48L + 1)
        val n = r.getAs[Long]("n_chunk_tokens")
        assert(n >= 1 && n <= 64)
        assert(r.getAs[Long]("tok_end") == r.getAs[Long]("tok_start") + n - 1)
      }
      // consecutive chunks overlap (or abut) and each extends the coverage
      for (Seq(a, b) <- sorted.toSeq.sliding(2) if sorted.length > 1) {
        assert(b.getAs[Long]("tok_start") <= a.getAs[Long]("tok_end") + 1)
        assert(b.getAs[Long]("tok_end") > a.getAs[Long]("tok_end"))
      }
    }
  }

  test("doc_heaps_curve: N and V are non-decreasing, V bounded by N") {
    val rows = run("doc_heaps_curve").collect().sortBy(_.getAs[Long]("ckpt"))
    assert(rows.length == 10)
    for (Seq(a, b) <- rows.toSeq.sliding(2)) {
      assert(a.getAs[Long]("n_tokens") <= b.getAs[Long]("n_tokens"))
      assert(a.getAs[Long]("v_types") <= b.getAs[Long]("v_types"))
    }
    rows.foreach { r =>
      assert(r.getAs[Long]("v_types") <= r.getAs[Long]("n_tokens"))
      assert(r.getAs[Long]("ttr_x1e6") ==
        r.getAs[Long]("v_types") * 1000000L / r.getAs[Long]("n_tokens"))
    }
  }

  test("emb_jl_sketch and emb_binary_hash: recall is n_overlap/10 for 10 probes") {
    Seq("emb_jl_sketch", "emb_binary_hash").foreach { q =>
      val rows = run(q).collect()
      assert(rows.length == 10, q)
      rows.foreach { r =>
        val n = r.getAs[Long]("n_overlap")
        assert(n >= 0 && n <= 10)
        assert(r.getAs[Double]("recall_at_10") == n / 10.0)
      }
    }
  }

  test("mm_rle_mask: runs are disjoint, ordered, and cover every on-pixel") {
    val rows = run("mm_rle_mask").collect()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    // cross-check one doc against a direct recount of thresholded bytes
    val docs = Tables.t(spark, sf, "documents")
      .filter(length(col("text")) >= 16)
      .select(col("doc_id"), col("text")).limit(5).collect()
    docs.foreach { dr =>
      val id = dr.getAs[Long]("doc_id")
      val mask = dr.getAs[String]("text").map(_ >= 110)
      val runs = byDoc.getOrElse(id, Array.empty)
        .sortBy(_.getAs[Long]("run_idx"))
      val covered = runs.flatMap { r =>
        val s0 = r.getAs[Long]("start_pos").toInt
        (s0 until s0 + r.getAs[Long]("run_len").toInt)
      }
      assert(covered.toSet == mask.zipWithIndex.collect {
        case (true, i) => i + 1
      }.toSet, s"doc $id")
      // maximal runs: position before each start is off (or doc start)
      runs.foreach { r =>
        val s0 = r.getAs[Long]("start_pos").toInt
        if (s0 > 1) assert(!mask(s0 - 2), s"run at $s0 not maximal, doc $id")
      }
    }
  }

  test("ts_time_weighted: TWAP equals the duration-weighted hand fold") {
    import spark.implicits._
    val rows = run("ts_time_weighted").collect()
    assert(rows.nonEmpty)
    // recompute one entity by hand from the raw events
    val uid = rows.head.getAs[Long]("user_id")
    val evs = Tables.events(spark, sf)
      .filter(col("user_id") === uid)
      .select(col("ts_sec"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("ts_sec"), r.getAs[Long]("event_id"),
        r.getAs[Double]("value")))
      .sortBy(t => (t._1, t._2))
    val held = evs.zip(evs.tail).map { case ((ts, _, v), (ts2, _, _)) =>
      (math.floor(v * 100.0 + 0.5).toLong, ts2 - ts)
    }.filter(_._2 > 0)
    val num = held.map { case (c, d) => c * d }.sum
    val den = held.map(_._2).sum
    val got = rows.find(_.getAs[Long]("user_id") == uid).get
    assert(got.getAs[Long]("span_sec") == den)
    assert(got.getAs[Double]("twap") == num.toDouble / (den.toDouble * 100.0))
  }

  test("mm_channel_balance: gains invert channel imbalance exactly") {
    val rows = run("mm_channel_balance").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (sr, sg, sb) = (r.getAs[Long]("s_r"), r.getAs[Long]("s_g"),
        r.getAs[Long]("s_b"))
      val tot = sr + sg + sb
      Seq(("gain_r_x1e6", sr), ("gain_g_x1e6", sg), ("gain_b_x1e6", sb))
        .foreach { case (cName, s) =>
          assert(r.getAs[Long](cName) == tot * 1000000L / (3 * s))
        }
    }
  }
}
