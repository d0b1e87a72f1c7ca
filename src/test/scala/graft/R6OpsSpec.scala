package graft

import org.apache.spark.sql.functions._

/** Semantic specs for the round-6 operator batch: FIRMS ingest/footprint,
  * the full Gopher repetition battery, containment pairs, Bloom dedup,
  * char-trigram LID, ACF, Benford audit, forecast-cycle expansion, and
  * the Matryoshka truncation recall audit.
  */
class R6OpsSpec extends SparkSpecBase {
  import spark.implicits._

  test("geo_viirs_ingest: units, enums, and acq-time reconstruction") {
    val rows = run("geo_viirs_ingest").cache()
    assert(rows.count() > 0)
    // only known satellite/confidence codes survive (Option-chain drop)
    assert(rows.filter(!$"sat_id".isin(37849L, 43013L, 54234L)).count() == 0)
    assert(rows.filter(!$"conf".isin("Low", "Medium", "High")).count() == 0)
    // Kelvin range of the synthesized TI4/TI5 brightness temps
    assert(rows.filter($"bright_ti4_k" < 295.0 || $"bright_ti4_k" >= 345.0).count() == 0)
    // acq epoch is minute-aligned (the [H]HMM reconstruction)
    assert(rows.filter($"acq_epoch" % 60 =!= 0).count() == 0)
    rows.unpersist()
  }

  test("geo_hotspot_footprint: quads are centered and sized like scan x track") {
    val rows = run("geo_hotspot_footprint").cache()
    assert(rows.count() > 0)
    // opposite corners average to the same midpoint (parallelogram):
    // ws+en == es+wn within rounding slack
    val off = rows.filter(
      abs(($"ws_x" + $"en_x") - ($"es_x" + $"wn_x")) > 4
        || abs(($"ws_y" + $"en_y") - ($"es_y" + $"wn_y")) > 4
        || abs(($"ws_z" + $"en_z") - ($"es_z" + $"wn_z")) > 4).count()
    assert(off == 0)
    // footprint diagonal ~ sqrt(track^2 + scan^2) <= sqrt(2)*600m + slack
    val bad = rows.filter(
      sqrt(pow($"en_x" - $"ws_x", 2) + pow($"en_y" - $"ws_y", 2)
        + pow($"en_z" - $"ws_z", 2)) > 860.0).count()
    assert(bad == 0)
    rows.unpersist()
  }

  test("doc_gopher_repetition: fractions bounded; passes == conjunction") {
    val rows = run("doc_gopher_repetition").cache()
    assert(rows.count() == Tables.t(spark, sf, "documents").count())
    val fracs = Seq("top2_frac", "top3_frac", "top4_frac",
      "dup5_frac", "dup6_frac", "dup7_frac")
    fracs.foreach { c =>
      assert(rows.filter(col(c) < 0.0 || col(c) > 1.5).count() == 0, c)
    }
    val bad = rows.filter($"passes" =!=
      ($"top2_frac" <= 0.20 && $"top3_frac" <= 0.18 && $"top4_frac" <= 0.16
        && $"dup5_frac" <= 0.15 && $"dup6_frac" <= 0.14
        && $"dup7_frac" <= 0.13)).count()
    assert(bad == 0)
    rows.unpersist()
  }

  test("doc_containment_pairs: containment >= jaccard and >= 0.9") {
    val rows = run("doc_containment_pairs").collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("containment")
      val j = r.getAs[Double]("jaccard")
      assert(c >= 0.9 && c <= 1.0 + 1e-12)
      assert(c >= j - 1e-12) // containment dominates Jaccard
      assert(r.getAs[Boolean]("jaccard_missed") == (j < 0.5))
    }
  }

  test("doc_bloom_dedup: no false negatives, FP flag consistent") {
    val rows = run("doc_bloom_dedup").cache()
    // a Bloom filter never misses a real member
    assert(rows.filter($"is_dup" && !$"maybe_dup").count() == 0)
    assert(rows.filter($"false_positive" =!= ($"maybe_dup" && !$"is_dup")).count() == 0)
    // covers the whole incoming batch
    val incoming = Tables.t(spark, sf, "documents")
      .filter($"source" === "src0").count()
    assert(rows.count() == incoming)
    rows.unpersist()
  }

  test("doc_char_lid: predictions drawn from the label set; strong self-agreement") {
    val rows = run("doc_char_lid").cache()
    val langs = Tables.t(spark, sf, "documents")
      .select("lang").distinct().as[String].collect().toSet
    assert(rows.filter(!$"pred_lang".isin(langs.toSeq: _*)).count() == 0)
    // the synthetic corpus's "languages" share one vocabulary, so
    // perfect LID is impossible — but the trigram model must still beat
    // the predict-the-majority-class baseline
    val n = rows.count().toDouble
    val agree = rows.filter($"agree").count().toDouble
    val majority = Tables.t(spark, sf, "documents")
      .groupBy("lang").count().agg(max("count")).as[Long].head.toDouble / n
    assert(agree / n > majority, s"agreement ${agree / n} <= majority $majority")
    rows.unpersist()
  }

  test("ts_acf: coefficients in [-1, 1]") {
    val rows = run("ts_acf").cache()
    assert(rows.count() > 0)
    Seq("acf1", "acf2", "acf3", "acf4").foreach { c =>
      assert(rows.filter(abs(col(c)) > 1.0 + 1e-9).count() == 0, c)
    }
    rows.unpersist()
  }

  test("ts_benford: chi2 >= 0, at most 9 digit bins, counts reconcile") {
    val rows = run("ts_benford").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      assert(r.getAs[Long]("n_digits") <= 9)
      assert(r.getAs[Long]("n") > 0)
    }
  }

  test("ts_forecast_cycle: base aligned to the update interval, update in the future") {
    val rows = run("ts_forecast_cycle")
      .join(
        Tables.t(spark, sf, "region").select(
          $"r_regionkey".cast("long").as("model_id"),
          (($"r_regionkey" % 4 + 1) * 3600L).as("upd_sec"),
          (($"r_regionkey" % 4 + 1) * 600L).as("delay_sec")),
        "model_id").cache()
    assert(rows.count() > 0)
    assert(rows.filter($"base_sec" % $"upd_sec" =!= 0).count() == 0)
    assert(rows.filter($"base_sec" > $"hour_sec" - $"delay_sec").count() == 0)
    assert(rows.filter($"next_update_sec" <= $"base_sec").count() == 0)
    // the covered horizon shrinks as the run ages: 0 < n_steps <= 48
    assert(rows.filter($"n_steps" <= 0 || $"n_steps" > 48).count() == 0)
    rows.unpersist()
  }

  test("geo_orbit_nodes: node/pole counts match the orbit, poles sit at inclination") {
    val rows = run("geo_orbit_nodes").cache()
    (0 until 5).foreach { sat =>
      val nodes = rows.filter($"sat_id" === sat && $"kind" === "node").collect()
      val poles = rows.filter($"sat_id" === sat && $"kind" === "pole").collect()
      // ~15.2 rev/day: one ascending node and one north-pole pass per rev
      assert(nodes.length >= 13 && nodes.length <= 17, s"sat $sat nodes ${nodes.length}")
      assert(poles.length >= 13 && poles.length <= 17, s"sat $sat poles ${poles.length}")
      nodes.foreach { r =>
        val v = r.getAs[Double]("v"); val t = r.getAs[Double]("t")
        assert(v >= -180.0 && v <= 180.0 && t >= 0.0 && t <= 1440.0)
      }
      // max latitude == inclination for a circular-ish orbit
      val inc = 51.6 + sat * 2.0
      poles.foreach { r =>
        assert(math.abs(r.getAs[Double]("v") - inc) < 1.5,
          s"sat $sat pole lat ${r.getAs[Double]("v")} vs inc $inc")
      }
    }
    rows.unpersist()
  }

  test("doc_pagerank: mass conserved (minus floor leak), floor = teleport share") {
    val rows = run("doc_pagerank").cache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rows.count() == nDocs)
    val total = rows.agg(sum($"pr_units")).as[Long].head
    val TOT = 1000000000000000L
    // floors leak at most ~1 unit per edge per round plus damping floor
    assert(total <= TOT && total > TOT - 100L * nDocs * 8)
    val base = (TOT * 3 / 20) / nDocs
    assert(rows.filter($"pr_units" < base).count() == 0)
    // the graph is irregular, so ranks must actually differentiate
    assert(rows.select("pr_units").distinct().count() > 10)
    rows.unpersist()
  }

  test("ts_holt: matches a driver-side Holt recursion on one entity") {
    val rows = run("ts_holt").filter($"user_id" === 7)
      .orderBy($"ts_sec", $"event_id").collect()
    assert(rows.nonEmpty)
    val series = Tables.events(spark, sf)
      .filter($"user_id" === 7)
      .orderBy($"ts_sec", $"event_id")
      .select(expr("CAST(round(value * 100.0) AS BIGINT)"))
      .as[Long].collect()
    val (alpha, beta) = (0.5, 0.3)
    rows.zipWithIndex.foreach { case (r, i) =>
      val t = i + 8 // row i corresponds to series position i+8
      val win = series.slice(t - 8, t + 1)
      var lv = win(0).toDouble; var bv = 0.0
      win.drop(1).foreach { y =>
        val lp = lv
        lv = alpha * y + (1 - alpha) * (lv + bv)
        bv = beta * (lv - lp) + (1 - beta) * bv
      }
      assert(math.abs(r.getAs[Double]("level") - lv / 100.0) < 1e-6,
        s"row $i level")
      assert(math.abs(r.getAs[Double]("trend") - bv / 100.0) < 1e-6,
        s"row $i trend")
      assert(math.abs(r.getAs[Double]("forecast_1")
        - (r.getAs[Double]("level") + r.getAs[Double]("trend"))) < 1e-9)
    }
  }

  test("doc_quality_logreg: 17 finite weights; accuracy at least the majority baseline") {
    val rows = run("doc_quality_logreg").collect()
    assert(rows.length == 17)
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      assert(!w.isNaN && !w.isInfinite && math.abs(w) < 100.0)
    }
    val acc = rows.head.getAs[Double]("accuracy")
    val docs = Tables.t(spark, sf, "documents")
    val n = docs.count().toDouble
    val en = docs.filter(col("lang") === "en").count().toDouble
    val majority = math.max(en, n - en) / n
    assert(acc >= majority - 1e-9, s"acc $acc < majority $majority")
  }

  test("ts_sax: word length matches full frames; alphabet is a-d") {
    val rows = run("ts_sax").cache()
    val perUser = Tables.events(spark, sf).groupBy("user_id").count()
    val joined = rows.join(perUser, "user_id").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val word = r.getAs[String]("sax_word")
      val nw = r.getAs[Long]("n_windows")
      assert(word.length == nw)
      assert(word.forall(c => c >= 'a' && c <= 'd'))
      assert(nw == r.getAs[Long]("count") / 8)
    }
    rows.unpersist()
  }

  test("doc_ngram_lm_interp: positive NLL, keep flag consistent") {
    val rows = run("doc_ngram_lm_interp").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nll = r.getAs[Double]("mean_nll")
      assert(nll > 0.0 && nll < 20.0) // -ln of probs in (0,1), corpus-scale
      assert(r.getAs[Boolean]("keep") == (nll <= 6.0))
      assert(r.getAs[Long]("n_bigrams") > 0)
    }
  }

  test("mm_motion_tiles: best shift beats or ties every other shift (spot check)") {
    val rows = run("mm_motion_tiles").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val s = r.getAs[Int]("best_shift")
      assert(s >= -2 && s <= 2)
      assert(r.getAs[Long]("best_sad") >= 0)
      assert(r.getAs[Boolean]("scene_change") == (r.getAs[Long]("best_sad") > 320L))
    }
    // identical consecutive frames would give sad=0 at shift 0; with
    // independent random text the best SAD should still never exceed the
    // worst possible 16 x 255
    assert(rows.filter($"best_sad" > 16L * 255L).count() == 0)
    rows.unpersist()
  }

  test("geo_line_of_sight: obstruction consistent with visibility; heights on the DEM") {
    val rows = run("geo_line_of_sight").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mo = r.getAs[Double]("max_obstruction")
      assert(r.getAs[Boolean]("visible") == (mo <= 0.0))
      // DEM range is 100..600 plus masts
      assert(r.getAs[Double]("h_obs") >= 120.0 && r.getAs[Double]("h_obs") <= 620.0)
      assert(r.getAs[Double]("h_tgt") >= 110.0 && r.getAs[Double]("h_tgt") <= 610.0)
      // obstruction bounded by the DEM relief
      assert(mo < 520.0 && mo > -620.0)
    }
  }

  test("ts_entropy: bounds [0, ln k]; single-type entities are degenerate") {
    val rows = run("ts_entropy").cache()
    assert(rows.count() > 0)
    val bad = rows.filter($"entropy" < -1e-9
      || $"entropy" > log($"n_types".cast("double")) + 1e-6).count()
    assert(bad == 0)
    assert(rows.filter($"n_types" === 1 && !$"degenerate").count() == 0)
    rows.unpersist()
  }

  test("doc_dedup_decision: total coverage, keepers kept, no keeper chains") {
    val rows = run("doc_dedup_decision").cache()
    val nDocs = Tables.t(spark, sf, "documents").count()
    assert(rows.count() == nDocs) // one verdict per document
    // every keeper a dropped doc defers to must itself be kept
    val keepers = rows.filter($"status" === "kept")
      .select($"doc_id".as("keeper_id"))
    val dangling = rows.filter($"status" =!= "kept")
      .join(keepers, Seq("keeper_id"), "left_anti").count()
    assert(dangling == 0, s"$dangling dropped docs defer to a non-kept keeper")
    // keepers defer to themselves; dropped docs never do
    assert(rows.filter($"status" === "kept" && $"keeper_id" =!= $"doc_id").count() == 0)
    assert(rows.filter($"status" =!= "kept" && $"keeper_id" === $"doc_id").count() == 0)
    // a keeper has the smallest id in its group
    assert(rows.filter($"keeper_id" > $"doc_id").count() == 0)
    rows.unpersist()
  }

  test("geo_track_simplify: endpoints kept, points genuine, tracks shrink") {
    val rows = run("geo_track_simplify").cache()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id")
      .orderBy($"ts_sec", $"event_id")
    val pts = Tables.events(spark, sf)
      .withColumn("lat", ($"user_id" * 37 % 140 - 70).cast("double") + $"value" / 1000.0)
      .withColumn("lon", ($"event_id" * 73 % 360 - 180).cast("double") + $"value" / 2000.0)
      .withColumn("rn", row_number().over(w))
      .select($"user_id", $"rn", $"lat", $"lon")
    // every kept point is a real track point with its original coords
    val fake = rows.join(pts, Seq("user_id", "rn"), "left")
      .filter(pts("lat").isNull
        || abs(rows("lat") - pts("lat")) > 1e-12
        || abs(rows("lon") - pts("lon")) > 1e-12).count()
    assert(fake == 0)
    // first/last of every track survive; tracks actually shrank
    val perUser = pts.groupBy("user_id").agg(min("rn").as("lo"),
      max("rn").as("hi"), count(lit(1)).as("n"))
    val missingEnds = perUser.join(rows, Seq("user_id"))
      .groupBy($"user_id", $"lo", $"hi", $"n")
      .agg(sum(when($"rn" === $"lo", 1).otherwise(0)).as("hasLo"),
        sum(when($"rn" === $"hi", 1).otherwise(0)).as("hasHi"),
        count(lit(1)).as("kept"))
      .filter($"hasLo" === 0 || $"hasHi" === 0 || $"kept" > $"n").count()
    assert(missingEnds == 0)
    assert(rows.count() < pts.count()) // 3 rounds keep at most 9 pts/track
    rows.unpersist()
  }

  test("emb_centroid_drift: per-label halves, drift flag consistent") {
    val rows = run("emb_centroid_drift").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_a") > 0 && r.getAs[Long]("n_b") > 0)
      val dsq = r.getAs[Double]("drift_sq")
      assert(dsq >= 0.0)
      assert(r.getAs[Boolean]("drifted") == (dsq > 0.01 + 1e-12)
        || math.abs(dsq - 0.01) < 1e-6) // flag computed in the quantized domain
    }
  }

  test("doc_drift_kl: KL non-negative-ish, one row per lang with both sides") {
    val rows = run("doc_drift_kl").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // Gibbs: smoothed KL over the full 256-bucket support is >= 0
      // up to the 1e-6 ln quantization
      val kl = r.getAs[Double]("kl_nats")
      assert(kl > -1e-4 && kl < 10.0)
      assert(r.getAs[Boolean]("drifted") == (kl > 0.05))
      assert(r.getAs[Long]("n_incoming") > 0 && r.getAs[Long]("n_corpus") > 0)
    }
  }

  test("mm_scene_segments: segments tile each camera's stream without overlap") {
    val rows = run("mm_scene_segments").cache()
    assert(rows.count() > 0)
    rows.collect().groupBy(_.getAs[String]("source")).foreach { case (_, segs) =>
      val sorted = segs.sortBy(_.getAs[Long]("seg_id"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("first_doc_id") < r.getAs[Long]("last_doc_id")
          || r.getAs[Long]("n_frames") == 2)
        assert(r.getAs[Double]("mean_dist") >= 0.0)
      }
      // consecutive segments don't overlap (first of next > first of prev)
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y.getAs[Long]("first_doc_id") >= x.getAs[Long]("last_doc_id")
            - 1) // the cut frame starts the next segment
        case _ =>
      }
    }
    rows.unpersist()
  }

  test("emb_knn_graph: degree <= 4, reciprocity bounded by degree") {
    val rows = run("emb_knn_graph").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val deg = r.getAs[Long]("degree")
      val rec = r.getAs[Long]("n_reciprocal")
      assert(deg >= 1 && deg <= 4)
      assert(rec >= 0 && rec <= deg)
      assert(r.getAs[Boolean]("well_linked") == (deg == 4 && rec >= 2))
    }
    // bucketed top-4 should link most of the corpus
    assert(rows.length > 100)
  }

  test("ts_forecast_eval: MAEs non-negative, flag consistent, evals counted") {
    val rows = run("ts_forecast_eval").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mh = r.getAs[Double]("mae_holt")
      val mn = r.getAs[Double]("mae_naive")
      assert(mh >= 0.0 && mn >= 0.0)
      assert(r.getAs[Boolean]("beats_naive") == (mh < mn)
        || math.abs(mh - mn) < 1e-9)
      assert(math.abs(r.getAs[Double]("bias")) <= mh + 1e-9)
      assert(r.getAs[Long]("n_evals") > 0)
    }
  }

  test("emb_mrl_recall: recall in [0,1] over k=5, and not degenerate") {
    val rows = run("emb_mrl_recall").collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("k") == 5L)
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // 16 of 64 prefix dims should retain some of the neighborhood
    assert(rows.map(_.getAs[Double]("recall")).sum > 0.0)
  }
}
