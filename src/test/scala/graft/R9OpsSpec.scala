package graft

import graft.operators.Geo
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Semantics checks for the round-5 additions: grid-to-grid raster warp
  * and the FEMS/NFDRS per-station observation store.
  */
class R9OpsSpec extends SparkSpecBase {

  test("geo_grid_resample: full target grid, renormalized nodata bilinear") {
    val rows = run("geo_grid_resample").cache()
    // every target cell present exactly once (left join keeps off-grid)
    assert(rows.count() == 50L * 40L)
    assert(rows.select(col("ti"), col("tj")).distinct().count() == 50L * 40L)
    val collected = rows.collect()
    // cells south of the source grid's northing origin must be nodata
    val invalid = collected.filter(!_.getAs[Boolean]("valid"))
    assert(invalid.nonEmpty)
    invalid.foreach(r => assert(r.isNullAt(r.fieldIndex("value"))))
    // valid cells: value within the synthetic raster's range [50, 550)
    val valid = collected.filter(_.getAs[Boolean]("valid"))
    assert(valid.nonEmpty)
    valid.foreach { r =>
      val v = r.getAs[Double]("value")
      assert(v >= 50.0 && v < 550.0)
    }
    // bilinear sanity: recompute one valid interior cell by hand
    val r0 = valid.maxBy(_.getAs[Long]("ti")) // far north = deep inside grid
    val latC = r0.getAs[Double]("lat"); val lonC = r0.getAs[Double]("lon")
    val utm = Geo.withUtm(
      spark.range(1).select(lit(latC).as("lat"), lit(lonC).as("lon")),
      col("lat"), col("lon")).collect()(0)
    // Spark round(x, 3) semantics: BigDecimal HALF_UP on the double
    def r3(x: Double): Double =
      BigDecimal.valueOf(x).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val fx = (r3(utm.getAs[Double]("utm_easting")) - 500000.0) / 1000.0
    val fy = (r3(utm.getAs[Double]("utm_northing")) - 4000000.0) / 1000.0
    val i = math.floor(fx).toLong; val j = math.floor(fy).toLong
    val di = fx - math.floor(fx); val dj = fy - math.floor(fy)
    def src(si: Long, sj: Long): Option[Double] =
      if (si < 0 || si > 199 || sj < 0 || sj > 299) None
      else if ((si * 7 + sj * 11) % 97 == 0) None
      else Some(((si * 31 + sj * 17) % 500).toDouble + 50.0)
    val terms = for {
      ci <- Seq(0, 1); cj <- Seq(0, 1)
      v <- src(i + ci, j + cj)
    } yield {
      val w = (if (ci == 0) 1.0 - di else di) * (if (cj == 0) 1.0 - dj else dj)
      (w, w * v)
    }
    val wsum = terms.map(_._1).sum
    assert(wsum > 0.0)
    val expect = terms.map(_._2).sum / wsum
    assert(math.abs(r0.getAs[Double]("value") - expect) < 1e-9)
  }

  test("ts_alpha_beta: tap invariants and maneuver flag consistency") {
    // steady-state unbiasedness: a constant series is reproduced exactly
    // (position taps sum to 1, velocity and innovation taps to 0)
    val rows = run("ts_alpha_beta").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val innov = r.getAs[Double]("innovation")
      assert(r.getAs[Boolean]("maneuver") == (math.abs(innov) > 20.0))
    }
    // direct kernel check through the public query on a synthetic
    // constant-valued entity is impossible (fixed input tables), so
    // assert the linear-map invariants numerically via a scalar fold
    val alpha = 0.5; val beta = 0.1
    var x = 1.0; var v = 0.0; var rr = 0.0
    for (_ <- 0 until 8) { val xp = x + v; rr = 1.0 - xp; x = xp + alpha * rr; v += beta * rr }
    assert(math.abs(x - 1.0) < 1e-12) // constant in -> constant out
    assert(math.abs(v) < 1e-12 && math.abs(rr) < 1e-12)
  }

  test("geo_look_angles: geometry ranges and a hand-checked elevation") {
    val rows = run("geo_look_angles").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val el = r.getAs[Double]("el_deg"); val az = r.getAs[Double]("az_deg")
      val rng = r.getAs[Double]("range_km"); val gd = r.getAs[Double]("gd_km")
      assert(el >= 25.0 && el <= 90.0)
      assert(az >= 0.0 && az < 360.0)
      assert(gd <= 1000.0)
      // slant range bracketed by the straight-up and horizon extremes
      assert(rng >= 550.0 - 1e-9 && rng <= 1300.0)
      // elevation from the central angle, recomputed directly
      val th = gd / 6371.0
      val elRef = math.toDegrees(
        math.atan2(math.cos(th) - 6371.0 / 6921.0, math.sin(th)))
      assert(math.abs(el - elRef) < 5e-3)
    }
  }

  test("doc_wordlist_filter: category accounting and action precedence") {
    val rows = run("doc_wordlist_filter").cache()
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.count() == n) // every doc scored, hit or not
    rows.collect().foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      assert(hits == r.getAs[Long]("n_perf") + r.getAs[Long]("n_sensitive"))
      val action = r.getAs[String]("action")
      if (r.getAs[Long]("n_hard") > 0) assert(action == "drop")
      else if (hits * 1000 > r.getAs[Long]("n_tokens") * 25)
        assert(action == "review")
      else assert(action == "keep")
    }
    // spot-check one document's counts against a direct scan
    val doc = Tables.t(spark, sf, "documents")
      .orderBy(col("doc_id")).select(col("doc_id"), col("text")).head
    val toks = doc.getString(1).split(" ")
    val expect = toks.count(Set("slow", "big", "merge", "customer", "key"))
    val got = rows.filter(col("doc_id") === doc.getLong(0))
      .head.getAs[Long]("n_hits")
    assert(got == expect)
  }

  test("geo_zonal_stats: exact per-zone aggregates over the raster") {
    val rows = run("geo_zonal_stats").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val n = r.getAs[Long]("n_cells")
      // a 10x10 zone box clipped to the raster's lat extent
      assert(n > 0 && n <= 100)
      val mn = r.getAs[Long]("min_elev"); val mx = r.getAs[Long]("max_elev")
      val mean = r.getAs[Double]("mean_elev")
      assert(mn <= mx && mean >= mn && mean <= mx)
      assert(r.getAs[Long]("n_high") <= n)
    }
    // hand-check one zone against a direct scan of the synthetic raster
    val z = rows.head
    val key = z.getAs[Number]("n_nationkey").longValue
    val lat0 = key * 23 % 100 - 50; val lon0 = key * 61 % 300 - 150
    val cells = for {
      gi <- lat0 to (lat0 + 9) if gi >= -70 && gi <= 70
      gj <- lon0 to (lon0 + 9) if gj >= -180 && gj <= 180
    } yield ((gi * 31 + gj * 17) % 500 + 500) % 500
    assert(z.getAs[Long]("n_cells") == cells.length)
    assert(z.getAs[Long]("min_elev") == cells.min)
    assert(z.getAs[Long]("max_elev") == cells.max)
  }

  test("fems_nfdrs_obs: one latest actual + all forecasts per (station, model)") {
    val rows = run("fems_nfdrs_obs").cache()
    assert(rows.count() > 0)
    val cutoff = Tables.events(spark, sf)
      .agg(max(col("ts_sec"))).collect()(0).getLong(0) - 86400L
    // at most one actual row per (station, fuel_model), and it is the max
    // actual timestamp for that key
    val actuals = rows.filter(!col("is_forecast"))
    val dupActuals = actuals.groupBy(col("station_id"), col("fuel_model"))
      .count().filter(col("count") > 1).count()
    assert(dupActuals == 0)
    actuals.collect().foreach(r => assert(r.getAs[Long]("ts_sec") <= cutoff))
    // every forecast row is after the cutoff, none dropped
    val fc = rows.filter(col("is_forecast")).count()
    val fcExpect = Tables.events(spark, sf)
      .filter(col("ts_sec") > cutoff).count()
    assert(fc == fcExpect)
    // fuel models partition the feed: all five letters present
    val models = rows.select(col("fuel_model")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(models == Set("V", "W", "X", "Y", "Z"))
    // kbdi stays in the NFDRS 0..800 range
    rows.collect().foreach { r =>
      val k = r.getAs[Long]("kbdi")
      assert(k >= 0 && k < 800)
    }
  }
  test("doc_quality_decision: verdict precedence and screen consistency") {
    val rows = run("doc_quality_decision").cache()
    val n = Tables.t(spark, sf, "documents").count()
    assert(rows.count() == n)
    rows.collect().foreach { r =>
      val verdict = r.getAs[String]("verdict")
      val nHard = r.getAs[Long]("n_hard")
      val nWords = r.getAs[Long]("n_words")
      val twf = r.getAs[Double]("top_word_frac")
      val er = r.getAs[Double]("est_ratio")
      val gopherFail = nWords < 50 || nWords > 100000 || twf > 0.12
      val entFail = er < 0.49 || er > 0.525
      // precedence: blocklist > gopher > entropy > keep
      if (nHard > 0) assert(verdict == "drop_blocklist")
      else if (gopherFail) assert(verdict == "drop_gopher")
      else if (entFail) assert(verdict == "drop_entropy")
      else assert(verdict == "keep")
    }
    // the composed screens agree with their standalone homes
    val wl = run("doc_wordlist_filter").select(col("doc_id"), col("n_hard"))
      .withColumnRenamed("n_hard", "wl_hard")
    val both = rows.join(wl, Seq("doc_id")).collect()
    both.foreach(r =>
      assert(r.getAs[Long]("n_hard") == r.getAs[Long]("wl_hard")))
  }

  test("stream_fems_obs: bounded per-key state keeps one actual + sorted forecasts") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val in = MemoryStream[Streams.FemsObs]
    val q = Streams.femsObsStream(in.toDS())
      .writeStream.format("memory").queryName("fems_out")
      .outputMode("update").start()
    import Streams.FemsObs
    // batch 1: two actuals (second newer -> replaces), one forecast
    in.addData(
      FemsObs(1L, "V", 100L, 1L, false, 10.0),
      FemsObs(1L, "V", 200L, 2L, false, 12.0),
      FemsObs(1L, "V", 500L, 3L, true, 14.0))
    q.processAllAvailable()
    // batch 2: stale actual (ignored), forecast before stored actual
    // (dropped), two in-window forecasts arriving out of date order
    in.addData(
      FemsObs(1L, "V", 150L, 4L, false, 11.0),
      FemsObs(1L, "V", 180L, 5L, true, 11.5),
      FemsObs(1L, "V", 700L, 6L, true, 16.0),
      FemsObs(1L, "V", 600L, 7L, true, 15.0))
    q.processAllAvailable()
    val out = spark.table("fems_out").orderBy(col("n_obs")).collect()
    q.stop()
    val last = out.last
    assert(last.getAs[Long]("station_id") == 1L)
    assert(last.getAs[Long]("actual_ts") == 200L)      // newest actual kept
    assert(last.getAs[Long]("n_forecasts") == 3L)      // 500, 600, 700
    assert(last.getAs[Long]("n_obs") == 4L)
    assert(last.getAs[Double]("latest_erc") == 16.0)   // date-sorted tail
  }
  test("emb_ann_sweep: recall and cost both rise with nprobe") {
    val rows = run("emb_ann_sweep").orderBy(col("level")).collect()
    assert(rows.map(_.getAs[Int]("level")).toSeq == Seq(1, 2, 4))
    rows.foreach { r =>
      assert(r.getAs[Long]("total_k") == 5L * r.getAs[Long]("n_queries"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("total_k"))
    }
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    val cands = rows.map(_.getAs[Double]("avg_candidates")).toSeq
    // probing more cells can only add candidates, so recall@5 is
    // monotone nondecreasing and the candidate cost strictly grows
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
    assert(cands.zip(cands.tail).forall { case (a, b) => b > a })
  }
  test("mm_png_meta: container walk validates real encoder output, CRC catches corruption") {
    import graft.functions.ImageCodec
    val rows = run("mm_png_meta").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Boolean]("crc_ok"))
      assert(r.getAs[Long]("width") == 32 + (id % 3) * 16)
      assert(r.getAs[Long]("height") == 32)
      assert(r.getAs[Long]("bit_depth") == 8)
      assert(r.getAs[Long]("idat_bytes") > 0)
      assert(r.getAs[Long]("n_chunks") >= 3) // IHDR + IDAT.. + IEND
    }
    // direct kernel: flipping one payload byte must fail the CRC audit
    val png = ImageCodec.toPng(ImageCodec.syntheticImage(7L, 48, 32))
    assert(ImageCodec.pngMeta(png).crcOk)
    val bad = png.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x40).toByte
    assert(!ImageCodec.pngMeta(bad).crcOk)
    // truncation is detected, not crashed on
    assert(!ImageCodec.pngMeta(png.take(png.length - 5)).crcOk)
  }
  test("ts_haar_energy: Parseval-exact integer decomposition, hand-checked frame") {
    val rows = run("ts_haar_energy").cache()
    assert(rows.count() > 0)
    // recompute one frame imperatively from the raw events
    val r0 = rows.head
    val u = r0.getAs[Long]("user_id")
    val vc = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)"))
      .collect().map(_.getLong(0)).take(16)
    assert(vc.length == 16)
    def pairs(a: Seq[Long]) = a.grouped(2).toSeq
    val s1 = pairs(vc).map(p => p(0) + p(1))
    val d1 = pairs(vc).map(p => p(0) - p(1))
    val s2 = pairs(s1).map(p => p(0) + p(1))
    val d2 = pairs(s1).map(p => p(0) - p(1))
    val s3 = pairs(s2).map(p => p(0) + p(1))
    val d3 = pairs(s2).map(p => p(0) - p(1))
    val d4 = s3(0) - s3(1)
    assert(r0.getAs[Long]("e1") == d1.map(x => x * x).sum)
    assert(r0.getAs[Long]("e2") == d2.map(x => x * x).sum)
    assert(r0.getAs[Long]("e3") == d3.map(x => x * x).sum)
    assert(r0.getAs[Long]("e4") == d4 * d4)
    assert(r0.getAs[Long]("approx_sum") == vc.sum)
    // unnormalized Parseval: 16*sum(x^2) = 16*E_approx-part identity holds
    // in the weighted form: sum over levels of 2^l-weighted energies
    val lhs = 16L * vc.map(x => x * x).sum
    val rhs = d1.map(x => x * x).sum * 8 + d2.map(x => x * x).sum * 4 +
      d3.map(x => x * x).sum * 2 + d4 * d4 + vc.sum * vc.sum
    assert(lhs == rhs)
    val dom = r0.getAs[Int]("dominant_level")
    assert(dom >= 1 && dom <= 4)
  }

  test("doc_corpus_report: per-source ratios are consistent and bounded") {
    val rows = run("doc_corpus_report").cache()
    assert(rows.count() > 0)
    val totalDocs = rows.collect().map(_.getAs[Long]("n_docs")).sum
    assert(totalDocs == Tables.t(spark, sf, "documents").count())
    rows.collect().foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_dup_docs") <= n)
      assert(r.getAs[Long]("n_gopher_pass") <= n)
      val dr = r.getAs[Double]("dup_rate")
      assert(dr >= 0.0 && dr <= 1.0)
      val gp = r.getAs[Double]("gopher_pass_rate")
      assert(gp >= 0.0 && gp <= 1.0)
      val mr = r.getAs[Double]("mean_est_ratio")
      assert(mr > 0.0 && mr < 1.0)
    }
  }
  test("mm_audio_pitch: exact autocorrelation argmax, hand-checked frame") {
    val rows = run("mm_audio_pitch").cache()
    assert(rows.count() > 0)
    val r0 = rows.head
    val id = r0.getAs[Long]("doc_id"); val fid = r0.getAs[Long]("frame_id")
    val text = Tables.t(spark, sf, "documents")
      .filter(col("doc_id") === id).head.getAs[String]("text")
    val sv = text.slice((fid * 64).toInt, (fid * 64 + 64).toInt)
      .map(c => (c.toInt - 128).toLong)
    assert(sv.length == 64)
    val rr0 = sv.map(x => x * x).sum
    val rs = (2 to 16).map(l =>
      l -> (0 until 64 - l).map(i => sv(i) * sv(i + l)).sum)
    val (bestLag, bestR) = rs.maxBy { case (l, r) => (r, -l) }
    assert(r0.getAs[Long]("r0") == rr0)
    assert(r0.getAs[Long]("pitch_lag") == bestLag)
    assert(r0.getAs[Long]("r_best") == bestR)
    rows.collect().foreach { r =>
      val lag = r.getAs[Long]("pitch_lag")
      assert(lag >= 2 && lag <= 16)
      // Cauchy-Schwarz: |R(l)| <= R(0), so strength is in [-1, 1]
      val st = r.getAs[Double]("strength")
      assert(st >= -1.0 - 1e-12 && st <= 1.0 + 1e-12)
    }
  }
  test("doc_lsh_band_tuning: looser bands never lose candidates or recall") {
    val rows = run("doc_lsh_band_tuning").orderBy(col("bands")).collect()
    assert(rows.map(_.getAs[Int]("bands")).toSeq == Seq(4, 8, 16))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_candidates"))
      assert(r.getAs[Long]("n_hits") <= r.getAs[Long]("n_exact"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // a band match under (b, r) implies a band match under (2b, r/2):
    // each 2r-row band splits into two r-row bands that both still agree,
    // so candidates and recall are monotone as rows/band shrink
    val cands = rows.map(_.getAs[Long]("n_candidates")).toSeq
    val recalls = rows.map(_.getAs[Double]("recall")).toSeq
    assert(cands.zip(cands.tail).forall { case (a, b) => b >= a })
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a })
  }
  test("emb_kcenter_sample: greedy radii nonincreasing, round-1 hand-checked") {
    val rows = run("emb_kcenter_sample").orderBy(col("sel_round")).collect()
    assert(rows.length == 8)
    assert(rows.head.getAs[Long]("vec_id") == 0L)
    val ids = rows.map(_.getAs[Long]("vec_id"))
    assert(ids.distinct.length == 8)
    // k-center theory: each new selection's distance to the selected set
    // can only shrink round over round
    val d2s = rows.tail.map(_.getAs[Long]("min_d2"))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => b <= a })
    // round 1 = the vector farthest from the seed, recomputed directly
    val vecs = Tables.t(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    // same fixed-point discipline as qdot: each PRODUCT term is
    // floor(x*y*2^30), summed exactly
    def qd(a: Seq[Double], b: Seq[Double]): Long =
      a.zip(b).map { case (x, y) => math.floor(x * y * 1073741824.0).toLong }.sum
    def d2(a: Seq[Double], b: Seq[Double]): Long =
      qd(a, a) + qd(b, b) - 2 * qd(a, b)
    val seed = vecs(0L)
    val far = vecs.map { case (id, v) => (d2(seed, v), -id) }.max
    assert(rows(1).getAs[Long]("vec_id") == -far._2)
    assert(rows(1).getAs[Long]("min_d2") == far._1)
  }
  test("ts_motif_join: shared words really occur in every reported entity") {
    val rows = run("ts_motif_join").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      assert(r.getAs[String]("word").length == 4)
      assert(r.getAs[String]("word").forall("abcd".contains(_)))
      assert(r.getAs[Long]("n_entities") >= 2)
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_entities"))
      assert(r.getAs[Long]("first_user") < r.getAs[Long]("last_user"))
    }
    // cross-check one word against the per-entity SAX words of ts_sax:
    // every 4-gram of an entity's sax_word is a (user, word) occurrence
    val saxWords = run("ts_sax").select(col("user_id"), col("sax_word"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    val grams = saxWords.flatMap { case (u, w) =>
      w.sliding(4).filter(_.length == 4).map(g => (g, u))
    }
    val byWord = grams.groupBy(_._1)
      .map { case (g, us) => g -> (us.length.toLong, us.map(_._2).distinct.size.toLong) }
    rows.collect().foreach { r =>
      val (occ, ents) = byWord(r.getAs[String]("word"))
      assert(r.getAs[Long]("n_occurrences") == occ)
      assert(r.getAs[Long]("n_entities") == ents)
    }
  }
  test("geo_terrain_indices: stencil indices hand-checked, classes consistent") {
    val rows = run("geo_terrain_indices").cache()
    assert(rows.count() > 0)
    def elev(i: Long, j: Long): Long = ((i * 31 + j * 17) % 500 + 500) % 500
    // hand-check a handful of interior cells
    rows.limit(50).collect().foreach { r =>
      val gi = r.getAs[Long]("gi"); val gj = r.getAs[Long]("gj")
      val e = elev(gi, gj)
      val neigh = for {
        da <- Seq(-1L, 0L, 1L); db <- Seq(-1L, 0L, 1L)
        if !(da == 0 && db == 0)
      } yield elev(gi + da, gj + db)
      assert(r.getAs[Long]("elev") == e)
      assert(r.getAs[Long]("sum_abs_diff") == neigh.map(n => math.abs(e - n)).sum)
      assert(r.getAs[Long]("tpi8") == e * 8 - neigh.sum)
      val lf = r.getAs[String]("landform")
      val tpi8 = r.getAs[Long]("tpi8")
      if (tpi8 > 400) assert(lf == "ridge")
      else if (tpi8 < -400) assert(lf == "valley")
      else assert(lf == "flat")
    }
    // border cells (fewer than 8 neighbors) are excluded
    assert(rows.filter(col("gi") === -70 || col("gi") === 70).count() == 0)
  }
  test("ts_resample_locf: hourly grid complete, LOCF values hand-checked") {
    val rows = run("ts_resample_locf").cache()
    assert(rows.count() > 0)
    val u = rows.head.getAs[Long]("user_id")
    val mine = rows.filter(col("user_id") === u)
      .orderBy(col("hour")).collect()
    // grid covers the entity's own span with no holes
    val hours = mine.map(_.getAs[Long]("hour"))
    assert(hours.zip(hours.tail).forall { case (a, b) => b == a + 1 })
    val obs = Tables.events(spark, sf).filter(col("user_id") === u)
      .select(col("ts_sec"),
        expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    mine.foreach { r =>
      val cutoff = r.getAs[Long]("hour") * 3600 + 3599
      val lastObs = obs.filter(_._1 <= cutoff).lastOption
      lastObs match {
        case Some((t, v)) =>
          assert(r.getAs[Long]("age_sec") == cutoff - t)
          if (cutoff - t <= 14400) {
            assert(!r.getAs[Boolean]("stale"))
            assert(math.abs(r.getAs[Double]("value") - v / 100.0) < 1e-12)
          } else {
            assert(r.getAs[Boolean]("stale"))
            assert(r.isNullAt(r.fieldIndex("value")))
          }
        case None => assert(r.getAs[Boolean]("stale"))
      }
    }
  }
  test("ts_burstiness: exact moments, B in [-1,1), schedule vs bursty ordering") {
    val rows = run("ts_burstiness").cache()
    assert(rows.count() > 0)
    val u = rows.head.getAs[Long]("user_id")
    val ts = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("ts_sec")).collect().map(_.getLong(0))
    val gaps = ts.zip(ts.tail).map { case (a, b) => b - a }
    val r0 = rows.head
    assert(r0.getAs[Long]("n_gaps") == gaps.length)
    assert(r0.getAs[Long]("sum_gap") == gaps.sum)
    assert(r0.getAs[Long]("sumsq_gap") == gaps.map(g => g * g).sum)
    rows.collect().foreach { r =>
      val b = r.getAs[Double]("burstiness")
      assert(b >= -1.0 && b < 1.0)
      assert(r.getAs[Double]("fano") >= 0.0)
    }
  }

  test("geo_cross_track: abeam decomposition consistent with direct distance") {
    val rows = run("geo_cross_track").cache()
    assert(rows.count() > 0)
    rows.collect().foreach { r =>
      val d13 = r.getAs[Double]("d13")
      val xtd = r.getAs[Double]("xtd_km")
      val atd = r.getAs[Double]("atd_km")
      // |xtd| and atd are legs of the spherical right triangle with
      // hypotenuse d13: both bounded by it (small slack for the
      // 3-decimal quantization of the inputs)
      assert(math.abs(xtd) <= d13 + 0.01)
      // atd's principal value lives in [0, pi*R]; it only stays below
      // d13 for legs shorter than a quarter circumference
      assert(atd >= -0.001 && atd <= math.Pi * 6371.0 + 0.01)
      if (d13 <= math.Pi / 2 * 6371.0) assert(atd <= d13 + 0.01)
      // spherical Pythagoras: cos(d13) = cos(xtd)*cos(atd)
      val R = 6371.0
      val lhs = math.cos(d13 / R)
      val rhs = math.cos(xtd / R) * math.cos(atd / R)
      assert(math.abs(lhs - rhs) < 1e-6)
    }
  }
  test("emb_knn_accuracy: per-label tallies bounded and internally consistent") {
    val rows = run("emb_knn_accuracy").cache()
    assert(rows.count() > 0)
    val total = rows.collect().map(_.getAs[Long]("n_vecs")).sum
    val nEmb = Tables.t(spark, sf, "embeddings").count()
    // every scored vector had at least one in-bucket neighbor; isolated
    // bucket singletons drop out, so the tally is bounded by the corpus
    assert(total > 0 && total <= nEmb)
    rows.collect().foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_vecs"))
      assert(math.abs(acc - r.getAs[Long]("n_correct").toDouble
        / r.getAs[Long]("n_vecs")) < 1e-12)
    }
  }
  test("q54_cohort_ltv: cohort accounting closes against the raw orders") {
    val rows = run("q54_cohort_ltv").cache()
    assert(rows.count() > 0)
    // total orders and revenue across all cells equal the fact table
    val sums = rows.agg(sum(col("n_orders")), sum(col("revenue"))).head
    val raw = Tables.t(spark, sf, "orders")
      .agg(count(lit(1)),
        sum(expr("CAST(floor(o_totalprice * 100.0 + 0.5e0) AS BIGINT)")))
      .head
    assert(sums.getLong(0) == raw.getLong(0))
    assert(math.abs(sums.getDouble(1) - raw.getLong(1) / 100.0) < 1e-6)
    // LTV per customer is nondecreasing in age within each cohort
    rows.collect().groupBy(_.getAs[Int]("cohort_m")).values.foreach { cells =>
      val byAge = cells.sortBy(_.getAs[Int]("age"))
        .map(_.getAs[Double]("ltv_per_customer"))
      assert(byAge.zip(byAge.tail).forall { case (a, b) => b >= a - 1e-9 })
    }
    // age-0 cell exists for every cohort and n_customers <= cohort_size
    rows.collect().foreach { r =>
      assert(r.getAs[Long]("n_customers") <= r.getAs[Long]("cohort_size"))
      assert(r.getAs[Int]("age") >= 0)
    }
  }
}
