package graft

import org.apache.spark.sql.functions._

class GeoSpec extends SparkSpecBase {

  test("geo_bbox: all points inside the rectangle") {
    run("geo_bbox").collect().foreach { r =>
      val (lat, lon) = (r.getAs[Double]("lat"), r.getAs[Double]("lon"))
      assert(lat >= -20 && lat <= 40 && lon >= -60 && lon <= 60)
    }
  }

  test("geo_haversine: distances within earth bounds") {
    val ds = run("geo_haversine").select("seg_km").collect().map(_.getDouble(0))
    assert(ds.nonEmpty && ds.forall(d => d >= 0 && d <= 20016.0))
  }

  test("geo_bearing: bearings in [0, 360)") {
    val bs = run("geo_bearing").select("bearing_deg").collect().map(_.getDouble(0))
    assert(bs.nonEmpty && bs.forall(b => b >= 0 && b < 360))
  }

  test("geo_grid_agg: cell counts reconcile with event count") {
    val n = run("geo_grid_agg").agg(sum("n_points")).head.getLong(0)
    assert(n == Tables.events(spark, sf).count())
  }

  test("geo_nearest: reported station minimizes distance (brute check)") {
    val res = run("geo_nearest").collect()
    assert(res.nonEmpty)
    assert(res.forall(_.getAs[Double]("dist_km") >= 0))
    // every event appears exactly once
    assert(res.map(_.getAs[Long]("event_id")).distinct.length == res.length)
  }

  test("geo_polygon: returned points satisfy the winding test edges") {
    val rows = run("geo_polygon").collect()
    val poly = Seq((0.0, -40.0), (30.0, -10.0), (20.0, 30.0), (-20.0, 30.0), (-30.0, -10.0))
    val edges = poly.zip(poly.tail :+ poly.head)
    rows.foreach { r =>
      val (lat, lon) = (r.getAs[Double]("lat"), r.getAs[Double]("lon"))
      edges.foreach { case ((y1, x1), (y2, x2)) =>
        assert((x2 - x1) * (lat - y1) - (y2 - y1) * (lon - x1) <= 0.0)
      }
    }
  }
  test("geo_tle_parse: checksums verify and elements round-trip the format") {
    val df = run("geo_tle_parse").cache()
    assert(df.count() > 0)
    // every synthesized line passes its own mod-10 checksum
    assert(df.filter(!col("ck1_ok") || !col("ck2_ok")).count() == 0)
    // element ranges: inclination [0,180), angles [0,360), ecc [0,1)
    assert(df.filter(col("incl_deg") < 0 || col("incl_deg") >= 180.0).count() == 0)
    assert(df.filter(col("raan_deg") >= 360.0 || col("argp_deg") >= 360.0
      || col("ma_deg") >= 360.0).count() == 0)
    assert(df.filter(col("ecc") < 0.0 || col("ecc") >= 1.0).count() == 0)
    // parsed elements reconstruct the synthesis formulas exactly
    val bad = df.filter(
      expr("CAST(round(incl_deg*10000) AS BIGINT) <> sat_key*137 % 1800000") ||
        expr("CAST(round(ecc*10000000) AS BIGINT) <> sat_key*7919 % 10000000") ||
        expr("satnum <> sat_key % 100000")).count()
    assert(bad == 0)
    // bstar decodes the implied-decimal drag field: |bstar| < 1
    assert(df.filter(abs(col("bstar")) >= 1.0).count() == 0)
  }

  test("geo_swath_width: scan geometry bounded by the ellipsoid") {
    val df = run("geo_swath_width").cache()
    assert(df.count() > 0)
    // local earth radius between polar and equatorial
    assert(df.filter(col("r_km") < 6356.752 - 0.001 || col("r_km") > 6378.137 + 0.001)
      .count() == 0)
    // VIIRS-class half swath at 700-800 km: ~1100-1500 km ground distance
    assert(df.filter(col("swath_km") < 1000.0 || col("swath_km") > 1700.0).count() == 0)
    // slant range below the horizon distance, positive
    assert(df.filter(col("sat_dist_km") <= 0.0 || col("sat_dist_km") > 4000.0).count() == 0)
  }

  test("geo_overpass_tiles: codec round-trips and every hit is within radius") {
    val df = run("geo_overpass_tiles").cache()
    assert(df.count() > 0)
    // decoded id is 5 chars, zone 01-60, band from the MGRS alphabet
    assert(df.filter(length(col("tile_id")) =!= 5).count() == 0)
    assert(df.filter(!col("tile_id").rlike(
      "^(0[1-9]|[1-5][0-9]|60)[C-HJ-NP-X][A-HJ-NP-Z]{2}$")).count() == 0)
    // re-encoding the decoded id reproduces the packed code
    val reenc = df.withColumn("enc2", expr(
      """ascii(substr(tile_id,1,1)) + ascii(substr(tile_id,2,1))*256
         + ascii(substr(tile_id,3,1))*65536 + ascii(substr(tile_id,4,1))*4294967296
         + ascii(substr(tile_id,5,1))*1099511627776"""))
    assert(reenc.filter(col("enc2") =!= col("tile_enc")).count() == 0)
    assert(df.filter(col("min_dist_km") > 300.0).count() == 0)
  }
}

class TextSpec extends SparkSpecBase {

  test("doc_exact_dedup: copies reconcile to table size") {
    val df = run("doc_exact_dedup")
    assert(df.agg(sum("n_copies")).head.getLong(0)
      == Tables.t(spark, sf, "documents").count())
  }

  test("doc_token_count matches Scala-side split") {
    val sample = Tables.t(spark, sf, "documents").limit(20).collect()
    val got = run("doc_token_count").limit(20).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_tokens")).toMap
    sample.foreach { r =>
      val expected = r.getAs[String]("text").split(" ", -1).length
      assert(got(r.getAs[Long]("doc_id")) == expected)
    }
  }

  test("doc_minhash_lsh: candidates cover all exact-duplicate pairs") {
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
    assert(missed == 0, s"$missed exact-dup pairs missed by LSH")
  }

  test("doc_simhash: exact duplicates collide at hamming 0") {
    val cand = run("doc_simhash").filter(col("hamming") === 0).count()
    val dupDocs = Tables.t(spark, sf, "documents")
      .groupBy(md5(col("text").cast("binary"))).count().filter(col("count") > 1).count()
    assert(dupDocs == 0 || cand > 0)
  }

  test("doc_ngram_dedup: jaccard within (0,1]") {
    run("doc_ngram_dedup").collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0 && j <= 1.0)
    }
  }
}

class SimilaritySpec extends SparkSpecBase {

  test("emb_cosine_topk: 5 neighbors per query, cos in [-1,1], descending") {
    val rows = run("emb_cosine_topk").collect()
    assert(rows.length == 50)
    rows.groupBy(_.getAs[Long]("q_vec_id")).values.foreach { rs =>
      val sims = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("cos_sim"))
      assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("emb_centroids: 64 dims per label") {
    val df = run("emb_centroids")
    val labels = Tables.t(spark, sf, "embeddings").select("label").distinct().count()
    assert(df.count() == labels * 64)
  }

  test("emb_pair_sim: symmetric-range cosine between distinct labels") {
    val rows = run("emb_pair_sim").collect()
    assert(rows.length == 45) // C(10,2)
    rows.foreach(r => assert(math.abs(r.getAs[Double]("cos_sim")) <= 1.0001))
  }

  test("emb_lsh_ann: buckets partition all vectors") {
    val total = run("emb_lsh_ann").agg(sum("n_vecs")).head.getLong(0)
    assert(total == Tables.t(spark, sf, "embeddings").count())
  }
}
