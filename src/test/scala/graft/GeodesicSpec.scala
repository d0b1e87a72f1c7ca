package graft

import graft.functions.GeoMath

/** Fixtures for the WGS84 Vincenty inverse (GeoMath.vincentyKm), mirroring
  * the reference's geodesic_distance (odin_common/src/geo.rs:173). Expected
  * values are published geodesics: Vincenty's classic Flinders Peak ->
  * Buninyong line, the analytic equatorial arc (s = a * dLon), and the
  * WGS84 quarter meridian. Tolerance +-1 m.
  */
class GeodesicSpec extends SparkSpecBase {

  private def m(km: Double): Double = km * 1000.0

  test("vincenty: Flinders Peak -> Buninyong (classic fixture, +-1 m)") {
    val d = GeoMath.vincentyKm(
      -37.95103341666667, 144.42486788888888,
      -37.65282113888889, 143.92649552777777)
    assert(math.abs(m(d) - 54972.271) < 1.0, s"got ${m(d)} m")
  }

  test("vincenty: equatorial arc = a * dLon (+-1 m)") {
    val d = GeoMath.vincentyKm(0.0, 0.0, 0.0, 90.0)
    val expect = 6378137.0 * math.Pi / 2 // 10018754.17 m
    assert(math.abs(m(d) - expect) < 1.0, s"got ${m(d)} m want $expect")
  }

  test("vincenty: quarter meridian (+-1 m)") {
    val d = GeoMath.vincentyKm(0.0, 0.0, 90.0, 0.0)
    assert(math.abs(m(d) - 10001965.729) < 1.0, s"got ${m(d)} m")
  }

  test("vincenty: zero for coincident points") {
    assert(GeoMath.vincentyKm(37.77, -122.42, 37.77, -122.42) == 0.0)
  }

  test("vincenty: symmetric and within 0.6% of haversine off the poles") {
    val pts = Seq((37.77, -122.42), (-33.86, 151.21), (51.47, -0.45),
      (64.13, -21.9), (1.35, 103.99))
    for ((p1, i) <- pts.zipWithIndex; p2 <- pts.drop(i + 1)) {
      val ab = GeoMath.vincentyKm(p1._1, p1._2, p2._1, p2._2)
      val ba = GeoMath.vincentyKm(p2._1, p2._2, p1._1, p1._2)
      assert(math.abs(ab - ba) < 1e-9, s"asymmetry $p1 $p2")
      val hav = GeoMath.haversineKm(p1._1, p1._2, p2._1, p2._2)
      assert(math.abs(ab - hav) / ab < 0.006, s"vs haversine $p1 $p2: $ab $hav")
    }
  }

  test("geo_polygon_area: spherical excess tracks the planar estimate") {
    // pentagon offsets have planar shoelace area 0.362 deg^2; on the
    // sphere that is ~0.362*(pi*R/180)^2*cos(lat), good to a few percent
    // for a sub-degree polygon away from the poles
    val rows = run("geo_polygon_area").collect()
    assert(rows.length > 0)
    val st = run("geo_polygon_area").sparkSession // station lat from key
    rows.foreach { r =>
      val key = r.getAs[Long]("s_suppkey")
      val lat = (key * 53 % 140 - 70).toDouble
      if (math.abs(lat) < 65.0) {
        val expect = 0.362 * math.pow(math.Pi * 6371.0088 / 180.0, 2) *
          math.cos(math.toRadians(lat))
        val got = r.getAs[Double]("poly_area_km2")
        assert(math.abs(got - expect) / expect < 0.05,
          s"area for key=$key lat=$lat: got $got want ~$expect")
      }
      val rKm = (key % 50 + 10).toDouble
      assert(math.abs(r.getAs[Double]("circle_area_km2") - math.Pi * rKm * rKm) < 0.001)
    }
  }

  test("geo_polygon_centroid: matches an independent shoelace evaluation") {
    val dx = Seq(0.0, 0.38, 0.24, -0.24, -0.38)
    val dy = Seq(0.4, 0.1, -0.3, -0.3, 0.1)
    run("geo_polygon_centroid").collect().foreach { r =>
      val key = r.getAs[Long]("s_suppkey")
      val lon = (key * 97 % 360 - 180).toDouble
      val lat = (key * 53 % 140 - 70).toDouble
      val vs = (0 until 5).map { k =>
        val w = 1.0 + ((key + k) % 7) / 10.0
        (lon + dx(k) * w, lat + dy(k) * w)
      }
      var a2 = 0.0; var cx = 0.0; var cy = 0.0
      for (k <- 0 until 5) {
        val (x1, y1) = vs(k); val (x2, y2) = vs((k + 1) % 5)
        val c = x1 * y2 - x2 * y1
        a2 += c; cx += (x1 + x2) * c; cy += (y1 + y2) * c
      }
      assert(math.abs(r.getAs[Double]("centroid_lon") - cx / (3 * a2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("centroid_lat") - cy / (3 * a2)) < 1e-9)
      assert(math.abs(r.getAs[Double]("area_deg2") - math.abs(a2) / 2) < 1e-9)
      // the centroid of a simple polygon lies inside its bounding box
      assert(r.getAs[Double]("centroid_lon") >= vs.map(_._1).min &&
        r.getAs[Double]("centroid_lon") <= vs.map(_._1).max)
      assert(r.getAs[Double]("centroid_lat") >= vs.map(_._2).min &&
        r.getAs[Double]("centroid_lat") <= vs.map(_._2).max)
    }
  }

  test("geo_multipoly_centroid: area-weighted merge of the part centroids") {
    val parts = run("geo_polygon_centroid").collect().map { r =>
      val key = r.getAs[Long]("s_suppkey")
      (key, r.getAs[Double]("centroid_lon"), r.getAs[Double]("centroid_lat"),
        r.getAs[Double]("area_deg2"))
    }
    // nationkey of each supplier from the table itself
    val nat = Tables.t(spark, sf, "supplier")
      .select("s_suppkey", "s_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getAs[Number](1).longValue)
      .toMap
    val merged = run("geo_multipoly_centroid").collect()
    assert(merged.map(_.getAs[Long]("n_parts")).sum == parts.length)
    merged.foreach { r =>
      val nk = r.getAs[Number]("s_nationkey").longValue
      val mine = parts.filter(p => nat(p._1) == nk)
      val wa = mine.map(_._4).sum
      val wx = mine.map(p => p._2 * p._4).sum / wa
      val wy = mine.map(p => p._3 * p._4).sum / wa
      // fixed-point (2^-20) quantized merge vs exact float combine
      assert(math.abs(r.getAs[Double]("centroid_lon") - wx) < 1e-3)
      assert(math.abs(r.getAs[Double]("centroid_lat") - wy) < 1e-3)
      assert(math.abs(r.getAs[Double]("area_deg2") - wa) < 1e-3)
    }
  }

  test("geodesic_km SQL function registered via GeoFunctions.register") {
    graft.functions.GeoFunctions.register(spark)
    val km = spark.sql(
      "SELECT geodesic_km(-37.95103341666667, 144.42486788888888, " +
        "-37.65282113888889, 143.92649552777777) AS km")
      .collect()(0).getDouble(0)
    assert(math.abs(m(km) - 54972.271) < 1.0)
  }

  test("geo_warp_lcc: SQL LCC forward matches Grib2Provider.LccMath") {
    // the LccK SQL fragments and the GRIB2 reader's JVM LccMath encode
    // the same Snyder spherical LCC with the same HRRR parameters —
    // assert they agree (mm rounding is the only permitted delta), so
    // the warp query and the src_grib2 geolocation can never drift apart
    import graft.sources.Grib2.{Lcc, LccMath}
    import graft.operators.Geo.LccK
    val cone = LccMath.cone(Lcc(38.5, 38.5, -97.5, 3000, 3000))
    val pts = Seq((36.0, -111.0), (38.45, -108.05), (35.2, -112.3),
      (40.0, -97.5), (30.0, -120.0))
    val rows = pts.map { case (la, lo) =>
      spark.sql(s"SELECT ${LccK.x(la + "e0", lo + "e0")} AS x, " +
          s"${LccK.y(la + "e0", lo + "e0")} AS y")
        .collect()(0)
    }
    pts.zip(rows).foreach { case ((la, lo), r) =>
      val (ex, ey) = LccMath.forward(cone, la, lo)
      assert(math.abs(r.getDouble(0) - ex) < 2e-3, s"x($la,$lo)")
      assert(math.abs(r.getDouble(1) - ey) < 2e-3, s"y($la,$lo)")
    }
    // and the warp output itself: full coverage of the synthetic grid,
    // values inside the source range, deterministic across runs
    val out = run("geo_warp_lcc").collect()
    assert(out.length == 3000)
    assert(out.forall(_.getAs[Boolean]("valid")))
    assert(out.forall { r =>
      val v = r.getAs[Double]("value"); v >= 200.0 && v < 300.0
    })
  }

  test("geo_warp_ps: SQL PS forward matches Snyder 21-8/21-9 directly") {
    import graft.operators.Geo.PsK
    val R = 6371229.0; val k0 = (1 + math.sin(math.toRadians(60))) / 2
    def fwd(lat: Double, lon: Double): (Double, Double) = {
      val rho = 2 * R * k0 * math.tan(Math.PI / 4 - math.toRadians(lat) / 2)
      val dl = math.toRadians(lon) - math.toRadians(-150.0)
      (rho * math.sin(dl), -rho * math.cos(dl))
    }
    val pts = Seq((58.0, -160.0), (61.95, -145.25), (57.0, -163.0),
      (60.0, -150.0), (70.0, -140.0))
    pts.foreach { case (la, lo) =>
      val r = spark.sql(s"SELECT ${PsK.x(la + "e0", lo + "e0")} AS x, " +
          s"${PsK.y(la + "e0", lo + "e0")} AS y").collect()(0)
      val (ex, ey) = fwd(la, lo)
      assert(math.abs(r.getDouble(0) - ex) < 2e-3, s"x($la,$lo)")
      assert(math.abs(r.getDouble(1) - ey) < 2e-3, s"y($la,$lo)")
    }
    // at the standard parallel the scale factor is exactly 1: one cell
    // of 0.05° latitude spans ~5.56 km of rho there
    val out = run("geo_warp_ps").collect()
    assert(out.length == 4800)
    assert(out.forall(_.getAs[Boolean]("valid")))
    assert(out.forall { r =>
      val v = r.getAs[Double]("value"); v >= -30.0 && v < 45.0
    })
  }
}
