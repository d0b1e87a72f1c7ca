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

  test("geodesic_km SQL function registered via GeoFunctions.register") {
    graft.functions.GeoFunctions.register(spark)
    val km = spark.sql(
      "SELECT geodesic_km(-37.95103341666667, 144.42486788888888, " +
        "-37.65282113888889, 143.92649552777777) AS km")
      .collect()(0).getDouble(0)
    assert(math.abs(m(km) - 54972.271) < 1.0)
  }
}
