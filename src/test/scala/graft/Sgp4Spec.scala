package graft

import graft.functions.OrbitMath
import org.scalatest.funsuite.AnyFunSuite

/** SGP4 kernel pinned to the published Spacetrack Report #3 / Vallado
  * "Revisiting Spacetrack Report #3" verification satellite 00005
  * (TLE 1 00005U 58002B 00179.78495062 ... / 2 00005 34.2682 348.7242
  * 1859667 331.7664 19.3264 10.82419157413667) — public test vectors.
  */
class Sgp4Spec extends AnyFunSuite {

  private val n0 = 10.82419157 // rev/day
  private val e0 = 0.1859667
  private val inc = 34.2682
  private val raan = 348.7242
  private val argp = 331.7664
  private val m0 = 19.3264
  private val bstar = 0.28098e-4

  private def pos(t: Double): Array[Double] =
    OrbitMath.propagateTeme(n0, e0, inc, raan, argp, m0, bstar, t)

  test("satellite 00005 epoch position matches the published vector") {
    // tcppver.out, t=0 min: (7022.46529266, -1400.08296755, 0.03995155) km
    val p = pos(0.0)
    assert(math.abs(p(0) - 7022.46529266) < 0.5, s"x=${p(0)}")
    assert(math.abs(p(1) + 1400.08296755) < 0.5, s"y=${p(1)}")
    assert(math.abs(p(2) - 0.03995155) < 0.5, s"z=${p(2)}")
  }

  test("satellite 00005 multi-epoch TEME positions match tcppver.out") {
    // Vallado, "Revisiting Spacetrack Report #3" (AIAA 2006-6753)
    // verification output tcppver.out, satellite 00005, t in minutes →
    // TEME position km. Tolerance 1 km per axis over a full day of
    // propagation: faithful near-earth implementations agree to meters
    // (this kernel reproduces most epochs to ~1e-6 km), and the km-level
    // bound absorbs the documented AFSPC-vs-improved operation-mode
    // variants between published runs.
    val expected = Seq(
      (360.0, -7154.03120202, -3783.17682504, -3536.19412193),
      (720.0, -7134.93996339, 6531.25794362, 3260.27650551),
      (1080.0, 5568.53901181, 4492.06992591, 3863.87641983),
      (1440.0, -938.55923444, -6268.18748831, -4294.02924751))
    expected.foreach { case (t, ex, ey, ez) =>
      val p = pos(t)
      assert(math.abs(p(0) - ex) < 1.0, s"t=$t x=${p(0)} vs $ex")
      assert(math.abs(p(1) - ey) < 1.0, s"t=$t y=${p(1)} vs $ey")
      assert(math.abs(p(2) - ez) < 1.0, s"t=$t z=${p(2)} vs $ez")
    }
  }

  test("satellite 06251 (DELTA 1 DEB) epoch position matches tcppver.out") {
    // second public near-earth verification case — higher drag, lower
    // eccentricity than 00005:
    // 1 06251U 62025E 06176.82412014 .00008885 00000-0 12808-3 0 3985
    // 2 06251 58.0579 54.0425 0030035 139.1568 221.1854 15.56387291 6774
    // t=0 ≈ (3988.3102, 5498.9666, 0.9006) km; same 1 km/axis bound as
    // the multi-epoch test above
    val p = OrbitMath.propagateTeme(15.56387291, 0.0030035, 58.0579,
      54.0425, 139.1568, 221.1854, 0.12808e-3, 0.0)
    assert(math.abs(p(0) - 3988.31022699) < 1.0, s"x=${p(0)}")
    assert(math.abs(p(1) - 5498.96657072) < 1.0, s"y=${p(1)}")
    assert(math.abs(p(2) - 0.90165936) < 1.0, s"z=${p(2)}")
  }

  test("propagation stays on the element-set ellipse (radius + plane bounds)") {
    // a from mean motion: a = (xke/n)^(2/3) er; apogee/perigee bound the
    // radius, inclination bounds |z|/r — over two full revolutions
    val xn = n0 * 2.0 * math.Pi / 1440.0
    val aEr = math.pow(0.0743669161 / xn, 2.0 / 3.0)
    val rp = aEr * (1.0 - e0) * 6378.135 - 60.0
    val ra = aEr * (1.0 + e0) * 6378.135 + 60.0
    val sinI = math.sin(math.toRadians(inc)) + 0.02
    (0 to 280 by 10).foreach { t =>
      val p = pos(t.toDouble)
      val r = math.sqrt(p(0) * p(0) + p(1) * p(1) + p(2) * p(2))
      assert(r > rp && r < ra, s"t=$t r=$r outside [$rp,$ra]")
      assert(math.abs(p(2)) <= r * sinI, s"t=$t z=${p(2)} breaks inclination bound")
    }
  }

  test("near-circular LEO subpoint altitude is sane (drag branch isimp)") {
    // ISS-like elements: the near-earth low-perigee simplification path
    val p = OrbitMath.propagateTeme(15.50103472, 0.0004263, 51.6416,
      247.4627, 130.5360, 325.0288, 0.367e-4, 0.0)
    val r = math.sqrt(p(0) * p(0) + p(1) * p(1) + p(2) * p(2))
    val alt = r - 6378.135
    assert(alt > 330.0 && alt < 460.0, s"ISS-like altitude $alt km")
  }

  test("Kepler fixed-iteration solve is exact at moderate eccentricity") {
    // E - e sin E = M must hold to ~1e-12 after 10 Newton steps; probe by
    // round-tripping the radius at many anomalies (monotone-free check:
    // r = a(1 - e cos E) ⇒ |r - a| <= a*e)
    val xn = n0 * 2.0 * math.Pi / 1440.0
    val aKm = math.pow(0.0743669161 / xn, 2.0 / 3.0) * 6378.135
    (0 to 130 by 5).foreach { t =>
      val p = pos(t.toDouble)
      val r = math.sqrt(p(0) * p(0) + p(1) * p(1) + p(2) * p(2))
      assert(math.abs(r - aKm) <= aKm * (e0 + 0.01), s"t=$t r=$r vs a=$aKm")
    }
  }
}

/** geo_overpass end-to-end: SGP4 track feeding station visibility. */
class OverpassSpec extends SparkSpecBase {

  test("sgp4Track subpoints respect inclination and LEO altitude") {
    val t = graft.operators.Geo.sgp4Track(spark).collect()
    assert(t.length == 5 * 1440)
    t.foreach { r =>
      val lat = r.getAs[Double]("tlat"); val lon = r.getAs[Double]("tlon")
      val alt = r.getAs[Double]("alt_km")
      assert(math.abs(lat) < 61.0, s"subpoint lat $lat beyond inclination bound")
      assert(lon >= -180.0 && lon < 180.0, s"lon $lon unnormalized")
      assert(alt > 350.0 && alt < 800.0, s"altitude $alt not LEO")
    }
  }

  test("sgp4TrackLocal twin is bit-identical to the column pipeline (oracle literals)") {
    // the VALUES-table oracle is only sound if the driver-side twin
    // reproduces the codegen pipeline's doubles EXACTLY, row for row
    val sparkTrack = graft.operators.Geo.sgp4Track(spark)
      .select("sat_id", "minute", "tlat", "tlon").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    val local = graft.operators.Geo.sgp4TrackLocal
    assert(local.size == sparkTrack.size)
    local.foreach { case (s, m, la, lo) =>
      val (sla, slo) = sparkTrack((s, m))
      assert(java.lang.Double.doubleToRawLongBits(la)
        == java.lang.Double.doubleToRawLongBits(sla), s"tlat differs at ($s,$m): $la vs $sla")
      assert(java.lang.Double.doubleToRawLongBits(lo)
        == java.lang.Double.doubleToRawLongBits(slo), s"tlon differs at ($s,$m): $lo vs $slo")
    }
  }

  test("geo_overpass: visibility windows are sane and high-latitude stations excluded") {
    val rows = run("geo_overpass").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("min_dist_km") <= 1000.0)
      val first = r.getAs[Int]("first_visible_min")
      assert(first >= 0 && first < 1440)
      val n = r.getAs[Long]("n_visible_min")
      assert(n >= 1L && n <= 1440L)
    }
    // a station poleward of inclination + visibility radius can never
    // come within 1000 km of any subpoint
    val st = graft.operators.Geo.stationsFor(spark, sf)
      .collect().map(r => r.getAs[Long]("s_suppkey") -> r.getAs[Double]("s_lat")).toMap
    rows.foreach { r =>
      val lat = st(r.getAs[Long]("s_suppkey"))
      assert(math.abs(lat) < 70.0, s"impossible overpass at station lat $lat")
    }
  }
}
