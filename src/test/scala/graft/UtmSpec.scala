package graft

import graft.operators.Geo
import org.apache.spark.sql.functions._

class UtmSpec extends SparkSpecBase {

  test("UTM projection matches known geodetic fixtures within 1 m") {
    import spark.implicits._
    // (lat, lon, zone, easting, northing) — cross-validated against an
    // independent implementation of the published Krüger series
    val fixtures = Seq(
      (37.7749, -122.4194, 10L, 551130.77, 4180998.88),  // San Francisco
      (-33.8688, 151.2093, 56L, 334368.63, 6250948.35),  // Sydney (southern)
      (51.5074, -0.1278, 30L, 699316.23, 5710163.76))    // London
    val df = fixtures.map(f => (f._1, f._2)).toDF("lat", "lon")
    val out = Geo.withUtm(df, col("lat"), col("lon")).collect()
    fixtures.zip(out).foreach { case ((la, lo, z, e, n), row) =>
      assert(row.getAs[Long]("utm_zone") == z, s"zone for ($la,$lo)")
      assert(math.abs(row.getAs[Double]("utm_easting") - e) < 1.0,
        s"easting ($la,$lo): ${row.getAs[Double]("utm_easting")} vs $e")
      assert(math.abs(row.getAs[Double]("utm_northing") - n) < 1.0,
        s"northing ($la,$lo): ${row.getAs[Double]("utm_northing")} vs $n")
    }
  }

  test("UTM zone exceptions: southwest Norway and Svalbard bands") {
    import spark.implicits._
    val cases = Seq(
      (60.0, 5.0, 32L),   // Bergen: zone-31 lon band but Norway override -> 32
      (60.0, 1.0, 31L),   // west of the exception: normal formula
      (72.0, 7.0, 31L),   // Svalbard 6..9E -> 31
      (72.0, 10.0, 33L),  // Svalbard 9..12E -> 33
      (72.0, 20.0, 33L),  // Svalbard 18..21E -> 33
      (72.0, 22.0, 35L),  // Svalbard 21..24E -> 35
      (72.0, 31.0, 35L),  // Svalbard 30..33E -> 35
      (50.0, 5.0, 31L))   // south of Norway band: normal formula
    val df = cases.map(c => (c._1, c._2)).toDF("lat", "lon")
    val out = Geo.withUtm(df, col("lat"), col("lon")).collect()
    cases.zip(out).foreach { case ((la, lo, z), row) =>
      assert(row.getAs[Long]("utm_zone") == z,
        s"zone for ($la,$lo): got ${row.getAs[Long]("utm_zone")} want $z")
    }
  }

  test("MGRS latitude bands: letters by 8-degree belt, skipping I/O") {
    import spark.implicits._
    val cases = Seq(
      (-85.0, -10.0, "A"), (-85.0, 10.0, "B"), (-79.9, 0.0, "C"),
      (0.0, 0.0, "N"), (37.7, -122.4, "S"), (51.5, 0.0, "U"),
      (60.0, 5.0, "V"), (73.0, 10.0, "X"), (85.0, -10.0, "Y"), (85.0, 10.0, "Z"))
    val df = cases.map(c => (c._1, c._2)).toDF("lat", "lon")
    val out = Geo.withUtm(df, col("lat"), col("lon")).collect()
    cases.zip(out).foreach { case ((la, lo, b), row) =>
      assert(row.getAs[String]("utm_band") == b,
        s"band for ($la,$lo): got ${row.getAs[String]("utm_band")} want $b")
    }
  }

  test("UTM inverse closes the round trip below 1 mm") {
    import spark.implicits._
    val pts = Seq((37.7749, -122.4194), (-33.8688, 151.2093), (51.5074, -0.1278),
      (60.0, 5.0), (72.0, 20.0), (-70.0, 179.9), (0.001, -0.001), (83.5, 100.0))
    val df = pts.toDF("lat", "lon")
    val fwd = Geo.withUtm(df, col("lat"), col("lon"))
      .withColumn("is_south", col("lat") < 0.0)
    val back = Geo.withUtmInverse(fwd, col("utm_zone"), col("is_south"),
      col("utm_easting"), col("utm_northing")).collect()
    pts.zip(back).foreach { case ((la, lo), row) =>
      val dlat = math.abs(row.getAs[Double]("lat_rt") - la)
      val dlon = math.abs(row.getAs[Double]("lon_rt") - lo)
      // 1 mm ≈ 9e-9 deg latitude; longitude scaled by cos(lat)
      assert(dlat < 1e-8, s"lat closure ($la,$lo): $dlat deg")
      assert(dlon * math.cos(math.toRadians(la)) < 1e-8, s"lon closure ($la,$lo): $dlon deg")
    }
  }

  test("geo_utm runs over events with valid zones/bands") {
    val rows = run("geo_utm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("utm_zone")
      assert(z >= 1 && z <= 60)
      val e = r.getAs[Double]("easting_m")
      assert(e > 0 && e < 1000000.0)
      assert("CDEFGHJKLMNPQRSTUVWX".contains(r.getAs[String]("band")))
    }
  }
}
