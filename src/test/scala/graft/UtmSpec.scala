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

  test("geo_utm runs over events and zones are valid") {
    val rows = run("geo_utm").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("utm_zone")
      assert(z >= 1 && z <= 60)
      val e = r.getAs[Double]("utm_easting")
      assert(e > 0 && e < 1000000.0)
    }
  }
}
