package graft

import org.apache.spark.sql.functions._

/** GOES-R fixed-grid projection sanity (geo_goes_project): the published
  * geostationary geometry puts the sub-satellite point at (0,0) scan
  * angles, and every on-disk pixel within the Earth-limb cone.
  */
class GoesProjSpec extends SparkSpecBase {

  test("nadir scan angles project to the sub-satellite point") {
    import spark.implicits._
    val df = Seq((0L, 0L)).toDF("e", "u")
      .withColumn("scan_x", lit(0.0)).withColumn("scan_y", lit(0.0))
    val out = graft.operators.Geo.GoesK.apply1(
      graft.operators.Geo.GoesK.apply1(df, graft.operators.Geo.GoesK.discSteps),
      graft.operators.Geo.GoesK.geoSteps).collect()(0)
    assert(math.abs(out.getAs[Double]("glat")) < 1e-9)
    assert(math.abs(out.getAs[Double]("glon") - (-137.0)) < 1e-9)
  }

  test("geo_goes_project: on-disk pixels stay inside the limb cone") {
    val rows = run("geo_goes_project").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lat = r.getAs[Double]("lat_deg")
      val lon = r.getAs[Double]("lon_deg")
      // geostationary visibility: within ~81.3 deg great-circle of nadir
      assert(math.abs(lat) <= 81.4, s"lat $lat")
      val dlon = math.abs(lon - (-137.0))
      assert(dlon <= 81.4 + 1e-9 || 360.0 - dlon <= 81.4 + 1e-9, s"lon $lon")
    }
  }
}
