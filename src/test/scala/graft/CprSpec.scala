package graft

import org.apache.spark.sql.functions._

/** ADS-B CPR airborne position decode (geo_cpr_decode + Geo.cprDecode).
  * Error bounds come from the format itself: latitude quantization is
  * dlat1/2^18 ≈ 23.3 µdeg everywhere; longitude quantization is
  * (360/NL)/2^18, widening toward the poles.
  */
class CprSpec extends SparkSpecBase {

  test("geo_cpr_decode: every fixed row within CPR quantization error") {
    val df = run("geo_cpr_decode").cache()
    val n = Tables.events(spark, sf).count()
    assert(df.count() == n)
    val codesBad = df.filter(
      col("yz0") < 0 || col("yz0") > 131071 || col("xz0") < 0 || col("xz0") > 131071 ||
        col("yz1") < 0 || col("yz1") > 131071 || col("xz1") < 0 || col("xz1") > 131071)
      .count()
    assert(codesBad == 0)
    val fixed = df.filter(col("zone_ok")).cache()
    assert(fixed.count() > n * 95 / 100)
    assert(fixed.filter(col("lat_err_udeg") > 24).count() == 0)
    assert(fixed.filter(col("lon_err_udeg") > 80).count() == 0)
  }

  test("CPR sweep: high latitudes decode, zone transitions reject (not mis-fix)") {
    // 0.0371-deg latitude steps pole-band to pole-band, longitude winding
    val t = spark.range(4685).select(
      col("id").as("event_id"),
      (lit(-86.9) + col("id") * 0.0371).as("tlat"),
      ((col("id") * 7.1) % 360.0 - 180.0).as("tlon"))
    val out = operators.Geo.cprDecode(t).cache()
    val fixed = out.filter(col("zone_ok")).cache()
    assert(fixed.count() > out.count() * 9 / 10)
    assert(fixed.filter(col("lat_err_udeg") > 24).count() == 0)
    // per-row longitude bound: half-step (360/NL)/2^18 deg = 1373.3/NL µdeg
    val lonBad = fixed.filter(
      col("lon_err_udeg") > lit(1374.0) / col("nl") + 1.0).count()
    assert(lonBad == 0)
  }

  test("geo_cpr_local: decode exact whenever the reference is in zone") {
    val df = run("geo_cpr_local").cache()
    assert(df.count() > 0)
    // latitude: in-half-zone reference ⇒ quantization-level error
    assert(df.filter(col("in_lat_zone") && col("lat_err_udeg") > 24).count() == 0)
    // longitude: needs both the half-zone reference and NL agreement
    assert(df.filter(col("in_lat_zone") && col("in_lon_zone")
      && col("lon_err_udeg") > 80).count() == 0)
    // the ambiguity boundary is real: out-of-zone references must exist in
    // this data (longitude jumps between consecutive events) and their
    // errors are whole zone widths, not quantization noise
    val out = df.filter(!col("in_lon_zone"))
    assert(out.count() > 0)
    assert(out.filter(col("lon_err_udeg") > 100000).count() > 0)
  }

  test("CPR zone transitions: pairs straddling an NL boundary reject, not mis-fix") {
    // closed-form transition latitude for zone count NL (Doc 9871):
    // lat_t = acos(sqrt((1 - cos(pi/(2*NZ))) / (1 - cos(2*pi/NL))))
    def latT(nl: Int): Double = math.toDegrees(math.acos(math.sqrt(
      (1.0 - math.cos(math.Pi / 30.0)) / (1.0 - math.cos(2.0 * math.Pi / nl)))))
    // 1-µdeg steps across ±100 µdeg of several transition latitudes: the
    // even (45.8 µdeg) and odd (46.6 µdeg) quantization grids interleave,
    // so some truth latitudes quantize to opposite sides of the boundary
    val frames = Seq(20, 30, 40, 50).map { nl =>
      val lt = latT(nl)
      spark.range(201).select(
        (col("id") + nl * 1000).as("event_id"),
        (lit(lt - 100.0e-6) + col("id") * 1.0e-6).as("tlat"),
        lit(17.25).as("tlon"))
    }.reduce(_ union _)
    val out = operators.Geo.cprDecode(frames).cache()
    val rejected = out.filter(!col("zone_ok")).count()
    assert(rejected > 0, "no frame pair rejected at any scanned NL boundary")
    // and the rejection is honest: every fixed row still decodes correctly
    assert(out.filter(col("zone_ok")).filter(col("lat_err_udeg") > 24).count() == 0)
  }
}
