package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property checks for the round's codec/format kernels — pure JVM
  * re-implementations of the same arithmetic the Spark/DuckDB shared
  * formula texts evaluate (pinned against each other by the oracle
  * gate); these pin the algebraic invariants on randomized inputs no
  * fixed dataset would cover.
  */
object CodecProps extends Properties("codecs") {

  // ---- CPR airborne encode/decode (geo_cpr_decode's arithmetic) ----
  private val NZ = 15
  private def nl(lat: Double): Int = {
    val a = math.abs(lat)
    if (a > 87.0) 1
    else if (a == 87.0) 2
    else if (a < 1e-9) 59
    else math.floor(2.0 * math.Pi / math.acos(1.0 -
      (1.0 - math.cos(math.Pi / (2.0 * NZ))) /
        math.pow(math.cos(math.toRadians(lat)), 2))).toInt
  }
  private def fmod(x: Double, y: Double): Double = x - y * math.floor(x / y)
  private def encode(lat: Double, lon: Double, i: Int): (Long, Long) = {
    val dlat = if (i == 0) 6.0 else 360.0 / 59.0
    val yz = fmod(math.floor(131072.0 * fmod(lat, dlat) / dlat + 0.5), 131072.0).toLong
    val rlat = dlat * (yz / 131072.0 + math.floor(lat / dlat))
    val n = math.max(nl(rlat) - i, 1)
    val dlon = 360.0 / n
    val xz = fmod(math.floor(131072.0 * fmod(lon, dlon) / dlon + 0.5), 131072.0).toLong
    (yz, xz)
  }
  private def decodeGlobal(yz0: Long, xz0: Long, yz1: Long, xz1: Long)
      : Option[(Double, Double)] = {
    val j = math.floor((59.0 * yz0 - 60.0 * yz1) / 131072.0 + 0.5)
    def adj(r: Double) = if (r >= 270.0) r - 360.0 else r
    val rlat0 = adj(6.0 * (fmod(j, 60.0) + yz0 / 131072.0))
    val rlat1 = adj((360.0 / 59.0) * (fmod(j, 59.0) + yz1 / 131072.0))
    if (nl(rlat0) != nl(rlat1)) None
    else {
      val n = math.max(nl(rlat0), 1)
      val m = math.floor((xz0 * (nl(rlat0) - 1.0) - xz1 * nl(rlat0)) / 131072.0 + 0.5)
      val rlon0 = (360.0 / n) * (fmod(m, n) + xz0 / 131072.0)
      Some((rlat0, if (rlon0 >= 180.0) rlon0 - 360.0 else rlon0))
    }
  }

  property("CPR global decode inverts encode within quantization") =
    forAll(Gen.chooseNum(-86.5, 86.5), Gen.chooseNum(-180.0, 180.0)) {
      (lat: Double, lon: Double) =>
        val (yz0, xz0) = encode(lat, lon, 0)
        val (yz1, xz1) = encode(lat, lon, 1)
        decodeGlobal(yz0, xz0, yz1, xz1) match {
          case None => true // zone straddle: honest rejection
          case Some((dlat, dlon)) =>
            val dl = math.abs(fmod(dlon - lon + 180.0, 360.0) - 180.0)
            math.abs(dlat - lat) < 2.5e-5 &&
              dl < 360.0 / math.max(nl(dlat) - 1, 1) / 131072.0 + 1e-9
        }
    }

  property("NL non-increasing away from the equator") =
    forAll(Gen.chooseNum(0.0, 86.0), Gen.chooseNum(0.0, 0.9)) {
      (lat: Double, d: Double) => nl(lat + d) <= nl(lat)
    }

  // ---- Sentinel-2 tile codec (geo_overpass_tiles' bit layout) ----
  private def tileEnc(id: String): Long = {
    val c = id.getBytes
    (c(0) & 0xFFL) | ((c(1) & 0xFFL) << 8) | ((c(2) & 0xFFL) << 16) |
      ((c(3) & 0xFFL) << 32) | ((c(4) & 0xFFL) << 40)
  }
  private def tileDec(e: Long): String =
    new String(Array[Byte]((e & 0xFF).toByte, ((e >> 8) & 0xFF).toByte,
      ((e >> 16) & 0xFF).toByte, ((e >> 32) & 0xFF).toByte,
      ((e >> 40) & 0xFF).toByte))

  private val tileIds = for {
    z <- Gen.chooseNum(1, 60)
    b <- Gen.oneOf("CDEFGHJKLMNPQRSTUVWX".toSeq)
    s1 <- Gen.oneOf("ABCDEFGHJKLMNPQRSTUVWXYZ".toSeq)
    s2 <- Gen.oneOf("ABCDEFGHJKLMNPQRSTUVWXYZ".toSeq)
  } yield f"$z%02d$b$s1$s2"

  property("tile codec round-trips any 5-char MGRS-style id") =
    forAll(tileIds) { id => tileDec(tileEnc(id)) == id }

  property("tile encodings are distinct for distinct ids") =
    forAll(tileIds, tileIds) { (a, b) => (a == b) == (tileEnc(a) == tileEnc(b)) }

  // ---- TLE mod-10 checksum (geo_tle_parse's rule) ----
  private def tleChecksum(line: String): Int =
    line.take(68).map {
      case c if c.isDigit => c - '0'
      case '-' => 1
      case _ => 0
    }.sum % 10

  private val tlePayload = Gen.listOfN(68, Gen.frequency(
    6 -> Gen.numChar, 2 -> Gen.const(' '), 1 -> Gen.const('-'),
    1 -> Gen.alphaUpperChar)).map(_.mkString)

  property("TLE checksum ignores weight-0 chars, counts '-' as 1") =
    forAll(tlePayload) { line =>
      val ck = tleChecksum(line)
      val noisy = line.map(c => if (c.isLetter || c == ' ') 'X' else c)
      def w(c: Char) = if (c.isDigit) c - '0' else if (c == '-') 1 else 0
      val bumped = ("-" + line.drop(1)).take(68)
      ck >= 0 && ck <= 9 &&
        tleChecksum(noisy) == ck &&
        tleChecksum(bumped) == (((ck - w(line.head)) + 1) % 10 + 10) % 10
    }
}
