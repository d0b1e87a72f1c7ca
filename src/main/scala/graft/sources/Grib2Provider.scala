package graft.sources

import java.io.RandomAccessFile
import java.nio.ByteBuffer
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal pure-JVM GRIB2 (WMO FM 92 edition 2) reader/writer — the
  * forecast-grid format the reference pulls from NOMADS and decodes
  * through GDAL (odin_gdal/src/lib.rs:61 maps "grib2"→"GRIB";
  * odin_hrrr/src/lib.rs downloads the HRRR field files that odin_wind's
  * grid/vector/contour products consume). No GDAL ships in this
  * container, so the section parse is done directly against the public
  * spec. Supported subset — the shape every HRRR surface field uses:
  * grid definition templates 3.0 (regular lat/lon) and 3.30 (Lambert
  * conformal conic — the actual HRRR CONUS projection, geolocated per
  * cell via the spherical Snyder inverse), product definition template
  * 4.0, data representation templates 5.0 (simple packing), 5.41 (PNG
  * packing, decoded with the JDK's ImageIO PNG codec; 5.40 JPEG2000 is
  * excluded — no JPEG2000 codec exists in the JDK or this container —
  * see SURVEY §2.H), 5.2 (complex/group packing) and 5.3 (complex +
  * order-1/2 spatial
  * differencing — what NOMADS actually ships for HRRR), optional
  * bitmap (section 6), any number of messages per file.
  *
  * Scale shape (what a 100 TB HRRR archive sweep needs):
  * - one InputPartition PER MESSAGE (field × level × forecast hour) —
  *   the natural parallel unit of a GRIB file; a reader seeks to its
  *   message's byte range and never touches the rest of the file;
  * - column pruning (SupportsPushDownRequiredColumns) — a query that
  *   needs only `value` never materializes georeferencing or
  *   product-identification columns;
  * - bit-unpacking is branch-free integer math inside the reader, and
  *   every emitted coordinate is pure arithmetic on the template's
  *   microdegree integers (no trig, no CRS library).
  */
object Grib2 {
  val SCHEMA: StructType = StructType(Seq(
    StructField("msg", IntegerType, nullable = false),
    StructField("discipline", IntegerType, nullable = false),
    StructField("category", IntegerType, nullable = false),
    StructField("parameter", IntegerType, nullable = false),
    StructField("level_type", IntegerType, nullable = false),
    StructField("level", DoubleType, nullable = false),
    StructField("ref_time", LongType, nullable = false), // epoch seconds UTC
    StructField("forecast_hour", IntegerType, nullable = false),
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = true),  // null = bitmap-missing
    StructField("file", StringType, nullable = false),  // file basename (multi-file reads)
    StructField("stat_type", IntegerType, nullable = true),  // 4.8: code table 4.10 (null for 4.0)
    StructField("interval_end", LongType, nullable = true))) // 4.8: epoch sec of interval end

  /** Lambert-conformal-conic grid parameters (grid definition template
    * 3.30) — the projection the real HRRR surface grid uses (tangent
    * cone at 38.5°N, LoV 262.5°E, 3 km spacing). Spherical earth
    * (shape 6, R = 6 371 229 m), standard Snyder formulas.
    */
  final case class Lcc(latin1Deg: Double, latin2Deg: Double,
      loVDeg: Double, dxM: Double, dyM: Double)

  /** Polar-stereographic grid parameters (grid definition template
    * 3.20) — the projection NDFD Alaska products ship (standard parallel
    * LaD = 60°N, orientation LoV = −150°, north-polar aspect). Spherical
    * earth (shape 6, R = 6 371 229 m).
    */
  final case class Ps(laDDeg: Double, loVDeg: Double, dxM: Double, dyM: Double)

  /** Statistical processing over a time interval (product definition
    * template 4.8) — what real NDFD products carry (12-h PoP, 6-h QPF
    * accumulations, daily max-T). `statType` is the code-table 4.10
    * process (0 avg, 1 accumulation, 2 max, 3 min); the interval starts
    * at the forecast time and spans `intervalHours`.
    */
  final case class Stat(statType: Int, intervalHours: Int)

  /** One GRIB2 message to encode: a single field/level/forecast-hour on
    * either a regular lat/lon grid (template 3.0; scanned +i west→east,
    * −j north→south; di/dj degrees), or, when `lcc` is set, a Lambert
    * conformal grid (template 3.30), or, when `ps` is set, a polar
    * stereographic grid (template 3.20) — both projected grids scanned
    * +i, +j, row-major from the first point, di/dj ignored. (la1, lo1)
    * is the first grid point in all cases. `values` row-major; NaN marks
    * a missing cell (encoded via a section-6 bitmap).
    */
  final case class Field(
      discipline: Int, category: Int, parameter: Int,
      levelType: Int, level: Int,
      year: Int, month: Int, day: Int, hour: Int,
      forecastHour: Int,
      ni: Int, nj: Int,
      la1Deg: Double, lo1Deg: Double, diDeg: Double, djDeg: Double,
      values: Array[Double],
      decScale: Int = 2, nBits: Int = 16,
      lcc: Option[Lcc] = None,
      packing: Int = 0, // 0 = simple 5.0, 2 = complex 5.2, 3 = 5.3 (order-2 spatial differencing), 41 = PNG 5.41
      ps: Option[Ps] = None,
      stat: Option[Stat] = None) { // Some = product template 4.8, None = 4.0
    require(values.length == ni * nj, s"expect ${ni * nj} values")
    require(packing == 0 || packing == 2 || packing == 3 || packing == 41
        || packing == 200,
      s"packing $packing")
    require(packing != 41 || nBits <= 16, "PNG packing: depth 8 or 16 only")
    require(lcc.isEmpty || ps.isEmpty, "at most one of lcc/ps")
  }

  /** Spherical Lambert conformal conic (Snyder 1987, eq. 15-1..15-5),
    * shared by the reader (inverse, per cell) and specs (forward).
    * Returns meters from the projection origin (LoV meridian, LaD =
    * latin1 reference latitude).
    */
  object LccMath {
    val R = 6371229.0
    final case class Cone(n: Double, f: Double, rho0: Double, lov: Double)
    def cone(p: Lcc): Cone = {
      val p1 = math.toRadians(p.latin1Deg); val p2 = math.toRadians(p.latin2Deg)
      val n =
        if (math.abs(p1 - p2) < 1e-12) math.sin(p1)
        else math.log(math.cos(p1) / math.cos(p2)) /
          math.log(math.tan(Math.PI / 4 + p2 / 2) / math.tan(Math.PI / 4 + p1 / 2))
      val f = math.cos(p1) * math.pow(math.tan(Math.PI / 4 + p1 / 2), n) / n
      val rho0 = R * f / math.pow(math.tan(Math.PI / 4 + p1 / 2), n)
      Cone(n, f, rho0, math.toRadians(p.loVDeg))
    }
    def forward(c: Cone, latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      var dlon = math.toRadians(lonDeg) - c.lov
      while (dlon > Math.PI) dlon -= 2 * Math.PI
      while (dlon < -Math.PI) dlon += 2 * Math.PI
      val rho = R * c.f / math.pow(math.tan(Math.PI / 4 + phi / 2), c.n)
      val th = c.n * dlon
      (rho * math.sin(th), c.rho0 - rho * math.cos(th))
    }
    def inverse(c: Cone, x: Double, y: Double): (Double, Double) = {
      val sgn = if (c.n < 0) -1.0 else 1.0
      val rho = sgn * math.hypot(x, c.rho0 - y)
      val th = math.atan2(sgn * x, sgn * (c.rho0 - y))
      val lat = 2 * math.atan(math.pow(R * c.f / rho, 1.0 / c.n)) - Math.PI / 2
      var lon = math.toDegrees(c.lov + th / c.n)
      while (lon > 180.0) lon -= 360.0
      while (lon < -180.0) lon += 360.0
      (math.toDegrees(lat), lon)
    }
  }

  /** Spherical north-polar stereographic (Snyder 1987, eq. 21-8/21-9
    * forward, 20-14/20-16 inverse with eq. 21-15 ρ), shared by the
    * reader (inverse, per cell) and specs/queries (forward). k0 is the
    * scale at the standard parallel LaD — (1 + sin LaD)/2, Snyder
    * eq. 21-7 with φ1 = LaD — the same K0 Geo.PsK's SQL fragments use,
    * so the two forms are one formula (PsMathSpec pins the parity).
    * x/y are meters in the LoV-meridian frame: x east, y = −ρ·cos(Δλ)
    * so y increases AWAY from the pole along −LoV (the GRIB row
    * direction for scan +j grids anchored south of the pole).
    */
  object PsMath {
    val R = 6371229.0
    def k0(laDDeg: Double): Double =
      (1.0 + math.sin(math.toRadians(laDDeg))) / 2.0
    def forward(p: Ps, latDeg: Double, lonDeg: Double): (Double, Double) = {
      val rho = 2.0 * R * k0(p.laDDeg) *
        math.tan(Math.PI / 4.0 - math.toRadians(latDeg) / 2.0)
      val dl = math.toRadians(lonDeg) - math.toRadians(p.loVDeg)
      (rho * math.sin(dl), -rho * math.cos(dl))
    }
    def inverse(p: Ps, x: Double, y: Double): (Double, Double) = {
      // sqrt(x²+y²), not hypot: the oracle SQL computes sqrt, and the
      // shared-formula contract is bit-level
      val rho = math.sqrt(x * x + y * y)
      val lat = 90.0 -
        math.toDegrees(2.0 * math.atan(rho / (2.0 * R * k0(p.laDDeg))))
      var lon = p.loVDeg + math.toDegrees(math.atan2(x, -y))
      while (lon > 180.0) lon -= 360.0
      while (lon < -180.0) lon += 360.0
      (lat, lon)
    }
  }

  // ---- bit-stream helpers (sub-arrays octet-aligned, MSB first) ------

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L; private var nb = 0
    def put(v: Long, bits: Int): Unit = if (bits > 0) {
      acc = (acc << bits) | (v & ((1L << bits) - 1)); nb += bits
      while (nb >= 8) { nb -= 8; out.write(((acc >>> nb) & 0xFF).toInt) }
    }
    def align(): Unit = if (nb > 0) { out.write(((acc << (8 - nb)) & 0xFF).toInt); acc = 0; nb = 0 }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  private final class BitReader(a: Array[Byte], var byteOff: Int) {
    private var acc = 0L; private var nb = 0
    def get(bits: Int): Long = {
      if (bits == 0) return 0L
      while (nb < bits) { acc = (acc << 8) | (a(byteOff) & 0xFFL); byteOff += 1; nb += 8 }
      nb -= bits
      (acc >>> nb) & ((1L << bits) - 1)
    }
    def align(): Unit = { acc = 0L; nb = 0 }
  }

  /** Signed-magnitude n-octet integer (GRIB2 negative-number convention). */
  private def signMagN(v: Long, octets: Int): Long = {
    val signBit = 1L << (octets * 8 - 1)
    if (v < 0) signBit | -v else v
  }
  private def unSignMagN(raw: Long, octets: Int): Long = {
    val signBit = 1L << (octets * 8 - 1)
    if ((raw & signBit) != 0) -(raw & (signBit - 1)) else raw
  }

  // ---- encode --------------------------------------------------------

  private def signMag16(v: Int): Int =
    if (v < 0) 0x8000 | -v else v

  /** GRIB2 negative integers are sign-magnitude, not two's complement. */
  private def microDeg(d: Double): Int = {
    val v = Math.round(d * 1e6).toInt
    if (v < 0) 0x80000000 | -v else v
  }

  /** Write `fields` as consecutive GRIB2 messages. Values are quantized
    * to `decScale` decimals by simple packing (E=0), so a field written
    * with pre-quantized values round-trips exactly.
    */
  def write(path: String, fields: Seq[Field]): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    fields.foreach { f => out.write(encodeMessage(f)) }
    Files.write(Paths.get(path), out.toByteArray)
  }

  private def encodeMessage(f: Field): Array[Byte] = {
    val n = f.ni * f.nj
    val present = f.values.map(v => !v.isNaN)
    val nPresent = present.count(identity)
    val hasBitmap = nPresent < n
    val dec = math.pow(10, f.decScale)
    // scale to integers; R = min so X >= 0
    val scaled = f.values.collect { case v if !v.isNaN => Math.round(v * dec) }
    val rRef = if (scaled.isEmpty) 0L else scaled.min
    val xs = scaled.map(s => (s - rRef).toInt)
    if (f.packing != 200)
      require(xs.forall(x => x < (1L << f.nBits)),
        s"value range needs more than ${f.nBits} bits")
    // run-length packing (5.200): the level table is the sorted distinct
    // scaled values (level 1..MV); NaN cells are level 0 (in-stream
    // missing — 5.200 products carry no section-6 bitmap). 8-bit values,
    // so MV <= 254 keeps at least one repeat digit in range.
    val rleLevelVals: Array[Long] =
      if (f.packing == 200) scaled.distinct.sorted.toArray
      else Array.emptyLongArray
    val rleCodes: Array[Int] =
      if (f.packing == 200) {
        require(rleLevelVals.length <= 254,
          s"5.200: ${rleLevelVals.length} levels exceed the 8-bit cap of 254")
        require(rleLevelVals.forall(v => v >= 0 && v <= 0xFFFF),
          "5.200: scaled level values must fit 2 octets (0..65535)")
        val idx = rleLevelVals.zipWithIndex.toMap
        f.values.map(v =>
          if (v.isNaN) 0 else idx(Math.round(v * dec)) + 1)
      } else Array.emptyIntArray

    def sec(num: Int, body: ByteBuffer => Unit, bodyLen: Int): Array[Byte] = {
      val bb = ByteBuffer.allocate(5 + bodyLen) // big-endian by default
      bb.putInt(5 + bodyLen).put(num.toByte)
      body(bb)
      bb.array()
    }
    val s1 = sec(1, bb => {
      bb.putShort(0).putShort(0) // centre, subcentre
      bb.put(2.toByte).put(1.toByte).put(1.toByte) // tables, local, sig=start
      bb.putShort(f.year.toShort).put(f.month.toByte).put(f.day.toByte)
      bb.put(f.hour.toByte).put(0.toByte).put(0.toByte)
      bb.put(0.toByte).put(1.toByte) // operational, forecast
    }, 16)
    val s3 = (f.lcc, f.ps) match {
      case (None, Some(p)) => sec(3, bb => {
        bb.put(0.toByte).putInt(n).put(0.toByte).put(0.toByte)
        bb.putShort(20) // template 3.20: polar stereographic
        bb.put(6.toByte) // sphere 6371.229 km
        bb.put(0.toByte).putInt(0).put(0.toByte).putInt(0).put(0.toByte).putInt(0)
        bb.putInt(f.ni).putInt(f.nj)
        bb.putInt(microDeg(f.la1Deg)).putInt(microDeg(f.lo1Deg))
        bb.put(48.toByte) // res/component flags
        bb.putInt(microDeg(p.laDDeg)) // LaD: lat where dx/dy are true
        bb.putInt(microDeg(p.loVDeg))
        bb.putInt(Math.round(p.dxM * 1000).toInt) // 10^-3 m
        bb.putInt(Math.round(p.dyM * 1000).toInt)
        bb.put(0.toByte) // projection centre: north pole
        bb.put(64.toByte) // scan mode: +i, +j (row-major from first point)
      }, 60)
      case (None, None) => sec(3, bb => {
        bb.put(0.toByte).putInt(n).put(0.toByte).put(0.toByte)
        bb.putShort(0) // template 3.0: lat/lon
        bb.put(6.toByte) // shape of earth: sphere 6371.229 km
        bb.put(0.toByte).putInt(0).put(0.toByte).putInt(0).put(0.toByte).putInt(0)
        bb.putInt(f.ni).putInt(f.nj)
        bb.putInt(0).putInt(0) // basic angle, subdivisions
        bb.putInt(microDeg(f.la1Deg)).putInt(microDeg(f.lo1Deg))
        bb.put(48.toByte) // res/component flags: di+dj given
        bb.putInt(microDeg(f.la1Deg - (f.nj - 1) * f.djDeg))
        bb.putInt(microDeg(f.lo1Deg + (f.ni - 1) * f.diDeg))
        bb.putInt(microDeg(f.diDeg)).putInt(microDeg(f.djDeg))
        bb.put(0.toByte) // scan mode: +i, -j
      }, 67)
      case (Some(p), _) => sec(3, bb => {
        bb.put(0.toByte).putInt(n).put(0.toByte).put(0.toByte)
        bb.putShort(30) // template 3.30: Lambert conformal
        bb.put(6.toByte) // sphere 6371.229 km
        bb.put(0.toByte).putInt(0).put(0.toByte).putInt(0).put(0.toByte).putInt(0)
        bb.putInt(f.ni).putInt(f.nj)
        bb.putInt(microDeg(f.la1Deg)).putInt(microDeg(f.lo1Deg))
        bb.put(48.toByte)
        bb.putInt(microDeg(p.latin1Deg)) // LaD
        bb.putInt(microDeg(p.loVDeg))
        bb.putInt(Math.round(p.dxM * 1000).toInt) // 10^-3 m
        bb.putInt(Math.round(p.dyM * 1000).toInt)
        bb.put(0.toByte) // projection centre: north pole
        bb.put(64.toByte) // scan mode: +i, +j (row-major from SW)
        bb.putInt(microDeg(p.latin1Deg)).putInt(microDeg(p.latin2Deg))
        bb.putInt(microDeg(-90.0)).putInt(0) // south pole of projection
      }, 76)
    }
    val s4 = sec(4, bb => {
      bb.putShort(0).putShort(if (f.stat.isDefined) 8 else 0) // NV, template
      bb.put(f.category.toByte).put(f.parameter.toByte)
      bb.put(2.toByte).put(0.toByte).put(0.toByte) // forecast, background, process
      bb.putShort(0).put(0.toByte) // cutoff h, min
      bb.put(1.toByte).putInt(f.forecastHour) // unit=hour
      bb.put(f.levelType.toByte).put(0.toByte).putInt(f.level)
      bb.put(255.toByte).put(255.toByte).putInt(-1) // no second surface
      f.stat.foreach { st =>
        // template 4.8 tail: end of overall interval, one time range
        val end = java.time.LocalDateTime
          .of(f.year, f.month, f.day, f.hour, 0, 0)
          .plusHours(f.forecastHour.toLong + st.intervalHours)
        bb.putShort(end.getYear.toShort).put(end.getMonthValue.toByte)
        bb.put(end.getDayOfMonth.toByte).put(end.getHour.toByte)
        bb.put(end.getMinute.toByte).put(end.getSecond.toByte)
        bb.put(1.toByte) // one time range specification
        bb.putInt(0) // no missing values in interval
        bb.put(st.statType.toByte)
        bb.put(2.toByte) // increment type: same start, fcst time incremented
        bb.put(1.toByte).putInt(st.intervalHours) // range unit=hour, length
        bb.put(1.toByte).putInt(0) // increment unit=hour, continuous
      }
    }, if (f.stat.isDefined) 53 else 29)
    // ---- data representation: simple (5.0) or complex (5.2 / 5.3) -----
    val G = 32 // cells per group for complex packing
    def bitsFor(v: Long): Int =
      if (v <= 0) 0 else 64 - java.lang.Long.numberOfLeadingZeros(v)
    val n0 = xs.length
    // 5.3 work sequence: order-2 differences offset to non-negative
    val d2 = new Array[Long](n0)
    if (f.packing == 3) {
      var k = 2; while (k < n0) { d2(k) = xs(k).toLong - 2L * xs(k - 1) + xs(k - 2); k += 1 }
    }
    val gmin: Long =
      if (f.packing == 3 && n0 > 2) (2 until n0).iterator.map(d2).min else 0L
    val hseq: Array[Long] = f.packing match {
      case 2 => xs.map(_.toLong)
      case 3 =>
        val a = new Array[Long](n0)
        var k = 2; while (k < n0) { a(k) = d2(k) - gmin; k += 1 }; a
      case _ => Array.emptyLongArray
    }
    val ng = if (f.packing == 2 || f.packing == 3) (n0 + G - 1) / G else 0
    val grpRef = new Array[Long](ng); val grpWidth = new Array[Int](ng)
    var gi = 0
    while (gi < ng) {
      val s = gi * G; val e = math.min(n0, s + G)
      var mn = Long.MaxValue; var mx = Long.MinValue
      var k = s; while (k < e) { mn = math.min(mn, hseq(k)); mx = math.max(mx, hseq(k)); k += 1 }
      grpRef(gi) = mn; grpWidth(gi) = bitsFor(mx - mn)
      gi += 1
    }
    val refBits = if (ng == 0) f.nBits else math.max(1, bitsFor(grpRef.max))
    val lastLen = if (ng == 0) 0 else n0 - (ng - 1) * G

    // PNG depth: 8-bit gray for narrow fields, 16-bit gray otherwise
    // (what g2clib's pngpack chooses for nbits <= 16)
    val pngDepth = if (f.nBits <= 8) 8 else 16
    val s5 =
      if (f.packing == 0) sec(5, bb => {
        bb.putInt(nPresent).putShort(0) // template 5.0
        bb.putFloat(rRef.toFloat)
        bb.putShort(signMag16(0).toShort) // binary scale E = 0
        bb.putShort(signMag16(f.decScale).toShort)
        bb.put(f.nBits.toByte).put(0.toByte) // original field: float
      }, 16)
      else if (f.packing == 41) sec(5, bb => {
        bb.putInt(nPresent).putShort(41) // template 5.41: PNG
        bb.putFloat(rRef.toFloat)
        bb.putShort(signMag16(0).toShort)
        bb.putShort(signMag16(f.decScale).toShort)
        bb.put(pngDepth.toByte).put(0.toByte)
      }, 16)
      else if (f.packing == 200) sec(5, bb => {
        val mv = rleLevelVals.length
        bb.putInt(n).putShort(200) // template 5.200: run length + levels
        bb.put(8.toByte) // nBits
        bb.putShort(mv.toShort) // MV: max level value used
        bb.putShort(mv.toShort) // MVL: level-table size (all used)
        val d = f.decScale // 8-bit sign-magnitude
        bb.put((if (d < 0) 0x80 | (-d) else d).toByte)
        rleLevelVals.foreach(v => bb.putShort(v.toShort))
      }, 12 + 2 * rleLevelVals.length)
      else sec(5, bb => {
        bb.putInt(nPresent).putShort(f.packing.toShort) // template 5.2 / 5.3
        bb.putFloat(rRef.toFloat)
        bb.putShort(signMag16(0).toShort)
        bb.putShort(signMag16(f.decScale).toShort)
        bb.put(refBits.toByte).put(0.toByte)
        bb.put(1.toByte) // group splitting: general
        bb.put(0.toByte) // missing value management: none
        bb.putInt(0).putInt(0) // primary/secondary missing substitutes
        bb.putInt(ng)
        bb.put(0.toByte) // group width reference
        bb.put(8.toByte) // bits per group width
        bb.putInt(G) // group length reference
        bb.put(1.toByte) // length increment
        bb.putInt(lastLen) // true length of last group
        bb.put(0.toByte) // bits for scaled group lengths (uniform G)
        if (f.packing == 3) { bb.put(2.toByte); bb.put(4.toByte) } // order 2, 4-octet extras
      }, if (f.packing == 2) 42 else 44)
    val s6 = // 5.200 never writes a bitmap: missing rides as level 0
      if (!hasBitmap || f.packing == 200) sec(6, bb => bb.put(255.toByte), 1)
      else sec(6, bb => {
        bb.put(0.toByte)
        var acc = 0; var nb = 0
        present.foreach { p =>
          acc = (acc << 1) | (if (p) 1 else 0); nb += 1
          if (nb == 8) { bb.put(acc.toByte); acc = 0; nb = 0 }
        }
        if (nb > 0) bb.put((acc << (8 - nb)).toByte)
      }, 1 + (n + 7) / 8)
    val s7 =
      if (f.packing == 41) {
        // PNG packing: scaled integers as a grayscale PNG — full grid
        // (Ni x Nj) without a bitmap, present-points x 1 with one (the
        // g2clib pngpack/addfield layout)
        val (iw, ih) = if (hasBitmap) (nPresent, 1) else (f.ni, f.nj)
        val img = new java.awt.image.BufferedImage(iw, ih,
          if (pngDepth == 8) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
          else java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
        val r = img.getRaster
        var k = 0
        while (k < xs.length) {
          r.setSample(k % iw, k / iw, 0, xs(k))
          k += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, "png", baos), "PNG encode")
        val data = baos.toByteArray
        sec(7, bb => bb.put(data), data.length)
      } else if (f.packing == 200) {
        // RLE encode: level byte, then repeat count − 1 as little-endian
        // base-(255 − MV) digits d encoded MV+1+d (inverse of the
        // unpk_run_length decode; a count of 1 emits no digits)
        val mv = rleLevelVals.length
        val range = 255 - mv
        val outB = new java.io.ByteArrayOutputStream()
        var i = 0
        while (i < rleCodes.length) {
          val v = rleCodes(i)
          var cnt = 0L
          while (i < rleCodes.length && rleCodes(i) == v) { cnt += 1; i += 1 }
          outB.write(v)
          var q = cnt - 1
          while (q > 0) { outB.write(mv + 1 + (q % range).toInt); q /= range }
        }
        val data = outB.toByteArray
        sec(7, bb => bb.put(data), data.length)
      } else if (f.packing == 0) {
        val packedLen = (nPresent * f.nBits + 7) / 8
        sec(7, bb => {
          var acc = 0L; var nb = 0
          xs.foreach { x =>
            acc = (acc << f.nBits) | x.toLong; nb += f.nBits
            while (nb >= 8) { nb -= 8; bb.put((acc >>> nb).toByte) }
          }
          if (nb > 0) bb.put((acc << (8 - nb)).toByte)
        }, packedLen)
      } else {
        // octet-aligned sub-arrays: [5.3 extras] refs | widths | group data
        val bw = new BitWriter
        if (f.packing == 3) {
          bw.put(signMagN(if (n0 > 0) xs(0) else 0, 4), 32)
          bw.put(signMagN(if (n0 > 1) xs(1) else 0, 4), 32)
          bw.put(signMagN(gmin, 4), 32)
          bw.align()
        }
        grpRef.foreach(r => bw.put(r, refBits)); bw.align()
        grpWidth.foreach(w => bw.put(w, 8)); bw.align()
        var g = 0
        while (g < ng) {
          val s = g * G; val e = math.min(n0, s + G)
          var k = s; while (k < e) { bw.put(hseq(k) - grpRef(g), grpWidth(g)); k += 1 }
          g += 1
        }
        val data = bw.bytes
        sec(7, bb => bb.put(data), data.length)
      }
    val bodyLen = s1.length + s3.length + s4.length + s5.length + s6.length + s7.length
    val total = 16 + bodyLen + 4
    val bb = ByteBuffer.allocate(total)
    bb.put("GRIB".getBytes).putShort(0).put(f.discipline.toByte).put(2.toByte)
    bb.putLong(total.toLong)
    Seq(s1, s3, s4, s5, s6, s7).foreach(bb.put)
    bb.put("7777".getBytes)
    bb.array()
  }

  // ---- decode --------------------------------------------------------

  final case class MsgRange(index: Int, offset: Long, length: Long)

  /** Scan the file's section-0 headers for message byte ranges — metadata
    * only, never the payloads.
    */
  def scanMessages(path: String): Seq[MsgRange] = {
    val raf = new RandomAccessFile(path, "r")
    try {
      val out = ArrayBuffer.empty[MsgRange]
      var off = 0L
      val head = new Array[Byte](16)
      while (off + 16 <= raf.length()) {
        raf.seek(off); raf.readFully(head)
        val bb = ByteBuffer.wrap(head)
        require(bb.getInt() == 0x47524942, s"not GRIB at offset $off") // "GRIB"
        bb.getShort(); bb.get()
        require(bb.get() == 2, "not GRIB edition 2")
        val len = bb.getLong()
        out += MsgRange(out.size, off, len)
        off += len
      }
      out.toSeq
    } finally raf.close()
  }

  final case class Decoded(
      discipline: Int, category: Int, parameter: Int,
      levelType: Int, level: Double, refEpochSec: Long, forecastHour: Int,
      ni: Int, nj: Int, la1: Double, lo1: Double, di: Double, dj: Double,
      present: Array[Boolean], values: Array[Double],
      lcc: Option[Lcc] = None, ps: Option[Ps] = None,
      statType: Option[Int] = None, intervalEnd: Option[Long] = None) {
    // per-cell geolocation: lat/lon grid directly, LCC/PS via inverse
    // projection from the first point's projected coordinates
    private lazy val cone = lcc.map(LccMath.cone)
    private lazy val xy1 = cone.map(c => LccMath.forward(c, la1, lo1))
    private lazy val psXy1 = ps.map(p => PsMath.forward(p, la1, lo1))
    def latLonAt(row: Int, col: Int): (Double, Double) = (cone, xy1, lcc) match {
      case (Some(c), Some((x1, y1)), Some(p)) =>
        LccMath.inverse(c, x1 + col * p.dxM, y1 + row * p.dyM)
      case _ => (ps, psXy1) match {
        case (Some(p), Some((x1, y1))) =>
          PsMath.inverse(p, x1 + col * p.dxM, y1 + row * p.dyM)
        case _ => (la1 - row * dj, lo1 + col * di)
      }
    }
  }

  private def sm16(v: Int): Int = // sign-magnitude 16-bit
    if ((v & 0x8000) != 0) -(v & 0x7FFF) else v

  /** Decode one message given its byte range (sections 1..7). */
  def decodeMessage(path: String, offset: Long, length: Long): Decoded = {
    val raf = new RandomAccessFile(path, "r")
    val buf = try {
      val a = new Array[Byte](length.toInt)
      raf.seek(offset); raf.readFully(a); a
    } finally raf.close()
    val bb = ByteBuffer.wrap(buf)
    bb.position(6)
    val discipline = bb.get() & 0xFF
    require((bb.get() & 0xFF) == 2, "edition 2 only")
    bb.getLong()
    var cat = 0; var par = 0; var lvlT = 0; var lvl = 0.0
    var refSec = 0L; var fh = 0
    var ni = 0; var nj = 0; var la1 = 0.0; var lo1 = 0.0; var di = 0.0; var dj = 0.0
    var nPoints = 0; var rRef = 0.0f; var eScale = 0; var dScale = 0; var nBits = 0
    var tmpl5 = 0; var ng = 0
    var grpWidthRef = 0; var grpWidthBits = 0
    var grpLenRef = 0; var grpLenInc = 0; var grpLastLen = 0; var grpScaledLenBits = 0
    var sdOrder = 0; var sdOctets = 0
    var rleMv = 0; var rleMvl = 0; var rleDec = 0
    var rleLevels: Array[Int] = null
    var lccOpt: Option[Lcc] = None
    var psOpt: Option[Ps] = None
    var statType: Option[Int] = None
    var intervalEnd: Option[Long] = None
    var present: Array[Boolean] = null
    var packed: Array[Byte] = null
    var nDataPts = 0
    def udeg(i: Int): Double = // sign-magnitude 32-bit microdegrees
      (if ((i & 0x80000000) != 0) -(i & 0x7FFFFFFF) else i) / 1e6
    while (bb.position() < buf.length - 4) {
      val secStart = bb.position()
      val secLen = bb.getInt()
      val secNum = bb.get() & 0xFF
      secNum match {
        case 1 =>
          bb.getShort(); bb.getShort(); bb.get(); bb.get(); bb.get()
          val y = bb.getShort() & 0xFFFF
          val mo = bb.get() & 0xFF; val dd = bb.get() & 0xFF
          val hh = bb.get() & 0xFF; val mi = bb.get() & 0xFF; val ss = bb.get() & 0xFF
          refSec = java.time.LocalDateTime.of(y, mo, dd, hh, mi, ss)
            .toEpochSecond(java.time.ZoneOffset.UTC)
        case 3 =>
          bb.get(); nDataPts = bb.getInt(); bb.get(); bb.get()
          val tmpl = bb.getShort()
          require(tmpl == 0 || tmpl == 20 || tmpl == 30,
            s"grid template 3.0 (lat/lon), 3.20 (polar stereo) or 3.30 " +
              s"(Lambert) only, got $tmpl")
          bb.get(); bb.get(); bb.getInt(); bb.get(); bb.getInt(); bb.get(); bb.getInt()
          ni = bb.getInt(); nj = bb.getInt()
          if (tmpl == 0) {
            bb.getInt(); bb.getInt()
            la1 = udeg(bb.getInt()); lo1 = udeg(bb.getInt())
            bb.get()
            bb.getInt(); bb.getInt() // la2, lo2 (redundant with di/dj)
            di = udeg(bb.getInt()); dj = udeg(bb.getInt())
            val scan = bb.get() & 0xFF
            require(scan == 0, s"scan mode 0 (+i,-j) only, got $scan")
          } else if (tmpl == 20) {
            la1 = udeg(bb.getInt()); lo1 = udeg(bb.getInt())
            bb.get()
            val laD = udeg(bb.getInt())
            val loV = udeg(bb.getInt())
            val dx = bb.getInt() / 1000.0; val dy = bb.getInt() / 1000.0
            val pc = bb.get() & 0xFF
            require((pc & 0x80) == 0,
              s"south-polar aspect unsupported (projection centre $pc)")
            val scan = bb.get() & 0xFF
            require(scan == 64, s"PS scan mode 64 (+i,+j) only, got $scan")
            psOpt = Some(Ps(laD, loV, dx, dy))
          } else {
            la1 = udeg(bb.getInt()); lo1 = udeg(bb.getInt())
            bb.get()
            bb.getInt() // LaD (== latin1 for the grids we accept)
            val loV = udeg(bb.getInt())
            val dx = bb.getInt() / 1000.0; val dy = bb.getInt() / 1000.0
            bb.get() // projection centre
            val scan = bb.get() & 0xFF
            require(scan == 64, s"LCC scan mode 64 (+i,+j) only, got $scan")
            val latin1 = udeg(bb.getInt()); val latin2 = udeg(bb.getInt())
            bb.getInt(); bb.getInt() // south pole
            lccOpt = Some(Lcc(latin1, latin2, loV, dx, dy))
          }
        case 4 =>
          bb.getShort()
          val tmpl4 = bb.getShort()
          require(tmpl4 == 0 || tmpl4 == 8,
            s"product template 4.0 or 4.8 only, got $tmpl4")
          cat = bb.get() & 0xFF; par = bb.get() & 0xFF
          bb.get(); bb.get(); bb.get(); bb.getShort(); bb.get()
          def hours(unit: Int, ft: Int): Int = unit match {
            case 0 => ft / 60 // minutes
            case 1 => ft
            case 2 => ft * 24
            case u => throw new IllegalArgumentException(s"time unit $u")
          }
          fh = hours(bb.get() & 0xFF, bb.getInt())
          lvlT = bb.get() & 0xFF
          val ls = bb.get() & 0xFF // 8-bit sign-magnitude scale factor
          val lsv = if ((ls & 0x80) != 0) -(ls & 0x7F) else ls
          lvl = bb.getInt() / math.pow(10, lsv)
          if (tmpl4 == 8) {
            bb.get(); bb.get(); bb.getInt() // second fixed surface
            // statistical interval (code table 4.10 process over
            // [forecast time, interval end]): NDFD PoP/QPF/max-T shape
            val y = bb.getShort() & 0xFFFF
            val mo = bb.get() & 0xFF; val dd = bb.get() & 0xFF
            val hh = bb.get() & 0xFF; val mi = bb.get() & 0xFF
            val ss = bb.get() & 0xFF
            intervalEnd = Some(java.time.LocalDateTime
              .of(y, mo, dd, hh, mi, ss)
              .toEpochSecond(java.time.ZoneOffset.UTC))
            val nRanges = bb.get() & 0xFF
            require(nRanges >= 1, "4.8: no time range specifications")
            bb.getInt() // total missing in interval
            statType = Some(bb.get() & 0xFF)
            bb.get() // time increment type
            bb.get(); bb.getInt() // range unit + length (end time is authoritative)
            bb.get(); bb.getInt() // increment unit + value
            // further ranges (nested stats) are skipped; the outermost
            // process is what consumers key on
          }
        case 5 =>
          nPoints = bb.getInt()
          tmpl5 = bb.getShort()
          require(tmpl5 == 0 || tmpl5 == 2 || tmpl5 == 3 || tmpl5 == 41
              || tmpl5 == 200,
            s"data representation 5.0/5.2/5.3/5.41/5.200 only, got $tmpl5 " +
              "(5.40 JPEG2000 needs a codec this container lacks — " +
              "see SURVEY 2.H)")
          if (tmpl5 == 200) {
            // run-length packing with level values (JMA/NDFD categorical
            // products): its layout replaces the common R/E/D header —
            // nBits, MV (max level used), MVL (level count), level
            // decimal scale, then MVL 2-octet scaled representatives
            nBits = bb.get() & 0xFF
            rleMv = bb.getShort() & 0xFFFF
            rleMvl = bb.getShort() & 0xFFFF
            val d8 = bb.get() & 0xFF // 8-bit sign-magnitude
            rleDec = if ((d8 & 0x80) != 0) -(d8 & 0x7F) else d8
            require(rleMvl >= 1 && rleMv <= rleMvl,
              s"5.200: MV $rleMv / MVL $rleMvl inconsistent (corrupt " +
                "level table)")
            rleLevels = Array.fill(rleMvl)(bb.getShort() & 0xFFFF)
          } else {
          rRef = bb.getFloat()
          eScale = sm16(bb.getShort() & 0xFFFF)
          dScale = sm16(bb.getShort() & 0xFFFF)
          nBits = bb.get() & 0xFF
          bb.get()
          if (tmpl5 == 2 || tmpl5 == 3) {
            bb.get() // group splitting method
            require((bb.get() & 0xFF) == 0, "missing-value management unsupported")
            bb.getInt(); bb.getInt()
            ng = bb.getInt()
            grpWidthRef = bb.get() & 0xFF; grpWidthBits = bb.get() & 0xFF
            grpLenRef = bb.getInt(); grpLenInc = bb.get() & 0xFF
            grpLastLen = bb.getInt(); grpScaledLenBits = bb.get() & 0xFF
            if (tmpl5 == 3) { sdOrder = bb.get() & 0xFF; sdOctets = bb.get() & 0xFF }
          }
          }
        case 6 =>
          val ind = bb.get() & 0xFF
          if (ind == 0) {
            val bytes = new Array[Byte](secLen - 6)
            bb.get(bytes)
            present = Array.tabulate(nDataPts) { i =>
              (bytes(i / 8) >> (7 - i % 8) & 1) == 1
            }
          } else require(ind == 255, s"predefined bitmap $ind unsupported")
        case 7 =>
          packed = new Array[Byte](secLen - 5)
          bb.get(packed)
        case other => throw new IllegalArgumentException(s"section $other")
      }
      bb.position(secStart + secLen)
    }
    if (tmpl5 == 200) {
      // run-length packing with level values (template 7.200, the
      // JMA/NDFD categorical shape): the section-7 stream is nBits-wide
      // values; v ≤ MV selects a level, a following run of values > MV
      // is the repeat count encoded little-endian in base
      // (2^nBits − 1 − MV) with digit d = v − (MV+1), total
      // occurrences = 1 + Σ dₖ·baseᵏ — the public unpk_run_length.c
      // algorithm (wgrib2). Level 0 is the in-stream missing marker;
      // level v ≥ 1 decodes to scaledRep(v) / 10^dec.
      require(present == null,
        "5.200: section-6 bitmap unsupported — level 0 is the in-stream " +
          "missing marker for run-length packed products")
      require(nPoints == nDataPts,
        s"5.200: $nPoints packed points != grid size $nDataPts")
      val rleRange = (1 << nBits) - 1 - rleMv
      require(rleRange >= 1,
        s"5.200: no repeat-digit range (2^$nBits − 1 ≤ MV $rleMv) — " +
          "corrupt template")
      val totalBits = packed.length.toLong * 8
      var bit = 0L
      def hasNext: Boolean = bit + nBits <= totalBits
      def next(): Int = {
        var acc = 0L; var k = 0
        while (k < nBits) {
          val b = (bit + k)
          acc = (acc << 1) | ((packed((b / 8).toInt) >> (7 - (b % 8).toInt)) & 1)
          k += 1
        }
        bit += nBits
        acc.toInt
      }
      val levels = new Array[Int](nDataPts)
      var j = 0
      while (j < nDataPts) {
        require(hasNext, s"7.200: stream exhausted at point $j of $nDataPts")
        val v = next()
        require(v <= rleMv,
          s"7.200: repeat digit $v (> MV $rleMv) where a level value is " +
            "required — corrupt run-length stream")
        require(v == 0 || v <= rleMvl,
          s"7.200: level $v exceeds MVL $rleMvl")
        var count = 1L
        var factor = 1L
        var more = true
        while (more && hasNext) {
          val save = bit
          val d = next()
          if (d > rleMv) { count += factor * (d - (rleMv + 1)); factor *= rleRange }
          else { bit = save; more = false }
        }
        require(j + count <= nDataPts,
          s"7.200: run of $count at point $j overruns grid size $nDataPts")
        var k = 0L
        while (k < count) { levels(j) = v; j += 1; k += 1 }
      }
      present = Array.tabulate(nDataPts)(i => levels(i) != 0)
      val decFr = math.pow(10, rleDec)
      val out = ArrayBuffer.empty[Double]
      var i = 0
      while (i < nDataPts) {
        if (levels(i) != 0) out += rleLevels(levels(i) - 1) / decFr
        i += 1
      }
      return Decoded(discipline, cat, par, lvlT, lvl, refSec, fh,
        ni, nj, la1, lo1, di, dj, present, out.toArray, lccOpt, psOpt,
        statType, intervalEnd)
    }
    if (present == null) present = Array.fill(nDataPts)(true)
    // unpack nBits-wide big-endian integers; Y = (R + X·2^E) / 10^D
    val binF = math.pow(2, eScale); val decF = math.pow(10, dScale)
    val vals = new Array[Double](nPoints)
    if (tmpl5 == 41) {
      // PNG packing: section 7 is a grayscale PNG of the scaled ints
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(packed))
      require(img != null, "5.41: PNG decode failed")
      val r = img.getRaster
      // g2clib encodes depth 24/32 as RGB/RGBA PNGs; reading band 0 of such
      // an image would silently return one byte plane. Reject like 5.40.
      require(r.getNumBands == 1,
        s"5.41: ${r.getNumBands}-band PNG (depth > 16) unsupported, see SURVEY — " +
          "only single-band grayscale PNG packing (depth 8/16) is decoded")
      val pngSampleBits = img.getColorModel.getComponentSize(0)
      require(nBits <= pngSampleBits,
        s"5.41: section-5 depth $nBits exceeds PNG sample size $pngSampleBits")
      val iw = img.getWidth
      require(iw.toLong * img.getHeight >= nPoints,
        s"5.41: ${iw}x${img.getHeight} PNG holds < $nPoints points")
      var vi = 0
      while (vi < nPoints) {
        vals(vi) = (rRef + r.getSample(vi % iw, vi / iw, 0) * binF) / decF
        vi += 1
      }
    } else if (tmpl5 == 0) {
      if (nBits == 0) java.util.Arrays.fill(vals, rRef / decF)
      else {
        var acc = 0L; var nb = 0; var bi = 0; var vi = 0
        while (vi < nPoints) {
          while (nb < nBits) { acc = (acc << 8) | (packed(bi) & 0xFFL); bi += 1; nb += 8 }
          nb -= nBits
          val x = (acc >>> nb) & ((1L << nBits) - 1)
          vals(vi) = (rRef + x * binF) / decF
          vi += 1
        }
      }
    } else {
      // complex packing: [5.3 extras] group refs | widths | packed groups
      val br = new BitReader(packed, 0)
      var iv1 = 0L; var iv2 = 0L; var gmin = 0L
      if (tmpl5 == 3) {
        require(sdOrder == 1 || sdOrder == 2, s"differencing order $sdOrder")
        iv1 = unSignMagN(br.get(sdOctets * 8), sdOctets)
        if (sdOrder == 2) iv2 = unSignMagN(br.get(sdOctets * 8), sdOctets)
        gmin = unSignMagN(br.get(sdOctets * 8), sdOctets)
        br.align()
      }
      val refs = Array.fill(ng)(br.get(nBits)); br.align()
      val widths = Array.fill(ng)(grpWidthRef + br.get(grpWidthBits).toInt); br.align()
      val scaledLens = Array.fill(ng)(br.get(grpScaledLenBits)); br.align()
      val xsOut = new Array[Long](nPoints)
      var vi = 0; var g = 0
      while (g < ng) {
        val len =
          if (g == ng - 1) grpLastLen
          else grpLenRef + grpLenInc * scaledLens(g).toInt
        var k = 0
        while (k < len) { xsOut(vi) = refs(g) + br.get(widths(g)); vi += 1; k += 1 }
        g += 1
      }
      require(vi == nPoints, s"complex packing decoded $vi of $nPoints points")
      if (tmpl5 == 3) {
        // undo spatial differencing: stored values are offset differences
        if (sdOrder == 1) {
          if (nPoints > 0) xsOut(0) = iv1
          var k = 1
          while (k < nPoints) { xsOut(k) = xsOut(k) + gmin + xsOut(k - 1); k += 1 }
        } else {
          if (nPoints > 0) xsOut(0) = iv1
          if (nPoints > 1) xsOut(1) = iv2
          var k = 2
          while (k < nPoints) {
            xsOut(k) = xsOut(k) + gmin + 2 * xsOut(k - 1) - xsOut(k - 2); k += 1
          }
        }
      }
      var k = 0
      while (k < nPoints) { vals(k) = (rRef + xsOut(k) * binF) / decF; k += 1 }
    }
    Decoded(discipline, cat, par, lvlT, lvl, refSec, fh,
      ni, nj, la1, lo1, di, dj, present, vals, lccOpt, psOpt,
      statType, intervalEnd)
  }
}

/** `spark.read.format("graft.sources.Grib2Provider").option("path", f)` */
class Grib2Provider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Grib2.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new Grib2Table(properties.asScala.toMap)
}

class Grib2Table(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("grib2 source requires option 'path'"))
  override def name(): String = s"grib2($path)"
  override def schema(): StructType = Grib2.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new Grib2ScanBuilder(path)
}

class Grib2ScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = Grib2.SCHEMA
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    val pruned = StructType(Grib2.SCHEMA.fields.filter(f => keep(f.name)))
    required = if (pruned.isEmpty) StructType(Grib2.SCHEMA.fields.take(1)) else pruned
  }
  override def build(): Scan = new Grib2Scan(path, required)
}

final case class Grib2MsgPartition(path: String, msgIdx: Int,
    offset: Long, length: Long) extends InputPartition

class Grib2Scan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    // file x message: a directory of GRIB files (one per forecast run)
    // fans out to nFiles x nMessages partitions
    SourcePaths.resolve(path).flatMap { f =>
      Grib2.scanMessages(f).map { m =>
        Grib2MsgPartition(f, m.index, m.offset, m.length)
      }
    }.toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new Grib2ReaderFactory(required)
}

class Grib2ReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new Grib2MsgReader(partition.asInstanceOf[Grib2MsgPartition], required)
}

/** Decodes exactly one message's byte range and emits its grid cells;
  * bitmap-missing cells carry a null `value`.
  */
class Grib2MsgReader(p: Grib2MsgPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val d = Grib2.decodeMessage(p.path, p.offset, p.length)
  private val n = d.ni * d.nj
  private var i = -1
  private var presentRank = 0 // index into packed values for present cells

  override def next(): Boolean = {
    if (i >= 0 && i < n && d.present(i)) presentRank += 1
    i += 1
    i < n
  }
  override def get(): InternalRow = {
    val row = i / d.ni
    val colI = i % d.ni
    val out = new GenericInternalRow(required.size)
    var f = 0
    while (f < required.size) {
      required.fields(f).name match {
        case "msg" => out.setInt(f, p.msgIdx)
        case "discipline" => out.setInt(f, d.discipline)
        case "category" => out.setInt(f, d.category)
        case "parameter" => out.setInt(f, d.parameter)
        case "level_type" => out.setInt(f, d.levelType)
        case "level" => out.setDouble(f, d.level)
        case "ref_time" => out.setLong(f, d.refEpochSec)
        case "forecast_hour" => out.setInt(f, d.forecastHour)
        case "row" => out.setInt(f, row)
        case "col" => out.setInt(f, colI)
        case "lat" => out.setDouble(f, d.latLonAt(row, colI)._1)
        case "lon" => out.setDouble(f, d.latLonAt(row, colI)._2)
        case "value" =>
          if (d.present(i)) out.setDouble(f, d.values(presentRank))
          else out.setNullAt(f)
        case "file" => out.update(f, fileName)
        case "stat_type" =>
          d.statType.fold(out.setNullAt(f))(out.setInt(f, _))
        case "interval_end" =>
          d.intervalEnd.fold(out.setNullAt(f))(out.setLong(f, _))
      }
      f += 1
    }
    out
  }
  private val fileName =
    org.apache.spark.unsafe.types.UTF8String.fromString(
      SourcePaths.baseName(p.path))
  override def close(): Unit = ()
}
