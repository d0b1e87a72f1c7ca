package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal pure-JVM GeoTIFF (classic TIFF, little-endian, strip-
  * organized, single-band float32; compression 1 = none or 8 = Adobe
  * DEFLATE, GDAL's default `COMPRESS=DEFLATE`) — the raster file format
  * the reference decodes through GDAL (odin_gdal/src/lib.rs,
  * odin_dem/src/lib.rs DEM tiles, odin_hrrr grids). No GDAL ships in
  * this container, so the ~200-line binary parse is done directly; the
  * writer exists to produce fixture rasters for specs and dev data.
  *
  * Scale shape (what a 100 TB DEM/HRRR sweep needs, all here):
  * - one InputPartition PER STRIP — the natural parallel unit of a
  *   strip-organized TIFF; a reader seeks to its strip's byte range and
  *   never touches the rest of the file;
  * - column pruning (SupportsPushDownRequiredColumns) — a query that
  *   needs only `value` never materializes the georeferencing columns;
  * - georeferencing from ModelTiepoint + ModelPixelScale evaluated
  *   per-cell as pure arithmetic (no trig, no CRS library).
  */
object GeoTiff {
  val SCHEMA: StructType = StructType(Seq(
    StructField("row", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))

  // TIFF tag ids
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279
  private val TSampleFormat = 339
  private val TModelPixelScale = 33550
  private val TModelTiepoint = 33922

  /** Write a single-band float32 strip-organized GeoTIFF, uncompressed
    * or per-strip zlib DEFLATE (TIFF compression 8). Tiepoint maps pixel
    * (0,0) to (originLon, originLat); north-up with pixel size (sx, sy)
    * degrees.
    */
  def write(path: String, width: Int, height: Int, data: Array[Float],
      originLon: Double, originLat: Double, sx: Double, sy: Double,
      rowsPerStrip: Int = 64, deflate: Boolean = false): Unit = {
    require(data.length == width * height)
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    val strips: Seq[Array[Byte]] = (0 until nStrips).map { s =>
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      val raw = ByteBuffer.allocate(rows * width * 4).order(ByteOrder.LITTLE_ENDIAN)
      (0 until rows * width).foreach(i => raw.putFloat(data(s * rowsPerStrip * width + i)))
      if (deflate) zlibDeflate(raw.array()) else raw.array()
    }
    val stripBytes = strips.map(_.length)
    val dataStart = 8
    val stripOffsets = stripBytes.scanLeft(dataStart)(_ + _).dropRight(1)
    val ifdOffset = dataStart + stripBytes.sum
    // entries sorted by tag id (TIFF requires ascending order)
    val nEntries = 12
    val ifdSize = 2 + nEntries * 12 + 4
    var extraOff = ifdOffset + ifdSize // out-of-line arrays land here

    val bb = ByteBuffer.allocate(ifdOffset + ifdSize + 8 * 9 + 4 * 2 * nStrips + 64)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffset)
    // pixel strips (raw or per-strip zlib streams)
    strips.foreach(bb.put)
    // IFD
    bb.putShort(nEntries.toShort)
    def entryInline(tag: Int, typ: Int, count: Int, value: Long): Unit = {
      bb.putShort(tag.toShort).putShort(typ.toShort).putInt(count)
      if (typ == 3 && count == 1) { bb.putShort(value.toShort); bb.putShort(0) }
      else bb.putInt(value.toInt)
    }
    def entryArray(tag: Int, typ: Int, values: Seq[Long]): Unit = {
      val width = if (typ == 12) 8 else 4
      if (values.size * width <= 4) { entryInline(tag, typ, values.size, values.head) }
      else {
        bb.putShort(tag.toShort).putShort(typ.toShort).putInt(values.size).putInt(extraOff)
        extraOff += values.size * width
      }
    }
    val doubleArrays = scala.collection.mutable.ArrayBuffer.empty[(Int, Seq[Double])]
    entryInline(TImageWidth, 4, 1, width)
    entryInline(TImageLength, 4, 1, height)
    entryInline(TBitsPerSample, 3, 1, 32)
    entryInline(TCompression, 3, 1, if (deflate) 8 else 1)
    entryInline(TPhotometric, 3, 1, 1)
    entryArray(TStripOffsets, 4, stripOffsets.map(_.toLong))
    entryInline(TSamplesPerPixel, 3, 1, 1)
    entryInline(TRowsPerStrip, 4, 1, rowsPerStrip)
    entryArray(TStripByteCounts, 4, stripBytes.map(_.toLong))
    entryInline(TSampleFormat, 3, 1, 3) // IEEE float
    // ModelPixelScale: 3 doubles; ModelTiepoint: 6 doubles — out-of-line
    bb.putShort(TModelPixelScale.toShort).putShort(12.toShort).putInt(3).putInt(extraOff)
    doubleArrays += ((extraOff, Seq(sx, sy, 0.0)))
    extraOff += 24
    bb.putShort(TModelTiepoint.toShort).putShort(12.toShort).putInt(6).putInt(extraOff)
    doubleArrays += ((extraOff, Seq(0.0, 0.0, 0.0, originLon, originLat, 0.0)))
    extraOff += 48
    bb.putInt(0) // next IFD
    // out-of-line arrays, in the order offsets were assigned
    if (stripOffsets.size * 4 > 4) stripOffsets.foreach(o => bb.putInt(o))
    if (stripBytes.size * 4 > 4) stripBytes.foreach(c => bb.putInt(c))
    doubleArrays.foreach { case (_, ds) => ds.foreach(bb.putDouble) }
    Files.write(Paths.get(path), java.util.Arrays.copyOf(bb.array(), bb.position()))
  }

  /** zlib-wrapped DEFLATE (what TIFF compression 8 stores per strip). */
  def zlibDeflate(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.BEST_COMPRESSION)
    try {
      d.setInput(raw); d.finish()
      val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
      val buf = new Array[Byte](8192)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    } finally d.end()
  }

  /** Inverse of [[zlibDeflate]]; `expected` is the known raw strip size. */
  def zlibInflate(comp: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(comp)
      val out = new Array[Byte](expected)
      var n = 0
      while (n < expected && !inf.finished()) n += inf.inflate(out, n, expected - n)
      require(n == expected, s"short inflate: $n of $expected bytes")
      out
    } finally inf.end()
  }

  final case class Meta(width: Int, height: Int, rowsPerStrip: Int,
      compression: Int, stripOffsets: Array[Long], stripByteCounts: Array[Long],
      originLon: Double, originLat: Double, sx: Double, sy: Double)

  /** Parse header + IFD of a classic little-endian uncompressed
    * float32 GeoTIFF; validates the assumptions this reader makes.
    */
  def readMeta(path: String): Meta = {
    val raf = new RandomAccessFile(path, "r")
    try {
      def readBytes(off: Long, n: Int): ByteBuffer = {
        val a = new Array[Byte](n)
        raf.seek(off); raf.readFully(a)
        ByteBuffer.wrap(a).order(ByteOrder.LITTLE_ENDIAN)
      }
      val head = readBytes(0, 8)
      require(head.get() == 'I' && head.get() == 'I', "not little-endian TIFF")
      require(head.getShort() == 42, "not classic TIFF")
      val ifdOff = head.getInt() & 0xFFFFFFFFL
      val nEntries = readBytes(ifdOff, 2).getShort() & 0xFFFF
      val entries = readBytes(ifdOff + 2, nEntries * 12)
      var width = 0; var height = 0; var rps = 0
      var bits = 0; var comp = 1; var fmt = 1
      var soOff = 0L; var soCount = 0; var soInline = 0L
      var scOff = 0L; var scCount = 0; var scInline = 0L
      var scaleOff = -1L; var tieOff = -1L
      (0 until nEntries).foreach { _ =>
        val tag = entries.getShort() & 0xFFFF
        val typ = entries.getShort() & 0xFFFF
        val count = entries.getInt()
        val rawPos = entries.position()
        val value: Long =
          if (typ == 3) entries.getShort() & 0xFFFFL else entries.getInt() & 0xFFFFFFFFL
        entries.position(rawPos + 4)
        tag match {
          case TImageWidth => width = value.toInt
          case TImageLength => height = value.toInt
          case TBitsPerSample => bits = value.toInt
          case TCompression => comp = value.toInt
          case TRowsPerStrip => rps = value.toInt
          case TSampleFormat => fmt = value.toInt
          case TStripOffsets => soCount = count; if (count == 1) soInline = value else soOff = value
          case TStripByteCounts => scCount = count; if (count == 1) scInline = value else scOff = value
          case TModelPixelScale => scaleOff = value
          case TModelTiepoint => tieOff = value
          case _ =>
        }
      }
      require(comp == 1 || comp == 8,
        s"compression $comp unsupported (only none=1 / DEFLATE=8)")
      require(bits == 32 && fmt == 3, s"expect float32 band (bits=$bits fmt=$fmt)")
      if (rps == 0) rps = height
      val so = if (soCount == 1) Array(soInline)
        else { val b = readBytes(soOff, soCount * 4); Array.fill(soCount)(b.getInt() & 0xFFFFFFFFL) }
      val sc = if (scCount == 1) Array(scInline)
        else { val b = readBytes(scOff, scCount * 4); Array.fill(scCount)(b.getInt() & 0xFFFFFFFFL) }
      require(scaleOff >= 0 && tieOff >= 0, "missing georeferencing tags")
      val sb = readBytes(scaleOff, 24)
      val sx = sb.getDouble(); val sy = sb.getDouble()
      val tb = readBytes(tieOff, 48)
      tb.getDouble(); tb.getDouble(); tb.getDouble() // pixel-space tiepoint (0,0,0)
      val originLon = tb.getDouble(); val originLat = tb.getDouble()
      Meta(width, height, rps, comp, so, sc, originLon, originLat, sx, sy)
    } finally raf.close()
  }
}

/** `spark.read.format("graft.sources.GeoTiffProvider").option("path", f)` */
class GeoTiffProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoTiff.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GeoTiffTable(properties.asScala.toMap)
}

class GeoTiffTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("geotiff source requires option 'path'"))
  override def name(): String = s"geotiff($path)"
  override def schema(): StructType = GeoTiff.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GeoTiffScanBuilder(path)
}

class GeoTiffScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = GeoTiff.SCHEMA
  override def pruneColumns(requiredSchema: StructType): Unit = {
    // keep declaration order; empty projection (count(*)) keeps `row`
    val keep = requiredSchema.fieldNames.toSet
    val pruned = StructType(GeoTiff.SCHEMA.fields.filter(f => keep(f.name)))
    required = if (pruned.isEmpty) StructType(GeoTiff.SCHEMA.fields.take(1)) else pruned
  }
  override def build(): Scan = new GeoTiffScan(path, required)
}

final case class GeoTiffStripPartition(path: String, stripIdx: Int,
    offset: Long, byteCount: Long, startRow: Int, rows: Int, width: Int,
    compression: Int, originLon: Double, originLat: Double,
    sx: Double, sy: Double)
  extends InputPartition

class GeoTiffScan(path: String, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val m = GeoTiff.readMeta(path)
    m.stripOffsets.indices.map { i =>
      val startRow = i * m.rowsPerStrip
      GeoTiffStripPartition(path, i, m.stripOffsets(i), m.stripByteCounts(i),
        startRow, math.min(m.rowsPerStrip, m.height - startRow), m.width,
        m.compression, m.originLon, m.originLat, m.sx, m.sy)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoTiffReaderFactory(required)
}

class GeoTiffReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GeoTiffStripReader(partition.asInstanceOf[GeoTiffStripPartition], required)
}

/** Reads exactly one strip's byte range (seek + readFully — never the
  * whole file), inflating DEFLATE strips in-JDK, and emits its cells.
  */
class GeoTiffStripReader(p: GeoTiffStripPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val floats: ByteBuffer = {
    val raf = new RandomAccessFile(p.path, "r")
    try {
      val a = new Array[Byte](p.byteCount.toInt)
      raf.seek(p.offset); raf.readFully(a)
      val raw = if (p.compression == 8)
        GeoTiff.zlibInflate(a, p.rows * p.width * 4) else a
      ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    } finally raf.close()
  }
  private val nCells = p.rows * p.width
  private var i = -1
  override def next(): Boolean = { i += 1; i < nCells }
  override def get(): InternalRow = {
    val row = p.startRow + i / p.width
    val colI = i % p.width
    val v = floats.getFloat(i * 4).toDouble
    val out = new GenericInternalRow(required.size)
    var f = 0
    while (f < required.size) {
      required.fields(f).name match {
        case "row" => out.setInt(f, row)
        case "col" => out.setInt(f, colI)
        case "lon" => out.setDouble(f, p.originLon + colI * p.sx)
        case "lat" => out.setDouble(f, p.originLat - row * p.sy)
        case "value" => out.setDouble(f, v)
      }
      f += 1
    }
    out
  }
  override def close(): Unit = ()
}
