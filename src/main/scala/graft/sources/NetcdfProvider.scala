package graft.sources

import java.io.RandomAccessFile
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Minimal pure-JVM NetCDF reader for BOTH container formats the
  * reference's feeds use: classic (CDF-1 `CDF\x01` / CDF-2 `CDF\x02`,
  * big-endian, fixed-size variables — parsed here) and netCDF-4 on HDF5
  * (the format real GOES-R / Himawari L2 products actually ship;
  * dispatched by magic to [[Hdf5]], which reads the netcdf-c default
  * subset: superblock v0, v1 object headers, contiguous/chunked
  * layouts, gzip+shuffle filters). The reference decodes these through
  * GDAL's NetCDF driver (odin_goesr/src/lib.rs:527-538 reads the
  * `Mask`/`Area`/`Power`/`Temp`/`DQF` grids per hotspot file). No NetCDF
  * library ships in this container, so the header walk (dim list, global
  * + per-variable attribute lists, variable list) is parsed directly per
  * the public NetCDF classic format spec; the writer produces fixture
  * files for specs and dev data.
  *
  * Faithful product semantics: GOES-R packs physical grids as scaled
  * int16 — the reader applies `scale_factor`/`add_offset` and nulls
  * `_FillValue` cells, exposing both the packed integer (`raw`) and the
  * unpacked physical `value`.
  *
  * Scale shape:
  * - one InputPartition PER VARIABLE — a product file carries many
  *   independent grids and each reader seeks only its variable's byte
  *   range (`begin` + vsize), never the rest of the file;
  * - `.option("vars", "Mask,Power")` prunes partitions before a single
  *   task launches (the shard-prune analog of ReplayFeedProvider);
  * - column pruning via SupportsPushDownRequiredColumns.
  */
object Netcdf {
  val SCHEMA: StructType = StructType(Seq(
    StructField("var", StringType, nullable = false),
    StructField("i", IntegerType, nullable = false),   // first-dim index
    StructField("j", IntegerType, nullable = false),   // second-dim index (0 for 1-D)
    StructField("raw", LongType, nullable = true),     // packed integer (null for float/double)
    StructField("value", DoubleType, nullable = true), // scaled physical value (null at fill)
    StructField("file", StringType, nullable = false)))// product-file basename (multi-file reads)

  // classic-format tags and type ids (public NetCDF spec)
  private val NcDimension = 0x0A
  private val NcVariable = 0x0B
  private val NcAttribute = 0x0C
  val NcByte = 1; val NcChar = 2; val NcShort = 3
  val NcInt = 4; val NcFloat = 5; val NcDouble = 6

  def typeSize(t: Int): Int = t match {
    case NcByte | NcChar => 1
    case NcShort => 2
    case NcInt | NcFloat => 4
    case NcDouble => 8
  }

  private def pad4(n: Int): Int = (n + 3) & ~3

  final case class VarMeta(name: String, dimSizes: Array[Int], ncType: Int,
      begin: Long, scale: Double, offset: Double, fill: Option[Double]) {
    def nCells: Int = if (dimSizes.isEmpty) 1 else dimSizes.product
    def d1: Int = if (dimSizes.length >= 2) dimSizes(1) else 1
  }

  /** Parse the classic header: dimension list, (skipped) global
    * attributes, and the variable list with each variable's
    * scale/offset/fill attributes. Record variables (unlimited dim) are
    * out of scope and rejected.
    */
  def readMeta(path: String): Seq[VarMeta] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(bb.get() == 'C' && bb.get() == 'D' && bb.get() == 'F', "not a NetCDF classic file")
    val version = bb.get()
    require(version == 1 || version == 2, s"classic CDF-1/2 only (version $version)")
    bb.getInt() // numrecs (0 here; STREAMING unsupported)
    def readName(): String = {
      val len = bb.getInt()
      val a = new Array[Byte](len); bb.get(a)
      bb.position(bb.position() + (pad4(len) - len))
      new String(a, StandardCharsets.UTF_8)
    }
    // dim_list
    val dimTag = bb.getInt(); val nDims = bb.getInt()
    require(dimTag == NcDimension || (dimTag == 0 && nDims == 0), "bad dim_list")
    val dimSizes = (0 until nDims).map { _ =>
      readName(); val sz = bb.getInt()
      require(sz > 0, "record (unlimited) dimensions unsupported")
      sz
    }.toArray
    def readAttrs(): Map[String, (Int, Array[Byte])] = {
      val tag = bb.getInt(); val n = bb.getInt()
      require(tag == NcAttribute || (tag == 0 && n == 0), "bad att_list")
      (0 until n).map { _ =>
        val name = readName()
        val t = bb.getInt(); val nelems = bb.getInt()
        val nBytes = pad4(nelems * typeSize(t))
        val a = new Array[Byte](nBytes); bb.get(a)
        name -> (t, a)
      }.toMap
    }
    readAttrs() // global attributes — values not needed here
    // var_list
    val varTag = bb.getInt(); val nVars = bb.getInt()
    require(varTag == NcVariable || (varTag == 0 && nVars == 0), "bad var_list")
    (0 until nVars).map { _ =>
      val name = readName()
      val nd = bb.getInt()
      val sizes = (0 until nd).map(_ => dimSizes(bb.getInt())).toArray
      val attrs = readAttrs()
      val ncType = bb.getInt()
      bb.getInt() // vsize (recomputable)
      val begin = if (version == 1) bb.getInt().toLong & 0xFFFFFFFFL else bb.getLong()
      def attrNum(key: String): Option[Double] = attrs.get(key).map { case (t, a) =>
        val ab = ByteBuffer.wrap(a).order(ByteOrder.BIG_ENDIAN)
        t match {
          case NcByte => ab.get().toDouble
          case NcShort => ab.getShort().toDouble
          case NcInt => ab.getInt().toDouble
          case NcFloat => ab.getFloat().toDouble
          case NcDouble => ab.getDouble()
          case _ => Double.NaN
        }
      }
      VarMeta(name, sizes, ncType, begin,
        attrNum("scale_factor").getOrElse(1.0),
        attrNum("add_offset").getOrElse(0.0),
        attrNum("_FillValue"))
    }
  }

  /** One variable for [[write]]: fixed-size, ≤2 dims, packed attrs. */
  final case class NcVar(name: String, ncType: Int, dimIds: Seq[Int],
      data: Array[Double], scale: Option[Double] = None,
      offset: Option[Double] = None, fill: Option[Double] = None)

  /** Write a CDF-1 classic file (big-endian, fixed-size vars only). The
    * `data` array carries the PACKED values (what goes on disk);
    * readers unpack via scale/offset.
    */
  def write(path: String, dims: Seq[(String, Int)], vars: Seq[NcVar]): Unit = {
    val bb = ByteBuffer.allocate(1 << 20).order(ByteOrder.BIG_ENDIAN)
    bb.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    bb.putInt(0) // numrecs
    def putName(s: String): Unit = {
      val a = s.getBytes(StandardCharsets.UTF_8)
      bb.putInt(a.length); bb.put(a)
      (a.length until pad4(a.length)).foreach(_ => bb.put(0.toByte))
    }
    if (dims.isEmpty) { bb.putInt(0); bb.putInt(0) }
    else {
      bb.putInt(NcDimension); bb.putInt(dims.size)
      dims.foreach { case (n, sz) => putName(n); bb.putInt(sz) }
    }
    bb.putInt(0); bb.putInt(0) // no global attrs
    // variable headers need begins — compute sizes first
    val vsizes = vars.map(v => pad4(v.data.length * typeSize(v.ncType)))
    def putAttrVal(t: Int, d: Double): Unit = {
      t match {
        case NcByte => bb.put(d.toByte)
        case NcShort => bb.putShort(d.toShort)
        case NcInt => bb.putInt(d.toInt)
        case NcFloat => bb.putFloat(d.toFloat)
        case NcDouble => bb.putDouble(d)
        case _ => throw new IllegalArgumentException(s"attr type $t")
      }
      val w = typeSize(t)
      (w until pad4(w)).foreach(_ => bb.put(0.toByte))
    }
    // header size depends on itself only through fixed-width fields, so
    // lay headers into a scratch pass first: simplest is to compute the
    // header length analytically
    def attrCount(v: NcVar): Int =
      v.scale.size + v.offset.size + v.fill.size
    def headerLen: Int = {
      var h = 4 + 4 // magic + numrecs
      h += 8 + dims.map { case (n, _) => 4 + pad4(n.length) + 4 }.sum
      h += 8 // gatts
      h += 8
      vars.foreach { v =>
        h += 4 + pad4(v.name.length)
        h += 4 + v.dimIds.size * 4
        h += 8
        def attrLen(name: String, t: Int): Int = 4 + pad4(name.length) + 8 + pad4(typeSize(t))
        if (v.scale.isDefined) h += attrLen("scale_factor", NcDouble)
        if (v.offset.isDefined) h += attrLen("add_offset", NcDouble)
        if (v.fill.isDefined) h += attrLen("_FillValue", v.ncType)
        h += 4 + 4 + 4 // nc_type + vsize + begin (CDF-1)
      }
      h
    }
    val begins = vsizes.scanLeft(headerLen)(_ + _).dropRight(1)
    bb.putInt(NcVariable); bb.putInt(vars.size)
    vars.zip(begins).foreach { case (v, begin) =>
      putName(v.name)
      bb.putInt(v.dimIds.size); v.dimIds.foreach(bb.putInt)
      val na = attrCount(v)
      if (na == 0) { bb.putInt(0); bb.putInt(0) }
      else {
        bb.putInt(NcAttribute); bb.putInt(na)
        v.scale.foreach { s => putName("scale_factor"); bb.putInt(NcDouble); bb.putInt(1); putAttrVal(NcDouble, s) }
        v.offset.foreach { o => putName("add_offset"); bb.putInt(NcDouble); bb.putInt(1); putAttrVal(NcDouble, o) }
        v.fill.foreach { f => putName("_FillValue"); bb.putInt(v.ncType); bb.putInt(1); putAttrVal(v.ncType, f) }
      }
      bb.putInt(v.ncType)
      bb.putInt(pad4(v.data.length * typeSize(v.ncType)))
      bb.putInt(begin)
    }
    require(bb.position() == headerLen, s"header layout drift: ${bb.position()} vs $headerLen")
    vars.foreach { v =>
      v.data.foreach { d =>
        v.ncType match {
          case NcByte => bb.put(d.toByte)
          case NcChar => bb.put(d.toChar.toByte)
          case NcShort => bb.putShort(d.toShort)
          case NcInt => bb.putInt(d.toInt)
          case NcFloat => bb.putFloat(d.toFloat)
          case NcDouble => bb.putDouble(d)
        }
      }
      val used = v.data.length * typeSize(v.ncType)
      (used until pad4(used)).foreach(_ => bb.put(0.toByte))
    }
    Files.write(Paths.get(path), java.util.Arrays.copyOf(bb.array(), bb.position()))
  }
}

/** `spark.read.format("graft.sources.NetcdfProvider").option("path", f)` */
class NetcdfProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Netcdf.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new NetcdfTable(properties.asScala.toMap)
}

class NetcdfTable(props: Map[String, String]) extends Table with SupportsRead {
  private val path = props.getOrElse("path",
    throw new IllegalArgumentException("netcdf source requires option 'path'"))
  override def name(): String = s"netcdf($path)"
  override def schema(): StructType = Netcdf.SCHEMA
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(path, Option(options.get("vars")))
}

class NetcdfScanBuilder(path: String, vars: Option[String]) extends ScanBuilder
    with SupportsPushDownRequiredColumns {
  private var required: StructType = Netcdf.SCHEMA
  override def pruneColumns(requiredSchema: StructType): Unit = {
    val keep = requiredSchema.fieldNames.toSet
    val pruned = StructType(Netcdf.SCHEMA.fields.filter(f => keep(f.name)))
    required = if (pruned.isEmpty) StructType(Netcdf.SCHEMA.fields.take(1)) else pruned
  }
  override def build(): Scan = new NetcdfScan(path, vars, required)
}

final case class NetcdfVarPartition(path: String, name: String,
    dimSizes: Array[Int], ncType: Int, begin: Long,
    scale: Double, offset: Double, fill: Option[Double]) extends InputPartition

/** HDF5-backed variable (netCDF-4): carries the full chunk map so the
  * reader seeks straight to its variable's chunks.
  */
final case class NetcdfH5Partition(path: String, v: Hdf5.H5Var)
  extends InputPartition

class NetcdfScan(path: String, vars: Option[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] = {
    val want = vars.map(_.split(",").map(_.trim).toSet)
    // file x variable is the parallel unit: a directory of product files
    // (one per observation slot) fans out to nFiles x nVars partitions
    SourcePaths.resolve(path).flatMap { f =>
      if (Hdf5.isHdf5(f))
        Hdf5.readVars(f)
          .filter(v => want.forall(_.contains(v.name)))
          .map(v => NetcdfH5Partition(f, v): InputPartition)
      else
        Netcdf.readMeta(f)
          .filter(v => v.ncType != Netcdf.NcChar) // char vars are metadata text
          .filter(v => want.forall(_.contains(v.name)))
          .map(v => NetcdfVarPartition(f, v.name, v.dimSizes, v.ncType,
            v.begin, v.scale, v.offset, v.fill): InputPartition)
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(required)
}

class NetcdfReaderFactory(required: StructType) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: NetcdfVarPartition => new NetcdfVarReader(p, required)
      case p: NetcdfH5Partition => new NetcdfH5VarReader(p, required)
    }
}

/** Emits one HDF5 variable's cells with the same (var, i, j, raw,
  * value) surface and scale/offset/_FillValue semantics as the classic
  * reader — a GOES-R L2 query is identical against either container.
  */
class NetcdfH5VarReader(p: NetcdfH5Partition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val v = p.v
  private val raw: Array[Double] = Hdf5.readVarData(p.path, v)
  private val d1 = if (v.dims.length >= 2) v.dims(1) else 1
  private val isInt = v.ncType == Netcdf.NcByte ||
    v.ncType == Netcdf.NcShort || v.ncType == Netcdf.NcInt
  private var idx = -1
  override def next(): Boolean = { idx += 1; idx < raw.length }
  override def get(): InternalRow = {
    val rawD = raw(idx)
    val isFill = v.fill.exists(_ == rawD)
    val out = new GenericInternalRow(required.size)
    var f = 0
    while (f < required.size) {
      required.fields(f).name match {
        case "var" => out.update(f, UTF8String.fromString(v.name))
        case "i" => out.setInt(f, idx / d1)
        case "j" => out.setInt(f, idx % d1)
        case "raw" =>
          if (isInt) out.setLong(f, rawD.toLong) else out.setNullAt(f)
        case "value" =>
          if (isFill) out.setNullAt(f)
          else out.setDouble(f, rawD * v.scale + v.offset)
        case "file" => out.update(f, fileName)
      }
      f += 1
    }
    out
  }
  private val fileName = UTF8String.fromString(SourcePaths.baseName(p.path))
  override def close(): Unit = ()
}

/** Reads exactly one variable's byte range (seek + readFully) and emits
  * its cells — packed integer plus the scale/offset-unpacked physical
  * value, with `_FillValue` cells nulled (the get_grid_point_values
  * semantics at odin_goesr/src/lib.rs:532-538).
  */
class NetcdfVarReader(p: NetcdfVarPartition, required: StructType)
    extends PartitionReader[InternalRow] {
  private val nCells = if (p.dimSizes.isEmpty) 1 else p.dimSizes.product
  private val d1 = if (p.dimSizes.length >= 2) p.dimSizes(1) else 1
  private val buf: ByteBuffer = {
    val raf = new RandomAccessFile(p.path, "r")
    try {
      val a = new Array[Byte](nCells * Netcdf.typeSize(p.ncType))
      raf.seek(p.begin); raf.readFully(a)
      ByteBuffer.wrap(a).order(ByteOrder.BIG_ENDIAN)
    } finally raf.close()
  }
  private var idx = -1
  override def next(): Boolean = { idx += 1; idx < nCells }
  override def get(): InternalRow = {
    val rawD: Double = p.ncType match {
      case Netcdf.NcByte => buf.get(idx).toDouble
      case Netcdf.NcShort => buf.getShort(idx * 2).toDouble
      case Netcdf.NcInt => buf.getInt(idx * 4).toDouble
      case Netcdf.NcFloat => buf.getFloat(idx * 4).toDouble
      case Netcdf.NcDouble => buf.getDouble(idx * 8)
    }
    val isFill = p.fill.exists(_ == rawD)
    val isInt = p.ncType == Netcdf.NcByte || p.ncType == Netcdf.NcShort ||
      p.ncType == Netcdf.NcInt
    val out = new GenericInternalRow(required.size)
    var f = 0
    while (f < required.size) {
      required.fields(f).name match {
        case "var" => out.update(f, UTF8String.fromString(p.name))
        case "i" => out.setInt(f, idx / d1)
        case "j" => out.setInt(f, idx % d1)
        case "raw" =>
          if (isInt) out.setLong(f, rawD.toLong) else out.setNullAt(f)
        case "value" =>
          if (isFill) out.setNullAt(f)
          else out.setDouble(f, rawD * p.scale + p.offset)
        case "file" => out.update(f, fileName)
      }
      f += 1
    }
    out
  }
  private val fileName = UTF8String.fromString(SourcePaths.baseName(p.path))
  override def close(): Unit = ()
}
