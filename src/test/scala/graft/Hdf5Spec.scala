package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Hdf5, Netcdf}
import graft.sources.Hdf5.H5WVar

/** netCDF-4 (HDF5-backed) read path for the Netcdf source: the
  * container format real GOES-R / Himawari L2 products ship. Covers the
  * netcdf-c default subset end to end — contiguous / compact / chunked
  * layouts, gzip and gzip+shuffle filters, both endiannesses, edge
  * chunks, scale/offset/_FillValue semantics — and the same
  * Mask/DQF/Power hotspot decode the classic NetcdfSpec pins, so a
  * query is container-agnostic. (Reader and fixture writer are a
  * matched pair against the public format spec — no independent HDF5
  * implementation exists in this container; see Hdf5.scala's scaladoc.)
  */
class Hdf5Spec extends SparkSpecBase {

  private def read(path: String, vars: Option[String] = None) = {
    val r = spark.read.format("graft.sources.NetcdfProvider").option("path", path)
    vars.fold(r)(v => r.option("vars", v)).load()
  }

  private def goesFixture(): String = {
    val dir = Files.createTempDirectory("h5").toFile.getAbsolutePath
    val path = s"$dir/goes_fdc_nc4.nc"
    // same grids as NetcdfSpec's classic fixture, but netCDF-4 style:
    // 2-D vars chunked + gzip(+shuffle), the layout netcdf-c defaults to
    val mask = Array[Double](10, 40, 11, 0, 12, 13, 0, 14, 15, 40, 10, 0)
    val dqf = Array[Double](0, 2, 0, 255, 1, 0, 255, 0, 3, 2, 0, 255)
    val power = Array[Double](8, -1, 12, -1, 20, 24, -1, 28, 100, -1, 4, -1)
    val temp = Array[Double](300.5, 0, 310.25, 0, 320.125, 330.5, 0, 340.75, 400.0, 0, 305.5, 0)
    Hdf5.write(path, Seq(
      H5WVar("Mask", Netcdf.NcShort, Seq(3, 4), mask,
        chunkDims = Seq(2, 2), gzip = true, shuffle = true),
      H5WVar("DQF", Netcdf.NcByte, Seq(3, 4), dqf,
        chunkDims = Seq(2, 3), gzip = true, fill = Some(255)),
      H5WVar("Power", Netcdf.NcShort, Seq(3, 4), power,
        chunkDims = Seq(3, 4), gzip = true, shuffle = true,
        scale = Some(0.25), offset = Some(100.0), fill = Some(-1)),
      H5WVar("Temp", Netcdf.NcFloat, Seq(3, 4), temp),
      H5WVar("steps", Netcdf.NcInt, Seq(4), Array[Double](1, 2, 3, 4)),
      H5WVar("nominal_time", Netcdf.NcDouble, Seq(),
        Array[Double](1716000000.5), compactLayout = true)))
    path
  }

  test("magic dispatch: HDF5 signature routes to the HDF5 reader") {
    val path = goesFixture()
    assert(Hdf5.isHdf5(path))
    intercept[IllegalArgumentException] { Netcdf.readMeta(path) }
    val vars = Hdf5.readVars(path)
    assert(vars.map(_.name).sorted ==
      Seq("DQF", "Mask", "Power", "Temp", "nominal_time", "steps"))
    val m = vars.find(_.name == "Mask").get
    assert(m.gzip && m.shuffle && m.chunks.size == 4) // 2x2 chunks over 3x4
    assert(vars.find(_.name == "Temp").get.contiguous.isDefined)
    assert(vars.find(_.name == "nominal_time").get.compact.isDefined)
  }

  test("round trip through the DSv2 source: types, scaling, fill, edges") {
    val df = read(goesFixture()).cache()
    assert(df.count() == 4 * 12 + 4 + 1)
    // chunked+gzip+shuffle short survives edge-clipping (3x4 over 2x2)
    val mk = df.filter(col("var") === "Mask").orderBy("i", "j").collect()
    assert(mk.map(_.getAs[Long]("raw")).toSeq ==
      Seq[Long](10, 40, 11, 0, 12, 13, 0, 14, 15, 40, 10, 0))
    // scaled short: value = raw*0.25 + 100, fill -1 -> null value
    val p = df.filter(col("var") === "Power").orderBy("i", "j").collect()
    assert(p(0).getAs[Long]("raw") == 8L && p(0).getAs[Double]("value") == 102.0)
    assert(p(1).isNullAt(p(1).fieldIndex("value")) && p(1).getAs[Long]("raw") == -1L)
    // byte fill (255 stored two's-complement -> raw -1, value nulled)
    val d = df.filter(col("var") === "DQF" && col("i") === 0 && col("j") === 3).head
    assert(d.getAs[Long]("raw") == -1L && d.isNullAt(d.fieldIndex("value")))
    // contiguous float and compact scalar double
    val t = df.filter(col("var") === "Temp" && col("i") === 2 && col("j") === 0).head
    assert(t.getAs[Double]("value") == 400.0)
    assert(df.filter(col("var") === "nominal_time").head
      .getAs[Double]("value") == 1716000000.5)
  }

  test("GOES-R hotspot decode is container-agnostic (same query, HDF5 file)") {
    val df = read(goesFixture()).cache()
    val mask = df.filter(col("var") === "Mask").select(col("i"), col("j"), col("raw").as("mask"))
    val dqf = df.filter(col("var") === "DQF").select(col("i"), col("j"), col("raw").as("dqf"))
    val pwr = df.filter(col("var") === "Power").select(col("i"), col("j"), col("value").as("frp"))
    val hot = mask.join(dqf, Seq("i", "j")).join(pwr, Seq("i", "j"))
      .filter(col("mask").between(10, 15) && col("dqf") === 0)
      .orderBy("i", "j").collect()
    assert(hot.map(r => (r.getInt(0), r.getInt(1))).toSeq ==
      Seq((0, 0), (0, 2), (1, 1), (1, 3), (2, 2)))
    assert(hot.head.getAs[Double]("frp") == 102.0)
  }

  test("vars option prunes HDF5 partitions before launch") {
    val scan = read(goesFixture(), Some("Mask,Power"))
      .queryExecution.executedPlan
      .collect { case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b }
      .head
    assert(scan.inputPartitions.size == 2)
  }

  test("big-endian data and large multi-chunk grids decode exactly") {
    val dir = Files.createTempDirectory("h5be").toFile.getAbsolutePath
    val path = s"$dir/be.nc"
    val h = 67; val w = 53 // awkward sizes -> many edge chunks
    val grid = Array.tabulate[Double](h * w)(i => ((i * 37) % 4099 - 2048).toDouble)
    Hdf5.write(path, Seq(
      H5WVar("big", Netcdf.NcShort, Seq(h, w), grid,
        chunkDims = Seq(16, 16), gzip = true, shuffle = true,
        littleEndian = false),
      H5WVar("bigf", Netcdf.NcDouble, Seq(h, w), grid,
        chunkDims = Seq(32, 32), gzip = true)))
    val df = read(path)
    val got = df.filter(col("var") === "big").orderBy("i", "j")
      .select("raw").collect().map(_.getLong(0))
    assert(got.toSeq == grid.map(_.toLong).toSeq)
    val gotF = df.filter(col("var") === "bigf").orderBy("i", "j")
      .select("value").collect().map(_.getDouble(0))
    assert(gotF.toSeq == grid.toSeq)
  }

  test("shuffle filter is its own inverse and matches the HDF5 spec shape") {
    val raw = Array.tabulate[Byte](24)(i => (i * 7 + 3).toByte)
    val sh = Hdf5.shuffleBytes(raw, 4)
    // spec: all byte-0s of each element first, then all byte-1s, ...
    assert(sh.take(6).toSeq == Seq(raw(0), raw(4), raw(8), raw(12), raw(16), raw(20)))
    assert(Hdf5.unshuffle(sh, 4).toSeq == raw.toSeq)
  }

  test("randomized file shapes round-trip (seeded sweep over the subset)") {
    // deterministic sweep over dtype x layout x filter x endianness x
    // awkward shapes — the whole-parser analog of RasterCodecProps
    val rnd = new scala.util.Random(42)
    val types = Seq(Netcdf.NcByte, Netcdf.NcShort, Netcdf.NcInt,
      Netcdf.NcFloat, Netcdf.NcDouble)
    (0 until 25).foreach { k =>
      val t = types(k % types.length)
      val d0 = 1 + rnd.nextInt(40)
      val d1 = 1 + rnd.nextInt(40)
      val chunked = k % 3 != 0
      val gz = chunked && k % 2 == 0
      val sh = gz && k % 4 == 0
      val le = k % 5 != 0
      val lim = t match {
        case Netcdf.NcByte => 127; case Netcdf.NcShort => 32000; case _ => 1000000
      }
      val data = Array.fill(d0 * d1)((rnd.nextInt(2 * lim) - lim).toDouble)
      val dir = Files.createTempDirectory("h5rand").toFile.getAbsolutePath
      val path = s"$dir/r$k.nc"
      Hdf5.write(path, Seq(H5WVar(s"v$k", t, Seq(d0, d1), data,
        chunkDims = if (chunked) Seq(1 + rnd.nextInt(16), 1 + rnd.nextInt(16)) else Nil,
        gzip = gz, shuffle = sh, littleEndian = le)))
      val v = Hdf5.readVars(path).head
      val got = Hdf5.readVarData(path, v)
      assert(got.toSeq == data.toSeq,
        s"case $k (t=$t ${d0}x$d1 chunked=$chunked gz=$gz sh=$sh le=$le)")
    }
  }

  test("out-of-subset files fail with actionable errors") {
    val path = goesFixture()
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(path))
    bytes(8) = 1 // superblock version -> 1 (istore_k variant; v2/3 are
    // SUPPORTED since r12, so v1 is the remaining unsupported version)
    val p2 = java.nio.file.Paths.get(path + ".v1")
    Files.write(p2, bytes)
    val ex = intercept[IllegalArgumentException] { Hdf5.readVars(p2.toString) }
    assert(ex.getMessage.contains("superblock version 1"))
  }

  test("files past 2 GiB parse (seek-based metadata walk, r11)") {
    // full-disk GOES-R ABI products cross 2 GiB; the old walk read the
    // whole file into one Int-indexed array and rejected these. Extend a
    // valid fixture to 2 GiB + 64 MiB with a sparse tail (metadata
    // offsets are unchanged; HDF5 readers never chase the EOF field) and
    // assert both the metadata walk and the data decode still work.
    val path = goesFixture()
    val big = java.nio.file.Paths.get(path + ".big")
    Files.copy(java.nio.file.Paths.get(path), big,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val raf = new java.io.RandomAccessFile(big.toFile, "rw")
    try raf.setLength(Int.MaxValue.toLong + (64L << 20))
    finally raf.close()
    val vars = Hdf5.readVars(big.toString)
    val varsSmall = Hdf5.readVars(path)
    assert(vars.map(_.name) == varsSmall.map(_.name))
    vars.zip(varsSmall).foreach { case (b, s) =>
      assert(Hdf5.readVarData(big.toString, b).toSeq
        == Hdf5.readVarData(path, s).toSeq, s"var ${b.name}")
    }
    Files.delete(big)
  }

  test("modern fixed-array chunked file reads through the DSv2 surface") {
    // the src_netcdf surface is container-agnostic: a libver-latest file
    // (superblock v3, OHDR, layout v4 + fixed-array chunk index, gzip+
    // shuffle) yields the same rows as its classic twin
    val dir = Files.createTempDirectory("h5fa").toFile.getAbsolutePath
    val mask = Array[Double](10, 40, 11, 0, 12, 13, 0, 14, 15, 40, 10, 0)
    def vars(fa: Boolean) = Seq(
      H5WVar("Mask", Netcdf.NcShort, Seq(3, 4), mask,
        chunkDims = Seq(2, 2), gzip = true, shuffle = true,
        fixedArrayIndex = fa),
      H5WVar("P", Netcdf.NcInt, Seq(3, 4),
        Array.tabulate(12)(_.toDouble), chunkDims = Seq(2, 3),
        fixedArrayIndex = fa))
    val modern = s"$dir/modern_fa.nc"; val classic = s"$dir/classic.nc"
    Hdf5.write(modern, vars(fa = true), modern = true)
    Hdf5.write(classic, vars(fa = false))
    def rows(p: String) = read(p)
      .select(col("var"), col("i"), col("j"), col("value"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(rows(modern) == rows(classic))
    assert(rows(modern).count(_._1 == "Mask") == 12)
  }
}
