package graft

import graft.sources.{Hdf5, Netcdf}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** r12: the modern-writer HDF5 subset — superblock v2/v3, v2 (OHDR)
  * object headers with OCHK continuations, new-style groups with compact
  * link messages, lookup3-checksummed throughout — plus the named-error
  * audit for the structures still outside the subset (dense links,
  * layout-v4 chunk indexes, superblock v1).
  */
class Hdf5ModernSpec extends AnyFunSuite {

  private def tmp(name: String): String =
    Files.createTempDirectory("h5modern").resolve(name).toString

  private val fixtureVars = Seq(
    Hdf5.H5WVar("flt", Netcdf.NcFloat, Seq(4),
      Array[Double](0.5, 1.5, 2.5, 3.5)),
    Hdf5.H5WVar("T", Netcdf.NcShort, Seq(3, 4),
      Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
      chunkDims = Seq(2, 2), gzip = true, shuffle = true,
      scale = Some(0.25), offset = Some(100.0), fill = Some(-9.0)),
    Hdf5.H5WVar("sc", Netcdf.NcDouble, Seq(),
      Array[Double](42.25), compactLayout = true))

  test("lookup3 matches the published lookup3.c self-test vectors") {
    assert(Hdf5.Lookup3.hash(Array.emptyByteArray) == 0xdeadbeef)
    val s = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Hdf5.Lookup3.hash(s, 0) == 0x17770551)
    assert(Hdf5.Lookup3.hash(s, 1) == 0xcd628161.toInt)
  }

  test("modern (superblock v3 + OHDR + link messages) file round-trips") {
    val p = tmp("modern.nc")
    Hdf5.write(p, fixtureVars, modern = true)
    // superblock version byte is 3, and the root header is OHDR-signed
    val bytes = Files.readAllBytes(Paths.get(p))
    assert((bytes(8) & 0xFF) == 3, "superblock version byte")
    val vars = Hdf5.readVars(p).sortBy(_.name)
    assert(vars.map(_.name) == Seq("T", "flt", "sc"))
    val t = vars.find(_.name == "T").get
    assert(t.dims.toSeq == Seq(3, 4) && t.gzip && t.shuffle)
    assert(t.scale == 0.25 && t.offset == 100.0 && t.fill.contains(-9.0))
    // values identical to the v0 form of the same datasets
    val p0 = tmp("classic.nc")
    Hdf5.write(p0, fixtureVars)
    val v0 = Hdf5.readVars(p0).sortBy(_.name)
    vars.zip(v0).foreach { case (m, c) =>
      assert(m.name == c.name)
      assert(Hdf5.readVarData(p, m).toSeq == Hdf5.readVarData(p0, c).toSeq,
        s"${m.name} data differs between modern and classic containers")
    }
  }

  test("a dangling dense-link pointer fails the heap walk by name") {
    // r13: dense links are now WALKED, so a stubbed fractal heap address
    // pointing at non-heap bytes must die on the FRHP signature check,
    // not wander off into garbage
    val p = tmp("dense.nc")
    Hdf5.write(p, fixtureVars, modern = true, denseLinkStub = true)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    // the stub carries a heap address but no name B-tree: the walk dies
    // on its first consistency check, by name
    assert(e.getMessage.contains("name-index v2 B-tree"),
      s"got: ${e.getMessage}")
  }

  test("dense-link group (fractal heap + name B-tree) reads green") {
    // 12 variables — past the default compact threshold (8), the shape
    // a real L2 product with dozens of variables occupies
    val many = (0 until 12).map { k =>
      Hdf5.H5WVar(f"v$k%02d", Netcdf.NcInt, Seq(3),
        Array.tabulate(3)(i => (k * 10 + i).toDouble),
        chunkDims = if (k % 2 == 0) Seq(2) else Nil,
        gzip = k % 4 == 0)
    }
    val p = tmp("dense_real.nc")
    Hdf5.write(p, many, modern = true, denseLinks = true)
    val vars = Hdf5.readVars(p)
    assert(vars.map(_.name) == (0 until 12).map(k => f"v$k%02d"))
    // value-identical to the compact-link twin
    val p0 = tmp("dense_compact.nc")
    Hdf5.write(p0, many, modern = true)
    val v0 = Hdf5.readVars(p0)
    vars.zip(v0).foreach { case (d, c) =>
      assert(Hdf5.readVarData(p, d).toSeq == Hdf5.readVarData(p0, c).toSeq,
        s"${d.name} differs between dense and compact link storage")
    }
  }

  test("corrupt dense-link index fails its checksum by name") {
    val many = (0 until 10).map(k =>
      Hdf5.H5WVar(s"w$k", Netcdf.NcShort, Seq(2), Array[Double](k, k + 1)))
    val p = tmp("dense_bad.nc")
    Hdf5.write(p, many, modern = true, denseLinks = true)
    val bytes = Files.readAllBytes(Paths.get(p))
    val btlf = bytes.indices.find(i => i + 4 <= bytes.length &&
      new String(bytes, i, 4, "US-ASCII") == "BTLF").get
    bytes(btlf + 8) = (bytes(btlf + 8) ^ 0x3C).toByte
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("leaf checksum"), s"got: ${e.getMessage}")
  }

  test("superblock v1 is rejected by name") {
    val p = tmp("v1.nc")
    Hdf5.write(p, fixtureVars)
    val bytes = Files.readAllBytes(Paths.get(p))
    bytes(8) = 1
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("superblock version 1"))
  }

  test("corrupted modern metadata fails the checksum by name") {
    val p = tmp("corrupt.nc")
    Hdf5.write(p, fixtureVars, modern = true)
    val bytes = Files.readAllBytes(Paths.get(p))
    // flip a byte inside the superblock body (EOF field)
    bytes(30) = (bytes(30) ^ 0x7F).toByte
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("checksum"), s"got: ${e.getMessage}")
  }

  test("out-of-file metadata pointer fails with a named error") {
    val p = tmp("trunc.nc")
    Hdf5.write(p, fixtureVars, modern = true)
    val bytes = Files.readAllBytes(Paths.get(p))
    // point the root header far past EOF, with a recomputed checksum so
    // the failure is the OFFSET check, not the checksum
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putLong(36, bytes.length + 4096L)
    bb.putInt(44, Hdf5.Lookup3.hash(java.util.Arrays.copyOf(bytes, 44)))
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("outside file"), s"got: ${e.getMessage}")
  }

  private val faVars = Seq(
    // client 0: unfiltered chunks, bare-address elements
    Hdf5.H5WVar("P", Netcdf.NcInt, Seq(5, 6),
      Array.tabulate(30)(i => (i * 7 % 90).toDouble),
      chunkDims = Seq(2, 4), fixedArrayIndex = true),
    // client 1: gzip+shuffle pipeline — elements carry stored size + mask
    Hdf5.H5WVar("T", Netcdf.NcShort, Seq(3, 4),
      Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
      chunkDims = Seq(2, 2), gzip = true, shuffle = true,
      scale = Some(0.25), offset = Some(100.0), fill = Some(-9.0),
      fixedArrayIndex = true))

  test("layout v4 + fixed-array chunk index round-trips, filtered and not") {
    val p = tmp("farray.nc")
    Hdf5.write(p, faVars, modern = true)
    val vars = Hdf5.readVars(p).sortBy(_.name)
    assert(vars.map(_.name) == Seq("P", "T"))
    assert(vars.forall(_.chunkDims.nonEmpty))
    // edge-clipped grids: P = 3x2 chunk grid minus none (all defined),
    // T = 2x2; every chunk present
    assert(vars.find(_.name == "P").get.chunks.size == 6)
    assert(vars.find(_.name == "T").get.chunks.size == 4)
    // value-identical to the classic twin (v1 B-tree index)
    val p0 = tmp("farray_classic.nc")
    Hdf5.write(p0, faVars.map(_.copy(fixedArrayIndex = false)))
    val v0 = Hdf5.readVars(p0).sortBy(_.name)
    vars.zip(v0).foreach { case (m, c) =>
      assert(Hdf5.readVarData(p, m).toSeq == Hdf5.readVarData(p0, c).toSeq,
        s"${m.name} data differs between fixed-array and v1-B-tree forms")
    }
  }

  test("layout v4 + single-chunk index round-trips, filtered and not") {
    // the other common libver-latest shape: dataset extent == one chunk,
    // the chunk address IS the index (flag bit 1 adds size + mask)
    val scVars = Seq(
      Hdf5.H5WVar("A", Netcdf.NcInt, Seq(4, 5),
        Array.tabulate(20)(i => (i * 3 % 40).toDouble),
        chunkDims = Seq(4, 5), singleChunkIndex = true),
      Hdf5.H5WVar("B", Netcdf.NcShort, Seq(6),
        Array.tabulate(6)(i => (i + 1).toDouble),
        chunkDims = Seq(6), gzip = true, shuffle = true,
        singleChunkIndex = true))
    val p = tmp("single.nc")
    Hdf5.write(p, scVars, modern = true)
    val vars = Hdf5.readVars(p).sortBy(_.name)
    assert(vars.map(_.name) == Seq("A", "B"))
    assert(vars.forall(_.chunks.size == 1))
    val p0 = tmp("single_classic.nc")
    Hdf5.write(p0, scVars.map(_.copy(singleChunkIndex = false)))
    val v0 = Hdf5.readVars(p0).sortBy(_.name)
    vars.zip(v0).foreach { case (m, c) =>
      assert(Hdf5.readVarData(p, m).toSeq == Hdf5.readVarData(p0, c).toSeq,
        s"${m.name} data differs between single-chunk and v1-B-tree forms")
    }
  }

  test("layout v4 + implicit index round-trips; filtered implicit rejects") {
    // implicit index: early-allocated unfiltered chunks, contiguous from
    // the base address in row-major chunk-grid order (incl. edge chunks)
    val imVars = Seq(
      Hdf5.H5WVar("M", Netcdf.NcShort, Seq(5, 7),
        Array.tabulate(35)(i => (i * 11 % 60).toDouble),
        chunkDims = Seq(2, 3), implicitIndex = true))
    val p = tmp("implicit.nc")
    Hdf5.write(p, imVars, modern = true)
    val v = Hdf5.readVars(p).head
    assert(v.chunks.size == 3 * 3) // ceil(5/2) x ceil(7/3)
    val p0 = tmp("implicit_classic.nc")
    Hdf5.write(p0, imVars.map(_.copy(implicitIndex = false)))
    assert(Hdf5.readVarData(p, v).toSeq
      == Hdf5.readVarData(p0, Hdf5.readVars(p0).head).toSeq)
    // a filter pipeline alongside an implicit index is rejected by name
    val bytes = Files.readAllBytes(Paths.get(p))
    intercept[IllegalArgumentException] {
      Hdf5.write(tmp("implicit_bad.nc"),
        imVars.map(_.copy(gzip = true)), modern = true)
    }
    val _ = bytes
  }

  test("grow-able v4 chunk indexes are rejected by name") {
    val p = tmp("farray_ea.nc")
    Hdf5.write(p, faVars, modern = true)
    val bytes = Files.readAllBytes(Paths.get(p))
    // the v4 chunked layout body for rank-2 P: 04 02 00 03 04 + 3x4-byte
    // dims + index type at +17 — locate it by its unambiguous prefix
    val pat = Array[Byte](4, 2, 0, 3, 4)
    val at = bytes.indices.find(i => i + 17 < bytes.length &&
      pat.indices.forall(k => bytes(i + k) == pat(k)) &&
      bytes(i + 17) == 3)
    assert(at.isDefined, "v4 layout body not found")
    bytes(at.get + 17) = 4 // extensible array
    // re-stamp the enclosing OHDR checksum so the failure is the index
    // rejection, not the header checksum
    val hdrStart = (0 to at.get).findLast(j =>
      new String(bytes, j, 4, "US-ASCII") == "OHDR").get
    val total = (bytes(hdrStart + 6) & 0xFF) | ((bytes(hdrStart + 7) & 0xFF) << 8)
    val sum = Hdf5.Lookup3.hash(
      java.util.Arrays.copyOfRange(bytes, hdrStart, hdrStart + 8 + total))
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(hdrStart + 8 + total, sum)
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("extensible-array"), s"got: ${e.getMessage}")
  }

  test("corrupt fixed-array blocks fail their checksums by name") {
    val p = tmp("farray_bad.nc")
    Hdf5.write(p, faVars, modern = true)
    val bytes = Files.readAllBytes(Paths.get(p))
    val fadb = bytes.indices.find(i => i + 4 <= bytes.length &&
      new String(bytes, i, 4, "US-ASCII") == "FADB")
    assert(fadb.isDefined)
    bytes(fadb.get + 15) = (bytes(fadb.get + 15) ^ 0x5A).toByte
    Files.write(Paths.get(p), bytes)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("fixed-array data block checksum"),
      s"got: ${e.getMessage}")
  }

  test("hybrid: old-style symbol-table group still reads under v0 path") {
    // regression guard: the v0 gate fixtures keep working after the
    // reader's dispatch refactor
    val p = tmp("classic2.nc")
    Hdf5.write(p, fixtureVars)
    assert(Hdf5.readVars(p).map(_.name).sorted == Seq("T", "flt", "sc"))
  }
}
