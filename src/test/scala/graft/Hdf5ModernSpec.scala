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

  test("dense link storage is rejected by name") {
    val p = tmp("dense.nc")
    Hdf5.write(p, fixtureVars, modern = true, denseLinkStub = true)
    val e = intercept[IllegalArgumentException](Hdf5.readVars(p))
    assert(e.getMessage.contains("fractal heap"),
      s"got: ${e.getMessage}")
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

  test("hybrid: old-style symbol-table group still reads under v0 path") {
    // regression guard: the v0 gate fixtures keep working after the
    // reader's dispatch refactor
    val p = tmp("classic2.nc")
    Hdf5.write(p, fixtureVars)
    assert(Hdf5.readVars(p).map(_.name).sorted == Seq("T", "flt", "sc"))
  }
}
