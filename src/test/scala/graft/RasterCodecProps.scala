package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.sources.{GeoTiff, Hdf5}

/** Randomized round-trip properties for the r9 raster codecs — the
  * TIFF LZW / PackBits / floating-point-predictor kernels and the HDF5
  * shuffle filter. These are the pure byte-level kernels under the
  * GeoTIFF/NetCDF sources; shapes, run lengths, and element sizes are
  * randomized past anything the fixture specs cover (LZW additionally
  * has cross-implementation pins against the JDK in LzwSpec).
  */
object RasterCodecProps extends Properties("rastercodecs") {

  private val byteArrays: Gen[Array[Byte]] = Gen.oneOf(
    // runs-heavy (RLE/LZW table exercise), random, and tiny inputs
    Gen.chooseNum(0, 3000).flatMap(n => Gen.listOfN(n,
      Gen.frequency(4 -> Gen.const(7.toByte),
        1 -> Gen.chooseNum(-128, 127).map(_.toByte))).map(_.toArray)),
    Gen.chooseNum(0, 3000).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)),
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n,
      Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)))

  property("LZW decode inverts encode") = forAll(byteArrays) { raw =>
    GeoTiff.lzwDecode(GeoTiff.lzwEncode(raw), raw.length).sameElements(raw)
  }

  property("PackBits decode inverts encode") = forAll(byteArrays) { raw =>
    GeoTiff.packBitsDecode(GeoTiff.packBitsEncode(raw), raw.length)
      .sameElements(raw)
  }

  private val floatRows: Gen[(Array[Byte], Int, Boolean)] = for {
    n <- Gen.chooseNum(1, 64) // floats per row
    rows <- Gen.chooseNum(1, 20)
    le <- Gen.oneOf(true, false)
    fs <- Gen.listOfN(n * rows, Gen.chooseNum(-1e6f, 1e6f))
  } yield {
    val bb = java.nio.ByteBuffer.allocate(fs.length * 4).order(
      if (le) java.nio.ByteOrder.LITTLE_ENDIAN else java.nio.ByteOrder.BIG_ENDIAN)
    fs.foreach(bb.putFloat)
    (bb.array(), n * 4, le)
  }

  property("fp predictor decode inverts encode (both endiannesses)") =
    forAll(floatRows) { case (raw, rowBytes, le) =>
      GeoTiff.fpPredictDecode(
        GeoTiff.fpPredictEncode(raw, rowBytes, le), rowBytes, le)
        .sameElements(raw)
    }

  property("HDF5 shuffle is inverted by unshuffle for all element sizes") =
    forAll(for {
      es <- Gen.oneOf(1, 2, 4, 8)
      n <- Gen.chooseNum(0, 500)
      bs <- Gen.listOfN(n * es, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield (bs.toArray, es)) { case (raw, es) =>
      Hdf5.unshuffle(Hdf5.shuffleBytes(raw, es), es).sameElements(raw)
    }
}
