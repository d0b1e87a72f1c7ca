package graft

import java.nio.file.{Files, Paths}

/** One-shot generator for committed binary fixtures (run via
  * `sbt "runMain graft.MakeFixtures"`). Regenerating must be a no-op:
  * every fixture is a pure function of source code (no RNG, no clock),
  * and the specs assert the committed bytes round-trip.
  */
object MakeFixtures {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get("src/main/resources/graft")
    Files.createDirectories(dir)
    val onnx = functions.Onnx.encode(functions.Onnx.fixtureModel)
    Files.write(dir.resolve("smoke_mlp.onnx"), onnx)
    println(s"wrote smoke_mlp.onnx (${onnx.length} bytes)")

    val cnn = functions.Onnx.encode(functions.Onnx.fixtureConvModel)
    Files.write(dir.resolve("smoke_cnn.onnx"), cnn)
    println(s"wrote smoke_cnn.onnx (${cnn.length} bytes)")

    val cnn2 = functions.Onnx.encode(functions.Onnx.fixtureConvModel2)
    Files.write(dir.resolve("smoke_cnn2.onnx"), cnn2)
    println(s"wrote smoke_cnn2.onnx (${cnn2.length} bytes)")

    // HDF5 golden fixture: committed bytes that Hdf5GoldenSpec walks with
    // its own spec-derived micro-parser (independent of Hdf5.Reader), so
    // a shared writer/reader misreading of the format spec can't
    // self-validate. Layout chosen for hand-verifiable offsets: the
    // contiguous float var is placed first -> its data sits at exactly
    // offset 96 (the v0 superblock reserves 0..95).
    val h5 = dir.resolve("golden_nc4.nc")
    sources.Hdf5.write(h5.toString, Seq(
      sources.Hdf5.H5WVar("flt", sources.Netcdf.NcFloat, Seq(4),
        Array[Double](0.5, 1.5, 2.5, 3.5)),
      sources.Hdf5.H5WVar("T", sources.Netcdf.NcShort, Seq(3, 4),
        Array[Double](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12),
        chunkDims = Seq(2, 2), gzip = true, shuffle = true),
      sources.Hdf5.H5WVar("sc", sources.Netcdf.NcDouble, Seq(),
        Array[Double](42.25), compactLayout = true)))
    println(s"wrote golden_nc4.nc (${Files.size(h5)} bytes)")
  }
}
