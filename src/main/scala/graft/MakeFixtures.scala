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
  }
}
