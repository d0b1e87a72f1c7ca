package graft

import graft.functions.Onnx
import graft.functions.Onnx.{Model, Node, Tensor}
import org.scalatest.funsuite.AnyFunSuite

/** r12 executor op breadth — AveragePool, GlobalAveragePool, Sigmoid,
  * Softmax, Concat, BatchNormalization — each checked against an
  * INDEPENDENT computation (spec formulas in double precision, not the
  * Session's code path), plus the committed smoke_cnn2.onnx artifact
  * that exercises all of them in one graph.
  */
class Onnx2Spec extends AnyFunSuite {

  /** single-op harness: input dims (batch symbolic), one node x→y. */
  private def run1(node: Node, inDims: Seq[Long], outDims: Seq[Long],
      inits: Map[String, Tensor] = Map.empty)(in: Array[Float]): Array[Float] = {
    val m = Model(8L, 13L, "graft", "t", "x", inDims, "y", outDims,
      Seq(node), inits, inits.keys.toSeq)
    new Onnx.Session(m).run(Array(in)).head
  }

  test("Softmax matches exp-normalization and sums to 1") {
    val out = run1(Node("Softmax", Seq("x"), Seq("y"),
      attrI = Map("axis" -> -1L)), Seq(-1L, 4L), Seq(-1L, 4L))(
      Array(0f, 1f, 2f, 3f))
    val ref = {
      val e = Array(0.0, 1.0, 2.0, 3.0).map(v => math.exp(v - 3.0))
      val s = e.sum
      e.map(_ / s)
    }
    (0 until 4).foreach(i => assert(math.abs(out(i) - ref(i)) < 1e-6,
      s"softmax[$i] ${out(i)} vs ${ref(i)}"))
    assert(math.abs(out.map(_.toDouble).sum - 1.0) < 1e-6)
  }

  test("Softmax rejects non-last axis with a named error") {
    val e = intercept[IllegalArgumentException] {
      run1(Node("Softmax", Seq("x"), Seq("y"), attrI = Map("axis" -> 0L)),
        Seq(-1L, 4L), Seq(-1L, 4L))(Array(0f, 1f, 2f, 3f))
    }
    assert(e.getMessage.contains("Softmax") && e.getMessage.contains("axis"))
  }

  test("Sigmoid matches 1/(1+exp(-x))") {
    val in = Array(-2f, -0.5f, 0f, 3f)
    val out = run1(Node("Sigmoid", Seq("x"), Seq("y")),
      Seq(-1L, 4L), Seq(-1L, 4L))(in)
    in.zip(out).foreach { case (x, y) =>
      assert(math.abs(y - 1.0 / (1.0 + math.exp(-x.toDouble))) < 1e-6)
    }
  }

  test("AveragePool 2x2/2 takes exact block means") {
    val in = Array.tabulate(16)(_.toFloat) // [1,1,4,4] row-major
    val out = run1(Node("AveragePool", Seq("x"), Seq("y"),
      attrIs = Map("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L))),
      Seq(-1L, 1L, 4L, 4L), Seq(-1L, 1L, 2L, 2L))(in)
    assert(out.toSeq == Seq(2.5f, 4.5f, 10.5f, 12.5f))
  }

  test("AveragePool pads: count_include_pad toggles the divisor") {
    val in = Array.tabulate(4)(i => (i + 1).toFloat) // [1,1,2,2]
    def pooled(inc: Long) = run1(Node("AveragePool", Seq("x"), Seq("y"),
      attrI = Map("count_include_pad" -> inc),
      attrIs = Map("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L),
        "pads" -> Seq(1L, 1L, 1L, 1L))),
      Seq(-1L, 1L, 2L, 2L), Seq(-1L, 1L, 2L, 2L))(in)
    // top-left window sees only value 1 (3 padded cells)
    assert(pooled(0L)(0) == 1f, "exclude pad: 1/1")
    assert(pooled(1L)(0) == 0.25f, "include pad: 1/4")
  }

  test("GlobalAveragePool emits per-channel means as [N,C,1,1]") {
    val in = Array(1f, 2f, 3f, 4f, 10f, 20f, 30f, 40f) // [1,2,2,2]
    val out = run1(Node("GlobalAveragePool", Seq("x"), Seq("y")),
      Seq(-1L, 2L, 2L, 2L), Seq(-1L, 2L, 1L, 1L))(in)
    assert(out.toSeq == Seq(2.5f, 25f))
  }

  test("Concat stacks along the axis in input order") {
    val a = Tensor(Seq(1, 2), Array(1f, 2f))
    val out = run1(Node("Concat", Seq("x", "c"), Seq("y"),
      attrI = Map("axis" -> 1L)),
      Seq(-1L, 3L), Seq(-1L, 5L), inits = Map("c" -> a))(
      Array(10f, 20f, 30f))
    assert(out.toSeq == Seq(10f, 20f, 30f, 1f, 2f))
  }

  test("BatchNormalization matches the spec formula per channel") {
    val sc = Tensor(Seq(2), Array(2f, 0.5f))
    val bb = Tensor(Seq(2), Array(1f, -1f))
    val mu = Tensor(Seq(2), Array(0.5f, -0.25f))
    val vr = Tensor(Seq(2), Array(4f, 0.25f))
    val in = Array(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f) // [1,2,2,2]
    val out = run1(Node("BatchNormalization",
      Seq("x", "s", "b", "m", "v"), Seq("y"),
      attrF = Map("epsilon" -> 1e-5f)),
      Seq(-1L, 2L, 2L, 2L), Seq(-1L, 2L, 2L, 2L),
      inits = Map("s" -> sc, "b" -> bb, "m" -> mu, "v" -> vr))(in)
    (0 until 8).foreach { i =>
      val c = i / 4
      val ref = sc.data(c) * (in(i) - mu.data(c)) /
        math.sqrt(vr.data(c).toDouble + 1e-5) + bb.data(c)
      assert(math.abs(out(i) - ref) < 1e-5, s"bn[$i] ${out(i)} vs $ref")
    }
  }

  test("pool/conv reject malformed attrs and pad>=kernel with named errors") {
    val in = Array.tabulate(16)(_.toFloat)
    val shortStride = intercept[IllegalArgumentException] {
      run1(Node("MaxPool", Seq("x"), Seq("y"),
        attrIs = Map("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L))),
        Seq(-1L, 1L, 4L, 4L), Seq(-1L, 1L, 2L, 2L))(in)
    }
    assert(shortStride.getMessage.contains("MaxPool")
      && shortStride.getMessage.contains("strides"))
    val bigPad = intercept[IllegalArgumentException] {
      run1(Node("AveragePool", Seq("x"), Seq("y"),
        attrIs = Map("kernel_shape" -> Seq(2L, 2L), "strides" -> Seq(2L, 2L),
          "pads" -> Seq(2L, 2L, 2L, 2L))),
        Seq(-1L, 1L, 4L, 4L), Seq(-1L, 1L, 3L, 3L))(in)
    }
    assert(bigPad.getMessage.contains("pad"))
  }

  private def committedBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/smoke_cnn2.onnx")
    assert(in != null, "committed smoke_cnn2 fixture missing")
    try in.readAllBytes() finally in.close()
  }

  test("committed smoke_cnn2.onnx is the encoded fixtureConvModel2, bit-exact") {
    assert(java.util.Arrays.equals(committedBytes,
      Onnx.encode(Onnx.fixtureConvModel2)))
  }

  test("smoke_cnn2 parse round-trips the full op list and executes") {
    val m = Onnx.parse(committedBytes)
    assert(m.graphName == "smoke_cnn2")
    assert(m.nodes.map(_.opType) == Seq("Conv", "BatchNormalization",
      "Relu", "AveragePool", "Conv", "Sigmoid", "GlobalAveragePool",
      "MaxPool", "Flatten", "Flatten", "Concat", "Gemm", "Softmax"))
    val tile = Array.tabulate(64)(i => (i % 9).toFloat / 8f)
    val out = new Onnx.Session(m).run(Array(tile)).head
    assert(out.length == 4)
    // softmax head: calibrated scores in (0,1) summing to 1
    assert(out.forall(s => s > 0f && s < 1f))
    assert(math.abs(out.map(_.toDouble).sum - 1.0) < 1e-5)
    // batching is row-independent: a 3-row batch reproduces the single row
    val b = new Onnx.Session(m).run(Array(tile, tile.map(_ * 0.5f), tile))
    assert(java.util.Arrays.equals(b(0), out) && java.util.Arrays.equals(b(2), out))
  }
}
