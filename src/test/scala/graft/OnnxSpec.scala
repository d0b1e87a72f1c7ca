package graft

import graft.functions.Onnx
import org.scalatest.funsuite.AnyFunSuite

/** The committed smoke_mlp.onnx fixture and its pure-JVM parser/executor
  * (functions/Onnx.scala) — the real-model path behind mm_batch_infer.
  */
class OnnxSpec extends AnyFunSuite {

  private def committedBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/smoke_mlp.onnx")
    assert(in != null, "committed fixture missing")
    try in.readAllBytes() finally in.close()
  }

  test("committed fixture is the encoded fixtureModel, bit-exact") {
    // MakeFixtures is a pure function of source: regenerating must be a
    // no-op, and the resource on the classpath must be its exact output
    assert(java.util.Arrays.equals(committedBytes,
      Onnx.encode(Onnx.fixtureModel)))
  }

  test("parse round-trips the model: weights, nodes, attrs, shapes") {
    val m = Onnx.parse(committedBytes)
    val f = Onnx.fixtureModel
    assert(m.irVersion == 8L && m.opsetVersion == 13L)
    assert(m.producer == "graft" && m.graphName == "smoke_mlp")
    assert(m.inputName == "x" && m.inputDims == Seq(-1L, 8L))
    assert(m.outputName == "logits" && m.outputDims == Seq(-1L, 4L))
    assert(m.nodes.map(_.opType) == Seq("Gemm", "Relu", "Gemm"))
    assert(m.nodes.head.attrI("transB") == 1L)
    assert(m.nodes.head.attrF("alpha") == 1.0f)
    assert(m.initOrder == f.initOrder)
    f.inits.foreach { case (nm, t) =>
      assert(m.inits(nm).dims == t.dims, s"$nm dims")
      assert(java.util.Arrays.equals(m.inits(nm).data, t.data), s"$nm data")
    }
  }

  test("executor matches an independent float32 forward pass") {
    // independent reference: plain nested loops over the fixture weights,
    // written against the ONNX Gemm spec (Y = alpha*A*B^T + beta*C) —
    // not via the Session code path
    val f = Onnx.fixtureModel
    def ref(x: Array[Float]): Array[Float] = {
      val w1 = f.inits("w1").data; val b1 = f.inits("b1").data
      val w2 = f.inits("w2").data; val b2 = f.inits("b2").data
      val h = Array.tabulate(16) { i =>
        var acc = 0.0f
        for (j <- 0 until 8) acc += x(j) * w1(i * 8 + j)
        val v = acc + b1(i)
        if (v > 0f) v else 0f
      }
      Array.tabulate(4) { k =>
        var acc = 0.0f
        for (i <- 0 until 16) acc += h(i) * w2(k * 16 + i)
        acc + b2(k)
      }
    }
    val sess = new Onnx.Session(Onnx.parse(committedBytes))
    val inputs = Seq(
      Array.fill(8)(0.0f),
      Array.tabulate(8)(_.toFloat),
      Array.tabulate(8)(j => (j * 13 % 7 - 3).toFloat * 1.5f),
      Array.tabulate(8)(j => math.cos(j.toDouble).toFloat * 200f))
    val got = sess.run(inputs.map(_.clone).toArray)
    inputs.zip(got).foreach { case (x, g) =>
      assert(java.util.Arrays.equals(g, ref(x)),
        s"mismatch for ${x.mkString(",")}")
    }
  }

  test("batched run equals per-row runs (tail-batch shape safety)") {
    val sess = Onnx.smokeSession
    val rows = Array.tabulate(7)(r =>
      Array.tabulate(8)(j => (r * 8 + j).toFloat / 3f))
    val batched = sess.run(rows)
    val single = rows.map(r => sess.run(Array(r)).head)
    batched.zip(single).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
    assert(sess.run(Array.empty[Array[Float]]).isEmpty)
  }

  test("unsupported op fails loudly, not silently") {
    val m = Onnx.fixtureModel
    val bad = m.copy(nodes = m.nodes.map(n =>
      if (n.opType == "Relu") n.copy(opType = "LSTM") else n))
    val e = intercept[UnsupportedOperationException] {
      new Onnx.Session(bad).run(Array(Array.fill(8)(1.0f)))
    }
    assert(e.getMessage.contains("LSTM"))
  }

  test("input resolution is order- and old-exporter-independent") {
    // Two legal ONNX layouts our encoder never emits but real exporters
    // do: (a) graph.input serialized BEFORE initializers; (b) pre-IR-4
    // style, where initializers are ALSO listed in graph.input. Rebuild
    // the committed fixture's GraphProto at the byte level into the worst
    // combination of both and assert the data input still resolves to "x".
    def varint(r: java.nio.ByteBuffer): Long = {
      var x = 0L; var s = 0
      while ({ val b = r.get(); x |= (b & 0x7FL) << s; s += 7; (b & 0x80) != 0 }) ()
      x
    }
    def chunks(raw: Array[Byte]): Seq[(Int, Array[Byte])] = {
      // (fieldNo, full key+payload bytes) per top-level field
      val r = java.nio.ByteBuffer.wrap(raw)
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[Byte])]
      while (r.hasRemaining) {
        val start = r.position(); val k = varint(r)
        (k & 7) match {
          case 0 => varint(r)
          case 2 => val n = varint(r); r.position(r.position() + n.toInt)
          case 5 => r.position(r.position() + 4)
          case 1 => r.position(r.position() + 8)
          case w => fail(s"wire $w")
        }
        out += (((k >> 3).toInt,
          java.util.Arrays.copyOfRange(raw, start, r.position())))
      }
      out.toSeq
    }
    def keyed(field: Int, payload: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      def vi(v: Long): Unit = { var x = v
        while ((x & ~0x7FL) != 0) { o.write(((x & 0x7F) | 0x80).toInt); x >>>= 7 }
        o.write(x.toInt) }
      vi((field.toLong << 3) | 2); vi(payload.length.toLong); o.write(payload)
      o.toByteArray
    }
    val top = chunks(committedBytes)
    val graphRaw = top.collectFirst { case (7, c) =>
      val r = java.nio.ByteBuffer.wrap(c); varint(r); val n = varint(r)
      java.util.Arrays.copyOfRange(c, r.position(), r.position() + n.toInt)
    }.get
    val g = chunks(graphRaw)
    // old-exporter valueInfo rows for every initializer: just {name=1}
    val initInputs = Onnx.fixtureModel.initOrder.map(nm =>
      keyed(11, keyed(1, nm.getBytes("UTF-8"))))
    val reordered =
      initInputs.flatten.toArray ++                         // init-named inputs first
      g.filter(_._1 == 11).flatMap(_._2) ++                 // real input, still before inits
      g.filterNot(c => c._1 == 11 || c._1 == 5).flatMap(_._2) ++
      g.filter(_._1 == 5).flatMap(_._2)                     // initializers LAST
    val rebuilt = top.flatMap { case (f, c) =>
      if (f == 7) keyed(7, reordered).toSeq else c.toSeq
    }.toArray
    val m = Onnx.parse(rebuilt)
    assert(m.inputName == "x" && m.inputDims == Seq(-1L, 8L))
    assert(m.initOrder == Onnx.fixtureModel.initOrder)
    // and the rebuilt bytes still execute identically
    val x = Array.tabulate(8)(_.toFloat)
    assert(java.util.Arrays.equals(
      new Onnx.Session(m).run(Array(x.clone)).head,
      new Onnx.Session(Onnx.parse(committedBytes)).run(Array(x.clone)).head))
  }

  private def committedCnnBytes: Array[Byte] = {
    val in = getClass.getResourceAsStream("/graft/smoke_cnn.onnx")
    assert(in != null, "committed conv fixture missing")
    try in.readAllBytes() finally in.close()
  }

  test("committed conv fixture is the encoded fixtureConvModel, bit-exact") {
    assert(java.util.Arrays.equals(committedCnnBytes,
      Onnx.encode(Onnx.fixtureConvModel)))
  }

  test("conv model parse round-trips ints attributes (pads/strides/kernel)") {
    val m = Onnx.parse(committedCnnBytes)
    assert(m.graphName == "smoke_cnn")
    assert(m.inputName == "img" && m.inputDims == Seq(-1L, 1L, 8L, 8L))
    assert(m.nodes.map(_.opType) == Seq("Conv", "Relu", "MaxPool", "Conv",
      "Relu", "MaxPool", "Flatten", "Gemm"))
    val c1 = m.nodes.head
    assert(c1.attrIs("pads") == Seq(1L, 1L, 1L, 1L))
    assert(c1.attrIs("strides") == Seq(1L, 1L))
    assert(c1.attrIs("kernel_shape") == Seq(3L, 3L))
    val p1 = m.nodes(2)
    assert(p1.attrIs("kernel_shape") == Seq(2L, 2L))
    assert(p1.attrIs("strides") == Seq(2L, 2L))
    val f = Onnx.fixtureConvModel
    assert(m.initOrder == f.initOrder)
    f.inits.foreach { case (nm, t) =>
      assert(m.inits(nm).dims == t.dims, s"$nm dims")
      assert(java.util.Arrays.equals(m.inits(nm).data, t.data), s"$nm data")
    }
  }

  test("Conv/MaxPool/Flatten match an independent forward pass") {
    // independent reference: direct convolution loops written against the
    // ONNX Conv spec (NCHW, [M,C,kH,kW], explicit pads), NOT via Session
    val f = Onnx.fixtureConvModel
    def convRef(x: Array[Float], c: Int, h: Int, w: Int,
        wt: Array[Float], bs: Array[Float], m: Int,
        kh: Int, kw: Int, pad: Int): (Array[Float], Int, Int) = {
      val oh = h + 2 * pad - kh + 1; val ow = w + 2 * pad - kw + 1
      val out = new Array[Float](m * oh * ow)
      for (fo <- 0 until m; oy <- 0 until oh; ox <- 0 until ow) {
        var acc = bs(fo)
        for (ci <- 0 until c; ky <- 0 until kh; kx <- 0 until kw) {
          val iy = oy - pad + ky; val ix = ox - pad + kx
          if (iy >= 0 && iy < h && ix >= 0 && ix < w)
            acc += x((ci * h + iy) * w + ix) *
              wt(((fo * c + ci) * kh + ky) * kw + kx)
        }
        out((fo * oh + oy) * ow + ox) = acc
      }
      (out, oh, ow)
    }
    def reluRef(x: Array[Float]) = x.map(v => if (v > 0f) v else 0f)
    def poolRef(x: Array[Float], c: Int, h: Int, w: Int)
        : (Array[Float], Int, Int) = {
      val oh = h / 2; val ow = w / 2
      val out = new Array[Float](c * oh * ow)
      for (ci <- 0 until c; oy <- 0 until oh; ox <- 0 until ow) {
        var mx = Float.NegativeInfinity
        for (ky <- 0 until 2; kx <- 0 until 2) {
          val v = x((ci * h + oy * 2 + ky) * w + ox * 2 + kx)
          if (v > mx) mx = v
        }
        out((ci * oh + oy) * ow + ox) = mx
      }
      (out, oh, ow)
    }
    def ref(img: Array[Float]): Array[Float] = {
      val (c1, h1, w1) = convRef(img, 1, 8, 8,
        f.inits("w1").data, f.inits("b1").data, 4, 3, 3, 1)
      val (p1, hp1, wp1) = poolRef(reluRef(c1), 4, h1, w1)
      val (c2, h2, w2) = convRef(p1, 4, hp1, wp1,
        f.inits("w2").data, f.inits("b2").data, 8, 3, 3, 1)
      val (p2, _, _) = poolRef(reluRef(c2), 8, h2, w2)
      val w3 = f.inits("w3").data; val b3 = f.inits("b3").data
      Array.tabulate(4) { k =>
        var acc = 0.0f
        for (i <- 0 until 32) acc += p2(i) * w3(k * 32 + i)
        acc + b3(k)
      }
    }
    val sess = new Onnx.Session(Onnx.parse(committedCnnBytes))
    val inputs = Seq(
      Array.fill(64)(0.0f),
      Array.tabulate(64)(i => i.toFloat / 64f),
      Array.tabulate(64)(i => ((i * 37) % 11 - 5).toFloat / 4f),
      Array.tabulate(64)(i => math.sin(i.toDouble).toFloat))
    val got = sess.run(inputs.map(_.clone).toArray)
    inputs.zip(got).foreach { case (x, g) =>
      assert(java.util.Arrays.equals(g, ref(x)),
        s"mismatch: got ${g.mkString(",")} want ${ref(x).mkString(",")}")
    }
  }

  test("batched NCHW run equals per-row runs (conv path)") {
    val sess = Onnx.cnnSession
    val rows = Array.tabulate(5)(r =>
      Array.tabulate(64)(j => ((r * 64 + j) * 17 % 29).toFloat / 7f))
    val batched = sess.run(rows)
    val single = rows.map(r => sess.run(Array(r)).head)
    batched.zip(single).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("MaxPool padding is ignored (-inf), strided output shape correct") {
    // 1×1×3×3 input, 2×2 pool, stride 2, pads 1 on all sides → 2×2 out:
    // each window sees only the in-bounds cells
    val m = Onnx.Model(8L, 13L, "graft", "pool_pad",
      "x", Seq(-1L, 1L, 3L, 3L), "y", Seq(-1L, 1L, 2L, 2L),
      nodes = Seq(Onnx.Node("MaxPool", Seq("x"), Seq("y"),
        attrIs = Map("kernel_shape" -> Seq(2L, 2L),
          "strides" -> Seq(2L, 2L), "pads" -> Seq(1L, 1L, 1L, 1L)))),
      inits = Map.empty, initOrder = Seq.empty)
    val x = Array.tabulate(9)(i => (i + 1).toFloat) // 1..9 row-major
    val y = new Onnx.Session(m).run(Array(x)).head
    // windows: {1},{2,3},{4,7},{5,6,8,9} → maxes 1,3,7,9
    assert(y.toSeq == Seq(1f, 3f, 7f, 9f))
  }

  test("smokeCnnLogits is deterministic and class-discriminating") {
    val t = Array.tabulate(64)(i => (i % 7).toDouble / 7.0)
    val a = Onnx.smokeCnnLogits(t)
    val b = Onnx.smokeCnnLogits(t)
    assert(a.sameElements(b) && a.length == 4)
    val preds = (0 until 48).map { s =>
      val lg = Onnx.smokeCnnLogits(Array.tabulate(64)(j =>
        ((s * 64 + j) * 41 % 255).toDouble / 255.0))
      lg.indexOf(lg.max)
    }
    assert(preds.distinct.size > 1)
  }

  test("smokeLogits is deterministic and class-discriminating") {
    val a = Onnx.smokeLogits(Array(10.0, 20.0, 30.0, 15.0, 0.0, 255.0, 40.0, 7.0))
    val b = Onnx.smokeLogits(Array(10.0, 20.0, 30.0, 15.0, 0.0, 255.0, 40.0, 7.0))
    assert(a.sameElements(b))
    assert(a.length == 4)
    // distinct feature vectors should not all collapse to one argmax
    val preds = (0 until 32).map { s =>
      val lg = Onnx.smokeLogits(Array.tabulate(8)(j =>
        ((s * 8 + j) * 41 % 255).toDouble))
      lg.indexOf(lg.max)
    }
    assert(preds.distinct.size > 1)
  }
}
