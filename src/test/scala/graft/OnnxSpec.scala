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
      if (n.opType == "Relu") n.copy(opType = "Sigmoid") else n))
    val e = intercept[UnsupportedOperationException] {
      new Onnx.Session(bad).run(Array(Array.fill(8)(1.0f)))
    }
    assert(e.getMessage.contains("Sigmoid"))
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
