package graft

import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpecBase {

  test("mm_tile: tiles cover every image completely") {
    val tile = 224
    val rows = run("mm_tile").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { ts =>
      val w = ts.head.getAs[Long]("img_w")
      val h = ts.head.getAs[Long]("img_h")
      // tiles stay in bounds
      ts.foreach { t =>
        assert(t.getAs[Long]("tile_x") >= 0 && t.getAs[Long]("tile_x") + tile <= w)
        assert(t.getAs[Long]("tile_y") >= 0 && t.getAs[Long]("tile_y") + tile <= h)
      }
      // right/bottom edges are reached
      assert(ts.exists(t => t.getAs[Long]("tile_x") + tile == w))
      assert(ts.exists(t => t.getAs[Long]("tile_y") + tile == h))
    }
  }

  test("mm_blob_meta: sha256 is stable and 64 hex chars") {
    val rows = run("mm_blob_meta").limit(5).collect()
    rows.foreach(r => assert(r.getAs[String]("sha256").matches("[0-9a-f]{64}")))
  }

  test("mm_batch_infer: every payload scored once, batches bounded at 32") {
    val rows = run("mm_batch_infer").collect()
    assert(rows.length == Tables.t(spark, sf, "documents").count())
    rows.foreach { r =>
      val n = r.getAs[Int]("batch_n")
      assert(n >= 1 && n <= 32)
      assert(r.getAs[Int]("batch_pos") < n)
      val cls = r.getAs[Int]("pred_class")
      assert(cls >= 0 && cls < 4)
      (0 until 4).foreach(k => assert(r.getAs[Double](s"logit$k") >= 0.0))
    }
    // deterministic across runs
    val again = run("mm_batch_infer").collect()
    assert(rows.map(_.getAs[Int]("pred_class")).toSeq
      == again.map(_.getAs[Int]("pred_class")).toSeq)
  }

  test("mm_feature_stub: deterministic 8-dim features") {
    def grab() = run("mm_feature_stub").collect().map(r =>
      r.getAs[Long]("doc_id") -> (0 until 8).map(k => r.getAs[Double](s"f$k"))).toMap
    val a = grab()
    val b = grab()
    assert(a == b)
    assert(a.values.forall(_.length == 8))
  }
}
