package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the corpus-assembly operators (span dedup,
  * sequence packing, mixture weighting) beyond the driver's hash gate.
  */
class DocPipelineSpec extends SparkSpecBase {

  test("doc_paragraph_dedup: conservation + first-occurrence-kept") {
    val rows = run("doc_paragraph_dedup").collect()
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    assert(rows.length == docs.size)
    // recompute paragraphs driver-side
    def paras(t: String): Seq[String] =
      t.split(" ", -1).grouped(10).map(_.mkString(" ")).toSeq
    val all = docs.toSeq.flatMap { case (id, t) =>
      paras(t).zipWithIndex.map { case (p, i) => (id, i, p) }
    }
    val nDistinct = all.map(_._3).distinct.size
    val got = rows.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_paras"), r.getAs[Long]("n_dup"),
        r.getAs[String]("clean_text"))).toMap
    // global conservation: dropped = total - distinct
    assert(got.values.map(_._1).sum == all.size)
    assert(got.values.map(_._2).sum == all.size - nDistinct)
    // kept paragraph = the one with the lowest (doc_id, para_idx)
    val firstOwner = all.groupBy(_._3).map { case (p, os) =>
      p -> os.map(o => (o._1, o._2)).min
    }
    got.foreach { case (id, (_, nDup, clean)) =>
      val mine = paras(docs(id))
      val kept = mine.zipWithIndex
        .filter { case (p, i) => firstOwner(p) == (id, i) }.map(_._1)
      assert(clean == kept.mkString(" "), s"doc $id reassembly")
      assert(nDup == mine.size - kept.size)
      // an undeduped doc round-trips to its original text
      if (nDup == 0) assert(clean == docs(id))
    }
  }

  test("doc_span_dedup: dup spans bounded by totals, fractions in range") {
    val rows = run("doc_span_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_spans")
      val dup = r.getAs[Long]("n_dup_spans")
      val f = r.getAs[Double]("dup_frac")
      assert(n >= 1L && dup >= 0L && dup <= n)
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Boolean]("flagged") == (f >= 0.2))
    }
  }

  test("doc_span_dedup: a shared span marks both documents") {
    // every flagged doc must share at least one 32-char span with some
    // other doc — recompute one example directly
    val docs = Tables.t(spark, sf, "documents")
    val w = docs.filter(length(col("text")) >= 32)
      .select(col("doc_id"),
        explode(expr("sequence(1, length(text) - 31, 8)")).as("i"), col("text"))
      .select(col("doc_id"), expr("substring(text, i, 32)").as("span"))
    val cross = w.as("a").join(w.as("b"),
        col("a.span") === col("b.span") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("doc_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val withDups = run("doc_span_dedup").filter(col("n_dup_spans") > 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(withDups == cross)
  }

  test("doc_pack_sequences: packing conserves tokens and fills sequences") {
    val seqs = run("doc_pack_sequences").collect()
    assert(seqs.nonEmpty)
    seqs.foreach { r =>
      assert(r.getAs[Long]("seq_id") >= 0L)
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("n_tokens") >= 1L)
    }
    // conservation: per source, packed tokens == corpus tokens
    val packed = run("doc_pack_sequences")
      .groupBy("source").agg(sum("n_tokens").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val corpus = Tables.t(spark, sf, "documents")
      .groupBy("source")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(packed == corpus)
  }

  test("doc_pack_sequences: all but the final sequence of a source start-fill past the boundary") {
    // doc assignment is by starting offset, so sequence k exists only if
    // some doc starts in [k*2048, (k+1)*2048) — seq ids per source are
    // dense up to the last one
    val bySource = run("doc_pack_sequences").collect()
      .groupBy(_.getAs[String]("source"))
    bySource.foreach { case (src, rows) =>
      val ids = rows.map(_.getAs[Long]("seq_id")).sorted
      assert(ids.head == 0L, s"$src first sequence id ${ids.head}")
      assert(ids.distinct.length == ids.length)
    }
  }

  test("doc_mixture_weights: shares sum to ~1, allocation within budget") {
    val rows = run("doc_mixture_weights").collect()
    assert(rows.nonEmpty)
    val shares = rows.map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
    shares.foreach(sh => assert(sh > 0.0 && sh <= 1.0))
    val alloc = rows.map(_.getAs[Long]("target_docs")).sum
    assert(alloc <= 100000L && alloc > 100000L - rows.length,
      s"floor allocation $alloc out of range")
    // temperature flattens: smaller sources get a boosted share relative
    // to their raw proportion, bigger ones a damped share
    val n = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    rows.foreach { r =>
      val raw = r.getAs[Long]("n_docs") / n
      val sh = r.getAs[Double]("share")
      if (raw < 1.0 / rows.length) assert(sh >= raw - 1e-12)
    }
  }
}
