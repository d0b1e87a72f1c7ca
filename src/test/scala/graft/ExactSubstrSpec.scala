package graft

import graft.operators.TextOps
import org.apache.spark.sql.functions._

/** doc_exact_substr — the full Lee-et-al ExactSubstr pass (stride-1
  * 50-char duplicated windows, maximal-span merge) — against a
  * brute-force reference on a seeded corpus, plus flag agreement with
  * the stride-8 approximation doc_span_dedup where both must agree.
  */
class ExactSubstrSpec extends SparkSpecBase {

  private val L = 50

  /** Unique non-repeating filler: every 7-char block distinct per
    * (doc, position) and LED by a doc-unique letter, so filler never
    * collides across or within docs — including the single characters
    * abutting a planted span (a shared boundary char would legitimately
    * extend the maximal span past the plant, as the first seed of this
    * spec demonstrated: two fillers both starting 'u1' grew a planted
    * 120-char span to 122).
    */
  private def filler(doc: Int, n: Int): String = {
    val sb = new StringBuilder
    val lead = ('a' + doc % 26).toChar
    var i = 0
    while (sb.length < n) { sb.append(f"$lead$doc%02dq$i%03d"); i += 1 }
    sb.substring(0, n)
  }

  private val shared = filler(90, 120) // 120-char cross-doc span
  private val sharedA = filler(91, 80) // two more spans, used twice
  private val sharedB = filler(92, 64)
  private val rep = filler(93, 60) // same-doc internal repeat

  private val corpus: Seq[(Long, String)] = Seq(
    0L -> (filler(0, 200) + shared + filler(10, 100)),
    1L -> (filler(1, 50) + shared + filler(11, 150)),
    2L -> filler(2, 400), // no duplication anywhere
    3L -> (rep + filler(3, 90) + rep + filler(13, 60)), // internal repeat
    4L -> (sharedA + filler(4, 120) + sharedB + filler(14, 40)),
    5L -> (filler(5, 70) + sharedA + filler(15, 130) + sharedB))

  /** Brute-force reference: multiset-count every L-gram, mark positions
    * whose gram occurs >= 2 times corpus-wide, merge islands (gap <= L),
    * report (n_windows, n_dup_windows, n_spans, dup_chars) per doc.
    */
  private def reference: Map[Long, (Long, Long, Long, Long)] = {
    val all = corpus.flatMap { case (id, t) =>
      (0 to t.length - L).map(i => (t.substring(i, i + L), id, i + 1L))
    }
    val cnt = all.groupBy(_._1).map { case (k, v) => k -> v.size }
    corpus.map { case (id, t) =>
      val pos = all.filter(w => w._2 == id && cnt(w._1) >= 2).map(_._3).sorted
      var spans = 0L; var chars = 0L
      var s = -1L; var last = -1L
      pos.foreach { p =>
        if (s < 0) { s = p; last = p }
        else if (p - last <= L) last = p
        else { spans += 1; chars += last + L - 1 - s + 1; s = p; last = p }
      }
      if (s >= 0) { spans += 1; chars += last + L - 1 - s + 1 }
      id -> ((t.length - L + 1).toLong, pos.size.toLong, spans, chars)
    }.toMap
  }

  test("stride-1 windows + span merge match the brute-force reference") {
    import spark.implicits._
    val dd = corpus.toDF("doc_id", "text")
    val got = TextOps.exactSubstrOf(dd).collect().map { r =>
      r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("dup_chars")))
    }.toMap
    val ref = reference
    assert(got.keySet == ref.keySet)
    ref.foreach { case (id, exp) =>
      assert(got(id) == exp, s"doc $id: got ${got(id)} expected $exp")
    }
    // the seeded geometry actually exercises the claims:
    val (_, dw0, sp0, ch0) = ref(0L)
    assert(sp0 == 1L && ch0 == 120L && dw0 == (120 - L + 1).toLong,
      "planted 120-char span must surface as ONE maximal span, exactly")
    assert(ref(2L)._2 == 0L, "unique doc must carry zero dup windows")
    assert(ref(3L)._3 == 2L, "same-doc repeat must count (occurrences >= 2)")
    assert(ref(4L)._3 == 2L, "gap > L must split into two islands")
  }

  test("flag agreement with doc_span_dedup on exact-duplicate documents") {
    // corpus where the two operators must agree: identical twin docs
    // (dup_frac 1.0 both) and unique docs (0.0 both)
    val dir = java.nio.file.Files.createTempDirectory("exsub").toString
    import spark.implicits._
    val twin = filler(40, 500)
    Seq(
      (100L, twin), (101L, twin),
      (102L, filler(41, 500)), (103L, filler(42, 500)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def flags(q: String): Map[Long, Boolean] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("flagged")).toMap
    val exact = flags("doc_exact_substr")
    val approx = flags("doc_span_dedup")
    Seq(100L, 101L).foreach { id =>
      assert(exact(id) && approx(id), s"twin doc $id must flag in both")
    }
    Seq(102L, 103L).foreach { id =>
      assert(!exact(id) && !approx(id), s"unique doc $id must flag in neither")
    }
  }
}
