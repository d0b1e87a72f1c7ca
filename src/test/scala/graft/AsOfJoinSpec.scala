package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {

  test("native as-of join equals the union-window formulation") {
    spark.catalog.clearCache()
    val native = run("ts_asof_native")
    val ref = run("ts_asof_join")
    assert(native.exceptAll(ref).count() == 0 && ref.exceptAll(native).count() == 0)
  }

  test("physical plan: AsOfJoinExec with clustered+sorted children") {
    val e = Tables.events(spark, sf).select(col("user_id"), col("event_id"), col("ts_sec"))
    val o = Tables.t(spark, sf, "orders").select(col("o_custkey"),
      col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("o_sec"))
    val df = AsOf.join(e, o, e("user_id"), o("o_custkey"),
      e("ts_sec"), o("o_sec"), o("o_orderkey"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("agrees with brute-force latest-at-or-before on random data (seeded sweep)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (1 to 4).foreach { round =>
      val nl = 30 + rng.nextInt(40); val nr = 20 + rng.nextInt(50)
      val l = Seq.fill(nl)((rng.nextInt(6).toLong, rng.nextInt(100).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val r = Seq.fill(nr)((rng.nextInt(6).toLong, rng.nextInt(100).toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val lDf = l.toDF("k", "t", "lid")
      val rDf = r.toDF("rk", "rt", "pay")
      val got = AsOf.join(lDf, rDf, lDf("k"), rDf("rk"),
        lDf("t"), rDf("rt"), rDf("pay"))
        .select("lid", "pay").collect()
        .map(x => x.getLong(0) -> (if (x.isNullAt(1)) -1L else x.getLong(1)))
        .toMap
      val exp = l.map { case (k, t, lid) =>
        val cands = r.filter(x => x._1 == k && x._2 <= t)
        // greatest (rt, tiebreak) wins; -1 = no match (null payload)
        lid -> (if (cands.isEmpty) -1L
          else cands.maxBy(x => (x._2, x._3))._3)
      }.toMap
      assert(got == exp, s"sweep round $round (nl=$nl nr=$nr)")
    }
  }

  test("left rows with no prior right row get nulls (left-outer)") {
    import spark.implicits._
    val l = Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "t")
    val r = Seq((1L, 15L, 100L), (3L, 1L, 300L)).toDF("rk", "rt", "payload")
    val out = AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt"), r("payload"))
      .orderBy("k", "t").collect()
    assert(out.length == 3)
    assert(out(0).isNullAt(4))                         // (1,10): no rt<=10
    assert(out(1).getAs[Long]("payload") == 100L)      // (1,20): rt=15
    assert(out(2).isNullAt(4))                         // (2,5): key absent
  }

  test("null keys and null times never match (SQL join semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L)), (None, Some(10L)), (Some(1L), None))
      .toDF("k", "t")
    val r = Seq((Some(1L), Some(5L), 100L), (Option.empty[Long], Some(1L), 900L),
      (Some(1L), Option.empty[Long], 800L)).toDF("rk", "rt", "payload")
    val out = AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt"), r("payload"))
      .collect()
    assert(out.length == 3)
    val byRow = out.map(x => (Option(x.get(0)), Option(x.get(1))) ->
      Option(x.getAs[Any]("payload"))).toMap
    // valid left row matches only the valid right row (not the null-key
    // or null-time rows, which previously unboxed to epoch 0 / matched)
    assert(byRow((Some(1L), Some(10L))) == Some(100L))
    // null-keyed / null-timed left rows extend with nulls
    assert(byRow((None, Some(10L))).isEmpty)
    assert(byRow((Some(1L), None)).isEmpty)
  }

  test("computed (non-attribute) time expressions are accepted") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 6L, 42L)).toDF("rk", "rt", "pay")
    // shift both times by arithmetic: rt*2=12 > t=10, rt*2-10=2 <= 10
    val out = AsOf.join(l, r, l("k"), r("rk"),
      l("t"), r("rt") * lit(2) - lit(10), r("pay")).collect()
    assert(out.head.getAs[Long]("pay") == 42L)
  }

  test("time ties resolve to greatest tiebreak") {
    import spark.implicits._
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 10L, 7L), (1L, 10L, 9L), (1L, 10L, 8L)).toDF("rk", "rt", "pay")
    val out = AsOf.join(l, r, l("k"), r("rk"), l("t"), r("rt"), r("pay")).collect()
    assert(out.head.getAs[Long]("pay") == 9L)
  }
}
