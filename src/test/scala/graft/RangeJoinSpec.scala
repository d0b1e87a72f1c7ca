package graft

import graft.plans.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpecBase {

  test("native range join equals the DataFrame band-join formulation") {
    spark.catalog.clearCache()
    val native = run("ts_range_native")
    val ref = run("ts_range_join")
    assert(native.exceptAll(ref).count() == 0 && ref.exceptAll(native).count() == 0)
  }

  test("physical plan: RangeJoinExec with clustered+sorted children") {
    val o = Tables.t(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val e = Tables.events(spark, sf).select(col("user_id"), col("event_id"), col("value"))
    val df = RangeJoin.join(o, e, o("o_custkey"), e("user_id"),
      o("o_totalprice") / lit(1000.0) - lit(20.0),
      o("o_totalprice") / lit(1000.0) + lit(20.0), e("value"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"), plan)
    assert(plan.contains("Sort"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
  }

  test("band edges are inclusive; non-overlapping rows drop out") {
    import spark.implicits._
    val l = Seq((1L, 10.0, 20.0), (1L, 15.0, 16.0), (2L, 0.0, 5.0))
      .toDF("k", "lo", "hi")
    val r = Seq((1L, 10.0), (1L, 16.0), (1L, 20.0), (1L, 25.0), (2L, 7.0))
      .toDF("rk", "v")
    val out = RangeJoin.join(l, r, l("k"), r("rk"), l("lo"), l("hi"), r("v"))
      .select("k", "lo", "v").orderBy("k", "lo", "v").collect()
      .map(x => (x.getLong(0), x.getDouble(1), x.getDouble(2)))
    assert(out.toSeq == Seq((1L, 10.0, 10.0), (1L, 10.0, 16.0),
      (1L, 10.0, 20.0), (1L, 15.0, 16.0)))
  }

  test("null keys never match (inner-join SQL semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), 10.0, 20.0), (Option.empty[Long], 0.0, 100.0))
      .toDF("k", "lo", "hi")
    val r = Seq((Some(1L), 15.0), (Option.empty[Long], 50.0)).toDF("rk", "v")
    val out = RangeJoin.join(l, r, l("k"), r("rk"), l("lo"), l("hi"), r("v"))
      .select("k", "v").collect().map(x => (x.getLong(0), x.getDouble(1)))
    // only the non-null-keyed pair joins; null keys (which compare equal
    // under RowOrdering) must not match each other
    assert(out.toSeq == Seq((1L, 15.0)))
  }

  test("later narrower band does not see evicted or over-edge rows") {
    import spark.implicits._
    // same key, increasing lo, decreasing hi: the held buffer must re-check
    // the hi edge per left row
    val l = Seq((1L, 0.0, 100.0), (1L, 50.0, 60.0)).toDF("k", "lo", "hi")
    val r = Seq((1L, 10.0), (1L, 55.0), (1L, 90.0)).toDF("rk", "v")
    val out = RangeJoin.join(l, r, l("k"), r("rk"), l("lo"), l("hi"), r("v"))
      .select("lo", "v").orderBy("lo", "v").collect()
      .map(x => (x.getDouble(0), x.getDouble(1)))
    assert(out.toSeq == Seq((0.0, 10.0), (0.0, 55.0), (0.0, 90.0), (50.0, 55.0)))
  }

  test("agrees with a brute-force crossJoin filter on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val l = Seq.fill(60)((rnd.nextInt(5).toLong, rnd.nextDouble() * 100))
      .map { case (k, c) => (k, c - 5.0, c + 5.0) }.toDF("k", "lo", "hi")
    val r = Seq.fill(200)((rnd.nextInt(5).toLong, rnd.nextDouble() * 100))
      .toDF("rk", "v")
    val native = RangeJoin.join(l, r, l("k"), r("rk"), l("lo"), l("hi"), r("v"))
      .select("k", "lo", "v")
    val brute = l.join(r, l("k") === r("rk") && r("v") >= l("lo") && r("v") <= l("hi"))
      .select("k", "lo", "v")
    assert(native.exceptAll(brute).count() == 0
      && brute.exceptAll(native).count() == 0)
  }
}
