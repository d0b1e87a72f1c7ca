package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the R8 batch: sequence pattern matching,
  * same-value streaks, PMI collocations, basket lift.
  */
class R8OpsSpec extends SparkSpecBase {

  test("ts_pattern_match: every hit is a consecutive view-click-purchase") {
    val df = run("ts_pattern_match").cache()
    assert(df.count() > 0)
    // replay one user's sequence imperatively and compare hit starts
    val u = df.head.getAs[Long]("user_id")
    val seq = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("event_id"), col("ts_sec"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val want = seq.sliding(3).collect {
      case Array((e1, t1, "view"), (_, _, "click"), (e3, t3, "purchase"))
        if t3 - t1 <= 172800 => e1
    }.toSet
    val got = df.filter(col("user_id") === u)
      .select(col("e_view")).collect().map(_.getLong(0)).toSet
    assert(got == want)
  }

  test("ts_streaks: reported streak really is the longest run") {
    val df = run("ts_streaks").cache()
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(df.count() == users)
    val u = df.head.getAs[Long]("user_id")
    val types = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("event_type")).collect().map(_.getString(0))
    var best = 0; var cur = 1
    for (i <- 1 until types.length) {
      if (types(i) == types(i - 1)) cur += 1 else cur = 1
      best = math.max(best, cur)
    }
    best = math.max(best, if (types.nonEmpty) 1 else 0)
    assert(df.filter(col("user_id") === u).head
      .getAs[Long]("streak_len") == best)
  }

  test("doc_collocations: lift is the exact count ratio, sorted desc") {
    val df = run("doc_collocations").cache()
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 50)
    // independent corpus bigram total: sum over docs of (tokens - 1)
    val nBig = Tables.t(spark, sf, "documents")
      .select((size(filter(split(col("text"), " "), t => t =!= "")) - 1)
        .as("nb"))
      .agg(sum(greatest(col("nb"), lit(0)))).head.getLong(0)
    rows.foreach { r =>
      val lift = r.getAs[Double]("lift")
      val expect = r.getAs[Long]("c12").toDouble * nBig /
        (r.getAs[Long]("c1") * r.getAs[Long]("c2"))
      assert(r.getAs[Long]("c12") >= 5)
      assert(lift == expect)
    }
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }

  test("q48_basket_lift: pair support never exceeds either single support") {
    val df = run("q48_basket_lift").cache()
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_ab") <= r.getAs[Long]("c_a"))
      assert(r.getAs[Long]("c_ab") <= r.getAs[Long]("c_b"))
      assert(r.getAs[String]("brand_a") < r.getAs[String]("brand_b"))
    }
  }
}
