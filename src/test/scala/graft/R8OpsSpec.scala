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

  test("geo_solar_angles: spherical-law elevation bound and noon identity") {
    val df = run("geo_solar_angles").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      val el = r.getAs[Double]("elev_deg")
      val dc = r.getAs[Double]("decl_deg")
      assert(el >= -90.001 && el <= 90.001)
      assert(dc >= -23.441 && dc <= 23.441)
      assert(r.getAs[Boolean]("daylight") == (el > 0))
    }
  }

  test("geo_brightness_temp: Planck inversion is monotone in radiance") {
    val rows = run("geo_brightness_temp").orderBy(col("radiance")).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("tb_k") <= b.getAs[Double]("tb_k"))
      case _ => ()
    }
    // imperative recompute of one pixel
    val r = rows.head
    val l = r.getAs[Double]("radiance")
    val tb = (3698.19 / math.log(202263.0 / l + 1.0) - 0.5) / 0.9991
    assert(math.abs(r.getAs[Double]("tb_k") - tb) <= 0.005 + 1e-9)
  }

  test("geo_parallax_correct: shift equals height over tan(elevation)") {
    val rows = run("geo_parallax_correct").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val el = math.toRadians(r.getAs[Double]("elev_deg"))
      val want = r.getAs[Double]("cloud_km") / math.tan(el)
      assert(r.getAs[Double]("elev_deg") > 15.0)
      assert(math.abs(r.getAs[Double]("shift_km") - want) < 0.05)
    }
  }

  test("geo_fence_crossings: brute-force witness for one user") {
    val df = run("geo_fence_crossings").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    val pts = Tables.events(spark, sf).filter(col("user_id") === u)
      .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast("double")
        + col("value") / 1000.0)
      .withColumn("lon", (col("event_id") * 73 % 360 - 180).cast("double")
        + col("value") / 2000.0)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(col("event_id"),
        floor(col("lon") * 100000).cast("long"),
        floor(col("lat") * 100000).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val fences = (0L until 25L).map { k =>
      (k, (k * 41 % 140 - 70) * 100000, (k * 89 % 360 - 180) * 100000,
        (k * 59 % 140 - 70) * 100000, (k * 67 % 360 - 180) * 100000)
    }
    def o(ax: Long, ay: Long, bx: Long, by: Long, cx: Long, cy: Long): Long =
      java.lang.Long.signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
    val want = (for {
      Array((e1, px, py), (e2, qx, qy)) <- pts.sliding(2).toSeq.collect {
        case a: Array[(Long, Long, Long)] if a.length == 2 => a }
      (f, ax, ay, bx, by) <- fences
      if o(px, py, qx, qy, ax, ay) * o(px, py, qx, qy, bx, by) < 0 &&
        o(ax, ay, bx, by, px, py) * o(ax, ay, bx, by, qx, qy) < 0
    } yield (e1, f)).toSet
    val got = df.filter(col("user_id") === u)
      .select(col("e_from"), col("fence"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Number]("fence").longValue)).toSet
    assert(got == want)
  }
}
