package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the eighth R8 batch: convoy detection and
  * fixed-frequency spectral power.
  */
class R8hOpsSpec extends SparkSpecBase {

  test("geo_convoys: runs really are >=3 consecutive shared-corridor days") {
    val df = run("geo_convoys").cache()
    df.collect().foreach { r =>
      assert(r.getAs[Long]("len_days") >= 3)
      assert(r.getAs[Long]("u1") < r.getAs[Long]("u2"))
    }
    if (df.count() > 0) {
      val r = df.head
      val (u1, u2) = (r.getAs[Long]("u1"), r.getAs[Long]("u2"))
      def corridors(u: Long) = Tables.events(spark, sf)
        .filter(col("user_id") === u)
        .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast("double")
          + col("value") / 1000.0)
        .withColumn("dy", expr("ts_sec div 86400"))
        .orderBy(col("ts_sec"), col("event_id"))
        .select(col("dy"), floor(col("lat")).cast("long"))
        .collect().map(x => (x.getLong(0), x.getLong(1)))
        .groupBy(_._1).map { case (dy, v) => dy -> v.last._2 }
      val (c1, c2) = (corridors(u1), corridors(u2))
      val start = r.getAs[Long]("start_day")
      val len = r.getAs[Long]("len_days")
      (start until start + len).foreach { dy =>
        assert(c1.contains(dy) && c2.contains(dy) && c1(dy) == c2(dy))
      }
    }
  }

  test("ts_dft_power: sinusoid injected at a known period dominates") {
    import spark.implicits._
    // synthetic check of the same arithmetic: a pure daily sinusoid
    // sampled hourly for a week has its power at T=86400, not T=43200
    val n = 24 * 7
    val xs = (0 until n).map { h =>
      val t = h * 3600L
      (t, math.round(100.0 * math.sin(2 * math.Pi * t / 86400.0)))
    }
    def power(period: Long): Double = {
      val rs = xs.map { case (t, v) => (t, v.toDouble * n - xs.map(_._2).sum) }
      val cs = rs.map { case (t, r) =>
        math.floor(r * math.cos(math.toRadians((t % period).toDouble
          * (360.0 / period))) * 1024.0)
      }.sum
      val sn = rs.map { case (t, r) =>
        math.floor(r * math.sin(math.toRadians((t % period).toDouble
          * (360.0 / period))) * 1024.0)
      }.sum
      val den = rs.map { case (_, r) => math.floor(r * r) }.sum
      (cs * cs + sn * sn) / (1048576.0 * den)
    }
    assert(power(86400L) > 10 * power(43200L))
    // and the real operator emits exactly 3 periods per entity with one
    // dominant flag
    val df = run("ts_dft_power").cache()
    assert(df.count() > 0)
    df.collect().groupBy(_.getAs[Long]("user_id")).foreach {
      case (_, rows) =>
        assert(rows.length == 3)
        assert(rows.count(_.getAs[Boolean]("dominant")) == 1)
        rows.foreach(r => assert(r.getAs[Double]("power") >= 0.0))
    }
  }

  test("ts_var_cvar: tail mean never exceeds the quantile") {
    val df = run("ts_var_cvar").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      assert(r.getAs[Double]("cvar_5pct") <= r.getAs[Double]("var_5pct") + 1e-9)
      assert(r.getAs[Long]("n_changes") >= 20)
    }
    // imperative recompute for one entity
    val u = df.head.getAs[Long]("user_id")
    val chgs = Tables.events(spark, sf).filter(col("user_id") === u)
      .orderBy(col("ts_sec"), col("event_id"))
      .select(expr("CAST(round(value*100) AS BIGINT)"))
      .collect().map(_.getLong(0))
      .sliding(2).collect { case Array(a, b) => b - a }.toArray.sorted
    val k = math.max(1, chgs.length * 5 / 100)
    val tail = chgs.take(k)
    val got = df.filter(col("user_id") === u).head
    assert(got.getAs[Double]("var_5pct") == tail.max / 100.0)
    assert(math.abs(got.getAs[Double]("cvar_5pct")
      - tail.sum.toDouble / (k * 100.0)) < 1e-9)
  }

  test("q53_abc_analysis: classes partition parts; A holds <=80% + one part") {
    val df = run("q53_abc_analysis").cache()
    val rows = df.collect().map(r => r.getAs[String]("cls") ->
      (r.getAs[Long]("n_parts"), r.getAs[Double]("revenue"))).toMap
    val nParts = Tables.t(spark, sf, "lineitem")
      .select(col("l_partkey")).distinct().count()
    assert(rows.values.map(_._1).sum == nParts)
    val total = rows.values.map(_._2).sum
    // the A class stops at the first part CROSSING 80%: its revenue is
    // at most 80% of total plus that one boundary part
    assert(rows("A")._2 <= 0.8 * total + rows("A")._2 / rows("A")._1 + 1.0)
    assert(rows.contains("C"))
    // within-class revenue ordering: every A part out-earns the best C
    assert(df.filter(col("cls") === "A").head.getAs[Double]("min_part_rev")
      >= df.filter(col("cls") === "C").head.getAs[Double]("min_part_rev"))
  }
}
