package graft

import graft.streaming.Streams
import graft.streaming.Streams.Ev
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Semantics checks for the seventh R8 batch: Kaplan-Meier survival,
  * error ellipses, streaming KMV distinct.
  */
class R8gOpsSpec extends SparkSpecBase {

  test("ts_survival: curve is monotone nonincreasing in (0, 1]") {
    val df = run("ts_survival").cache()
    assert(df.count() > 0)
    val rows = df.collect()
    var prev = 1.0
    rows.foreach { r =>
      val sv = r.getAs[Double]("survival")
      assert(sv > 0.0 && sv <= prev + 1e-9)
      assert(r.getAs[Long]("d") > 0 && r.getAs[Long]("d") < r.getAs[Long]("n_risk"))
      prev = sv
    }
    // n_risk is nonincreasing as duration grows
    val risks = rows.map(_.getAs[Long]("n_risk"))
    risks.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0) >= w(1))
    }
  }

  test("geo_error_ellipse: eigen identities vs an imperative covariance") {
    val df = run("geo_error_ellipse").cache()
    assert(df.count() > 0)
    val u = df.head.getAs[Long]("user_id")
    val pts = Tables.events(spark, sf).filter(col("user_id") === u)
      .withColumn("lat", (col("user_id") * 37 % 140 - 70).cast("double")
        + col("value") / 1000.0)
      .withColumn("lon", (col("event_id") * 73 % 360 - 180).cast("double")
        + col("value") / 2000.0)
      .select(floor(col("lat") * 100000).cast("long"),
        floor(col("lon") * 100000).cast("long"))
      .collect().map(r => (r.getLong(0).toDouble, r.getLong(1).toDouble))
    val n = pts.length
    val (mx, my) = (pts.map(_._1).sum / n, pts.map(_._2).sum / n)
    val cxx = pts.map(p => (p._1 - mx) * (p._1 - mx)).sum / (n - 1) / 1e10
    val cyy = pts.map(p => (p._2 - my) * (p._2 - my)).sum / (n - 1) / 1e10
    val cxy = pts.map(p => (p._1 - mx) * (p._2 - my)).sum / (n - 1) / 1e10
    val r = df.filter(col("user_id") === u).head
    val (l1, l2) = (r.getAs[Double]("var_major"), r.getAs[Double]("var_minor"))
    // eigenvalue identities: sum = trace, product = determinant
    assert(math.abs(l1 + l2 - (cxx + cyy)) < 1e-6 * math.abs(cxx + cyy) + 1e-12)
    assert(math.abs(l1 * l2 - (cxx * cyy - cxy * cxy))
      < 1e-6 * math.abs(cxx * cyy) + 1e-9)
    assert(l1 >= l2)
  }

  test("stream_kmv_distinct: bounded state, exact below k, merge-stable") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = Streams.kmvDistinctStream(in.toDS(), k = 8)
      .writeStream.format("memory").queryName("kmv_out")
      .outputMode("update").start()
    // 5 distinct users (< k): estimate must be exact
    in.addData((1 to 5).map(i => Ev(i, i * 100L, i % 5, "t", 1.0)): _*)
    q.processAllAvailable()
    // 40 distinct users (> k): estimate within coarse KMV error of 40
    in.addData((1 to 40).map(i => Ev(100 + i, i * 100L, i, "t", 1.0)): _*)
    q.processAllAvailable()
    val rows = spark.table("kmv_out").collect()
      .filter(_.getAs[String]("event_type") == "t")
      .sortBy(_.getAs[Long]("n_seen"))
    q.stop()
    assert(rows.head.getAs[Double]("estimate") == 5.0)
    val last = rows.last
    assert(last.getAs[Int]("n_kept") == 8)
    val est = last.getAs[Double]("estimate")
    assert(est > 10 && est < 160) // k=8 sketch: very coarse, but sane
  }

  test("ts_markov_transition: rows are a stochastic matrix") {
    val df = run("ts_markov_transition").cache()
    assert(df.count() > 0)
    df.collect().groupBy(_.getAs[String]("from_type")).foreach {
      case (_, rows) =>
        assert(math.abs(rows.map(_.getAs[Double]("p")).sum - 1.0) < 1e-9)
        assert(rows.count(_.getAs[Boolean]("modal")) == 1)
        val maxN = rows.map(_.getAs[Long]("n")).max
        rows.filter(_.getAs[Boolean]("modal"))
          .foreach(r => assert(r.getAs[Long]("n") == maxN))
    }
  }

  test("ts_sliding_distinct: brute-force recount for three days") {
    val df = run("ts_sliding_distinct").cache()
    assert(df.count() > 0)
    val days = Tables.events(spark, sf)
      .select(col("user_id"), expr("ts_sec div 86400").as("day"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = df.collect().map(r =>
      r.getAs[Long]("report_day") -> r.getAs[Long]("wau")).toMap
    got.keys.toSeq.sorted.take(3).foreach { rd =>
      val brute = days.filter { case (_, d) => d >= rd - 6 && d <= rd }
        .map(_._1).distinct.length
      assert(got(rd) == brute)
    }
  }

  test("q52_yoy_growth: growth recomputes from the two revenue columns") {
    val df = run("q52_yoy_growth").cache()
    assert(df.count() > 0)
    df.collect().foreach { r =>
      val g = (r.getAs[Double]("rev") - r.getAs[Double]("rev_prev")) /
        r.getAs[Double]("rev_prev")
      assert(math.abs(r.getAs[Double]("yoy_growth") - g) < 1e-9)
      assert(r.getAs[Int]("mo") >= 1 && r.getAs[Int]("mo") <= 12)
    }
  }

  test("geo_advect_step: mass is conserved up to boundary outflow") {
    val df = run("geo_advect_step").cache()
    assert(df.count() > 0)
    // total interpolated mass can never exceed the source mass (weights
    // per departure point sum to 1; cells outside the occupied grid
    // contribute zero)
    val newMass = df.agg(sum(col("z_new"))).head.getDouble(0)
    val oldMass = df.agg(sum(col("z_old"))).head.getLong(0).toDouble
    val totalOld = Tables.events(spark, sf).count().toDouble
    assert(newMass <= totalOld + 1e-6)
    assert(oldMass <= totalOld + 1e-6)
    df.collect().foreach(r => assert(r.getAs[Double]("z_new") >= 0.0))
  }
}
