package graft

import org.apache.spark.sql.functions._

class TimeSeriesSpec extends SparkSpecBase {

  test("ts_latest_per_key: one row per entity, at the max timestamp") {
    val df = run("ts_latest_per_key").cache()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(df.count() == users)
    val expected = Tables.events(spark, sf).groupBy("user_id")
      .agg(max("ts_sec").as("mx"))
    val joined = df.join(expected, "user_id")
      .filter(col("ts_sec") =!= col("mx")).count()
    assert(joined == 0)
  }

  test("ts_topn_per_key: values descending within each entity") {
    run("ts_topn_per_key").collect()
      .groupBy(_.getAs[Long]("user_id")).values.foreach { rs =>
        val vs = rs.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("value"))
        assert(vs.zip(vs.tail).forall { case (a, b) => a >= b })
      }
  }

  test("ts_sessionize: session event counts reconcile; gaps respected") {
    val df = run("ts_sessionize").cache()
    val total = df.agg(sum("n_events")).head.getLong(0)
    assert(total == Tables.events(spark, sf).count())
    // sessions of one user are disjoint, ordered, separated by > 1800s
    val rows = df.filter(col("user_id") === 3)
      .orderBy("session_id").collect()
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("start_sec") - a.getAs[Long]("end_sec") > 1800)
      case _ =>
    }
  }

  test("ts_asof_join: joined order is the latest at-or-before the event") {
    val df = run("ts_asof_join").cache()
    // spot-check with a brute-force join at tiny scale
    val ev = Tables.events(spark, sf).select(col("event_id"),
      col("user_id"), col("ts_sec"))
    val ord = Tables.t(spark, sf, "orders").select(col("o_custkey"),
      col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("o_sec"))
    val brute = ev.join(ord, col("user_id") === col("o_custkey")
        && col("o_sec") <= col("ts_sec"), "left")
      .groupBy("event_id").agg(max(struct(col("o_sec"), col("o_orderkey"))).as("m"))
      .select(col("event_id"), col("m.o_orderkey").as("exp_key"))
    val bad = df.join(brute, "event_id")
      .filter(coalesce(col("o_orderkey"), lit(-1L)) =!= coalesce(col("exp_key"), lit(-1L)))
      .count()
    assert(bad == 0)
  }

  test("ts_threshold_alarm: all alarms cross upward through 180") {
    run("ts_threshold_alarm").collect().foreach { r =>
      assert(r.getAs[Double]("value") >= 180.0 && r.getAs[Double]("prev_value") < 180.0)
    }
  }

  test("ts_covering_overpass: every covered record files under exactly one window") {
    val df = run("ts_covering_overpass").cache()
    assert(df.count() > 0)
    // rollup reconciles: assigned records never exceed the feed, cores ≤ totals
    assert(df.filter(col("n_core") > col("n_records")).count() == 0)
    val assigned = df.agg(sum("n_records")).head.getLong(0)
    val total = Tables.events(spark, sf).count()
    assert(assigned <= total)
    // every window's records lie inside its leeway-widened bounds
    assert(df.filter(col("first_rec_sec") < col("w_start") - 2700 ||
      col("last_rec_sec") > col("w_start") + 540 + 2700).count() == 0)
  }

  test("ts_sbs_merge: per-aircraft state carries each field's latest message") {
    val df = run("ts_sbs_merge").cache()
    val ev = Tables.events(spark, sf)
      .withColumn("icao", expr("lpad(upper(hex(user_id % 150 + 1)), 6, '0')"))
      .withColumn("mt", expr(
        "CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3 WHEN 2 THEN 4 WHEN 3 THEN 5 ELSE 8 END"))
      .cache()
    // one state row per aircraft, last_update = max message time
    assert(df.count() == ev.select("icao").distinct().count())
    val badTs = df.join(
      ev.groupBy("icao").agg(max("ts_sec").as("mx"))
        .withColumnRenamed("icao", "icao24"), "icao24")
      .filter(col("last_update_sec") =!= col("mx")).count()
    assert(badTs == 0)
    // callsign comes from the latest MSG,1 for that aircraft (trimmed)
    val lastId = ev.filter(col("mt") === 1)
      .groupBy("icao").agg(max(struct(col("ts_sec"), col("event_id"), col("user_id"))).as("m"))
      .select(col("icao").as("icao24"),
        expr("concat('UAL', CAST(m.user_id % 1000 AS STRING))").as("exp_cs"))
    val badCs = df.join(lastId, "icao24")
      .filter(col("callsign") =!= col("exp_cs")).count()
    assert(badCs == 0)
    // message counts reconcile with the raw feed
    assert(df.agg(sum("n_msgs")).head.getLong(0) == ev.count())
  }

  test("ts_alarm_evidence: brute-force check_new_alarm replay matches") {
    // replay alarm.rs:224 is_reported_alarm driver-side: an alarm is new
    // unless the previous alarm with the SAME (device, sensor, evidence
    // signature) is within 3600 s — different evidence is always new
    val events = Tables.events(spark, sf)
      .withColumn("sensor",
        org.apache.spark.sql.functions.get_json_object(col("props"), "$.k")
          .cast("long") % 8)
      .select("user_id", "event_id", "ts_sec", "event_type", "sensor")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[Long]("ts_sec"), r.getAs[String]("event_type"),
        r.getAs[Long]("sensor")))
    val expected = events.groupBy(_._1).flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (e._3, e._2))
      val sigs = sorted.zipWithIndex.map { case (e, i) =>
        val prev3 = (1 to 3).map(j =>
          if (i - j >= 0) sorted(i - j)._5 else -1L)
        (e, prev3.distinct.sorted.mkString("-"))
      }
      sigs.filter(_._1._4 == "error")
        .groupBy { case (e, sig) => (e._5, sig) }
        .map { case ((sensor, sig), alarms) =>
          val ts = alarms.map(_._1._3).sorted
          val nNew = 1 + ts.sliding(2).count(p =>
            p.length == 2 && p(1) - p(0) > 3600)
          ((uid, sensor, sig), (alarms.length.toLong, nNew.toLong))
        }
    }
    val got = run("ts_alarm_evidence").collect().map { r =>
      ((r.getAs[Long]("user_id"), r.getAs[Long]("sensor"),
        r.getAs[String]("ev_sig")),
        (r.getAs[Long]("n_alarms"), r.getAs[Long]("n_new")))
    }.toMap
    assert(got.size == expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) == v, s"group $k: got ${got(k)} want $v")
    }
  }

  test("per-entity window ops are single-shuffle") {
    spark.catalog.clearCache() // earlier tests cache query results
    val plan = run("ts_latest_per_key").queryExecution.executedPlan
    val shuffles = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.size
    // one shuffle for the window partitioning + one for the final
    // orderBy's range partitioning — nothing else
    assert(shuffles <= 2, s"too many shuffles ($shuffles):\n$plan")
  }
}
