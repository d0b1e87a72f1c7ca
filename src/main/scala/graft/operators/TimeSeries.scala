package graft.operators

import graft.{Det, Q, Tables}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** §2.B time-series / per-entity state ops.
  *
  * These re-express ODIN's imperative per-entity stores declaratively:
  * - GoesrHotspotStore ring buffer (odin_goesr/src/lib.rs:250,262) →
  *   latest-per-key / top-N-per-key window queries;
  * - aircraft track updates (odin_adsb/src/adsb.rs:89,126) →
  *   sessionization, per-entity deltas, gap detection;
  * - sentinel alarm thresholding (odin_sentinel/src/alarm.rs) →
  *   threshold-crossing windows;
  * - archive replay / live merge → as-of and range joins.
  *
  * Every op is a single shuffle keyed on the entity (`user_id`) — the
  * partitioning a 1000-executor cluster would want — with all event-time
  * math on epoch-second BIGINTs (see Tables.events).
  */
object TimeSeries {

  /** DuckDB-side epoch seconds for the nanos `ts` column. */
  private val TS = "CAST(floor(epoch(ts)) AS BIGINT)"

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  private val byUser = Window.partitionBy(col("user_id"))

  val defs: Seq[(String, Q)] = Seq(

    // ----- ts_latest_per_key: current state per entity -------------------
    // argmax as a struct-max aggregate: lexicographic max on (ts_sec,
    // event_id) — (ts_sec, event_id) is unique, so the trailing payload
    // fields never decide the comparison. Partial-aggregates map-side (one
    // row per entity per input partition reaches the shuffle), which is
    // the state-store fold shape a 100 TB feed wants; the window-sort form
    // would shuffle and sort every raw event per entity instead.
    "ts_latest_per_key" -> Q(
      build = (s, d) =>
        ev(s, d)
          .groupBy(col("user_id"))
          .agg(max(struct(col("ts_sec"), col("event_id"), col("event_type"),
            col("value"))).as("m"))
          .select(col("user_id"), col("m.event_id").as("event_id"),
            col("m.event_type").as("event_type"), col("m.value").as("value"),
            col("m.ts_sec").as("ts_sec"))
          .orderBy(col("user_id")),
      oracle = Some(s"""
        SELECT user_id, event_id, event_type, value, ts_sec FROM (
          SELECT user_id, event_id, event_type, value, $TS AS ts_sec,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY $TS DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
        ORDER BY user_id"""),
      bench = true),

    // ----- ts_topn_per_key: ring-buffer retention ------------------------
    "ts_topn_per_key" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("value").desc, col("event_id"))
        ev(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("user_id"), col("rn"), col("event_id"), col("value"))
          .orderBy(col("user_id"), col("rn"))
      },
      oracle = Some("""
        SELECT user_id, CAST(rn AS INT) AS rn, event_id, value FROM (
          SELECT user_id, event_id, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY value DESC, event_id) AS rn
          FROM events) WHERE rn <= 5
        ORDER BY user_id, rn""")),

    // ----- ts_dedup: replay duplicate-drop -------------------------------
    "ts_dedup" -> Q(
      build = (s, d) =>
        ev(s, d)
          .groupBy(col("user_id"), col("event_type"), col("ts_sec"))
          .agg(min(col("event_id")).as("keeper_id"), count(lit(1)).as("n_copies"))
          .orderBy(col("user_id"), col("event_type"), col("ts_sec")),
      oracle = Some(s"""
        SELECT user_id, event_type, $TS AS ts_sec,
               MIN(event_id) AS keeper_id, COUNT(*) AS n_copies
        FROM events GROUP BY 1, 2, 3
        ORDER BY user_id, event_type, ts_sec""")),

    // ----- ts_sessionize: gap-based session assembly (track legs) --------
    "ts_sessionize" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("prev_sec", lag(col("ts_sec"), 1).over(w))
          .withColumn("is_start",
            when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("is_start")).over(cum))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts_sec")).as("start_sec"), max(col("ts_sec")).as("end_sec"))
          .orderBy(col("user_id"), col("session_id"))
      },
      oracle = Some(s"""
        SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(ts_sec) AS start_sec, MAX(ts_sec) AS end_sec
        FROM (
          SELECT user_id, ts_sec,
                 SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
          FROM (
            SELECT user_id, event_id, $TS AS ts_sec,
                   CASE WHEN LAG($TS, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) IS NULL
                          OR $TS - LAG($TS, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) > 1800
                        THEN 1 ELSE 0 END AS is_start
            FROM events))
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      bench = true),

    // ----- ts_tumbling: hourly rollup ------------------------------------
    "ts_tumbling" -> Q(
      build = (s, d) =>
        ev(s, d)
          .withColumn("hour_bucket", expr("ts_sec div 3600"))
          .groupBy(col("hour_bucket"), col("event_type"))
          .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("val_sum"))
          .orderBy(col("hour_bucket"), col("event_type")),
      oracle = Some(s"""
        SELECT $TS // 3600 AS hour_bucket, event_type,
               COUNT(*) AS n_events, ${DSUM("value")} AS val_sum
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- ts_sliding: trailing-hour moving average per entity -----------
    "ts_sliding" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec")).rangeBetween(-3600, 0)
        ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            (sum(decP(col("value"))).over(w).cast(DoubleType)
              / count(lit(1)).over(w)).as("mov_avg"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, ts_sec,
               CAST(SUM(CAST(value AS DECIMAL(12,2)))
                    OVER (PARTITION BY user_id ORDER BY ts_sec
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS DOUBLE)
               / COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_sec
                                RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS mov_avg
        FROM (SELECT user_id, event_id, value, $TS AS ts_sec FROM events)
        ORDER BY user_id, ts_sec, event_id""")),

    // ----- ts_gaps: signal-loss detection --------------------------------
    "ts_gaps" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .withColumn("prev_sec", lag(col("ts_sec"), 1).over(w))
          .filter(col("prev_sec").isNotNull && col("ts_sec") - col("prev_sec") > 1800)
          .select(col("user_id"), col("event_id"), col("prev_sec"),
            col("ts_sec").as("cur_sec"),
            (col("ts_sec") - col("prev_sec")).as("gap_sec"))
          .orderBy(col("user_id"), col("cur_sec"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, prev_sec, cur_sec, cur_sec - prev_sec AS gap_sec
        FROM (
          SELECT user_id, event_id, $TS AS cur_sec,
                 LAG($TS, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) AS prev_sec
          FROM events)
        WHERE prev_sec IS NOT NULL AND cur_sec - prev_sec > 1800
        ORDER BY user_id, cur_sec, event_id""")),

    // ----- ts_schedule_frame: dense forecast-cycle frame -----------------
    // odin_hrrr/src/schedule.rs: data arrives on a fixed cycle schedule;
    // reporting needs EVERY slot, including empty ones. Generate the
    // 6-hour slot series for the month and left-join the per-slot
    // aggregates — gap-free, unlike a plain tumbling groupBy.
    "ts_schedule_frame" -> Q(
      build = (s, d) => {
        val slots = s.range(1)
          .select(explode(expr(
            "sequence(1704067200L, 1706659200L, 21600L)")).as("slot_sec"))
        val perSlot = ev(s, d)
          .withColumn("slot_sec",
            col("ts_sec") - (col("ts_sec") - 1704067200L) % 21600L)
          .groupBy(col("slot_sec"))
          .agg(count(lit(1)).as("n"), qsum(col("value")).as("vs"))
        slots.join(perSlot, Seq("slot_sec"), "left")
          .select(col("slot_sec"),
            coalesce(col("n"), lit(0L)).as("n_events"),
            coalesce(col("vs"), lit(0.0)).as("val_sum"))
          .orderBy(col("slot_sec"))
      },
      oracle = Some(s"""
        SELECT t.slot_sec, COALESCE(p.n, 0) AS n_events,
               COALESCE(p.vs, 0.0) AS val_sum
        FROM generate_series(1704067200, 1706659200, 21600) t(slot_sec)
        LEFT JOIN (
          SELECT ts_sec - (ts_sec - 1704067200) % 21600 AS slot_sec,
                 COUNT(*) AS n, ${QSUM("value")} AS vs
          FROM (SELECT $TS AS ts_sec, value FROM events)
          GROUP BY 1) p ON p.slot_sec = t.slot_sec
        ORDER BY t.slot_sec""")),

    // ----- ts_hrrr_schedule: next-available forecast (base run, step) ----
    // odin_hrrr's download scheduler: hourly HRRR runs publish forecast
    // steps minutes after the base hour on an estimated linear schedule
    // (schedule.rs:51 estimate_sched: first + (i*dsec + delay + 30)/60),
    // runs at 00/06/12/18 UTC are extended with 48 steps instead of 18
    // (lib.rs:216 is_extended_forecast), and get_next_base_step
    // (lib.rs:410) picks the next (base, step) to fetch after "now".
    // Re-expressed per event timestamp: explode the 3 candidate base
    // hours × their step schedules (≤110 rows/event, all integer math),
    // filter to future availability, argmin by (avail, base, step) as a
    // struct-min — map-side combinable, no window over the full table.
    "ts_hrrr_schedule" -> Q(
      build = (s, d) => {
        val cand = ev(s, d)
          .select(col("event_id"), col("ts_sec"))
          .withColumn("k", explode(expr("sequence(-1, 1)")))
          .withColumn("base_sec", (expr("ts_sec DIV 3600") + col("k")) * 3600L)
          .withColumn("ext", expr("(base_sec DIV 3600) % 6 = 0"))
          .withColumn("step", explode(expr(
            "sequence(0L, CASE WHEN ext THEN 48L ELSE 18L END)")))
          .withColumn("avail_sec",
            col("base_sec") + lit(60L) * (lit(50L) + expr(
              "(step * (CASE WHEN ext THEN 75L ELSE 116L END) + 60 + 30) DIV 60")))
          .filter(col("avail_sec") > col("ts_sec"))
        cand.groupBy(col("event_id"), col("ts_sec"))
          .agg(min(struct(col("avail_sec"), col("base_sec"), col("step"))).as("m"))
          .select(col("event_id"), col("ts_sec"),
            col("m.base_sec").as("next_base_sec"),
            col("m.step").as("next_step"),
            col("m.avail_sec").as("next_avail_sec"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        WITH ev AS (SELECT event_id, $TS AS ts_sec FROM events),
        cand AS (
          SELECT e.event_id, e.ts_sec,
                 (e.ts_sec // 3600 + k.k) * 3600 AS base_sec
          FROM ev e, generate_series(-1, 1) k(k)),
        typed AS (
          SELECT *, ((base_sec // 3600) % 6 = 0) AS ext FROM cand),
        steps AS (
          SELECT t.event_id, t.ts_sec, t.base_sec, s.s AS step,
                 t.base_sec + 60 * (50 + (s.s * (CASE WHEN t.ext THEN 75 ELSE 116 END) + 60 + 30) // 60) AS avail_sec
          FROM typed t, generate_series(0, 48) s(s)
          WHERE s.s <= CASE WHEN t.ext THEN 48 ELSE 18 END),
        nxt AS (
          SELECT event_id, ts_sec, base_sec, step, avail_sec,
                 row_number() OVER (PARTITION BY event_id
                                    ORDER BY avail_sec, base_sec, step) AS rn
          FROM steps WHERE avail_sec > ts_sec)
        SELECT event_id, ts_sec, base_sec AS next_base_sec, step AS next_step,
               avail_sec AS next_avail_sec
        FROM nxt WHERE rn = 1 ORDER BY event_id""")),

    // ----- ts_rate: per-minute event rates -------------------------------
    "ts_rate" -> Q(
      build = (s, d) =>
        ev(s, d)
          .withColumn("minute_bucket", expr("ts_sec div 60"))
          .groupBy(col("event_type"), col("minute_bucket"))
          .agg(count(lit(1)).as("n_events"))
          .orderBy(col("event_type"), col("minute_bucket")),
      oracle = Some(s"""
        SELECT event_type, $TS // 60 AS minute_bucket, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- ts_asof_join: most recent order state at event time -----------
    // Scalable shape: union both sides, one window pass — no per-row
    // subqueries, single shuffle on the entity key.
    "ts_asof_join" -> Q(
      build = (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("ts_sec"),
          lit(1).as("is_ev"), col("event_id"),
          lit(null).cast(LongType).as("o_orderkey"),
          lit(null).cast(LongType).as("o_sec"))
        val o = Tables.t(s, d, "orders").select(col("o_custkey").as("user_id"),
          unix_timestamp(col("o_orderdate")).as("ts_sec"),
          lit(0).as("is_ev"), lit(null).cast(LongType).as("event_id"),
          col("o_orderkey"),
          unix_timestamp(col("o_orderdate")).as("o_sec"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("is_ev"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.unionAll(o)
          .withColumn("last_ord", max(struct(col("o_sec"), col("o_orderkey"))).over(w))
          .filter(col("is_ev") === 1)
          .select(col("event_id"), col("user_id"), col("ts_sec"),
            col("last_ord.o_orderkey").as("o_orderkey"),
            col("last_ord.o_sec").as("order_sec"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        SELECT e.event_id, e.user_id, $TS AS ts_sec,
               (SELECT o.o_orderkey FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND CAST(floor(epoch(o.o_orderdate)) AS BIGINT) <= $TS
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey,
               (SELECT CAST(floor(epoch(MAX(o.o_orderdate))) AS BIGINT) FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND CAST(floor(epoch(o.o_orderdate)) AS BIGINT) <= $TS) AS order_sec
        FROM events e ORDER BY e.event_id"""),
      bench = true),

    // ----- ts_asof_native: same semantics via the custom Catalyst plan ---
    // graft.plans.AsOfJoinNode/-Exec: hash-clustered + sorted merge pass,
    // hash-checked against the identical DuckDB oracle as ts_asof_join.
    "ts_asof_native" -> Q(
      build = (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_id"), col("ts_sec"))
        val o = Tables.t(s, d, "orders").select(col("o_custkey"),
          col("o_orderkey"), unix_timestamp(col("o_orderdate")).as("o_sec"))
        graft.plans.AsOf.join(e, o,
            e("user_id"), o("o_custkey"), e("ts_sec"), o("o_sec"), o("o_orderkey"))
          .select(col("event_id"), col("user_id"), col("ts_sec"),
            col("o_orderkey"), col("o_sec").as("order_sec"))
          .orderBy(col("event_id"))
      },
      oracle = Some(s"""
        SELECT e.event_id, e.user_id, $TS AS ts_sec,
               (SELECT o.o_orderkey FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND CAST(floor(epoch(o.o_orderdate)) AS BIGINT) <= $TS
                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey,
               (SELECT CAST(floor(epoch(MAX(o.o_orderdate))) AS BIGINT) FROM orders o
                WHERE o.o_custkey = e.user_id
                  AND CAST(floor(epoch(o.o_orderdate)) AS BIGINT) <= $TS) AS order_sec
        FROM events e ORDER BY e.event_id"""),
      bench = true),

    // ----- ts_next_event: reverse as-of — next reading after a probe -----
    // The satellite-overpass shape (odin_orbital): for each order, the
    // first event of that entity strictly after the order time. Same
    // union+window trick as as-of, mirrored with an unbounded-following
    // frame.
    "ts_next_event" -> Q(
      build = (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("ts_sec"),
          lit(1).as("is_ev"), col("event_id"),
          lit(null).cast(LongType).as("o_orderkey"))
        val probes = Tables.t(s, d, "orders")
          .select(col("o_custkey").as("user_id"),
            (lit(1704067200L) + pmod(col("o_orderkey") * 997, lit(2505600L))).as("ts_sec"),
            lit(0).as("is_ev"), lit(null).cast(LongType).as("event_id"),
            col("o_orderkey"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("is_ev"), col("event_id"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        e.unionAll(probes)
          .withColumn("next_ev", min(when(col("is_ev") === 1,
            struct(col("ts_sec").as("t"), col("event_id").as("id")))).over(w))
          .filter(col("is_ev") === 0)
          .select(col("o_orderkey"), col("user_id"), col("ts_sec"),
            col("next_ev.id").as("next_event_id"),
            col("next_ev.t").as("next_sec"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some(s"""
        WITH probes AS (
          SELECT o_custkey AS user_id,
                 1704067200 + (o_orderkey*997) % 2505600 AS p_sec, o_orderkey
          FROM orders)
        SELECT p.o_orderkey, p.user_id, p.p_sec AS ts_sec,
               nx.id AS next_event_id, nx.t AS next_sec
        FROM probes p
        LEFT JOIN LATERAL (
          SELECT event_id AS id, $TS AS t FROM events e
          WHERE e.user_id = p.user_id AND $TS >= p.p_sec
          ORDER BY $TS ASC, event_id ASC LIMIT 1) nx ON TRUE
        ORDER BY p.o_orderkey"""),
      bench = false),

    // ----- ts_range_join: equi + band predicate join ---------------------
    "ts_range_join" -> Q(
      build = (s, d) => {
        val o = Tables.t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val e = ev(s, d).select(col("user_id"), col("event_id"), col("value"))
        o.join(e, col("user_id") === col("o_custkey")
            && col("value") >= col("o_totalprice") / lit(1000.0) - lit(20.0)
            && col("value") <= col("o_totalprice") / lit(1000.0) + lit(20.0))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_events"), qsum(col("value")).as("val_sum"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some(s"""
        SELECT o_orderkey, COUNT(*) AS n_events, ${QSUM("value")} AS val_sum
        FROM orders JOIN events
          ON user_id = o_custkey
         AND value >= o_totalprice/1000.0 - 20.0
         AND value <= o_totalprice/1000.0 + 20.0
        GROUP BY 1 ORDER BY 1""")),

    // ----- ts_range_native: the same band join via the custom exec -------
    // graft.plans.RangeJoinExec: hash-clustered + sorted sweep, O(n+m+out)
    // with a band-bounded working set — proven here against the identical
    // DuckDB oracle as ts_range_join (same semantics, native operator).
    "ts_range_native" -> Q(
      build = (s, d) => {
        val o = Tables.t(s, d, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        val e = ev(s, d).select(col("user_id"), col("event_id"), col("value"))
        graft.plans.RangeJoin.join(o, e,
            o("o_custkey"), e("user_id"),
            o("o_totalprice") / lit(1000.0) - lit(20.0),
            o("o_totalprice") / lit(1000.0) + lit(20.0),
            e("value"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_events"), qsum(col("value")).as("val_sum"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some(s"""
        SELECT o_orderkey, COUNT(*) AS n_events, ${QSUM("value")} AS val_sum
        FROM orders JOIN events
          ON user_id = o_custkey
         AND value >= o_totalprice/1000.0 - 20.0
         AND value <= o_totalprice/1000.0 + 20.0
        GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ----- ts_interval_join: keyless interval containment at scale -------
    // A pure range join (no equi key) degenerates to nested-loop on a
    // cluster; the scale form replicates each interval to the hour
    // buckets it overlaps and equi-joins on the bucket. Each event lives
    // in exactly one bucket, so no dedup is needed. The oracle is the
    // naive range join — same result, different plan.
    "ts_interval_join" -> Q(
      build = (s, d) => {
        val iv = Tables.t(s, d, "orders")
          .select(col("o_orderkey"),
            (lit(1704067200L) + pmod(col("o_orderkey") * 997, lit(2505600L))).as("start_sec"))
          .withColumn("end_sec", col("start_sec") + 7200L)
        val ivBuckets = iv.select(col("o_orderkey"), col("start_sec"), col("end_sec"),
          explode(expr("sequence(start_sec div 3600, (end_sec - 1) div 3600)"))
            .as("bucket"))
        val e = ev(s, d)
          .select(col("event_id"), col("ts_sec"), col("value"))
          .withColumn("bucket", expr("ts_sec div 3600"))
        ivBuckets.join(e, Seq("bucket"))
          .filter(col("ts_sec") >= col("start_sec") && col("ts_sec") < col("end_sec"))
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_events"), qsum(col("value")).as("val_sum"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some(s"""
        WITH iv AS (
          SELECT o_orderkey,
                 1704067200 + (o_orderkey*997) % 2505600 AS start_sec,
                 1704067200 + (o_orderkey*997) % 2505600 + 7200 AS end_sec
          FROM orders)
        SELECT iv.o_orderkey, COUNT(*) AS n_events, ${QSUM("value")} AS val_sum
        FROM iv JOIN (SELECT event_id, $TS AS ts_sec, value FROM events) e
          ON e.ts_sec >= iv.start_sec AND e.ts_sec < iv.end_sec
        GROUP BY 1 ORDER BY 1"""),
      bench = true),

    // ----- ts_delta: consecutive-reading deltas (alarm slope) ------------
    "ts_delta" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .filter(col("prev_value").isNotNull)
          .select(col("user_id"), col("event_id"), col("value"), col("prev_value"),
            (col("value") - col("prev_value")).as("delta"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, value, prev_value, value - prev_value AS delta
        FROM (
          SELECT user_id, event_id, value,
                 LAG(value, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) AS prev_value
          FROM events)
        WHERE prev_value IS NOT NULL
        ORDER BY user_id, event_id""")),

    // ----- ts_interpolate: linear value interpolation at probe times -----
    // The DEM/wind-grid sampling pattern (odin_dem, odin_wind): probe the
    // signal of an entity at external timestamps (orders of sf-scaled
    // custkeys), interpolating between the surrounding readings. One
    // union + one window pass — no per-probe lookups.
    "ts_interpolate" -> Q(
      build = (s, d) => {
        // one reading per (entity, second): keeps prev/next unambiguous
        val e = ev(s, d)
          .groupBy(col("user_id"), col("ts_sec"))
          .agg(max(col("value")).as("value"))
          .select(col("user_id"), col("ts_sec"),
            lit(0).as("is_probe"), lit(null).cast(LongType).as("o_orderkey"),
            col("value"))
        // probes: synthetic in-range timestamps derived from order keys
        val probes = Tables.t(s, d, "orders")
          .select(col("o_custkey").as("user_id"),
            (lit(1704067200L) + pmod(col("o_orderkey") * 997, lit(2505600L))).as("ts_sec"),
            lit(1).as("is_probe"), col("o_orderkey"),
            lit(null).cast(DoubleType).as("value"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("is_probe"))
        val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        e.unionAll(probes)
          .withColumn("prev_r", last(when(col("is_probe") === 0,
            struct(col("ts_sec").as("t"), col("value").as("v"))), ignoreNulls = true).over(wPrev))
          .withColumn("next_r", first(when(col("is_probe") === 0,
            struct(col("ts_sec").as("t"), col("value").as("v"))), ignoreNulls = true).over(wNext))
          .filter(col("is_probe") === 1
            && col("prev_r").isNotNull && col("next_r").isNotNull)
          .select(col("o_orderkey"), col("user_id"), col("ts_sec"),
            when(col("next_r.t") === col("prev_r.t"), col("prev_r.v"))
              .otherwise(col("prev_r.v")
                + (col("next_r.v") - col("prev_r.v"))
                * (col("ts_sec") - col("prev_r.t"))
                / (col("next_r.t") - col("prev_r.t"))).as("interp_value"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some(s"""
        WITH probes AS (
          SELECT o_custkey AS user_id,
                 1704067200 + (o_orderkey*997) % 2505600 AS p_sec, o_orderkey
          FROM orders),
        ev AS (SELECT user_id, $TS AS ts_sec, MAX(value) AS value
               FROM events GROUP BY 1, 2)
        SELECT p.o_orderkey, p.user_id, p.p_sec AS ts_sec,
               CASE WHEN nx.t = pv.t THEN pv.v
                    ELSE pv.v + (nx.v - pv.v)*(p.p_sec - pv.t)/(nx.t - pv.t) END AS interp_value
        FROM probes p
        JOIN LATERAL (SELECT ts_sec AS t, value AS v FROM ev
                      WHERE ev.user_id = p.user_id AND ev.ts_sec <= p.p_sec
                      ORDER BY ts_sec DESC LIMIT 1) pv ON TRUE
        JOIN LATERAL (SELECT ts_sec AS t, value AS v FROM ev
                      WHERE ev.user_id = p.user_id AND ev.ts_sec > p.p_sec
                      ORDER BY ts_sec ASC LIMIT 1) nx ON TRUE
        ORDER BY p.o_orderkey"""),
      bench = true),

    // ----- ts_concurrency: max concurrent sessions (interval algebra) ----
    // odin_common/src/ranges.rs overlap semantics: sessions become +1/-1
    // boundary events; a running sum over the time order gives the
    // concurrency profile; aggregate to the max per hour bucket.
    // Scale shape: NO global single-partition window. Two-level prefix
    // sum — boundary events shuffle once on their hour bucket for a
    // partitioned local running sum + per-bucket (sum, max) aggregate;
    // only the per-bucket TOTALS (rows = #hours, thousands not billions)
    // pass through an ordered window to build each bucket's offset, and
    // max_concurrency = offset + local_max needs no join back.
    "ts_concurrency" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sessions = ev(s, d)
          .withColumn("prev_sec", lag(col("ts_sec"), 1).over(w))
          .withColumn("is_start",
            when(col("prev_sec").isNull || col("ts_sec") - col("prev_sec") > 1800, 1L)
              .otherwise(0L))
          .withColumn("session_id", sum(col("is_start")).over(cum))
          .groupBy(col("user_id"), col("session_id"))
          .agg(min(col("ts_sec")).as("start_sec"),
            (max(col("ts_sec")) + 1).as("end_sec"))
        // one explode, not a self-union: referencing sessions twice would
        // evaluate the sessionization chain twice in one plan
        val bounds = sessions
          .select(explode(array(
            struct(col("start_sec").as("t"), lit(1L).as("delta")),
            struct(col("end_sec").as("t"), lit(-1L).as("delta")))).as("b"))
          .select(col("b.t").as("t"), col("b.delta").as("delta"))
          .withColumn("bucket", expr("t div 3600"))
        val wLocal = Window.partitionBy(col("bucket"))
          .orderBy(col("t"), col("delta"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perBucket = bounds
          .withColumn("local_cum", sum(col("delta")).over(wLocal))
          .groupBy(col("bucket"))
          .agg(sum(col("delta")).as("bucket_sum"),
            max(col("local_cum")).as("local_max"))
        val wOffset = Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)
        perBucket
          .withColumn("offset",
            coalesce(sum(col("bucket_sum")).over(wOffset), lit(0L)))
          .select(col("bucket").as("hour_bucket"),
            (col("offset") + col("local_max")).as("max_concurrency"))
          .orderBy(col("hour_bucket"))
      },
      oracle = Some(s"""
        WITH sess AS (
          SELECT user_id, session_id, MIN(ts_sec) AS start_sec, MAX(ts_sec) + 1 AS end_sec
          FROM (
            SELECT user_id, ts_sec,
                   SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
            FROM (
              SELECT user_id, event_id, $TS AS ts_sec,
                     CASE WHEN LAG($TS, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) IS NULL
                            OR $TS - LAG($TS, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) > 1800
                          THEN 1 ELSE 0 END AS is_start
              FROM events))
          GROUP BY 1, 2),
        bounds AS (
          SELECT start_sec AS t, 1 AS delta FROM sess
          UNION ALL SELECT end_sec AS t, -1 AS delta FROM sess)
        SELECT t // 3600 AS hour_bucket,
               CAST(MAX(concurrency) AS BIGINT) AS max_concurrency
        FROM (
          SELECT t, SUM(delta) OVER (ORDER BY t, delta
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS concurrency
          FROM bounds)
        GROUP BY 1 ORDER BY 1""")),

    // ----- ts_loess: local linear smoothing (odin_image/loess.rs:116) ----
    // linear_loess re-expressed per entity: least-squares line over a
    // ±5-row window, evaluated at the center. All frame sums are exact
    // (rebased BIGINT x, DECIMAL y), so the fitted value is deterministic
    // across engines; one window shuffle.
    "ts_loess" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(-5, 5)
        val x = (col("ts_sec") - 1704067200L)
        val base = ev(s, d)
          .withColumn("x", x)
          .withColumn("yd", decP(col("value")))
        val n = count(lit(1)).over(w).cast(DoubleType)
        val sx = sum(col("x")).over(w).cast(DoubleType)
        val sy = sum(col("yd")).over(w).cast(DoubleType)
        val sxy = sum(col("x") * col("yd")).over(w).cast(DoubleType)
        val sxx = sum(col("x") * col("x")).over(w).cast(DoubleType)
        val denom = n * sxx - sx * sx
        val slope = (n * sxy - sx * sy) / denom
        val smoothed = when(denom === 0.0, sy / n)
          .otherwise((sy - slope * sx) / n + slope * col("x"))
        base
          .select(col("user_id"), col("event_id"), col("value"),
            smoothed.as("smoothed"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, value,
               CASE WHEN n*sxx - sx*sx = 0.0 THEN sy/n
                    ELSE (sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n
                         + ((n*sxy - sx*sy)/(n*sxx - sx*sx))*x END AS smoothed
        FROM (
          SELECT user_id, event_id, value, x,
                 CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                 CAST(SUM(x) OVER w AS DOUBLE) AS sx,
                 CAST(SUM(yd) OVER w AS DOUBLE) AS sy,
                 CAST(SUM(x*yd) OVER w AS DOUBLE) AS sxy,
                 CAST(SUM(x*x) OVER w AS DOUBLE) AS sxx
          FROM (SELECT user_id, event_id, value, $TS - 1704067200 AS x,
                       CAST(value AS DECIMAL(12,2)) AS yd, $TS AS ts_sec
                FROM events)
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
                       ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING))
        ORDER BY user_id, event_id"""),
      bench = true),

    // ----- ts_json_extract: typed extraction from JSON payloads ----------
    // ODIN feeds arrive as JSON (adsb sbs.rs, sentinel ws.rs); `props` is
    // the payload column here.
    "ts_json_extract" -> Q(
      build = (s, d) =>
        ev(s, d)
          .select(col("event_id"), col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("prop_k"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("prop_k")).as("k_sum"), max(col("prop_k")).as("k_max"))
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type, COUNT(*) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
               MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ----- ts_alarm_debounce: first alarm per burst ----------------------
    // Alarm storms collapse to one notification per 1h-gap burst
    // (odin_sentinel alarm notification semantics): threshold crossings,
    // sessionized, first per session.
    "ts_alarm_debounce" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val alarms = ev(s, d)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .filter(col("prev_value").isNotNull
            && col("value") >= 180.0 && col("prev_value") < 180.0)
          .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"))
        val wa = byUser.orderBy(col("ts_sec"), col("event_id"))
        val cum = wa.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        alarms
          .withColumn("prev_alarm", lag(col("ts_sec"), 1).over(wa))
          .withColumn("is_burst_start",
            when(col("prev_alarm").isNull || col("ts_sec") - col("prev_alarm") > 3600, 1L)
              .otherwise(0L))
          .withColumn("burst_id", sum(col("is_burst_start")).over(cum))
          .filter(col("is_burst_start") === 1)
          .select(col("user_id"), col("burst_id"), col("event_id"),
            col("ts_sec"), col("value"))
          .orderBy(col("user_id"), col("burst_id"))
      },
      oracle = Some(s"""
        WITH alarms AS (
          SELECT user_id, event_id, ts_sec, value
          FROM (
            SELECT user_id, event_id, $TS AS ts_sec, value,
                   LAG(value, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) AS prev_value
            FROM events)
          WHERE prev_value IS NOT NULL AND value >= 180.0 AND prev_value < 180.0),
        flagged AS (
          SELECT user_id, event_id, ts_sec, value,
                 CASE WHEN LAG(ts_sec, 1) OVER w IS NULL
                        OR ts_sec - LAG(ts_sec, 1) OVER w > 3600
                      THEN 1 ELSE 0 END AS is_burst_start
          FROM alarms
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        SELECT user_id,
               CAST(SUM(is_burst_start) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS burst_id,
               event_id, ts_sec, value
        FROM flagged
        QUALIFY is_burst_start = 1
        ORDER BY user_id, burst_id"""),
      bench = false),

    // ----- ts_alarm_evidence: evidence-set alarm dedup -------------------
    // odin_sentinel/src/alarm.rs:199 check_new_alarm / :224
    // is_reported_alarm: an alarm is suppressed only when a previously
    // reported alarm exists for the SAME device and sensor with the SAME
    // evidence sensor set (same_evidence_sensors, alarm.rs:60) within
    // new_alarm_duration — alarms whose evidence differs are ALWAYS new
    // ("we don't treat alarms by different cameras of the same device as
    // the same alarm"). Re-expressed: device = user_id, sensor =
    // props.k % 8, an alarm = an 'error' event, and its evidence set =
    // the distinct sensors of the device's 3 preceding events (the
    // cameras that captured supporting footage). The dedup is the
    // debounce lag pattern with the evidence signature IN THE PARTITION
    // KEY — which is precisely what distinguishes check_new_alarm from a
    // plain time debounce. Bounded windows only; shuffles on device.
    "ts_alarm_evidence" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val sens = ev(s, d)
          .withColumn("sensor",
            get_json_object(col("props"), "$.k").cast(LongType) % 8)
        val sig = sens.withColumn("ev_sig",
          concat_ws("-", transform(
            array_sort(array_distinct(array(
              coalesce(lag(col("sensor"), 1).over(w), lit(-1L)),
              coalesce(lag(col("sensor"), 2).over(w), lit(-1L)),
              coalesce(lag(col("sensor"), 3).over(w), lit(-1L))))),
            x => x.cast(StringType))))
        val alarms = sig.filter(col("event_type") === "error")
        val wk = Window.partitionBy(col("user_id"), col("sensor"), col("ev_sig"))
          .orderBy(col("ts_sec"), col("event_id"))
        alarms
          .withColumn("prev_ts", lag(col("ts_sec"), 1).over(wk))
          .withColumn("is_new",
            col("prev_ts").isNull || col("ts_sec") - col("prev_ts") > 3600L)
          .groupBy(col("user_id"), col("sensor"), col("ev_sig"))
          .agg(count(lit(1)).as("n_alarms"),
            sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
            min(col("ts_sec")).as("first_alarm"),
            max(col("ts_sec")).as("last_alarm"))
          .orderBy(col("user_id"), col("sensor"), col("ev_sig"))
      },
      oracle = Some(s"""
        WITH sens AS (
          SELECT event_id, user_id, event_type, $TS AS ts_sec,
                 CAST(json_extract(props, '$$.k') AS BIGINT) % 8 AS sensor
          FROM events),
        sig AS (
          SELECT *, array_to_string(list_sort(list_distinct([
                   COALESCE(LAG(sensor, 1) OVER w, -1),
                   COALESCE(LAG(sensor, 2) OVER w, -1),
                   COALESCE(LAG(sensor, 3) OVER w, -1)])), '-') AS ev_sig
          FROM sens
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        alarms AS (SELECT * FROM sig WHERE event_type = 'error'),
        ded AS (
          SELECT *, LAG(ts_sec, 1) OVER (PARTITION BY user_id, sensor, ev_sig
                      ORDER BY ts_sec, event_id) AS prev_ts
          FROM alarms)
        SELECT user_id, sensor, ev_sig, COUNT(*) AS n_alarms,
               CAST(SUM(CASE WHEN prev_ts IS NULL OR ts_sec - prev_ts > 3600
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
               MIN(ts_sec) AS first_alarm, MAX(ts_sec) AS last_alarm
        FROM ded GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      bench = false),

    // ----- ts_threshold_alarm: upward threshold crossings ----------------
    "ts_threshold_alarm" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .filter(col("prev_value").isNotNull
            && col("value") >= 180.0 && col("prev_value") < 180.0)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            col("value"), col("prev_value"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, ts_sec, value, prev_value
        FROM (
          SELECT user_id, event_id, $TS AS ts_sec, value,
                 LAG(value, 1) OVER (PARTITION BY user_id ORDER BY $TS, event_id) AS prev_value
          FROM events)
        WHERE prev_value IS NOT NULL AND value >= 180.0 AND prev_value < 180.0
        ORDER BY user_id, event_id"""))
,
    // ----- ts_zscore: per-entity anomaly detection -----------------------
    // Statistical outlier flagging per sensor (the robust form of the fixed
    // threshold in alarm.rs): z = (x - mean)/std over the entity's history.
    // Sums are exact (2-decimal DECIMAL); every double op after that is the
    // same IEEE expression on both engines, so z is bit-identical and needs
    // no rounding. One window shuffle keyed on the entity.
    "ts_zscore" -> Q(
      build = (s, d) => {
        val n = count(lit(1)).over(byUser).cast(DoubleType)
        val sumd = sum(decP(col("value"))).over(byUser).cast(DoubleType)
        val sumsq = sum(decP(col("value")) * decP(col("value"))).over(byUser)
          .cast(DoubleType)
        ev(s, d)
          .withColumn("mean_v", sumd / n)
          .withColumn("var_v",
            greatest(sumsq / n - col("mean_v") * col("mean_v"), lit(0.0)))
          .withColumn("z", (col("value") - col("mean_v")) / sqrt(col("var_v")))
          .filter(col("var_v") > 0.0 && abs(col("z")) > 2.5)
          .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"),
            col("mean_v"), col("z"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        SELECT user_id, event_id, ts_sec, value, mean_v,
               (value - mean_v)/sqrt(var_v) AS z
        FROM (
          SELECT user_id, event_id, $TS AS ts_sec, value, mean_v,
                 greatest(sumsq/n - mean_v*mean_v, 0.0) AS var_v
          FROM (
            SELECT user_id, event_id, ts, value,
                   CAST(COUNT(*) OVER w AS DOUBLE) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
                     / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_v,
                   CAST(SUM(CAST(value AS DECIMAL(12,2))
                            * CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sumsq
            FROM events
            WINDOW w AS (PARTITION BY user_id)))
        WHERE var_v > 0.0 AND abs((value - mean_v)/sqrt(var_v)) > 2.5
        ORDER BY user_id, event_id""")),

    // ----- ts_crosscorr: co-variation matrix of feed volumes -------------
    // Do sensor channels move together? Pearson correlation between the
    // hourly volumes of every event-type pair, computed entirely from
    // integer sums (n, Sx, Sy, Sxy, Sxx, Syy over a densified hour x type
    // frame) — the only doubles are the final identical sqrt/divide, so
    // the matrix is bit-exact cross-engine with no rounding.
    "ts_crosscorr" -> Q(
      build = (s, d) => {
        val e = ev(s, d).withColumn("hour", expr("ts_sec div 3600"))
        val counts = e.groupBy(col("hour"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val hours = e.select(col("hour")).distinct()
        val types = e.select(col("event_type")).distinct()
        val dense = hours.crossJoin(types)
          .join(counts, Seq("hour", "event_type"), "left")
          .withColumn("n", coalesce(col("n"), lit(0L)))
        val p = dense.as("a").join(dense.as("b"),
            col("a.hour") === col("b.hour")
              && col("a.event_type") < col("b.event_type"))
          .select(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
            col("a.n").as("x"), col("b.n").as("y"))
        p.groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_hours"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .withColumn("r",
            (col("n_hours") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
              / (sqrt((col("n_hours") * col("sxx") - col("sx") * col("sx")).cast(DoubleType))
                * sqrt((col("n_hours") * col("syy") - col("sy") * col("sy")).cast(DoubleType))))
          .select(col("type_a"), col("type_b"), col("n_hours"), col("r"))
          .orderBy(col("type_a"), col("type_b"))
      },
      oracle = Some(s"""
        WITH e AS (SELECT $TS // 3600 AS hour, event_type FROM events),
        counts AS (SELECT hour, event_type, COUNT(*) AS n FROM e GROUP BY 1, 2),
        dense AS (
          SELECT h.hour, t.event_type, COALESCE(c.n, 0) AS n
          FROM (SELECT DISTINCT hour FROM e) h
          CROSS JOIN (SELECT DISTINCT event_type FROM e) t
          LEFT JOIN counts c ON c.hour = h.hour AND c.event_type = t.event_type),
        p AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b, a.n AS x, b.n AS y
          FROM dense a JOIN dense b
            ON a.hour = b.hour AND a.event_type < b.event_type),
        sums AS (
          SELECT type_a, type_b, COUNT(*) AS n_hours,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x*y) AS BIGINT) AS sxy,
                 CAST(SUM(x*x) AS BIGINT) AS sxx,
                 CAST(SUM(y*y) AS BIGINT) AS syy
          FROM p GROUP BY 1, 2)
        SELECT type_a, type_b, n_hours,
               CAST(n_hours*sxy - sx*sy AS DOUBLE)
               / (sqrt(CAST(n_hours*sxx - sx*sx AS DOUBLE))
                  * sqrt(CAST(n_hours*syy - sy*sy AS DOUBLE))) AS r
        FROM sums
        ORDER BY type_a, type_b""")),

    // ----- ts_first_seen: daily new-entity counts + cumulative -----------
    // "New vs. returning" growth accounting without windowed distinct
    // counting: an entity's first-seen day is a min-aggregate, daily new
    // counts follow, and the running total is a window sum over the tiny
    // per-day frame — exact at any scale where COUNT(DISTINCT) OVER would
    // need state proportional to the entity universe.
    "ts_first_seen" -> Q(
      build = (s, d) => {
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("day", expr("ts_sec div 86400"))
          .groupBy(col("user_id"))
          .agg(min(col("day")).as("day"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_new"))
          .withColumn("cum_entities", sum(col("n_new")).over(w))
          .orderBy(col("day"))
      },
      oracle = Some(s"""
        SELECT day, n_new,
               CAST(SUM(n_new) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_entities
        FROM (
          SELECT day, COUNT(*) AS n_new FROM (
            SELECT user_id, MIN($TS // 86400) AS day FROM events GROUP BY 1)
          GROUP BY 1)
        ORDER BY day""")),

    // ----- ts_heartbeat_uptime: per-entity availability --------------------
    // The sensor-availability dashboard number: of the 10-min heartbeat
    // slots between an entity's first and last report, how many carried at
    // least one event? Pure integer slot math; the ratio is one identical
    // IEEE division. One partial-agg shuffle keyed on the entity.
    "ts_heartbeat_uptime" -> Q(
      build = (s, d) =>
        ev(s, d)
          .withColumn("slot", expr("ts_sec div 600"))
          .groupBy(col("user_id"))
          .agg(countDistinct(col("slot")).as("n_active_slots"),
            min(col("slot")).as("first_slot"), max(col("slot")).as("last_slot"))
          .withColumn("n_expected", col("last_slot") - col("first_slot") + 1)
          .withColumn("uptime",
            col("n_active_slots").cast(DoubleType) / col("n_expected"))
          .select(col("user_id"), col("n_active_slots"), col("n_expected"),
            col("uptime"))
          .orderBy(col("user_id")),
      oracle = Some(s"""
        SELECT user_id, n_active_slots, last_slot - first_slot + 1 AS n_expected,
               CAST(n_active_slots AS DOUBLE) / (last_slot - first_slot + 1) AS uptime
        FROM (
          SELECT user_id, COUNT(DISTINCT slot) AS n_active_slots,
                 MIN(slot) AS first_slot, MAX(slot) AS last_slot
          FROM (SELECT user_id, $TS // 600 AS slot FROM events)
          GROUP BY 1)
        ORDER BY user_id""")),

    // ----- ts_rate_trend: day-over-day volume change per type ------------
    // Trend surveillance over the feed itself (is the sensor network
    // degrading?): daily event counts per type with the previous day's
    // count and the exact-integer delta. Daily agg then a lag over the
    // tiny (type, day) frame — heavy lifting is one partial-agg shuffle.
    "ts_rate_trend" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        ev(s, d)
          .withColumn("day", expr("ts_sec div 86400"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("n_events"))
          .withColumn("prev_n", lag(col("n_events"), 1).over(w))
          .filter(col("prev_n").isNotNull)
          .withColumn("delta", col("n_events") - col("prev_n"))
          .orderBy(col("event_type"), col("day"))
      },
      oracle = Some(s"""
        SELECT event_type, day, n_events, prev_n, n_events - prev_n AS delta
        FROM (
          SELECT event_type, day, n_events,
                 LAG(n_events, 1) OVER (PARTITION BY event_type ORDER BY day) AS prev_n
          FROM (
            SELECT event_type, $TS // 86400 AS day, COUNT(*) AS n_events
            FROM events GROUP BY 1, 2))
        WHERE prev_n IS NOT NULL
        ORDER BY event_type, day""")),

    // ----- ts_funnel: ordered-sequence (funnel) detection ----------------
    // Did view -> click -> purchase happen IN ORDER per entity? The
    // sequence-pattern query (MATCH_RECOGNIZE's common case) as three
    // co-partitioned aggregations: each stage is min(ts of the next type
    // AFTER the previous stage's time) — all shuffles keyed on user_id, so
    // the chain rides one partitioning. Emits per-user stage times + the
    // reached stage.
    "ts_funnel" -> Q(
      build = (s, d) => {
        val e = ev(s, d).select(col("user_id"), col("event_type"), col("ts_sec"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t_view"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id").filter(col("ts_sec") > col("t_view"))
          .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t_click"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id").filter(col("ts_sec") > col("t_click"))
          .groupBy(col("user_id")).agg(min(col("ts_sec")).as("t_purchase"))
        v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
          .withColumn("stage",
            when(col("t_purchase").isNotNull, "purchase")
              .when(col("t_click").isNotNull, "click").otherwise("view"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH e AS (SELECT user_id, event_type, $TS AS ts_sec FROM events),
        v AS (SELECT user_id, MIN(ts_sec) AS t_view FROM e
              WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, MIN(e.ts_sec) AS t_click
              FROM e JOIN v ON e.user_id = v.user_id
              WHERE e.event_type = 'click' AND e.ts_sec > v.t_view GROUP BY 1),
        p AS (SELECT e.user_id, MIN(e.ts_sec) AS t_purchase
              FROM e JOIN c ON e.user_id = c.user_id
              WHERE e.event_type = 'purchase' AND e.ts_sec > c.t_click GROUP BY 1)
        SELECT v.user_id AS user_id, v.t_view, c.t_click, p.t_purchase,
               CASE WHEN p.t_purchase IS NOT NULL THEN 'purchase'
                    WHEN c.t_click IS NOT NULL THEN 'click'
                    ELSE 'view' END AS stage
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
        ORDER BY user_id""")),

    // ----- ts_interval_merge: range-set union per entity -----------------
    // odin_common/src/ranges.rs keeps per-entity range SETS normalized by
    // merging overlapping spans; declaratively that's gaps-and-islands:
    // an island starts where this interval's start exceeds the running max
    // of prior ends. One window shuffle keyed on the entity. Intervals
    // derive from orders exactly as in ts_interval_join.
    "ts_interval_merge" -> Q(
      build = (s, d) => {
        val iv = Tables.t(s, d, "orders")
          .select(col("o_custkey"),
            (lit(1704067200L) + pmod(col("o_orderkey") * 997, lit(2505600L)))
              .as("start_sec"))
          .withColumn("end_sec", col("start_sec") + 7200L)
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("start_sec"), col("end_sec"))
        val cumPrev = w.rowsBetween(Window.unboundedPreceding, -1)
        val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        iv
          .withColumn("prev_max_end", max(col("end_sec")).over(cumPrev))
          .withColumn("is_start",
            when(col("prev_max_end").isNull
              || col("start_sec") > col("prev_max_end"), 1L).otherwise(0L))
          .withColumn("island", sum(col("is_start")).over(cum))
          .groupBy(col("o_custkey"), col("island"))
          .agg(min(col("start_sec")).as("span_start"),
            max(col("end_sec")).as("span_end"),
            count(lit(1)).as("n_merged"))
          .orderBy(col("o_custkey"), col("island"))
      },
      oracle = Some("""
        WITH iv AS (
          SELECT o_custkey,
                 1704067200 + ((o_orderkey * 997) % 2505600 + 2505600) % 2505600 AS start_sec,
                 1704067200 + ((o_orderkey * 997) % 2505600 + 2505600) % 2505600 + 7200 AS end_sec
          FROM orders),
        flagged AS (
          SELECT o_custkey, start_sec, end_sec,
                 CASE WHEN MAX(end_sec) OVER (PARTITION BY o_custkey
                        ORDER BY start_sec, end_sec
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                      OR start_sec > MAX(end_sec) OVER (PARTITION BY o_custkey
                        ORDER BY start_sec, end_sec
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      THEN 1 ELSE 0 END AS is_start
          FROM iv),
        islands AS (
          SELECT o_custkey, start_sec, end_sec,
                 CAST(SUM(is_start) OVER (PARTITION BY o_custkey
                   ORDER BY start_sec, end_sec
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
          FROM flagged)
        SELECT o_custkey, island, MIN(start_sec) AS span_start,
               MAX(end_sec) AS span_end, COUNT(*) AS n_merged
        FROM islands GROUP BY 1, 2
        ORDER BY o_custkey, island""")),

    // ----- ts_seasonal_baseline: diurnal profile + deviation counts ------
    // The day-shape baseline behind sensor sanity checks: per (entity,
    // hour-of-day) mean (exact DECIMAL sum / count) and how many readings
    // deviate > 60 from their hour's mean. Two shuffles, both keyed on
    // (user_id, hod), so the profile join is co-partitioned with the agg.
    // No libm anywhere — comparisons are bit-identical by construction.
    "ts_seasonal_baseline" -> Q(
      build = (s, d) => {
        val hod = expr("(ts_sec % 86400) div 3600")
        val base = ev(s, d).withColumn("hod", hod)
        val prof = base.groupBy(col("user_id"), col("hod"))
          .agg(count(lit(1)).as("n_obs"),
            (sum(decP(col("value"))).cast(DoubleType) / count(lit(1))).as("mean_v"))
        base.join(prof, Seq("user_id", "hod"))
          .groupBy(col("user_id"), col("hod"))
          .agg(max(col("n_obs")).as("n_obs"), max(col("mean_v")).as("mean_v"),
            sum(when(abs(col("value") - col("mean_v")) > 60.0, 1L).otherwise(0L))
              .as("n_outliers"))
          .orderBy(col("user_id"), col("hod"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, value, ($TS % 86400) // 3600 AS hod FROM events),
        prof AS (
          SELECT user_id, hod, COUNT(*) AS n_obs,
                 CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_v
          FROM base GROUP BY 1, 2)
        SELECT b.user_id AS user_id, b.hod AS hod,
               MAX(p.n_obs) AS n_obs, MAX(p.mean_v) AS mean_v,
               CAST(SUM(CASE WHEN abs(b.value - p.mean_v) > 60.0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_outliers
        FROM base b JOIN prof p ON b.user_id = p.user_id AND b.hod = p.hod
        GROUP BY 1, 2
        ORDER BY b.user_id, b.hod""")),

    // ----- ts_ewma: finite-horizon exponential smoothing -----------------
    // The streaming smoother behind debounced alarms: EWMA(alpha=0.2) over
    // the last 10 readings per entity, renormalized on partial history.
    // Everything is exact integer fixed-point: decay coefficients x 10^10
    // are exact integers (0.2·0.8^k has k+1 decimal digits), readings x 100
    // are exact (2-decimal data), so both weighted sums are BIGINT-exact
    // and order-free; the only double ops are two identical divisions.
    // Single window shuffle keyed on the entity; lag() only — no self-join.
    "ts_ewma" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        // 0.2*0.8^k * 10^10, exact
        val c = (0 until 10).map(k => java.math.BigDecimal.valueOf(2, 1)
          .multiply(java.math.BigDecimal.valueOf(8, 1).pow(k))
          .movePointRight(10).longValueExact)
        val base = ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"),
            (decP(col("value")) * 100).cast(LongType).as("v100"))
        val lagged = (0 until 10).foldLeft(base) { (df, k) =>
          df.withColumn(s"l$k", lag(col("v100"), k).over(w))
        }
        val num = (0 until 10).map(k =>
          expr(s"CASE WHEN l$k IS NOT NULL THEN ${c(k)}L * l$k ELSE 0L END"))
          .reduce(_ + _)
        val den = (0 until 10).map(k =>
          expr(s"CASE WHEN l$k IS NOT NULL THEN ${c(k)}L ELSE 0L END"))
          .reduce(_ + _)
        lagged
          .withColumn("ewma",
            num.cast(DoubleType) / den.cast(DoubleType) / lit(100.0))
          .select(col("user_id"), col("event_id"), col("ts_sec"), col("value"),
            col("ewma"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = {
        val c = (0 until 10).map(k => java.math.BigDecimal.valueOf(2, 1)
          .multiply(java.math.BigDecimal.valueOf(8, 1).pow(k))
          .movePointRight(10).longValueExact)
        val lags = (0 until 10).map(k =>
          s"LAG(v100, $k) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS l$k")
          .mkString(",\n                 ")
        val num = (0 until 10).map(k =>
          s"CASE WHEN l$k IS NOT NULL THEN CAST(${c(k)} AS BIGINT) * l$k ELSE 0 END")
          .mkString(" + ")
        val den = (0 until 10).map(k =>
          s"CASE WHEN l$k IS NOT NULL THEN CAST(${c(k)} AS BIGINT) ELSE 0 END")
          .mkString(" + ")
        Some(s"""
        WITH base AS (
          SELECT user_id, event_id, $TS AS ts_sec, value,
                 CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v100
          FROM events),
        lagged AS (
          SELECT user_id, event_id, ts_sec, value,
                 $lags
          FROM base)
        SELECT user_id, event_id, ts_sec, value,
               CAST($num AS DOUBLE) / CAST($den AS DOUBLE) / 100.0 AS ewma
        FROM lagged
        ORDER BY user_id, event_id""")
      }),

    // ----- ts_changepoint: CUSUM level-shift localization ----------------
    // Where did a sensor's level shift? The CUSUM statistic: the running
    // sum of deviations from the series mean peaks at the changepoint
    // (the robust follow-up to ts_zscore's pointwise flags). All scan
    // state is integer — with cents = 100*value (exact DECIMAL) and
    // (S, n) the per-entity total and count, c_i = Σ_{j<=i}(cents_j*n − S)
    // is an exact BIGINT running sum (no division inside the scan); the
    // reported deviation max|c|/(n²·100) is one identical IEEE division.
    // Two shuffles keyed on the entity (stats window + ordered window),
    // argmax via struct-min — no per-entity sort at the driver.
    "ts_changepoint" -> Q(
      build = (s, d) => {
        val cum = byUser.orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, d)
          .withColumn("cents", (decP(col("value")) * 100).cast(LongType))
          .withColumn("tot", sum(col("cents")).over(byUser))
          .withColumn("n", count(lit(1)).over(byUser))
          .withColumn("c", sum(col("cents") * col("n") - col("tot")).over(cum))
          .groupBy(col("user_id"))
          .agg(min(struct((-abs(col("c"))).as("negabs"),
            col("event_id").as("eid"), col("ts_sec").as("ts"),
            col("c").as("cv"), col("n").as("nn"))).as("m"))
          .select(col("user_id"), col("m.eid").as("cp_event_id"),
            col("m.ts").as("cp_ts_sec"),
            (abs(col("m.cv")).cast(DoubleType)
              / (col("m.nn") * col("m.nn")).cast(DoubleType) / 100.0).as("max_dev"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        SELECT user_id, cp_event_id, cp_ts_sec,
               CAST(abs_c AS DOUBLE)/CAST(n*n AS DOUBLE)/100.0 AS max_dev
        FROM (
          SELECT user_id, event_id AS cp_event_id, ts_sec AS cp_ts_sec,
                 abs(c) AS abs_c, n,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY abs(c) DESC, event_id) AS rn
          FROM (
            SELECT user_id, event_id, ts_sec, n,
                   SUM(cents*n - tot) OVER (PARTITION BY user_id
                     ORDER BY ts_sec, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
            FROM (
              SELECT user_id, event_id, $TS AS ts_sec,
                     CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
                     CAST(SUM(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
                          OVER (PARTITION BY user_id) AS BIGINT) AS tot,
                     COUNT(*) OVER (PARTITION BY user_id) AS n
              FROM events)))
        WHERE rn = 1 ORDER BY user_id"""))
  ) ++ Seq(

    // ----- ts_ohlc: per-entity hourly open/high/low/close ----------------
    // The candle rollup every telemetry dashboard draws (first/last/
    // extremes per bucket — the odin_goesr store keeps exactly this shape
    // per hotspot interval). Open/close use the argmin/argmax struct-min
    // trick: (ts, event_id) is unique, so the carried value is never
    // compared and the whole aggregate is ONE map-side-combinable shuffle —
    // no per-bucket sort, no window. Values are 2-decimal reads, so every
    // output is exactly representable on both engines.
    "ts_ohlc" -> Q(
      build = (s, d) =>
        ev(s, d)
          .groupBy(col("user_id"), expr("ts_sec div 3600").as("hour"))
          .agg(
            min(struct(col("ts_sec"), col("event_id"), col("value"))).as("o"),
            max(struct(col("ts_sec"), col("event_id"), col("value"))).as("c"),
            max(col("value")).as("high"), min(col("value")).as("low"),
            count(lit(1)).as("n"))
          .select(col("user_id"), col("hour"), col("o.value").as("open"),
            col("high"), col("low"), col("c.value").as("close"), col("n"))
          .orderBy(col("user_id"), col("hour")),
      oracle = Some(s"""
        WITH b AS (SELECT user_id, event_id, $TS AS ts_sec, value FROM events),
        h AS (SELECT user_id, ts_sec // 3600 AS hour, value,
                ROW_NUMBER() OVER (PARTITION BY user_id, ts_sec // 3600
                                   ORDER BY ts_sec, event_id) AS rn_a,
                ROW_NUMBER() OVER (PARTITION BY user_id, ts_sec // 3600
                                   ORDER BY ts_sec DESC, event_id DESC) AS rn_d
              FROM b)
        SELECT user_id, hour,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high, MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS n
        FROM h GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- ts_schedule_learn: availability-schedule statistics -----------
    // odin_hrrr/src/schedule.rs:96 parse_schedules /:151 update_schedule:
    // the downloader LEARNS the per-step forecast availability schedule
    // from observed file-creation times — per forecast step, the average
    // and max delay (minutes from cycle base hour to availability), plus
    // the configured delay margin, with a monotonicity check over steps
    // (schedule.rs check_schedule). Re-expressed: each event is an
    // availability observation (step = event_id % 19, delay = minute-in-
    // hour + 2*step), per-step integer aggregation, avg as one exact
    // integer division pair, monotone flag via lag over the 19-row result.
    // Scale shape: one map-side-combinable groupBy on step; the window
    // runs over 19 aggregated rows, never raw observations.
    "ts_schedule_learn" -> Q(
      build = (s, d) => {
        val delayMargin = 1L // conf.delay rounded up to minutes (schedule.rs:77)
        val obs = ev(s, d)
          .select((col("event_id") % 19).as("step"),
            (expr("(ts_sec % 3600) DIV 60") + (col("event_id") % 19) * 2)
              .as("diff_min"))
        val byStep = obs.groupBy(col("step"))
          .agg(count(lit(1)).as("n_obs"),
            sum(col("diff_min")).as("sum_min"),
            max(col("diff_min")).as("max_min"))
        val w = Window.orderBy(col("step")) // 19 rows total — bounded
        byStep
          .select(col("step"), col("n_obs"),
            (expr("sum_min DIV n_obs") + delayMargin).as("avg_delay_min"),
            (col("max_min") + delayMargin).as("max_delay_min"))
          .withColumn("monotone",
            coalesce(col("avg_delay_min")
              >= lag(col("avg_delay_min"), 1).over(w), lit(true)))
          .orderBy(col("step"))
      },
      oracle = Some(s"""
        WITH obs AS (
          SELECT event_id % 19 AS step,
                 ($TS % 3600) // 60 + (event_id % 19) * 2 AS diff_min
          FROM events),
        agg AS (
          SELECT step, COUNT(*) AS n_obs,
                 SUM(diff_min) // COUNT(*) + 1 AS avg_delay_min,
                 MAX(diff_min) + 1 AS max_delay_min
          FROM obs GROUP BY step)
        SELECT step, n_obs, CAST(avg_delay_min AS BIGINT) AS avg_delay_min,
               CAST(max_delay_min AS BIGINT) AS max_delay_min,
               COALESCE(avg_delay_min >= lag(avg_delay_min)
                 OVER (ORDER BY step), TRUE) AS monotone
        FROM agg ORDER BY step""")),

    // ----- ts_hourly_schedule: learned hourly poll schedule --------------
    // odin_common/src/schedule.rs:35 get_hourly_schedule (+ RightEdge
    // compaction) /:51 get_next_hourly_event_dtg: live importers learn at
    // which minutes-of-hour a feed publishes — minute histogram with
    // round-up (01:01 counts as :02), consecutive non-zero spans
    // compacted to their right edge, and next-poll prediction after the
    // entity's last event (first scheduled minute past the current one,
    // else the first minute of the next hour; edge 60 naturally rolls
    // over). All integer math; the span compaction is the classic
    // gaps-and-islands grouping (m - row_number), windows run over ≤61
    // histogram rows per entity, never raw events.
    "ts_hourly_schedule" -> Q(
      build = (s, d) => {
        val hist = ev(s, d)
          .select(col("user_id"),
            (expr("(ts_sec % 3600) DIV 60")
              + when(col("ts_sec") % 60 > 0, 1L).otherwise(0L)).as("m"))
          .groupBy(col("user_id"), col("m"))
          .agg(count(lit(1)).as("cnt"))
        val comp = hist
          .withColumn("isl", col("m") - row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("m"))))
          .groupBy(col("user_id"), col("isl"))
          .agg(max(col("m")).as("sched_minute"), sum(col("cnt")).as("n_events"))
        val last = ev(s, d).groupBy(col("user_id"))
          .agg(max(col("ts_sec")).as("last_sec"))
          .select(col("user_id"),
            expr("(last_sec % 3600) DIV 60").as("lm"),
            expr("(last_sec DIV 3600) * 3600").as("base"))
        val nxt = comp.join(last, "user_id")
          .groupBy(col("user_id"), col("base"), col("lm"))
          .agg(min(when(col("sched_minute") > col("lm"), col("sched_minute")))
            .as("mn"), min(col("sched_minute")).as("m0"))
          .select(col("user_id"),
            coalesce(col("base") + col("mn") * 60,
              col("base") + 3600L + (col("m0") % 60) * 60).as("next_event_sec"))
        comp.join(nxt, "user_id")
          .select(col("user_id"), col("sched_minute"), col("n_events"),
            col("next_event_sec"))
          .orderBy(col("user_id"), col("sched_minute"))
      },
      oracle = Some(s"""
        WITH obs AS (
          SELECT user_id,
                 ($TS % 3600) // 60
                   + CASE WHEN $TS % 60 > 0 THEN 1 ELSE 0 END AS m
          FROM events),
        hist AS (
          SELECT user_id, m, COUNT(*) AS cnt FROM obs GROUP BY 1, 2),
        isl AS (
          SELECT user_id, m, cnt,
                 m - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY m) AS isl
          FROM hist),
        comp AS (
          SELECT user_id, isl, MAX(m) AS sched_minute,
                 CAST(SUM(cnt) AS BIGINT) AS n_events
          FROM isl GROUP BY 1, 2),
        last AS (
          SELECT user_id, (MAX($TS) % 3600) // 60 AS lm,
                 (MAX($TS) // 3600) * 3600 AS base
          FROM events GROUP BY 1),
        nxt AS (
          SELECT c.user_id,
                 COALESCE(l.base + MIN(CASE WHEN c.sched_minute > l.lm
                            THEN c.sched_minute END) * 60,
                          l.base + 3600 + (MIN(c.sched_minute) % 60) * 60)
                   AS next_event_sec
          FROM comp c JOIN last l USING (user_id)
          GROUP BY c.user_id, l.base, l.lm)
        SELECT c.user_id, c.sched_minute, c.n_events, n.next_event_sec
        FROM comp c JOIN nxt n USING (user_id)
        ORDER BY c.user_id, c.sched_minute""")),

    // ----- ts_covering_overpass: hotspot → covering overpass window ------
    // odin_orbital/src/firms.rs:499 find_covering_overpass / :520
    // is_covering_overpass: each FIRMS hotspot record is filed under the
    // overpass whose [start, end] covers its acquisition date, widened by
    // a leeway margin for downlink latency, scanning overpasses in order
    // and taking the FIRST cover (the reference's monotonicity
    // assumption). Windows here are a 95-min-orbit schedule per satellite
    // (sat = event_id % 5, epoch-anchored), with a 45-min leeway — wider
    // than the reference's 30 so adjacent widened windows overlap and the
    // first-cover rule is actually exercised. Scale shape: the window
    // catalog is O(days·sats) and broadcast; records join it on sat_id,
    // one shuffle for the final per-window rollup.
    "ts_covering_overpass" -> Q(
      build = (s, d) => {
        val sats = s.range(5).select(col("id").as("sat_id"))
        val wins = sats.crossJoin(s.range(460).select(col("id").as("k")))
          .withColumn("w_start",
            lit(1704067200L) + col("k") * 5700L + col("sat_id") * 780L)
          .withColumn("w_end", col("w_start") + 540L)
        val recs = ev(s, d).select(col("event_id"), col("ts_sec"),
          (col("event_id") % 5).as("sat_id"))
        val assigned = recs.join(broadcast(wins), Seq("sat_id"))
          .filter(col("ts_sec") >= col("w_start") - 2700L
            && col("ts_sec") <= col("w_end") + 2700L)
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_id")).orderBy(col("k"))))
          .filter(col("rn") === 1)
        assigned.groupBy(col("sat_id"), col("k"), col("w_start"))
          .agg(count(lit(1)).as("n_records"),
            sum(when(col("ts_sec").between(col("w_start"), col("w_end")), 1L)
              .otherwise(0L)).as("n_core"),
            min(col("ts_sec")).as("first_rec_sec"),
            max(col("ts_sec")).as("last_rec_sec"))
          .orderBy(col("sat_id"), col("k"))
      },
      oracle = Some(s"""
        WITH wins AS (
          SELECT s.s AS sat_id, g.k AS k,
                 1704067200 + g.k*5700 + s.s*780 AS w_start,
                 1704067200 + g.k*5700 + s.s*780 + 540 AS w_end
          FROM generate_series(0, 4) s(s), generate_series(0, 459) g(k)),
        recs AS (
          SELECT event_id, $TS AS ts_sec, event_id % 5 AS sat_id FROM events),
        cand AS (
          SELECT r.event_id, r.ts_sec, w.sat_id, w.k, w.w_start, w.w_end,
                 ROW_NUMBER() OVER (PARTITION BY r.event_id ORDER BY w.k) AS rn
          FROM recs r JOIN wins w ON w.sat_id = r.sat_id
          WHERE r.ts_sec >= w.w_start - 2700 AND r.ts_sec <= w.w_end + 2700)
        SELECT sat_id, k, w_start,
               CAST(COUNT(*) AS BIGINT) AS n_records,
               CAST(SUM(CASE WHEN ts_sec BETWEEN w_start AND w_end
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
               MIN(ts_sec) AS first_rec_sec, MAX(ts_sec) AS last_rec_sec
        FROM cand WHERE rn = 1
        GROUP BY sat_id, k, w_start
        ORDER BY sat_id, k""")),

    // ----- ts_sbs_merge: SBS feed parse + per-aircraft state merge -------
    // The ADS-B ingest path (odin_adsb/src/sbs.rs:151 parse_msg → adsb.rs
    // :128 AdsbData::update): a BaseStation CSV feed carries heterogeneous
    // partial updates — MSG,1 identification (callsign), MSG,3 airborne
    // position (lat/lon/alt, position sometimes absent), MSG,4 velocity
    // (gs/track/vrate), MSG,5 altitude reply, MSG,8 all-call (ignored) —
    // and the aircraft store merges each field from the latest message
    // that carried it. Re-expressed: synthesize the 22-field SBS line per
    // event (integers only, so the text round-trips exactly), parse it
    // back (split_part + strptime, mirroring get_utc_datetime at sbs.rs
    // :188), then fold per-aircraft state as last-non-null per field over
    // (ts, event-id) order — one shuffle keyed on icao24, the partition a
    // live tracker wants. Only position messages advance the store
    // timestamp (adsb.rs:139 `Some(timestamp)`), hence last_pos_sec.
    "ts_sbs_merge" -> Q(
      build = (s, d) => {
        val base = ev(s, d).select(col("event_id"), col("user_id"),
          col("value"), col("ts_sec"),
          expr(SbsK.icao).as("icao0"), expr(SbsK.mt).as("mt0"))
        val lines = base.select(expr(SbsK.line(
          "from_unixtime(ts_sec, 'yyyy/MM/dd')",
          "from_unixtime(ts_sec, 'HH:mm:ss')")).as("line"))
        val parsed = lines.select(
          expr(SbsK.pInt(2)).as("mt"), expr(SbsK.pBig(3)).as("eid"),
          expr("split_part(line, ',', 5)").as("icao24"),
          expr("""unix_timestamp(concat(split_part(line, ',', 7), ' ',
                 split_part(line, ',', 8)), 'yyyy/MM/dd HH:mm:ss')""").as("tsp"),
          expr(SbsK.callsign).as("cs"),
          expr(SbsK.optBig(12)).as("alt_ft"), expr(SbsK.optBig(13)).as("gs_kt"),
          expr(SbsK.optBig(14)).as("track_deg"), expr(SbsK.optBig(15)).as("lat_ud"),
          expr(SbsK.optBig(16)).as("lon_ud"), expr(SbsK.optBig(17)).as("vrate_fpm"))
        val w = Window.partitionBy(col("icao24")).orderBy(col("tsp"), col("eid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val p = Window.partitionBy(col("icao24"))
        parsed
          .withColumn("callsign", last(col("cs"), ignoreNulls = true).over(w))
          .withColumn("lat", last(col("lat_ud"), ignoreNulls = true).over(w) / 100000.0)
          .withColumn("lon", last(col("lon_ud"), ignoreNulls = true).over(w) / 100000.0)
          .withColumn("alt", last(col("alt_ft"), ignoreNulls = true).over(w))
          .withColumn("gs", last(col("gs_kt"), ignoreNulls = true).over(w))
          .withColumn("trk", last(col("track_deg"), ignoreNulls = true).over(w))
          .withColumn("vr", last(col("vrate_fpm"), ignoreNulls = true).over(w))
          .withColumn("last_pos_sec",
            last(when(col("lat_ud").isNotNull, col("tsp")), ignoreNulls = true).over(w))
          .withColumn("n_msgs", count(lit(1)).over(p))
          .withColumn("n_pos",
            sum(when(col("lat_ud").isNotNull, 1L).otherwise(0L)).over(p))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("icao24")).orderBy(col("tsp").desc, col("eid").desc)))
          .filter(col("rn") === 1)
          .select(col("icao24"), col("callsign"), col("lat"), col("lon"),
            col("alt").as("alt_ft"), col("gs").as("gs_kt"),
            col("trk").as("track_deg"), col("vr").as("vrate_fpm"),
            col("tsp").as("last_update_sec"), col("last_pos_sec"),
            col("n_msgs"), col("n_pos"))
          .orderBy(col("icao24"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT event_id, user_id, value, $TS AS ts_sec,
                 ${SbsK.icao} AS icao0, ${SbsK.mt} AS mt0
          FROM events),
        lines AS (
          SELECT ${SbsK.line(
            "strftime(make_timestamp(ts_sec * 1000000), '%Y/%m/%d')",
            "strftime(make_timestamp(ts_sec * 1000000), '%H:%M:%S')")} AS line
          FROM base),
        parsed AS (
          SELECT ${SbsK.pInt(2)} AS mt, ${SbsK.pBig(3)} AS eid,
                 split_part(line, ',', 5) AS icao24,
                 CAST(floor(epoch(strptime(concat(split_part(line, ',', 7), ' ',
                   split_part(line, ',', 8)), '%Y/%m/%d %H:%M:%S'))) AS BIGINT) AS tsp,
                 ${SbsK.callsign} AS cs,
                 ${SbsK.optBig(12)} AS alt_ft, ${SbsK.optBig(13)} AS gs_kt,
                 ${SbsK.optBig(14)} AS track_deg, ${SbsK.optBig(15)} AS lat_ud,
                 ${SbsK.optBig(16)} AS lon_ud, ${SbsK.optBig(17)} AS vrate_fpm
          FROM lines),
        state AS (
          SELECT icao24, tsp, eid,
                 last_value(cs IGNORE NULLS) OVER w AS callsign,
                 last_value(lat_ud IGNORE NULLS) OVER w / 100000.0 AS lat,
                 last_value(lon_ud IGNORE NULLS) OVER w / 100000.0 AS lon,
                 last_value(alt_ft IGNORE NULLS) OVER w AS alt_ft,
                 last_value(gs_kt IGNORE NULLS) OVER w AS gs_kt,
                 last_value(track_deg IGNORE NULLS) OVER w AS track_deg,
                 last_value(vrate_fpm IGNORE NULLS) OVER w AS vrate_fpm,
                 last_value(CASE WHEN lat_ud IS NOT NULL THEN tsp END IGNORE NULLS)
                   OVER w AS last_pos_sec,
                 COUNT(*) OVER (PARTITION BY icao24) AS n_msgs,
                 CAST(SUM(CASE WHEN lat_ud IS NOT NULL THEN 1 ELSE 0 END)
                   OVER (PARTITION BY icao24) AS BIGINT) AS n_pos,
                 ROW_NUMBER() OVER (PARTITION BY icao24
                                    ORDER BY tsp DESC, eid DESC) AS rn
          FROM parsed
          WINDOW w AS (PARTITION BY icao24 ORDER BY tsp, eid
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT icao24, callsign, lat, lon, alt_ft, gs_kt, track_deg,
               vrate_fpm, tsp AS last_update_sec, last_pos_sec, n_msgs, n_pos
        FROM state WHERE rn = 1
        ORDER BY icao24""")),

    // ----- ts_quantile_sketch: mergeable histogram quantiles -------------
    // The approximate-quantile shape that actually scales: a fixed-
    // boundary histogram sketch (bin = floor(value·8), ~1/8-unit
    // resolution) whose bin counts are a map-side-combinable groupBy —
    // the sketch merges associatively across 1000 executors, unlike an
    // exact percentile sort. Quantiles read off the cumulative histogram
    // (window over the per-type bin axis — thousands of rows, not the
    // data). Deterministic by construction (integer bins, integer
    // counts), so unlike t-digest the same sketch emerges on every
    // engine: the DuckDB oracle replays it exactly. Resolution is the
    // bin width — the error bound a production pipeline actually wants
    // stated, not a t-digest's data-dependent one.
    "ts_quantile_sketch" -> Q(
      build = (s, d) => {
        val hist = ev(s, d)
          .select(col("event_type"),
            floor(col("value") * 8.0).cast(LongType).as("bin"))
          .groupBy(col("event_type"), col("bin"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = hist.withColumn("cum", sum(col("cnt")).over(w))
        val tot = hist.groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_total"))
        cum.join(tot, Seq("event_type"))
          .withColumn("q", explode(array(lit(0.5), lit(0.95), lit(0.99))))
          .filter(col("cum") >= ceil(col("q") * col("n_total")))
          .groupBy(col("event_type"), col("q"), col("n_total"))
          .agg(min(col("bin")).as("qbin"))
          .select(col("event_type"), col("q"), col("n_total"),
            (col("qbin") / 8.0).as("q_value"))
          .orderBy(col("event_type"), col("q"))
      },
      oracle = Some("""
        WITH hist AS (
          SELECT event_type, CAST(floor(value * 8.0) AS BIGINT) AS bin,
                 COUNT(*) AS cnt
          FROM events GROUP BY 1, 2),
        cum AS (
          SELECT event_type, bin,
                 SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM hist),
        tot AS (
          SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n_total
          FROM hist GROUP BY 1),
        qs AS (
          SELECT c.event_type, t.n_total, CAST(q.q AS DOUBLE) AS q,
                 MIN(c.bin) AS qbin
          FROM cum c
          JOIN tot t ON t.event_type = c.event_type
          CROSS JOIN (VALUES (0.5), (0.95), (0.99)) q(q)
          WHERE c.cum >= ceil(CAST(q.q AS DOUBLE) * t.n_total)
          GROUP BY 1, 2, 3)
        SELECT event_type, q, n_total, qbin / 8.0 AS q_value
        FROM qs ORDER BY event_type, q""")),

    // ----- ts_anomaly_mad: robust per-entity anomaly scores --------------
    // The outlier detector ops teams actually deploy: median + MAD (not
    // mean + stddev — one spike shouldn't move its own threshold), score
    // = 0.6745·|x−med|/MAD (the standard consistency constant so MAD
    // estimates σ under normality), flag > 3.5 (Iglewicz-Hodgkin).
    // Determinism without trusting cross-engine quantile interpolation:
    // the 2-decimal values are EXACT in integer cents, and both engines'
    // median interpolation on integers is (a+b)/2 — exact in doubles —
    // so med/MAD/score are bit-identical with no quantization at all.
    // Scale shape: two per-entity sort-aggregations (per-key series are
    // session-bounded) + a broadcast-able stats join back to the rows.
    "ts_anomaly_mad" -> Q(
      build = (s, d) => {
        val cents = ev(s, d)
          .select(col("user_id"), col("event_id"), col("value"),
            floor(col("value") * 100.0 + 0.5).cast(LongType).as("c"))
        val med = cents.groupBy(col("user_id"))
          .agg(expr("percentile(c, 0.5D)").as("med_c"),
            count(lit(1)).as("n_events"))
        val dev = cents.join(med, "user_id")
          .withColumn("adev", abs(col("c") - col("med_c")))
        val mad = dev.groupBy(col("user_id"))
          .agg(expr("percentile(adev, 0.5D)").as("mad_c"))
        dev.join(mad, "user_id")
          .withColumn("score",
            when(col("mad_c") === 0.0, 0.0)
              .otherwise(lit(0.6745) * col("adev") / col("mad_c")))
          .select(col("user_id"), col("event_id"), col("value"),
            (col("med_c") / 100.0).as("median_value"),
            // floor-quantize, not round: Spark rounds the shortest decimal
            // repr (BigDecimal.valueOf) while DuckDB rounds the binary
            // double, so a score landing on a .5e-6 tie flips between
            // engines; floor has no ties
            (floor(col("score") * 1000000.0) / 1000000.0).as("mad_score"),
            (col("score") > 3.5).as("is_anomaly"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some("""
        WITH cents AS (
          SELECT user_id, event_id, value,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS c
          FROM events),
        med AS (
          SELECT user_id, median(c) AS med_c, COUNT(*) AS n_events
          FROM cents GROUP BY 1),
        dev AS (
          SELECT c.user_id, c.event_id, c.value, c.c, m.med_c,
                 abs(c.c - m.med_c) AS adev
          FROM cents c JOIN med m ON m.user_id = c.user_id),
        mad AS (
          SELECT user_id, median(adev) AS mad_c FROM dev GROUP BY 1),
        scored AS (
          SELECT d.user_id, d.event_id, d.value, d.med_c,
                 CASE WHEN m.mad_c = 0.0 THEN 0.0
                      ELSE 0.6745 * d.adev / m.mad_c END AS score
          FROM dev d JOIN mad m ON m.user_id = d.user_id)
        SELECT user_id, event_id, value,
               med_c / 100.0 AS median_value,
               FLOOR(score * 1000000.0) / 1000000.0 AS mad_score,
               score > 3.5 AS is_anomaly
        FROM scored ORDER BY user_id, event_id"""))
  ,

    // ----- ts_retention: cohort retention matrix -------------------------
    // The product-analytics staple over an entity/event stream: cohort =
    // the entity's first-seen day, age = days since cohort, cell =
    // distinct entities from that cohort active at that age (+ the exact
    // retained fraction). Scale shape: first-seen is one combinable
    // min-groupBy on the entity; activity is a distinct on (entity, day);
    // the cohort join is keyed on the entity (no window, no all-days
    // explode); the matrix agg groups by (cohort, age) — thousands of
    // cells however big the stream. Fractions are exact integer ratios.
    "ts_retention" -> Q(
      build = (s, d) => {
        val firstSeen = ev(s, d).groupBy(col("user_id"))
          .agg(min(col("ts_sec")).as("first_ts"))
          .withColumn("cohort_day", expr("first_ts div 86400"))
        val activity = ev(s, d)
          .select(col("user_id"), expr("ts_sec div 86400").as("day"))
          .distinct()
        val cohortSize = firstSeen.groupBy(col("cohort_day"))
          .agg(count(lit(1)).as("cohort_n"))
        activity.join(firstSeen, "user_id")
          .withColumn("age_day", col("day") - col("cohort_day"))
          .groupBy(col("cohort_day"), col("age_day"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .join(cohortSize, "cohort_day")
          .withColumn("retention",
            col("n_active").cast(DoubleType) / col("cohort_n"))
          .select(col("cohort_day"), col("age_day"), col("n_active"),
            col("cohort_n"), col("retention"))
          .orderBy(col("cohort_day"), col("age_day"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events),
        first_seen AS (
          SELECT user_id, MIN(ts_sec) // 86400 AS cohort_day
          FROM ev GROUP BY 1),
        cohort_size AS (
          SELECT cohort_day, COUNT(*) AS cohort_n
          FROM first_seen GROUP BY 1),
        activity AS (
          SELECT DISTINCT user_id, ts_sec // 86400 AS day FROM ev),
        cells AS (
          SELECT f.cohort_day, a.day - f.cohort_day AS age_day,
                 COUNT(DISTINCT a.user_id) AS n_active
          FROM activity a JOIN first_seen f ON f.user_id = a.user_id
          GROUP BY 1, 2)
        SELECT c.cohort_day, c.age_day, c.n_active, s.cohort_n,
               CAST(c.n_active AS DOUBLE) / s.cohort_n AS retention
        FROM cells c JOIN cohort_size s ON s.cohort_day = c.cohort_day
        ORDER BY c.cohort_day, c.age_day"""))
  ,

    // ----- ts_attribution: last-touch conversion attribution -------------
    // The funnel-analytics companion to ts_funnel: each conversion
    // (purchase) is attributed to the user's most recent preceding
    // non-conversion touch within a 7-day window — IGNORE-NULLS
    // last_value over the per-entity event order, the one-shuffle shape
    // (no per-conversion lookback join, which would be a range self-join
    // at 100 TB). Emits the row-level attribution (channel + touch age).
    "ts_attribution" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .withColumn("attr_type",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .withColumn("attr_ts",
            last(when(col("event_type") =!= "purchase", col("ts_sec")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            when(col("attr_ts").isNotNull
              && col("ts_sec") - col("attr_ts") <= 604800L, col("attr_type"))
              .otherwise("none").as("channel"),
            when(col("attr_ts").isNotNull
              && col("ts_sec") - col("attr_ts") <= 604800L,
              col("ts_sec") - col("attr_ts")).otherwise(-1L)
              .as("touch_age_sec"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some("""
        WITH ev AS (
          SELECT user_id, event_id, event_type,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events),
        tagged AS (
          SELECT user_id, event_id, event_type, ts_sec,
                 LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS) OVER w
                   AS attr_type,
                 LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                 THEN ts_sec END IGNORE NULLS) OVER w
                   AS attr_ts
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        SELECT user_id, event_id, ts_sec,
               CASE WHEN attr_ts IS NOT NULL AND ts_sec - attr_ts <= 604800
                    THEN attr_type ELSE 'none' END AS channel,
               CASE WHEN attr_ts IS NOT NULL AND ts_sec - attr_ts <= 604800
                    THEN ts_sec - attr_ts ELSE -1 END AS touch_age_sec
        FROM tagged WHERE event_type = 'purchase'
        ORDER BY user_id, event_id""")),

    // ----- ts_acf: per-entity autocorrelation function -------------------
    // The sample ACF at lags 1..4 over each entity's value series — the
    // standard seasonality/memory diagnostic run before picking smoothing
    // or changepoint windows (complements ts_ewma / ts_changepoint). Kept
    // EXACT across engines by clearing denominators: with S = Σv and n
    // the series length (v in integer cents), every residual term
    // (n·v_t − S) is an integer, so numerator and denominator are
    // integer sums of products — accumulated as DECIMAL(38,0) since
    // (n·v)² overflows BIGINT at sf ≥ 0.1 — and only the final ratio
    // goes through one double division. One shuffle keyed on the entity;
    // the 4 lags ride the same per-entity window.
    "ts_acf" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val p = Window.partitionBy(col("user_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v"))
          .withColumn("n", count(lit(1)).over(p))
          .withColumn("sv", sum(col("v")).over(p))
          .withColumn("r", col("n") * col("v") - col("sv"))
        val lagged = (1 to 4).foldLeft(base) { (df, k) =>
          df.withColumn(s"r$k", lead(col("r"), k).over(w))
        }
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
        lagged.groupBy(col("user_id"))
          .agg(
            max(col("n")).as("n"),
            sum(dec(col("r") * col("r"))).as("den"),
            sum(when(col("r1").isNotNull, dec(col("r") * col("r1")))).as("n1"),
            sum(when(col("r2").isNotNull, dec(col("r") * col("r2")))).as("n2"),
            sum(when(col("r3").isNotNull, dec(col("r") * col("r3")))).as("n3"),
            sum(when(col("r4").isNotNull, dec(col("r") * col("r4")))).as("n4"))
          .filter(col("den") > 0)
          .select(col("user_id"), col("n"),
            (col("n1").cast(DoubleType) / col("den").cast(DoubleType)).as("acf1"),
            (col("n2").cast(DoubleType) / col("den").cast(DoubleType)).as("acf2"),
            (col("n3").cast(DoubleType) / col("den").cast(DoubleType)).as("acf3"),
            (col("n4").cast(DoubleType) / col("den").cast(DoubleType)).as("acf4"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v
          FROM events),
        st AS (
          SELECT user_id, ts_sec, event_id, v,
                 COUNT(*) OVER p AS n, CAST(SUM(v) OVER p AS BIGINT) AS sv
          FROM base WINDOW p AS (PARTITION BY user_id)),
        r0 AS (
          SELECT user_id, n, n*v - sv AS r,
                 lead(n*v - sv, 1) OVER w AS r1, lead(n*v - sv, 2) OVER w AS r2,
                 lead(n*v - sv, 3) OVER w AS r3, lead(n*v - sv, 4) OVER w AS r4
          FROM st WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        agg AS (
          SELECT user_id, MAX(n) AS n,
                 SUM(CAST(r*r AS DECIMAL(38,0))) AS den,
                 SUM(CASE WHEN r1 IS NOT NULL THEN CAST(r*r1 AS DECIMAL(38,0)) END) AS n1,
                 SUM(CASE WHEN r2 IS NOT NULL THEN CAST(r*r2 AS DECIMAL(38,0)) END) AS n2,
                 SUM(CASE WHEN r3 IS NOT NULL THEN CAST(r*r3 AS DECIMAL(38,0)) END) AS n3,
                 SUM(CASE WHEN r4 IS NOT NULL THEN CAST(r*r4 AS DECIMAL(38,0)) END) AS n4
          FROM r0 GROUP BY 1)
        SELECT user_id, n,
               CAST(n1 AS DOUBLE)/CAST(den AS DOUBLE) AS acf1,
               CAST(n2 AS DOUBLE)/CAST(den AS DOUBLE) AS acf2,
               CAST(n3 AS DOUBLE)/CAST(den AS DOUBLE) AS acf3,
               CAST(n4 AS DOUBLE)/CAST(den AS DOUBLE) AS acf4
        FROM agg WHERE den > 0 ORDER BY user_id""")),

    // ----- ts_benford: first-digit distribution audit --------------------
    // Benford's-law conformance of the value column per event type — the
    // classic data-quality / fraud screen over any money-like feed. The
    // first significant digit is taken from the decimal text of the
    // integer cents (pure string math, engine-exact); expected Benford
    // shares are inlined as identical literals in both plans, so the
    // chi-square statistic is the same double arithmetic on exact integer
    // counts both sides.
    "ts_benford" -> Q(
      build = (s, d) => {
        val expected = (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd))
        val expArr = s"array(${expected.map(_.toString + "e0").mkString(", ")})"
        ev(s, d)
          .select(col("event_type"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("cents"))
          .filter(col("cents") > 0)
          .withColumn("digit",
            expr("CAST(substring(CAST(cents AS STRING), 1, 1) AS INT)"))
          .groupBy(col("event_type"), col("digit"))
          .agg(count(lit(1)).as("obs"))
          .withColumn("n",
            sum(col("obs")).over(Window.partitionBy(col("event_type"))))
          .withColumn("expected",
            expr(s"element_at($expArr, digit)") * col("n"))
          .withColumn("chi_term",
            (col("obs") - col("expected")) * (col("obs") - col("expected"))
              / col("expected"))
          .groupBy(col("event_type"))
          .agg(max(col("n")).as("n"),
            count(lit(1)).as("n_digits"),
            qsum(col("chi_term")).as("chi2"))
          .orderBy(col("event_type"))
      },
      oracle = Some {
        val expected = (1 to 9).map(dd => math.log10(1.0 + 1.0 / dd))
        val expRows = (1 to 9).map(dd => s"($dd,${expected(dd - 1)}e0)").mkString(",")
        s"""
        WITH exp_t(digit, share) AS (VALUES $expRows),
        cents AS (
          SELECT event_type, CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS cents
          FROM events WHERE CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) > 0),
        digits AS (
          SELECT event_type,
                 CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
                 COUNT(*) AS obs
          FROM cents GROUP BY 1, 2),
        wn AS (
          SELECT event_type, digit, obs,
                 CAST(SUM(obs) OVER (PARTITION BY event_type) AS BIGINT) AS n
          FROM digits),
        terms AS (
          SELECT w.event_type, w.n,
                 (w.obs - e.share*w.n)*(w.obs - e.share*w.n)/(e.share*w.n)
                   AS chi_term
          FROM wn w JOIN exp_t e ON w.digit = e.digit)
        SELECT event_type, MAX(n) AS n, COUNT(*) AS n_digits,
               ${QSUM("chi_term")} AS chi2
        FROM terms GROUP BY 1 ORDER BY event_type"""
      }),

    // ----- ts_forecast_cycle: forecast-run timeline expansion ------------
    // The odin_openmeteo update-cycle algebra (lib.rs:183 base_date —
    // floor to the model's update interval after subtracting the
    // availability delay; :178 next_update; :188 forecasts — the step
    // expansion to cover a requested duration): per (event hour, model
    // config) emit the effective base run, the next-update instant, and
    // the covered step count. Model configs are a 4-row broadcast derived
    // from the region table (interval 1..4 h, delay 10..40 min). All
    // integer epoch math — no floats anywhere.
    "ts_forecast_cycle" -> Q(
      build = (s, d) => {
        val models = Tables.t(s, d, "region")
          .select(col("r_regionkey").cast(LongType).as("model_id"),
            ((col("r_regionkey") % 4 + 1) * 3600L).as("upd_sec"),
            ((col("r_regionkey") % 4 + 1) * 600L).as("delay_sec"))
        val hours = ev(s, d)
          .select((col("ts_sec") - col("ts_sec") % 3600).as("hour_sec"))
          .distinct()
        hours.crossJoin(broadcast(models))
          .withColumn("base_sec",
            (col("hour_sec") - col("delay_sec"))
              - ((col("hour_sec") - col("delay_sec")) % col("upd_sec")))
          .withColumn("next_update_sec",
            col("base_sec") + col("upd_sec") + col("delay_sec"))
          .withColumn("n_steps",
            ((lit(172800L) - (col("hour_sec") - col("base_sec"))) / lit(3600L))
              .cast(LongType))
          .select(col("hour_sec"), col("model_id"), col("base_sec"),
            col("next_update_sec"), col("n_steps"))
          .orderBy(col("hour_sec"), col("model_id"))
      },
      oracle = Some(s"""
        WITH models AS (
          SELECT CAST(r_regionkey AS BIGINT) AS model_id,
                 CAST((r_regionkey % 4 + 1) * 3600 AS BIGINT) AS upd_sec,
                 CAST((r_regionkey % 4 + 1) * 600 AS BIGINT) AS delay_sec
          FROM region),
        hours AS (
          SELECT DISTINCT $TS - $TS % 3600 AS hour_sec FROM events),
        cyc AS (
          SELECT hour_sec, model_id, upd_sec, delay_sec,
                 (hour_sec - delay_sec) - ((hour_sec - delay_sec) % upd_sec)
                   AS base_sec
          FROM hours, models)
        SELECT hour_sec, model_id, base_sec,
               base_sec + upd_sec + delay_sec AS next_update_sec,
               CAST((172800 - (hour_sec - base_sec)) / 3600 AS BIGINT)
                 AS n_steps
        FROM cyc ORDER BY hour_sec, model_id""")),

    // ----- ts_holt: finite-window Holt trend smoother --------------------
    // Holt's double-exponential (level+trend) smoother — the trend-aware
    // upgrade of ts_ewma every forecasting pipeline reaches for next.
    // The recursion is a LINEAR filter, so the 8-step finite-horizon
    // state (init: level = oldest value, trend = 0 — exactly ts_ewma's
    // finite-horizon scheme) is a fixed 9-tap convolution; the taps are
    // unrolled at build time into shared double literals. Per row: 8 lag
    // taps on integer cents + one fixed-order dot product — identical
    // IEEE arithmetic both engines, one per-entity window shuffle, no
    // recursion in the plan. Forecast = level + trend (h=1).
    "ts_holt" -> Q(
      build = (s, d) => {
        val (lc, bc) = HoltK.taps
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v0"))
        val lagged = (1 to 8).foldLeft(base) { (df, k) =>
          df.withColumn(s"v$k", lag(col("v0"), k).over(w))
        }
        lagged.filter(col("v8").isNotNull)
          .withColumn("level_c", expr(HoltK.dot(lc)))
          .withColumn("trend_c", expr(HoltK.dot(bc)))
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            (col("v0") / lit(100.0)).as("value"),
            (col("level_c") / lit(100.0)).as("level"),
            (col("trend_c") / lit(100.0)).as("trend"),
            ((col("level_c") + col("trend_c")) / lit(100.0)).as("forecast_1"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      oracle = Some {
        val (lc, bc) = HoltK.taps
        s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v0
          FROM events),
        lagged AS (
          SELECT *,
                 ${(1 to 8).map(k =>
                   s"lag(v0, $k) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS v$k")
                   .mkString(", ")}
          FROM base),
        sm AS (
          SELECT user_id, ts_sec, event_id, v0,
                 ${HoltK.dot(lc)} AS level_c, ${HoltK.dot(bc)} AS trend_c
          FROM lagged WHERE v8 IS NOT NULL)
        SELECT user_id, ts_sec, event_id,
               v0 / 100.0 AS value,
               level_c / 100.0 AS level,
               trend_c / 100.0 AS trend,
               (level_c + trend_c) / 100.0 AS forecast_1
        FROM sm ORDER BY user_id, ts_sec, event_id"""
      }),

    // ----- ts_entropy: per-entity behavioral entropy ---------------------
    // Shannon entropy of each entity's event-type mix — the behavioral
    // diversity screen (bots/stuck sensors emit near-zero entropy, mixed
    // interactive use sits near ln k). ln is quantized at 6 decimals and
    // the weighted sum runs in DECIMAL (doc_dsir scheme), so the score is
    // engine-exact. One combinable (entity, type) shuffle.
    "ts_entropy" -> Q(
      build = (s, d) => {
        val byType = ev(s, d).groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
          .withColumn("n",
            sum(col("cnt")).over(Window.partitionBy(col("user_id"))))
        byType
          .withColumn("lp", expr(
            "CAST(round(ln(CAST(cnt AS DOUBLE) / n), 6) AS DECIMAL(18,6))"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n"), count(lit(1)).as("n_types"),
            sum(expr("CAST(CAST(cnt AS DECIMAL(18,0)) * lp AS DECIMAL(30,6))"))
              .as("wsum"))
          .selectExpr("user_id", "n", "n_types",
            "0.0 - CAST(wsum AS DOUBLE) / n AS entropy")
          .withColumn("degenerate", col("entropy") < 0.1)
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH bt AS (
          SELECT user_id, event_type, COUNT(*) AS cnt,
                 CAST(SUM(COUNT(*)) OVER (PARTITION BY user_id) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        lp AS (
          SELECT user_id, cnt, n,
                 CAST(round(ln(CAST(cnt AS DOUBLE) / n), 6) AS DECIMAL(18,6))
                   AS lp
          FROM bt),
        agg AS (
          SELECT user_id, MAX(n) AS n, COUNT(*) AS n_types,
                 SUM(CAST(CAST(cnt AS DECIMAL(18,0)) * lp AS DECIMAL(30,6)))
                   AS wsum
          FROM lp GROUP BY 1)
        SELECT user_id, n, n_types,
               0.0 - CAST(wsum AS DOUBLE) / n AS entropy,
               0.0 - CAST(wsum AS DOUBLE) / n < 0.1 AS degenerate
        FROM agg ORDER BY user_id""")),

    // ----- ts_sax: symbolic aggregate approximation ------------------------
    // SAX (Lin/Keogh) — the time-series-mining workhorse that turns each
    // entity's series into a short symbol string: z-normalize, piecewise
    // aggregate over 8-reading frames, map each frame mean to one of 4
    // breakpoint symbols, concatenate in frame order. Downstream, SAX
    // words feed motif/anomaly search as plain string keys (exact-dedup
    // family machinery applies directly). Determinism: per-entity stats
    // and frame sums stay DECIMAL-exact; each frame's z value is ONE
    // shared-text double chain, so the breakpoint CASE and the word are
    // engine-identical. One entity shuffle + one frame groupBy.
    "ts_sax" -> Q(
      build = (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("wi", expr("(rn - 1) div 8"))
        val stats = ev(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(decP(col("value"))).as("sumd"),
            sum(decP(col("value")) * decP(col("value"))).as("sumsq"))
        val frames = base.groupBy(col("user_id"), col("wi"))
          .agg(count(lit(1)).as("wn"), sum(decP(col("value"))).as("paa_sum"))
          .filter(col("wn") === 8)
        frames.join(stats, Seq("user_id"))
          .selectExpr("user_id", "wi", SaxK.zp)
          .selectExpr("user_id", "wi", SaxK.sym)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_windows"),
            array_join(expr("transform(array_sort(collect_list(struct(wi, sym)))," +
              " x -> x.sym)"), "").as("sax_word"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, value,
                 (ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY $TS, event_id) - 1) // 8 AS wi
          FROM events),
        stats AS (
          SELECT user_id, COUNT(*) AS n,
                 SUM(CAST(value AS DECIMAL(12,2))) AS sumd,
                 SUM(CAST(value AS DECIMAL(12,2))
                     * CAST(value AS DECIMAL(12,2))) AS sumsq
          FROM events GROUP BY 1),
        frames AS (
          SELECT user_id, wi, COUNT(*) AS wn,
                 SUM(CAST(value AS DECIMAL(12,2))) AS paa_sum
          FROM base GROUP BY 1, 2
          HAVING COUNT(*) = 8),
        zp AS (
          SELECT f.user_id, f.wi, ${SaxK.zp}
          FROM frames f JOIN stats USING (user_id)),
        syms AS (SELECT user_id, wi, ${SaxK.sym} FROM zp)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
               string_agg(sym, '' ORDER BY wi) AS sax_word
        FROM syms GROUP BY 1 ORDER BY user_id""")),

    // ----- ts_burstiness: inter-event burstiness + Fano factor -----------
    // The two dimensionless cadence statistics a feed-health monitor
    // computes per entity (Goh & Barabási burstiness B = (σ−μ)/(σ+μ) of
    // the inter-event gaps, and the Fano factor σ²/μ): B ≈ −1 for a
    // metronome (scheduled sensor), 0 for Poisson arrivals, → 1 for
    // bursty human/incident traffic — the screen that separates devices
    // on a reporting schedule from event-driven ones before schedule
    // learning is attempted. Gap moments are exact BIGINT sums off one
    // lag window; the two ratios are a single shared double chain.
    "ts_burstiness" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"))
          .withColumn("gap", col("ts_sec") - lag(col("ts_sec"), 1).over(w))
          .filter(col("gap").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sum_gap"),
            sum(col("gap") * col("gap")).as("sumsq_gap"))
          .filter(col("n_gaps") >= 2 && col("sum_gap") > 0)
          .withColumn("burstiness", expr(BurstK.b))
          .withColumn("fano", expr(BurstK.fano))
          .select(col("user_id"), col("n_gaps"), col("sum_gap"),
            col("sumsq_gap"), col("burstiness"), col("fano"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH gaps AS (
          SELECT user_id,
                 ts_sec - lag(ts_sec, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) AS gap
          FROM (SELECT user_id, $TS AS ts_sec, event_id FROM events)),
        agg AS (
          SELECT user_id, COUNT(*) AS n_gaps,
                 CAST(SUM(gap) AS BIGINT) AS sum_gap,
                 CAST(SUM(gap * gap) AS BIGINT) AS sumsq_gap
          FROM gaps WHERE gap IS NOT NULL
          GROUP BY 1 HAVING COUNT(*) >= 2 AND SUM(gap) > 0)
        SELECT user_id, n_gaps, sum_gap, sumsq_gap,
               ${BurstK.b} AS burstiness,
               ${BurstK.fano} AS fano
        FROM agg ORDER BY user_id""")),

    // ----- ts_resample_locf: regular-grid resampling with bounded LOCF ---
    // The resampling step every downstream model wants before it sees
    // sensor data: project each entity's irregular readings onto an
    // hourly grid, carrying the LAST observation forward — but only up
    // to a staleness bound (4 h), past which the cell reports NULL and
    // stale=true rather than a lie (the odin store answers "position as
    // of t" the same way: latest-at-or-before, aged out). Shape: the
    // hour grid explodes per entity from its OWN first/last hour (never
    // a global calendar cross join), one union + one last-non-null
    // window over (entity, time) — the ts_interpolate family's shuffle
    // budget. Values stay exact integer cents until the final /100.
    "ts_resample_locf" -> Q(
      build = (s, d) => {
        val obs = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
        val span = obs.groupBy(col("user_id"))
          .agg(expr("min(ts_sec) div 3600").as("h0"),
            expr("max(ts_sec) div 3600").as("h1"))
        val grid = span
          .withColumn("hour", explode(expr("sequence(h0, h1)")))
          .select(col("user_id"),
            (col("hour") * 3600 + 3599).as("ts_sec"),
            lit(null).cast(LongType).as("event_id"),
            lit(null).cast(LongType).as("vc"),
            lit(1).as("is_grid"))
        val all = obs.withColumn("is_grid", lit(0)).unionByName(grid)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("is_grid"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        all
          .withColumn("lv", last(col("vc"), ignoreNulls = true).over(w))
          .withColumn("lt", last(when(col("vc").isNotNull, col("ts_sec")),
            ignoreNulls = true).over(w))
          .filter(col("is_grid") === 1)
          .withColumn("hour", expr("(ts_sec - 3599) div 3600"))
          .withColumn("age_sec", col("ts_sec") - col("lt"))
          .select(col("user_id"), col("hour"),
            when(col("age_sec") <= 14400, col("lv") / lit(100.0))
              .as("value"),
            col("age_sec"),
            (col("age_sec") > 14400 || col("lt").isNull).as("stale"))
          .orderBy(col("user_id"), col("hour"))
      },
      oracle = Some(s"""
        WITH obs AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc
          FROM events),
        span AS (
          SELECT user_id, MIN(ts_sec) // 3600 AS h0, MAX(ts_sec) // 3600 AS h1
          FROM obs GROUP BY 1),
        grid AS (
          SELECT s.user_id, g.h AS hour, g.h * 3600 + 3599 AS ts_sec,
                 CAST(NULL AS BIGINT) AS event_id,
                 CAST(NULL AS BIGINT) AS vc, 1 AS is_grid
          FROM span s, LATERAL unnest(generate_series(s.h0, s.h1)) AS g(h)),
        allr AS (
          SELECT user_id, ts_sec, event_id, vc, 0 AS is_grid FROM obs
          UNION ALL
          SELECT user_id, ts_sec, event_id, vc, is_grid FROM grid),
        filled AS (
          SELECT *,
                 last_value(vc IGNORE NULLS) OVER w AS lv,
                 last_value(CASE WHEN vc IS NOT NULL THEN ts_sec END
                   IGNORE NULLS) OVER w AS lt
          FROM allr
          WINDOW w AS (PARTITION BY user_id
            ORDER BY ts_sec, is_grid, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT user_id, (ts_sec - 3599) // 3600 AS hour,
               CASE WHEN ts_sec - lt <= 14400 THEN lv / 100.0 END AS value,
               ts_sec - lt AS age_sec,
               (ts_sec - lt > 14400 OR lt IS NULL) AS stale
        FROM filled WHERE is_grid = 1
        ORDER BY user_id, hour""")),

    // ----- ts_motif_join: cross-entity motif discovery via SAX words -----
    // The scalable answer to "which entities share behavior patterns":
    // symbolize every entity's frames (the ts_sax machinery), slide a
    // 4-frame word over the symbol stream, and HASH-JOIN identical words
    // across entities — the standard symbolization trick that turns
    // cross-series motif search from O(entities² · frames²) distance
    // joins into one word-keyed groupBy (Lin/Keogh SAX motif discovery;
    // ts_motif_discord covers the within-entity exact-distance version).
    // The symbol chain is the SAME shared zp/sym text as ts_sax, so the
    // words — and hence the join — are engine-identical.
    "ts_motif_join" -> Q(
      build = (s, d) => {
        val wOrd = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .withColumn("rn", row_number().over(wOrd))
          .withColumn("wi", expr("(rn - 1) div 8"))
        val stats = ev(s, d).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            sum(decP(col("value"))).as("sumd"),
            sum(decP(col("value")) * decP(col("value"))).as("sumsq"))
        val frames = base.groupBy(col("user_id"), col("wi"))
          .agg(count(lit(1)).as("wn"), sum(decP(col("value"))).as("paa_sum"))
          .filter(col("wn") === 8)
        val syms = frames.join(stats, Seq("user_id"))
          .selectExpr("user_id", "wi", SaxK.zp)
          .selectExpr("user_id", "wi", SaxK.sym)
        val wSeq = Window.partitionBy(col("user_id")).orderBy(col("wi"))
        val words = syms
          .withColumn("s1", lead(col("sym"), 1).over(wSeq))
          .withColumn("s2", lead(col("sym"), 2).over(wSeq))
          .withColumn("s3", lead(col("sym"), 3).over(wSeq))
          .filter(col("s3").isNotNull)
          .withColumn("word",
            concat(col("sym"), col("s1"), col("s2"), col("s3")))
        words.groupBy(col("word"))
          .agg(count(lit(1)).as("n_occurrences"),
            countDistinct(col("user_id")).as("n_entities"),
            min(col("user_id")).as("first_user"),
            max(col("user_id")).as("last_user"))
          .filter(col("n_entities") >= 2)
          .orderBy(col("word"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, value,
                 (ROW_NUMBER() OVER (PARTITION BY user_id
                    ORDER BY $TS, event_id) - 1) // 8 AS wi
          FROM events),
        stats AS (
          SELECT user_id, COUNT(*) AS n,
                 SUM(CAST(value AS DECIMAL(12,2))) AS sumd,
                 SUM(CAST(value AS DECIMAL(12,2))
                     * CAST(value AS DECIMAL(12,2))) AS sumsq
          FROM events GROUP BY 1),
        frames AS (
          SELECT user_id, wi, COUNT(*) AS wn,
                 SUM(CAST(value AS DECIMAL(12,2))) AS paa_sum
          FROM base GROUP BY 1, 2
          HAVING COUNT(*) = 8),
        zp AS (
          SELECT f.user_id, f.wi, ${SaxK.zp}
          FROM frames f JOIN stats USING (user_id)),
        syms AS (SELECT user_id, wi, ${SaxK.sym} FROM zp),
        words AS (
          SELECT user_id, wi,
                 concat(sym, lead(sym, 1) OVER w, lead(sym, 2) OVER w,
                        lead(sym, 3) OVER w) AS word,
                 lead(sym, 3) OVER w AS s3
          FROM syms
          WINDOW w AS (PARTITION BY user_id ORDER BY wi))
        SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_entities,
               MIN(user_id) AS first_user, MAX(user_id) AS last_user
        FROM words WHERE s3 IS NOT NULL
        GROUP BY word HAVING COUNT(DISTINCT user_id) >= 2
        ORDER BY word""")),

    // ----- ts_forecast_eval: one-step-ahead backtest ---------------------
    // The forecast-quality audit that closes the smoothing loop: ts_holt's
    // one-step forecast is scored against the NEXT actual reading per
    // entity (walk-forward backtest), reporting MAE and bias alongside
    // the naive last-value baseline — the standard "does the trend term
    // earn its keep" comparison. Errors aggregate with qsum (order-free
    // fixed point); the per-entity skill flag is exact. Same single
    // entity-keyed window as ts_holt, one extra lead.
    "ts_forecast_eval" -> Q(
      build = (s, d) => {
        val (lc, bc) = HoltK.taps
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v0"))
        val lagged = (1 to 8).foldLeft(base) { (df, k) =>
          df.withColumn(s"v$k", lag(col("v0"), k).over(w))
        }
        lagged
          .withColumn("nxt", lead(col("v0"), 1).over(w))
          .filter(col("v8").isNotNull && col("nxt").isNotNull)
          .withColumn("fc",
            (expr(HoltK.dot(lc)) + expr(HoltK.dot(bc))) / lit(100.0))
          .withColumn("actual", col("nxt") / lit(100.0))
          .withColumn("naive", col("v0") / lit(100.0))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_evals"),
            qsum(abs(col("fc") - col("actual"))).as("mae_holt_q"),
            qsum(abs(col("naive") - col("actual"))).as("mae_naive_q"),
            qsum(col("fc") - col("actual")).as("bias_q"))
          .select(col("user_id"), col("n_evals"),
            (col("mae_holt_q") / col("n_evals")).as("mae_holt"),
            (col("mae_naive_q") / col("n_evals")).as("mae_naive"),
            (col("bias_q") / col("n_evals")).as("bias"),
            (col("mae_holt_q") < col("mae_naive_q")).as("beats_naive"))
          .orderBy(col("user_id"))
      },
      oracle = Some {
        val (lc, bc) = HoltK.taps
        s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v0
          FROM events),
        lagged AS (
          SELECT *,
                 ${(1 to 8).map(k =>
                   s"lag(v0, $k) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS v$k")
                   .mkString(", ")},
                 lead(v0, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) AS nxt
          FROM base),
        scored AS (
          SELECT user_id,
                 (${HoltK.dot(lc)} + ${HoltK.dot(bc)}) / 100.0 AS fc,
                 nxt / 100.0 AS actual, v0 / 100.0 AS naive
          FROM lagged WHERE v8 IS NOT NULL AND nxt IS NOT NULL),
        agg AS (
          SELECT user_id, COUNT(*) AS n_evals,
                 ${QSUM("abs(fc - actual)")} AS mae_holt_q,
                 ${QSUM("abs(naive - actual)")} AS mae_naive_q,
                 ${QSUM("fc - actual")} AS bias_q
          FROM scored GROUP BY 1)
        SELECT user_id, n_evals,
               mae_holt_q / n_evals AS mae_holt,
               mae_naive_q / n_evals AS mae_naive,
               bias_q / n_evals AS bias,
               mae_holt_q < mae_naive_q AS beats_naive
        FROM agg ORDER BY user_id"""
      }),

    // ----- ts_seasonal_decompose: trend + diurnal + residual split -------
    // Classical seasonal decomposition of the hourly feed-volume series
    // per event type (the STL-lite every capacity/anomaly dashboard
    // draws): trend = centered 24-hour moving average, seasonal = mean
    // hour-of-day deviation from trend, residual = remainder. All three
    // components are derived from INTEGER quantities scaled by 24 (the
    // moving-average denominator cleared), so each emitted double is one
    // exact-integer division — engine-stable with no quantization. Rows
    // without a full 24-hour window are dropped (the standard edge
    // convention). Shapes: one groupBy to the hourly grid, one per-type
    // window, one (type, hour-of-day) aggregation joined back.
    "ts_seasonal_decompose" -> Q(
      build = (s, d) => {
        val hourly = ev(s, d)
          .groupBy(col("event_type"),
            (col("ts_sec") - col("ts_sec") % 3600).as("hour_sec"))
          .agg(count(lit(1)).as("v"))
        val w24 = Window.partitionBy(col("event_type"))
          .orderBy(col("hour_sec")).rowsBetween(-12, 11)
        val full = hourly
          .withColumn("t24", sum(col("v")).over(w24))
          .withColumn("wn", count(lit(1)).over(w24))
          .filter(col("wn") === 24)
          .withColumn("d24", lit(24) * col("v") - col("t24"))
          .withColumn("hod", expr("(hour_sec div 3600) % 24"))
        val seasonal = full.groupBy(col("event_type"), col("hod"))
          .agg(sum(col("d24")).as("s24"), count(lit(1)).as("sn"))
        full.join(seasonal, Seq("event_type", "hod"))
          .select(col("event_type"), col("hour_sec"), col("v"),
            (col("t24").cast(DoubleType) / 24.0).as("trend"),
            (col("s24").cast(DoubleType) / (lit(24.0) * col("sn"))).as("seasonal"),
            (col("d24").cast(DoubleType) / 24.0
              - col("s24").cast(DoubleType) / (lit(24.0) * col("sn")))
              .as("residual"))
          .orderBy(col("event_type"), col("hour_sec"))
      },
      oracle = Some(s"""
        WITH hourly AS (
          SELECT event_type, $TS - $TS % 3600 AS hour_sec, COUNT(*) AS v
          FROM events GROUP BY 1, 2),
        win AS (
          SELECT event_type, hour_sec, v,
                 CAST(SUM(v) OVER w AS BIGINT) AS t24,
                 COUNT(*) OVER w AS wn
          FROM hourly
          WINDOW w AS (PARTITION BY event_type ORDER BY hour_sec
                       ROWS BETWEEN 12 PRECEDING AND 11 FOLLOWING)),
        full_w AS (
          SELECT event_type, hour_sec, v, t24,
                 24*v - t24 AS d24,
                 (hour_sec // 3600) % 24 AS hod
          FROM win WHERE wn = 24),
        seas AS (
          SELECT event_type, hod, CAST(SUM(d24) AS BIGINT) AS s24,
                 COUNT(*) AS sn
          FROM full_w GROUP BY 1, 2)
        SELECT f.event_type, f.hour_sec, f.v,
               CAST(t24 AS DOUBLE)/24.0 AS trend,
               CAST(s24 AS DOUBLE)/(24.0*sn) AS seasonal,
               CAST(d24 AS DOUBLE)/24.0 - CAST(s24 AS DOUBLE)/(24.0*sn)
                 AS residual
        FROM full_w f JOIN seas s
          ON f.event_type = s.event_type AND f.hod = s.hod
        ORDER BY f.event_type, f.hour_sec"""))
  ) ++ Seq(

    // ----- ts_m4: error-free series downsampling (M4) --------------------
    // M4 downsampling (Jugel et al., VLDB 2014): per entity and per
    // 16-sample frame keep first/last/min/max — the exact set of points a
    // pixel-width-bounded line rendering needs, and the standard way a
    // dashboard reads a 100 TB series store without scanning raw points
    // into the client. Reference adjacency: ODIN's track/sensor UIs plot
    // decimated histories (e.g. odin_sentinel record ring buffers);
    // this is the store-side decimation that keeps those plots exact.
    // Shape: one entity-keyed window for frame ids, then one (entity,
    // frame) groupBy whose four argmin/argmax fold map-side as struct
    // min/max — constant state per frame, no second pass. All selection
    // math on exact integer cents + row numbers, so engine-identical.
    "ts_m4" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .withColumn("wi", expr("(rn - 1) div 16"))
        base.groupBy(col("user_id"), col("wi"))
          .agg(
            min(struct(col("rn"), col("ts_sec"), col("vc"))).as("f"),
            max(struct(col("rn"), col("ts_sec"), col("vc"))).as("l"),
            min(struct(col("vc"), col("rn"), col("ts_sec"))).as("mn"),
            max(struct(col("vc"), col("rn"), col("ts_sec"))).as("mx"),
            count(lit(1)).as("n_pts"))
          .select(col("user_id"), col("wi"), col("n_pts"),
            col("f.ts_sec").as("t_first"),
            (col("f.vc") / 100.0).as("v_first"),
            col("l.ts_sec").as("t_last"),
            (col("l.vc") / 100.0).as("v_last"),
            col("mn.ts_sec").as("t_min"),
            (col("mn.vc") / 100.0).as("v_min"),
            col("mx.ts_sec").as("t_max"),
            (col("mx.vc") / 100.0).as("v_max"))
          .orderBy(col("user_id"), col("wi"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events),
        fr AS (SELECT *, (rn - 1) // 16 AS wi FROM base),
        pick AS (
          SELECT user_id, wi, ts_sec, vc, rn,
                 ROW_NUMBER() OVER (PARTITION BY user_id, wi
                   ORDER BY rn) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY user_id, wi
                   ORDER BY rn DESC) AS rl,
                 ROW_NUMBER() OVER (PARTITION BY user_id, wi
                   ORDER BY vc, rn) AS rmn,
                 ROW_NUMBER() OVER (PARTITION BY user_id, wi
                   ORDER BY vc DESC, rn DESC) AS rmx,
                 COUNT(*) OVER (PARTITION BY user_id, wi) AS n_pts
          FROM fr)
        SELECT user_id, wi, n_pts,
               MAX(CASE WHEN rf = 1 THEN ts_sec END) AS t_first,
               MAX(CASE WHEN rf = 1 THEN vc / 100.0 END) AS v_first,
               MAX(CASE WHEN rl = 1 THEN ts_sec END) AS t_last,
               MAX(CASE WHEN rl = 1 THEN vc / 100.0 END) AS v_last,
               MAX(CASE WHEN rmn = 1 THEN ts_sec END) AS t_min,
               MAX(CASE WHEN rmn = 1 THEN vc / 100.0 END) AS v_min,
               MAX(CASE WHEN rmx = 1 THEN ts_sec END) AS t_max,
               MAX(CASE WHEN rmx = 1 THEN vc / 100.0 END) AS v_max
        FROM pick GROUP BY 1, 2, 3
        ORDER BY user_id, wi""")),

    // ----- ts_peak_prominence: bounded-window peak detection -------------
    // Local-maximum detection with a prominence floor — the alarm-grade
    // "is this spike real" test (a strict max over ±3 neighbors whose
    // height clears the higher of the two flanking minima by >= 0.5).
    // Reference adjacency: sentinel threshold alarms fire on raw
    // crossings (odin_sentinel/src/alarm.rs); peak prominence is the
    // standard refinement that suppresses ripple retriggers. Entirely
    // integer-cent math over one entity-keyed window — deterministic by
    // construction, no float compare anywhere.
    "ts_peak_prominence" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
        val withN = (1 to 3).foldLeft(base) { (df, k) =>
          df.withColumn(s"l$k", lag(col("vc"), k).over(w))
            .withColumn(s"r$k", lead(col("vc"), k).over(w))
        }
        withN
          .filter((1 to 3).map(k =>
            col(s"l$k").isNotNull && col(s"r$k").isNotNull &&
              col("vc") > col(s"l$k") && col("vc") > col(s"r$k"))
            .reduce(_ && _))
          .withColumn("prom_c",
            col("vc") - greatest(
              least(col("l1"), col("l2"), col("l3")),
              least(col("r1"), col("r2"), col("r3"))))
          .filter(col("prom_c") >= 50)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            (col("vc") / 100.0).as("peak_value"),
            (col("prom_c") / 100.0).as("prominence"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc
          FROM events),
        nb AS (
          SELECT *,
                 ${(1 to 3).map(k =>
                   s"lag(vc, $k) OVER w AS l$k, lead(vc, $k) OVER w AS r$k")
                   .mkString(", ")}
          FROM base
          WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id))
        SELECT user_id, ts_sec, event_id,
               vc / 100.0 AS peak_value,
               (vc - greatest(least(l1, l2, l3), least(r1, r2, r3))) / 100.0
                 AS prominence
        FROM nb
        WHERE ${(1 to 3).map(k =>
          s"l$k IS NOT NULL AND r$k IS NOT NULL AND vc > l$k AND vc > r$k")
          .mkString(" AND ")}
          AND vc - greatest(least(l1, l2, l3), least(r1, r2, r3)) >= 50
        ORDER BY user_id, ts_sec, event_id""")),

    // ----- ts_spc_rules: Western-Electric control-chart audit ------------
    // The four classic SPC run rules per entity: (1) a point beyond
    // 3 sigma; (2) nine consecutive points on one side of the mean;
    // (3) six consecutive points strictly rising or falling; (4)
    // fourteen consecutive points alternating up/down. This is the
    // process-health battery a monitoring plane runs next to raw
    // threshold alarms (odin_sentinel/src/alarm.rs thresholds catch
    // rule 1; rules 2-4 catch drifts and oscillation the threshold
    // misses). The 3-sigma test is integer-exact — SpcK rewrites
    // |z| > 3 as (n*vc - sumc)^2 > 9*(n*sumsq - sumc^2) over exact
    // integer-cent sums, so no sqrt/division/rounding can diverge
    // between engines; rules 2-4 are pure integer window sums.
    "ts_spc_rules" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
        val stats = base.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("sumc"),
            sum(col("vc") * col("vc")).as("sumsq"))
        base.join(stats, Seq("user_id"))
          .withColumn("r1", expr(SpcK.r1))
          .withColumn("side", expr(SpcK.side))
          .withColumn("dv", col("vc") - lag(col("vc"), 1).over(w))
          .withColumn("inc", expr(
            "CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END"))
          .withColumn("s9",
            sum(col("side")).over(w.rowsBetween(-8, 0)))
          .withColumn("up5", sum(when(col("inc") === 1, 1).otherwise(0))
            .over(w.rowsBetween(-4, 0)))
          .withColumn("dn5", sum(when(col("inc") === -1, 1).otherwise(0))
            .over(w.rowsBetween(-4, 0)))
          .withColumn("alt", when(col("inc") * lag(col("inc"), 1).over(w)
            === -1, 1).otherwise(0))
          .withColumn("a13", sum(col("alt")).over(w.rowsBetween(-12, 0)))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_points"),
            sum(col("r1")).as("r1_beyond3"),
            sum(when(abs(col("s9")) === 9, 1).otherwise(0)).as("r2_run9"),
            sum(when(col("up5") === 5 || col("dn5") === 5, 1).otherwise(0))
              .as("r3_trend6"),
            sum(when(col("a13") === 13, 1).otherwise(0)).as("r4_alt14"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc
          FROM events),
        stats AS (
          SELECT user_id, COUNT(*) AS n, SUM(vc) AS sumc,
                 SUM(vc * vc) AS sumsq
          FROM base GROUP BY 1),
        scored AS (
          SELECT b.*, n, sumc, sumsq, ${SpcK.r1} AS r1
          FROM base b JOIN stats USING (user_id)),
        flagged AS (
          SELECT *, ${SpcK.side} AS side,
                 vc - lag(vc, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) AS dv
          FROM scored),
        runs AS (
          SELECT *,
                 CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END
                   AS inc
          FROM flagged),
        wind AS (
          SELECT *,
                 SUM(side) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                   ROWS BETWEEN 8 PRECEDING AND CURRENT ROW) AS s9,
                 SUM(CASE WHEN inc = 1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS up5,
                 SUM(CASE WHEN inc = -1 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS dn5,
                 CASE WHEN inc * lag(inc, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) = -1 THEN 1 ELSE 0 END
                   AS alt
          FROM runs),
        wind2 AS (
          SELECT *,
                 SUM(alt) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id
                   ROWS BETWEEN 12 PRECEDING AND CURRENT ROW) AS a13
          FROM wind)
        SELECT user_id, COUNT(*) AS n_points,
               CAST(SUM(r1) AS BIGINT) AS r1_beyond3,
               CAST(SUM(CASE WHEN abs(s9) = 9 THEN 1 ELSE 0 END) AS BIGINT)
                 AS r2_run9,
               CAST(SUM(CASE WHEN up5 = 5 OR dn5 = 5 THEN 1 ELSE 0 END)
                 AS BIGINT) AS r3_trend6,
               CAST(SUM(CASE WHEN a13 = 13 THEN 1 ELSE 0 END) AS BIGINT)
                 AS r4_alt14
        FROM wind2 GROUP BY 1 ORDER BY user_id""")),

    // ----- ts_theil_sen: robust trend via banded median slope ------------
    // The Theil–Sen estimator — the robust replacement for an OLS trend
    // when sensor series carry outliers — bounded to pairs at most 16
    // readings apart, which keeps the pair count O(16 n) instead of
    // O(n^2) (the classic banding that survives 100 TB; full Theil–Sen
    // needs every pair and cannot). The band rides IN the join key
    // (rn div 16 bucket, self + successor — the doc_edit_distance
    // pattern), never as a post-join filter over an n^2 blowup. Slopes
    // are one exact-integer division each; the median picks elements by
    // exact rank (even counts average the two middles — one add, one
    // halving, both deterministic).
    "ts_theil_sen" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .withColumn("bk", expr("(rn - 1) div 16"))
        val a = base.select(col("user_id"), col("rn").as("rn_a"),
          col("bk").as("bk_a"), col("ts_sec").as("t_a"), col("vc").as("v_a"))
        val b = base.select(col("user_id"), col("rn").as("rn_b"),
          explode(array(col("bk"), col("bk") - 1)).as("bk_a"),
          col("ts_sec").as("t_b"), col("vc").as("v_b"))
        val slopes = a.join(b, Seq("user_id", "bk_a"))
          .filter(col("rn_b") > col("rn_a")
            && col("rn_b") - col("rn_a") <= 16
            && col("t_b") > col("t_a"))
          .withColumn("slope",
            ((col("v_b") - col("v_a")) * lit(36L)).cast(DoubleType)
              / (col("t_b") - col("t_a")))
        val wS = Window.partitionBy(col("user_id"))
          .orderBy(col("slope"), col("rn_a"), col("rn_b"))
        slopes
          .withColumn("r", row_number().over(wS))
          .withColumn("n", count(lit(1)).over(Window.partitionBy(col("user_id"))))
          .filter(col("r") === expr("(n + 1) div 2")
            || col("r") === expr("n div 2 + 1"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_pairs"),
            (sum(col("slope")) / count(lit(1))).as("trend_per_hour"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events),
        slopes AS (
          SELECT a.user_id, a.rn AS rn_a, b.rn AS rn_b,
                 CAST((b.vc - a.vc) * 36 AS DOUBLE)
                   / (b.ts_sec - a.ts_sec) AS slope
          FROM base a JOIN base b
            ON b.user_id = a.user_id
           AND b.rn BETWEEN a.rn + 1 AND a.rn + 16
           AND b.ts_sec > a.ts_sec),
        ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY slope, rn_a, rn_b) AS r,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM slopes)
        SELECT user_id, MAX(n) AS n_pairs,
               SUM(slope) / COUNT(*) AS trend_per_hour
        FROM ranked
        WHERE r = (n + 1) // 2 OR r = n // 2 + 1
        GROUP BY 1 ORDER BY user_id""")),

    // ----- ts_motif_discord: matrix-profile motif/discord discovery ------
    // The matrix-profile pair (Yeh et al., ICDM 2016) over non-overlapping
    // 8-reading PAA frames: for every frame, the distance to its nearest
    // other frame of the same entity; the globally closest pair is the
    // MOTIF (a repeated behavior), the frame whose nearest neighbor is
    // farthest is the DISCORD (the anomaly a threshold never catches).
    // Frame count is n/8 per entity, and the profile is BANDED: each
    // frame only scores neighbors within 64 frames (|wi_a - wi_b| <= 64,
    // ~512 readings of context), with the band riding IN the join key
    // (wi div 64 bucket, self + both neighbors — the ts_theil_sen
    // trick), so per-entity work is O(frames x 128), linear, instead of
    // the O(frames^2) all-pairs profile that dies when a hot entity's
    // series grows 100x. Motif/discord are defined w.r.t. the banded
    // neighborhood — the standard locality restriction (STAMP's
    // exclusion zone generalized), identically in the oracle. Distances
    // are exact integer cent^2 sums (zip_with fold), every
    // argmin/argmax a struct fold.
    "ts_motif_discord" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val frames = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .withColumn("wi", expr("(rn - 1) div 8"))
          .withColumn("p", expr("(rn - 1) % 8"))
          .groupBy(col("user_id"), col("wi"))
          .agg(count(lit(1)).as("wn"),
            expr("transform(array_sort(collect_list(struct(p, vc))), x -> x.vc)")
              .as("vec"))
          .filter(col("wn") === 8)
        val pa = frames.select(col("user_id"), col("wi").as("wi_a"),
          col("vec").as("vec_a"))
          .withColumn("bk", expr("wi_a div 64"))
        val pb = frames.select(col("user_id"), col("wi").as("wi_b"),
          explode(array(expr("wi div 64 - 1"), expr("wi div 64"),
            expr("wi div 64 + 1"))).as("bk"),
          col("vec").as("vec_b"))
        val pairs = pa.join(pb, Seq("user_id", "bk"))
          .filter(col("wi_a") =!= col("wi_b")
            && abs(col("wi_a") - col("wi_b")) <= 64)
          .withColumn("d2", aggregate(
            zip_with(col("vec_a"), col("vec_b"),
              (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, x) => acc + x))
        val profile = pairs
          .groupBy(col("user_id"), col("wi_a"))
          .agg(min(struct(col("d2"), col("wi_b"))).as("nn"))
        profile
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_frames"),
            min(struct(col("nn.d2").as("d2"), col("wi_a").as("wa"),
              col("nn.wi_b").as("wb"))).as("motif"),
            max(struct(col("nn.d2").as("d2"), col("wi_a").as("wa"))).as("disc"))
          .select(col("user_id"), col("n_frames"),
            least(col("motif.wa"), col("motif.wb")).as("motif_a"),
            greatest(col("motif.wa"), col("motif.wb")).as("motif_b"),
            col("motif.d2").as("motif_d2"),
            col("disc.wa").as("discord_wi"), col("disc.d2").as("discord_d2"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events),
        fr AS (
          SELECT user_id, (rn - 1) // 8 AS wi, COUNT(*) AS wn,
                 list(vc ORDER BY rn) AS vec
          FROM base GROUP BY 1, 2 HAVING COUNT(*) = 8),
        pairs AS (
          SELECT a.user_id, a.wi AS wi_a, b.wi AS wi_b,
                 CAST(SUM((a.vec[i] - b.vec[i]) * (a.vec[i] - b.vec[i]))
                   AS BIGINT) AS d2
          FROM fr a JOIN fr b
            ON b.user_id = a.user_id AND b.wi <> a.wi
            AND abs(b.wi - a.wi) <= 64
          CROSS JOIN generate_series(1, 8) AS t(i)
          GROUP BY 1, 2, 3),
        profile AS (
          SELECT user_id, wi_a, d2, wi_b,
                 ROW_NUMBER() OVER (PARTITION BY user_id, wi_a
                   ORDER BY d2, wi_b) AS r
          FROM pairs),
        nn AS (SELECT user_id, wi_a, d2, wi_b FROM profile WHERE r = 1),
        pick AS (
          SELECT user_id, wi_a, d2, wi_b,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY d2, wi_a, wi_b) AS r_motif,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY d2 DESC, wi_a DESC) AS r_disc,
                 COUNT(*) OVER (PARTITION BY user_id) AS n_frames
          FROM nn)
        SELECT m.user_id, m.n_frames,
               LEAST(m.wi_a, m.wi_b) AS motif_a,
               GREATEST(m.wi_a, m.wi_b) AS motif_b,
               m.d2 AS motif_d2,
               d.wi_a AS discord_wi, d.d2 AS discord_d2
        FROM (SELECT * FROM pick WHERE r_motif = 1) m
        JOIN (SELECT * FROM pick WHERE r_disc = 1) d
          ON d.user_id = m.user_id
        ORDER BY m.user_id""")),

    // ----- ts_pattern_match: MATCH_RECOGNIZE-style sequence detection ----
    // The event-pattern query every funnel/alerting engine exposes (SQL
    // MATCH_RECOGNIZE, Flink CEP): find each occurrence of the exact
    // consecutive sequence view -> click -> purchase within a per-entity
    // stream, bounded to 48 hours end-to-end. Two LEADs over the
    // (user_id)-partitioned sequence — one shuffle, no joins, and the
    // pattern test is pure column comparison inside codegen. At 100 TB the
    // window state is two rows per entity stream, the same shape as
    // ts_delta.
    "ts_pattern_match" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .withColumn("id2", lead(col("event_id"), 1).over(w))
          .withColumn("id3", lead(col("event_id"), 2).over(w))
          .withColumn("ts3", lead(col("ts_sec"), 2).over(w))
          .filter(col("event_type") === "view" && col("t2") === "click"
            && col("t3") === "purchase"
            && col("ts3") - col("ts_sec") <= 172800L)
          .select(col("user_id"), col("event_id").as("e_view"),
            col("id2").as("e_click"), col("id3").as("e_purchase"),
            col("ts_sec").as("t_start"),
            (col("ts3") - col("ts_sec")).as("dur_sec"))
          .orderBy(col("user_id"), col("t_start"), col("e_view"))
      },
      oracle = Some(s"""
        WITH seq AS (
          SELECT user_id, event_id, $TS AS ts_sec, event_type,
                 LEAD(event_type, 1) OVER w AS t2,
                 LEAD(event_type, 2) OVER w AS t3,
                 LEAD(event_id, 1) OVER w AS id2,
                 LEAD(event_id, 2) OVER w AS id3,
                 LEAD($TS, 2) OVER w AS ts3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY $TS, event_id))
        SELECT user_id, event_id AS e_view, id2 AS e_click,
               id3 AS e_purchase, ts_sec AS t_start,
               ts3 - ts_sec AS dur_sec
        FROM seq
        WHERE event_type = 'view' AND t2 = 'click' AND t3 = 'purchase'
          AND ts3 - ts_sec <= 172800
        ORDER BY user_id, t_start, e_view""")),

    // ----- ts_streaks: longest same-value run per entity -----------------
    // Gaps-and-islands keyed on VALUE change (ts_sessionize islands on
    // time gaps; this is the orthogonal classic): rn - rn_within_type is
    // constant exactly while event_type repeats, so grouping on that
    // difference labels each run with no join and no iteration. Emits each
    // entity's longest streak (ties: earliest start, then event_type) —
    // two window passes + one aggregate, all keyed on user_id, shuffle
    // count 1.
    "ts_streaks" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val wt = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            col("event_type"))
          .withColumn("grp",
            row_number().over(w) - row_number().over(wt))
          .groupBy(col("user_id"), col("event_type"), col("grp"))
          .agg(count(lit(1)).as("len"), min(col("ts_sec")).as("t_start"))
          .groupBy(col("user_id"))
          .agg(max(struct(col("len"), (-col("t_start")).as("nts"),
            col("event_type"))).as("m"))
          .select(col("user_id"), col("m.event_type").as("event_type"),
            col("m.len").as("streak_len"), (-col("m.nts")).as("t_start"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH seq AS (
          SELECT user_id, event_id, $TS AS ts_sec, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id)
                 - ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                   ORDER BY $TS, event_id) AS grp
          FROM events),
        runs AS (
          SELECT user_id, event_type, grp, COUNT(*) AS len,
                 MIN(ts_sec) AS t_start
          FROM seq GROUP BY 1, 2, 3),
        best AS (
          SELECT user_id, event_type, len, t_start,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY len DESC, t_start, event_type DESC) AS r
          FROM runs)
        SELECT user_id, event_type, len AS streak_len, t_start
        FROM best WHERE r = 1 ORDER BY user_id""")),

    // ----- ts_lttb: largest-triangle downsampling ------------------------
    // The visual downsampler dashboards actually use (Steinarsson's LTTB,
    // bucket size 30) in its parallel fixed-anchor form: each bucket keeps
    // the point forming the largest triangle with the NEIGHBOR BUCKET
    // AVERAGES (the sequential previous-selected-point chain would
    // serialize the whole series; anchoring on bucket means every bucket
    // decides independently — embarrassingly parallel, and the standard
    // practical approximation). First/last buckets pin the series
    // endpoints. Times are rebased per entity before any product so the
    // area arithmetic stays well inside double exactness; every division
    // is one correctly-rounded IEEE op shared textually with the oracle.
    "ts_lttb" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val pts = ev(s, d)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("t0", min(col("ts_sec")).over(byUser))
          .withColumn("t", (col("ts_sec") - col("t0")).cast(DoubleType))
          .withColumn("rn", row_number().over(w))
          .withColumn("bucket", expr("(rn - 1) div 30"))
        val bk = pts.groupBy(col("user_id"), col("bucket"))
          .agg(sum(col("t")).as("st"), sum(col("vc")).as("sv"),
            count(lit(1)).as("n"))
        val wb = byUser.orderBy(col("bucket"))
        val anchors = bk
          .withColumn("stP", lag(col("st"), 1).over(wb))
          .withColumn("svP", lag(col("sv"), 1).over(wb))
          .withColumn("nP", lag(col("n"), 1).over(wb))
          .withColumn("stN", lead(col("st"), 1).over(wb))
          .withColumn("svN", lead(col("sv"), 1).over(wb))
          .withColumn("nN", lead(col("n"), 1).over(wb))
          .withColumn("nb", count(lit(1)).over(byUser))
        val area =
          """abs((stP/nP - stN/nN) * (CAST(vc AS DOUBLE) - svP/nP)
             - (stP/nP - t) * (svN/nN - svP/nP))"""
        val wbk = Window.partitionBy(col("user_id"), col("bucket"))
        val joined = pts.join(anchors, Seq("user_id", "bucket"))
          .withColumn("rnb", row_number().over(
            wbk.orderBy(col("ts_sec"), col("event_id"))))
          .withColumn("cntb", count(lit(1)).over(wbk))
          .withColumn("ra", row_number().over(wbk.orderBy(
            expr(area).desc, col("ts_sec"), col("event_id"))))
        joined.filter(
          (col("bucket") === 0 && col("rnb") === 1)
            || (col("bucket") === col("nb") - 1 && col("rnb") === col("cntb"))
            || (col("bucket") > 0 && col("bucket") < col("nb") - 1
              && col("ra") === 1))
          .select(col("user_id"), col("bucket"), col("event_id"),
            col("ts_sec"), (col("vc").cast(DoubleType) / 100.0).as("value_c"))
          .orderBy(col("user_id"), col("bucket"), col("event_id"))
      },
      oracle = Some(s"""
        WITH pts AS (
          SELECT user_id, event_id, $TS AS ts_sec,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 CAST($TS - MIN($TS) OVER (PARTITION BY user_id) AS DOUBLE)
                   AS t,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events),
        pts2 AS (SELECT *, (rn - 1) // 30 AS bucket FROM pts),
        bk AS (
          SELECT user_id, bucket, SUM(t) AS st,
                 CAST(SUM(vc) AS BIGINT) AS sv, COUNT(*) AS n
          FROM pts2 GROUP BY 1, 2),
        anchors AS (
          SELECT user_id, bucket, st, sv, n,
                 LAG(st, 1) OVER wb AS stP, LAG(sv, 1) OVER wb AS svP,
                 LAG(n, 1) OVER wb AS nP,
                 LEAD(st, 1) OVER wb AS stN, LEAD(sv, 1) OVER wb AS svN,
                 LEAD(n, 1) OVER wb AS nN,
                 COUNT(*) OVER (PARTITION BY user_id) AS nb
          FROM bk WINDOW wb AS (PARTITION BY user_id ORDER BY bucket)),
        joined AS (
          SELECT p.user_id, p.bucket, p.event_id, p.ts_sec, p.vc,
                 a.nb,
                 ROW_NUMBER() OVER (PARTITION BY p.user_id, p.bucket
                   ORDER BY p.ts_sec, p.event_id) AS rnb,
                 COUNT(*) OVER (PARTITION BY p.user_id, p.bucket) AS cntb,
                 ROW_NUMBER() OVER (PARTITION BY p.user_id, p.bucket
                   ORDER BY abs((a.stP/a.nP - a.stN/a.nN)
                         * (CAST(p.vc AS DOUBLE) - a.svP/a.nP)
                       - (a.stP/a.nP - p.t) * (a.svN/a.nN - a.svP/a.nP))
                     DESC, p.ts_sec, p.event_id) AS ra
          FROM pts2 p JOIN anchors a
            ON p.user_id = a.user_id AND p.bucket = a.bucket)
        SELECT user_id, bucket, event_id, ts_sec,
               CAST(vc AS DOUBLE) / 100.0 AS value_c
        FROM joined
        WHERE (bucket = 0 AND rnb = 1)
           OR (bucket = nb - 1 AND rnb = cntb)
           OR (bucket > 0 AND bucket < nb - 1 AND ra = 1)
        ORDER BY user_id, bucket, event_id""")),

    // ----- ts_ar2_forecast: Yule-Walker AR(2) fit + one-step forecast ----
    // The classic autoregressive step up from ts_holt's exponential
    // smoothing: phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2) from
    // the lag-1/lag-2 autocorrelations (Yule-Walker), then the one-step
    // forecast mean + phi1*(v_n - mean) + phi2*(v_{n-1} - mean). The ACF
    // numerators/denominator reuse ts_acf's cleared-denominator integer
    // sums (DECIMAL(38,0) — exact, order-free); r1/r2 and everything after
    // are single IEEE divisions/products in one shared expression order,
    // so no rounding is needed anywhere. One entity-keyed shuffle.
    "ts_ar2_forecast" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val p = byUser
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v"))
          .withColumn("n", count(lit(1)).over(p))
          .withColumn("sv", sum(col("v")).over(p))
          .withColumn("r", col("n") * col("v") - col("sv"))
          .withColumn("r1l", lead(col("r"), 1).over(w))
          .withColumn("r2l", lead(col("r"), 2).over(w))
          .withColumn("rnk", row_number().over(
            byUser.orderBy(col("ts_sec").desc, col("event_id").desc)))
        val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
        base.groupBy(col("user_id"))
          .agg(max(col("n")).as("n"), max(col("sv")).as("sv"),
            sum(dec(col("r") * col("r"))).as("den"),
            sum(when(col("r1l").isNotNull, dec(col("r") * col("r1l"))))
              .as("a"),
            sum(when(col("r2l").isNotNull, dec(col("r") * col("r2l"))))
              .as("b"),
            max(when(col("rnk") === 1, col("v"))).as("vn"),
            max(when(col("rnk") === 2, col("v"))).as("vn1"))
          .filter(col("den") > 0 && col("n") >= 5)
          .withColumn("r1", col("a").cast(DoubleType) / col("den").cast(DoubleType))
          .withColumn("r2", col("b").cast(DoubleType) / col("den").cast(DoubleType))
          .withColumn("phi1",
            expr("r1 * (1.0e0 - r2) / (1.0e0 - r1 * r1)"))
          .withColumn("phi2",
            expr("(r2 - r1 * r1) / (1.0e0 - r1 * r1)"))
          .withColumn("mean_c",
            expr("CAST(sv AS DOUBLE) / n"))
          .withColumn("forecast_c", expr(
            "mean_c + phi1 * (CAST(vn AS DOUBLE) - mean_c) + phi2 * (CAST(vn1 AS DOUBLE) - mean_c)"))
          .select(col("user_id"), col("n"), col("r1"), col("r2"),
            col("phi1"), col("phi2"), col("forecast_c"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v
          FROM events),
        st AS (
          SELECT user_id, ts_sec, event_id, v,
                 COUNT(*) OVER p AS n, CAST(SUM(v) OVER p AS BIGINT) AS sv
          FROM base WINDOW p AS (PARTITION BY user_id)),
        r0 AS (
          SELECT user_id, n, sv, v, n*v - sv AS r,
                 lead(n*v - sv, 1) OVER w AS r1l,
                 lead(n*v - sv, 2) OVER w AS r2l,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY ts_sec DESC, event_id DESC) AS rnk
          FROM st WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec, event_id)),
        agg AS (
          SELECT user_id, MAX(n) AS n, MAX(sv) AS sv,
                 SUM(CAST(r*r AS DECIMAL(38,0))) AS den,
                 SUM(CASE WHEN r1l IS NOT NULL
                          THEN CAST(r*r1l AS DECIMAL(38,0)) END) AS a,
                 SUM(CASE WHEN r2l IS NOT NULL
                          THEN CAST(r*r2l AS DECIMAL(38,0)) END) AS b,
                 MAX(CASE WHEN rnk = 1 THEN v END) AS vn,
                 MAX(CASE WHEN rnk = 2 THEN v END) AS vn1
          FROM r0 GROUP BY 1),
        fit AS (
          SELECT user_id, n,
                 CAST(a AS DOUBLE)/CAST(den AS DOUBLE) AS r1,
                 CAST(b AS DOUBLE)/CAST(den AS DOUBLE) AS r2,
                 CAST(sv AS DOUBLE) / n AS mean_c, vn, vn1
          FROM agg WHERE den > 0 AND n >= 5)
        SELECT user_id, n, r1, r2,
               r1 * (1.0e0 - r2) / (1.0e0 - r1 * r1) AS phi1,
               (r2 - r1 * r1) / (1.0e0 - r1 * r1) AS phi2,
               mean_c
                 + (r1 * (1.0e0 - r2) / (1.0e0 - r1 * r1))
                   * (CAST(vn AS DOUBLE) - mean_c)
                 + ((r2 - r1 * r1) / (1.0e0 - r1 * r1))
                   * (CAST(vn1 AS DOUBLE) - mean_c) AS forecast_c
        FROM fit ORDER BY user_id""")),

    // ----- ts_welch_ab: Welch's t-test per entity ------------------------
    // The A/B significance test every experimentation pipeline runs:
    // per entity, are 'purchase' values drawn from a different mean than
    // 'view' values? Welch's unequal-variance t plus the
    // Welch-Satterthwaite df. Sums and sums-of-squares are exact integer
    // cents (map-side-combinable aggregate, one shuffle); mean/variance/
    // t/df are IEEE divisions+sqrt in one shared expression order — fully
    // deterministic, no rounding needed. The significance flag compares
    // |t| to the z approximation (df > 30 here), documented as such.
    "ts_welch_ab" -> Q(
      build = (s, d) => {
        val g = ev(s, d)
          .filter(col("event_type").isin("purchase", "view"))
          .select(col("user_id"), col("event_type"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v"))
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            sum(col("v") * col("v")).as("ss"))
        val a = g.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("n").as("n1"), col("s").as("s1"),
            col("ss").as("ss1"))
        val b = g.filter(col("event_type") === "view")
          .select(col("user_id"), col("n").as("n2"), col("s").as("s2"),
            col("ss").as("ss2"))
        a.join(b, "user_id")
          .filter(col("n1") >= 3 && col("n2") >= 3)
          .withColumn("m1", expr("CAST(s1 AS DOUBLE) / n1"))
          .withColumn("m2", expr("CAST(s2 AS DOUBLE) / n2"))
          .withColumn("var1", expr(
            "(CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1)"))
          .withColumn("var2", expr(
            "(CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1)"))
          .withColumn("se2", expr("var1 / n1 + var2 / n2"))
          .withColumn("t_stat", expr("(m1 - m2) / sqrt(se2)"))
          .withColumn("df_welch", expr(
            """se2 * se2 / (var1 / n1 * (var1 / n1) / (n1 - 1)
               + var2 / n2 * (var2 / n2) / (n2 - 1))"""))
          .withColumn("significant", expr("abs(t_stat) > 1.96e0"))
          .select(col("user_id"), col("n1"), col("n2"), col("m1"), col("m2"),
            col("t_stat"), col("df_welch"), col("significant"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH g AS (
          SELECT user_id, event_type, COUNT(*) AS n,
                 CAST(SUM(v) AS BIGINT) AS s, CAST(SUM(v*v) AS BIGINT) AS ss
          FROM (SELECT user_id, event_type,
                       CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v
                FROM events WHERE event_type IN ('purchase', 'view'))
          GROUP BY 1, 2),
        j AS (
          SELECT a.user_id, a.n AS n1, a.s AS s1, a.ss AS ss1,
                 b.n AS n2, b.s AS s2, b.ss AS ss2
          FROM (SELECT * FROM g WHERE event_type = 'purchase') a
          JOIN (SELECT * FROM g WHERE event_type = 'view') b
            ON a.user_id = b.user_id
          WHERE a.n >= 3 AND b.n >= 3),
        c AS (
          SELECT user_id, n1, n2,
                 CAST(s1 AS DOUBLE) / n1 AS m1,
                 CAST(s2 AS DOUBLE) / n2 AS m2,
                 (CAST(ss1 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n1) / (n1 - 1) AS var1,
                 (CAST(ss2 AS DOUBLE) - CAST(s2 AS DOUBLE) * s2 / n2) / (n2 - 1) AS var2
          FROM j),
        e AS (
          SELECT *, var1 / n1 + var2 / n2 AS se2 FROM c)
        SELECT user_id, n1, n2, m1, m2,
               (m1 - m2) / sqrt(se2) AS t_stat,
               se2 * se2 / (var1 / n1 * (var1 / n1) / (n1 - 1)
                 + var2 / n2 * (var2 / n2) / (n2 - 1)) AS df_welch,
               abs((m1 - m2) / sqrt(se2)) > 1.96e0 AS significant
        FROM e ORDER BY user_id""")),

    // ----- ts_poisson_rate_test: did the event rate change? --------------
    // The conditional binomial test for comparing two Poisson counts
    // (Przyborowski-Wilenski shape, normal approximation): split each
    // entity's observation span at its midpoint, compare first-half vs
    // second-half event counts with z = (n1-n2)/sqrt(n1+n2). Exact
    // integer counts, one sqrt — deterministic; the span split is integer
    // arithmetic on epoch seconds. One entity-keyed aggregate: the
    // rate-drift alarm shape for fleets of sensors.
    "ts_poisson_rate_test" -> Q(
      build = (s, d) =>
        ev(s, d)
          .select(col("user_id"), col("ts_sec"))
          .withColumn("lo", min(col("ts_sec")).over(byUser))
          .withColumn("hi", max(col("ts_sec")).over(byUser))
          .withColumn("mid", expr("lo + (hi - lo) div 2"))
          .groupBy(col("user_id"))
          .agg(
            sum(when(col("ts_sec") <= col("mid"), 1L).otherwise(0L)).as("n1"),
            sum(when(col("ts_sec") > col("mid"), 1L).otherwise(0L)).as("n2"))
          .filter(col("n1") + col("n2") >= 10)
          .withColumn("z", expr(
            "(CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE)) / sqrt(CAST(n1 + n2 AS DOUBLE))"))
          .withColumn("rate_changed", expr("abs(z) > 1.96e0"))
          .orderBy(col("user_id")),
      oracle = Some(s"""
        WITH spans AS (
          SELECT user_id, $TS AS ts_sec,
                 MIN($TS) OVER (PARTITION BY user_id) AS lo,
                 MAX($TS) OVER (PARTITION BY user_id) AS hi
          FROM events),
        counts AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN ts_sec <= lo + (hi - lo) // 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN ts_sec > lo + (hi - lo) // 2
                               THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM spans GROUP BY 1)
        SELECT user_id, n1, n2,
               (CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                 / sqrt(CAST(n1 + n2 AS DOUBLE)) AS z,
               abs((CAST(n1 AS DOUBLE) - CAST(n2 AS DOUBLE))
                 / sqrt(CAST(n1 + n2 AS DOUBLE))) > 1.96e0 AS rate_changed
        FROM counts WHERE n1 + n2 >= 10
        ORDER BY user_id""")),

    // ----- ts_drawdown: maximum drawdown + record highs ------------------
    // The risk metric every monitored series gets (finance drawdown,
    // battery-degradation dip, sensor sag): per entity, the deepest drop
    // from a running peak, plus the count of record highs (rows beating
    // every earlier reading). Two frame-bounded running windows over the
    // entity key — exact integer cents throughout, one shuffle.
    "ts_drawdown" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("peak", max(col("vc")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("prevmax", max(col("vc")).over(wPrev))
          .withColumn("dd", col("peak") - col("vc"))
          .withColumn("rec",
            when(col("prevmax").isNull || col("vc") > col("prevmax"), 1L)
              .otherwise(0L))
          .groupBy(col("user_id"))
          .agg((max(col("dd")).cast(DoubleType) / 100.0).as("max_drawdown"),
            sum(col("rec")).as("n_records"),
            (max(col("peak")).cast(DoubleType) / 100.0).as("peak_value"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc
          FROM events),
        runs AS (
          SELECT user_id, vc,
                 MAX(vc) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak,
                 MAX(vc) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prevmax
          FROM base)
        SELECT user_id,
               CAST(MAX(peak - vc) AS DOUBLE) / 100.0 AS max_drawdown,
               CAST(SUM(CASE WHEN prevmax IS NULL OR vc > prevmax
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
               CAST(MAX(peak) AS DOUBLE) / 100.0 AS peak_value
        FROM runs GROUP BY 1 ORDER BY user_id""")),

    // ----- ts_survival: Kaplan-Meier time-to-event curve -----------------
    // How long until an entity's next 'purchase'? Each purchase-to-
    // purchase interval is an observed event; the tail interval from the
    // last purchase to the entity's final reading is CENSORED (we only
    // know it exceeds that span) — exactly the right-censoring the
    // Kaplan-Meier estimator exists for, and what a naive mean-of-gaps
    // gets wrong. Durations bucket to days; at each distinct duration t:
    // S(t) = prod over t'<=t of (1 - d/n). The product rides a window
    // cumulative sum of 6-decimal-quantized ln terms (the repo's ln
    // discipline), n-at-risk is a reverse cumulative count — exact
    // integers until the one exp at the end. Output is the survival
    // curve: one row per distinct duration day.
    "ts_survival" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val p = ev(s, d)
          .withColumn("is_p", (col("event_type") === "purchase").cast("int"))
          .withColumn("last_ts", max(col("ts_sec")).over(byUser))
          .filter(col("is_p") === 1)
          .withColumn("nxt", lead(col("ts_sec"), 1).over(
            byUser.orderBy(col("ts_sec"), col("event_id"))))
          .select(col("user_id"),
            when(col("nxt").isNotNull,
              expr("(nxt - ts_sec) div 86400")).otherwise(
              expr("(last_ts - ts_sec) div 86400")).as("dur_days"),
            col("nxt").isNotNull.as("observed"))
        val byDur = p.groupBy(col("dur_days"))
          .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d"),
            count(lit(1)).as("all_here"))
        // windows over the duration histogram (hundreds of rows after the
        // aggregate), never over raw events
        val wAfter = Window.orderBy(col("dur_days"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        byDur
          .withColumn("n_risk", sum(col("all_here")).over(wAfter))
          // d == n_risk would be ln(0): that terminal drop-to-zero row is
          // excluded BEFORE the log, exactly as in the oracle
          .filter(col("d") > 0 && col("d") < col("n_risk"))
          .withColumn("lnterm", expr(
            "CAST(round(ln(1.0e0 - CAST(d AS DOUBLE) / n_risk), 6) AS DECIMAL(18,6))"))
          .withColumn("lnsum",
            sum(col("lnterm")).over(
              Window.orderBy(col("dur_days"))
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("dur_days"), col("d"), col("n_risk"),
            expr("round(exp(CAST(lnsum AS DOUBLE)), 6)").as("survival"))
          .orderBy(col("dur_days"))
      },
      oracle = Some(s"""
        WITH pur AS (
          SELECT user_id, $TS AS ts_sec, event_id, event_type,
                 MAX($TS) OVER (PARTITION BY user_id) AS last_ts
          FROM events),
        iv AS (
          SELECT user_id,
                 LEAD(ts_sec, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) AS nxt,
                 ts_sec, last_ts
          FROM pur WHERE event_type = 'purchase'),
        durs AS (
          SELECT user_id,
                 CASE WHEN nxt IS NOT NULL THEN (nxt - ts_sec) // 86400
                      ELSE (last_ts - ts_sec) // 86400 END AS dur_days,
                 nxt IS NOT NULL AS observed
          FROM iv),
        bydur AS (
          SELECT dur_days,
                 CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT)
                   AS d,
                 COUNT(*) AS all_here
          FROM durs GROUP BY 1),
        risk AS (
          SELECT dur_days, d,
                 CAST(SUM(all_here) OVER (ORDER BY dur_days
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk
          FROM bydur),
        terms AS (
          SELECT dur_days, d, n_risk,
                 CAST(round(ln(1.0e0 - CAST(d AS DOUBLE) / n_risk), 6)
                   AS DECIMAL(18,6)) AS lnterm
          FROM risk WHERE d > 0 AND d < n_risk),
        curve AS (
          SELECT dur_days, d, n_risk,
                 SUM(lnterm) OVER (ORDER BY dur_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS lnsum
          FROM terms)
        SELECT dur_days, d, n_risk,
               round(exp(CAST(lnsum AS DOUBLE)), 6) AS survival
        FROM curve ORDER BY dur_days""")),

    // ----- ts_markov_transition: behavior transition matrix --------------
    // The first-order Markov chain over event types (what follows what):
    // transition counts from one LEAD per entity stream, probabilities as
    // exact count ratios, plus each state's modal successor. The
    // behavioral fingerprint session-analysis starts from; 5x5 output at
    // any SF, one entity-keyed window + one combinable groupBy.
    "ts_markov_transition" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val trans = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            col("event_type"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("from_type"),
            col("nxt").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val tot = trans.groupBy(col("from_type"))
          .agg(sum(col("n")).as("n_from"))
        val wBest = Window.partitionBy(col("from_type"))
          .orderBy(col("n").desc, col("to_type"))
        trans.join(tot, "from_type")
          .withColumn("p", col("n").cast(DoubleType) / col("n_from"))
          .withColumn("modal", row_number().over(wBest) === 1)
          .orderBy(col("from_type"), col("to_type"))
      },
      oracle = Some(s"""
        WITH seq AS (
          SELECT user_id, event_type,
                 LEAD(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS nxt
          FROM events),
        trans AS (
          SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
          FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_from
                FROM trans GROUP BY 1)
        SELECT t.from_type, t.to_type, t.n, o.n_from,
               CAST(t.n AS DOUBLE) / o.n_from AS p,
               ROW_NUMBER() OVER (PARTITION BY t.from_type
                 ORDER BY t.n DESC, t.to_type) = 1 AS modal
        FROM trans t JOIN tot o ON t.from_type = o.from_type
        ORDER BY t.from_type, t.to_type""")),

    // ----- ts_sliding_distinct: trailing-window distinct users -----------
    // Rolling 7-day active users — the DAU/WAU query that defeats naive
    // windowing (COUNT(DISTINCT) OVER a range frame isn't supported and
    // would be quadratic anyway). The scale shape: each DISTINCT
    // (user, active_day) pair explodes to the <=7 report days it covers,
    // then one exact groupBy counts distinct (user, report_day) pairs —
    // O(7·distinct-user-days) rows total, no day x user matrix, no
    // quadratic window. Report days are capped to the observed range so
    // the curve has no phantom tail.
    "ts_sliding_distinct" -> Q(
      build = (s, d) => {
        val days = ev(s, d)
          .select(col("user_id"), expr("ts_sec div 86400").as("day"))
          .distinct()
        val maxDay = days.agg(max(col("day")).as("max_day"))
        days
          .withColumn("report_day",
            explode(expr("sequence(day, day + 6)")))
          .crossJoin(broadcast(maxDay))
          .filter(col("report_day") <= col("max_day"))
          .select(col("user_id"), col("report_day")).distinct()
          .groupBy(col("report_day"))
          .agg(count(lit(1)).as("wau"))
          .orderBy(col("report_day"))
      },
      oracle = Some(s"""
        WITH days AS (
          SELECT DISTINCT user_id, $TS // 86400 AS day FROM events),
        md AS (SELECT MAX(day) AS max_day FROM days),
        cov AS (
          SELECT DISTINCT user_id, day + g.i AS report_day
          FROM days, generate_series(0, 6) AS g(i), md
          WHERE day + g.i <= md.max_day)
        SELECT report_day, COUNT(*) AS wau
        FROM cov GROUP BY 1 ORDER BY report_day""")),

    // ----- ts_dft_power: spectral power at candidate periods -------------
    // Which rhythm does each entity's signal actually follow? The DFT
    // power at three physically-motivated periods (half-day, day, week)
    // computed directly on the IRREGULAR samples — no resampling pass:
    // P(T) = (Σ r·cos φ)² + (Σ r·sin φ)², φ = 2π·(t mod T)/T. Residuals
    // r = n·v − Σv clear the DC term exactly (the ts_acf discipline);
    // the mod-T reduction is exact integer math so the trig argument
    // never exceeds one turn (the geo_solar_angles lesson); trig terms
    // quantize at 2^10 into DECIMAL(38,0) sums — order-free. Normalized
    // against Σr² so the output is scale-free; the dominant period is
    // flagged per entity. One shuffle keyed on the entity x 3 periods.
    "ts_dft_power" -> Q(
      build = (s, d) => {
        val p = byUser
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v"))
          .withColumn("n", count(lit(1)).over(p))
          .withColumn("sv", sum(col("v")).over(p))
          .withColumn("r", (col("n") * col("v") - col("sv")).cast(DoubleType))
          .withColumn("period",
            explode(expr("array(43200L, 86400L, 604800L)")))
          .withColumn("phase", expr(
            "CAST(ts_sec % period AS DOUBLE) * (360.0e0 / period)"))
        val dec = "DECIMAL(38,0)"
        val scored = base.groupBy(col("user_id"), col("period"))
          .agg(
            sum(expr(s"CAST(FLOOR(r * cos(radians(phase)) * 1024.0e0) AS $dec)"))
              .as("cs"),
            sum(expr(s"CAST(FLOOR(r * sin(radians(phase)) * 1024.0e0) AS $dec)"))
              .as("sn"),
            sum(expr(s"CAST(FLOOR(r * r) AS $dec)")).as("den"))
          .filter(col("den") > 0)
          .withColumn("power", expr(
            """(CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
               / (1048576.0e0 * CAST(den AS DOUBLE))"""))
        val wBest = Window.partitionBy(col("user_id"))
          .orderBy(col("power").desc, col("period"))
        scored
          .withColumn("dominant", row_number().over(wBest) === 1)
          .select(col("user_id"), col("period"), col("power"),
            col("dominant"))
          .orderBy(col("user_id"), col("period"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v
          FROM events),
        st AS (
          SELECT user_id, ts_sec, v,
                 COUNT(*) OVER p AS n, CAST(SUM(v) OVER p AS BIGINT) AS sv
          FROM base WINDOW p AS (PARTITION BY user_id)),
        rp AS (
          SELECT user_id, CAST(n*v - sv AS DOUBLE) AS r,
                 ts_sec, t.period,
                 CAST(ts_sec % t.period AS DOUBLE) * (360.0e0 / t.period)
                   AS phase
          FROM st CROSS JOIN (VALUES (43200), (86400), (604800))
            AS t(period)),
        agg AS (
          SELECT user_id, period,
                 SUM(CAST(FLOOR(r * cos(radians(phase)) * 1024.0e0)
                   AS DECIMAL(38,0))) AS cs,
                 SUM(CAST(FLOOR(r * sin(radians(phase)) * 1024.0e0)
                   AS DECIMAL(38,0))) AS sn,
                 SUM(CAST(FLOOR(r * r) AS DECIMAL(38,0))) AS den
          FROM rp GROUP BY 1, 2),
        pw AS (
          SELECT user_id, period,
                 (CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                  + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
                 / (1048576.0e0 * CAST(den AS DOUBLE)) AS power
          FROM agg WHERE den > 0)
        SELECT user_id, CAST(period AS BIGINT) AS period, power,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY power DESC, period) = 1 AS dominant
        FROM pw ORDER BY user_id, period""")),

    // ----- ts_var_cvar: empirical tail risk per entity -------------------
    // Value-at-Risk and Conditional VaR (expected shortfall) of the
    // step-to-step value CHANGES: the 5th-percentile change by exact rank
    // (no interpolation — the q26_median discipline) and the exact mean
    // of the changes at or below it. Integer cents throughout; one
    // entity-keyed window pass for deltas + rank.
    "ts_var_cvar" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        val deltas = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("chg", col("vc") - lag(col("vc"), 1).over(w))
          .filter(col("chg").isNotNull)
        val wr = byUser.orderBy(col("chg"), col("ts_sec"), col("event_id"))
        val ranked = deltas
          .withColumn("rn", row_number().over(wr))
          .withColumn("n", count(lit(1)).over(byUser))
          .filter(col("n") >= 20)
          .withColumn("k", expr("greatest(1, (n * 5) div 100)"))
        ranked.filter(col("rn") <= col("k"))
          .groupBy(col("user_id"))
          .agg(max(col("n")).as("n_changes"),
            (max(col("chg")).cast(DoubleType) / 100.0).as("var_5pct"),
            (sum(col("chg")).cast(DoubleType) / (count(lit(1)) * 100.0))
              .as("cvar_5pct"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH deltas AS (
          SELECT user_id, ts_sec, event_id, chg FROM (
            SELECT user_id, $TS AS ts_sec, event_id,
                   CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)
                   - LAG(CAST(floor(value * 100.0 + 0.5e0) AS BIGINT), 1)
                     OVER (PARTITION BY user_id ORDER BY $TS, event_id)
                     AS chg
            FROM events) WHERE chg IS NOT NULL),
        ranked AS (
          SELECT user_id, chg,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY chg, ts_sec, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id) AS n
          FROM deltas),
        capped AS (
          SELECT user_id, chg, rn, n,
                 GREATEST(1, (n * 5) // 100) AS k
          FROM ranked WHERE n >= 20)
        SELECT user_id, MAX(n) AS n_changes,
               CAST(MAX(chg) AS DOUBLE) / 100.0 AS var_5pct,
               CAST(SUM(chg) AS DOUBLE) / (COUNT(*) * 100.0) AS cvar_5pct
        FROM capped WHERE rn <= k
        GROUP BY 1 ORDER BY user_id""")),

    // ----- fems_nfdrs_obs: per-station fire-danger observation series ----
    // The FEMS/NFDRS feed store (odin_fems/src/lib.rs:137
    // nfdrs_obs_for_model, :884 update_station_nfdrs_obs): each station
    // keeps, PER FUEL MODEL (V grass / W grass-shrub / X brush / Y timber
    // / Z slash), exactly ONE latest actual observation plus every
    // forecast in the window, date-sorted — the retention loop at :902
    // ("only keep the latest actual observation" + sort_in). Re-expressed
    // over events: station = user_id, fuel model from event_id mod 5,
    // is_forecast = after the feed's now-line (max ts - 24 h, a broadcast
    // scalar). The actual side is one combinable max-struct groupBy on
    // (station, model) — ts_latest_per_key's shape — the forecast side a
    // pushed-down filter; union, no window anywhere. At 100 TB: both
    // sides shuffle once on the (station, model) key, output is
    // stations x 5 x (1 + window forecasts).
    "fems_nfdrs_obs" -> Q(
      build = (s, d) => {
        val cut = ev(s, d).agg((max(col("ts_sec")) - 86400L).as("cutoff"))
        val obs = ev(s, d)
          .select(col("user_id").as("station_id"),
            expr("""CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 'V'
                    WHEN 1 THEN 'W' WHEN 2 THEN 'X' WHEN 3 THEN 'Y'
                    ELSE 'Z' END""").as("fuel_model"),
            col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 10.0 + 0.5e0) AS BIGINT) % 800").as("kbdi"),
            col("value").as("erc"),
            expr("value * 0.5e0").as("bi"))
          .crossJoin(broadcast(cut))
          .withColumn("is_forecast", col("ts_sec") > col("cutoff"))
        val latestActual = obs.filter(!col("is_forecast"))
          .groupBy(col("station_id"), col("fuel_model"))
          .agg(max(struct(col("ts_sec"), col("event_id"), col("kbdi"),
            col("erc"), col("bi"))).as("m"))
          .select(col("station_id"), col("fuel_model"),
            col("m.ts_sec").as("ts_sec"), col("m.event_id").as("event_id"),
            lit(false).as("is_forecast"), col("m.kbdi").as("kbdi"),
            col("m.erc").as("erc"), col("m.bi").as("bi"))
        val forecasts = obs.filter(col("is_forecast"))
          .select(col("station_id"), col("fuel_model"), col("ts_sec"),
            col("event_id"), col("is_forecast"), col("kbdi"), col("erc"),
            col("bi"))
        latestActual.unionByName(forecasts)
          .orderBy(col("station_id"), col("fuel_model"), col("ts_sec"),
            col("event_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id AS station_id,
                 CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 'V'
                      WHEN 1 THEN 'W' WHEN 2 THEN 'X' WHEN 3 THEN 'Y'
                      ELSE 'Z' END AS fuel_model,
                 $TS AS ts_sec, event_id,
                 CAST(floor(value * 10.0 + 0.5e0) AS BIGINT) % 800 AS kbdi,
                 value AS erc, value * 0.5e0 AS bi
          FROM events),
        cut AS (SELECT MAX(ts_sec) - 86400 AS cutoff FROM base),
        obs AS (
          SELECT b.*, b.ts_sec > c.cutoff AS is_forecast
          FROM base b CROSS JOIN cut c),
        actual AS (
          SELECT station_id, fuel_model, ts_sec, event_id,
                 FALSE AS is_forecast, kbdi, erc, bi,
                 ROW_NUMBER() OVER (PARTITION BY station_id, fuel_model
                   ORDER BY ts_sec DESC, event_id DESC) AS rn
          FROM obs WHERE NOT is_forecast)
        SELECT station_id, fuel_model, ts_sec, event_id, is_forecast,
               kbdi, erc, bi
        FROM actual WHERE rn = 1
        UNION ALL
        SELECT station_id, fuel_model, ts_sec, event_id, is_forecast,
               kbdi, erc, bi
        FROM obs WHERE is_forecast
        ORDER BY station_id, fuel_model, ts_sec, event_id""")),

    // ----- ts_alpha_beta: fixed-gain tracking filter ---------------------
    // The alpha-beta tracker — the fixed-gain Kalman degenerate every
    // radar/track pipeline starts from (the smoother behind the track
    // state odin_adsb assembles per aircraft before serving it): position
    // estimate, velocity estimate, and the last innovation (measurement
    // minus prediction — the maneuver detector). Same finite-window tap
    // scheme as ts_holt: the 8-step recursion from (x = oldest, v = 0)
    // is a fixed linear map of the last 9 readings, so both engines run
    // ONE identical 9-term dot product over exact integer cents — no
    // recursion state, no UDAF, one entity-partitioned window. Maneuver
    // flag: |innovation| > 20 units, compared on the exact cent integer
    // scale.
    "ts_alpha_beta" -> Q(
      build = (s, d) => {
        val (xT, vT, rT) = AlphaBetaK.taps
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("v0"))
        val lagged = (1 to 8).foldLeft(base) { (df, k) =>
          df.withColumn(s"v$k", lag(col("v0"), k).over(w))
        }
        lagged.filter(col("v8").isNotNull)
          .withColumn("x_c", expr(AlphaBetaK.dot(xT)))
          .withColumn("vel_c", expr(AlphaBetaK.dot(vT)))
          .withColumn("innov_c", expr(AlphaBetaK.dot(rT)))
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            (col("v0") / lit(100.0)).as("value"),
            (col("x_c") / lit(100.0)).as("x_est"),
            (col("vel_c") / lit(100.0)).as("v_est"),
            (col("innov_c") / lit(100.0)).as("innovation"),
            (abs(col("innov_c")) > 2000.0).as("maneuver"))
          .orderBy(col("user_id"), col("ts_sec"), col("event_id"))
      },
      oracle = Some {
        val (xT, vT, rT) = AlphaBetaK.taps
        s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS v0
          FROM events),
        lagged AS (
          SELECT *,
                 ${(1 to 8).map(k =>
                   s"lag(v0, $k) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id) AS v$k")
                   .mkString(", ")}
          FROM base),
        sm AS (
          SELECT user_id, ts_sec, event_id, v0,
                 ${AlphaBetaK.dot(xT)} AS x_c,
                 ${AlphaBetaK.dot(vT)} AS vel_c,
                 ${AlphaBetaK.dot(rT)} AS innov_c
          FROM lagged WHERE v8 IS NOT NULL)
        SELECT user_id, ts_sec, event_id,
               v0 / 100.0 AS value,
               x_c / 100.0 AS x_est,
               vel_c / 100.0 AS v_est,
               innov_c / 100.0 AS innovation,
               abs(innov_c) > 2000.0 AS maneuver
        FROM sm ORDER BY user_id, ts_sec, event_id"""
      }),

    // ----- ts_haar_energy: multi-scale Haar wavelet energy ---------------
    // The dyadic multi-resolution companion to ts_dft_power: per entity,
    // 16-reading frames are decomposed by the unnormalized Haar
    // transform (pairwise sums and differences, 4 levels) and each
    // level's detail ENERGY — sum of squared coefficients — says at
    // which time scale the signal's variation lives (level 1 =
    // reading-to-reading jitter, level 4 = frame-scale drift). Every
    // coefficient is an exact integer over cents, so energies are exact
    // BIGINTs and the dominant-scale argmax is engine-identical with no
    // rounding anywhere. Frame assembly is the ts_motif_discord
    // struct-sort fold: one (entity, frame) groupBy, no window wider
    // than the frame.
    "ts_haar_energy" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val frames = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .withColumn("wi", expr("(rn - 1) div 16"))
          .withColumn("p", expr("(rn - 1) % 16"))
          .groupBy(col("user_id"), col("wi"))
          .agg(count(lit(1)).as("wn"),
            expr("transform(array_sort(collect_list(struct(p, vc))), x -> x.vc)")
              .as("v"))
          .filter(col("wn") === 16)
        frames
          .withColumn("s1", expr(
            "transform(sequence(1, 8), i -> element_at(v, 2*i-1) + element_at(v, 2*i))"))
          .withColumn("e1", expr(
            """aggregate(transform(sequence(1, 8),
               i -> element_at(v, 2*i-1) - element_at(v, 2*i)),
               0L, (a, x) -> a + x*x)"""))
          .withColumn("s2", expr(
            "transform(sequence(1, 4), i -> element_at(s1, 2*i-1) + element_at(s1, 2*i))"))
          .withColumn("e2", expr(
            """aggregate(transform(sequence(1, 4),
               i -> element_at(s1, 2*i-1) - element_at(s1, 2*i)),
               0L, (a, x) -> a + x*x)"""))
          .withColumn("s3", expr(
            "transform(sequence(1, 2), i -> element_at(s2, 2*i-1) + element_at(s2, 2*i))"))
          .withColumn("e3", expr(
            """aggregate(transform(sequence(1, 2),
               i -> element_at(s2, 2*i-1) - element_at(s2, 2*i)),
               0L, (a, x) -> a + x*x)"""))
          .withColumn("e4", expr(
            """(element_at(s3, 1) - element_at(s3, 2))
               * (element_at(s3, 1) - element_at(s3, 2))"""))
          .withColumn("approx_sum", expr("element_at(s3, 1) + element_at(s3, 2)"))
          .withColumn("dominant_level", expr(
            """CASE greatest(e1, e2, e3, e4)
               WHEN e1 THEN 1 WHEN e2 THEN 2 WHEN e3 THEN 3 ELSE 4 END"""))
          .select(col("user_id"), col("wi"), col("e1"), col("e2"),
            col("e3"), col("e4"), col("approx_sum"), col("dominant_level"))
          .orderBy(col("user_id"), col("wi"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events),
        fr AS (
          SELECT user_id, (rn - 1) // 16 AS wi, COUNT(*) AS wn,
                 list(vc ORDER BY rn) AS v
          FROM base GROUP BY 1, 2 HAVING COUNT(*) = 16),
        lvl AS (
          SELECT user_id, wi,
                 [v[2*i-1] + v[2*i] FOR i IN generate_series(1, 8)] AS s1,
                 CAST((SELECT SUM((v[2*i-1] - v[2*i]) * (v[2*i-1] - v[2*i]))
                       FROM generate_series(1, 8) AS t(i)) AS BIGINT) AS e1
          FROM fr),
        lvl2 AS (
          SELECT user_id, wi, e1,
                 [s1[2*i-1] + s1[2*i] FOR i IN generate_series(1, 4)] AS s2,
                 CAST((SELECT SUM((s1[2*i-1] - s1[2*i]) * (s1[2*i-1] - s1[2*i]))
                       FROM generate_series(1, 4) AS t(i)) AS BIGINT) AS e2
          FROM lvl),
        lvl3 AS (
          SELECT user_id, wi, e1, e2,
                 [s2[2*i-1] + s2[2*i] FOR i IN generate_series(1, 2)] AS s3,
                 CAST((SELECT SUM((s2[2*i-1] - s2[2*i]) * (s2[2*i-1] - s2[2*i]))
                       FROM generate_series(1, 2) AS t(i)) AS BIGINT) AS e3
          FROM lvl2)
        SELECT user_id, wi, e1, e2, e3,
               CAST((s3[1] - s3[2]) * (s3[1] - s3[2]) AS BIGINT) AS e4,
               CAST(s3[1] + s3[2] AS BIGINT) AS approx_sum,
               CASE greatest(e1, e2, e3,
                     CAST((s3[1] - s3[2]) * (s3[1] - s3[2]) AS BIGINT))
                 WHEN e1 THEN 1 WHEN e2 THEN 2 WHEN e3 THEN 3
                 ELSE 4 END AS dominant_level
        FROM lvl3 ORDER BY user_id, wi""")),

    // ----- ts_hampel: rolling-median outlier repair -----------------------
    // The Hampel filter — the despiking pass sensor pipelines run before
    // any model sees the series (odin_sentinel's per-capability record
    // streams are exactly this shape): centered 7-sample window per
    // entity, local median + MAD, flag |x−med| > 3·1.4826·MAD and repair
    // by the median. ts_anomaly_mad is the GLOBAL per-entity version; this
    // is the rolling one that survives level shifts. Integer cents make
    // the 7-element medians exact (odd count → a sorted-array pick, no
    // interpolation), and the 3σ test is the integer cross-multiplication
    // |x−med|·10000 > 44478·MAD — zero doubles until the output cast.
    // Scale: the window is 7 rows per entity (bounded), partitioned by
    // user_id; one window pass, no joins.
    "ts_hampel" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
          .rowsBetween(-3, 3)
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"), col("value"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("c"))
          .withColumn("win", collect_list(col("c")).over(w))
          .filter(size(col("win")) === 7)
          .withColumn("med", expr("array_sort(win)[3]"))
          .withColumn("mad",
            expr("array_sort(transform(win, x -> abs(x - med)))[3]"))
          .withColumn("is_outlier",
            abs(col("c") - col("med")) * 10000L > col("mad") * 44478L)
          .select(col("user_id"), col("event_id"), col("value"),
            (col("med").cast(DoubleType) / 100.0).as("local_median"),
            col("is_outlier"),
            (when(col("is_outlier"), col("med")).otherwise(col("c"))
              .cast(DoubleType) / 100.0).as("repaired"))
          .orderBy(col("user_id"), col("event_id"))
      },
      oracle = Some(s"""
        WITH cents AS (
          SELECT user_id, $TS AS ts_sec, event_id, value,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS c
          FROM events),
        win AS (
          SELECT user_id, event_id, value, c,
                 list(c) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS w
          FROM cents),
        stats AS (
          SELECT user_id, event_id, value, c,
                 list_sort(w)[4] AS med,
                 list_sort(list_transform(w, x -> abs(x - list_sort(w)[4])))[4]
                   AS mad
          FROM win WHERE len(w) = 7)
        SELECT user_id, event_id, value,
               CAST(med AS DOUBLE) / 100.0 AS local_median,
               abs(c - med) * 10000 > mad * 44478 AS is_outlier,
               CAST(CASE WHEN abs(c - med) * 10000 > mad * 44478
                         THEN med ELSE c END AS DOUBLE) / 100.0 AS repaired
        FROM stats ORDER BY user_id, event_id""")),

    // ----- ts_time_weighted: TWAP over irregular samples -------------------
    // The duty-cycle-correct mean for irregularly sampled sensors (a value
    // HOLDS until the next report, so a reading that stood for an hour must
    // outweigh one replaced after a second — the plain AVG every naive
    // dashboard gets wrong). Last-observation-carried-forward weighting:
    // weight = seconds until the next sample; the trailing sample has no
    // horizon and drops out. Numerator and denominator are exact BIGINTs
    // (cents × seconds), so the single final division is the only double —
    // identical IEEE in both engines. One lag window + one combinable
    // aggregate per entity.
    "ts_time_weighted" -> Q(
      build = (s, d) => {
        val w = byUser.orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("c"))
          .withColumn("dur", lead(col("ts_sec"), 1).over(w) - col("ts_sec"))
          .filter(col("dur").isNotNull && col("dur") > 0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_intervals"),
            sum(col("dur")).as("span_sec"),
            sum(col("c") * col("dur")).as("num_c"))
          .select(col("user_id"), col("n_intervals"), col("span_sec"),
            (col("num_c").cast(DoubleType)
              / (col("span_sec").cast(DoubleType) * 100.0)).as("twap"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH held AS (
          SELECT user_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS c,
                 LEAD($TS, 1) OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) - $TS AS dur
          FROM events),
        agg AS (
          SELECT user_id, COUNT(*) AS n_intervals,
                 CAST(SUM(dur) AS BIGINT) AS span_sec,
                 CAST(SUM(c * dur) AS BIGINT) AS num_c
          FROM held WHERE dur IS NOT NULL AND dur > 0 GROUP BY 1)
        SELECT user_id, n_intervals, span_sec,
               CAST(num_c AS DOUBLE) / (CAST(span_sec AS DOUBLE) * 100.0)
                 AS twap
        FROM agg ORDER BY user_id"""))
  )

  /** Engine-shared SAX fragments: the frame z value as one double chain
    * over DECIMAL-exact inputs, and the 4-symbol breakpoint CASE
    * (Gaussian quartiles ±0.6745). Identical text both engines.
    */
  private object SaxK {
    private val mean = "(CAST(sumd AS DOUBLE)/n)"
    private val sd =
      s"sqrt(greatest(CAST(sumsq AS DOUBLE)/n - $mean*$mean, 1.0e-12))"
    val zp = s"(CAST(paa_sum AS DOUBLE)/8.0 - $mean)/$sd AS zp"
    val sym = "CASE WHEN zp < -0.6745e0 THEN 'a' WHEN zp < 0.0e0 THEN 'b' " +
      "WHEN zp < 0.6745e0 THEN 'c' ELSE 'd' END AS sym"
  }

  /** Engine-shared SPC fragments: mean/sigma in integer cents from exact
    * integer sums, the z value as ONE shared double chain (the SaxK
    * technique), and the side-of-mean sign on that z.
    */
  private object SpcK {
    // Integer-exact SPC kernel: A = n*vc - sumc is the exact n-scaled
    // deviation, D = n*sumsq - sumc^2 the exact n^2-scaled variance, so
    // |z| > 3  <=>  A^2 > 9*D. Evaluated as ONE double product per side
    // (exact BIGINT inputs, one IEEE rounding each, bit-identical across
    // engines) — no sqrt, no division, no library-rounding surface. The
    // old 1e-9 variance floor is subsumed: D = 0 (all-equal series)
    // forces A = 0, and both forms then report no rule-1 breach.
    private val a = "(n * vc - sumc)"
    private val dvar = "(n * sumsq - sumc * sumc)"
    val r1: String = s"CASE WHEN CAST($a AS DOUBLE) * CAST($a AS DOUBLE)" +
      s" > 9.0e0 * CAST($dvar AS DOUBLE) THEN 1 ELSE 0 END"
    val side: String =
      s"CASE WHEN $a > 0 THEN 1 WHEN $a < 0 THEN -1 ELSE 0 END"
  }

  /** Holt finite-window tap coefficients (alpha=0.5, beta=0.3): the
    * impulse response of 8 recursion steps from (level = y[oldest],
    * trend = 0). taps._1(i) / taps._2(i) multiply v_i (lag i, i=0 the
    * current row), emitted as shared `e0` double literals so both
    * engines run the identical fixed-order dot product.
    */
  private object HoltK {
    val taps: (Seq[Double], Seq[Double]) = {
      val alpha = 0.5; val beta = 0.3
      // impulse at lag position j (j=8 oldest .. 0 newest)
      val l = Array.fill(9)(0.0); val b = Array.fill(9)(0.0)
      for (j <- 8 to 0 by -1) {
        val y = Array.fill(9)(0.0); y(j) = 1.0
        var lv = y(8); var bv = 0.0 // state at the oldest sample
        for (i <- 7 to 0 by -1) {   // consume newer samples in time order
          val lPrev = lv
          lv = alpha * y(i) + (1.0 - alpha) * (lv + bv)
          bv = beta * (lv - lPrev) + (1.0 - beta) * bv
        }
        l(j) = lv; b(j) = bv
      }
      (l.toSeq, b.toSeq)
    }
    /** Fixed-order 9-term dot product over v0..v8 (identical text both
      * engines; v columns are exact integer cents).
      */
    def dot(c: Seq[Double]): String =
      (0 to 8).map(i => s"v$i * ${c(i)}e0").mkString("(", " + ", ")")
  }

  /** Engine-shared burstiness fragments over exact gap moments
    * (n_gaps, sum_gap, sumsq_gap): one double chain each for
    * B = (sd - mean)/(sd + mean) and Fano = var/mean; population
    * variance floored at 0 against FP cancellation.
    */
  private object BurstK {
    private val mean = "(CAST(sum_gap AS DOUBLE)/n_gaps)"
    private val vr =
      s"greatest(CAST(sumsq_gap AS DOUBLE)/n_gaps - $mean*$mean, 0.0e0)"
    val b: String = s"(sqrt($vr) - $mean)/(sqrt($vr) + $mean)"
    val fano: String = s"($vr)/$mean"
  }

  /** Alpha-beta tracker finite-window taps (alpha=0.5, beta=0.1, unit
    * step): the impulse response of 8 recursion steps from (x = oldest
    * sample, v = 0) for the position estimate, velocity estimate, and
    * final-step innovation — the HoltK scheme applied to the classic
    * fixed-gain radar smoother. Literals via dlit so sub-1e-3 taps keep
    * valid double syntax.
    */
  private[graft] object AlphaBetaK {
    val taps: (Seq[Double], Seq[Double], Seq[Double]) = {
      val alpha = 0.5; val beta = 0.1
      val xT = Array.fill(9)(0.0); val vT = Array.fill(9)(0.0)
      val rT = Array.fill(9)(0.0)
      for (j <- 8 to 0 by -1) { // impulse at lag position j (8 oldest)
        val y = Array.fill(9)(0.0); y(j) = 1.0
        var x = y(8); var v = 0.0; var r = 0.0
        for (i <- 7 to 0 by -1) { // consume newer samples in time order
          val xp = x + v
          r = y(i) - xp
          x = xp + alpha * r
          v = v + beta * r
        }
        xT(j) = x; vT(j) = v; rT(j) = r
      }
      (xT.toSeq, vT.toSeq, rT.toSeq)
    }
    private def dlit(d: Double): String = {
      val s = d.toString
      if (s.contains("E")) s.replace("E", "e") else s + "e0"
    }
    def dot(c: Seq[Double]): String =
      (0 to 8).map(i => s"v$i * ${dlit(c(i))}").mkString("(", " + ", ")")
  }

  /** Shared SQL fragments for the SBS feed — identical text evaluated by
    * Spark (`expr`) and DuckDB so synthesis, parse, and state fold follow
    * the same arithmetic. Field layout per the BaseStation format notes at
    * odin_adsb/src/sbs.rs:121-146; only integer-valued fields are placed
    * in the text so parse round-trips are exact.
    */
  private object SbsK {
    /** Mode S hex id from the user key. */
    val icao = "lpad(upper(hex(user_id % 150 + 1)), 6, '0')"
    /** Transmission-type mix incl. the ignored MSG,8 arm. */
    val mt = ("CASE CAST(event_id % 5 AS INT) WHEN 0 THEN 1 WHEN 1 THEN 3 " +
      "WHEN 2 THEN 4 WHEN 3 THEN 5 ELSE 8 END")
    /** The 22-field CSV line; `dateF`/`timeF` are the engine's formatter. */
    def line(dateF: String, timeF: String): String = s"""concat_ws(',',
      'MSG', CAST(mt0 AS STRING), CAST(event_id AS STRING), '11111', icao0,
      '111111', $dateF, $timeF, $dateF, $timeF,
      CASE WHEN mt0 = 1
           THEN rpad(concat('UAL', CAST(user_id % 1000 AS STRING)), 8, ' ')
           ELSE '' END,
      CASE WHEN mt0 IN (3, 5)
           THEN CAST(CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) + 1000 AS STRING)
           ELSE '' END,
      CASE WHEN mt0 = 4 THEN CAST(user_id % 500 + 100 AS STRING) ELSE '' END,
      CASE WHEN mt0 = 4 THEN CAST(event_id % 360 AS STRING) ELSE '' END,
      CASE WHEN mt0 = 3 AND event_id % 4 <> 0
           THEN CAST(CAST(floor((CAST(user_id*37 % 140 - 70 AS DOUBLE)
                + value/1000.0) * 100000.0) AS BIGINT) AS STRING) ELSE '' END,
      CASE WHEN mt0 = 3 AND event_id % 4 <> 0
           THEN CAST(CAST(floor((CAST(event_id*73 % 360 - 180 AS DOUBLE)
                + value/2000.0) * 100000.0) AS BIGINT) AS STRING) ELSE '' END,
      CASE WHEN mt0 = 4 THEN CAST((event_id % 129 - 64) * 64 AS STRING) ELSE '' END,
      CASE WHEN mt0 = 5 THEN CAST(4000 + user_id % 1000 AS STRING) ELSE '' END,
      '0', '0', '0', '0')"""
    def pInt(k: Int) = s"CAST(split_part(line, ',', $k) AS INT)"
    def pBig(k: Int) = s"CAST(split_part(line, ',', $k) AS BIGINT)"
    /** Empty CSV field → NULL, else BIGINT (1-based split_part index). */
    def optBig(k: Int): String =
      s"CASE WHEN split_part(line, ',', $k) <> '' THEN CAST(split_part(line, ',', $k) AS BIGINT) END"
    val callsign =
      "CASE WHEN split_part(line, ',', 11) <> '' THEN trim(split_part(line, ',', 11)) END"
  }
}
