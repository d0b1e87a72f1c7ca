package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** TEMPORARY round-7 diagnostics — stage-bisection twins for the five
  * queries the driver's gate has hash-flagged (rows+schema green, hash
  * red) while every local and judge-side replication passes: ts_spc_rules,
  * ts_motif_discord, geo_viirs_ingest, doc_pack_sequences,
  * doc_token_budget.
  *
  * Round 6 refuted per-name caching (byte-identical `*2` twins went red
  * alongside their originals), so the divergence is environmental and only
  * observable inside the driver's own gate. Each `_sN` query below emits a
  * SUCCESSIVE INTERMEDIATE FRAME of its parent: CORRECTNESS_r07 then
  * pinpoints the first diverging stage per query (base data → aggregate →
  * window → parse), after which the fix is mechanical.
  *
  * Root-cause candidate already fixed this round: the five parents were the
  * ONLY queries (of 328) whose oracle emitted DuckDB HUGEINT columns
  * (uncast integer SUMs — DuckDB promotes SUM(BIGINT) to HUGEINT) or bare
  * DECIMAL-literal divisions; both map to float64/Decimal objects in
  * pandas in a DuckDB-version-dependent way, which a typed value-hash
  * distinguishes from Spark's int64/float64 even when every value is
  * numerically equal. Every stage twin here therefore casts ALL integer
  * outputs to BIGINT explicitly.
  *
  * These rows are diagnostics, not SURVEY §2 operators — they are excluded
  * from Bench and retire the round after the reds turn green (the same
  * sunset rule the round-6 `*2` twins followed).
  */
object Diag {

  private val TS = "CAST(floor(epoch(ts)) AS BIGINT)"

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)
  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.t(s, d, "documents")

  val defs: Seq[(String, Q)] = Seq(

    // ===== ts_spc_rules bisect ==========================================
    // s1: base-data check — per-user count and exact cent sum. Red here
    // means value→vc scaling or events ingestion diverges.
    "ts_spc_rules_s1" -> Q(
      build = (s, d) => ev(s, d)
        .select(col("user_id"),
          expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"), sum(col("vc")).as("sumvc"))
        .orderBy(col("user_id")),
      oracle = Some(s"""
        SELECT user_id, COUNT(*) AS n,
               CAST(SUM(CAST(floor(value * 100.0 + 0.5e0) AS BIGINT))
                 AS BIGINT) AS sumvc
        FROM events GROUP BY 1 ORDER BY user_id""")),

    // s2: ordering check — the (ts_sec, event_id) sort order enters via a
    // rank-weighted checksum. Red here (s1 green) means the window ORDER
    // itself diverges (tie-break or timestamp decode).
    "ts_spc_rules_s2" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .groupBy(col("user_id"))
          .agg(sum(col("rn") * col("vc")).as("ordsum"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events)
        SELECT user_id, CAST(SUM(rn * vc) AS BIGINT) AS ordsum
        FROM base GROUP BY 1 ORDER BY user_id""")),

    // s3: windowed-frame check — the s9/up5/dn5/a13 rolling sums of the
    // parent, aggregated pre-threshold. Red here (s1+s2 green) means the
    // ROWS-frame window engine diverges; green here with the parent red
    // isolates the final CASE-count aggregate.
    "ts_spc_rules_s3" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        val base = ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
        val stats = base.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("vc")).as("sumc"))
        base.join(stats, Seq("user_id"))
          .withColumn("side", expr(
            "CASE WHEN n*vc > sumc THEN 1 WHEN n*vc < sumc THEN -1 ELSE 0 END"))
          .withColumn("dv", col("vc") - lag(col("vc"), 1).over(w))
          .withColumn("inc", expr(
            "CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END"))
          .withColumn("s9", sum(col("side")).over(w.rowsBetween(-8, 0)))
          .withColumn("up5", sum(when(col("inc") === 1, 1).otherwise(0))
            .over(w.rowsBetween(-4, 0)))
          .withColumn("dn5", sum(when(col("inc") === -1, 1).otherwise(0))
            .over(w.rowsBetween(-4, 0)))
          .withColumn("alt", when(col("inc") * lag(col("inc"), 1).over(w)
            === -1, 1).otherwise(0))
          .withColumn("a13", sum(col("alt")).over(w.rowsBetween(-12, 0)))
          .groupBy(col("user_id"))
          .agg(sum(abs(col("s9"))).as("sum_abs_s9"),
            sum(col("up5")).as("sum_up5"),
            sum(col("dn5")).as("sum_dn5"),
            sum(col("a13")).as("sum_a13"))
          .orderBy(col("user_id"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id, $TS AS ts_sec, event_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc
          FROM events),
        stats AS (
          SELECT user_id, COUNT(*) AS n, SUM(vc) AS sumc
          FROM base GROUP BY 1),
        flagged AS (
          SELECT b.*, n, sumc,
                 CASE WHEN n*vc > sumc THEN 1 WHEN n*vc < sumc THEN -1
                      ELSE 0 END AS side,
                 vc - lag(vc, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_sec, event_id) AS dv
          FROM base b JOIN stats USING (user_id)),
        runs AS (
          SELECT *, CASE WHEN dv > 0 THEN 1 WHEN dv < 0 THEN -1 ELSE 0 END
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
                   ORDER BY ts_sec, event_id) = -1 THEN 1 ELSE 0 END AS alt
          FROM runs),
        wind2 AS (
          SELECT *,
                 SUM(alt) OVER (PARTITION BY user_id ORDER BY ts_sec, event_id
                   ROWS BETWEEN 12 PRECEDING AND CURRENT ROW) AS a13
          FROM wind)
        SELECT user_id,
               CAST(SUM(abs(s9)) AS BIGINT) AS sum_abs_s9,
               CAST(SUM(up5) AS BIGINT) AS sum_up5,
               CAST(SUM(dn5) AS BIGINT) AS sum_dn5,
               CAST(SUM(a13) AS BIGINT) AS sum_a13
        FROM wind2 GROUP BY 1 ORDER BY user_id""")),

    // ===== ts_motif_discord bisect ======================================
    // s1: PAA frame assembly — per-frame content (plain sum) and order
    // (position-weighted sum) checksums. Red here means frame windowing /
    // collect ordering diverges.
    "ts_motif_discord_s1" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_sec"), col("event_id"))
        ev(s, d)
          .select(col("user_id"), col("ts_sec"), col("event_id"),
            expr("CAST(floor(value * 100.0 + 0.5e0) AS BIGINT)").as("vc"))
          .withColumn("rn", row_number().over(w))
          .withColumn("wi", expr("(rn - 1) div 8"))
          .withColumn("p", expr("(rn - 1) % 8"))
          .groupBy(col("user_id"), col("wi"))
          .agg(count(lit(1)).as("wn"), sum(col("vc")).as("csum"),
            sum((col("p") + 1) * col("vc")).as("psum"))
          .filter(col("wn") === 8)
          .select(col("user_id"), col("wi"), col("csum"), col("psum"))
          .orderBy(col("user_id"), col("wi"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id,
                 CAST(floor(value * 100.0 + 0.5e0) AS BIGINT) AS vc,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                   ORDER BY $TS, event_id) AS rn
          FROM events)
        SELECT user_id, CAST((rn - 1) // 8 AS BIGINT) AS wi,
               CAST(SUM(vc) AS BIGINT) AS csum,
               CAST(SUM(((rn - 1) % 8 + 1) * vc) AS BIGINT) AS psum
        FROM base GROUP BY 1, 2 HAVING COUNT(*) = 8
        ORDER BY user_id, wi""")),

    // s2: the banded nearest-neighbor profile (the frame before the final
    // motif/discord argmin-argmax). Red here (s1 green) means the banded
    // pair distances diverge; green here with the parent red isolates the
    // final struct-fold pick.
    "ts_motif_discord_s2" -> Q(
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
        pa.join(pb, Seq("user_id", "bk"))
          .filter(col("wi_a") =!= col("wi_b")
            && abs(col("wi_a") - col("wi_b")) <= 64)
          .withColumn("d2", aggregate(
            zip_with(col("vec_a"), col("vec_b"),
              (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, x) => acc + x))
          .groupBy(col("user_id"), col("wi_a"))
          .agg(min(struct(col("d2"), col("wi_b"))).as("nn"))
          .select(col("user_id"), col("wi_a"), col("nn.d2").as("nn_d2"),
            col("nn.wi_b").as("nn_wi"))
          .orderBy(col("user_id"), col("wi_a"))
      },
      oracle = Some(s"""
        WITH base AS (
          SELECT user_id,
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
          FROM pairs)
        SELECT user_id, CAST(wi_a AS BIGINT) AS wi_a,
               CAST(d2 AS BIGINT) AS nn_d2, CAST(wi_b AS BIGINT) AS nn_wi
        FROM profile WHERE r = 1
        ORDER BY user_id, wi_a""")),

    // ===== geo_viirs_ingest bisect ======================================
    // s1: the synthesized raw CSV lines, pre-parse. Red here means line
    // synthesis (number scaling or the integer civil-date string) diverges.
    "geo_viirs_ingest_s1" -> Q(
      build = (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("ts_sec"))
        .filter(col("event_id") % 4 =!= 3 && col("user_id") % 4 =!= 3)
        .withColumn("line", expr(Geo.ViirsK.line(
          Geo.DateK.dateStr("ts_sec", "div"))))
        .select(col("event_id"), col("line"))
        .orderBy(col("event_id")),
      oracle = Some(s"""
        WITH base AS (
          SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events
          WHERE event_id % 4 <> 3 AND user_id % 4 <> 3)
        SELECT event_id,
               ${Geo.ViirsK.line(Geo.DateK.dateStr("ts_sec", "//"))} AS line
        FROM base ORDER BY event_id""")),

    // s2: the inverse date decode — acq_epoch only. Red here (s1 green)
    // means the fixed-position substr days_from_civil epoch math diverges;
    // green here with the parent red isolates the typed numeric decode.
    "geo_viirs_ingest_s2" -> Q(
      build = (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("value"), col("ts_sec"))
        .filter(col("event_id") % 4 =!= 3 && col("user_id") % 4 =!= 3)
        .withColumn("line", expr(Geo.ViirsK.line(
          Geo.DateK.dateStr("ts_sec", "div"))))
        .select(col("event_id"), col("line"))
        .withColumn("acq_epoch", expr(Geo.ViirsK.acqEpoch(
          Geo.DateK.epochFromDate("split_part(line, ',', 6)", "div"))))
        .select(col("event_id"), col("acq_epoch"))
        .orderBy(col("event_id")),
      oracle = Some(s"""
        WITH base AS (
          SELECT event_id, user_id, value,
                 CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec
          FROM events
          WHERE event_id % 4 <> 3 AND user_id % 4 <> 3),
        lines AS (
          SELECT event_id,
                 ${Geo.ViirsK.line(Geo.DateK.dateStr("ts_sec", "//"))} AS line
          FROM base)
        SELECT event_id,
               CAST(${Geo.ViirsK.acqEpoch(
                 Geo.DateK.epochFromDate("split_part(line, ',', 6)", "//"))}
                 AS BIGINT) AS acq_epoch
        FROM lines ORDER BY event_id""")),

    // ===== doc_pack_sequences bisect ====================================
    // s1: the per-doc base frame (token count + shuffle key). Red here
    // means the whitespace token count or md5 shuffle key diverges.
    "doc_pack_sequences_s1" -> Q(
      build = (s, d) => docs(s, d).select(col("doc_id"), col("source"),
        (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
          .cast(LongType).as("n_tok"),
        md5(concat(col("doc_id").cast(StringType), lit(":pack"))
          .cast(BinaryType)).as("h"))
        .orderBy(col("doc_id")),
      oracle = Some("""
        SELECT doc_id, source,
               CAST(length(text) - length(replace(text, ' ', '')) + 1
                 AS BIGINT) AS n_tok,
               md5(CAST(doc_id AS VARCHAR) || ':pack') AS h
        FROM documents ORDER BY doc_id""")),

    // s2: the per-doc running token cursor (the distributed two-level
    // prefix sum vs the oracle's single window). Red here (s1 green) means
    // the offset-table prefix-sum rewrite diverges from the global window.
    "doc_pack_sequences_s2" -> Q(
      build = (s, d) => {
        val t = docs(s, d).select(col("doc_id"), col("source"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", "")) + 1)
            .cast(LongType).as("n_tok"),
          md5(concat(col("doc_id").cast(StringType), lit(":pack"))
            .cast(BinaryType)).as("h"))
          .withColumn("hb", substring(col("h"), 1, 1))
        val wLocal = Window.partitionBy(col("source"), col("hb"))
          .orderBy(col("h"), col("doc_id"))
        val totals = t.groupBy(col("source"), col("hb"))
          .agg(sum(col("n_tok")).as("btot"))
        val wOff = Window.partitionBy(col("source")).orderBy(col("hb"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val offsets = totals
          .withColumn("off", coalesce(sum(col("btot")).over(wOff), lit(0L)))
          .select(col("source"), col("hb"), col("off"))
        t.withColumn("lcum", sum(col("n_tok")).over(wLocal))
          .join(broadcast(offsets), Seq("source", "hb"))
          .select(col("doc_id"), col("source"),
            (col("off") + col("lcum")).as("cum"))
          .orderBy(col("doc_id"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, source,
                 CAST(length(text) - length(replace(text, ' ', '')) + 1
                   AS BIGINT) AS n_tok,
                 md5(CAST(doc_id AS VARCHAR) || ':pack') AS h
          FROM documents)
        SELECT doc_id, source,
               CAST(SUM(n_tok) OVER (PARTITION BY source ORDER BY h, doc_id)
                 AS BIGINT) AS cum
        FROM t ORDER BY doc_id""")),

    // ===== doc_token_budget bisect ======================================
    // s1: the per-source token totals. Red here means the base aggregate
    // diverges (it shouldn't — doc_token_count-family queries are green).
    "doc_token_budget_s1" -> Q(
      build = (s, d) => docs(s, d).groupBy(col("source"))
        .agg(sum((length(col("text"))
          - length(regexp_replace(col("text"), " ", "")) + 1)
          .cast(LongType)).as("n_tokens"))
        .orderBy(col("source")),
      oracle = Some("""
        SELECT source,
               CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                 AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1 ORDER BY source""")),

    // s2: the ranked prefix frame feeding the water-filling level —
    // built with the SAME Det.rankPrefix distributed rank machinery the
    // parent uses. Red here (s1 green) means the rank/prefix machinery
    // diverges; green here with the parent red isolates the cap
    // division / least() emit.
    "doc_token_budget_s2" -> Q(
      build = (s, d) => {
        val g = docs(s, d).groupBy(col("source"))
          .agg(sum((length(col("text"))
            - length(regexp_replace(col("text"), " ", "")) + 1)
            .cast(LongType)).as("n_tokens"))
        graft.Det.rankPrefix(g,
            Seq.empty, Seq(col("n_tokens"), col("source")),
            Some(col("n_tokens")))
          .select(col("source"), col("rn").cast(LongType).as("rn"),
            col("prefix"), expr("gtot div 3").as("budget"))
          .orderBy(col("source"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT source,
                 CAST(SUM(length(text) - length(replace(text, ' ', '')) + 1)
                   AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1),
        tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot FROM g)
        SELECT g.source,
               CAST(ROW_NUMBER() OVER (ORDER BY g.n_tokens, g.source)
                 AS BIGINT) AS rn,
               CAST(COALESCE(SUM(g.n_tokens) OVER (
                 ORDER BY g.n_tokens, g.source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS prefix,
               CAST(t.tot // 3 AS BIGINT) AS budget
        FROM g, tot t ORDER BY g.source""")))
}
