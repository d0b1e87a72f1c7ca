package graft.operators

import graft.{Det, Q, Tables}
import graft.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** §2.A relational core — the substrate every ODIN-style pipeline sits on.
  *
  * Each query is declarative DataFrame code: filters/projections reach the
  * parquet scan, small dims broadcast, aggregates do map-side partials, and
  * windows are single-shuffle. Mirrors of the record filtering/joining that
  * e.g. odin_goesr/src/lib.rs:262 (update_hotspots) and
  * odin_sentinel/src/lib.rs do imperatively per record-set.
  */
object Relational {

  private def li(s: SparkSession, d: String) = Tables.t(s, d, "lineitem")
  private def ord(s: SparkSession, d: String) = Tables.t(s, d, "orders")
  private def cust(s: SparkSession, d: String) = Tables.t(s, d, "customer")
  private def pt(s: SparkSession, d: String) = Tables.t(s, d, "part")
  private def sup(s: SparkSession, d: String) = Tables.t(s, d, "supplier")
  private def nat(s: SparkSession, d: String) = Tables.t(s, d, "nation")
  private def reg(s: SparkSession, d: String) = Tables.t(s, d, "region")

  val defs: Seq[(String, Q)] = Seq(

    // ----- q1_agg: TPC-H Q1 shape — groupBy + multi-aggregate ------------
    "q1_agg" -> Q(
      build = (s, d) =>
        li(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
              .cast(DoubleType).as("sum_disc_price"),
            sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount"))
              * decR(lit(1.0) + col("l_tax"))).cast(DoubleType).as("sum_charge"),
            davg(col("l_quantity")).as("avg_qty"),
            davg(col("l_extendedprice")).as("avg_price"),
            (sum(decR(col("l_discount")).cast(DecimalType(12, 2))).cast(DoubleType)
              / count(col("l_discount"))).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      oracle = Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${DSUM("l_quantity")} AS sum_qty,
               ${DSUM("l_extendedprice")} AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2)) * CAST(1.0+l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
               ${DAVG("l_quantity")} AS avg_qty,
               ${DAVG("l_extendedprice")} AS avg_price,
               CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(12,2))) AS DOUBLE)/COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      bench = true),

    // ----- q2_filter_project: pushdown-friendly scan ----------------------
    "q2_filter_project" -> Q(
      build = (s, d) =>
        pt(s, d)
          .filter(col("p_size") >= 25 && col("p_type") =!= "PROMO")
          .select(col("p_partkey"), col("p_name"), col("p_retailprice"),
            upper(col("p_brand")).as("brand_uc"))
          .orderBy(col("p_partkey")),
      oracle = Some("""
        SELECT p_partkey, p_name, p_retailprice, upper(p_brand) AS brand_uc
        FROM part WHERE p_size >= 25 AND p_type <> 'PROMO'
        ORDER BY p_partkey""")),

    // ----- q3_join_agg: TPC-H Q3 shape — 3-way join + agg + topN ----------
    "q3_join_agg" -> Q(
      build = (s, d) => {
        val c = cust(s, d).filter(col("c_mktsegment") === "BUILDING")
        val o = ord(s, d).filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        val l = li(s, d).filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
        c.join(o, col("c_custkey") === col("o_custkey"))
          .join(l, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("o_orderkey"))
          .limit(20)
      },
      oracle = Some("""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 20"""),
      bench = true),

    // ----- q4_broadcast_join: small-dim broadcast -------------------------
    "q4_broadcast_join" -> Q(
      build = (s, d) =>
        li(s, d)
          .join(broadcast(pt(s, d)), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_lines"),
            dsum(col("l_extendedprice")).as("brand_rev"))
          .orderBy(col("p_brand")),
      oracle = Some(s"""
        SELECT p_brand, COUNT(*) AS n_lines, ${DSUM("l_extendedprice")} AS brand_rev
        FROM lineitem, part WHERE l_partkey = p_partkey
        GROUP BY p_brand ORDER BY p_brand"""),
      bench = true),

    // ----- q5_multi_join: TPC-H Q5 shape — 6-way star join ----------------
    "q5_multi_join" -> Q(
      build = (s, d) => {
        val r = reg(s, d).filter(col("r_name") === "ASIA")
        r.join(broadcast(nat(s, d)), col("r_regionkey") === col("n_regionkey"))
          .join(cust(s, d), col("n_nationkey") === col("c_nationkey"))
          .join(ord(s, d), col("c_custkey") === col("o_custkey"))
          .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(sup(s, d)),
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
          .groupBy(col("n_name"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      oracle = Some("""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM region, nation, customer, orders, lineitem, supplier
        WHERE r_name = 'ASIA' AND r_regionkey = n_regionkey
          AND n_nationkey = c_nationkey AND c_custkey = o_custkey
          AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
          AND c_nationkey = s_nationkey
        GROUP BY n_name ORDER BY revenue DESC, n_name"""),
      bench = true),

    // ----- q6_topn: global order-by + limit (TakeOrderedAndProject) -------
    "q6_topn" -> Q(
      build = (s, d) =>
        ord(s, d)
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(10),
      oracle = Some("""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ----- q7_distinct ----------------------------------------------------
    "q7_distinct" -> Q(
      build = (s, d) =>
        ord(s, d).select(col("o_orderstatus"), col("o_orderpriority")).distinct()
          .orderBy(col("o_orderstatus"), col("o_orderpriority")),
      oracle = Some("""
        SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        ORDER BY o_orderstatus, o_orderpriority""")),

    // ----- q8_semi_join: EXISTS ------------------------------------------
    "q8_semi_join" -> Q(
      build = (s, d) =>
        cust(s, d)
          .join(ord(s, d).filter(col("o_totalprice") > 300000.0),
            col("c_custkey") === col("o_custkey"), "left_semi")
          .select(col("c_custkey"), col("c_name"))
          .orderBy(col("c_custkey")),
      oracle = Some("""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)
        ORDER BY c_custkey""")),

    // ----- q9_anti_join: NOT EXISTS --------------------------------------
    "q9_anti_join" -> Q(
      build = (s, d) =>
        pt(s, d)
          .join(li(s, d).filter(col("l_quantity") >= 48.0),
            col("p_partkey") === col("l_partkey"), "left_anti")
          .select(col("p_partkey"), col("p_name"))
          .orderBy(col("p_partkey")),
      oracle = Some("""
        SELECT p_partkey, p_name FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem
                          WHERE l_partkey = p_partkey AND l_quantity >= 48.0)
        ORDER BY p_partkey""")),

    // ----- q10_window_rank: top-3 per group via row_number ---------------
    "q10_window_rank" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        ord(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      oracle = Some("""
        SELECT o_orderpriority, CAST(rn AS INT) AS rn, o_orderkey, o_totalprice FROM (
          SELECT o_orderpriority, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3
        ORDER BY o_orderpriority, rn""")),

    // ----- q11_window_running: exact running sum per entity --------------
    "q11_window_running" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ord(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            sum(decP(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
          .orderBy(col("o_custkey"), col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
                    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        FROM orders ORDER BY o_custkey, o_orderkey""")),

    // ----- q12_rollup: hierarchical totals -------------------------------
    "q12_rollup" -> Q(
      build = (s, d) =>
        cust(s, d)
          .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_cust"), dsum(col("c_acctbal")).as("total_bal"))
          .select(coalesce(col("r_name"), lit("ALL")).as("region_name"),
            coalesce(col("n_name"), lit("ALL")).as("nation_name"),
            col("n_cust"), col("total_bal"))
          .orderBy(col("region_name"), col("nation_name")),
      oracle = Some(s"""
        SELECT COALESCE(r_name,'ALL') AS region_name, COALESCE(n_name,'ALL') AS nation_name,
               COUNT(*) AS n_cust, ${DSUM("c_acctbal")} AS total_bal
        FROM customer, nation, region
        WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY region_name, nation_name""")),

    // ----- q13_grouping_sets: cube slice ---------------------------------
    "q13_grouping_sets" -> Q(
      build = (s, d) =>
        ord(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_rev"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n_orders"), col("total_rev"))
          .orderBy(col("status"), col("priority")),
      oracle = Some(s"""
        SELECT COALESCE(o_orderstatus,'ALL') AS status, COALESCE(o_orderpriority,'ALL') AS priority,
               COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS total_rev
        FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ----- q14_pivot: conditional aggregation ----------------------------
    "q14_pivot" -> Q(
      build = (s, d) =>
        ord(s, d)
          .groupBy(col("o_orderpriority"))
          .agg(
            sum(when(col("o_orderstatus") === "O", decP(col("o_totalprice"))))
              .cast(DoubleType).as("open_total"),
            sum(when(col("o_orderstatus") === "F", decP(col("o_totalprice"))))
              .cast(DoubleType).as("filled_total"),
            sum(when(col("o_orderstatus") === "P", decP(col("o_totalprice"))))
              .cast(DoubleType).as("pending_total"),
            count(lit(1)).as("n_orders"))
          .orderBy(col("o_orderpriority")),
      oracle = Some("""
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN o_orderstatus='O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS open_total,
               CAST(SUM(CASE WHEN o_orderstatus='F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS filled_total,
               CAST(SUM(CASE WHEN o_orderstatus='P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS pending_total,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ----- q15_union: heterogeneous source union -------------------------
    "q15_union" -> Q(
      build = (s, d) =>
        cust(s, d).select(lit("customer").as("kind"), col("c_name").as("name"),
          col("c_acctbal").as("bal"))
          .unionAll(sup(s, d).select(lit("supplier").as("kind"),
            col("s_name").as("name"), col("s_acctbal").as("bal")))
          .orderBy(col("kind"), col("name")),
      oracle = Some("""
        SELECT 'customer' AS kind, c_name AS name, c_acctbal AS bal FROM customer
        UNION ALL
        SELECT 'supplier' AS kind, s_name AS name, s_acctbal AS bal FROM supplier
        ORDER BY kind, name""")),

    // ----- q16_scalar_subquery: TPC-H Q17 shape --------------------------
    "q16_scalar_subquery" -> Q(
      build = (s, d) => {
        val thresh = li(s, d).groupBy(col("l_partkey").as("t_partkey"))
          .agg((lit(0.2) * davg(col("l_quantity"))).as("threshold"))
        li(s, d)
          .join(broadcast(thresh), col("l_partkey") === col("t_partkey"))
          .filter(col("l_quantity") < col("threshold"))
          .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      },
      oracle = Some(s"""
        SELECT ${DSUM("l_extendedprice")}/7.0 AS avg_yearly
        FROM lineitem l1
        WHERE l1.l_quantity < (
          SELECT 0.2*(CAST(SUM(CAST(l2.l_quantity AS DECIMAL(12,2))) AS DOUBLE)/COUNT(l2.l_quantity))
          FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)"""),
      bench = true),

    // ----- q17_having: post-aggregation filter ---------------------------
    "q17_having" -> Q(
      build = (s, d) =>
        ord(s, d)
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
          .filter(col("n_orders") >= 5)
          .orderBy(col("o_custkey")),
      oracle = Some(s"""
        SELECT o_custkey, COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 5
        ORDER BY o_custkey""")),

    // ----- q18_string_funcs ----------------------------------------------
    "q18_string_funcs" -> Q(
      build = (s, d) =>
        cust(s, d)
          .filter(col("c_name").like("%1%"))
          .select(col("c_custkey"),
            upper(col("c_name")).as("uname"),
            substring(col("c_name"), 1, 8).as("prefix8"),
            length(col("c_name")).cast(LongType).as("name_len"),
            concat(col("c_mktsegment"), lit(":"), col("c_name")).as("tagged"))
          .orderBy(col("c_custkey")),
      oracle = Some("""
        SELECT c_custkey, upper(c_name) AS uname, substr(c_name,1,8) AS prefix8,
               CAST(length(c_name) AS BIGINT) AS name_len,
               c_mktsegment || ':' || c_name AS tagged
        FROM customer WHERE c_name LIKE '%1%' ORDER BY c_custkey""")),

    // ----- q19_date_funcs: calendar rollup -------------------------------
    "q19_date_funcs" -> Q(
      build = (s, d) =>
        ord(s, d)
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"),
            month(col("o_orderdate")).cast(LongType).as("o_month"))
          .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("month_rev"))
          .orderBy(col("o_year"), col("o_month")),
      oracle = Some(s"""
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               CAST(EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS o_month,
               COUNT(*) AS n_orders, ${DSUM("o_totalprice")} AS month_rev
        FROM orders GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- q21_profile: dataset profiling (pipeline hygiene op) ----------
    // Per-column stats a training-data pipeline runs before ingest: null
    // counts, exact distincts, ranges. One scan per column union'd —
    // Catalyst collapses to shared scans; at 100 TB swap distinct for the
    // HLL sketch (see ApproxSpec).
    "q21_profile" -> Q(
      build = (s, d) => {
        def prof(c: String) = li(s, d).agg(
          lit(c).as("col_name"),
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast(DoubleType).as("min_val"),
          max(col(c)).cast(DoubleType).as("max_val"))
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(prof).reduce(_.unionAll(_))
          .orderBy(col("col_name"))
      },
      oracle = Some {
        def p(c: String) =
          s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
              CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
              COUNT(DISTINCT $c) AS n_distinct,
              CAST(MIN($c) AS DOUBLE) AS min_val, CAST(MAX($c) AS DOUBLE) AS max_val
              FROM lineitem"""
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
          .map(p).mkString("", " UNION ALL ", " ORDER BY col_name")
      }),

    // ----- q23_min_cost_match: TPC-H Q2 shape — correlated min ----------
    // Cheapest lineitem per part, matched back (correlated aggregate).
    "q23_min_cost_match" -> Q(
      // Semantic: the correlated min-subquery shape (the oracle keeps that
      // form). Plan: ONE pass — the lexicographic struct-min aggregate
      // (min price, then min orderkey at that price) is exactly the
      // correlated result, map-side combinable, with no second scan and
      // no join-back shuffle (r10: 11.3 s → one agg at ×100).
      build = (s, d) =>
        li(s, d)
          // struct-min only skips fully-null structs, so a NULL price
          // would sort first and win where the oracle's MIN ignores it;
          // the filter makes the rewrite unconditionally equivalent
          // (no-op on TPC-H data, pushed into the scan)
          .filter(col("l_extendedprice").isNotNull)
          .groupBy(col("l_partkey"))
          .agg(min(struct(col("l_extendedprice"), col("l_orderkey"))).as("m"))
          .select(col("l_partkey"), col("m.l_orderkey").as("cheapest_order"),
            col("m.l_extendedprice").as("min_price"))
          .orderBy(col("l_partkey")),
      oracle = Some("""
        SELECT l_partkey, MIN(l_orderkey) AS cheapest_order,
               MIN(l_extendedprice) AS min_price
        FROM lineitem l1
        WHERE l_extendedprice = (SELECT MIN(l2.l_extendedprice) FROM lineitem l2
                                 WHERE l2.l_partkey = l1.l_partkey)
        GROUP BY l_partkey ORDER BY l_partkey""")),

    // ----- q24_double_exists: TPC-H Q21 shape — EXISTS + NOT EXISTS ------
    // Suppliers with a late line on a multi-supplier order where no other
    // supplier was late (two correlated quantified predicates).
    "q24_double_exists" -> Q(
      build = (s, d) => {
        val l = li(s, d).select(col("l_orderkey"), col("l_suppkey"),
          col("l_shipdate"), col("l_quantity"))
        val late = l.filter(col("l_quantity") >= 40.0)
          .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1"))
        val others = l.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2"))
        val lateOthers = l.filter(col("l_quantity") >= 40.0)
          .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3"))
        late
          .join(others, col("o2") === col("o1") && col("s2") =!= col("s1"), "left_semi")
          .join(lateOthers, col("o3") === col("o1") && col("s3") =!= col("s1"), "left_anti")
          .groupBy(col("s1").as("l_suppkey"))
          .agg(count(lit(1)).as("n_waiting"))
          .orderBy(col("n_waiting").desc, col("l_suppkey"))
      },
      oracle = Some("""
        SELECT l1.l_suppkey, COUNT(*) AS n_waiting
        FROM lineitem l1
        WHERE l1.l_quantity >= 40.0
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_quantity >= 40.0)
        GROUP BY l1.l_suppkey
        ORDER BY n_waiting DESC, l_suppkey""")),

    // ----- q25_inactive_customers: TPC-H Q22 shape -----------------------
    // Customers above the average balance with no orders at all.
    "q25_inactive_customers" -> Q(
      build = (s, d) => {
        val avgBal = cust(s, d).filter(col("c_acctbal") > 0.0)
          .agg(davg(col("c_acctbal")).as("avg_bal"))
        cust(s, d)
          .crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(ord(s, d).filter(col("o_orderpriority") === "1-URGENT"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select(substring(col("c_name"), 10, 2).as("cust_group"),
            col("c_custkey"), col("c_acctbal"))
          .orderBy(col("c_custkey"))
      },
      oracle = Some(s"""
        SELECT substr(c_name, 10, 2) AS cust_group, c_custkey, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT ${DAVG("c_acctbal")} FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")),

    // ----- q22_distribution: ntile/percent_rank/cume_dist ----------------
    // Scale shape: NO single-partition global window. The global rank
    // rides the shared Det.rankPrefix distributed-rank idiom;
    // ntile/percent_rank/cume_dist then derive from (rank, N) arithmetic
    // identical to the SQL window definitions, and the result is
    // invariant to where the range boundaries fall.
    "q22_distribution" -> Q(
      build = (s, d) => {
        graft.Det.rankPrefix(
            ord(s, d).select(col("o_orderkey"), col("o_totalprice")),
            Seq.empty, Seq(col("o_totalprice"), col("o_orderkey")))
          .withColumn("rnk", col("rn"))
          .withColumn("n_total", col("n_grp"))
          .withColumn("quartile", expr("""
            CASE WHEN rnk <= (n_total div 4 + 1) * (n_total % 4)
                 THEN (rnk - 1) div (n_total div 4 + 1) + 1
                 ELSE n_total % 4
                      + (rnk - 1 - (n_total div 4 + 1) * (n_total % 4)) div (n_total div 4)
                      + 1 END"""))
          .select(col("o_orderkey"), col("o_totalprice"),
            col("quartile").cast(LongType).as("quartile"),
            // SQL percent_rank() is defined as 0.0 for a single row
            when(col("n_total") === 1, lit(0.0))
              .otherwise((col("rnk") - 1).cast(DoubleType) / (col("n_total") - 1))
              .as("pct_rank"),
            (col("rnk").cast(DoubleType) / col("n_total")).as("cume"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        SELECT o_orderkey, o_totalprice,
               CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume
        FROM orders
        WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
        ORDER BY o_orderkey""")),

    // ----- q20_case_agg: CASE bucket classification ----------------------
    "q20_case_agg" -> Q(
      build = (s, d) =>
        ord(s, d)
          .select(when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 150000.0, "mid")
            .otherwise("high").as("bucket"), col("o_totalprice"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_orders"), davg(col("o_totalprice")).as("avg_price"))
          .orderBy(col("bucket")),
      oracle = Some(s"""
        SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low'
                    WHEN o_totalprice < 150000.0 THEN 'mid'
                    ELSE 'high' END AS bucket,
               COUNT(*) AS n_orders, ${DAVG("o_totalprice")} AS avg_price
        FROM orders GROUP BY 1 ORDER BY 1""")),

    // ----- q28_winsorize: robust-stats outlier clamping ------------------
    // The data-cleaning step before any sensitive aggregate: clamp each
    // reading to its group's [p10, p90] band and report raw vs. winsorized
    // means. Quantiles round to 4 decimals (safe: interpolants of 2-decimal
    // data carry <= 3 decimals), clamped values therefore carry <= 4
    // decimals, so the winsorized mean is an exact DECIMAL(14,4) sum.
    "q28_winsorize" -> Q(
      build = (s, d) => {
        val bands = Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(round(expr("percentile(value, 0.1)"), 4).as("p10"),
            round(expr("percentile(value, 0.9)"), 4).as("p90"))
        Tables.events(s, d)
          .join(broadcast(bands), "event_type")
          .withColumn("clamped", least(greatest(col("value"), col("p10")), col("p90")))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            (sum(decP(col("value"))).cast(DoubleType) / count(lit(1))).as("mean_raw"),
            (sum(col("clamped").cast(DecimalType(14, 4))).cast(DoubleType)
              / count(lit(1))).as("mean_winsorized"),
            max(col("p10")).as("p10"), max(col("p90")).as("p90"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH bands AS (
          SELECT event_type, round(quantile_cont(value, 0.1), 4) AS p10,
                 round(quantile_cont(value, 0.9), 4) AS p90
          FROM events GROUP BY 1)
        SELECT e.event_type AS event_type, COUNT(*) AS n,
               CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_raw,
               CAST(SUM(CAST(least(greatest(e.value, b.p10), b.p90) AS DECIMAL(14,4)))
                    AS DOUBLE) / COUNT(*) AS mean_winsorized,
               MAX(b.p10) AS p10, MAX(b.p90) AS p90
        FROM events e JOIN bands b ON e.event_type = b.event_type
        GROUP BY 1 ORDER BY event_type""")),

    // ----- q27_snapshot_diff: dataset-version diff (SCD accounting) ------
    // The change-data report between two table versions: full outer join
    // on the key, classify added / removed / changed / unchanged. Two
    // deterministic "snapshots" derive from orders; the join is keyed on
    // the natural key so at scale it rides the same hash partitioning as
    // every other orders op. The per-class rollup is what an incremental
    // pipeline publishes after each ingest.
    "q27_snapshot_diff" -> Q(
      build = (s, d) => {
        val o = Tables.t(s, d, "orders")
        val old = o.filter(col("o_orderkey") % 3 =!= 0)
          .select(col("o_orderkey").as("k"), col("o_totalprice").as("old_price"))
        val neu = o.filter(col("o_orderkey") % 5 =!= 0)
          .select(col("o_orderkey").as("k"),
            when(col("o_orderkey") % 7 === 0, decP(col("o_totalprice")) * 2)
              .otherwise(decP(col("o_totalprice"))).cast(DoubleType).as("new_price"))
        old.join(neu, Seq("k"), "full_outer")
          .withColumn("status",
            when(col("old_price").isNull, "added")
              .when(col("new_price").isNull, "removed")
              .when(col("old_price") =!= col("new_price"), "changed")
              .otherwise("unchanged"))
          .groupBy(col("status"))
          .agg(count(lit(1)).as("n_rows"), min(col("k")).as("first_key"))
          .orderBy(col("status"))
      },
      oracle = Some("""
        WITH old AS (
          SELECT o_orderkey AS k, o_totalprice AS old_price
          FROM orders WHERE o_orderkey % 3 <> 0),
        neu AS (
          SELECT o_orderkey AS k,
                 CASE WHEN o_orderkey % 7 = 0
                      THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 2 AS DOUBLE)
                      ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE)
                 END AS new_price
          FROM orders WHERE o_orderkey % 5 <> 0)
        SELECT CASE WHEN old_price IS NULL THEN 'added'
                    WHEN new_price IS NULL THEN 'removed'
                    WHEN old_price <> new_price THEN 'changed'
                    ELSE 'unchanged' END AS status,
               COUNT(*) AS n_rows, MIN(COALESCE(old.k, neu.k)) AS first_key
        FROM old FULL OUTER JOIN neu ON old.k = neu.k
        GROUP BY 1 ORDER BY 1"""))
,
    // ----- q26_median: exact median / p90 per group ----------------------
    // The sort-based exact quantiles that approx_sketch replaces at 100 TB
    // (kept here as the small-data oracle for those sketches). Interpolated
    // quantiles of 2-decimal data carry at most 3 decimals, so rounding at
    // 4 decimals can never sit on a rounding boundary — cross-engine safe.
    "q26_median" -> Q(
      build = (s, d) =>
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            round(expr("percentile(value, 0.5)"), 4).as("med_value"),
            round(expr("percentile(value, 0.9)"), 4).as("p90_value"))
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type, COUNT(*) AS n,
               round(quantile_cont(value, 0.5), 4) AS med_value,
               round(quantile_cont(value, 0.9), 4) AS p90_value
        FROM events GROUP BY 1 ORDER BY 1""")),

    // ----- q29_scd2_dim: slowly-changing-dimension as-of join ------------
    // The SCD2 pattern every warehouse needs: facts join the dimension
    // version that was effective AT FACT TIME, not the current one.
    // Supplier "rate" versions take effect every 600 days; each lineitem
    // picks the version effective at its ship date via the native
    // AsOfJoinExec (one shuffle+sort per side, streaming merge — the same
    // operator ts_asof_native proves, here in its warehouse role).
    // Version 0 is effective from day 0, so every fact matches (inner ==
    // left-outer) and the DuckDB LATERAL oracle can use a plain join.
    "q29_scd2_dim" -> Q(
      build = (s, d) => {
        val dim = Tables.t(s, d, "supplier")
          .select(col("s_suppkey"),
            expr("CAST(CAST(s_acctbal AS DECIMAL(12,2))*100 AS BIGINT)").as("base_cents"))
          .withColumn("v", explode(expr("sequence(0, 3)")))
          .select(col("s_suppkey"), (col("v") * 600).cast(LongType).as("ver_day"),
            (col("base_cents") + col("v") * 10000).as("rate_cents"))
        val fact = Tables.t(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            expr("unix_timestamp(l_shipdate) div 86400").as("fact_day"))
        graft.plans.AsOf.join(fact, dim, fact("l_suppkey"), dim("s_suppkey"),
          fact("fact_day"), dim("ver_day"), dim("ver_day"))
          .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
            col("fact_day"), col("ver_day"), col("rate_cents"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      oracle = Some("""
        WITH dim AS (
          SELECT s_suppkey, CAST(v*600 AS BIGINT) AS ver_day,
                 CAST(CAST(s_acctbal AS DECIMAL(12,2))*100 AS BIGINT) + v*10000 AS rate_cents
          FROM supplier, (SELECT * FROM (VALUES (0),(1),(2),(3)) t(v)) vs),
        f AS (SELECT l_orderkey, l_linenumber, l_suppkey,
                     CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400 AS fact_day
              FROM lineitem)
        SELECT f.l_orderkey, f.l_linenumber, f.l_suppkey, f.fact_day,
               d.ver_day, d.rate_cents
        FROM f
        JOIN LATERAL (SELECT ver_day, rate_cents FROM dim
                      WHERE dim.s_suppkey = f.l_suppkey
                        AND dim.ver_day <= f.fact_day
                      ORDER BY ver_day DESC LIMIT 1) d ON TRUE
        ORDER BY l_orderkey, l_linenumber""")),

    // ----- q30_nation_flows: nation-pair trade volume (TPC-H Q7 shape) ---
    // Revenue flowing supplier-nation → customer-nation per ship year,
    // cross-border only. Two broadcast nation lookups on either side of
    // the fact chain; revenue in exact DECIMAL.
    "q30_nation_flows" -> Q(
      build = (s, d) =>
        sup(s, d)
          .join(broadcast(nat(s, d)).select(col("n_nationkey").as("sk"),
            col("n_name").as("supp_nation")), col("s_nationkey") === col("sk"))
          .join(li(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(cust(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(nat(s, d)).select(col("n_nationkey").as("ck"),
            col("n_name").as("cust_nation")), col("c_nationkey") === col("ck"))
          .filter(col("supp_nation") =!= col("cust_nation"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year")),
      oracle = Some("""
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM supplier, nation sn, lineitem, orders, customer, nation cn
        WHERE s_nationkey = sn.n_nationkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = cn.n_nationkey AND sn.n_name <> cn.n_name
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""")),

    // ----- q31_market_share: one nation's share per year (Q8 shape) ------
    // NATION_3's share of supplier revenue into ASIA customers, per order
    // year. The conditional numerator stays in exact DECIMAL (the CASE
    // zeroes extendedprice BEFORE the cast), one double division at the
    // end.
    "q31_market_share" -> Q(
      build = (s, d) =>
        reg(s, d).filter(col("r_name") === "ASIA")
          .join(broadcast(nat(s, d)).select(col("n_regionkey").as("crk"),
            col("n_nationkey").as("ck")), col("r_regionkey") === col("crk"))
          .join(cust(s, d), col("ck") === col("c_nationkey"))
          .join(ord(s, d), col("c_custkey") === col("o_custkey"))
          .join(li(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(sup(s, d), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat(s, d)).select(col("n_nationkey").as("sk"),
            col("n_name").as("supp_nation")), col("s_nationkey") === col("sk"))
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(
            sum(decP(when(col("supp_nation") === "NATION_3",
              col("l_extendedprice")).otherwise(lit(0.0)))
              * decR(lit(1.0) - col("l_discount"))).cast(DoubleType).as("nation_rev"),
            sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
              .cast(DoubleType).as("total_rev"))
          .select(col("o_year"), col("nation_rev"), col("total_rev"),
            (col("nation_rev") / col("total_rev")).as("mkt_share"))
          .orderBy(col("o_year")),
      oracle = Some("""
        WITH agg AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(SUM(CAST(CASE WHEN sn.n_name = 'NATION_3'
                          THEN l_extendedprice ELSE 0 END AS DECIMAL(12,2))
                   * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS nation_rev,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_rev
          FROM region, nation cn, customer, orders, lineitem, supplier, nation sn
          WHERE r_name = 'ASIA' AND r_regionkey = cn.n_regionkey
            AND cn.n_nationkey = c_nationkey AND c_custkey = o_custkey
            AND o_orderkey = l_orderkey AND l_suppkey = s_suppkey
            AND s_nationkey = sn.n_nationkey
          GROUP BY 1)
        SELECT o_year, nation_rev, total_rev, nation_rev/total_rev AS mkt_share
        FROM agg ORDER BY o_year""")),

    // ----- q32_product_profit: profit by nation and year (Q9 shape) ------
    // Revenue minus a retail-price-proportional cost term for a part
    // subset, rolled up by supplier nation and ship year. Both sums stay
    // exact DECIMAL; the cost scale-down and subtraction happen once in
    // doubles.
    "q32_product_profit" -> Q(
      build = (s, d) =>
        pt(s, d).filter(col("p_size") % 5 === 0)
          .join(li(s, d), col("p_partkey") === col("l_partkey"))
          .join(broadcast(sup(s, d)), col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg((sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType)
            - sum(decP(col("p_retailprice")) * decP(col("l_quantity")))
              .cast(DoubleType) / lit(100.0)).as("profit"))
          .orderBy(col("nation"), col("l_year")),
      oracle = Some("""
        SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE)
               - CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))
                 * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)/100.0 AS profit
        FROM part, lineitem, supplier, nation
        WHERE p_size % 5 = 0 AND p_partkey = l_partkey
          AND l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- q33_important_parts: Q11 shape — agg + global-fraction filter -
    // Per-part value vs a scalar-subquery global total (no partsupp table
    // in this dataset, so value = lineitem revenue per part — the plan
    // shape is what Q11 exercises: one map-side-combinable agg, one
    // broadcast scalar, a filter over the agg output). Both the per-part
    // and global sums are the SAME exact decimal total, so the 0.05 %
    // threshold compare is on identical doubles in both engines.
    "q33_important_parts" -> Q(
      build = (s, d) => {
        val value = li(s, d).groupBy(col("l_partkey"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("value"))
        val total = li(s, d)
          .agg((sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType) * lit(0.0005)).as("cutoff"))
        value.crossJoin(broadcast(total))
          .filter(col("value") > col("cutoff"))
          .select(col("l_partkey"), col("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      oracle = Some("""
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS value
        FROM lineitem GROUP BY 1
        HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) > (
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE)*0.0005e0
          FROM lineitem)
        ORDER BY value DESC, l_partkey""")),

    // ----- q34_top_supplier: Q15 shape — revenue view + max join ---------
    // Quarterly supplier revenue, then the supplier(s) achieving the
    // maximum — the classic "create view + join on max" plan: one agg,
    // one broadcast max scalar, equality filter on identical
    // decimal-derived doubles.
    "q34_top_supplier" -> Q(
      build = (s, d) => {
        val rev = li(s, d)
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .groupBy(col("l_suppkey"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("total_revenue"))
        val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
        rev.crossJoin(broadcast(mx))
          .filter(col("total_revenue") === col("max_revenue"))
          .join(broadcast(sup(s, d)), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT l_suppkey,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1)
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        ORDER BY s_suppkey""")),

    // ----- q35_disjunctive: Q19 shape — OR-of-ANDs pushdown --------------
    // Three disjunctive (brand, size-range, quantity-range) branches in
    // one scan — the plan Q19 exercises: Catalyst folds the OR into one
    // partial filter pushed to both scans and a broadcast hash join, not
    // three unions.
    "q35_disjunctive" -> Q(
      build = (s, d) =>
        li(s, d).join(broadcast(pt(s, d)), col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 15)
              && col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)
              && col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#34" && col("p_size").between(1, 35)
              && col("l_quantity").between(20, 30)))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"),
            count(lit(1)).as("n_items")),
      oracle = Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
                 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
                 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
                 AND l_quantity BETWEEN 20 AND 30)""")),

    // ----- q36_waiting_suppliers: Q21 shape — exists + anti self-joins ---
    // Suppliers whose lineitem was "late" (shipped > 90 days after the
    // order date) in multi-supplier orders where NO other supplier was
    // late. Two self-joins on the order key: a semi (another supplier
    // exists) and an anti (no other late supplier) — the Q21 plan. Late
    // is a pure date-diff predicate; counts are exact.
    "q36_waiting_suppliers" -> Q(
      build = (s, d) => {
        val l = li(s, d)
          .join(ord(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .withColumn("late",
            datediff(col("l_shipdate"), col("o_orderdate")) > 90)
        val l1 = l.filter(col("late"))
          .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"))
        val others = l.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
          .distinct()
        val lateOthers = l.filter(col("late"))
          .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
          .distinct()
        l1
          .join(others, col("k1") === col("k2") && col("sk1") =!= col("sk2"),
            "left_semi")
          .join(lateOthers, col("k1") === col("k3") && col("sk1") =!= col("sk3"),
            "left_anti")
          .join(broadcast(sup(s, d)), col("sk1") === col("s_suppkey"))
          .groupBy(col("s_suppkey"), col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_suppkey"))
      },
      oracle = Some("""
        WITH l AS (
          SELECT l_orderkey, l_suppkey,
                 date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) > 90 AS late
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderstatus = 'F')
        SELECT s_suppkey, s_name, COUNT(*) AS numwait
        FROM l l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE l1.late
          AND EXISTS (SELECT 1 FROM l l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM l l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY 1, 2 ORDER BY numwait DESC, s_suppkey""")),

    // ----- q37_returned_items: TPC-H Q10 shape — returned-item revenue ---
    // Fact-side filters (date window, returnflag) reach the scans; nation
    // broadcasts; one fact-keyed aggregate; top-20 by exact decimal sum.
    "q37_returned_items" -> Q(
      build = (s, d) =>
        cust(s, d)
          .join(ord(s, d).filter(
            col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
              && col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
            col("c_custkey") === col("o_custkey"))
          .join(li(s, d).filter(col("l_returnflag") === "R"),
            col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(sum(decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount")))
            .cast(DoubleType).as("revenue"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20),
      oracle = Some("""
        SELECT c_custkey, c_name, c_acctbal, n_name,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
        FROM customer, orders, lineitem, nation
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
          AND l_returnflag = 'R' AND c_nationkey = n_nationkey
        GROUP BY 1, 2, 3, 4
        ORDER BY revenue DESC, c_custkey LIMIT 20"""),
      bench = true),

    // ----- q38_late_priority: TPC-H Q12 shape (shipmode → priority) ------
    // The generated schema has no l_shipmode/l_receiptdate; the Q12 plan
    // shape (fact join + conditional counts) is kept with lateness =
    // shipdate > orderdate + 90d and the priority split as the CASE pair.
    "q38_late_priority" -> Q(
      build = (s, d) =>
        li(s, d)
          .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
          .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
          .groupBy(col("l_linestatus"))
          .agg(
            count(when(col("o_orderpriority") === "1-URGENT"
              || col("o_orderpriority") === "2-HIGH", 1)).as("high_line_count"),
            count(when(col("o_orderpriority") =!= "1-URGENT"
              && col("o_orderpriority") =!= "2-HIGH", 1)).as("low_line_count"))
          .orderBy(col("l_linestatus")),
      oracle = Some("""
        SELECT l_linestatus,
               COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 END) AS high_line_count,
               COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 END) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE date_diff('day', CAST(o_orderdate AS DATE),
                        CAST(l_shipdate AS DATE)) > 90
        GROUP BY 1 ORDER BY l_linestatus""")),

    // ----- q39_customer_distribution: TPC-H Q13 shape --------------------
    // LEFT join so zero-order customers survive with c_count = 0; two
    // aggregates (per-customer, then histogram). COUNT(o_orderkey) skips
    // the null-extended rows on both engines.
    "q39_customer_distribution" -> Q(
      build = (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc),
      oracle = Some("""
        SELECT c_count, COUNT(*) AS custdist
        FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
              FROM customer LEFT JOIN orders ON c_custkey = o_custkey
              GROUP BY c_custkey) cc
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC""")),

    // ----- q40_promo_revenue: TPC-H Q14 shape — promo revenue share ------
    // Single-row global aggregate; both sums are exact decimals cast to
    // DOUBLE, so the final IEEE division is bit-identical on both engines.
    "q40_promo_revenue" -> Q(
      build = (s, d) => {
        def rev = decP(col("l_extendedprice")) * decR(lit(1.0) - col("l_discount"))
        li(s, d)
          .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp")
            && col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
          .join(broadcast(pt(s, d)), col("l_partkey") === col("p_partkey"))
          .agg(
            (lit(100.0) * sum(when(col("p_type") === "PROMO", rev)).cast(DoubleType)
              / sum(rev).cast(DoubleType)).as("promo_pct"),
            sum(rev).cast(DoubleType).as("total_revenue"))
      },
      oracle = Some("""
        SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0-l_discount AS DECIMAL(4,2)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS promo_pct,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(1.0-l_discount AS DECIMAL(4,2))) AS DOUBLE) AS total_revenue
        FROM lineitem, part
        WHERE l_partkey = p_partkey
          AND l_shipdate >= TIMESTAMP '1996-03-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'""")),

    // ----- q41_small_qty_rev: TPC-H Q17 shape — small-quantity revenue ---
    // Correlated avg re-expressed as a broadcast self-aggregate join; the
    // qty < 0.2·avg predicate is cross-multiplied (qty·5·cnt < sumq) so the
    // comparison is exact decimal·integer arithmetic, no division.
    "q41_small_qty_rev" -> Q(
      build = (s, d) => {
        val bparts = pt(s, d).filter(col("p_brand") === "Brand#23")
          .select(col("p_partkey"))
        val lb = li(s, d)
          .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
        val partAgg = lb.groupBy(col("l_partkey"))
          .agg(sum(decP(col("l_quantity"))).as("sumq"), count(lit(1)).as("cnt"))
        lb.join(broadcast(partAgg), Seq("l_partkey"))
          .filter(decP(col("l_quantity")) * lit(5) * col("cnt") < col("sumq"))
          .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
      },
      oracle = Some(s"""
        WITH lb AS (
          SELECT l_partkey, l_quantity, l_extendedprice
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_brand = 'Brand#23'),
        pa AS (
          SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sumq,
                 COUNT(*) AS cnt
          FROM lb GROUP BY l_partkey)
        SELECT ${DSUM("l_extendedprice")} / 7.0 AS avg_yearly
        FROM lb JOIN pa USING (l_partkey)
        WHERE CAST(l_quantity AS DECIMAL(12,2)) * 5 * cnt < sumq""")),

    // ----- q42_big_orders: TPC-H Q18 shape — large-volume orders ---------
    // The HAVING subquery is a pre-aggregated join (map-side partials on
    // l_orderkey), not a window — the canonical large-order scan at scale.
    "q42_big_orders" -> Q(
      build = (s, d) =>
        cust(s, d)
          .join(ord(s, d), col("c_custkey") === col("o_custkey"))
          .join(li(s, d).groupBy(col("l_orderkey"))
              .agg(sum(decP(col("l_quantity"))).as("ord_qty"))
              .filter(col("ord_qty") > 250),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
            col("o_orderdate"), col("o_totalprice"),
            col("ord_qty").cast(DoubleType).as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
          .limit(100),
      oracle = Some("""
        WITH bk AS (
          SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS ord_qty
          FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250)
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(ord_qty AS DOUBLE) AS sum_qty
        FROM customer JOIN orders ON c_custkey = o_custkey
        JOIN bk ON o_orderkey = l_orderkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""),
      bench = true),

    // ----- q43_part_supply: TPC-H Q20 shape (lineitem as supply relation) -
    // No partsupp table in the generated schema; "suppliers with excess
    // availqty" becomes "suppliers who shipped > 60 units of one STANDARD
    // part since 1997" — same semi-join-on-aggregate plan shape.
    "q43_part_supply" -> Q(
      build = (s, d) => {
        val fparts = pt(s, d).filter(col("p_type") === "STANDARD")
          .select(col("p_partkey"))
        val bigSupp = li(s, d)
          .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
          .join(broadcast(fparts), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(decP(col("l_quantity"))).as("shipped"))
          .filter(col("shipped") > 60)
          .select(col("l_suppkey"))
        sup(s, d)
          .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
          .orderBy(col("s_suppkey"))
      },
      oracle = Some("""
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_type = 'STANDARD' AND l_shipdate >= TIMESTAMP '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 60)
        ORDER BY s_suppkey""")),

    // ----- q44_supplier_kinds: TPC-H Q16 shape — supplier variety --------
    // countDistinct over a broadcast-filtered dim join; the distinct is
    // the only extra exchange (partial-aggregate on (brand,type,size,supp)
    // first, so the shuffle carries pre-deduped pairs).
    "q44_supplier_kinds" -> Q(
      build = (s, d) =>
        li(s, d)
          .join(broadcast(pt(s, d)
            .filter(col("p_brand") =!= "Brand#1"
              && col("p_size").isin(1, 9, 14, 19, 23, 29, 36, 49))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
            col("p_size")),
      oracle = Some("""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1' AND p_size IN (1,9,14,19,23,29,36,49)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""))
  ,

    // ----- q45_window_suite: full ranked-window function battery ---------
    // The remaining ANSI window functions in one per-customer pass:
    // ntile / percent_rank / cume_dist / lag / lead / first_value — the
    // order-history "customer journey" projection every BI layer emits.
    // One shuffle keyed on the entity; partitions are per-customer order
    // counts (bounded), so no global window anywhere. percent_rank and
    // cume_dist are exact integer ratios — IEEE division is bit-identical
    // cross-engine, no rounding needed.
    "q45_window_suite" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate"), col("o_orderkey"))
        ord(s, d)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            col("o_totalprice"))
          .withColumn("rn", row_number().over(w))
          .withColumn("quartile", ntile(4).over(w))
          .withColumn("pct_rank", percent_rank().over(w))
          .withColumn("cume", cume_dist().over(w))
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
          .withColumn("first_price", first(col("o_totalprice")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .drop("o_orderdate")
          .orderBy(col("o_custkey"), col("rn"))
      },
      oracle = Some("""
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER w AS rn,
               NTILE(4) OVER w AS quartile,
               PERCENT_RANK() OVER w AS pct_rank,
               CUME_DIST() OVER w AS cume,
               LAG(o_totalprice, 1) OVER w AS prev_price,
               LEAD(o_totalprice, 1) OVER w AS next_price,
               FIRST_VALUE(o_totalprice) OVER
                 (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS first_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, rn""")),

    // ----- q46_cube: full CUBE with grouping_id --------------------------
    // Completes the grouping-operator family (q12 ROLLUP, q13 GROUPING
    // SETS): all 4 aggregation levels of (status, priority) in one pass,
    // with GROUPING() flags distinguishing data NULLs from subtotal rows
    // — the OLAP cube every BI cache materializes. One combinable shuffle
    // (Spark expands the grouping sets map-side).
    "q46_cube" -> Q(
      build = (s, d) =>
        ord(s, d)
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice")).as("total_price"),
            grouping_id(col("o_orderstatus"), col("o_orderpriority"))
              .cast(LongType).as("gid"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("gid"), col("n_orders"), col("total_price"))
          .orderBy(col("gid"), col("status"), col("priority")),
      oracle = Some(s"""
        SELECT COALESCE(o_orderstatus, 'ALL') AS status,
               COALESCE(o_orderpriority, 'ALL') AS priority,
               CAST(GROUPING(o_orderstatus) * 2
                    + GROUPING(o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n_orders,
               ${DSUM("o_totalprice")} AS total_price
        FROM orders
        GROUP BY CUBE(o_orderstatus, o_orderpriority)
        ORDER BY gid, status, priority""")),

    // ----- q47_weighted_median: exact quantity-weighted median price -----
    // The weighted-median staple (q26's unweighted median can't answer
    // "the price at which half the VOLUME trades"): per (returnflag,
    // linestatus), the smallest price whose cumulative quantity reaches
    // half the group's total. Everything in integer cents — the
    // cumulative window and the crossing test are exact, and the
    // qualifying-row argmin folds map-side. The per-group cumsum window
    // is keyed on the group (4 groups here; at scale the same two-level
    // bucketed prefix sum as ts_concurrency applies).
    "q47_weighted_median" -> Q(
      build = (s, d) => {
        val w = Window.partitionBy(col("l_returnflag"), col("l_linestatus"))
          .orderBy(col("pc"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val base = li(s, d).select(col("l_returnflag"), col("l_linestatus"),
          col("l_orderkey"), col("l_linenumber"),
          expr("CAST(round(l_extendedprice * 100.0) AS BIGINT)").as("pc"),
          expr("CAST(round(l_quantity * 100.0) AS BIGINT)").as("qc"))
        base
          .withColumn("cum", sum(col("qc")).over(w))
          .withColumn("tot", sum(col("qc")).over(
            Window.partitionBy(col("l_returnflag"), col("l_linestatus"))))
          .filter(col("cum") * 2 >= col("tot"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg((min(col("pc")) / 100.0).as("weighted_median_price"),
            (max(col("tot")) / 100.0).as("total_qty"))
          .orderBy(col("l_returnflag"), col("l_linestatus"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
                 CAST(round(l_extendedprice * 100.0) AS BIGINT) AS pc,
                 CAST(round(l_quantity * 100.0) AS BIGINT) AS qc
          FROM lineitem),
        cums AS (
          SELECT *,
                 SUM(qc) OVER (PARTITION BY l_returnflag, l_linestatus
                   ORDER BY pc, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                 SUM(qc) OVER (PARTITION BY l_returnflag, l_linestatus)
                   AS tot
          FROM base)
        SELECT l_returnflag, l_linestatus,
               MIN(pc) / 100.0 AS weighted_median_price,
               MAX(tot) / 100.0 AS total_qty
        FROM cums WHERE cum * 2 >= tot
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // ----- q48_basket_lift: market-basket association mining -------------
    // Association-rule lift over order baskets: which part brands co-occur
    // in one order more often than independence predicts. The pair join is
    // keyed on the ORDER and each basket holds at most 25 distinct brands
    // (a 7-line order ceiling in the data, 25-brand domain), so the
    // self-join is O(orders * basket^2) — linear in the fact table, never
    // all-pairs across it. Lift is the log-free exact ratio
    // c_ab*N/(c_a*c_b) (BIGINTs into one IEEE division — hash-stable, no
    // libm). Top-30 via TakeOrdered, not a global sort.
    "q48_basket_lift" -> Q(
      build = (s, d) => {
        val baskets = Tables.t(s, d, "lineitem")
          .join(Tables.t(s, d, "part"),
            col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
          .distinct()
        val nOrd = baskets.select(col("okey")).distinct()
          .agg(count(lit(1)).as("n_orders"))
        val single = baskets.groupBy(col("brand"))
          .agg(count(lit(1)).as("c"))
        val pairs = baskets.as("a")
          .join(baskets.as("b"), Seq("okey"))
          .filter(col("a.brand") < col("b.brand"))
          .groupBy(col("a.brand").as("brand_a"), col("b.brand").as("brand_b"))
          .agg(count(lit(1)).as("c_ab"))
          .filter(col("c_ab") >= 3)
        pairs
          .join(broadcast(single.withColumnRenamed("brand", "brand_a")
            .withColumnRenamed("c", "c_a")), "brand_a")
          .join(broadcast(single.withColumnRenamed("brand", "brand_b")
            .withColumnRenamed("c", "c_b")), "brand_b")
          .crossJoin(broadcast(nOrd))
          .withColumn("lift",
            (col("c_ab") * col("n_orders")).cast(DoubleType)
              / (col("c_a") * col("c_b")))
          .select(col("brand_a"), col("brand_b"), col("c_ab"), col("c_a"),
            col("c_b"), col("lift"))
          .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
          .limit(30)
      },
      oracle = Some("""
        WITH baskets AS (
          SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets),
        single AS (SELECT brand, COUNT(*) AS c FROM baskets GROUP BY 1),
        pairs AS (
          SELECT a.brand AS brand_a, b.brand AS brand_b, COUNT(*) AS c_ab
          FROM baskets a JOIN baskets b
            ON a.okey = b.okey AND a.brand < b.brand
          GROUP BY 1, 2 HAVING COUNT(*) >= 3)
        SELECT p.brand_a, p.brand_b, p.c_ab, sa.c AS c_a, sb.c AS c_b,
               CAST(p.c_ab * n.n_orders AS DOUBLE) / (sa.c * sb.c) AS lift
        FROM pairs p JOIN single sa ON p.brand_a = sa.brand
                     JOIN single sb ON p.brand_b = sb.brand, n
        ORDER BY lift DESC, p.brand_a, p.brand_b LIMIT 30""")),

    // ----- q50_incremental_agg: materialized-view maintenance ------------
    // The incremental-refresh pattern a 100 TB pipeline lives by: the
    // standing aggregate over the base period is NOT rescanned when a new
    // day arrives — the delta partition aggregates alone and merges with
    // the stored partials (counts add, sums add: the algebraic-merge
    // property this query demonstrates end-to-end). Both legs aggregate
    // BEFORE the full-outer merge join, so the merge moves one row per
    // group, not per fact. DECIMAL sums keep the money math exact.
    "q50_incremental_agg" -> Q(
      build = (s, d) => {
        val o = Tables.t(s, d, "orders")
        val base = o.filter(col("o_orderdate") < "1998-01-01")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt_base"),
            sum(decP(col("o_totalprice"))).as("rev_base"))
        val delta = o.filter(col("o_orderdate") >= "1998-01-01"
            && col("o_orderdate") < "1998-03-01")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("cnt_delta"),
            sum(decP(col("o_totalprice"))).as("rev_delta"))
        base.join(delta, Seq("o_orderpriority"), "full_outer")
          .select(col("o_orderpriority"),
            coalesce(col("cnt_base"), lit(0L)).as("cnt_base"),
            coalesce(col("cnt_delta"), lit(0L)).as("cnt_delta"),
            (coalesce(col("cnt_base"), lit(0L))
              + coalesce(col("cnt_delta"), lit(0L))).as("cnt_total"),
            (coalesce(col("rev_base"), lit(0).cast(DecimalType(22, 2)))
              + coalesce(col("rev_delta"), lit(0).cast(DecimalType(22, 2))))
              .cast(DoubleType).as("rev_total"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT o_orderpriority, COUNT(*) AS cnt_base,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_base
          FROM orders WHERE o_orderdate < DATE '1998-01-01' GROUP BY 1),
        delta AS (
          SELECT o_orderpriority, COUNT(*) AS cnt_delta,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev_delta
          FROM orders
          WHERE o_orderdate >= DATE '1998-01-01'
            AND o_orderdate < DATE '1998-03-01' GROUP BY 1)
        SELECT COALESCE(b.o_orderpriority, d.o_orderpriority)
                 AS o_orderpriority,
               COALESCE(b.cnt_base, 0) AS cnt_base,
               COALESCE(d.cnt_delta, 0) AS cnt_delta,
               COALESCE(b.cnt_base, 0) + COALESCE(d.cnt_delta, 0)
                 AS cnt_total,
               CAST(COALESCE(b.rev_base, 0) + COALESCE(d.rev_delta, 0)
                 AS DOUBLE) AS rev_total
        FROM base b FULL OUTER JOIN delta d
          ON b.o_orderpriority = d.o_orderpriority
        ORDER BY o_orderpriority""")),

    // ----- q51_kmv_distinct: mergeable distinct-count sketch -------------
    // The k-minimum-values sketch (Bar-Yossef et al.) with an EXACT
    // cross-engine oracle: hashes are the first 12 md5 hex chars (a
    // 48-bit space both engines compute identically), the k smallest ride
    // a fixed-width-hex string ranking (lexicographic == numeric), and
    // only the k-th value is decoded to an integer — so the whole sketch
    // is hash-reproducible, unlike engine-native HLLs. The MERGE property
    // q50_incremental_agg needs for distincts is demonstrated in-query:
    // min-k(base ∪ delta) ⊆ min-k(base) ∪ min-k(delta), so the estimate
    // from merged per-period sketches EQUALS the full-scan estimate (the
    // spec asserts equality). Per-group state is k=64 12-byte values —
    // what a 100 TB incremental distinct pipeline actually stores.
    "q51_kmv_distinct" -> Q(
      build = (s, d) => {
        val k = 64
        val o = Tables.t(s, d, "orders")
          .select(col("o_orderpriority").as("grp"),
            substring(md5(col("o_custkey").cast(StringType)
              .cast(BinaryType)), 1, 12).as("h"),
            (col("o_orderdate") < "1998-01-01").as("is_base"))
        def minK(df: DataFrame, parts: Seq[String]): DataFrame = {
          val w = Window.partitionBy(parts.map(col): _*).orderBy(col("h"))
          df.distinct()
            .withColumn("rn", row_number().over(w))
            .filter(col("rn") <= k)
        }
        // merged sketch: union the per-period min-k sets, take min-k again
        val perPeriod = minK(o.select(col("grp"), col("h"), col("is_base")),
          Seq("grp", "is_base"))
        val merged = minK(perPeriod.select(col("grp"), col("h")), Seq("grp"))
        val full = minK(o.select(col("grp"), col("h")), Seq("grp"))
        def hex12(c: String) = (1 to 12).map { i =>
          val a = s"ascii(substr($c, $i, 1))"
          val mul = Seq.fill(12 - i)(16L).product
          s"CAST(($a - CASE WHEN $a >= 97 THEN 87 ELSE 48 END) AS BIGINT) * ${mul}L"
        }.mkString(" + ")
        def est(df: DataFrame) = df.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
          .withColumn("kth_int", expr(hex12("kth")))
          .withColumn("estimate", when(col("n_kept") < k,
            col("n_kept").cast(DoubleType))
            .otherwise(expr(s"CAST(${k - 1}L * 281474976710656L AS DOUBLE) / kth_int")))
        val exact = Tables.t(s, d, "orders")
          .groupBy(col("o_orderpriority").as("grp"))
          .agg(countDistinct(col("o_custkey")).as("exact_distinct"))
        est(full).select(col("grp"), col("n_kept"),
          col("estimate").as("est_full"))
          .join(est(merged).select(col("grp"),
            col("estimate").as("est_merged")), "grp")
          .join(exact, "grp")
          .select(col("grp"), col("n_kept"), col("exact_distinct"),
            col("est_full"), col("est_merged"),
            (col("est_full") === col("est_merged")).as("merge_lossless"))
          .orderBy(col("grp"))
      },
      oracle = Some {
        val k = 64
        val hex12 = (1 to 12).map { i =>
          val a = s"ascii(substr(h, $i, 1))"
          val mul = Seq.fill(12 - i)(16L).product
          s"CAST(($a - CASE WHEN $a >= 97 THEN 87 ELSE 48 END) AS BIGINT) * $mul"
        }.mkString(" + ")
        s"""
        WITH o AS (
          SELECT o_orderpriority AS grp,
                 substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12) AS h,
                 o_orderdate < DATE '1998-01-01' AS is_base
          FROM orders),
        pp AS (
          SELECT grp, h, is_base FROM (
            SELECT DISTINCT grp, h, is_base FROM o)
          QUALIFY ROW_NUMBER() OVER (PARTITION BY grp, is_base
                    ORDER BY h) <= $k),
        merged AS (
          SELECT grp, h FROM (SELECT DISTINCT grp, h FROM pp)
          QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) <= $k),
        full_ AS (
          SELECT grp, h FROM (SELECT DISTINCT grp, h FROM o)
          QUALIFY ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) <= $k),
        estf AS (
          SELECT grp, COUNT(*) AS n_kept, MAX(h) AS h1 FROM full_ GROUP BY 1),
        estm AS (
          SELECT grp, COUNT(*) AS n_kept, MAX(h) AS h1 FROM merged GROUP BY 1),
        exact AS (
          SELECT o_orderpriority AS grp,
                 COUNT(DISTINCT o_custkey) AS exact_distinct
          FROM orders GROUP BY 1),
        ef AS (
          SELECT grp, n_kept,
                 CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
                      ELSE CAST(${k - 1} * 281474976710656 AS DOUBLE)
                           / (${hex12.replace("substr(h,", "substr(h1,")})
                 END AS est_full
          FROM estf),
        em AS (
          SELECT grp,
                 CASE WHEN n_kept < $k THEN CAST(n_kept AS DOUBLE)
                      ELSE CAST(${k - 1} * 281474976710656 AS DOUBLE)
                           / (${hex12.replace("substr(h,", "substr(h1,")})
                 END AS est_merged
          FROM estm)
        SELECT ef.grp, ef.n_kept, x.exact_distinct, ef.est_full,
               em.est_merged, ef.est_full = em.est_merged AS merge_lossless
        FROM ef JOIN em ON ef.grp = em.grp JOIN exact x ON x.grp = ef.grp
        ORDER BY ef.grp"""
      }),

    // ----- q52_yoy_growth: year-over-year monthly growth -----------------
    // The reporting staple: monthly revenue joined to the same month one
    // year earlier (a LAG 12 over the month frame — after aggregation,
    // so the window moves over ~80 rows, never facts). DECIMAL-exact
    // monthly sums; growth is one division on the exact cents.
    "q52_yoy_growth" -> Q(
      build = (s, d) => {
        val monthly = Tables.t(s, d, "orders")
          .groupBy(expr("year(o_orderdate)").as("yr"),
            expr("month(o_orderdate)").as("mo"))
          .agg(sum(decP(col("o_totalprice"))).as("rev"),
            count(lit(1)).as("n_orders"))
        val w = Window.partitionBy(col("mo")).orderBy(col("yr"))
        monthly
          .withColumn("rev_prev", lag(col("rev"), 1).over(w))
          .withColumn("yr_prev", lag(col("yr"), 1).over(w))
          .filter(col("rev_prev").isNotNull && col("yr_prev") === col("yr") - 1)
          .select(col("yr"), col("mo"), col("n_orders"),
            col("rev").cast(DoubleType).as("rev"),
            col("rev_prev").cast(DoubleType).as("rev_prev"),
            ((col("rev") - col("rev_prev")).cast(DoubleType)
              / col("rev_prev").cast(DoubleType)).as("yoy_growth"))
          .orderBy(col("yr"), col("mo"))
      },
      oracle = Some("""
        WITH monthly AS (
          SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                 SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev,
                 COUNT(*) AS n_orders
          FROM orders GROUP BY 1, 2),
        lagged AS (
          SELECT yr, mo, n_orders, rev,
                 LAG(rev, 1) OVER (PARTITION BY mo ORDER BY yr) AS rev_prev,
                 LAG(yr, 1) OVER (PARTITION BY mo ORDER BY yr) AS yr_prev
          FROM monthly)
        SELECT yr, mo, n_orders,
               CAST(rev AS DOUBLE) AS rev,
               CAST(rev_prev AS DOUBLE) AS rev_prev,
               CAST(rev - rev_prev AS DOUBLE) / CAST(rev_prev AS DOUBLE)
                 AS yoy_growth
        FROM lagged
        WHERE rev_prev IS NOT NULL AND yr_prev = yr - 1
        ORDER BY yr, mo""")),

    // ----- q53_abc_analysis: Pareto inventory classification -------------
    // ABC analysis (the 80/15/5 Pareto cut every inventory/catalog team
    // runs): parts ranked by revenue, classified A while the cumulative
    // share is within 80%, B within 95%, else C. Revenue aggregates to
    // integer cents BEFORE any ordering, and the cumulative sum is the
    // shared Det.rankPrefix distributed prefix-sum — so there is
    // NO single-partition window over the part dimension (20M parts at
    // SF100 would serialize one). Class thresholds compare exact integer
    // cumulative cents against the exact total — no floating boundary.
    "q53_abc_analysis" -> Q(
      build = (s, d) => {
        val perPart = Tables.t(s, d, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum(expr(
            "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)"))
            .as("rev_c"))
        // rank by revenue DESC: rev_c > 0, so ordering on its negation
        // ascending is the same total order
        val classed = graft.Det.rankPrefix(perPart, Seq.empty,
            Seq((-col("rev_c")).as("neg"), col("l_partkey")),
            Some(col("rev_c")))
          .withColumn("cum_c", col("prefix") + col("rev_c"))
          .withColumn("tot_c", col("gtot"))
          .withColumn("cls",
            when(col("cum_c") * 100 <= col("tot_c") * 80, "A")
              .when(col("cum_c") * 100 <= col("tot_c") * 95, "B")
              .otherwise(lit("C")))
        classed.groupBy(col("cls"))
          .agg(count(lit(1)).as("n_parts"),
            (sum(col("rev_c")).cast(DoubleType) / 100.0).as("revenue"),
            (min(col("rev_c")).cast(DoubleType) / 100.0).as("min_part_rev"))
          .orderBy(col("cls"))
      },
      oracle = Some("""
        WITH per_part AS (
          SELECT l_partkey,
                 CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
                   AS BIGINT)) AS BIGINT) AS rev_c
          FROM lineitem GROUP BY 1),
        classed AS (
          SELECT l_partkey, rev_c,
                 SUM(rev_c) OVER (ORDER BY rev_c DESC, l_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum_c,
                 SUM(rev_c) OVER () AS tot_c
          FROM per_part),
        labeled AS (
          SELECT *,
                 CASE WHEN cum_c * 100 <= tot_c * 80 THEN 'A'
                      WHEN cum_c * 100 <= tot_c * 95 THEN 'B'
                      ELSE 'C' END AS cls
          FROM classed)
        SELECT cls, COUNT(*) AS n_parts,
               CAST(SUM(rev_c) AS DOUBLE) / 100.0 AS revenue,
               CAST(MIN(rev_c) AS DOUBLE) / 100.0 AS min_part_rev
        FROM labeled GROUP BY 1 ORDER BY cls""")),

    // ----- q54_cohort_ltv: customer-cohort lifetime value matrix ---------
    // The finance/BI staple next to ts_retention's activity matrix:
    // customers cohorted by FIRST order month, revenue accumulated by
    // months-since-cohort — the table LTV curves and payback windows are
    // read from. Month index = year*12 + month (pure integer, naive
    // timestamps both engines); money in exact integer cents; the
    // cumulative LTV is a window over the already-aggregated cohort x
    // age cells (hundreds of rows, never the fact table). Shape: one
    // combinable min-groupBy for cohorts, one (cohort, age) rollup, the
    // per-cohort cumsum window on cells.
    "q54_cohort_ltv" -> Q(
      build = (s, d) => {
        val o = ord(s, d).select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
            .as("m"),
          expr("CAST(floor(o_totalprice * 100.0 + 0.5e0) AS BIGINT)")
            .as("rev_c"))
        val cohorts = o.groupBy(col("o_custkey"))
          .agg(min(col("m")).as("cohort_m"))
        val cells = o.join(cohorts, Seq("o_custkey"))
          .withColumn("age", col("m") - col("cohort_m"))
          .groupBy(col("cohort_m"), col("age"))
          .agg(countDistinct(col("o_custkey")).as("n_customers"),
            count(lit(1)).as("n_orders"), sum(col("rev_c")).as("rev_cc"))
        val sizes = cohorts.groupBy(col("cohort_m"))
          .agg(count(lit(1)).as("cohort_size"))
        val w = Window.partitionBy(col("cohort_m")).orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        cells.join(sizes, Seq("cohort_m"))
          .withColumn("cum_rev_c", sum(col("rev_cc")).over(w))
          .select(col("cohort_m"), col("age"), col("cohort_size"),
            col("n_customers"), col("n_orders"),
            (col("rev_cc").cast(DoubleType) / 100.0).as("revenue"),
            (col("cum_rev_c").cast(DoubleType) / 100.0
              / col("cohort_size")).as("ltv_per_customer"))
          .orderBy(col("cohort_m"), col("age"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey,
                 year(o_orderdate) * 12 + month(o_orderdate) AS m,
                 CAST(floor(o_totalprice * 100.0 + 0.5e0) AS BIGINT)
                   AS rev_c
          FROM orders),
        cohorts AS (
          SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY 1),
        cells AS (
          SELECT c.cohort_m, o.m - c.cohort_m AS age,
                 CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_customers,
                 COUNT(*) AS n_orders,
                 CAST(SUM(o.rev_c) AS BIGINT) AS rev_cc
          FROM o JOIN cohorts c ON c.o_custkey = o.o_custkey
          GROUP BY 1, 2),
        sizes AS (
          SELECT cohort_m, COUNT(*) AS cohort_size FROM cohorts GROUP BY 1),
        cum AS (
          SELECT ce.*, s.cohort_size,
                 CAST(SUM(ce.rev_cc) OVER (PARTITION BY ce.cohort_m
                   ORDER BY ce.age ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW) AS BIGINT) AS cum_rev_c
          FROM cells ce JOIN sizes s ON s.cohort_m = ce.cohort_m)
        SELECT cohort_m, age, cohort_size, n_customers, n_orders,
               CAST(rev_cc AS DOUBLE) / 100.0 AS revenue,
               CAST(cum_rev_c AS DOUBLE) / 100.0 / cohort_size
                 AS ltv_per_customer
        FROM cum ORDER BY cohort_m, age"""))
  )
}
