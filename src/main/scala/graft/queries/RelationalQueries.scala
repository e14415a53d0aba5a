package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.sources.Tables

/** Core relational operator inventory (SURVEY.md §2.2-2.6), expressed as
  * declarative DataFrame plans so Catalyst gets pushdown/pruning/broadcast
  * for free, each with a DuckDB oracle.
  *
  * Determinism across engines: every floating aggregate is computed in
  * DECIMAL(18,2) (exact, order-independent) and cast to DOUBLE at the end;
  * raw doubles are only ever projected, never summed, so both engines hash
  * identically.
  */
object RelationalQueries extends graft.QueryPack {

  /** Order-independent exact sum of a double column: decimal in, double out. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  override def queries: Seq[Q] = Seq(

    // ---- G1/A: flagship aggregation (TPC-H Q1 shape) --------------------
    Q("q1_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity")).as("sum_qty"),
            dsum(col("l_extendedprice")).as("sum_base_price"),
            sum((col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            ).cast("double").as("sum_disc_price"),
            count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
             |  COUNT(*) AS count_order
             |FROM lineitem
             |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
             |GROUP BY l_returnflag, l_linestatus""".stripMargin)),

    // ---- S1: scan with projection + predicate pushdown ------------------
    Q("q_s1_scan_prune",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_shipdate")),
      Some("""SELECT l_orderkey, l_extendedprice, l_shipdate
             |FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'""".stripMargin)),

    // ---- P1-P4: projection, cast+trim, constant, lowercase --------------
    Q("q_p_projections",
      (s, d) => Tables.customer(s, d).select(
        trim(col("c_custkey").cast("string")).as("cust_id"),
        col("c_name").as("cust_name"),
        lower(col("c_mktsegment")).as("segment_lc"),
        lit("6").as("system_id")),
      Some("""SELECT TRIM(CAST(c_custkey AS VARCHAR)) AS cust_id,
             |  c_name AS cust_name, LOWER(c_mktsegment) AS segment_lc,
             |  '6' AS system_id
             |FROM customer""".stripMargin)),

    // ---- P5: timestamp formatting (reference's creation-date stamp) -----
    Q("q_p5_datefmt",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd'T'00:00:00+00:00").as("creation_ts"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day")),
      Some("""SELECT o_orderkey,
             |  strftime(o_orderdate, '%Y-%m-%dT00:00:00+00:00') AS creation_ts,
             |  strftime(o_orderdate, '%Y-%m-%d') AS order_day
             |FROM orders""".stripMargin)),

    // ---- F1/F2: equality + null/missing predicates ----------------------
    Q("q_f_predicates",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 1000.0)
        .select(
          col("o_orderkey"),
          coalesce(nullif(col("o_orderpriority"), lit("1-URGENT")), lit("OTHER")).as("prio_or_other"),
          col("o_orderpriority").isNotNull.as("has_priority")),
      Some("""SELECT o_orderkey,
             |  COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'OTHER') AS prio_or_other,
             |  o_orderpriority IS NOT NULL AS has_priority
             |FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 1000.0""".stripMargin)),

    // ---- F3: regex validation (reference's -[1-9]D delivery-day check) --
    Q("q_f3_regex",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        col("p_type").rlike("^STANDARD").as("is_standard"),
        concat(lit("-"), (col("p_size") % 12).cast("string"), lit("D")).as("dd"),
        concat(lit("-"), (col("p_size") % 12).cast("string"), lit("D"))
          .rlike("^-[1-9]D$").as("dd_valid")),
      Some("""SELECT p_partkey,
             |  regexp_matches(p_type, '^STANDARD') AS is_standard,
             |  '-' || CAST(p_size % 12 AS VARCHAR) || 'D' AS dd,
             |  regexp_matches('-' || CAST(p_size % 12 AS VARCHAR) || 'D', '^-[1-9]D$') AS dd_valid
             |FROM part""".stripMargin)),

    // ---- J1+J3: the core lookup join — probe side matched to the FIRST
    // build row per key (reference: first customer in document order).
    // row_number dedup before a left join; at scale the dedup is one
    // shuffle on the join key which the join then reuses (same partitioning).
    Q("q_j1_lookup_join",
      (s, d) => {
        val c = Tables.customer(s, d)
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val firstOrder = Tables.orders(s, d)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
            col("o_totalprice").as("first_totalprice"))
        c.join(firstOrder, c("c_custkey") === firstOrder("o_custkey"), "left")
          .select(
            c("c_custkey").as("cust_id"),
            col("first_orderkey"),
            col("first_totalprice"),
            when(col("first_orderkey").isNull, lit("Not found in source"))
              .otherwise(lit("Found in source")).as("status"))
      },
      Some("""SELECT c.c_custkey AS cust_id, f.first_orderkey, f.first_totalprice,
             |  CASE WHEN f.first_orderkey IS NULL THEN 'Not found in source'
             |       ELSE 'Found in source' END AS status
             |FROM customer c
             |LEFT JOIN (
             |  SELECT o_custkey, o_orderkey AS first_orderkey, o_totalprice AS first_totalprice
             |  FROM (SELECT o_custkey, o_orderkey, o_totalprice,
             |          row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
             |        FROM orders) WHERE rn = 1
             |) f ON c.c_custkey = f.o_custkey""".stripMargin)),

    // ---- J2: semi-join membership + anti-join complement -----------------
    Q("q_j2_semi_anti",
      (s, d) => {
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d).select(col("o_custkey"))
        val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
          .agg(count(lit(1)).as("n")).select(lit("with_orders").as("branch"), col("n"))
        val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n")).select(lit("without_orders").as("branch"), col("n"))
        withO.unionByName(withoutO)
      },
      Some("""SELECT 'with_orders' AS branch, COUNT(*) AS n FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
             |UNION ALL
             |SELECT 'without_orders' AS branch, COUNT(*) AS n FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin)),

    // ---- A1/A2: count distinct + match counting --------------------------
    Q("q_a1_count_distinct",
      (s, d) => Tables.orders(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_orderpriority")).as("n_prio")),
      Some("""SELECT COUNT(DISTINCT o_custkey) AS n_cust, COUNT(*) AS n_orders,
             |  COUNT(DISTINCT o_orderpriority) AS n_prio FROM orders""".stripMargin)),

    // ---- A3: per-group value-set (reference's user-group id set) --------
    Q("q_a3_collect_set",
      (s, d) => {
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(array_join(array_sort(collect_set(col("n_name"))), ",").as("nations"))
      },
      Some("""SELECT r.r_name,
             |  list_aggregate(list_sort(list(DISTINCT n.n_name)), 'string_agg', ',') AS nations
             |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
             |GROUP BY r.r_name""".stripMargin)),

    // ---- T1: top-k by sort key (reference: newest-5-files) ---------------
    Q("q_t1_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(5)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5""".stripMargin)),

    // ---- U1: idempotent set-insert on an array column --------------------
    Q("q_u1_set_insert",
      (s, d) => {
        val segs = Tables.customer(s, d).groupBy(col("c_nationkey"))
          .agg(array_sort(collect_set(col("c_mktsegment"))).as("segs"))
        def insertIfAbsent(arr: Column, v: String): Column =
          when(array_contains(arr, v), arr).otherwise(concat(arr, array(lit(v))))
        segs.select(
          col("c_nationkey"),
          array_join(insertIfAbsent(col("segs"), "BUILDING"), ",").as("with_existing"),
          array_join(insertIfAbsent(col("segs"), "CG_MEKONOMEN"), ",").as("with_new"))
      },
      Some("""WITH segs AS (
             |  SELECT c_nationkey, list_sort(list(DISTINCT c_mktsegment)) AS segs
             |  FROM customer GROUP BY c_nationkey)
             |SELECT c_nationkey,
             |  list_aggregate(CASE WHEN list_contains(segs, 'BUILDING') THEN segs
             |    ELSE list_append(segs, 'BUILDING') END, 'string_agg', ',') AS with_existing,
             |  list_aggregate(CASE WHEN list_contains(segs, 'CG_MEKONOMEN') THEN segs
             |    ELSE list_append(segs, 'CG_MEKONOMEN') END, 'string_agg', ',') AS with_new
             |FROM segs""".stripMargin)),

    // ---- U2: branch union with status/reason columns ---------------------
    Q("q_u2_union_branches",
      (s, d) => {
        val o = Tables.orders(s, d)
        val high = o.filter(col("o_totalprice") >= 200000.0)
          .select(col("o_orderkey"), lit("OK").as("status"), lit("high value").as("reason"))
        val low = o.filter(col("o_totalprice") < 200000.0)
          .select(col("o_orderkey"), lit("Not OK").as("status"), lit("low value").as("reason"))
        high.unionByName(low)
      },
      Some("""SELECT o_orderkey, 'OK' AS status, 'high value' AS reason
             |FROM orders WHERE o_totalprice >= 200000.0
             |UNION ALL
             |SELECT o_orderkey, 'Not OK' AS status, 'low value' AS reason
             |FROM orders WHERE o_totalprice < 200000.0""".stripMargin)),

    // ---- U3: INTERSECT / EXCEPT (distinct set semantics) ----------------
    Q("q_u3_intersect_except",
      (s, d) => {
        val o = Tables.orders(s, d)
        val f = o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
        val oo = o.filter(col("o_orderstatus") === "O").select(col("o_custkey"))
        f.intersect(oo).withColumn("tag", lit("both"))
          .unionByName(f.except(oo).withColumn("tag", lit("only_f")))
      },
      Some("""SELECT o_custkey, 'both' AS tag FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |  INTERSECT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
             |UNION ALL
             |SELECT o_custkey, 'only_f' AS tag FROM (
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
             |  EXCEPT
             |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')""".stripMargin)),

    // ---- P8: datetime scalar surface ------------------------------------
    Q("q_p8_datetime",
      (s, d) => Tables.orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        quarter(col("o_orderdate")).as("qtr"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
        date_format(date_add(col("o_orderdate"), 30), "yyyy-MM-dd").as("plus30d"),
        datediff(lit("1995-06-15").cast("date"), col("o_orderdate")).as("days_to_ref"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end")),
      Some("""WITH o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
             |SELECT o_orderkey,
             |  CAST(year(od) AS INT) AS yr,
             |  CAST(month(od) AS INT) AS mo,
             |  CAST(quarter(od) AS INT) AS qtr,
             |  strftime(od + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
             |  strftime(od + 30, '%Y-%m-%d') AS plus30d,
             |  CAST(date_diff('day', od, DATE '1995-06-15') AS INT) AS days_to_ref,
             |  strftime(last_day(od), '%Y-%m-%d') AS month_end
             |FROM o""".stripMargin)),

    // ---- W1: ranking/analytic windows (extension surface) ----------------
    Q("q_w1_window",
      (s, d) => {
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_custkey"),
          row_number().over(w).as("order_seq"),
          lag(col("o_orderkey"), 1).over(w).as("prev_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double").as("running_total"))
      },
      Some("""SELECT o_orderkey, o_custkey,
             |  row_number() OVER w AS order_seq,
             |  lag(o_orderkey, 1) OVER w AS prev_orderkey,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)""".stripMargin)),

    // ---- G2: rollup (grouping-sets extension) ---------------------------
    Q("q_g2_rollup",
      (s, d) => Tables.orders(s, d)
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS n
             |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- V1-V4: the migration-log shape — validation + status/reason
    // channel over a lookup join (the reference's per-row log, §2.8).
    Q("q_v_log_validation",
      (s, d) => {
        val c = Tables.customer(s, d)
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
        val firstOrder = Tables.orders(s, d)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("o_custkey"), col("o_orderkey"))
        val ddRaw = when(col("c_custkey") % 5 === 0, lit(""))
          .otherwise(concat(lit("-"), (col("c_custkey") % 12).cast("string"), lit("D")))
        val probe = c.select(
          col("c_custkey"),
          trim(col("c_custkey").cast("string")).as("current_id"),
          concat(lit("NEW_"), col("c_custkey").cast("string")).as("new_id"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("c_name")).as("new_store_name"),
          ddRaw.as("dd_raw"))
        val filled = probe.withColumn("delivery_day",
          when(col("dd_raw") === "" || col("dd_raw").isNull, lit("-3D")).otherwise(col("dd_raw")))
        val joined = filled.join(firstOrder,
          filled("c_custkey") === firstOrder("o_custkey"), "left")
        joined.select(
          col("current_id"), col("new_id"), col("delivery_day"),
          when(col("o_orderkey").isNull, lit("Not OK"))
            .when(col("new_store_name").isNull, lit("Not OK"))
            .when(!col("delivery_day").rlike("^-[1-9]D$"), lit("Not OK"))
            .otherwise(lit("OK")).as("status"),
          when(col("o_orderkey").isNull, lit("Not found in source XML"))
            .when(col("new_store_name").isNull,
              lit("Invalid value! Please check CSV input file (Missing values!)"))
            .when(!col("delivery_day").rlike("^-[1-9]D$"),
              lit("Invalid value! Please check CSV input file (Invalid delivery day format!)"))
            .otherwise(lit("Found in source XML file")).as("reason"))
      },
      Some("""WITH first_order AS (
             |  SELECT o_custkey, o_orderkey FROM (
             |    SELECT o_custkey, o_orderkey,
             |      row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
             |    FROM orders) WHERE rn = 1),
             |probe AS (
             |  SELECT c_custkey,
             |    TRIM(CAST(c_custkey AS VARCHAR)) AS current_id,
             |    'NEW_' || CAST(c_custkey AS VARCHAR) AS new_id,
             |    CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_name END AS new_store_name,
             |    CASE WHEN c_custkey % 5 = 0 THEN ''
             |         ELSE '-' || CAST(c_custkey % 12 AS VARCHAR) || 'D' END AS dd_raw
             |  FROM customer),
             |filled AS (
             |  SELECT *, CASE WHEN dd_raw = '' OR dd_raw IS NULL THEN '-3D' ELSE dd_raw END AS delivery_day
             |  FROM probe)
             |SELECT f.current_id, f.new_id, f.delivery_day,
             |  CASE WHEN o.o_orderkey IS NULL THEN 'Not OK'
             |       WHEN f.new_store_name IS NULL THEN 'Not OK'
             |       WHEN NOT regexp_matches(f.delivery_day, '^-[1-9]D$') THEN 'Not OK'
             |       ELSE 'OK' END AS status,
             |  CASE WHEN o.o_orderkey IS NULL THEN 'Not found in source XML'
             |       WHEN f.new_store_name IS NULL THEN 'Invalid value! Please check CSV input file (Missing values!)'
             |       WHEN NOT regexp_matches(f.delivery_day, '^-[1-9]D$') THEN 'Invalid value! Please check CSV input file (Invalid delivery day format!)'
             |       ELSE 'Found in source XML file' END AS reason
             |FROM filled f LEFT JOIN first_order o ON f.c_custkey = o.o_custkey""".stripMargin)),

    // ---- HLL: approximate distinct (engine-specific values → no oracle) --
    // ---- Q1: correlated subqueries through the SQL entry point ----------
    // EXISTS / NOT EXISTS / correlated scalar — Catalyst decorrelates all
    // three into joins (semi, anti, left+agg); no per-row re-execution.
    Q("q_q1_subqueries",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("customer_v")
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_custkey,
                |  EXISTS (SELECT 1 FROM orders_v o
                |          WHERE o.o_custkey = c.c_custkey
                |            AND o.o_totalprice > 300000.0) AS has_big_order,
                |  (SELECT COUNT(*) FROM orders_v o
                |   WHERE o.o_custkey = c.c_custkey) AS n_orders
                |FROM customer_v c
                |WHERE NOT EXISTS (SELECT 1 FROM orders_v o
                |                  WHERE o.o_custkey = c.c_custkey
                |                    AND o.o_orderstatus = 'P')""".stripMargin)
      },
      Some("""SELECT c_custkey,
             |  EXISTS (SELECT 1 FROM orders o
             |          WHERE o.o_custkey = c.c_custkey
             |            AND o.o_totalprice > 300000.0) AS has_big_order,
             |  (SELECT COUNT(*) FROM orders o
             |   WHERE o.o_custkey = c.c_custkey) AS n_orders
             |FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey
             |                    AND o.o_orderstatus = 'P')""".stripMargin)),

    // ---- W2: ranking-function surface (ntile/percent_rank/cume_dist/
    // dense_rank/nth_value + a RANGE frame) -----------------------------
    Q("q_w2_rank_funcs",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderstatus"))
          .orderBy(col("o_totalprice"), col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderstatus"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"),
          dense_rank().over(w).as("drank"),
          nth_value(col("o_orderkey"), 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .as("second_key"))
      },
      Some("""SELECT o_orderkey, o_orderstatus,
             |  ntile(4) OVER w AS quartile,
             |  ROUND(percent_rank() OVER w, 6) AS pct_rank,
             |  ROUND(cume_dist() OVER w, 6) AS cume,
             |  dense_rank() OVER w AS drank,
             |  nth_value(o_orderkey, 2) OVER (
             |    PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_key
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)""".stripMargin)),

    Q("q_hll_approx_distinct",
      (s, d) => Tables.orders(s, d).agg(
        approx_count_distinct(col("o_custkey")).as("approx_cust")),
      None),

    // ---- A8: approximate quantiles (mergeable sketch; engine-specific
    // values → rows-only driver check; the error bound vs the exact
    // percentile is asserted in ScalaTest) ------------------------------
    Q("q_a8_approx_quantile",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)).as("p50_approx")),
      None),

    // ---- A9: q_a8's error bound, under the FULL oracle ------------------
    // The q_v7/q_v10 in-row-verdict discipline applied to the original
    // approx-quantile surface: the same percentile_approx(accuracy=1000,
    // rank error ≤ 0.1%) verifies IN-ROW against the exact tie-aware rank
    // interval at a 5% band, and only (key, exact count, verdict) leave
    // the engine — the driver hash goes green, and goes red exactly when
    // the sketch's bound actually breaks. One grouped sketch agg, a
    // broadcast keys-sized join back, one grouped rank count.
    Q("q_a9_quantile_bound",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderstatus"), col("o_totalprice"))
        val est = o.groupBy(col("o_orderstatus"))
          .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("__p50"))
        o.join(broadcast(est), Seq("o_orderstatus"))
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            ((count(when(col("o_totalprice") < col("__p50"), 1))
                .cast("double") / count(lit(1)) - lit(0.05) <= lit(0.5)) &&
              (lit(0.5) <= count(when(col("o_totalprice") <= col("__p50"), 1))
                .cast("double") / count(lit(1)) + lit(0.05))).as("p50_ok"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n, TRUE AS p50_ok
             |FROM orders GROUP BY 1""".stripMargin)),

    // ---- A10: q_hll's error bound, under the FULL oracle ----------------
    // Same discipline for approx_count_distinct: rsd=1% HLL++ vs the
    // exact distinct computed in the SAME aggregation, asserted at 5%
    // (5 standard errors) — the verdict is deterministic unless the
    // sketch path breaks, which is exactly when the row should go red.
    Q("q_a10_hll_bound",
      (s, d) => Tables.orders(s, d)
        .agg(countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.01).as("__est"))
        .select(col("n_exact"),
          (abs(col("__est").cast("double") - col("n_exact").cast("double")) <=
            col("n_exact").cast("double") * lit(0.05)).as("within_bound")),
      Some("""SELECT COUNT(DISTINCT o_custkey) AS n_exact,
             |  TRUE AS within_bound FROM orders""".stripMargin)),

    // ---- X8: deterministic per-group sample (k smallest md5 per lang) ---
    // Stratified sampling for training pipelines: k docs per stratum,
    // chosen by hash order — reproducible, salt-rollable, oracle-exact.
    // Bounded-buffer aggregation, not a window: the partial-aggregate
    // buffer holds ≤k pairs per group per partition, so the shuffle
    // carries ≤k rows per (group × partition) instead of the whole
    // stratum, and no per-partition sort of every row ever happens —
    // the shape that survives strata of billions of docs.
    Q("q_x8_group_sample",
      (s, d) => {
        import s.implicits._
        import graft.functions.TopKAggregator
        val ds = Tables.documents(s, d)
          .select(col("lang"),
            md5(concat(lit("smp|"), col("doc_id").cast("string"))).as("hk"),
            col("doc_id"))
          .as[(String, String, Long)]
        ds.groupByKey(_._1)
          .agg(TopKAggregator.minK[(String, String, Long)](5)(
            t => TopKAggregator.Keyed(t._2, t._3)).toColumn)
          .flatMap { case (lang, rows) =>
            rows.zipWithIndex.map { case (r, i) => (lang, i + 1, r.id) }
          }
          .toDF("lang", "rn", "doc_id")
      },
      Some("""SELECT lang, rn, doc_id FROM (
             |  SELECT lang, doc_id, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5('smp|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents)
             |WHERE rn <= 5""".stripMargin)),

    // ---- X22: class-balanced downsample (min-class quota per class) -----
    Q("q_x22_balance_classes",
      (s, d) => graft.operators.Sampling.balanceClasses(
        Tables.documents(s, d), "lang", "doc_id", "bal"),
      Some("""WITH m AS (
             |  SELECT MIN(cnt) AS mn FROM (
             |    SELECT COUNT(*) AS cnt FROM documents
             |    WHERE lang IS NOT NULL GROUP BY lang)),
             |r AS (
             |  SELECT doc_id, lang, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5('bal|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents WHERE lang IS NOT NULL)
             |SELECT doc_id, lang, rn FROM r, m WHERE rn <= m.mn""".stripMargin)),

    // ---- X23: composed training-data prep: balance → pack ---------------
    // The round's sampling and packing operators chained as a user would
    // chain them: level classes to the minority size, then pack the
    // balanced sample into 512-token training sequences. ONE oracle
    // replays the whole pipeline (min-count quota, md5 ranks, shard
    // derivation, cumsum spans, dense pack ids).
    Q("q_x23_balanced_pack",
      (s, d) => {
        import graft.operators.{Packing, Sampling}
        val docs = Tables.documents(s, d)
        val balanced = docs.join(
          Sampling.balanceClasses(docs, "lang", "doc_id", "bal")
            .select("doc_id"), Seq("doc_id"))
        Packing.packSequences(balanced, budget = 512, shards = 4, salt = "pk")
      },
      Some("""WITH m AS (
             |  SELECT MIN(cnt) AS mn FROM (
             |    SELECT COUNT(*) AS cnt FROM documents
             |    WHERE lang IS NOT NULL GROUP BY lang)),
             |r AS (
             |  SELECT doc_id, row_number() OVER (
             |    PARTITION BY lang
             |    ORDER BY md5('bal|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents WHERE lang IS NOT NULL),
             |sel AS (SELECT doc_id FROM r, m WHERE rn <= m.mn),
             |b AS (
             |  SELECT d.doc_id,
             |    CAST('0x' || substr(md5('pk|' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 4 AS shard,
             |    md5('pk|' || CAST(d.doc_id AS VARCHAR)) AS hk,
             |    len(list_filter(regexp_split_to_array(d.text, '\s+'), t -> t <> '')) AS n_tokens
             |  FROM documents d JOIN sel USING (doc_id)),
             |c AS (
             |  SELECT doc_id, shard, n_tokens,
             |    SUM(n_tokens) OVER (PARTITION BY shard ORDER BY hk, doc_id
             |      ROWS UNBOUNDED PRECEDING) AS cum
             |  FROM b)
             |SELECT doc_id, shard,
             |  CAST(DENSE_RANK() OVER (PARTITION BY shard
             |    ORDER BY (cum - n_tokens) // 512) - 1 AS INT) AS pack,
             |  n_tokens
             |FROM c""".stripMargin)),

    // ---- V2: data-quality profile (completeness / uniqueness metrics) ---
    // One aggregation job for all columns (Expand-based multi-distinct);
    // the gate a pipeline runs before publishing a dataset.
    Q("q_v2_profile",
      (s, d) => graft.operators.Profile.describe(
        Tables.documents(s, d), Seq("doc_id", "lang", "source")),
      Some("""SELECT 'doc_id' AS column, COUNT(*) AS n_rows,
             |  COUNT(*) - COUNT(doc_id) AS n_null,
             |  COUNT(DISTINCT doc_id) AS n_distinct FROM documents
             |UNION ALL
             |SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             |  COUNT(DISTINCT lang) FROM documents
             |UNION ALL
             |SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
             |  COUNT(DISTINCT source) FROM documents""".stripMargin)),

    // ---- V12: profile drift — the nightly stats-snapshot reconciliation -
    // Two Profile.describe snapshots diffed by column name: today nulls
    // part of `lang` (a real ingestion regression shape), drops `text`
    // from the profile, and adds `n_chars` — so all four snapshotDiff
    // classifications fire on PROFILE rows, composing the two proven
    // operators into the schema/stat drift check a scheduler runs before
    // publishing.
    Q("q_v12_profile_drift",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val yesterday = graft.operators.Profile.describe(docs,
          Seq("doc_id", "lang", "text"))
        val today = graft.operators.Profile.describe(
          docs.withColumn("lang",
            when(col("doc_id") % 25 === 0, lit(null)).otherwise(col("lang"))),
          Seq("doc_id", "lang", "n_chars"))
        graft.operators.Diff.snapshotDiff(yesterday, today, Seq("column"))
      },
      Some("""WITH y AS (
             |  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
             |    COUNT(*) - COUNT(doc_id) AS n_null,
             |    COUNT(DISTINCT doc_id) AS n_distinct FROM documents
             |  UNION ALL SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
             |    COUNT(DISTINCT lang) FROM documents
             |  UNION ALL SELECT 'text', COUNT(*), COUNT(*) - COUNT(text),
             |    COUNT(DISTINCT text) FROM documents),
             |t AS (
             |  SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
             |    COUNT(*) - COUNT(doc_id) AS n_null,
             |    COUNT(DISTINCT doc_id) AS n_distinct FROM documents
             |  UNION ALL SELECT 'lang', COUNT(*),
             |    COUNT(*) - COUNT(CASE WHEN doc_id % 25 = 0 THEN NULL
             |      ELSE lang END),
             |    COUNT(DISTINCT CASE WHEN doc_id % 25 = 0 THEN NULL
             |      ELSE lang END) FROM documents
             |  UNION ALL SELECT 'n_chars', COUNT(*),
             |    COUNT(*) - COUNT(n_chars),
             |    COUNT(DISTINCT n_chars) FROM documents)
             |SELECT COALESCE(y.col_name, t.col_name) AS column,
             |  CASE WHEN y.col_name IS NULL THEN 'added'
             |       WHEN t.col_name IS NULL THEN 'removed'
             |       WHEN y.n_rows = t.n_rows AND y.n_null = t.n_null
             |         AND y.n_distinct = t.n_distinct THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM y FULL OUTER JOIN t ON y.col_name = t.col_name""".stripMargin)),

    // ---- V3: keyed snapshot diff (nightly reconciliation audit) ---------
    // Two overlapping order snapshots with a simulated status update on
    // o_orderkey % 7 — exercises all four classifications. The operator
    // compares via an internal md5 row hash; the oracle pins the
    // resulting classification column-by-column.
    Q("q_v3_snapshot_diff",
      (s, d) => {
        val ord = Tables.orders(s, d)
        def proj(df: org.apache.spark.sql.DataFrame) =
          df.select(col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice").cast("decimal(18,2)").as("price"))
        val oldSnap = proj(ord.filter(col("o_orderdate") < lit("1999-01-01")))
        val newSnap = proj(ord.filter(col("o_orderdate") >= lit("1997-01-01")))
          .withColumn("o_orderstatus",
            when(col("o_orderkey") % 7 === 0, lit("X"))
              .otherwise(col("o_orderstatus")))
        graft.operators.Diff.snapshotDiff(oldSnap, newSnap, Seq("o_orderkey"))
      },
      Some("""WITH o AS (SELECT o_orderkey, o_orderstatus,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
             |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
             |n AS (SELECT o_orderkey,
             |    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
             |      AS o_orderstatus,
             |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
             |  FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01')
             |SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             |  CASE WHEN o.o_orderkey IS NULL THEN 'added'
             |       WHEN n.o_orderkey IS NULL THEN 'removed'
             |       WHEN o.o_orderstatus = n.o_orderstatus AND o.price = n.price
             |         THEN 'unchanged'
             |       ELSE 'changed' END AS status
             |FROM o FULL OUTER JOIN n ON o.o_orderkey = n.o_orderkey""".stripMargin)),

    // ---- X32: weighted sampling without replacement (E-S reservoir) -----
    // Quality-weighted corpus sampling: longer docs (n_chars as the
    // weight stand-in) are proportionally likelier, short docs still
    // possible — no hard threshold. One bounded global top-k.
    Q("q_x32_weighted_sample",
      (s, d) => graft.operators.Sampling.weightedSample(
        Tables.documents(s, d), "doc_id", "n_chars", "ws", k = 50),
      Some("""SELECT doc_id, wkey, rnk FROM (
             |  SELECT doc_id, wkey,
             |    row_number() OVER (ORDER BY wkey DESC, doc_id) AS rnk
             |  FROM (
             |    SELECT doc_id,
             |      ROUND(POW(
             |        (CAST('0x' || substr(md5('ws|' || CAST(doc_id AS VARCHAR)), 1, 8)
             |          AS BIGINT) + 0.5) / 4294967296.0,
             |        1.0 / n_chars), 12) AS wkey
             |    FROM documents
             |    WHERE doc_id IS NOT NULL AND n_chars > 0))
             |WHERE rnk <= 50""".stripMargin)),

    // ---- X33: per-group min-max feature scaling --------------------------
    // Two-pass agg+join (the Anomaly shape) — no per-key window sort;
    // constant groups scale to null rather than inventing a midpoint.
    Q("q_x33_minmax_scale",
      (s, d) => graft.operators.Features.minMaxScale(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("value")),
        "user_id", "value"),
      Some("""WITH st AS (
             |  SELECT user_id, ROUND(MIN(value), 6) AS lo,
             |         ROUND(MAX(value), 6) AS hi
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.value,
             |  CASE WHEN st.hi > st.lo
             |       THEN ROUND((e.value - st.lo) / (st.hi - st.lo), 6)
             |  END AS value_scaled
             |FROM events e
             |LEFT JOIN st ON e.user_id IS NOT DISTINCT FROM st.user_id""".stripMargin)),

    // ---- X34: winsorization at exact corpus percentiles ------------------
    Q("q_x34_winsorize",
      (s, d) => graft.operators.Features.winsorize(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice", pLo = 0.05, pHi = 0.95),
      Some("""WITH c AS (
             |  SELECT ROUND(quantile_cont(o_totalprice, 0.05), 6) AS lo,
             |         ROUND(quantile_cont(o_totalprice, 0.95), 6) AS hi
             |  FROM orders)
             |SELECT o.o_orderkey, o.o_totalprice,
             |  ROUND(LEAST(GREATEST(o.o_totalprice, c.lo), c.hi), 6)
             |    AS o_totalprice_wins
             |FROM orders o, c""".stripMargin)),

    // ---- X44: robust (median/IQR) scaling -------------------------------
    // The outlier-proof standardization completing the feature-scaling
    // trio (min-max, winsorize, robust): exact interpolated quartiles in
    // one global aggregate, broadcast, map-side arithmetic. Division
    // replays exactly at 6 dp; a zero-IQR column scales to null.
    Q("q_x44_robust_scale",
      (s, d) => graft.operators.Features.robustScale(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
        "o_totalprice"),
      Some("""WITH c AS (
             |  SELECT ROUND(quantile_cont(o_totalprice, 0.25), 6) AS q1,
             |         ROUND(quantile_cont(o_totalprice, 0.5), 6) AS med,
             |         ROUND(quantile_cont(o_totalprice, 0.75), 6) AS q3
             |  FROM orders)
             |SELECT o.o_orderkey, o.o_totalprice,
             |  CASE WHEN c.q3 > c.q1 THEN
             |    ROUND((o.o_totalprice - c.med) / (c.q3 - c.q1), 6)
             |  END AS o_totalprice_robust
             |FROM orders o, c""".stripMargin)),

    // ---- X45: deterministic categorical index + encode ------------------
    // The StringIndexer shape: labels rank by frequency desc, label asc
    // (driver-side over the bounded label-count collect — the vocab
    // pattern, no rank window), encode via broadcast join. The oracle
    // replays the ranking with a window over the KEYS-sized count
    // relation — fine in DuckDB, where it isn't a distributed sort.
    Q("q_x45_category_index",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))
        graft.operators.Features.encodeCategories(cust, "c_mktsegment",
          graft.operators.Features.buildCategoryIndex(cust, "c_mktsegment"))
      },
      Some("""WITH idx AS (
             |  SELECT label,
             |    CAST(row_number() OVER (ORDER BY cnt DESC, label) - 1 AS INT)
             |      AS cat_id
             |  FROM (SELECT c_mktsegment AS label, COUNT(*) AS cnt
             |        FROM customer WHERE c_mktsegment IS NOT NULL GROUP BY 1))
             |SELECT c.c_custkey, c.c_mktsegment,
             |  CASE WHEN c.c_mktsegment IS NOT NULL
             |    THEN COALESCE(i.cat_id, -1) END AS c_mktsegment_id
             |FROM customer c LEFT JOIN idx i ON c.c_mktsegment = i.label""".stripMargin)),

    // ---- X19: training-mixture sampling (exact per-domain quotas) -------
    // Materialize a pretraining mix from an over-supplied corpus: each
    // listed source contributes exactly its quota (its lowest-md5 docs),
    // unlisted sources contribute nothing. Bounded-buffer MinK per
    // domain — see Sampling.mixtureSample for the shuffle contract.
    Q("q_x19_mixture_sample",
      (s, d) => graft.operators.Sampling.mixtureSample(
        Tables.documents(s, d), "source", "doc_id", "mix",
        Map("src0" -> 10, "src1" -> 5, "src2" -> 15)),
      Some("""SELECT doc_id, source, rn FROM (
             |  SELECT doc_id, source, row_number() OVER (
             |    PARTITION BY source
             |    ORDER BY md5('mix|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents WHERE source IN ('src0', 'src1', 'src2'))
             |WHERE rn <= CASE source WHEN 'src0' THEN 10
             |                        WHEN 'src1' THEN 5 ELSE 15 END""".stripMargin)),

    // ---- X71: per-host cap (C4-style host balancing) ---------------------
    // Every host keeps at most 4 docs by md5 rank — no host enumeration
    // (the capPerKey point: you cannot list the internet's hosts), keys
    // under the cap keep everything. Hosts derived engine-independently
    // (the q_x63 rule, normalization exercised by the uppercase + port).
    Q("q_x71_host_cap",
      (s, d) => graft.operators.Sampling.capPerKey(
        Tables.documents(s, d).select(col("doc_id"),
          concat(lit("h"), col("doc_id") % 3, lit("."), col("source"))
            .as("host")),
        "host", "doc_id", "hcap", k = 4),
      Some("""SELECT doc_id, host, rn FROM (
             |  SELECT doc_id, 'h' || (doc_id % 3) || '.' || source AS host,
             |    row_number() OVER (
             |      PARTITION BY 'h' || (doc_id % 3) || '.' || source
             |      ORDER BY md5('hcap|' || CAST(doc_id AS VARCHAR)), doc_id)
             |      AS rn
             |  FROM documents)
             |WHERE rn <= 4""".stripMargin)),

    // ---- X29: temperature-flattened domain resampling (alpha = 0.5) ----
    // quota_d = max(1, floor(307 * sqrt(n_d) / sum sqrt)); 307 is chosen
    // off the integer boundary so summation-order ulps can't flip a floor.
    Q("q_x29_temperature_sample",
      (s, d) => graft.operators.Sampling.temperatureSample(
        Tables.documents(s, d), "source", "doc_id", "temp", total = 307),
      Some("""WITH c AS (SELECT source, COUNT(*) AS n FROM documents
             |    WHERE source IS NOT NULL AND doc_id IS NOT NULL GROUP BY 1),
             |q AS (SELECT source, GREATEST(1, CAST(floor(
             |      307 * sqrt(CAST(n AS DOUBLE)) /
             |      (SELECT SUM(sqrt(CAST(n AS DOUBLE))) FROM c)) AS BIGINT)) AS quota
             |  FROM c),
             |r AS (SELECT doc_id, source, row_number() OVER (
             |      PARTITION BY source
             |      ORDER BY md5('temp|' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
             |  FROM documents WHERE source IS NOT NULL AND doc_id IS NOT NULL)
             |SELECT r.doc_id, r.source, r.rn
             |FROM r JOIN q USING (source) WHERE r.rn <= q.quota""".stripMargin)),

    // ---- X58: DoReMi-style mixture reweighting (training-mixture opt) ---
    // Excess loss per source = its mean doc length relative to the
    // corpus mean, minus 1 (longer-than-average domains read as
    // underperforming and upweight) — exact integer counts into single
    // IEEE divisions, 6-dp rounded. Five multiplicative-weight rounds in
    // integer micros with round(exp,6) factors and floor(x+0.5)
    // quantization; the oracle unrolls all five rounds (CTEs
    // MATERIALIZED: each round references the previous twice — the
    // normalization total — and inlining would expand exponentially).
    Q("q_x58_doremi_mixture",
      (s, d) => {
        val t = Tables.documents(s, d)
          .filter(col("text").isNotNull && col("source").isNotNull)
          .select(col("source"),
            size(graft.operators.TextAnalysis.tokens(col("text"))).as("nt"))
        val perDom = t.groupBy(col("source"))
          .agg(count(lit(1)).as("nd"), sum(col("nt")).as("sd"))
        val tot = t.agg(count(lit(1)).as("nc"), sum(col("nt")).as("sc"))
        val loss = perDom.crossJoin(broadcast(tot))
          .select(col("source").as("domain"),
            round(col("sd").cast("double") / col("nd") /
              (col("sc").cast("double") / col("nc")) - lit(1.0), 6).as("loss"))
        graft.operators.Sampling.mixtureReweight(loss, rounds = 5, eta = 0.5)
      },
      Some {
        def rw(i: Int): String =
          s"""r${i}a AS MATERIALIZED (SELECT domain, loss,
             |    CAST(FLOOR(w * ROUND(exp(CAST(0.5 AS DOUBLE) * loss *
             |      (1e6 - w) / 1e6), 6) + 0.5) AS BIGINT) AS wr
             |  FROM w${i - 1}),
             |w$i AS MATERIALIZED (SELECT domain, loss,
             |    CAST(FLOOR(wr * 1e6 / s.s + 0.5) AS BIGINT) AS w
             |  FROM r${i}a CROSS JOIN (SELECT SUM(wr) AS s FROM r${i}a) s)"""
            .stripMargin
        s"""WITH t AS (SELECT source, len(list_filter(
           |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS nt
           |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
           |dm AS (SELECT source, COUNT(*) AS nd, SUM(nt) AS sd
           |  FROM t GROUP BY 1),
           |c AS (SELECT COUNT(*) AS nc, SUM(nt) AS sc FROM t),
           |l AS MATERIALIZED (SELECT source AS domain,
           |    ROUND(CAST(sd AS DOUBLE) / nd / (CAST(sc AS DOUBLE) / nc)
           |      - CAST(1.0 AS DOUBLE), 6) AS loss
           |  FROM dm CROSS JOIN c),
           |w0 AS MATERIALIZED (SELECT domain, loss,
           |    CAST(FLOOR(1e6 / nn.c + 0.5) AS BIGINT) AS w
           |  FROM l CROSS JOIN (SELECT COUNT(*) AS c FROM l) nn),
           |${(1 to 5).map(rw).mkString(",\n")}
           |SELECT domain, w AS weight_m, CAST(w AS DOUBLE) / 1e6 AS weight
           |FROM w5""".stripMargin
      }),

    // ---- X59: DoReMi closed loop — reweight → quota → sample -----------
    // The q_x47 composition discipline applied to the mixture
    // optimizer: q_x58's five multiplicative-weight rounds produce the
    // optimized domain weights, which drive the exact-quota md5-rank
    // sampler (q_x19's machinery) in ONE operator under ONE oracle —
    // loss signal in, materialized training mixture out. The weights
    // cross the stage boundary as exact integer micros, so the oracle
    // replays reweighting, the weight→quota floor, and the per-domain
    // rank selection end to end with one hash.
    Q("q_x59_doremi_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val t = docs
          .filter(col("text").isNotNull && col("source").isNotNull)
          .select(col("source"),
            size(graft.operators.TextAnalysis.tokens(col("text"))).as("nt"))
        val perDom = t.groupBy(col("source"))
          .agg(count(lit(1)).as("nd"), sum(col("nt")).as("sd"))
        val tot = t.agg(count(lit(1)).as("nc"), sum(col("nt")).as("sc"))
        val loss = perDom.crossJoin(broadcast(tot))
          .select(col("source").as("domain"),
            round(col("sd").cast("double") / col("nd") /
              (col("sc").cast("double") / col("nc")) - lit(1.0), 6).as("loss"))
        graft.operators.Sampling.doremiMixture(docs, "source", "doc_id",
          loss, rounds = 5, salt = "doremi", total = 307)
      },
      Some {
        def rw(i: Int): String =
          s"""r${i}a AS MATERIALIZED (SELECT domain, loss,
             |    CAST(FLOOR(w * ROUND(exp(CAST(0.5 AS DOUBLE) * loss *
             |      (1e6 - w) / 1e6), 6) + 0.5) AS BIGINT) AS wr
             |  FROM w${i - 1}),
             |w$i AS MATERIALIZED (SELECT domain, loss,
             |    CAST(FLOOR(wr * 1e6 / s.s + 0.5) AS BIGINT) AS w
             |  FROM r${i}a CROSS JOIN (SELECT SUM(wr) AS s FROM r${i}a) s)"""
            .stripMargin
        s"""WITH t AS (SELECT source, len(list_filter(
           |    regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS nt
           |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
           |dm AS (SELECT source, COUNT(*) AS nd, SUM(nt) AS sd
           |  FROM t GROUP BY 1),
           |c AS (SELECT COUNT(*) AS nc, SUM(nt) AS sc FROM t),
           |l AS MATERIALIZED (SELECT source AS domain,
           |    ROUND(CAST(sd AS DOUBLE) / nd / (CAST(sc AS DOUBLE) / nc)
           |      - CAST(1.0 AS DOUBLE), 6) AS loss
           |  FROM dm CROSS JOIN c),
           |w0 AS MATERIALIZED (SELECT domain, loss,
           |    CAST(FLOOR(1e6 / nn.c + 0.5) AS BIGINT) AS w
           |  FROM l CROSS JOIN (SELECT COUNT(*) AS c FROM l) nn),
           |${(1 to 5).map(rw).mkString(",\n")},
           |q AS (SELECT domain, GREATEST(1, CAST(FLOOR(
           |      CAST(w AS DOUBLE) / 1e6 * 307) AS BIGINT)) AS quota
           |  FROM w5 WHERE w > 0),
           |r AS (SELECT doc_id, source, row_number() OVER (
           |      PARTITION BY source
           |      ORDER BY md5('doremi|' || CAST(doc_id AS VARCHAR)), doc_id)
           |    AS rn
           |  FROM documents WHERE doc_id IS NOT NULL)
           |SELECT r.doc_id, r.source, r.rn
           |FROM r JOIN q ON q.domain = r.source
           |WHERE r.rn <= q.quota""".stripMargin
      }),

    // ---- V6: mergeable distinct-count sketch store ----------------------
    // Two "nightly" batches (doc_id parity halves) each append per-source
    // HLL sketches; the estimate unions the STORED sketches without
    // rescanning documents. DataSketches binary → engine-specific →
    // rows-only driver check; ProfileSketchSpec pins the error bound vs
    // exact and merged==single-pass agreement.
    Q("q_v6_sketch_store",
      (s, d) => {
        val store = TempDirs.scratch("graft-hll-store")
        val docs = Tables.documents(s, d)
        graft.operators.Profile.appendDistinctSketches(
          docs.filter(col("doc_id") % 2 === 0), Seq("source"), "text", store)
        graft.operators.Profile.appendDistinctSketches(
          docs.filter(col("doc_id") % 2 === 1), Seq("source"), "text", store)
        graft.operators.Profile.distinctFromSketches(s, store, Seq("source"))
      },
      None),

    // ---- V7: the sketch store's error bound, under the FULL oracle ------
    // q_v6's estimates are engine-specific (DataSketches registers), so it
    // is rows-only by design; this twin puts the ERROR BOUND itself under
    // rows+schema+hash: the same two-batch store is unioned and compared
    // against the exact distinct computed in the SAME query, and only
    // (key, exact count, bounded-error verdict) leave the engine — the
    // q_pq6 in-row-verdict discipline. lgK=12 HLL reads ~1.6% relative
    // standard error; the asserted bound is 5% (≈3 standard errors), so
    // the TRUE column is deterministic unless the sketch path actually
    // breaks — which is exactly when the hash should mismatch.
    Q("q_v7_sketch_bound",
      (s, d) => {
        val store = TempDirs.scratch("graft-hll-bound")
        val docs = Tables.documents(s, d)
        graft.operators.Profile.appendDistinctSketches(
          docs.filter(col("doc_id") % 2 === 0), Seq("source"), "text", store)
        graft.operators.Profile.appendDistinctSketches(
          docs.filter(col("doc_id") % 2 === 1), Seq("source"), "text", store)
        val est = graft.operators.Profile.distinctFromSketches(
          s, store, Seq("source"))
        docs.groupBy(col("source"))
          .agg(countDistinct(col("text")).as("n_exact"))
          .join(est, Seq("source"))
          .select(col("source"), col("n_exact"),
            (abs(col("n_distinct_est").cast("double") -
              col("n_exact").cast("double")) <=
              col("n_exact").cast("double") * lit(0.05)).as("within_bound"))
      },
      Some("""SELECT source, COUNT(DISTINCT text) AS n_exact,
             |  TRUE AS within_bound
             |FROM documents GROUP BY 1""".stripMargin)),

    // ---- V9: theta-sketch corpus overlap, join-free, bounded-error ------
    // Decontamination PLANNING at 100 TB: "how much of the crawl is
    // already in the training set" answered from two stored theta
    // sketches (union/intersection/difference are sketch ops) without
    // ever joining the corpora. The q_v7 in-row-verdict discipline: the
    // exact overlap computes in the same query (one pass over documents)
    // and only exact counts + bounded-error verdicts leave the engine —
    // at these cardinalities (< the 4096-entry nominal) theta is exact,
    // so the 5% verdicts are deterministic. The train tag appends TWO
    // batches to exercise the store's theta_union_agg merge.
    Q("q_v9_theta_overlap",
      (s, d) => {
        val store = TempDirs.scratch("graft-theta-store")
        val docs = Tables.documents(s, d)
        val a = docs.filter(col("doc_id") % 3 =!= 2)
        val b = docs.filter(col("doc_id") % 2 === 0)
        graft.operators.Profile.appendSetSketch(
          a.filter(col("doc_id") % 5 < 3), "train", "doc_id", store)
        graft.operators.Profile.appendSetSketch(
          a.filter(col("doc_id") % 5 >= 3), "train", "doc_id", store)
        graft.operators.Profile.appendSetSketch(b, "crawl", "doc_id", store)
        val est = graft.operators.Profile.overlapFromSketches(
          s, store, "train", "crawl")
        docs.select((col("doc_id") % 3 =!= 2).as("ia"),
            (col("doc_id") % 2 === 0).as("ib"))
          .agg(count(when(col("ia"), 1)).as("n_a_exact"),
            count(when(col("ib"), 1)).as("n_b_exact"),
            count(when(col("ia") && col("ib"), 1)).as("n_and_exact"),
            count(when(col("ia") || col("ib"), 1)).as("n_or_exact"))
          .crossJoin(broadcast(est))
          .select(col("n_a_exact"), col("n_b_exact"),
            col("n_and_exact"), col("n_or_exact"),
            (abs(col("n_a_est") - col("n_a_exact")) <=
              col("n_a_exact").cast("double") * 0.05).as("a_ok"),
            (abs(col("n_b_est") - col("n_b_exact")) <=
              col("n_b_exact").cast("double") * 0.05).as("b_ok"),
            (abs(col("n_and_est") - col("n_and_exact")) <=
              col("n_and_exact").cast("double") * 0.05).as("and_ok"),
            (abs(col("n_or_est") - col("n_or_exact")) <=
              col("n_or_exact").cast("double") * 0.05).as("or_ok"))
      },
      Some("""SELECT
             |  COUNT(CASE WHEN doc_id % 3 <> 2 THEN 1 END) AS n_a_exact,
             |  COUNT(CASE WHEN doc_id % 2 = 0 THEN 1 END) AS n_b_exact,
             |  COUNT(CASE WHEN doc_id % 3 <> 2 AND doc_id % 2 = 0 THEN 1 END)
             |    AS n_and_exact,
             |  COUNT(CASE WHEN doc_id % 3 <> 2 OR doc_id % 2 = 0 THEN 1 END)
             |    AS n_or_exact,
             |  TRUE AS a_ok, TRUE AS b_ok, TRUE AS and_ok, TRUE AS or_ok
             |FROM documents""".stripMargin)),

    // ---- V10: mergeable KLL quantile store, bounded rank error ----------
    // The q_a8 gap closed the store way: exact percentiles cannot merge
    // across batches, KLL sketches can — two nightly appends per key,
    // one keys-sized merge, and the estimates verify IN-ROW against the
    // exact rank interval (value ranks, tie-aware) at a 5% band (k=800
    // reads ~0.4% rank error, so the verdicts are deterministic in
    // practice). Only exact counts + verdicts leave the engine.
    Q("q_v10_quantile_store",
      (s, d) => {
        val store = TempDirs.scratch("graft-kll-store")
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_orderkey"))
        graft.operators.Profile.appendQuantileSketches(
          li.filter(col("l_orderkey") % 2 === 0), Seq("l_returnflag"),
          "l_quantity", store)
        graft.operators.Profile.appendQuantileSketches(
          li.filter(col("l_orderkey") % 2 === 1), Seq("l_returnflag"),
          "l_quantity", store)
        val est = graft.operators.Profile.quantilesFromSketches(
          s, store, Seq("l_returnflag"), Seq(0.5, 0.9))
        def rankOk(q: Column, p: Double): Column = {
          val lt = count(when(col("l_quantity") < q, 1)).cast("double")
          val le = count(when(col("l_quantity") <= q, 1)).cast("double")
          val n = count(lit(1)).cast("double")
          (lt / n - 0.05 <= p) && (lit(p) <= le / n + 0.05)
        }
        li.join(broadcast(est), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            rankOk(col("q_50"), 0.5).as("q50_ok"),
            rankOk(col("q_90"), 0.9).as("q90_ok"))
      },
      Some("""SELECT l_returnflag, COUNT(*) AS n,
             |  TRUE AS q50_ok, TRUE AS q90_ok
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // ---- V16: RELATIONAL count-min sketch store, fully replayed ---------
    // The frequency counterpart of the HLL/theta/KLL/FI stores — and the
    // one sketch family that needs NO bounded-error verdict escape hatch:
    // the depth×width counter matrix lives as (d, idx, cnt) rows with
    // md5-derived buckets, so the DuckDB oracle rebuilds the sketch
    // bit-for-bit and the ESTIMATES themselves sit under rows+schema+hash.
    // Two "nightly" batches (doc parity halves) append; merge is a plain
    // SUM over the sketch-sized relation (exact integers — associative,
    // order-independent); estimates broadcast-join the ≤ d·w-row merged
    // sketch against the query keys, never rescanning the corpus. The
    // over_ok verdicts are deterministic (CMS never undercounts); the
    // bound_ok verdicts are probabilistic in theory but replayed exactly
    // by the oracle either way — both engines compute the same n_est.
    Q("q_v16_cms_store",
      (s, d) => {
        val store = TempDirs.scratch("graft-cms-store")
        val toks = Tables.documents(s, d)
          .filter(col("text").isNotNull)
          .select(col("doc_id"),
            explode(graft.operators.TextAnalysis.tokens(lower(col("text"))))
              .as("tok"))
        graft.operators.Profile.appendCountMinSketch(
          toks.filter(col("doc_id") % 2 === 0), "tok", store)
        graft.operators.Profile.appendCountMinSketch(
          toks.filter(col("doc_id") % 2 === 1), "tok", store)
        val est = graft.operators.Profile.countsFromCmsSketch(
          s, store, toks, "tok")
        val tot = toks.agg(count(lit(1)).as("__n"))
        toks.groupBy(col("tok")).agg(count(lit(1)).as("n_exact"))
          .join(est, col("tok") === col("key"))
          .crossJoin(broadcast(tot))
          .select(col("tok").as("token"), col("n_exact"), col("n_est"),
            (col("n_est") >= col("n_exact")).as("over_ok"),
            ((col("n_est") - col("n_exact")).cast("double") <=
              round(lit(2.718281828459045) * col("__n") / lit(256), 6))
              .as("bound_ok"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |    regexp_split_to_array(lower(text), '\s+'), x -> x <> ''))
             |    AS tok
             |  FROM documents WHERE text IS NOT NULL),
             |dd AS (SELECT unnest(range(1, 5)) AS d),
             |cells AS (
             |  SELECT d, CAST('0x' || substr(md5(CAST(d AS VARCHAR)
             |      || '|' || tok), 1, 15) AS BIGINT) % 256 AS idx,
             |    COUNT(*) AS cnt
             |  FROM toks CROSS JOIN dd GROUP BY 1, 2),
             |keys AS (SELECT DISTINCT tok FROM toks),
             |est AS (
             |  SELECT k.tok, MIN(COALESCE(c.cnt, CAST(0 AS BIGINT))) AS n_est
             |  FROM keys k CROSS JOIN dd
             |  LEFT JOIN cells c ON c.d = dd.d
             |    AND c.idx = CAST('0x' || substr(md5(CAST(dd.d AS VARCHAR)
             |      || '|' || k.tok), 1, 15) AS BIGINT) % 256
             |  GROUP BY 1),
             |exact AS (SELECT tok, COUNT(*) AS n_exact FROM toks GROUP BY 1),
             |tot AS (SELECT COUNT(*) AS n FROM toks)
             |SELECT e.tok AS token, x.n_exact, e.n_est,
             |  e.n_est >= x.n_exact AS over_ok,
             |  CAST(e.n_est - x.n_exact AS DOUBLE) <=
             |    ROUND(CAST(2.718281828459045 AS DOUBLE) * tot.n / 256, 6)
             |    AS bound_ok
             |FROM est e JOIN exact x USING (tok) CROSS JOIN tot""".stripMargin)),

    // ---- V17: declarative expectation suite (the publish gate) ----------
    // Five rules over orders verified in ONE aggregation pass; verdicts
    // come back as a relation so they join into run manifests. Exact
    // integer counts — the oracle recomputes each rule directly.
    Q("q_v17_expectations",
      (s, d) => graft.operators.Profile.expectations(Tables.orders(s, d),
        Seq(
          graft.operators.Profile.NotNull("o_custkey"),
          graft.operators.Profile.Unique("o_orderkey"),
          graft.operators.Profile.InRange("o_totalprice", 0.0, 1000000.0),
          graft.operators.Profile.MatchesRegex("o_orderpriority", "^[1-5]-"),
          graft.operators.Profile.AcceptedValues("o_orderstatus",
            Seq("F", "O", "P")))),
      Some("""WITH v AS (SELECT
             |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS v1,
             |    CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey)
             |      AS BIGINT) AS v2,
             |    CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND
             |      (o_totalprice < 0 OR o_totalprice > 1000000)
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v3,
             |    CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL AND NOT
             |      regexp_matches(o_orderpriority, '^[1-5]-')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v4,
             |    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND
             |      o_orderstatus NOT IN ('F', 'O', 'P')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS v5
             |  FROM orders)
             |SELECT 1 AS check_id, 'o_custkey' AS "column",
             |  'not_null' AS rule, v1 AS n_violations, v1 = 0 AS passed
             |FROM v
             |UNION ALL SELECT 2, 'o_orderkey', 'unique', v2, v2 = 0 FROM v
             |UNION ALL SELECT 3, 'o_totalprice',
             |  'in_range(0.0,1000000.0)', v3, v3 = 0 FROM v
             |UNION ALL SELECT 4, 'o_orderpriority', 'matches(^[1-5]-)',
             |  v4, v4 = 0 FROM v
             |UNION ALL SELECT 5, 'o_orderstatus', 'accepted_values(F|O|P)',
             |  v5, v5 = 0 FROM v""".stripMargin)),

    // ---- V11: key-skew profile (the salt-or-not measurement) ------------
    // One hash agg to per-key counts, one tiny agg over the keys-sized
    // count relation: max/median/p99 per-key multiplicity and the
    // max-over-median skew ratio that triggers Skew.saltedJoin. Measured
    // BEFORE the 100 TB job, not discovered by a straggler task.
    Q("q_v11_key_skew",
      (s, d) => graft.operators.Profile.keySkew(
        Tables.events(s, d), Seq("user_id")),
      Some("""WITH c AS (
             |  SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
             |s AS (
             |  SELECT CAST(SUM(n) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
             |    MAX(n) AS max_n,
             |    ROUND(quantile_cont(n, 0.5), 6) AS p50_n,
             |    ROUND(quantile_cont(n, 0.99), 6) AS p99_n
             |  FROM c)
             |SELECT n_rows, n_keys, max_n, p50_n, p99_n,
             |  ROUND(CAST(max_n AS DOUBLE) / p50_n, 6) AS skew_ratio
             |FROM s""".stripMargin)),

    // ---- V8: k-anonymity generalize-and-recheck repair ------------------
    // The q_v4 audit's missing half: numeric quasi-identifiers generalize
    // down an equi-depth ladder (8 → 4 → 2 → full suppression) until every
    // class reaches k=30. The engine runs the sequential early-exit loop
    // (one percentile + one audit aggregation per rung, one scalar to the
    // driver); the oracle replays it by computing EVERY rung and selecting
    // the first whose min class size meets k — same rung, same classes,
    // by construction (the 4-bin cuts are the 8-ladder's even cuts, so
    // one quantile CTE serves all rungs). At sf0.01 this descends to the
    // 4-bin rung; the bins_used column pins the descent in the hash.
    Q("q_v8_k_anonymize",
      (s, d) => graft.operators.Profile.kAnonymize(Tables.customer(s, d),
        Seq("c_mktsegment"), Seq("c_acctbal"), k = 30, startBins = 8),
      Some {
        val cuts = (1 to 7)
          .map(i => s"ROUND(quantile_cont(c_acctbal, $i/8.0), 6) AS c$i")
          .mkString(",\n             |    ")
        val bin8 = (1 to 7).map(i => s"(c_acctbal > c$i)::int").mkString(" + ")
        s"""WITH q AS (SELECT c_mktsegment, c_acctbal FROM customer),
           |cuts AS (SELECT
           |    $cuts
           |  FROM q),
           |g AS (SELECT c_mktsegment,
           |    CAST($bin8 AS INT) AS bin8,
           |    CAST((c_acctbal > c2)::int + (c_acctbal > c4)::int +
           |      (c_acctbal > c6)::int AS INT) AS bin4,
           |    CAST((c_acctbal > c4)::int AS INT) AS bin2,
           |    CAST(0 AS INT) AS bin1
           |  FROM q, cuts),
           |a8 AS (SELECT c_mktsegment, bin8 AS bin, COUNT(*) AS n FROM g GROUP BY 1, 2),
           |a4 AS (SELECT c_mktsegment, bin4 AS bin, COUNT(*) AS n FROM g GROUP BY 1, 2),
           |a2 AS (SELECT c_mktsegment, bin2 AS bin, COUNT(*) AS n FROM g GROUP BY 1, 2),
           |a1 AS (SELECT c_mktsegment, bin1 AS bin, COUNT(*) AS n FROM g GROUP BY 1, 2),
           |lvl AS (SELECT CASE
           |    WHEN (SELECT MIN(n) FROM a8) >= 30 THEN 8
           |    WHEN (SELECT MIN(n) FROM a4) >= 30 THEN 4
           |    WHEN (SELECT MIN(n) FROM a2) >= 30 THEN 2
           |    ELSE 1 END AS bins),
           |u AS (SELECT 8 AS lv, * FROM a8 UNION ALL SELECT 4, * FROM a4
           |      UNION ALL SELECT 2, * FROM a2 UNION ALL SELECT 1, * FROM a1)
           |SELECT c_mktsegment, bin AS c_acctbal_bin, n, n >= 30 AS anonymous,
           |  lv AS bins_used
           |FROM u WHERE lv = (SELECT bins FROM lvl)""".stripMargin
      }),

    // ---- V4: k-anonymity audit over quasi-identifiers -------------------
    // Every (nation, segment) equivalence class with its size and whether
    // it meets k=10 — the privacy gate before a dataset leaves the
    // warehouse. One hash aggregation keyed by the quasi columns.
    Q("q_v4_k_anonymity",
      (s, d) => graft.operators.Profile.kAnonymity(
        Tables.customer(s, d), Seq("c_nationkey", "c_mktsegment"), 10),
      Some("""SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             |  COUNT(*) >= 10 AS anonymous
             |FROM customer GROUP BY 1, 2""".stripMargin)),

    // ---- V13: distinct l-diversity audit --------------------------------
    // The q_v4 audit's sensitive-attribute half: every (priority,
    // order-year) class with its size and its count of DISTINCT order
    // statuses — a k-anonymous class whose members all share one status
    // still leaks it (homogeneity attack). One keyed aggregation; the
    // count and count-distinct share the scan. Order-year is the
    // classic generalized quasi-identifier (dates → years).
    Q("q_v13_l_diversity",
      (s, d) => graft.operators.Profile.lDiversity(
        Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
        Seq("o_orderpriority", "o_year"), "o_orderstatus", 3),
      Some("""SELECT o_orderpriority,
             |  CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             |  COUNT(*) AS n,
             |  COUNT(DISTINCT o_orderstatus) +
             |    MAX(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS n_sensitive,
             |  (COUNT(DISTINCT o_orderstatus) +
             |    MAX(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)) >= 3 AS diverse
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // ---- V14: t-closeness audit ----------------------------------------
    // The privacy ladder's third rung: per (priority, order-year) class,
    // the total-variation distance between the class's order-status
    // distribution and the global one. The inner sum is exact (DECIMAL /
    // HUGEINT), the only float op is the final division — bit-exact
    // replay, no rounding anywhere.
    Q("q_v14_t_closeness",
      (s, d) => graft.operators.Profile.tCloseness(
        Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
        Seq("o_orderpriority", "o_year"), "o_orderstatus", 0.2),
      Some("""WITH b AS (SELECT o_orderpriority,
             |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             |    o_orderstatus AS v
             |  FROM orders),
             |cv AS (SELECT o_orderpriority, o_year, v, COUNT(*) AS c
             |  FROM b GROUP BY 1, 2, 3),
             |-- n is PROJECTED to the output: DuckDB types SUM(BIGINT) as
             |-- HUGEINT (int128) while Spark's sum is BIGINT, and the
             |-- driver hash distinguishes physical types even when every
             |-- value compares equal — any bare SUM() that reaches the
             |-- SELECT list must be cast back to BIGINT.
             |cls AS (SELECT o_orderpriority, o_year,
             |    CAST(SUM(c) AS BIGINT) AS n
             |  FROM cv GROUP BY 1, 2),
             |gv AS (SELECT v, SUM(c) AS g FROM cv GROUP BY 1),
             |-- the corpus total is named gn, NOT "N": DuckDB identifiers
             |-- are case-insensitive, so n (class size) and N would be the
             |-- same column and the formula would silently divide by n twice
             |tot AS (SELECT SUM(g) AS gn FROM gv),
             |j AS (SELECT cls.o_orderpriority, cls.o_year, cls.n,
             |    gv.g, tot.gn, COALESCE(cv.c, 0) AS c
             |  FROM cls CROSS JOIN gv CROSS JOIN tot
             |  LEFT JOIN cv
             |    ON cv.o_orderpriority IS NOT DISTINCT FROM cls.o_orderpriority
             |   AND cv.o_year IS NOT DISTINCT FROM cls.o_year
             |   AND cv.v IS NOT DISTINCT FROM gv.v)
             |SELECT o_orderpriority, o_year, n,
             |  CAST(SUM(ABS(CAST(c AS HUGEINT) * gn - CAST(g AS HUGEINT) * n))
             |      AS DOUBLE)
             |    / (CAST(2.0 AS DOUBLE) * n * gn) AS tvd,
             |  (CAST(SUM(ABS(CAST(c AS HUGEINT) * gn - CAST(g AS HUGEINT) * n))
             |      AS DOUBLE)
             |    / (CAST(2.0 AS DOUBLE) * n * gn)) <= 0.2 AS close
             |FROM j GROUP BY o_orderpriority, o_year, n, gn""".stripMargin)),

    // ---- V15: composed privacy release gate -----------------------------
    // All three ladder rungs (k=400 / l=3 / t=0.2) on the same classes
    // in one report; release only when every rung holds. The k=400 bar
    // splits the sf0.01 classes (full years ~450, the partial 2001 year
    // ~250), so both verdict branches appear under the oracle.
    Q("q_v15_privacy_gate",
      (s, d) => graft.operators.Profile.privacyReport(
        Tables.orders(s, d).withColumn("o_year", year(col("o_orderdate"))),
        Seq("o_orderpriority", "o_year"), "o_orderstatus",
        k = 400, l = 3, t = 0.2),
      Some("""WITH b AS (SELECT o_orderpriority,
             |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             |    o_orderstatus AS v
             |  FROM orders),
             |cv AS (SELECT o_orderpriority, o_year, v, COUNT(*) AS c
             |  FROM b GROUP BY 1, 2, 3),
             |cls AS (SELECT o_orderpriority, o_year, SUM(c) AS n
             |  FROM cv GROUP BY 1, 2),
             |gv AS (SELECT v, SUM(c) AS g FROM cv GROUP BY 1),
             |tot AS (SELECT SUM(g) AS gn FROM gv),
             |j AS (SELECT cls.o_orderpriority, cls.o_year, cls.n,
             |    gv.g, tot.gn, COALESCE(cv.c, 0) AS c
             |  FROM cls CROSS JOIN gv CROSS JOIN tot
             |  LEFT JOIN cv
             |    ON cv.o_orderpriority IS NOT DISTINCT FROM cls.o_orderpriority
             |   AND cv.o_year IS NOT DISTINCT FROM cls.o_year
             |   AND cv.v IS NOT DISTINCT FROM gv.v),
             |tc AS (SELECT o_orderpriority, o_year,
             |    CAST(SUM(ABS(CAST(c AS HUGEINT) * gn - CAST(g AS HUGEINT) * n))
             |        AS DOUBLE)
             |      / (CAST(2.0 AS DOUBLE) * n * gn) AS tvd
             |  FROM j GROUP BY o_orderpriority, o_year, n, gn),
             |ld AS (SELECT o_orderpriority,
             |    CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
             |    COUNT(*) AS n,
             |    COUNT(DISTINCT o_orderstatus) +
             |      MAX(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
             |      AS n_sensitive
             |  FROM orders GROUP BY 1, 2)
             |SELECT ld.o_orderpriority, ld.o_year, ld.n,
             |  ld.n >= 400 AS anonymous,
             |  ld.n_sensitive, ld.n_sensitive >= 3 AS diverse,
             |  tc.tvd, tc.tvd <= 0.2 AS close,
             |  (ld.n >= 400 AND ld.n_sensitive >= 3 AND tc.tvd <= 0.2)
             |    AS release
             |FROM ld JOIN tc
             |  ON tc.o_orderpriority IS NOT DISTINCT FROM ld.o_orderpriority
             | AND tc.o_year IS NOT DISTINCT FROM ld.o_year""".stripMargin)),

    // ---- V19: Benford first-digit audit ----------------------------------
    // The forensic data-quality screen over o_totalprice: leading digit
    // of floor(value) (floor on BOTH engines — raw double->int casts
    // truncate in Spark but round in DuckDB), observed half-up ppm vs
    // the Benford expectation inlined as constant micros (no
    // cross-engine log10). Complete 9-digit grid with zero cells.
    Q("q_v19_benford",
      (s, d) => graft.operators.Profile.benfordAudit(
        Tables.orders(s, d), "o_totalprice"),
      Some("""WITH v AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice)
             |      AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
             |  FROM orders
             |  WHERE o_totalprice IS NOT NULL AND o_totalprice >= 1),
             |c AS (SELECT digit, COUNT(*) AS n FROM v GROUP BY 1),
             |t AS (SELECT COUNT(*) AS total FROM v),
             |g AS (SELECT CAST(unnest(range(1, 10)) AS INT) AS digit),
             |e AS (SELECT * FROM (VALUES (1, 301030), (2, 176091),
             |    (3, 124939), (4, 96910), (5, 79181), (6, 66947),
             |    (7, 57992), (8, 51153), (9, 45757)) x(digit, ep)),
             |s2 AS (SELECT g.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
             |    CAST(CASE WHEN t.total > 0 THEN
             |      (2 * COALESCE(c.n, 0) * 1000000 + t.total)
             |        // (2 * t.total) ELSE 0 END AS BIGINT) AS observed_ppm,
             |    CAST(e.ep AS BIGINT) AS expected_ppm
             |  FROM g LEFT JOIN c ON c.digit = g.digit
             |  JOIN e ON e.digit = g.digit, t)
             |SELECT digit, n, observed_ppm, expected_ppm,
             |  observed_ppm - expected_ppm AS deviation_ppm
             |FROM s2""".stripMargin)),

    // ---- V20: PSI drift between order-date snapshots ---------------------
    // The model-monitoring drift standard: o_totalprice binned by the
    // BASELINE snapshot's (orders before 1996) exact-percentile deciles,
    // per-bin (p - q)·ln(p/q) with the 1e-6 zero-share floor, each
    // contribution rounded to 6 dp (the pplCore ln discipline). The
    // later-years side is drifted if TPC-H price distributions move
    // across years at all — either way the oracle replays every cell.
    Q("q_v20_psi_drift",
      (s, d) => {
        val o = Tables.orders(s, d)
        graft.operators.Profile.psiDrift(
          o.filter(year(col("o_orderdate")) < 1996),
          o.filter(year(col("o_orderdate")) >= 1996),
          "o_totalprice", nBins = 10)
      },
      Some("""WITH b AS (SELECT o_totalprice AS v FROM orders
             |  WHERE year(o_orderdate) < 1996 AND o_totalprice IS NOT NULL),
             |cu AS (SELECT o_totalprice AS v FROM orders
             |  WHERE year(o_orderdate) >= 1996 AND o_totalprice IS NOT NULL),
             |c AS (SELECT
             |    ROUND(quantile_cont(v, 0.1), 6) AS b1,
             |    ROUND(quantile_cont(v, 0.2), 6) AS b2,
             |    ROUND(quantile_cont(v, 0.3), 6) AS b3,
             |    ROUND(quantile_cont(v, 0.4), 6) AS b4,
             |    ROUND(quantile_cont(v, 0.5), 6) AS b5,
             |    ROUND(quantile_cont(v, 0.6), 6) AS b6,
             |    ROUND(quantile_cont(v, 0.7), 6) AS b7,
             |    ROUND(quantile_cont(v, 0.8), 6) AS b8,
             |    ROUND(quantile_cont(v, 0.9), 6) AS b9
             |  FROM b),
             |bb AS (SELECT CAST((v > b1)::int + (v > b2)::int + (v > b3)::int
             |    + (v > b4)::int + (v > b5)::int + (v > b6)::int
             |    + (v > b7)::int + (v > b8)::int + (v > b9)::int AS INT)
             |    AS bin FROM b, c),
             |cb AS (SELECT CAST((v > b1)::int + (v > b2)::int + (v > b3)::int
             |    + (v > b4)::int + (v > b5)::int + (v > b6)::int
             |    + (v > b7)::int + (v > b8)::int + (v > b9)::int AS INT)
             |    AS bin FROM cu, c),
             |bn AS (SELECT bin, COUNT(*) AS base_n FROM bb GROUP BY 1),
             |cn AS (SELECT bin, COUNT(*) AS cur_n FROM cb GROUP BY 1),
             |sp AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
             |j AS (SELECT sp.bin,
             |    CAST(COALESCE(bn.base_n, 0) AS BIGINT) AS base_n,
             |    CAST(COALESCE(cn.cur_n, 0) AS BIGINT) AS cur_n
             |  FROM sp LEFT JOIN bn ON bn.bin = sp.bin
             |  LEFT JOIN cn ON cn.bin = sp.bin),
             |t AS (SELECT SUM(base_n) AS bt, SUM(cur_n) AS ct FROM j)
             |SELECT bin, base_n, cur_n,
             |  ROUND((GREATEST(base_n / (1.0 * bt), 0.000001)
             |      - GREATEST(cur_n / (1.0 * ct), 0.000001))
             |    * ln(GREATEST(base_n / (1.0 * bt), 0.000001)
             |      / GREATEST(cur_n / (1.0 * ct), 0.000001)), 6) AS psi_c
             |FROM j, t""".stripMargin)),

    // ---- V21: Cohen's kappa between two deterministic raters -------------
    // Inter-annotator agreement over document length labels: rater 1
    // cuts at 20/60 tokens, rater 2 at 25/55 — partial agreement with
    // realistic marginals. Exact longs end to end: kappa =
    // (N·A − E)/(N² − E) as half-up ppm in DECIMAL(38,0), the oracle
    // replays every count and the ratio.
    Q("q_v21_cohen_kappa",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val nTok = size(graft.operators.TextAnalysis.tokens(col("text")))
        graft.operators.Profile.cohenKappa(
          docs.select(
            when(col("text").isNotNull,
              when(nTok < 20, "short").when(nTok < 60, "mid")
                .otherwise("long")).as("r1"),
            when(col("text").isNotNull,
              when(nTok < 25, "short").when(nTok < 55, "mid")
                .otherwise("long")).as("r2")),
          "r1", "r2")
      },
      Some("""WITH lab AS (SELECT
             |    CASE WHEN nt < 20 THEN 'short' WHEN nt < 60 THEN 'mid'
             |      ELSE 'long' END AS r1,
             |    CASE WHEN nt < 25 THEN 'short' WHEN nt < 55 THEN 'mid'
             |      ELSE 'long' END AS r2
             |  FROM (SELECT len(list_filter(
             |      regexp_split_to_array(text, '\s+'), x -> x <> '')) AS nt
             |    FROM documents WHERE text IS NOT NULL)),
             |c AS (SELECT COUNT(*) AS n,
             |    COUNT(CASE WHEN r1 = r2 THEN 1 END) AS agree_n FROM lab),
             |m AS (SELECT COALESCE(SUM(n1 * n2), 0) AS e FROM
             |  (SELECT r1 AS l, COUNT(*) AS n1 FROM lab GROUP BY 1) a
             |  JOIN (SELECT r2 AS l, COUNT(*) AS n2 FROM lab GROUP BY 1) b
             |  USING (l))
             |SELECT CAST(n AS BIGINT) AS n, CAST(agree_n AS BIGINT) AS agree_n,
             |  CAST((2 * agree_n * 1000000 + n) // (2 * n) AS BIGINT) AS po_ppm,
             |  CAST((2 * e * 1000000 + n * n) // (2 * n * n) AS BIGINT)
             |    AS pe_ppm,
             |  CAST(CASE WHEN n * n - e <> 0 THEN
             |    (2 * (n * agree_n - e) * 1000000 + (n * n - e))
             |      // (2 * (n * n - e)) END AS BIGINT) AS kappa_ppm
             |FROM c, m""".stripMargin)),

    // ---- V22: gate-parity audit (disparate impact of a curation gate) ---
    // The four-fifths rule over a length gate per source: accept-rate
    // ppm per group, ratio to the best group, flag under 80%. Null
    // verdicts (null text -> null gate) count as rejects but surface in
    // n_null_verdict; exact DECIMAL ratios replay in the oracle.
    Q("q_v22_gate_parity",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val nTok = size(graft.operators.TextAnalysis.tokens(col("text")))
        graft.operators.Profile.gateParity(
          docs.select(col("source"),
            when(col("text").isNotNull, nTok >= 40).as("accept")),
          "source", "accept")
      },
      Some("""WITH g AS (SELECT source,
             |    CASE WHEN text IS NULL THEN NULL ELSE
             |      len(list_filter(regexp_split_to_array(text, '\s+'),
             |        x -> x <> '')) >= 40 END AS accept
             |  FROM documents),
             |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COUNT(CASE WHEN accept THEN 1 END) AS BIGINT)
             |      AS n_accept,
             |    CAST(COUNT(CASE WHEN accept IS NULL THEN 1 END) AS BIGINT)
             |      AS n_null_verdict
             |  FROM g GROUP BY 1),
             |r AS (SELECT *, CAST((2 * n_accept * 1000000 + n) // (2 * n)
             |    AS BIGINT) AS accept_ppm FROM per),
             |b AS (SELECT MAX(accept_ppm) AS best FROM r)
             |SELECT source, n, n_accept, n_null_verdict, accept_ppm,
             |  CAST(CASE WHEN best > 0 THEN
             |    (2 * accept_ppm * 1000000 + best) // (2 * best) END
             |    AS BIGINT) AS parity_ppm,
             |  COALESCE(CASE WHEN best > 0 THEN
             |    (2 * accept_ppm * 1000000 + best) // (2 * best) < 800000
             |    END, false) AS flagged
             |FROM r, b""".stripMargin)),

    // ---- V23: paired Poisson bootstrap (pipeline A/B significance) ------
    // Gate A scores raw token counts, gate B the same minus doc_id % 3:
    // A is genuinely better by ~1 token, the test should say so at
    // p ~ 0. Deterministic md5-seeded Poisson(1) weights against the
    // SHARED u32 threshold literals; sign-only replicate statistics so
    // the whole test is exact integers. Null-text docs are unpaired.
    Q("q_v23_paired_bootstrap",
      (s, d) => {
        val nTok = size(graft.operators.TextAnalysis.tokens(col("text")))
        graft.operators.Profile.pairedBootstrap(
          Tables.documents(s, d).select(col("doc_id"),
            when(col("text").isNotNull, nTok.cast("long")).as("a"),
            when(col("text").isNotNull,
              nTok.cast("long") - col("doc_id") % 3).as("b")),
          "doc_id", "a", "b", b = 200, salt = "boot")
      },
      Some {
        val th = graft.operators.Profile.poissonThresholdsU32(8)
        val wCase = th.zipWithIndex
          .map { case (t, k) => s"WHEN u32 < ${t} THEN $k" }
          .mkString("CASE ", " ", " ELSE 8 END")
        s"""WITH sc AS (SELECT doc_id,
           |    CASE WHEN text IS NULL THEN NULL ELSE
           |      len(list_filter(regexp_split_to_array(text, '\\s+'),
           |        x -> x <> '')) END AS a,
           |    CASE WHEN text IS NULL THEN NULL ELSE
           |      len(list_filter(regexp_split_to_array(text, '\\s+'),
           |        x -> x <> '')) - doc_id % 3 END AS b
           |  FROM documents),
           |p AS (SELECT CAST(doc_id AS VARCHAR) AS id, a - b AS d
           |  FROM sc WHERE doc_id IS NOT NULL
           |    AND a IS NOT NULL AND b IS NOT NULL),
           |up AS (SELECT COUNT(*) AS n_unpaired FROM sc
           |  WHERE doc_id IS NULL OR a IS NULL OR b IS NULL),
           |e AS (SELECT id, d, br FROM p,
           |  (SELECT unnest(range(1, 201)) AS br)),
           |w AS (SELECT d, br, $wCase AS w FROM (
           |  SELECT *, CAST('0x' || substr(md5('boot|' ||
           |      CAST(br AS VARCHAR) || '|' || id), 1, 8) AS BIGINT) AS u32
           |  FROM e)),
           |r AS (SELECT br, SUM(w * d) AS st FROM w GROUP BY 1),
           |tst AS (SELECT
           |    COUNT(CASE WHEN st > 0 THEN 1 END) AS wins_a,
           |    COUNT(CASE WHEN st = 0 THEN 1 END) AS ties,
           |    COUNT(CASE WHEN st < 0 THEN 1 END) AS wins_b FROM r),
           |bse AS (SELECT COUNT(*) AS n_items, SUM(d) AS dsum FROM p)
           |SELECT CAST(n_items AS BIGINT) AS n_items,
           |  CAST(n_unpaired AS BIGINT) AS n_unpaired,
           |  CAST(200 AS BIGINT) AS b_reps,
           |  CAST(wins_a AS BIGINT) AS wins_a,
           |  CAST(ties AS BIGINT) AS ties,
           |  CAST(wins_b AS BIGINT) AS wins_b,
           |  CAST((2 * (ties + wins_b) * 1000000 + 200) // 400 AS BIGINT)
           |    AS p_ppm,
           |  CAST(CASE WHEN n_items > 0 THEN
           |    (2 * dsum * 1000000 + n_items) // (2 * n_items) END
           |    AS BIGINT) AS mean_delta
           |FROM bse, up, tst""".stripMargin
      }),

    // ---- V24: calibration audit (ECE bins) --------------------------------
    // A WELL-CALIBRATED synthetic gate: score s = (doc_id*7919) % 1e6+1
    // micros, label drawn by the md5 u32 against s (u32·1e6 < s·2^32 —
    // exact long compare, so P(label) ≈ s/1e6 by construction). The
    // per-bin reliability relation replays exactly: counts, half-up mean
    // confidence, half-up accuracy, |gap|.
    Q("q_v24_calibration",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sc = (col("doc_id") * 7919) % 1000001
        val u32 = conv(substring(md5(concat(lit("cal|"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        graft.operators.Profile.calibrationBins(
          docs.select(sc.as("score"),
            (u32 * 1000000L < sc * 4294967296L).as("label")),
          "score", "label", bins = 10)
      },
      Some("""WITH sc AS (SELECT (doc_id * 7919) % 1000001 AS s,
             |    (CAST('0x' || substr(md5('cal|' || CAST(doc_id AS VARCHAR)),
             |       1, 8) AS BIGINT) * 1000000
             |     < ((doc_id * 7919) % 1000001) * 4294967296) AS y
             |  FROM documents),
             |b AS (SELECT LEAST((s * 10) // 1000000, 9) AS bin, s,
             |    CASE WHEN y THEN 1 ELSE 0 END AS yy FROM sc),
             |per AS (SELECT bin, COUNT(*) AS n, SUM(s) AS ss,
             |    SUM(yy) AS pos FROM b GROUP BY 1),
             |sp AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin)
             |SELECT sp.bin, CAST(COALESCE(per.n, 0) AS BIGINT) AS n,
             |  CAST((2 * ss + n) // (2 * n) AS BIGINT) AS mean_conf_micros,
             |  CAST((2 * pos * 1000000 + n) // (2 * n) AS BIGINT) AS acc_ppm,
             |  CAST(abs((2 * pos * 1000000 + n) // (2 * n)
             |    - (2 * ss + n) // (2 * n)) AS BIGINT) AS gap_ppm
             |FROM sp LEFT JOIN per USING (bin)""".stripMargin)),

    // ---- V29: expected calibration error (the q_v24 bins rolled up) -----
    // ECE/MCE over the same planted-confidence fixture: the two numbers
    // a model card publishes. Oracle = the q_v24 CTE chain + the
    // n-weighted half-up roll-up over non-empty bins.
    Q("q_v29_ece",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sc = (col("doc_id") * 7919) % 1000001
        val u32 = conv(substring(md5(concat(lit("cal|"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        graft.operators.Profile.expectedCalibrationError(
          docs.select(sc.as("score"),
            (u32 * 1000000L < sc * 4294967296L).as("label")),
          "score", "label", bins = 10)
      },
      Some("""WITH sc AS (SELECT (doc_id * 7919) % 1000001 AS s,
             |    (CAST('0x' || substr(md5('cal|' || CAST(doc_id AS VARCHAR)),
             |       1, 8) AS BIGINT) * 1000000
             |     < ((doc_id * 7919) % 1000001) * 4294967296) AS y
             |  FROM documents),
             |b AS (SELECT LEAST((s * 10) // 1000000, 9) AS bin, s,
             |    CASE WHEN y THEN 1 ELSE 0 END AS yy FROM sc),
             |per AS (SELECT bin, COUNT(*) AS n, SUM(s) AS ss,
             |    SUM(yy) AS pos FROM b GROUP BY 1),
             |g AS (SELECT bin, n,
             |    abs((2 * pos * 1000000 + n) // (2 * n)
             |      - (2 * ss + n) // (2 * n)) AS gap_ppm
             |  FROM per WHERE n > 0)
             |SELECT CAST(SUM(n) AS BIGINT) AS n,
             |  CAST(COUNT(*) AS BIGINT) AS n_bins_used,
             |  CAST((2 * SUM(CAST(n AS HUGEINT) * gap_ppm) + SUM(n))
             |    // (2 * SUM(n)) AS BIGINT) AS ece_ppm,
             |  CAST(MAX(gap_ppm) AS BIGINT) AS mce_ppm
             |FROM g""".stripMargin)),

    // ---- V31: Brier score (the proper scoring rule over q_v24's fixture)
    Q("q_v31_brier",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sc = (col("doc_id") * 7919) % 1000001
        val u32 = conv(substring(md5(concat(lit("cal|"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        graft.operators.Profile.brierScore(
          docs.select(sc.as("score"),
            (u32 * 1000000L < sc * 4294967296L).as("label")),
          "score", "label")
      },
      Some("""WITH sc AS (SELECT (doc_id * 7919) % 1000001 AS s,
             |    CASE WHEN CAST('0x' || substr(md5('cal|' ||
             |        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) * 1000000
             |      < ((doc_id * 7919) % 1000001) * 4294967296
             |      THEN 1000000 ELSE 0 END AS y
             |  FROM documents)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n,
             |  CAST((2 * SUM(CAST((s - y) AS HUGEINT) * (s - y))
             |    + 1000000 * COUNT(*))
             |    // (2 * 1000000 * COUNT(*)) AS BIGINT) AS brier_micros
             |FROM sc""".stripMargin)),

    // ---- V25: pass@k (the unbiased Chen-et-al. code-eval estimator) -----
    // Per problem (doc_id % 40) with a deterministic ~31% pass rate,
    // pass@{1,5,10} in exact half-up ppm: the C(n−c,k)/C(n,k) ratio
    // telescopes to a product of ≤k integer factors — DECIMAL(38,0) on
    // the Spark side, HUGEINT list_reduce on DuckDB's. n−c < k rows hit
    // the exact-1e6 branch in the data.
    Q("q_v25_pass_at_k",
      (s, d) => graft.operators.Profile.passAtK(
        Tables.documents(s, d).select((col("doc_id") % 40).as("problem"),
          ((col("doc_id") * 7919) % 97 < 30).as("pass")),
        "problem", "pass", ks = Seq(1, 5, 10)),
      Some("""WITH s AS (SELECT doc_id % 40 AS problem,
             |    (doc_id * 7919) % 97 < 30 AS pass FROM documents),
             |per AS (SELECT problem, CAST(COUNT(*) AS BIGINT) AS n,
             |    CAST(COUNT(CASE WHEN pass THEN 1 END) AS BIGINT) AS c
             |  FROM s GROUP BY 1),
             |ex AS (SELECT per.*, k.k,
             |    list_reduce(list_transform(range(0, k),
             |      i -> CAST(n - i AS HUGEINT)), (a, b) -> a * b) AS dprod,
             |    list_reduce(list_transform(range(0, k),
             |      i -> CAST(n - c - i AS HUGEINT)), (a, b) -> a * b) AS nprod
             |  FROM per, (SELECT unnest([1, 5, 10]) AS k) k)
             |SELECT problem, CAST(k AS INT) AS k, n, c,
             |  CAST(CASE WHEN n < k THEN NULL
             |    WHEN n - c < k THEN 1000000
             |    ELSE (2 * (dprod - nprod) * 1000000 + dprod)
             |      // (2 * dprod) END
             |    AS BIGINT) AS pass_ppm
             |FROM ex""".stripMargin)),

    // ---- V26: majority-vote self-consistency eval ------------------------
    // Wang et al. 2022 applied per question (doc_id % 25): ~47% of
    // samples answer gold, ~45% a hash-spread distractor, ~8% abstain
    // (null). Mode with the lexicographic tiebreak, exact vote share,
    // verdict vs the per-question gold; the oracle replays the vote
    // table and the (votes desc, answer asc) argmax.
    Q("q_v26_self_consistency",
      (s, d) => {
        val q = col("doc_id") % 25
        val r = (col("doc_id") * 7919) % 100
        val gold = concat(lit("g"), ((q * 31) % 7).cast("string"))
        graft.operators.Profile.selfConsistency(
          Tables.documents(s, d).select(q.as("q"),
            when(r < 8, lit(null).cast("string"))
              .when(r < 55, gold)
              .otherwise(concat(lit("g"),
                ((col("doc_id") * 13) % 7).cast("string"))).as("ans"),
            gold.as("gold")),
          "q", "ans", "gold")
      },
      Some("""WITH s AS (SELECT doc_id % 25 AS q,
             |    'g' || CAST((doc_id % 25) * 31 % 7 AS VARCHAR) AS g,
             |    CASE WHEN (doc_id * 7919) % 100 < 8 THEN NULL
             |      WHEN (doc_id * 7919) % 100 < 55
             |        THEN 'g' || CAST((doc_id % 25) * 31 % 7 AS VARCHAR)
             |      ELSE 'g' || CAST((doc_id * 13) % 7 AS VARCHAR) END AS a
             |  FROM documents),
             |v AS (SELECT q, a, CAST(COUNT(*) AS BIGINT) AS v
             |  FROM s WHERE a IS NOT NULL GROUP BY 1, 2),
             |m AS (SELECT q, a AS mode_answer, v AS mv FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q
             |      ORDER BY v DESC, a) AS rn FROM v) WHERE rn = 1),
             |agg AS (SELECT q, CAST(SUM(v) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS n_distinct FROM v GROUP BY 1),
             |gd AS (SELECT q, MAX(g) AS gold,
             |    CAST(COUNT(CASE WHEN a IS NULL THEN 1 END) AS BIGINT)
             |      AS n_null
             |  FROM s GROUP BY 1)
             |SELECT gd.q, COALESCE(agg.n, 0) AS n, gd.n_null,
             |  COALESCE(agg.n_distinct, 0) AS n_distinct, m.mode_answer,
             |  CAST(CASE WHEN agg.n > 0 THEN
             |    (2 * m.mv * 1000000 + agg.n) // (2 * agg.n) END
             |    AS BIGINT) AS vote_ppm,
             |  COALESCE(m.mode_answer = gd.gold, false) AS correct
             |FROM gd LEFT JOIN agg USING (q) LEFT JOIN m USING (q)"""
        .stripMargin)),

    // ---- V27: extract -> majority-vote composed (the eval-harness chain)
    // Synthetic completions per question (doc_id % 25): ~47% state the
    // gold number LAST after working steps, ~45% a distractor (with
    // negative/decimal noise numbers earlier — the LAST-match contract
    // under test), ~8% state no number at all (extraction null ->
    // abstention). ONE oracle replays the comma-strip, the last-number
    // regex, and the vote.
    Q("q_v27_extract_vote",
      (s, d) => {
        val q = col("doc_id") % 25
        val r = (col("doc_id") * 7919) % 100
        val goldN = (q * 31) % 50
        val distract = (col("doc_id") * 13) % 50
        val completion =
          when(r < 8, lit("the reasoning never reaches a numeric conclusion"))
            .when(r < 55, concat(lit("step 1 gives 1,200 then -4.5 so "),
              lit("the answer is "), goldN.cast("string")))
            .otherwise(concat(lit("compute 7 minus 19.25 yielding "),
              distract.cast("string")))
        graft.operators.Profile.selfConsistency(
          Tables.documents(s, d).select(q.as("q"),
            graft.operators.TextAnalysis.finalAnswer(completion).as("ans"),
            goldN.cast("string").as("gold")),
          "q", "ans", "gold")
      },
      Some("""WITH s AS (SELECT doc_id % 25 AS q,
             |    CAST((doc_id % 25) * 31 % 50 AS VARCHAR) AS g,
             |    CASE WHEN (doc_id * 7919) % 100 < 8
             |      THEN 'the reasoning never reaches a numeric conclusion'
             |      WHEN (doc_id * 7919) % 100 < 55
             |      THEN 'step 1 gives 1,200 then -4.5 so the answer is '
             |        || CAST((doc_id % 25) * 31 % 50 AS VARCHAR)
             |      ELSE 'compute 7 minus 19.25 yielding '
             |        || CAST((doc_id * 13) % 50 AS VARCHAR) END AS compl
             |  FROM documents),
             |e AS (SELECT q, g,
             |    regexp_extract_all(replace(compl, ',', ''),
             |      '-?\d+(\.\d+)?')[-1] AS a
             |  FROM s),
             |v AS (SELECT q, a, CAST(COUNT(*) AS BIGINT) AS v
             |  FROM e WHERE a IS NOT NULL AND a <> '' GROUP BY 1, 2),
             |m AS (SELECT q, a AS mode_answer, v AS mv FROM (
             |    SELECT *, row_number() OVER (PARTITION BY q
             |      ORDER BY v DESC, a) AS rn FROM v) WHERE rn = 1),
             |agg AS (SELECT q, CAST(SUM(v) AS BIGINT) AS n,
             |    CAST(COUNT(*) AS BIGINT) AS n_distinct FROM v GROUP BY 1),
             |gd AS (SELECT q, MAX(g) AS gold,
             |    CAST(COUNT(CASE WHEN a IS NULL OR a = '' THEN 1 END)
             |      AS BIGINT) AS n_null
             |  FROM e GROUP BY 1)
             |SELECT gd.q, COALESCE(agg.n, 0) AS n, gd.n_null,
             |  COALESCE(agg.n_distinct, 0) AS n_distinct, m.mode_answer,
             |  CAST(CASE WHEN agg.n > 0 THEN
             |    (2 * m.mv * 1000000 + agg.n) // (2 * agg.n) END
             |    AS BIGINT) AS vote_ppm,
             |  COALESCE(m.mode_answer = gd.gold, false) AS correct
             |FROM gd LEFT JOIN agg USING (q) LEFT JOIN m USING (q)"""
        .stripMargin)),

    // ---- V28: ROC-AUC + average precision over the TRAINED classifier ---
    // The q_x69 train->score chain graded against its own planted label
    // (token count >= 40) on the token-bearing corpus: exact tie-aware
    // Mann-Whitney 2U, half-up ppm AUC, step-wise AP with per-term ppb.
    // ONE oracle replays the 3 perceptron rounds AND the rank-sum /
    // threshold-sweep arithmetic — a weight flip upstream or an
    // off-by-one in the prefix turns the row red.
    Q("q_v28_binary_eval",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = size(graft.operators.TextAnalysis.tokens(
          lower(col("text"))))
        val labeled = docs.filter(col("doc_id") % 3 === 0)
          .withColumn("label", toks >= 40)
        val w = graft.operators.TextAnalysis.trainLinearQuality(labeled,
          "label", dims = 16, rounds = 3)
        val scored = graft.operators.TextAnalysis.linearQualityScore(docs,
          w, biasM = 0L, dims = 16, thresholdM = 0L)
        val ev = scored
          .join(docs.select(col("doc_id"), toks.as("__nt")), Seq("doc_id"))
          .filter(col("__nt") > 0)
          .select(lit("quality").as("model"),
            col("score_m").as("score"), (col("__nt") >= 40).as("label"))
        graft.operators.Profile.binaryEval(ev, "model", "score", "label")
      },
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tnz AS (SELECT doc_id, toks FROM t WHERE len(toks) > 0),
             |htf AS (SELECT doc_id,
             |    CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 16 AS b,
             |    COUNT(*) AS tf
             |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tnz) GROUP BY 1, 2),
             |lab AS (SELECT doc_id,
             |    CASE WHEN len(toks) >= 40 THEN 1 ELSE -1 END AS y
             |  FROM tnz WHERE doc_id % 3 = 0),
             |tfl AS (SELECT h.doc_id, l.y, h.b, h.tf
             |  FROM htf h JOIN lab l USING (doc_id)),
             |w1 AS (SELECT b, SUM(y * tf) AS wm FROM tfl WHERE y = -1 GROUP BY 1),
             |m2 AS (SELECT f.doc_id, f.y, SUM(f.tf * COALESCE(w.wm, 0)) AS m
             |  FROM tfl f LEFT JOIN w1 w ON w.b = f.b GROUP BY 1, 2),
             |u2r AS (SELECT f.b, SUM(f.y * f.tf) AS u FROM tfl f
             |  JOIN m2 ON m2.doc_id = f.doc_id
             |  WHERE (m2.m >= 0) <> (m2.y > 0) GROUP BY 1),
             |w2 AS (SELECT COALESCE(a.b, u.b) AS b,
             |    COALESCE(a.wm, 0) + COALESCE(u.u, 0) AS wm
             |  FROM w1 a FULL OUTER JOIN u2r u ON a.b = u.b),
             |m3 AS (SELECT f.doc_id, f.y, SUM(f.tf * COALESCE(w.wm, 0)) AS m
             |  FROM tfl f LEFT JOIN w2 w ON w.b = f.b GROUP BY 1, 2),
             |u3 AS (SELECT f.b, SUM(f.y * f.tf) AS u FROM tfl f
             |  JOIN m3 ON m3.doc_id = f.doc_id
             |  WHERE (m3.m >= 0) <> (m3.y > 0) GROUP BY 1),
             |w3 AS (SELECT COALESCE(a.b, u.b) AS b,
             |    COALESCE(a.wm, 0) + COALESCE(u.u, 0) AS wm
             |  FROM w2 a FULL OUTER JOIN u3 u ON a.b = u.b),
             |sc AS (SELECT h.doc_id,
             |    CAST(SUM(h.tf * COALESCE(w.wm, 0)) AS BIGINT) AS s
             |  FROM htf h LEFT JOIN w3 w ON w.b = h.b GROUP BY 1),
             |ev AS (SELECT sc.s AS score,
             |    CASE WHEN len(t2.toks) >= 40 THEN 1 ELSE 0 END AS yy
             |  FROM tnz t2 JOIN sc ON sc.doc_id = t2.doc_id),
             |dist AS (SELECT score, CAST(SUM(yy) AS BIGINT) AS dp,
             |    CAST(SUM(1 - yy) AS BIGINT) AS dn,
             |    CAST(COUNT(*) AS BIGINT) AS dc
             |  FROM ev GROUP BY 1),
             |pre AS (SELECT score, dp, dn, dc,
             |    COALESCE(SUM(dp) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS plt,
             |    COALESCE(SUM(dn) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nlt,
             |    COALESCE(SUM(dc) OVER (ORDER BY score
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS clt
             |  FROM dist),
             |tot AS (SELECT CAST(SUM(dp) AS BIGINT) AS tp,
             |    CAST(SUM(dn) AS BIGINT) AS tn,
             |    CAST(SUM(dc) AS BIGINT) AS tc
             |  FROM dist),
             |ag AS (SELECT CAST(SUM(2 * dp * nlt + dp * dn) AS BIGINT) AS u2,
             |    CAST(SUM(CASE WHEN dp > 0 THEN
             |      (2 * CAST(dp AS HUGEINT) * (tot.tp - plt) * 1000000000
             |        + CAST(tot.tp AS HUGEINT) * (tot.tc - clt))
             |      // (2 * CAST(tot.tp AS HUGEINT) * (tot.tc - clt))
             |      ELSE 0 END) AS BIGINT) AS ap_ppb
             |  FROM pre, tot)
             |SELECT 'quality' AS model, tot.tc AS n, tot.tp AS n_pos,
             |  tot.tn AS n_neg, ag.u2,
             |  CAST(CASE WHEN tot.tp > 0 AND tot.tn > 0 THEN
             |    (2 * CAST(ag.u2 AS HUGEINT) * 1000000
             |      + 2 * CAST(tot.tp AS HUGEINT) * tot.tn)
             |    // (2 * 2 * CAST(tot.tp AS HUGEINT) * tot.tn) END
             |    AS BIGINT) AS auc_ppm,
             |  CAST(CASE WHEN tot.tp > 0 AND tot.tn > 0 THEN
             |    (2 * ag.ap_ppb + 1000) // 2000 END AS BIGINT) AS ap_ppm
             |FROM tot, ag""".stripMargin)),

    // ---- V18: differentially-private histogram release ------------------
    // The Laplace mechanism over the q_v4 grid (epsilon = 1, sensitivity
    // 1 for disjoint counts): deterministic-seeded noise via the inverse
    // CDF of md5-derived uniforms, so the release is reproducible AND
    // oracle-replayable; a new salt per release restores the fresh-draw
    // contract. Noise rounds to 6 dp (the one libm ln, the exp/ln oracle
    // precedent); released counts clamp to non-negative integers
    // (DP-safe post-processing).
    Q("q_v18_dp_counts",
      (s, d) => graft.operators.Profile.dpCounts(Tables.customer(s, d),
        Seq("c_nationkey", "c_mktsegment"), epsilonMicros = 1000000L,
        salt = "dp1"),
      Some("""WITH g AS (SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
             |  FROM customer GROUP BY 1, 2),
             |nz AS (SELECT *,
             |    ROUND(-1.0 * (CASE WHEN u > 0.5 THEN 1 ELSE -1 END)
             |      * ln(1 - 2 * abs(u - 0.5)), 6) AS noise
             |  FROM (SELECT *,
             |      (CAST('0x' || substr(md5('dp1|'
             |          || CAST(c_nationkey AS VARCHAR) || '|' || c_mktsegment),
             |        1, 4) AS INTEGER) + 0.5) / 65536.0 AS u
             |    FROM g))
             |SELECT c_nationkey, c_mktsegment, n, noise,
             |  GREATEST(CAST(ROUND(n + noise) AS BIGINT), 0) AS released
             |FROM nz""".stripMargin)),

    // ---- V5: pairwise correlation matrix, one aggregation job -----------
    // All six lineitem-measure correlations share a single scan (the
    // q_v2 Expand discipline applied to corr), unpivoted to long form.
    Q("q_v5_corr",
      (s, d) => graft.operators.Profile.corrMatrix(Tables.lineitem(s, d),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")),
      Some("""WITH a AS (SELECT
             |    ROUND(corr(l_quantity, l_extendedprice), 6) AS c01,
             |    ROUND(corr(l_quantity, l_discount), 6) AS c02,
             |    ROUND(corr(l_quantity, l_tax), 6) AS c03,
             |    ROUND(corr(l_extendedprice, l_discount), 6) AS c12,
             |    ROUND(corr(l_extendedprice, l_tax), 6) AS c13,
             |    ROUND(corr(l_discount, l_tax), 6) AS c23
             |  FROM lineitem)
             |SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b, c01 AS corr_r FROM a
             |UNION ALL SELECT 'l_quantity', 'l_discount', c02 FROM a
             |UNION ALL SELECT 'l_quantity', 'l_tax', c03 FROM a
             |UNION ALL SELECT 'l_extendedprice', 'l_discount', c12 FROM a
             |UNION ALL SELECT 'l_extendedprice', 'l_tax', c13 FROM a
             |UNION ALL SELECT 'l_discount', 'l_tax', c23 FROM a""".stripMargin))
  )
}
