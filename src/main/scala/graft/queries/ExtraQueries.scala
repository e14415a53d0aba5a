package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.sources.Tables

/** Completeness pack: the join/aggregate/string shapes SURVEY.md lists as
  * "absent in the reference, Spark built-ins when extension ops need
  * them" — cube, range join, as-of join, exact percentiles, the string
  * scalar surface.
  */
object ExtraQueries extends graft.QueryPack {

  override def queries: Seq[Q] = Seq(

    // ---- G3: cube ------------------------------------------------------
    Q("q_g3_cube",
      (s, d) => Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"),
          count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    // ---- G4: grouping sets via the SQL entry point ----------------------
    Q("q_g4_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
                |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                |  COUNT(*) AS n
                |FROM orders_v
                |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
             |  COUNT(*) AS n
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // ---- G5: pivot (fixed value list → conditional aggregates) ----------
    // coalesce(…, 0): pivot yields NULL for an absent (status, priority)
    // combo while the oracle's COUNT(*) FILTER yields 0 — align on 0 so
    // the match holds on data sparser than the tested scale factors.
    Q("q_g5_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
        .agg(count(lit(1)))
        .withColumnRenamed("1-URGENT", "p1").withColumnRenamed("2-HIGH", "p2")
        .withColumnRenamed("3-MEDIUM", "p3").withColumnRenamed("4-NOT SPECIFIED", "p4")
        .withColumnRenamed("5-LOW", "p5")
        .select(col("o_orderstatus") +: Seq("p1", "p2", "p3", "p4", "p5")
          .map(c => coalesce(col(c), lit(0L)).as(c)): _*),
      Some("""SELECT o_orderstatus,
             |  COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1,
             |  COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p2,
             |  COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p3,
             |  COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4,
             |  COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p5
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- J4: range (non-equi) join against a small banded dimension -----
    // The band table is tiny → Catalyst picks BroadcastNestedLoop, which
    // is the right plan: each order row tests 4 band predicates in place.
    Q("q_j4_range_join",
      (s, d) => {
        val bands = s.createDataFrame(Seq(
          ("low", 0.0, 50000.0), ("mid", 50000.0, 150000.0),
          ("high", 150000.0, 300000.0), ("top", 300000.0, 1e12)))
          .toDF("band", "lo", "hi")
        Tables.orders(s, d).join(broadcast(bands),
            col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n"),
            sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double").as("sum_price"))
      },
      Some("""WITH bands(band, lo, hi) AS (VALUES
             |  ('low', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
             |  ('high', 150000.0, 300000.0), ('top', 300000.0, 1e12))
             |SELECT band, COUNT(*) AS n,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
             |FROM orders JOIN bands
             |  ON o_totalprice >= lo AND o_totalprice < hi
             |GROUP BY band""".stripMargin)),

    // ---- J5: as-of join (latest prior 'error' for each 'click') ---------
    // The scalable as-of shape: union both streams, ONE sort per user,
    // carry the last error timestamp forward — no per-row probe, no
    // nested loop; state is a single value per partition-key.
    Q("q_j5_asof_join",
      (s, d) => {
        val e = Tables.events(s, d)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        e.filter(col("event_type").isin("click", "error"))
          .withColumn("err_ts",
            last(when(col("event_type") === "error", col("ts")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("err_ts").as("asof_error_ts"))
      },
      Some("""SELECT event_id, user_id, ts, asof_error_ts FROM (
             |  SELECT event_id, user_id, ts, event_type,
             |    last_value(CASE WHEN event_type = 'error' THEN ts END IGNORE NULLS)
             |      OVER (PARTITION BY user_id ORDER BY ts, event_id
             |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_error_ts
             |  FROM events WHERE event_type IN ('click', 'error'))
             |WHERE event_type = 'click'""".stripMargin)),

    // ---- J7: large×large range join via binning -------------------------
    // Both sides are fact tables, so BroadcastNestedLoop (the q_j4 shape)
    // is out; points and exploded intervals meet in an equi-join on a
    // price bin, with the exact predicate as residual. DuckDB's IEJoin
    // computes the same relation natively — a cross-engine check that the
    // binning loses and invents nothing.
    Q("q_j7_binned_range",
      (s, d) => {
        import graft.operators.RangeJoin
        val pts = Tables.lineitem(s, d).select(col("l_extendedprice").as("v"))
        val ivs = Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_totalprice") - 1.0).as("lo"), (col("o_totalprice") + 1.0).as("hi"))
        val m = RangeJoin.binnedPointInterval(pts, "v", ivs, "lo", "hi", 20.0)
          .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
        Tables.orders(s, d).select(col("o_orderkey"))
          .join(m, Seq("o_orderkey"), "left")
          .select(col("o_orderkey"), coalesce(col("n"), lit(0L)).as("n"))
      },
      Some("""SELECT o.o_orderkey, COUNT(l.l_extendedprice) AS n
             |FROM orders o LEFT JOIN lineitem l
             |  ON l.l_extendedprice >= o.o_totalprice - 1.0
             | AND l.l_extendedprice <  o.o_totalprice + 1.0
             |GROUP BY 1""".stripMargin)),

    // ---- J13: large×large interval-OVERLAP join via binning -------------
    // Both sides are intervals (lineitem shipping windows × derived
    // 14-day promo windows): each explodes into the 16-day bins it
    // touches, candidates meet on the bin, the closed-endpoint predicate
    // filters residually, and the FIRST-COMMON-BIN rule dedupes map-side
    // (no distinct, no second shuffle). DuckDB computes the same
    // relation with its native IEJoin — binning must lose and invent
    // nothing.
    Q("q_j13_interval_overlap",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
            unix_date(to_date(col("l_shipdate"))).as("alo"))
          .withColumn("ahi", col("alo") + (col("l_linenumber") % 7) + 1)
        val pr = Tables.orders(s, d).where(col("o_orderkey") % 1000 === 0)
          .select(col("o_orderkey"),
            unix_date(to_date(col("o_orderdate"))).as("blo"))
          .withColumn("bhi", col("blo") + 14)
        graft.operators.RangeJoin
          .binnedIntervalOverlap(li, "alo", "ahi", pr, "blo", "bhi", 16.0)
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n_overlap"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
              .as("sum_qty"))
      },
      Some("""WITH li AS (SELECT l_orderkey, l_linenumber, l_quantity,
             |    CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS alo,
             |    CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      + (l_linenumber % 7) + 1 AS ahi
             |  FROM lineitem),
             |pr AS (SELECT o_orderkey,
             |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS blo,
             |    CAST(o_orderdate AS DATE) - DATE '1970-01-01' + 14 AS bhi
             |  FROM orders WHERE o_orderkey % 1000 = 0)
             |SELECT p.o_orderkey, COUNT(*) AS n_overlap,
             |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             |    AS sum_qty
             |FROM pr p JOIN li l ON l.alo <= p.bhi AND p.blo <= l.ahi
             |GROUP BY 1""".stripMargin)),

    // ---- J8: salted shuffle join (manual skew fallback) -----------------
    // Identical results to the plain join — the salt only spreads each
    // key over 8 reducers — so the oracle is the unsalted SQL join.
    Q("q_j8_salted_join",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
        val o = Tables.orders(s, d)
          .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
        graft.operators.Skew.saltedJoin(li, o, "l_orderkey", 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double").as("sum_qty"))
      },
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderstatus""".stripMargin)),

    // ---- J12: fuzzy self-join (edit-distance entity resolution) ---------
    // Deletion-neighborhood candidates (keyed equi-join on the variant
    // string — never all pairs) + exact levenshtein rescore. Customer
    // names are near-miss-rich: ids differing in one digit are dist 1.
    Q("q_j12_fuzzy_join",
      (s, d) => graft.operators.FuzzyJoin.selfJoin(
        Tables.customer(s, d), "c_custkey", "c_name"),
      Some("""WITH names AS (SELECT c_custkey, c_name FROM customer),
             |vars AS (
             |  SELECT c_custkey, c_name,
             |    unnest(list_transform(range(1, length(c_name)+1),
             |      i -> substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name)))) AS v
             |  FROM names
             |  UNION ALL SELECT c_custkey, c_name, c_name FROM names),
             |cands AS (
             |  SELECT DISTINCT a.c_custkey AS a_id, a.c_name AS a_name,
             |                  b.c_custkey AS b_id, b.c_name AS b_name
             |  FROM vars a JOIN vars b ON a.v = b.v AND a.c_custkey < b.c_custkey)
             |SELECT a_id, b_id, levenshtein(a_name, b_name) AS dist
             |FROM cands WHERE levenshtein(a_name, b_name) <= 1""".stripMargin)),

    // ---- J14: Jaro-Winkler entity scoring over blocked candidates -------
    // q_j12's deletion-1 blocking with the native codegen'd jaro_winkler
    // scorer (Spark ships no builtin; the expression's semantics are
    // pinned empirically to DuckDB's jaro_winkler_similarity — 0/4000
    // randomized mismatches incl. the empty-empty = 0 convention).
    // Integer-micro cut at 0.9.
    Q("q_j14_jw_entity_scores",
      (s, d) => graft.operators.FuzzyJoin.selfJoinJaroWinkler(
        Tables.customer(s, d), "c_custkey", "c_name",
        minSimMicros = 900000L),
      Some("""WITH names AS (SELECT c_custkey, c_name FROM customer),
             |vars AS (
             |  SELECT c_custkey, c_name,
             |    unnest(list_transform(range(1, length(c_name)+1),
             |      i -> substr(c_name, 1, i-1) || substr(c_name, i+1, length(c_name)))) AS v
             |  FROM names
             |  UNION ALL SELECT c_custkey, c_name, c_name FROM names),
             |cands AS (
             |  SELECT DISTINCT a.c_custkey AS a_id, a.c_name AS a_name,
             |                  b.c_custkey AS b_id, b.c_name AS b_name
             |  FROM vars a JOIN vars b
             |    ON a.v = b.v AND a.c_custkey < b.c_custkey),
             |sc AS (SELECT a_id, b_id,
             |    ROUND(jaro_winkler_similarity(a_name, b_name), 6) AS jw
             |  FROM cands)
             |SELECT a_id, b_id, jw FROM sc
             |WHERE CAST(ROUND(jw * 1e6) AS BIGINT) >= 900000""".stripMargin)),

    // ---- J9: full-outer join (both-sided exclusives) --------------------
    Q("q_j9_full_outer",
      (s, d) => {
        val cust = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
          .select(col("c_custkey"), col("c_name"))
        val oagg = Tables.orders(s, d).groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"))
        cust.join(oagg, cust("c_custkey") === oagg("o_custkey"), "full_outer")
          .select(
            coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
            col("c_name").isNotNull.as("has_cust"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
             |  c.c_name IS NOT NULL AS has_cust,
             |  COALESCE(o.n_orders, 0) AS n_orders
             |FROM (SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 5000) c
             |FULL OUTER JOIN (
             |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey) o
             |ON c.c_custkey = o.o_custkey""".stripMargin)),

    // ---- A5: exact interpolated percentiles -----------------------------
    Q("q_a5_percentile",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
          round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90")),
      Some("""SELECT o_orderstatus,
             |  ROUND(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
             |FROM orders GROUP BY o_orderstatus""".stripMargin)),

    // ---- A6: exact grouped top-k via a typed Aggregator -----------------
    // Bounded-buffer partial aggregation: shuffle carries ≤k rows per
    // group per partition (a window+row_number would shuffle every row).
    Q("q_a6_topk_agg",
      (s, d) => {
        import s.implicits._
        import graft.functions.TopKAggregator
        val ds = Tables.orders(s, d)
          .select(col("o_orderstatus").as("g"),
            col("o_totalprice").as("score"), col("o_orderkey").as("id"))
          .as[(String, Double, Long)]
        ds.groupByKey(_._1)
          .agg(TopKAggregator.topK[(String, Double, Long)](3)(
            t => TopKAggregator.Scored(t._2, t._3)).toColumn)
          .flatMap { case (g, rows) =>
            rows.zipWithIndex.map { case (r, i) => (g, i + 1, r.id, r.score) }
          }
          .toDF("status", "rnk", "orderkey", "totalprice")
      },
      Some("""SELECT o_orderstatus AS status, rnk, o_orderkey AS orderkey,
             |  o_totalprice AS totalprice
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderstatus
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rnk
             |      FROM orders)
             |WHERE rnk <= 3""".stripMargin)),

    // ---- A7: two-phase salted aggregation over hot keys -----------------
    // Identical results to a direct groupBy (associative combines over
    // exact decimal partials); the salt bounds any one reducer's share of
    // a hot key to 1/16 — the skew answer when AQE can't split an agg.
    Q("q_a7_salted_agg",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(
          col("l_returnflag"),
          col("l_quantity").cast(DecimalType(18, 2)).as("sum_qty"),
          lit(1L).as("n"))
        graft.operators.Skew.saltedAggregate(li, Seq("l_returnflag"), 16, Seq(
          ("sum_qty", sum, sum),
          ("n", sum, sum)))
          .select(col("l_returnflag"), col("sum_qty").cast("double").as("sum_qty"),
            col("n").cast("long").as("n"))
      },
      Some("""SELECT l_returnflag,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             |  COUNT(*) AS n
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // ---- P7: string scalar surface (SURVEY §2.9) ------------------------
    Q("q_p7_string_funcs",
      (s, d) => Tables.part(s, d).select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        substring(col("p_type"), 1, 8).as("type_prefix"),
        regexp_replace(col("p_name"), "a", "_").as("name_repl"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_pad"),
        reverse(col("p_brand")).as("brand_rev"),
        col("p_type").endsWith("STEEL").as("is_steel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined")),
      Some("""SELECT p_partkey,
             |  UPPER(p_brand) AS brand_uc,
             |  substr(p_type, 1, 8) AS type_prefix,
             |  replace(p_name, 'a', '_') AS name_repl,
             |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
             |  reverse(p_brand) AS brand_rev,
             |  suffix(p_type, 'STEEL') AS is_steel,
             |  p_brand || '|' || p_type AS joined
             |FROM part""".stripMargin))
  )
}
