package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Q
import graft.sources.Tables

/** Batch equivalents of the streaming surface over `events` (tumbling /
  * sliding / session windows, dedup-keep-first, JSON extraction). These
  * share the column expressions with [[graft.streaming.EventStreams]] so
  * the DuckDB oracle validates the window semantics the streaming path
  * executes incrementally.
  */
object EventQueries extends graft.QueryPack {

  /** The q_e28 preference synthesis as oracle CTEs (8 candidates,
    * rotational tournament, 20% rater noise) reduced to the pair-count
    * relation — q_e35's front half (mirrors q_e28's synthesis).
    * MATERIALIZED: the unrolled MM iterations reference their inputs
    * 2-6x each; inlined expansion would re-derive the corpus scan
    * ~8x per rung (32k scans by rung 5). */
  private val duckPrefPairCtes =
    """pr AS (
      |  SELECT CASE WHEN win1 THEN m1 ELSE m2 END AS winner,
      |    CASE WHEN win1 THEN m2 ELSE m1 END AS loser
      |  FROM (SELECT m1, m2,
      |      (((m2 - m1) + 8) % 8 BETWEEN 1 AND 3)
      |        <> (user_id % 5 = 0) AS win1
      |    FROM (SELECT event_id % 8 AS m1, (event_id // 8) % 8 AS m2,
      |        user_id FROM events WHERE user_id IS NOT NULL)
      |    WHERE m1 <> m2)),
      |p AS (SELECT LEAST(winner, loser) AS a,
      |    GREATEST(winner, loser) AS b,
      |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw FROM pr),
      |pc AS MATERIALIZED (SELECT a, b, SUM(aw) AS wab,
      |    COUNT(*) - SUM(aw) AS wba
      |  FROM p GROUP BY 1, 2)""".stripMargin

  /** The q_e44 heap-tree fixture + recursive root-to-leaf walk as
    * oracle CTEs, ending in `m` (messages) and `ex2` (per-turn path
    * relation) — shared by q_e44 and the q_e46 ChatML composition. */
  private lazy val duckDialogTree: String =
    """WITH RECURSIVE tt AS (SELECT doc_id,
      |    list_filter(regexp_split_to_array(text, '\s+'),
      |      x -> x <> '') AS toks
      |  FROM documents),
      |m AS (SELECT doc_id AS id,
      |    CASE WHEN doc_id = 0 THEN NULL
      |      ELSE (doc_id - 1) // 2 END AS parent,
      |    CASE WHEN doc_id = 0 THEN 'system'
      |      WHEN doc_id % 2 = 1 THEN 'user'
      |      ELSE 'assistant' END AS role,
      |    COALESCE(array_to_string(list_slice(toks, 1, 6), ' '), '')
      |      AS txt
      |  FROM tt),
      |p AS (
      |  SELECT id, [id] AS path FROM m WHERE parent IS NULL
      |  UNION ALL
      |  SELECT c.id, list_append(p.path, c.id)
      |  FROM p JOIN m c ON c.parent = p.id),
      |lv AS (SELECT p.id, p.path FROM p
      |  WHERE p.id NOT IN (
      |    SELECT DISTINCT parent FROM m WHERE parent IS NOT NULL)),
      |ex2 AS (SELECT id AS path_id, len(path) AS n_turns,
      |    unnest(path) AS msg_id, generate_subscripts(path, 1) AS turn
      |  FROM lv)""".stripMargin

  /** The q_v35/q_v37 shared Spark-side fixture: the 5-arm synthetic
    * tool_call JSON over `events` audited against the 6-row declared
    * schema ([[graft.operators.Behavior.toolCallAudit]]'s verdict
    * relation). */
  private def toolCallAuditFixture(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val schema = Seq(
      ("search", "q", "string", true),
      ("search", "limit", "number", false),
      ("weather", "city", "string", true),
      ("weather", "days", "number", true),
      ("weather", "metric", "boolean", false),
      ("calc", "expr", "string", true))
      .toDF("tool", "arg", "arg_type", "required")
    val calls = Tables.events(s, d).select(col("event_id"),
      expr("""CASE CAST(event_id % 5 AS INT)
        WHEN 0 THEN concat('{"name":"search","arguments":{"q":"ev',
          CAST(event_id AS STRING), '"',
          CASE WHEN event_id % 3 = 0 THEN ',"limit":"three"'
            ELSE concat(',"limit":', CAST(event_id % 7 AS STRING)) END,
          '}}')
        WHEN 1 THEN concat('{"name":"weather","arguments":{"city":"c',
          CAST(event_id AS STRING), '"',
          CASE WHEN event_id % 2 = 0 THEN ''
            WHEN event_id % 16 = 1 THEN ',"days":null'
            ELSE concat(',"days":', CAST(event_id % 9 AS STRING)) END,
          CASE WHEN event_id % 4 = 1 THEN ',"metric":true' ELSE '' END,
          '}}')
        WHEN 2 THEN concat('{"name":"calc","arguments":{"expr":',
          CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS STRING)
            ELSE '"1+2"' END,
          CASE WHEN event_id % 4 = 2 THEN ',"opts":{"deep":1}'
            ELSE '' END,
          '}}')
        WHEN 3 THEN '{"name":"frobnicate","arguments":{"x":1}}'
        ELSE '{"name":"search' END""").as("call_json"))
    graft.operators.Behavior.toolCallAudit(calls, "event_id",
      "call_json", schema)
  }

  /** The q_v35 synthetic tool-call fixture + per-call verdict
    * machinery as oracle CTEs (sch/c/b/k/t/aj/agg/ms) — shared by
    * q_v35 (per-call relation) and q_v37 (per-tool monitor
    * roll-up). Stored UNSTRIPPED (margins intact): several lines
    * begin with the `||` concat operator, and a second stripMargin at
    * the interpolation site would eat their first pipe — the embedding
    * `s"""...""".stripMargin` strips exactly once. */
  private lazy val duckToolCallVerdicts: String =
    """WITH sch(tool, arg, ty, req) AS (VALUES
             |    ('search', 'q', 'string', true),
             |    ('search', 'limit', 'number', false),
             |    ('weather', 'city', 'string', true),
             |    ('weather', 'days', 'number', true),
             |    ('weather', 'metric', 'boolean', false),
             |    ('calc', 'expr', 'string', true)),
             |c AS (SELECT event_id,
             |    CASE CAST(event_id % 5 AS INT)
             |      WHEN 0 THEN '{"name":"search","arguments":{"q":"ev'
             |        || event_id || '"' ||
             |        CASE WHEN event_id % 3 = 0 THEN ',"limit":"three"'
             |          ELSE ',"limit":' || (event_id % 7) END || '}}'
             |      WHEN 1 THEN '{"name":"weather","arguments":{"city":"c'
             |        || event_id || '"' ||
             |        CASE WHEN event_id % 2 = 0 THEN ''
             |          WHEN event_id % 16 = 1 THEN ',"days":null'
             |          ELSE ',"days":' || (event_id % 9) END ||
             |        CASE WHEN event_id % 4 = 1 THEN ',"metric":true'
             |          ELSE '' END || '}}'
             |      WHEN 2 THEN '{"name":"calc","arguments":{"expr":' ||
             |        CASE WHEN event_id % 2 = 0 THEN CAST(event_id AS VARCHAR)
             |          ELSE '"1+2"' END ||
             |        CASE WHEN event_id % 4 = 2 THEN ',"opts":{"deep":1}'
             |          ELSE '' END || '}}'
             |      WHEN 3 THEN '{"name":"frobnicate","arguments":{"x":1}}'
             |      ELSE '{"name":"search' END AS j
             |  FROM events),
             |b AS (SELECT event_id, j,
             |    CASE WHEN json_valid(j)
             |      THEN json_extract_string(j, '$.name') END AS tool,
             |    (NOT json_valid(j))
             |      OR (CASE WHEN json_valid(j)
             |        THEN json_extract_string(j, '$.name') END) IS NULL
             |      OR (CASE WHEN json_valid(j)
             |        THEN json_type(j, '$.arguments') END) <> 'OBJECT'
             |      AS bad
             |  FROM c),
             |k AS (SELECT b.event_id, b.tool, b.j,
             |    unnest(json_keys(b.j, '$.arguments')) AS arg,
             |    b.tool IN (SELECT tool FROM sch) AS kn
             |  FROM b WHERE NOT b.bad),
             |t AS (SELECT event_id, tool, arg, kn,
             |    -- dynamic-path json_type yields SQL NULL for a JSON
             |    -- null (constant paths yield 'NULL'); the key is from
             |    -- json_keys so it exists, and SQL NULL here IS json null
             |    CASE COALESCE(json_type(j, '$.arguments.' || arg), 'NULL')
             |      WHEN 'VARCHAR' THEN 'string'
             |      WHEN 'BOOLEAN' THEN 'boolean'
             |      WHEN 'NULL' THEN 'null'
             |      WHEN 'OBJECT' THEN 'object'
             |      WHEN 'ARRAY' THEN 'array'
             |      ELSE 'number' END AS cls
             |  FROM k),
             |aj AS (SELECT t.event_id, t.arg, t.kn, t.cls, s.ty
             |  FROM t LEFT JOIN sch s
             |    ON s.tool = t.tool AND s.arg = t.arg),
             |agg AS (SELECT event_id,
             |    CAST(COUNT(arg) AS BIGINT) AS n_args,
             |    CAST(COUNT(CASE WHEN kn AND ty IS NOT NULL
             |      AND cls <> ty THEN 1 END) AS BIGINT) AS n_mm,
             |    COALESCE(string_agg(CASE WHEN kn AND ty IS NOT NULL
             |      AND cls <> ty THEN arg END, '|' ORDER BY arg), '')
             |      AS mm,
             |    CAST(COUNT(CASE WHEN kn AND ty IS NULL THEN 1 END)
             |      AS BIGINT) AS n_ex,
             |    COALESCE(string_agg(CASE WHEN kn AND ty IS NULL
             |      THEN arg END, '|' ORDER BY arg), '') AS ex
             |  FROM aj GROUP BY 1),
             |ms AS (SELECT b.event_id,
             |    CAST(COUNT(*) AS BIGINT) AS n_missing,
             |    string_agg(s.arg, '|' ORDER BY s.arg) AS missing
             |  FROM b JOIN sch s ON s.tool = b.tool AND s.req
             |  LEFT JOIN k ON k.event_id = b.event_id AND k.arg = s.arg
             |  WHERE NOT b.bad AND k.arg IS NULL
             |  GROUP BY 1)"""

  /** One unrolled Bradley-Terry MM iteration (oracle side): terms at
    * Scale=1e9 from the previous strengths, per-candidate denominators,
    * the update, then renormalization to n_candidates x 1e6 with the
    * 1-micro floor — the half-up `(2a+b)//(2b)` idiom throughout,
    * HUGEINT so the exact integers never overflow. */
  private def duckBtIteration(k: Int): String = {
    val prev = if (k == 1) "s0" else s"s${k - 1}"
    s"""t$k AS MATERIALIZED (SELECT g.a, g.b,
       |    (2 * CAST(g.n AS HUGEINT) * 1000000000 + (sa.s + sb.s))
       |      // (2 * (sa.s + sb.s)) AS t
       |  FROM g JOIN $prev sa ON sa.candidate = g.a
       |  JOIN $prev sb ON sb.candidate = g.b),
       |d$k AS (SELECT candidate, SUM(t) AS d FROM
       |    (SELECT a AS candidate, t FROM t$k
       |     UNION ALL SELECT b, t FROM t$k)
       |  GROUP BY 1),
       |u$k AS MATERIALIZED (SELECT w.candidate,
       |    (2 * CAST(w.n_wins AS HUGEINT) * 1000000000 + d.d)
       |      // (2 * d.d) AS sn
       |  FROM w JOIN d$k d USING (candidate)),
       |s$k AS MATERIALIZED (SELECT u$k.candidate,
       |    GREATEST(CAST(1 AS HUGEINT),
       |      (2 * sn * nc.n * 1000000 + tot.t) // (2 * tot.t)) AS s
       |  FROM u$k, (SELECT SUM(sn) AS t FROM u$k) tot, nc)""".stripMargin
  }

  /** One unrolled Plackett-Luce MM iteration (oracle side): per-list
    * suffix strength sums (the stage pools), stage terms 1e9/D half-up,
    * per-candidate prefix accumulation over the stages it sits in, the
    * update, then the shared renormalization tail — the
    * [[duckBtIteration]] discipline at the listwise grain. Lists in the
    * q_e41 fixture are all length 3, so "rank < 3" is the
    * last-place-is-no-contest cutoff. */
  private def duckPlIteration(k: Int): String = {
    val prev = if (k == 1) "ps0" else s"ps${k - 1}"
    s"""pdd$k AS (SELECT r.list, r.rnk, r.cand,
       |    SUM(p.s) OVER (PARTITION BY r.list ORDER BY r.rnk DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dd
       |  FROM rk r JOIN $prev p USING (cand)),
       |pt$k AS (SELECT list, rnk, cand,
       |    CASE WHEN rnk < 3 THEN
       |      (2 * CAST(1000000000 AS HUGEINT) + dd) // (2 * dd)
       |      ELSE CAST(0 AS HUGEINT) END AS t
       |  FROM pdd$k),
       |pct$k AS (SELECT cand,
       |    SUM(t) OVER (PARTITION BY list ORDER BY rnk
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct
       |  FROM pt$k),
       |pd$k AS (SELECT cand, SUM(ct) AS d FROM pct$k GROUP BY 1),
       |pu$k AS MATERIALIZED (SELECT pw.cand,
       |    (2 * CAST(pw.wn AS HUGEINT) * 1000000000 + d.d)
       |      // (2 * d.d) AS sn
       |  FROM pw JOIN pd$k d USING (cand)),
       |ps$k AS MATERIALIZED (SELECT pu$k.cand,
       |    GREATEST(CAST(1 AS HUGEINT),
       |      (2 * sn * pnc.n * 1000000 + tot.t) // (2 * tot.t)) AS s
       |  FROM pu$k, (SELECT SUM(sn) AS t FROM pu$k) tot, pnc)""".stripMargin
  }

  override def queries: Seq[Q] = Seq(

    // ---- E1: tumbling 1-hour window ------------------------------------
    Q("q_e1_tumbling_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .select(col("window.start").as("win_start"), col("event_type"),
          col("n"), col("sum_value")),
      Some("""SELECT date_trunc('hour', ts) AS win_start, event_type,
             |  COUNT(*) AS n,
             |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // ---- E2: sliding 10-min window, 5-min slide -------------------------
    Q("q_e2_sliding_window",
      (s, d) => Tables.events(s, d)
        .groupBy(window(col("ts"), "600 seconds", "300 seconds"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("win_start"), col("n")),
      Some("""WITH starts AS (
             |  SELECT event_id,
             |    unnest([make_timestamp((epoch_us(ts) // 300000000) * 300000000),
             |            make_timestamp((epoch_us(ts) // 300000000) * 300000000 - 300000000)]) AS win_start
             |  FROM events)
             |SELECT win_start, COUNT(*) AS n FROM starts GROUP BY 1""".stripMargin)),

    // ---- E3: session windows (30-min gap) as gaps-and-islands -----------
    // The batch query runs the STREAMING operator itself (q_e7
    // discipline): sessionCounts' watermark is a no-op on a batch frame,
    // so the oracle pins exactly the semantics the stream executes
    // incrementally (EventStreamsSpec proves incremental == batch).
    Q("q_e3_session_windows",
      (s, d) => graft.streaming.EventStreams.sessionCounts(Tables.events(s, d)),
      Some("""WITH o AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |g AS (
             |  SELECT user_id, ts,
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS UNBOUNDED PRECEDING) AS sid
             |  FROM o)
             |SELECT user_id, min(ts) AS session_start,
             |  max(ts) + INTERVAL 30 MINUTE AS session_end,
             |  COUNT(*) AS n_events
             |FROM g GROUP BY user_id, sid""".stripMargin)),

    // ---- E7: stream-static dimension enrichment --------------------------
    // Runs the STREAMING operator itself on the batch frame (withWatermark
    // is a no-op in batch), so the oracle pins exactly the code the stream
    // executes incrementally; EventStreamsSpec asserts stream == batch.
    Q("q_e7_dim_enrichment",
      (s, d) => graft.streaming.EventStreams.enrichedSegmentCounts(
        Tables.events(s, d),
        graft.streaming.EventStreams.segmentDim(Tables.customer(s, d))),
      Some("""SELECT date_trunc('hour', e.ts) AS win_start,
             |  c.c_mktsegment AS segment, COUNT(*) AS n,
             |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
             |FROM events e JOIN customer c ON c.c_custkey = e.user_id
             |GROUP BY 1, 2""".stripMargin)),

    // ---- E8: LOCF resampling onto a uniform per-user hourly grid --------
    // Grid generation + the native as-of join composed into the pandas
    // resample().ffill() shape; the oracle replays boundary arithmetic,
    // the grid, and the latest-at-or-before match.
    Q("q_e8_resample_locf",
      (s, d) => graft.operators.Resample.fillForward(
        Tables.events(s, d), "user_id", "ts", "value",
        stepMicros = 3600000000L),
      Some("""WITH o AS (
             |  SELECT user_id, ts, MAX(value) AS value
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS e0, MAX(epoch_us(ts)) AS e1
             |  FROM o GROUP BY 1),
             |g AS (
             |  SELECT user_id,
             |    unnest(range(e0 + (3600000000 - e0 % 3600000000) % 3600000000,
             |                 e1 + 1, 3600000000)) AS ge
             |  FROM b),
             |j AS (
             |  SELECT g.user_id, g.ge, MAX(epoch_us(o.ts)) AS oe
             |  FROM g JOIN o ON o.user_id = g.user_id AND epoch_us(o.ts) <= g.ge
             |  GROUP BY 1, 2)
             |SELECT j.user_id, make_timestamp(j.ge) AS grid_ts,
             |  make_timestamp(j.oe) AS last_obs_ts, o.value
             |FROM j JOIN o ON o.user_id = j.user_id AND epoch_us(o.ts) = j.oe""".stripMargin)),

    // ---- E11: linear-interpolation resampling ----------------------------
    // Both as-of directions composed: backward bracket from the LOCF
    // path, forward bracket via forward=true; the oracle replays the
    // grid, both brackets, and the interpolation arithmetic shape.
    Q("q_e11_resample_interp",
      (s, d) => graft.operators.Resample.interpolate(
        Tables.events(s, d), "user_id", "ts", "value",
        stepMicros = 3600000000L),
      Some("""WITH o AS (
             |  SELECT user_id, ts, MAX(value) AS value
             |  FROM events GROUP BY 1, 2),
             |b AS (
             |  SELECT user_id, MIN(epoch_us(ts)) AS e0, MAX(epoch_us(ts)) AS e1
             |  FROM o GROUP BY 1),
             |g AS (
             |  SELECT user_id,
             |    unnest(range(e0 + (3600000000 - e0 % 3600000000) % 3600000000,
             |                 e1 + 1, 3600000000)) AS ge
             |  FROM b),
             |jp AS (
             |  SELECT g.user_id, g.ge, MAX(epoch_us(o.ts)) AS pe
             |  FROM g JOIN o ON o.user_id = g.user_id AND epoch_us(o.ts) <= g.ge
             |  GROUP BY 1, 2),
             |jn AS (
             |  SELECT g.user_id, g.ge, MIN(epoch_us(o.ts)) AS ne
             |  FROM g JOIN o ON o.user_id = g.user_id AND epoch_us(o.ts) >= g.ge
             |  GROUP BY 1, 2)
             |SELECT jp.user_id, make_timestamp(jp.ge) AS grid_ts,
             |  make_timestamp(jp.pe) AS prev_ts, make_timestamp(jn.ne) AS next_ts,
             |  CASE WHEN jn.ne = jp.pe THEN op.value
             |       ELSE ROUND(op.value + (onx.value - op.value) *
             |         (CAST(jp.ge - jp.pe AS DOUBLE) / CAST(jn.ne - jp.pe AS DOUBLE)), 6)
             |  END AS value
             |FROM jp
             |JOIN jn ON jn.user_id = jp.user_id AND jn.ge = jp.ge
             |JOIN o op ON op.user_id = jp.user_id AND epoch_us(op.ts) = jp.pe
             |JOIN o onx ON onx.user_id = jp.user_id AND epoch_us(onx.ts) = jn.ne""".stripMargin)),

    // ---- E12: trailing time-range moving average -------------------------
    // RANGE frame on epoch micros (engine-independent boundaries); the
    // windowed sum rides DECIMAL(18,2) so frame-evaluation order
    // (segment tree vs re-scan) can't perturb the float result.
    Q("q_e12_moving_avg",
      (s, d) => graft.operators.Resample.trailingAgg(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("value")),
        "user_id", "ts", "value", windowMicros = 600000000L),
      Some("""SELECT user_id, ts, value,
             |  COUNT(*) OVER w AS n_win,
             |  CASE WHEN COUNT(value) OVER w > 0 THEN
             |    ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             |      / COUNT(value) OVER w, 4) END AS avg_win
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |  RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // ---- E9: per-key z-score anomaly flagging ----------------------------
    // agg + broadcast-join (never a per-key window sort over the stream);
    // moments and z round to 6 dp so both engines agree bit-for-bit.
    // The oracle join is null-safe (IS NOT DISTINCT FROM) to pin the
    // operator's null-key cohort semantics even though the fixture has
    // no null user_id: GROUP BY aggregates nulls as one group, and the
    // null-safe join reattaches that group's moments.
    // ---- E20: Tukey-fence outlier flags (the robust complement) ---------
    // q_e9's z-scores drift when the outliers themselves fatten the
    // stddev; quartile fences don't. Same two-pass shape, per-event-type
    // cohorts, exact interpolated quartiles replayed in the oracle.
    Q("q_e20_tukey",
      (s, d) => graft.operators.Anomaly.tukeyFences(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          col("value")),
        "event_type", "value"),
      Some("""WITH q AS (
             |  SELECT event_type,
             |    ROUND(quantile_cont(value, 0.25), 6) AS q1,
             |    ROUND(quantile_cont(value, 0.75), 6) AS q3
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |  COALESCE(
             |    e.value < ROUND(q.q1 - 1.5 * (q.q3 - q.q1), 6) OR
             |    e.value > ROUND(q.q3 + 1.5 * (q.q3 - q.q1), 6),
             |    FALSE) AS is_anomaly
             |FROM events e LEFT JOIN q
             |  ON e.event_type IS NOT DISTINCT FROM q.event_type""".stripMargin)),

    // ---- E31: median/MAD robust z-score (the outlier trio's third) ------
    // rz = 0.6745*(x - median)/MAD per event-type cohort — robust like
    // the fences, interpretable like the z. Zero-MAD cohorts flag
    // off-median values with an honestly-NULL score. The oracle replays
    // both percentile passes and the rounded score.
    Q("q_e31_robust_z",
      (s, d) => graft.operators.Anomaly.robustZ(
        Tables.events(s, d).select(col("event_id"), col("event_type"),
          col("value")),
        "event_type", "value"),
      Some("""WITH m AS (SELECT event_type,
             |    ROUND(quantile_cont(value, 0.5), 6) AS med
             |  FROM events GROUP BY 1),
             |md AS (SELECT e.event_type,
             |    ROUND(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
             |  FROM events e JOIN m
             |    ON e.event_type IS NOT DISTINCT FROM m.event_type
             |  GROUP BY 1)
             |SELECT e.event_id, e.event_type, e.value,
             |  CASE WHEN md.mad > 0 THEN
             |    ROUND(0.6745 * (e.value - m.med) / md.mad, 6) END AS rz,
             |  CASE WHEN e.value IS NULL THEN false
             |    WHEN md.mad > 0 THEN COALESCE(
             |      abs(ROUND(0.6745 * (e.value - m.med) / md.mad, 6)) > 3.5,
             |      false)
             |    ELSE COALESCE(ROUND(e.value, 6) <> m.med, false) END
             |    AS is_anomaly
             |FROM events e
             |LEFT JOIN m ON e.event_type IS NOT DISTINCT FROM m.event_type
             |LEFT JOIN md ON e.event_type IS NOT DISTINCT FROM md.event_type"""
        .stripMargin)),

    // ---- E21: last-touch attribution (as-of join, lookback-bounded) -----
    // Every purchase attributes to the user's latest click/view at-or-
    // before it within 7 days — the native as-of join exec with
    // tolerance as the lookback; organic purchases keep NULL channel.
    // The oracle replays the match as a correlated MAX + equi-join back.
    Q("q_e21_attribution",
      (s, d) => graft.operators.Behavior.lastTouch(Tables.events(s, d),
        convType = "purchase", touchTypes = Seq("click", "view"),
        lookbackMicros = 7L * 86400L * 1000000L),
      Some("""WITH tch AS (
             |  SELECT user_id, ts, MAX(event_type) AS channel
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL
             |  GROUP BY 1, 2),
             |cv AS (
             |  SELECT event_id, user_id, ts AS conv_ts, value FROM events
             |  WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |m AS (
             |  SELECT c.event_id, c.user_id, c.conv_ts, c.value,
             |    (SELECT MAX(t.ts) FROM tch t
             |     WHERE t.user_id = c.user_id AND t.ts <= c.conv_ts
             |       AND t.ts >= c.conv_ts - INTERVAL 7 DAY) AS touch_ts
             |  FROM cv c)
             |SELECT m.event_id, m.user_id, m.conv_ts, m.touch_ts,
             |  t.channel, m.value
             |FROM m LEFT JOIN tch t
             |  ON t.user_id = m.user_id AND t.ts = m.touch_ts""".stripMargin)),

    // ---- E22: linear multi-touch attribution (integer-micro credit) -----
    // Every in-window touch shares the purchase's credit equally per
    // channel; credit_m = nc*1e6 div n (pure integral division — exact
    // replay); organic purchases carry the full 1e6 on a NULL channel.
    Q("q_e22_linear_attribution",
      (s, d) => graft.operators.Behavior.linearAttribution(
        Tables.events(s, d), convType = "purchase",
        touchTypes = Seq("click", "view"),
        lookbackMicros = 7L * 86400L * 1000000L),
      Some("""WITH cv AS (
             |  SELECT event_id, user_id, ts AS conv_ts FROM events
             |  WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |tch AS (
             |  SELECT user_id, ts AS touch_ts, event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |j AS (
             |  SELECT c.event_id, c.user_id, c.conv_ts, t.channel
             |  FROM cv c JOIN tch t ON t.user_id = c.user_id
             |    AND t.touch_ts <= c.conv_ts
             |    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
             |n AS (SELECT event_id, COUNT(*) AS n FROM j GROUP BY 1),
             |cr AS (SELECT event_id, user_id, conv_ts, channel,
             |    COUNT(*) AS nc
             |  FROM j GROUP BY 1, 2, 3, 4)
             |SELECT cr.event_id, cr.user_id, cr.conv_ts, cr.channel,
             |  CAST(cr.nc * 1000000 // n.n AS BIGINT) AS credit_m
             |FROM cr JOIN n USING (event_id)
             |UNION ALL
             |SELECT c.event_id, c.user_id, c.conv_ts,
             |  CAST(NULL AS VARCHAR) AS channel,
             |  CAST(1000000 AS BIGINT) AS credit_m
             |FROM cv c WHERE NOT EXISTS (
             |  SELECT 1 FROM j WHERE j.event_id = c.event_id)""".stripMargin)),

    // ---- E24: time-decay attribution (quantized half-life weights) ------
    // w = 1e6 div 2^(age div 1day) — pure integer shift+division, exact
    // in both engines; per-channel credit = channel_w * 1e6 div total_w;
    // organic keeps 1e6 on NULL.
    // ---- E27: RFM segmentation (recency/frequency/monetary grid) ---------
    // Per buyer: latest-purchase micros, purchase count, exact DECIMAL
    // spend; each scored 1..5 by equi-depth percentile cuts (broadcast +
    // map-only compare — no corpus-wide ntile window), composed into the
    // r*100+f*10+m segment code.
    // ---- E30: dialog-format audit (chat-training-data QA) ---------------
    // Each user's event stream audited as a conversation: click/view map
    // to 'user' turns, purchase to 'assistant', anything else is alien.
    // Null-ts turns can't be placed in the alternation order, so they're
    // excluded from the ordered checks but counted (n_null_ts) and fail
    // the verdict. The oracle replays the (ts, event_id) ordering, the
    // lag-based alternation count, the null-ts outer join, and the
    // composed verdict.
    Q("q_e30_dialog_audit",
      (s, d) => graft.operators.Behavior.dialogAudit(
        Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type").isin("click", "view"), "user")
              .when(col("event_type") === "purchase", "assistant")
              .otherwise("other").as("role")),
        "user_id", "ts", "event_id", "role"),
      Some("""WITH b AS (SELECT user_id, ts, event_id,
             |    CASE WHEN event_type IN ('click', 'view') THEN 'user'
             |      WHEN event_type = 'purchase' THEN 'assistant'
             |      ELSE 'other' END AS role
             |  FROM events WHERE user_id IS NOT NULL),
             |o AS (SELECT user_id, role,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS rn,
             |    lag(role) OVER (PARTITION BY user_id
             |      ORDER BY ts, event_id) AS prev
             |  FROM b WHERE ts IS NOT NULL),
             |a AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
             |    MAX(CASE WHEN rn = 1 THEN role END) AS first_role,
             |    MAX(CASE WHEN rn = mx THEN role END) AS last_role,
             |    CAST(COUNT(CASE WHEN prev = role THEN 1 END) AS BIGINT)
             |      AS n_violations,
             |    CAST(COUNT(CASE WHEN role NOT IN ('user', 'assistant')
             |      THEN 1 END) AS BIGINT) AS n_alien_roles
             |  FROM (SELECT *, MAX(rn) OVER (PARTITION BY user_id) AS mx
             |        FROM o)
             |  GROUP BY 1),
             |nt AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_null_ts
             |  FROM b WHERE ts IS NULL GROUP BY 1)
             |SELECT COALESCE(a.user_id, nt.user_id) AS user_id,
             |  COALESCE(n_turns, 0) AS n_turns, first_role, last_role,
             |  COALESCE(n_violations, 0) AS n_violations,
             |  COALESCE(n_alien_roles, 0) AS n_alien_roles,
             |  COALESCE(n_null_ts, 0) AS n_null_ts,
             |  COALESCE(first_role = 'user', false)
             |    AND COALESCE(last_role = 'assistant', false)
             |    AND COALESCE(n_violations, 0) = 0
             |    AND COALESCE(n_alien_roles, 0) = 0
             |    AND COALESCE(n_null_ts, 0) = 0 AS well_formed
             |FROM a FULL OUTER JOIN nt ON a.user_id = nt.user_id"""
        .stripMargin)),

    // ---- E32: SFT pair extraction (conversation -> training examples) ---
    // The dialogAudit handoff: each user's gated event stream (the
    // q_e30 role mapping, null user/ts filtered — the operator REFUSES
    // unplaceable turns in-plan) emits one (context, response) pair per
    // assistant turn, context = prior turns rendered 'role: text' in
    // (ts, event_id) order. The oracle replays the rendering and the
    // unbounded-preceding-to-1-preceding window agg.
    Q("q_e32_sft_pairs",
      (s, d) => graft.operators.Behavior.sftPairs(
        Tables.events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type").isin("click", "view"), "user")
              .when(col("event_type") === "purchase", "assistant")
              .otherwise(lit("other")).as("role"),
            concat(col("event_type"), lit("-"),
              (col("event_id") % 100).cast("string")).as("txt")),
        "user_id", "ts", "event_id", "role", "txt"),
      Some("""WITH r AS (SELECT user_id, ts, event_id,
             |    CASE WHEN event_type IN ('click', 'view') THEN 'user'
             |      WHEN event_type = 'purchase' THEN 'assistant'
             |      ELSE 'other' END AS role,
             |    event_type || '-' || CAST(event_id % 100 AS VARCHAR)
             |      AS txt
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
             |o AS (SELECT user_id, event_id, role, txt,
             |    COALESCE(string_agg(role || ': ' || txt, chr(10)) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), '')
             |      AS context,
             |    CAST(COUNT(*) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS BIGINT) AS n_context_turns
             |  FROM r)
             |SELECT user_id, event_id, n_context_turns, context,
             |  txt AS response
             |FROM o WHERE role = 'assistant'""".stripMargin)),

    // ---- E33: chat-template rendering (conversation -> training string) -
    // The q_e32 fixture rendered ChatML-style: one string per user with
    // every turn wrapped and ordered by (ts, event_id). The oracle
    // replays the wrapping and the ordered aggregation.
    Q("q_e33_chat_template",
      (s, d) => graft.operators.Behavior.renderChatTemplate(
        Tables.events(s, d)
          .filter(col("user_id").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), col("ts"), col("event_id"),
            when(col("event_type").isin("click", "view"), "user")
              .when(col("event_type") === "purchase", "assistant")
              .otherwise(lit("other")).as("role"),
            concat(col("event_type"), lit("-"),
              (col("event_id") % 100).cast("string")).as("txt")),
        "user_id", "ts", "event_id", "role", "txt"),
      Some("""WITH r AS (SELECT user_id, ts, event_id,
             |    '<|im_start|>' ||
             |    CASE WHEN event_type IN ('click', 'view') THEN 'user'
             |      WHEN event_type = 'purchase' THEN 'assistant'
             |      ELSE 'other' END || chr(10) ||
             |    event_type || '-' || CAST(event_id % 100 AS VARCHAR) ||
             |    '<|im_end|>' AS turn
             |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
             |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
             |  string_agg(turn, chr(10) ORDER BY ts, event_id) AS rendered
             |FROM r GROUP BY 1""".stripMargin)),

    // ---- E34: DPO preference-pair dataset construction -------------------
    // The votes -> training-set last mile over the q_e28 synthesis WITH a
    // prompt dimension: 5 prompts x 6 candidates, base direction the
    // rotational tournament ((m2-m1) mod 6 in 1..2 — cyclic, so real
    // triangles exist to flag), 20% rater noise. dpoPairs takes the
    // majority per (prompt, unordered pair), EXCLUDES exact ties, gates
    // margin >= 2, and FLAGS (not drops — excludeCycles=false so the
    // flag itself is oracle-checked) pairs on a majority-tournament
    // 3-cycle; dpoTrainingStrings then renders both sides as two-turn
    // ChatML THROUGH renderChatTemplate. ONE oracle replays counts,
    // majority, gate, triangles, and the rendered strings.
    Q("q_e34_dpo_pairs",
      (s, d) => {
        val prefs = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select((col("event_id") % 5).as("prompt_id"),
            expr("(event_id div 5) % 6").as("m1"),
            expr("(event_id div 30) % 6").as("m2"), col("user_id"))
          .filter(col("m1") =!= col("m2"))
          .select(col("prompt_id"),
            when(expr("((m2 - m1) + 6) % 6 between 1 and 2") =!=
              (col("user_id") % 5 === 0), col("m1")).otherwise(col("m2"))
              .as("winner"),
            when(expr("((m2 - m1) + 6) % 6 between 1 and 2") =!=
              (col("user_id") % 5 === 0), col("m2")).otherwise(col("m1"))
              .as("loser"))
        val pairs = graft.operators.Preferences.dpoPairs(prefs,
          "prompt_id", "winner", "loser", minMargin = 2L,
          excludeCycles = false)
        val prompts = prefs.select(col("prompt_id")).distinct()
          .select(col("prompt_id"),
            concat(lit("prompt-"), col("prompt_id")).as("ptext"))
        val responses = prefs.select(col("winner").as("rid"))
          .unionAll(prefs.select(col("loser").as("rid"))).distinct()
          .select(col("rid"), concat(lit("resp-"), col("rid")).as("rtext"))
        graft.operators.Preferences.dpoTrainingStrings(pairs,
          "prompt_id", prompts, "ptext", responses, "rid", "rtext")
      },
      Some("""WITH pr AS (
             |  SELECT prompt_id,
             |    CASE WHEN win1 THEN m1 ELSE m2 END AS winner,
             |    CASE WHEN win1 THEN m2 ELSE m1 END AS loser
             |  FROM (SELECT event_id % 5 AS prompt_id, m1, m2,
             |      (((m2 - m1) + 6) % 6 BETWEEN 1 AND 2)
             |        <> (user_id % 5 = 0) AS win1
             |    FROM (SELECT event_id, (event_id // 5) % 6 AS m1,
             |        (event_id // 30) % 6 AS m2, user_id
             |      FROM events WHERE user_id IS NOT NULL)
             |    WHERE m1 <> m2)),
             |p AS (SELECT prompt_id, LEAST(winner, loser) AS a,
             |    GREATEST(winner, loser) AS b,
             |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw
             |  FROM pr),
             |pc AS (SELECT prompt_id, a, b, SUM(aw) AS wab,
             |    COUNT(*) - SUM(aw) AS wba
             |  FROM p GROUP BY 1, 2, 3),
             |mj AS (SELECT prompt_id,
             |    CASE WHEN wab > wba THEN a ELSE b END AS chosen_id,
             |    CASE WHEN wab > wba THEN b ELSE a END AS rejected_id,
             |    GREATEST(wab, wba) AS nf, LEAST(wab, wba) AS na
             |  FROM pc WHERE wab <> wba),
             |cyc AS (SELECT DISTINCT e1.prompt_id AS prompt_id,
             |    e1.chosen_id AS chosen_id, e1.rejected_id AS rejected_id
             |  FROM mj e1
             |  JOIN mj e2 ON e1.prompt_id = e2.prompt_id
             |    AND e1.rejected_id = e2.chosen_id
             |  JOIN mj e3 ON e2.prompt_id = e3.prompt_id
             |    AND e2.rejected_id = e3.chosen_id
             |    AND e3.rejected_id = e1.chosen_id)
             |SELECT m.prompt_id, m.chosen_id, m.rejected_id,
             |  CAST(m.nf AS BIGINT) AS n_for,
             |  CAST(m.na AS BIGINT) AS n_against,
             |  CAST(m.nf - m.na AS BIGINT) AS margin,
             |  (c.chosen_id IS NOT NULL) AS in_cycle,
             |  '<|im_start|>user' || chr(10) || 'prompt-' ||
             |    CAST(m.prompt_id AS VARCHAR) || '<|im_end|>' || chr(10) ||
             |    '<|im_start|>assistant' || chr(10) || 'resp-' ||
             |    CAST(m.chosen_id AS VARCHAR) || '<|im_end|>' AS chosen,
             |  '<|im_start|>user' || chr(10) || 'prompt-' ||
             |    CAST(m.prompt_id AS VARCHAR) || '<|im_end|>' || chr(10) ||
             |    '<|im_start|>assistant' || chr(10) || 'resp-' ||
             |    CAST(m.rejected_id AS VARCHAR) || '<|im_end|>' AS rejected
             |FROM mj m LEFT JOIN cyc c ON c.prompt_id = m.prompt_id
             |  AND c.chosen_id = m.chosen_id
             |  AND c.rejected_id = m.rejected_id
             |WHERE m.nf - m.na >= 2""".stripMargin)),

    // ---- E35: Bradley-Terry strength fitting (MM, exact micros) ---------
    // The MLE rung over the q_e28 synthesis: 8 candidates, rotational
    // tournament + 20% noise (every candidate wins often, so the Ford
    // guard stays quiet). Five MM iterations in integer micros at
    // Scale=1e9; the oracle UNROLLS the recursion — five generated CTE
    // blocks replaying terms, denominators, update, renormalization
    // bit-for-bit in HUGEINT.
    Q("q_e35_bradley_terry",
      (s, d) => {
        val prefs = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select((col("event_id") % 8).as("m1"),
            expr("(event_id div 8) % 8").as("m2"), col("user_id"))
          .filter(col("m1") =!= col("m2"))
          .select(
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m1")).otherwise(col("m2"))
              .as("winner"),
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m2")).otherwise(col("m1"))
              .as("loser"))
        graft.operators.Preferences.bradleyTerry(prefs, "winner", "loser")
      },
      Some(s"""WITH $duckPrefPairCtes,
              |g AS MATERIALIZED (SELECT a, b, wab + wba AS n FROM pc),
              |w AS MATERIALIZED (SELECT candidate, SUM(wn) AS n_wins,
              |    SUM(ng) AS n_games
              |  FROM (SELECT a AS candidate, wab AS wn, wab + wba AS ng
              |      FROM pc
              |    UNION ALL SELECT b, wba, wab + wba FROM pc)
              |  GROUP BY 1),
              |nc AS MATERIALIZED (SELECT COUNT(*) AS n FROM w),
              |s0 AS MATERIALIZED (SELECT candidate,
              |    CAST(1000000 AS HUGEINT) AS s FROM w),
              |${(1 to 5).map(duckBtIteration).mkString(",\n")}
              |SELECT w.candidate, CAST(w.n_wins AS BIGINT) AS n_wins,
              |  CAST(w.n_games AS BIGINT) AS n_games,
              |  CAST(s5.s AS BIGINT) AS strength_micro
              |FROM w JOIN s5 USING (candidate)""".stripMargin)),

    // ---- E41: Plackett-Luce listwise fitting (MM, exact micros) ----------
    // The LISTWISE rung over a k-way ranking synthesis: each event emits
    // a 3-way ranking over 6 candidates (the distinct triple derived
    // from event_id digits, sorted ascending = the planted strength
    // order; 20% of raters reverse their list — the q_e35 noise shape,
    // keeping every candidate's stage wins positive so the Ford guard
    // stays quiet). Five MM iterations in integer micros at Scale=1e9;
    // the oracle unrolls the recursion at the LIST grain (per-pattern
    // vs per-list rounding is identical — same stage pools, same
    // half-up terms) — suffix pools, stage terms, prefix accumulation,
    // renormalization, bit-for-bit in HUGEINT.
    Q("q_e41_plackett_luce",
      (s, d) => {
        val tri = Tables.events(s, d).filter(col("user_id").isNotNull)
          .select(col("event_id"), (col("user_id") % 5 === 0).as("noise"),
            (col("event_id") % 6).as("x1"),
            expr("(event_id div 6) % 6").as("x2"),
            expr("(event_id div 36) % 6").as("x3"))
          .filter(col("x1") =!= col("x2") && col("x1") =!= col("x3") &&
            col("x2") =!= col("x3"))
          .select(col("event_id"),
            when(col("noise"),
              reverse(array_sort(array(col("x1"), col("x2"), col("x3")))))
              .otherwise(array_sort(array(col("x1"), col("x2"), col("x3"))))
              .as("lst"))
          .select(col("event_id").as("list"),
            posexplode(col("lst")).as(Seq("p", "cand")))
          .select(col("list"), col("cand"), (col("p") + 1).as("rank"))
        graft.operators.Preferences.plackettLuce(tri, "list", "cand",
          "rank")
      },
      Some(s"""WITH rk AS MATERIALIZED (
              |  SELECT list, CAST(c AS VARCHAR) AS cand, rnk FROM (
              |    SELECT event_id AS list,
              |      unnest(CASE WHEN user_id % 5 = 0 THEN list_reverse(ls)
              |        ELSE ls END) AS c,
              |      unnest(range(1, 4)) AS rnk
              |    FROM (SELECT event_id, user_id,
              |        list_sort([event_id % 6, (event_id // 6) % 6,
              |          (event_id // 36) % 6]) AS ls
              |      FROM events WHERE user_id IS NOT NULL
              |        AND event_id % 6 <> (event_id // 6) % 6
              |        AND event_id % 6 <> (event_id // 36) % 6
              |        AND (event_id // 6) % 6 <> (event_id // 36) % 6))),
              |pw AS MATERIALIZED (SELECT cand,
              |    SUM(CASE WHEN rnk < 3 THEN 1 ELSE 0 END) AS wn,
              |    COUNT(*) AS nl
              |  FROM rk GROUP BY 1),
              |pnc AS MATERIALIZED (SELECT COUNT(*) AS n FROM pw),
              |ps0 AS MATERIALIZED (SELECT cand,
              |    CAST(1000000 AS HUGEINT) AS s FROM pw),
              |${(1 to 5).map(duckPlIteration).mkString(",\n")}
              |SELECT pw.cand AS candidate, CAST(pw.wn AS BIGINT) AS n_wins,
              |  CAST(pw.nl AS BIGINT) AS n_lists,
              |  CAST(ps5.s AS BIGINT) AS strength_micro
              |FROM pw JOIN ps5 USING (cand)""".stripMargin)),

    // ---- E42: group-relative advantage (the GRPO/RLOO data shape) --------
    // Per prompt (event_id % 40), each sampled response's SIGNED
    // planted reward centers and scales by its own group's stats —
    // exact integer sums, sign-split half-up mean, the one sqrt under
    // the 6-dp discipline. The oracle replays sums, mean, std, and the
    // normalized advantage with the identical double expression.
    Q("q_e42_group_advantage",
      (s, d) => graft.operators.Preferences.groupAdvantage(
        Tables.events(s, d).select((col("event_id") % 40).as("prompt"),
          col("event_id").as("resp"),
          (((col("event_id") * 7919) % 2001) - 1000).as("reward")),
        "prompt", "resp", "reward"),
      Some("""WITH s AS (SELECT event_id % 40 AS prompt,
             |    event_id AS resp,
             |    ((event_id * 7919) % 2001) - 1000 AS r
             |  FROM events),
             |st AS (SELECT prompt, COUNT(*) AS n, SUM(r) AS sr,
             |    SUM(CAST(r AS HUGEINT) * r) AS srr
             |  FROM s GROUP BY 1),
             |dd AS (SELECT prompt, n, sr,
             |    CASE WHEN sr < 0 THEN
             |      -((2 * (-sr) + n) // (2 * n))
             |    ELSE (2 * sr + n) // (2 * n) END AS mean_micros,
             |    sqrt(CAST(srr AS DOUBLE) / n
             |      - (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n))
             |      AS stdd
             |  FROM st)
             |SELECT s.prompt, s.resp, CAST(s.r AS BIGINT) AS reward_micros,
             |  CAST(dd.n AS BIGINT) AS n_samples,
             |  CAST(dd.mean_micros AS BIGINT) AS mean_micros,
             |  CAST(CASE WHEN dd.n > 1 THEN
             |    ROUND(dd.stdd) END AS BIGINT) AS std_micros,
             |  CAST(CASE WHEN dd.n > 1 AND dd.stdd > 0 THEN
             |    ROUND(ROUND((CAST(s.r AS DOUBLE)
             |      - CAST(dd.sr AS DOUBLE) / dd.n) / dd.stdd, 6) * 1e6)
             |    END AS BIGINT) AS adv_micros
             |FROM s JOIN dd USING (prompt)""".stripMargin)),

    // ---- E44: message-tree linearization (OpenAssistant paths) -----------
    // A 500-node binary-heap reply tree over documents (parent =
    // (id-1) div 2, root 0 = system, odd = user, even = assistant;
    // text = the doc's first 6 tokens): one conversation per LEAF,
    // every ancestor in order. The oracle replays the recursive
    // root-to-leaf walk, the leaf set (ids with no child), and the
    // per-turn unnest with ordinality.
    Q("q_e44_dialog_paths",
      (s, d) => {
        val msgs = Tables.documents(s, d).select(
          col("doc_id").as("msg_id"),
          when(col("doc_id") === 0, lit(null).cast("long"))
            .otherwise(expr("(doc_id - 1) div 2")).as("parent_id"),
          when(col("doc_id") === 0, lit("system"))
            .when(col("doc_id") % 2 === 1, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          when(col("text").isNotNull, array_join(slice(
            graft.operators.TextAnalysis.tokens(col("text")), 1, 6), " "))
            .otherwise(lit("")).as("text"))
        graft.operators.Behavior.dialogPaths(msgs, "msg_id",
          "parent_id", "role", "text", maxDepth = 16)
      },
      Some(s"""$duckDialogTree
             |SELECT e.path_id, CAST(e.n_turns AS BIGINT) AS n_turns,
             |  CAST(e.turn AS BIGINT) AS turn, e.msg_id, m.role,
             |  m.txt AS text
             |FROM ex2 e JOIN m ON m.id = e.msg_id""".stripMargin)),

    // ---- E46: tree -> ChatML (the full adoption chain composed) ----------
    // dialogPaths' per-turn relation rendered THROUGH
    // renderChatTemplate (path_id as the conversation key, turn as the
    // order): one training string per leaf conversation — the
    // tree-to-trainer last mile under ONE oracle (the recursive walk +
    // the ChatML wrap + the ordered aggregation).
    Q("q_e46_tree_chatml",
      (s, d) => {
        val msgs = Tables.documents(s, d).select(
          col("doc_id").as("msg_id"),
          when(col("doc_id") === 0, lit(null).cast("long"))
            .otherwise(expr("(doc_id - 1) div 2")).as("parent_id"),
          when(col("doc_id") === 0, lit("system"))
            .when(col("doc_id") % 2 === 1, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          when(col("text").isNotNull, array_join(slice(
            graft.operators.TextAnalysis.tokens(col("text")), 1, 6), " "))
            .otherwise(lit("")).as("text"))
        graft.operators.Behavior.renderChatTemplate(
          graft.operators.Behavior.dialogPaths(msgs, "msg_id",
            "parent_id", "role", "text", maxDepth = 16),
          "path_id", "turn", "msg_id", "role", "text")
      },
      Some(s"""$duckDialogTree,
             |rch AS (SELECT e.path_id, e.turn, e.msg_id,
             |    '<|im_start|>' || m.role || chr(10) || m.txt ||
             |    '<|im_end|>' AS turn_s
             |  FROM ex2 e JOIN m ON m.id = e.msg_id)
             |SELECT path_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
             |  string_agg(turn_s, chr(10) ORDER BY turn, msg_id)
             |    AS rendered
             |FROM rch GROUP BY 1""".stripMargin)),

    // ---- E45: sibling-reply preferences (tree feedback -> DPO pairs) -----
    // The q_e44 heap tree with a planted per-message quality score
    // ((id * 7919) % 10007): per parent, the best-scored child is
    // chosen and each other sibling one rejected row — tree-shaped
    // human feedback becoming DPO pairs with the prompt context shared
    // by construction. Oracle replays the per-parent argmax (score
    // desc, id) and every margin.
    Q("q_e45_sibling_preferences",
      (s, d) => graft.operators.Behavior.siblingPreferences(
        Tables.documents(s, d).select(col("doc_id").as("msg_id"),
          when(col("doc_id") === 0, lit(null).cast("long"))
            .otherwise(expr("(doc_id - 1) div 2")).as("parent_id"),
          ((col("doc_id") * 7919) % 10007).as("score")),
        "msg_id", "parent_id", "score"),
      Some("""WITH m AS (SELECT doc_id AS id,
             |    (doc_id - 1) // 2 AS parent,
             |    (doc_id * 7919) % 10007 AS s
             |  FROM documents WHERE doc_id <> 0),
             |b AS (SELECT parent, id AS cid, s AS cs FROM (
             |    SELECT parent, id, s, row_number() OVER (
             |      PARTITION BY parent ORDER BY s DESC, id) AS rn FROM m)
             |  WHERE rn = 1)
             |SELECT m.parent AS parent_id, b.cid AS chosen_id,
             |  CAST(b.cs AS BIGINT) AS chosen_score_micros,
             |  m.id AS rejected_id,
             |  CAST(m.s AS BIGINT) AS rejected_score_micros,
             |  CAST(b.cs - m.s AS BIGINT) AS margin_micros,
             |  b.cs = m.s AS tie
             |FROM m JOIN b ON b.parent = m.parent AND m.id <> b.cid"""
        .stripMargin)),

    // ---- E43: KTO-shaped unpaired preference signal -----------------------
    // The thumbs-up/down production data shape: per prompt
    // (event_id % 40) each example carries a planted binary verdict;
    // the per-prompt desirable share is the prospect-theoretic
    // baseline, each example's centered signal and class-imbalance
    // weight ride in exact integer micros/ppm. One prompt-keyed agg +
    // keyed join (the q_e42 discipline); the oracle replays baseline,
    // centering and the lambda balancing cell by cell.
    Q("q_e43_kto_signal",
      (s, d) => graft.operators.Preferences.ktoSignal(
        Tables.events(s, d).select((col("event_id") % 40).as("prompt"),
          col("event_id").as("resp"),
          ((col("event_id") * 7919) % 97 < 55).as("d")),
        "prompt", "resp", "d"),
      Some("""WITH s AS (SELECT event_id % 40 AS prompt,
             |    event_id AS resp,
             |    (event_id * 7919) % 97 < 55 AS d
             |  FROM events),
             |st AS (SELECT prompt, COUNT(*) AS n,
             |    SUM(CASE WHEN d THEN 1 ELSE 0 END) AS nd
             |  FROM s GROUP BY 1),
             |dd AS (SELECT prompt, n, nd, n - nd AS nu,
             |    (2 * nd * 1000000 + n) // (2 * n) AS bm
             |  FROM st)
             |SELECT s.prompt, s.resp, s.d AS desirable,
             |  CAST(dd.n AS BIGINT) AS n_examples,
             |  CAST(dd.nd AS BIGINT) AS n_desirable,
             |  CAST(dd.nu AS BIGINT) AS n_undesirable,
             |  CAST(dd.bm AS BIGINT) AS baseline_micros,
             |  CAST((CASE WHEN s.d THEN 1000000 ELSE 0 END) - dd.bm
             |    AS BIGINT) AS signal_micros,
             |  CAST(CASE WHEN s.d THEN
             |      CASE WHEN dd.nu > 0 THEN 1000000 END
             |    ELSE CASE WHEN dd.nd > 0 THEN
             |      (2 * dd.nd * 1000000 + dd.nu) // (2 * dd.nu) END
             |    END AS BIGINT) AS weight_ppm
             |FROM s JOIN dd USING (prompt)""".stripMargin)),

    // ---- E47: per-step trajectory returns + GAE advantage ----------------
    // The agentic-RL data shape: episodes (event_id % 97) of dense
    // steps (event_id div 97) with planted SIGNED rewards and value
    // estimates; gamma 0.99 / lambda 0.95 in ppm, every backward-
    // recursion step a floor-quantized integer. The oracle unrolls the
    // recursion as a recursive CTE from each episode's last step down.
    // DuckDB's // TRUNCATES toward zero on signed operands (unlike
    // Python's //), so the floor is spelled out as the same
    // (x - pmod(x, 1e6)) / 1e6 identity the operator compiles —
    // subtracting the always-non-negative pmod makes the quotient
    // exact, and truncation of an exact quotient IS the floor.
    Q("q_e47_trajectory_gae",
      (s, d) => graft.operators.Preferences.trajectoryReturns(
        Tables.events(s, d).select(
          (col("event_id") % 97).as("episode"),
          expr("event_id div 97").as("step"),
          expr("(event_id * 7919) % 2000001 - 1000000").as("r"),
          expr("(event_id * 104729) % 2000001 - 1000000").as("v")),
        "episode", "step", "r", "v",
        gammaPpm = 990000L, lambdaPpm = 950000L),
      Some("""WITH RECURSIVE s AS (
             |  SELECT event_id % 97 AS ep, event_id // 97 AS st,
             |    (event_id * 7919) % 2000001 - 1000000 AS r,
             |    (event_id * 104729) % 2000001 - 1000000 AS v
             |  FROM events),
             |mx AS (SELECT ep, MAX(st) AS mst, COUNT(*) AS n
             |  FROM s GROUP BY 1),
             |rec AS (
             |  SELECT s.ep, s.st, s.r, s.v, s.r AS ret,
             |    s.r - s.v AS delta, s.r - s.v AS adv
             |  FROM s JOIN mx ON mx.ep = s.ep AND s.st = mx.mst
             |  UNION ALL
             |  SELECT s.ep, s.st, s.r, s.v,
             |    s.r + ((990000 * p.ret) - (((990000 * p.ret) % 1000000)
             |      + 1000000) % 1000000) // 1000000,
             |    s.r + ((990000 * p.v) - (((990000 * p.v) % 1000000)
             |      + 1000000) % 1000000) // 1000000 - s.v,
             |    (s.r + ((990000 * p.v) - (((990000 * p.v) % 1000000)
             |      + 1000000) % 1000000) // 1000000 - s.v)
             |      + ((940500 * p.adv) - (((940500 * p.adv) % 1000000)
             |      + 1000000) % 1000000) // 1000000
             |  FROM rec p JOIN s ON s.ep = p.ep AND s.st = p.st - 1)
             |SELECT rec.ep AS episode, CAST(mx.n AS BIGINT) AS n_steps,
             |  rec.st AS step, CAST(rec.r AS BIGINT) AS reward_micros,
             |  CAST(rec.v AS BIGINT) AS value_micros,
             |  CAST(rec.ret AS BIGINT) AS return_micros,
             |  CAST(rec.delta AS BIGINT) AS delta_micros,
             |  CAST(rec.adv AS BIGINT) AS advantage_micros
             |FROM rec JOIN mx USING (ep)""".stripMargin)),

    // ---- E48: GAE advantage whitening per task (the PPO batch step) ------
    // The q_e47 chain composed one stage further: per-step GAE
    // advantages feed the critic-free group normalization (q_e42's
    // operator) with the TASK (episode % 7) as the group — the
    // advantage-whitening step every PPO/GRPO implementation runs
    // before the policy update, here dedup-honest across episodes of
    // the same task. resp reconstructs the unique step key
    // (step * 97 + episode = the original event id). ONE oracle:
    // the backward-recursion CTE feeding the exact integer-sum group
    // stats.
    Q("q_e48_gae_whitening",
      (s, d) => {
        val gae = graft.operators.Preferences.trajectoryReturns(
          Tables.events(s, d).select(
            (col("event_id") % 97).as("episode"),
            expr("event_id div 97").as("step"),
            expr("(event_id * 7919) % 2000001 - 1000000").as("r"),
            expr("(event_id * 104729) % 2000001 - 1000000").as("v")),
          "episode", "step", "r", "v",
          gammaPpm = 990000L, lambdaPpm = 950000L)
        graft.operators.Preferences.groupAdvantage(
          gae.select((col("episode") % 7).as("task"),
            (col("step") * 97 + col("episode")).as("resp"),
            col("advantage_micros")),
          "task", "resp", "advantage_micros")
      },
      Some("""WITH RECURSIVE s AS (
             |  SELECT event_id % 97 AS ep, event_id // 97 AS st,
             |    (event_id * 7919) % 2000001 - 1000000 AS r,
             |    (event_id * 104729) % 2000001 - 1000000 AS v
             |  FROM events),
             |mx AS (SELECT ep, MAX(st) AS mst FROM s GROUP BY 1),
             |rec AS (
             |  SELECT s.ep, s.st, s.r, s.v, s.r AS ret,
             |    s.r - s.v AS delta, s.r - s.v AS adv
             |  FROM s JOIN mx ON mx.ep = s.ep AND s.st = mx.mst
             |  UNION ALL
             |  SELECT s.ep, s.st, s.r, s.v,
             |    s.r + ((990000 * p.ret) - (((990000 * p.ret) % 1000000)
             |      + 1000000) % 1000000) // 1000000,
             |    s.r + ((990000 * p.v) - (((990000 * p.v) % 1000000)
             |      + 1000000) % 1000000) // 1000000 - s.v,
             |    (s.r + ((990000 * p.v) - (((990000 * p.v) % 1000000)
             |      + 1000000) % 1000000) // 1000000 - s.v)
             |      + ((940500 * p.adv) - (((940500 * p.adv) % 1000000)
             |      + 1000000) % 1000000) // 1000000
             |  FROM rec p JOIN s ON s.ep = p.ep AND s.st = p.st - 1),
             |s2 AS MATERIALIZED (SELECT ep % 7 AS task,
             |    st * 97 + ep AS resp, adv AS r
             |  FROM rec),
             |st AS (SELECT task, COUNT(*) AS n, SUM(r) AS sr,
             |    SUM(CAST(r AS HUGEINT) * r) AS srr
             |  FROM s2 GROUP BY 1),
             |dd AS (SELECT task, n, sr,
             |    CASE WHEN sr < 0 THEN
             |      -((2 * (-sr) + n) // (2 * n))
             |    ELSE (2 * sr + n) // (2 * n) END AS mean_micros,
             |    sqrt(CAST(srr AS DOUBLE) / n
             |      - (CAST(sr AS DOUBLE) / n) * (CAST(sr AS DOUBLE) / n))
             |      AS stdd
             |  FROM st)
             |SELECT s2.task, s2.resp,
             |  CAST(s2.r AS BIGINT) AS reward_micros,
             |  CAST(dd.n AS BIGINT) AS n_samples,
             |  CAST(dd.mean_micros AS BIGINT) AS mean_micros,
             |  CAST(CASE WHEN dd.n > 1 THEN
             |    ROUND(dd.stdd) END AS BIGINT) AS std_micros,
             |  CAST(CASE WHEN dd.n > 1 AND dd.stdd > 0 THEN
             |    ROUND(ROUND((CAST(s2.r AS DOUBLE)
             |      - CAST(dd.sr AS DOUBLE) / dd.n) / dd.stdd, 6) * 1e6)
             |    END AS BIGINT) AS adv_micros
             |FROM s2 JOIN dd USING (task)""".stripMargin)),

    // ---- V35: tool-call trace validation (agentic-SFT QA gate) -----------
    // Synthetic tool_call JSON planted per event (5 arms: a clean-ish
    // search with a rotating limit-type mismatch, a weather call with
    // missing/null days, a calc call with a numeric-expr mismatch and
    // a nested extra object, an undeclared tool, and an unparseable
    // tail) audited against a 6-row declared schema. The oracle
    // replays the JSON synthesis char-for-char, then the parse /
    // unknown / missing / class-mismatch / extra verdicts through
    // DuckDB's json_valid / json_keys / json_type.
    Q("q_v35_tool_call_audit",
      (s, d) => toolCallAuditFixture(s, d),
      Some(s"""$duckToolCallVerdicts
             |SELECT b.event_id, b.tool, b.bad AS malformed_json,
             |  (NOT b.bad) AND COALESCE(
             |    b.tool NOT IN (SELECT tool FROM sch), false)
             |    AS unknown_tool,
             |  COALESCE(agg.n_args, 0) AS n_args,
             |  COALESCE(ms.n_missing, 0) AS n_missing_required,
             |  CASE WHEN b.bad THEN '' ELSE COALESCE(ms.missing, '') END
             |    AS missing_args,
             |  COALESCE(agg.n_mm, 0) AS n_type_mismatch,
             |  COALESCE(agg.mm, '') AS mismatch_args,
             |  COALESCE(agg.n_ex, 0) AS n_extra_args,
             |  COALESCE(agg.ex, '') AS extra_args,
             |  (NOT b.bad) AND COALESCE(
             |      b.tool IN (SELECT tool FROM sch), false)
             |    AND COALESCE(ms.n_missing, 0) = 0
             |    AND COALESCE(agg.n_mm, 0) = 0
             |    AND COALESCE(agg.n_ex, 0) = 0 AS ok
             |FROM b
             |LEFT JOIN agg USING (event_id)
             |LEFT JOIN ms USING (event_id)""".stripMargin)),

    // ---- V36: conversation-grain tool-call QA (tree x audit composed) ----
    // The agentic-SFT adoption chain closed: the q_e44 reply tree's
    // ASSISTANT messages carry tool_call JSON (the q_v35 arms keyed on
    // msg_id div 2 so every even id draws one), each message is audited
    // ONCE at the message grain (a shared ancestor is never re-audited
    // per path), and verdicts roll up per root-to-leaf conversation:
    // a path is trainable iff every assistant turn on it carries an ok
    // call. Paths with no assistant turn are vacuously trainable and
    // stay visible. ONE oracle replays the tree walk, the JSON
    // synthesis, the per-call verdicts, and the roll-up.
    Q("q_v36_tree_tool_call_qa",
      (s, d) => {
        import graft.operators.Behavior
        val msgs = Tables.documents(s, d).select(
          col("doc_id").as("msg_id"),
          when(col("doc_id") === 0, lit(null).cast("long"))
            .otherwise(expr("(doc_id - 1) div 2")).as("parent_id"),
          when(col("doc_id") === 0, lit("system"))
            .when(col("doc_id") % 2 === 1, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          when(col("text").isNotNull, array_join(slice(
            graft.operators.TextAnalysis.tokens(col("text")), 1, 6), " "))
            .otherwise(lit("")).as("text"))
        val schema = {
          import s.implicits._
          Seq(
            ("search", "q", "string", true),
            ("search", "limit", "number", false),
            ("weather", "city", "string", true),
            ("weather", "days", "number", true),
            ("weather", "metric", "boolean", false),
            ("calc", "expr", "string", true))
            .toDF("tool", "arg", "arg_type", "required")
        }
        val calls = msgs.filter(col("role") === "assistant")
          .select(col("msg_id"),
            expr("""CASE CAST((msg_id div 2) % 5 AS INT)
              WHEN 0 THEN concat('{"name":"search","arguments":{"q":"m',
                CAST(msg_id AS STRING), '"',
                CASE WHEN msg_id % 9 = 0 THEN ',"limit":"three"'
                  ELSE concat(',"limit":', CAST(msg_id % 7 AS STRING)) END,
                '}}')
              WHEN 1 THEN concat('{"name":"weather","arguments":{"city":"c',
                CAST(msg_id AS STRING), '"',
                CASE WHEN msg_id % 40 = 32 THEN ''
                  WHEN msg_id % 16 = 2 THEN ',"days":null'
                  ELSE concat(',"days":', CAST(msg_id % 9 AS STRING)) END,
                '}}')
              WHEN 2 THEN concat('{"name":"calc","arguments":{"expr":',
                CASE WHEN msg_id % 16 = 0 THEN CAST(msg_id AS STRING)
                  ELSE '"1+2"' END,
                CASE WHEN msg_id % 80 = 4 THEN ',"opts":{"deep":1}'
                  ELSE '' END, '}}')
              WHEN 3 THEN CASE WHEN msg_id % 80 = 6
                THEN '{"name":"frobnicate","arguments":{"x":1}}'
                ELSE concat('{"name":"search","arguments":{"q":"z',
                  CAST(msg_id AS STRING), '"}}') END
              ELSE CASE WHEN msg_id % 80 = 8 THEN '{"name":"search'
                ELSE concat('{"name":"weather","arguments":{"city":"c',
                  CAST(msg_id AS STRING), '","days":',
                  CAST(msg_id % 9 AS STRING), '}}') END
              END""").as("call_json"))
        val audit = Behavior.toolCallAudit(calls, "msg_id", "call_json",
          schema).select(col("msg_id"), col("ok"))
        val paths = Behavior.dialogPaths(msgs, "msg_id", "parent_id",
          "role", "text", maxDepth = 16)
        val perPath = paths.filter(col("role") === "assistant")
          .select(col("path_id"), col("msg_id"))
          .join(audit, Seq("msg_id"))
          .groupBy(col("path_id"))
          .agg(count(lit(1)).as("n_tool_calls"),
            sum(when(col("ok"), 0L).otherwise(1L)).as("n_bad_calls"))
        paths.select(col("path_id"), col("n_turns")).distinct()
          .join(perPath, Seq("path_id"), "left")
          .select(col("path_id"), col("n_turns"),
            coalesce(col("n_tool_calls"), lit(0L)).as("n_tool_calls"),
            coalesce(col("n_bad_calls"), lit(0L)).as("n_bad_calls"))
          .withColumn("trainable", col("n_bad_calls") === 0L)
      },
      Some(s"""$duckDialogTree,
             |cj AS (SELECT id,
             |    CASE CAST((id // 2) % 5 AS INT)
             |      WHEN 0 THEN '{"name":"search","arguments":{"q":"m'
             |        || id || '"' ||
             |        CASE WHEN id % 9 = 0 THEN ',"limit":"three"'
             |          ELSE ',"limit":' || (id % 7) END || '}}'
             |      WHEN 1 THEN '{"name":"weather","arguments":{"city":"c'
             |        || id || '"' ||
             |        CASE WHEN id % 40 = 32 THEN ''
             |          WHEN id % 16 = 2 THEN ',"days":null'
             |          ELSE ',"days":' || (id % 9) END || '}}'
             |      WHEN 2 THEN '{"name":"calc","arguments":{"expr":' ||
             |        CASE WHEN id % 16 = 0 THEN CAST(id AS VARCHAR)
             |          ELSE '"1+2"' END ||
             |        CASE WHEN id % 80 = 4 THEN ',"opts":{"deep":1}'
             |          ELSE '' END || '}}'
             |      WHEN 3 THEN CASE WHEN id % 80 = 6
             |        THEN '{"name":"frobnicate","arguments":{"x":1}}'
             |        ELSE '{"name":"search","arguments":{"q":"z'
             |          || id || '"}}' END
             |      ELSE CASE WHEN id % 80 = 8 THEN '{"name":"search'
             |        ELSE '{"name":"weather","arguments":{"city":"c'
             |          || id || '","days":' || (id % 9) || '}}' END
             |      END AS j
             |  FROM m WHERE role = 'assistant'),
             |sch(tool, arg, ty, req) AS (VALUES
             |    ('search', 'q', 'string', true),
             |    ('search', 'limit', 'number', false),
             |    ('weather', 'city', 'string', true),
             |    ('weather', 'days', 'number', true),
             |    ('weather', 'metric', 'boolean', false),
             |    ('calc', 'expr', 'string', true)),
             |cb AS (SELECT id, j,
             |    CASE WHEN json_valid(j)
             |      THEN json_extract_string(j, '$$.name') END AS tool,
             |    (NOT json_valid(j))
             |      OR (CASE WHEN json_valid(j)
             |        THEN json_extract_string(j, '$$.name') END) IS NULL
             |      OR (CASE WHEN json_valid(j)
             |        THEN json_type(j, '$$.arguments') END) <> 'OBJECT'
             |      AS bad
             |  FROM cj),
             |ck AS (SELECT cb.id, cb.tool, cb.j,
             |    unnest(json_keys(cb.j, '$$.arguments')) AS arg,
             |    cb.tool IN (SELECT tool FROM sch) AS kn
             |  FROM cb WHERE NOT cb.bad),
             |ct2 AS (SELECT id, tool, arg, kn,
             |    CASE COALESCE(json_type(j, '$$.arguments.' || arg), 'NULL')
             |      WHEN 'VARCHAR' THEN 'string'
             |      WHEN 'BOOLEAN' THEN 'boolean'
             |      WHEN 'NULL' THEN 'null'
             |      WHEN 'OBJECT' THEN 'object'
             |      WHEN 'ARRAY' THEN 'array'
             |      ELSE 'number' END AS cls
             |  FROM ck),
             |caj AS (SELECT t.id, t.arg, t.kn, t.cls, s.ty
             |  FROM ct2 t LEFT JOIN sch s
             |    ON s.tool = t.tool AND s.arg = t.arg),
             |cagg AS (SELECT id,
             |    COUNT(CASE WHEN kn AND ty IS NOT NULL
             |      AND cls <> ty THEN 1 END) AS n_mm,
             |    COUNT(CASE WHEN kn AND ty IS NULL THEN 1 END) AS n_ex
             |  FROM caj GROUP BY 1),
             |cms AS (SELECT cb.id, COUNT(*) AS n_missing
             |  FROM cb JOIN sch s ON s.tool = cb.tool AND s.req
             |  LEFT JOIN ck ON ck.id = cb.id AND ck.arg = s.arg
             |  WHERE NOT cb.bad AND ck.arg IS NULL
             |  GROUP BY 1),
             |vok AS (SELECT cb.id,
             |    (NOT cb.bad) AND COALESCE(
             |      cb.tool IN (SELECT tool FROM sch), false)
             |      AND COALESCE(cms.n_missing, 0) = 0
             |      AND COALESCE(cagg.n_mm, 0) = 0
             |      AND COALESCE(cagg.n_ex, 0) = 0 AS ok
             |  FROM cb
             |  LEFT JOIN cagg USING (id)
             |  LEFT JOIN cms USING (id)),
             |pp AS (SELECT e.path_id,
             |    CAST(COUNT(*) AS BIGINT) AS n_tool_calls,
             |    CAST(COUNT(CASE WHEN NOT v.ok THEN 1 END) AS BIGINT)
             |      AS n_bad_calls
             |  FROM ex2 e JOIN m ON m.id = e.msg_id
             |  JOIN vok v ON v.id = e.msg_id
             |  WHERE m.role = 'assistant'
             |  GROUP BY 1)
             |SELECT l.path_id, CAST(l.n_turns AS BIGINT) AS n_turns,
             |  COALESCE(pp.n_tool_calls, 0) AS n_tool_calls,
             |  COALESCE(pp.n_bad_calls, 0) AS n_bad_calls,
             |  COALESCE(pp.n_bad_calls, 0) = 0 AS trainable
             |FROM (SELECT DISTINCT path_id, n_turns FROM ex2) l
             |LEFT JOIN pp USING (path_id)""".stripMargin)),

    // ---- V37: per-tool call-quality monitor (the audit rolled up) --------
    // The operational relation over the q_v35 verdicts: per tool
    // (unparseable names under '<unparsed>'), the counter set +
    // half-up ok-rate a dashboard alarms on. Shares q_v35's fixture
    // and oracle CTEs verbatim; the streaming twin
    // (EventStreams.toolVerdictCounts -> toolCallRatesFromCounts) is
    // parity-pinned in EventStreamsSpec.
    Q("q_v37_tool_call_rates",
      (s, d) => graft.operators.Behavior.toolCallRates(
        toolCallAuditFixture(s, d)),
      Some(s"""$duckToolCallVerdicts,
             |pc AS (SELECT COALESCE(b.tool, '<unparsed>') AS tool,
             |    b.bad,
             |    (NOT b.bad) AND COALESCE(
             |      b.tool NOT IN (SELECT tool FROM sch), false) AS unk,
             |    (NOT b.bad) AND COALESCE(
             |        b.tool IN (SELECT tool FROM sch), false)
             |      AND COALESCE(ms.n_missing, 0) = 0
             |      AND COALESCE(agg.n_mm, 0) = 0
             |      AND COALESCE(agg.n_ex, 0) = 0 AS ok
             |  FROM b
             |  LEFT JOIN agg USING (event_id)
             |  LEFT JOIN ms USING (event_id))
             |SELECT tool,
             |  CAST(COUNT(*) AS BIGINT) AS n_calls,
             |  CAST(COUNT(CASE WHEN bad THEN 1 END) AS BIGINT)
             |    AS n_malformed,
             |  CAST(COUNT(CASE WHEN unk THEN 1 END) AS BIGINT)
             |    AS n_unknown,
             |  CAST(COUNT(CASE WHEN NOT bad AND NOT unk AND NOT ok
             |    THEN 1 END) AS BIGINT) AS n_bad_args,
             |  CAST(COUNT(CASE WHEN ok THEN 1 END) AS BIGINT) AS n_ok,
             |  CAST((2 * COUNT(CASE WHEN ok THEN 1 END) * 1000000
             |      + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS ok_ppm
             |FROM pc GROUP BY 1""".stripMargin)),

    // ---- E40: length-bias audit (Kendall tau-a per prompt) ---------------
    // The reward-data failure mode made measurable: per prompt
    // (event_id % 40, over the event_id % 7 audit slice — pair
    // enumeration is per-group quadratic, so the fixture bounds group
    // population the way the operator's cap demands of real callers)
    // the response length x and a PLANTED length-correlated reward
    // y = x*1000 + noise — tau-a reads strongly positive, which is
    // exactly the verdict a reward-model auditor acts on. Exact
    // integers end to end; the oracle replays the pair enumeration
    // and the sign-split half-up ppm.
    Q("q_e40_length_bias",
      (s, d) => graft.operators.Profile.kendallTau(
        Tables.events(s, d)
          .filter(col("event_id") % 7 === 0)
          .select((col("event_id") % 40).as("prompt"),
            col("event_id").as("id"),
            ((col("event_id") * 31) % 997).as("resp_len"),
            (((col("event_id") * 31) % 997) * 1000 +
              (col("event_id") * 7919) % 50000).as("reward")),
        "prompt", "id", "resp_len", "reward"),
      Some("""WITH s AS (SELECT event_id % 40 AS prompt, event_id AS id,
             |    (event_id * 31) % 997 AS x,
             |    ((event_id * 31) % 997) * 1000
             |      + (event_id * 7919) % 50000 AS y
             |  FROM events WHERE event_id % 7 = 0),
             |ns AS (SELECT prompt, CAST(COUNT(*) AS BIGINT) AS n
             |  FROM s GROUP BY 1),
             |ag AS (SELECT l.prompt,
             |    CAST(COUNT(CASE WHEN (l.x - r.x) * (l.y - r.y) > 0
             |      THEN 1 END) AS BIGINT) AS concordant,
             |    CAST(COUNT(CASE WHEN (l.x - r.x) * (l.y - r.y) < 0
             |      THEN 1 END) AS BIGINT) AS discordant,
             |    CAST(COUNT(CASE WHEN (l.x - r.x) * (l.y - r.y) = 0
             |      THEN 1 END) AS BIGINT) AS tied
             |  FROM s l JOIN s r ON r.prompt = l.prompt AND l.id < r.id
             |  GROUP BY 1),
             |z AS (SELECT ns.prompt, ns.n, ns.n * (ns.n - 1) // 2 AS np,
             |    COALESCE(ag.concordant, 0) AS concordant,
             |    COALESCE(ag.discordant, 0) AS discordant,
             |    COALESCE(ag.tied, 0) AS tied
             |  FROM ns LEFT JOIN ag USING (prompt))
             |SELECT prompt, n, CAST(np AS BIGINT) AS n_pairs,
             |  concordant, discordant, tied,
             |  CAST(CASE WHEN np > 0 THEN
             |    CASE WHEN concordant < discordant THEN
             |      -((2 * (discordant - concordant) * 1000000 + np)
             |        // (2 * np))
             |    ELSE (2 * (concordant - discordant) * 1000000 + np)
             |      // (2 * np) END
             |    END AS BIGINT) AS tau_a_ppm
             |FROM z""".stripMargin)),

    // ---- E39: DPO x Bradley-Terry consistency audit (composed) -----------
    // The q_m19 composition discipline applied to the preference tier:
    // per-prompt DPO majorities (q_e34's machinery, margin >= 1, cycles
    // flagged) cross-checked against the GLOBAL BT fit (q_e35's) over
    // the same judgments — a pair whose local majority prefers the
    // globally-WEAKER candidate (`contradicted`) is the noisy /
    // context-dependent slice a curator down-weights before DPO
    // training. ONE oracle replays both chains and the double join.
    Q("q_e39_dpo_bt_consistency",
      (s, d) => {
        val prefs = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select((col("event_id") % 5).as("prompt_id"),
            expr("(event_id div 5) % 6").as("m1"),
            expr("(event_id div 30) % 6").as("m2"), col("user_id"))
          .filter(col("m1") =!= col("m2"))
          .select(col("prompt_id"),
            when(expr("((m2 - m1) + 6) % 6 between 1 and 2") =!=
              (col("user_id") % 5 === 0), col("m1")).otherwise(col("m2"))
              .as("winner"),
            when(expr("((m2 - m1) + 6) % 6 between 1 and 2") =!=
              (col("user_id") % 5 === 0), col("m2")).otherwise(col("m1"))
              .as("loser"))
        val pairs = graft.operators.Preferences.dpoPairs(prefs,
          "prompt_id", "winner", "loser", minMargin = 1L,
          excludeCycles = false)
        val st = graft.operators.Preferences.bradleyTerry(
          prefs.select(col("winner"), col("loser")), "winner", "loser")
          .select(col("candidate"), col("strength_micro"))
        pairs
          .join(st.select(col("candidate").as("chosen_id"),
            col("strength_micro").as("chosen_strength")), Seq("chosen_id"))
          .join(st.select(col("candidate").as("rejected_id"),
            col("strength_micro").as("rejected_strength")),
            Seq("rejected_id"))
          .withColumn("contradicted",
            col("chosen_strength") < col("rejected_strength"))
          .select(col("prompt_id"), col("chosen_id"), col("rejected_id"),
            col("n_for"), col("n_against"), col("margin"), col("in_cycle"),
            col("chosen_strength"), col("rejected_strength"),
            col("contradicted"))
      },
      Some(s"""WITH pr AS MATERIALIZED (
              |  SELECT prompt_id,
              |    CASE WHEN win1 THEN m1 ELSE m2 END AS winner,
              |    CASE WHEN win1 THEN m2 ELSE m1 END AS loser
              |  FROM (SELECT event_id % 5 AS prompt_id, m1, m2,
              |      (((m2 - m1) + 6) % 6 BETWEEN 1 AND 2)
              |        <> (user_id % 5 = 0) AS win1
              |    FROM (SELECT event_id, (event_id // 5) % 6 AS m1,
              |        (event_id // 30) % 6 AS m2, user_id
              |      FROM events WHERE user_id IS NOT NULL)
              |    WHERE m1 <> m2)),
              |p AS (SELECT prompt_id, LEAST(winner, loser) AS a,
              |    GREATEST(winner, loser) AS b,
              |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw
              |  FROM pr),
              |ppc AS MATERIALIZED (SELECT prompt_id, a, b, SUM(aw) AS wab,
              |    COUNT(*) - SUM(aw) AS wba
              |  FROM p GROUP BY 1, 2, 3),
              |mj AS MATERIALIZED (SELECT prompt_id,
              |    CASE WHEN wab > wba THEN a ELSE b END AS chosen_id,
              |    CASE WHEN wab > wba THEN b ELSE a END AS rejected_id,
              |    GREATEST(wab, wba) AS nf, LEAST(wab, wba) AS na
              |  FROM ppc WHERE wab <> wba),
              |cyc AS (SELECT DISTINCT e1.prompt_id AS prompt_id,
              |    e1.chosen_id AS chosen_id, e1.rejected_id AS rejected_id
              |  FROM mj e1
              |  JOIN mj e2 ON e1.prompt_id = e2.prompt_id
              |    AND e1.rejected_id = e2.chosen_id
              |  JOIN mj e3 ON e2.prompt_id = e3.prompt_id
              |    AND e2.rejected_id = e3.chosen_id
              |    AND e3.rejected_id = e1.chosen_id),
              |gp AS (SELECT LEAST(winner, loser) AS a,
              |    GREATEST(winner, loser) AS b,
              |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw
              |  FROM pr),
              |pc AS MATERIALIZED (SELECT a, b, SUM(aw) AS wab,
              |    COUNT(*) - SUM(aw) AS wba
              |  FROM gp GROUP BY 1, 2),
              |g AS MATERIALIZED (SELECT a, b, wab + wba AS n FROM pc),
              |w AS MATERIALIZED (SELECT candidate, SUM(wn) AS n_wins,
              |    SUM(ng) AS n_games
              |  FROM (SELECT a AS candidate, wab AS wn, wab + wba AS ng
              |      FROM pc
              |    UNION ALL SELECT b, wba, wab + wba FROM pc)
              |  GROUP BY 1),
              |nc AS MATERIALIZED (SELECT COUNT(*) AS n FROM w),
              |s0 AS MATERIALIZED (SELECT candidate,
              |    CAST(1000000 AS HUGEINT) AS s FROM w),
              |${(1 to 5).map(duckBtIteration).mkString(",\n")}
              |SELECT m.prompt_id, m.chosen_id, m.rejected_id,
              |  CAST(m.nf AS BIGINT) AS n_for,
              |  CAST(m.na AS BIGINT) AS n_against,
              |  CAST(m.nf - m.na AS BIGINT) AS margin,
              |  (c.chosen_id IS NOT NULL) AS in_cycle,
              |  CAST(sc.s AS BIGINT) AS chosen_strength,
              |  CAST(sr.s AS BIGINT) AS rejected_strength,
              |  sc.s < sr.s AS contradicted
              |FROM mj m
              |LEFT JOIN cyc c ON c.prompt_id = m.prompt_id
              |  AND c.chosen_id = m.chosen_id
              |  AND c.rejected_id = m.rejected_id
              |JOIN s5 sc ON sc.candidate = m.chosen_id
              |JOIN s5 sr ON sr.candidate = m.rejected_id""".stripMargin)),

    // ---- E38: Krippendorff's alpha (missing-data agreement) ---------------
    // Sparse panel: unit = event_id % 4096 (at sf0.01 ~2.4 ratings per
    // unit, MANY singletons — the exclusion rule carries real weight),
    // category = event_type. The oracle replays the per-unit micro
    // rounding, the exact D_e rational, and the subtraction-form alpha.
    Q("q_e38_krippendorff",
      (s, d) => graft.operators.Profile.krippendorffAlpha(
        Tables.events(s, d)
          .select((col("event_id") % 4096).as("unit"), col("event_type")),
        "unit", "event_type"),
      Some("""WITH lab AS (SELECT event_id % 4096 AS u, event_type AS c
             |  FROM events WHERE event_type IS NOT NULL),
             |cell AS (SELECT u, c, COUNT(*) AS nuc FROM lab GROUP BY 1, 2),
             |pu AS (SELECT u, SUM(nuc) AS nu, SUM(nuc * nuc) AS s2u
             |  FROM cell GROUP BY 1 HAVING SUM(nuc) >= 2),
             |ds AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
             |    COALESCE(SUM((2 * (CAST(nu AS HUGEINT) * nu - s2u)
             |      * 1000000 + (nu - 1)) // (2 * (nu - 1))), 0) AS dd
             |  FROM pu),
             |mg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
             |    COALESCE(SUM(nc), 0) AS n,
             |    COALESCE(SUM(CAST(nc AS HUGEINT) * nc), 0) AS sc2
             |  FROM (SELECT c, SUM(nuc) AS nc
             |    FROM cell JOIN pu USING (u) GROUP BY 1))
             |SELECT ds.n_units, CAST(mg.n AS BIGINT) AS n_values,
             |  mg.n_categories,
             |  CAST(CASE WHEN mg.n > 0
             |    THEN (2 * dd + mg.n) // (2 * mg.n) END AS BIGINT)
             |    AS do_ppm,
             |  CAST(CASE WHEN mg.n > 1
             |      AND CAST(mg.n AS HUGEINT) * mg.n - sc2 > 0 THEN
             |    (2 * (CAST(mg.n AS HUGEINT) * mg.n - sc2) * 1000000
             |      + CAST(mg.n AS HUGEINT) * (mg.n - 1))
             |      // (2 * CAST(mg.n AS HUGEINT) * (mg.n - 1)) END
             |    AS BIGINT) AS de_ppm,
             |  CAST(CASE WHEN mg.n > 1
             |      AND CAST(mg.n AS HUGEINT) * mg.n - sc2 > 0 THEN
             |    1000000 - (2 * CAST(dd AS HUGEINT) * (mg.n - 1)
             |      + (CAST(mg.n AS HUGEINT) * mg.n - sc2))
             |      // (2 * (CAST(mg.n AS HUGEINT) * mg.n - sc2)) END
             |    AS BIGINT) AS alpha_ppm
             |FROM ds, mg""".stripMargin)),

    // ---- E37: best-of-n rejection sampling (reward -> SFT selection) -----
    // 40 prompts, rewards the deterministic micro spread
    // (event_id * 7919) % 1000001, top-3 per prompt. The oracle replays
    // the (reward desc, resp asc) ranking and the per-prompt sample
    // count.
    Q("q_e37_best_of_n",
      (s, d) => graft.operators.Preferences.bestOfN(
        Tables.events(s, d)
          .select((col("event_id") % 40).as("prompt"),
            col("event_id").as("resp"),
            ((col("event_id") * 7919) % 1000001).as("reward")),
        "prompt", "resp", "reward", k = 3),
      Some("""WITH s AS (SELECT event_id % 40 AS prompt,
             |    event_id AS resp,
             |    (event_id * 7919) % 1000001 AS reward
             |  FROM events),
             |ns AS (SELECT prompt, CAST(COUNT(*) AS BIGINT) AS n_samples
             |  FROM s GROUP BY 1),
             |r AS (SELECT prompt, resp, reward,
             |    row_number() OVER (PARTITION BY prompt
             |      ORDER BY reward DESC, resp) AS rnk
             |  FROM s)
             |SELECT r.prompt, CAST(r.rnk AS BIGINT) AS rank, r.resp,
             |  CAST(r.reward AS BIGINT) AS reward_micros, ns.n_samples
             |FROM r JOIN ns USING (prompt) WHERE r.rnk <= 3""".stripMargin)),

    // ---- E36: Fleiss' kappa (multi-rater agreement) -----------------------
    // A 29-item / 3-rater panel synthesized from events: rater =
    // user_id % 3, item = event_id % 29, each (item, rater) cell
    // resolved to ONE rating (min event_type — deterministic), items
    // kept only when the panel is complete (all 3 raters) — the
    // operator's own uniformity contract. The oracle replays the cell
    // counts, S2/E2, the exact rational P_o/P_e, and the sign-split
    // half-up kappa.
    Q("q_e36_fleiss_kappa",
      (s, d) => {
        val ratings = Tables.events(s, d)
          .filter(col("user_id").isNotNull && col("event_type").isNotNull)
          .select((col("event_id") % 29).as("item"),
            (col("user_id") % 3).as("rater"), col("event_type"))
          .groupBy(col("item"), col("rater"))
          .agg(min(col("event_type")).as("category"))
        val complete = ratings.groupBy(col("item"))
          .agg(count(lit(1)).as("__k")).filter(col("__k") === 3)
          .select(col("item"))
        graft.operators.Profile.fleissKappa(
          ratings.join(complete, Seq("item")), "item", "category")
      },
      Some("""WITH r AS (SELECT event_id % 29 AS item,
             |    user_id % 3 AS rater, MIN(event_type) AS category
             |  FROM events
             |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
             |  GROUP BY 1, 2),
             |fullp AS (SELECT item FROM r GROUP BY 1 HAVING COUNT(*) = 3),
             |lab AS (SELECT r.item, r.category
             |  FROM r JOIN fullp USING (item)),
             |cell AS (SELECT item, category, COUNT(*) AS nij
             |  FROM lab GROUP BY 1, 2),
             |per AS (SELECT item, SUM(nij) AS ni, SUM(nij * nij) AS s2i
             |  FROM cell GROUP BY 1),
             |h AS (SELECT COUNT(*) AS n_items, MIN(ni) AS nr,
             |    SUM(s2i) AS s2 FROM per),
             |cs AS (SELECT COUNT(*) AS n_categories,
             |    SUM(CAST(tj AS HUGEINT) * tj) AS e2
             |  FROM (SELECT category, SUM(nij) AS tj FROM cell GROUP BY 1)),
             |z AS (SELECT h.n_items, h.nr, cs.n_categories, h.s2, cs.e2,
             |    CAST(h.n_items AS HUGEINT) * h.nr AS m
             |  FROM h, cs),
             |k AS (SELECT *,
             |    m * (s2 - m) - e2 * (nr - 1) AS num,
             |    (nr - 1) * (m * m - e2) AS den
             |  FROM z)
             |SELECT CAST(n_items AS BIGINT) AS n_items,
             |  CAST(nr AS BIGINT) AS n_raters,
             |  CAST(n_categories AS BIGINT) AS n_categories,
             |  CAST((2 * (s2 - m) * 1000000 + m * (nr - 1))
             |    // (2 * m * (nr - 1)) AS BIGINT) AS po_ppm,
             |  CAST((2 * e2 * 1000000 + m * m) // (2 * m * m) AS BIGINT)
             |    AS pe_ppm,
             |  CAST(CASE WHEN den <> 0 THEN
             |    CASE WHEN num < 0
             |      THEN -((2 * (-num) * 1000000 + den) // (2 * den))
             |      ELSE (2 * num * 1000000 + den) // (2 * den) END
             |    END AS BIGINT) AS kappa_ppm
             |FROM k""".stripMargin)),

    // ---- E28/E29: pairwise-preference aggregation (RLHF data ops) -------
    // A preference corpus synthesized engine-independently from events:
    // 8 candidates, base direction the ROTATIONAL tournament (a beats b
    // iff (b-a) mod 8 in 1..3 — maximally cyclic, so the audit has real
    // cycles to find), 20% of judgments flipped by rater (user_id % 5 =
    // 0) as noise. Copeland in exact halves; the cycle audit counts
    // majority-tournament 3-cycles over the candidates^2-bounded edge
    // relation.
    Q("q_e28_copeland",
      (s, d) => {
        val prefs = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select((col("event_id") % 8).as("m1"),
            expr("(event_id div 8) % 8").as("m2"), col("user_id"))
          .filter(col("m1") =!= col("m2"))
          .select(
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m1")).otherwise(col("m2"))
              .as("winner"),
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m2")).otherwise(col("m1"))
              .as("loser"))
        graft.operators.Preferences.copelandScores(prefs, "winner", "loser")
      },
      Some("""WITH pr AS (
             |  SELECT CASE WHEN win1 THEN m1 ELSE m2 END AS winner,
             |    CASE WHEN win1 THEN m2 ELSE m1 END AS loser
             |  FROM (SELECT m1, m2,
             |      (((m2 - m1) + 8) % 8 BETWEEN 1 AND 3)
             |        <> (user_id % 5 = 0) AS win1
             |    FROM (SELECT event_id % 8 AS m1, (event_id // 8) % 8 AS m2,
             |        user_id FROM events WHERE user_id IS NOT NULL)
             |    WHERE m1 <> m2)),
             |p AS (SELECT LEAST(winner, loser) AS a,
             |    GREATEST(winner, loser) AS b,
             |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw FROM pr),
             |pc AS (SELECT a, b, SUM(aw) AS wab, COUNT(*) - SUM(aw) AS wba
             |  FROM p GROUP BY 1, 2),
             |side AS (
             |  SELECT a AS candidate, (wab > wba)::int AS w,
             |    (wab = wba)::int AS t FROM pc
             |  UNION ALL
             |  SELECT b, (wba > wab)::int, (wab = wba)::int FROM pc)
             |SELECT candidate, CAST(SUM(w) AS BIGINT) AS n_wins,
             |  CAST(SUM(t) AS BIGINT) AS n_ties,
             |  CAST(COUNT(*) - SUM(w) - SUM(t) AS BIGINT) AS n_losses,
             |  CAST(COUNT(*) AS BIGINT) AS n_opponents,
             |  CAST(SUM(w) * 2 + SUM(t) AS BIGINT) AS copeland_x2
             |FROM side GROUP BY 1""".stripMargin)),

    Q("q_e29_pref_cycles",
      (s, d) => {
        val prefs = Tables.events(s, d)
          .filter(col("user_id").isNotNull)
          .select((col("event_id") % 8).as("m1"),
            expr("(event_id div 8) % 8").as("m2"), col("user_id"))
          .filter(col("m1") =!= col("m2"))
          .select(
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m1")).otherwise(col("m2"))
              .as("winner"),
            when(expr("((m2 - m1) + 8) % 8 between 1 and 3") =!=
              (col("user_id") % 5 === 0), col("m2")).otherwise(col("m1"))
              .as("loser"))
        graft.operators.Preferences.cycleAudit(prefs, "winner", "loser")
      },
      Some("""WITH pr AS (
             |  SELECT CASE WHEN win1 THEN m1 ELSE m2 END AS winner,
             |    CASE WHEN win1 THEN m2 ELSE m1 END AS loser
             |  FROM (SELECT m1, m2,
             |      (((m2 - m1) + 8) % 8 BETWEEN 1 AND 3)
             |        <> (user_id % 5 = 0) AS win1
             |    FROM (SELECT event_id % 8 AS m1, (event_id // 8) % 8 AS m2,
             |        user_id FROM events WHERE user_id IS NOT NULL)
             |    WHERE m1 <> m2)),
             |p AS (SELECT LEAST(winner, loser) AS a,
             |    GREATEST(winner, loser) AS b,
             |    CASE WHEN winner <= loser THEN 1 ELSE 0 END AS aw FROM pr),
             |pc AS (SELECT a, b, SUM(aw) AS wab, COUNT(*) - SUM(aw) AS wba
             |  FROM p GROUP BY 1, 2),
             |edges AS (SELECT CASE WHEN wab > wba THEN a ELSE b END AS src,
             |    CASE WHEN wab > wba THEN b ELSE a END AS dst
             |  FROM pc WHERE wab <> wba)
             |SELECT
             |  (SELECT COUNT(DISTINCT c) FROM
             |    (SELECT a AS c FROM pc UNION ALL SELECT b FROM pc))
             |    AS n_candidates,
             |  (SELECT COUNT(*) FROM edges) AS n_edges,
             |  CAST((SELECT COUNT(*) FROM edges e1
             |    JOIN edges e2 ON e1.dst = e2.src
             |    JOIN edges e3 ON e2.dst = e3.src AND e3.dst = e1.src)
             |    // 3 AS BIGINT) AS n_cycles""".stripMargin)),

    Q("q_e27_rfm",
      (s, d) => graft.operators.Behavior.rfmSegments(
        Tables.events(s, d), "user_id", "event_type", "ts", "value",
        purchaseType = "purchase", bins = 5),
      Some("""WITH per AS (
             |  SELECT user_id,
             |    MAX(epoch_us(ts)) AS recency_us,
             |    COUNT(*) AS frequency,
             |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             |      AS monetary
             |  FROM events
             |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
             |  GROUP BY 1),
             |c AS (SELECT
             |    ROUND(quantile_cont(recency_us, 0.2), 6) AS r1,
             |    ROUND(quantile_cont(recency_us, 0.4), 6) AS r2,
             |    ROUND(quantile_cont(recency_us, 0.6), 6) AS r3,
             |    ROUND(quantile_cont(recency_us, 0.8), 6) AS r4,
             |    ROUND(quantile_cont(frequency, 0.2), 6) AS f1,
             |    ROUND(quantile_cont(frequency, 0.4), 6) AS f2,
             |    ROUND(quantile_cont(frequency, 0.6), 6) AS f3,
             |    ROUND(quantile_cont(frequency, 0.8), 6) AS f4,
             |    ROUND(quantile_cont(monetary, 0.2), 6) AS m1,
             |    ROUND(quantile_cont(monetary, 0.4), 6) AS m2,
             |    ROUND(quantile_cont(monetary, 0.6), 6) AS m3,
             |    ROUND(quantile_cont(monetary, 0.8), 6) AS m4
             |  FROM per),
             |sc AS (SELECT user_id,
             |    CAST(1 + (recency_us > r1)::int + (recency_us > r2)::int
             |      + (recency_us > r3)::int + (recency_us > r4)::int AS INT)
             |      AS r_score,
             |    CAST(1 + (frequency > f1)::int + (frequency > f2)::int
             |      + (frequency > f3)::int + (frequency > f4)::int AS INT)
             |      AS f_score,
             |    CAST(1 + (monetary > m1)::int + (monetary > m2)::int
             |      + (monetary > m3)::int + (monetary > m4)::int AS INT)
             |      AS m_score
             |  FROM per, c)
             |SELECT user_id, r_score, f_score, m_score,
             |  CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
             |FROM sc""".stripMargin)),

    // ---- E26: top user paths (the Sankey/flow report) --------------------
    // Each user's first-5-event path string, counted corpus-wide, top 10
    // by (count desc, path asc). The per-user prefix filters to 5 rows
    // BEFORE any collection (bot-proof); the top-k compiles to
    // TakeOrderedAndProject.
    Q("q_e26_top_paths",
      (s, d) => graft.operators.Behavior.topPaths(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id",
        pathLen = 5, k = 10),
      Some("""WITH r AS (SELECT user_id, event_type,
             |    row_number() OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS rn
             |  FROM events),
             |p AS (SELECT user_id,
             |    string_agg(event_type, '>' ORDER BY rn) AS path
             |  FROM r WHERE rn <= 5 GROUP BY 1),
             |c AS (SELECT path, COUNT(*) AS n FROM p GROUP BY 1)
             |SELECT path, n FROM c ORDER BY n DESC, path LIMIT 10"""
        .stripMargin)),

    // ---- E25: first-order Markov transition matrix -----------------------
    // The path-analysis primitive: per-user event sequences (ts order,
    // event_id tiebreak) reduce to the |types|^2 transition relation with
    // exact-micro conditional probabilities ((2a+b) div (2b) half-up —
    // pure long arithmetic, every cell oracle-replayable). The row-total
    // window runs over the 25-row AGGREGATED relation, never the stream.
    Q("q_e25_markov_transitions",
      (s, d) => graft.operators.Behavior.markovTransitions(
        Tables.events(s, d), "user_id", "event_type", "ts", "event_id"),
      Some("""WITH p AS (SELECT user_id, event_type AS from_type,
             |    lead(event_type) OVER (
             |      PARTITION BY user_id ORDER BY ts, event_id) AS to_type
             |  FROM events),
             |c AS (SELECT from_type, to_type, COUNT(*) AS n
             |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2),
             |t AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY from_type)
             |    AS BIGINT) AS rt
             |  FROM c)
             |SELECT from_type, to_type, n,
             |  CAST((2 * n * 1000000 + rt) // (2 * rt) AS BIGINT) AS p_micros
             |FROM t""".stripMargin)),

    Q("q_e24_timedecay_attribution",
      (s, d) => graft.operators.Behavior.timeDecayAttribution(
        Tables.events(s, d), convType = "purchase",
        touchTypes = Seq("click", "view"),
        lookbackMicros = 7L * 86400L * 1000000L,
        halfLifeMicros = 86400L * 1000000L),
      Some("""WITH cv AS (
             |  SELECT event_id, user_id, ts AS conv_ts FROM events
             |  WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |tch AS (
             |  SELECT user_id, ts AS touch_ts, event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |j AS (
             |  SELECT c.event_id, c.user_id, c.conv_ts, t.channel,
             |    GREATEST(CAST(1000000 AS BIGINT) // (CAST(1 AS BIGINT) <<
             |      CAST((epoch_us(c.conv_ts) - epoch_us(t.touch_ts)) //
             |        86400000000 AS INT)), 1) AS w
             |  FROM cv c JOIN tch t ON t.user_id = c.user_id
             |    AND t.touch_ts <= c.conv_ts
             |    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY),
             |tot AS (SELECT event_id, SUM(w) AS tw FROM j GROUP BY 1),
             |cw AS (SELECT event_id, user_id, conv_ts, channel,
             |    SUM(w) AS chw
             |  FROM j GROUP BY 1, 2, 3, 4)
             |SELECT cw.event_id, cw.user_id, cw.conv_ts, cw.channel,
             |  CAST(cw.chw * 1000000 // tot.tw AS BIGINT) AS credit_m
             |FROM cw JOIN tot USING (event_id)
             |UNION ALL
             |SELECT c.event_id, c.user_id, c.conv_ts,
             |  CAST(NULL AS VARCHAR) AS channel,
             |  CAST(1000000 AS BIGINT) AS credit_m
             |FROM cv c WHERE NOT EXISTS (
             |  SELECT 1 FROM j WHERE j.event_id = c.event_id)""".stripMargin)),

    // ---- E23: position-based (U-shaped 40/20/40) attribution ------------
    // First in-window touch 40%, last 40%, middles share 20% integrally;
    // 1 touch takes all, 2 split 50/50; organic keeps 1e6 on NULL. The
    // oracle replays the same row_number order (touch_ts, channel).
    Q("q_e23_position_attribution",
      (s, d) => graft.operators.Behavior.positionAttribution(
        Tables.events(s, d), convType = "purchase",
        touchTypes = Seq("click", "view"),
        lookbackMicros = 7L * 86400L * 1000000L),
      Some("""WITH cv AS (
             |  SELECT event_id, user_id, ts AS conv_ts FROM events
             |  WHERE event_type = 'purchase'
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |tch AS (
             |  SELECT user_id, ts AS touch_ts, event_type AS channel
             |  FROM events WHERE event_type IN ('click', 'view')
             |    AND user_id IS NOT NULL AND ts IS NOT NULL),
             |j AS (
             |  SELECT c.event_id, c.user_id, c.conv_ts, t.channel,
             |    ROW_NUMBER() OVER (PARTITION BY c.event_id
             |      ORDER BY t.touch_ts, t.channel) AS rn,
             |    COUNT(*) OVER (PARTITION BY c.event_id) AS n
             |  FROM cv c JOIN tch t ON t.user_id = c.user_id
             |    AND t.touch_ts <= c.conv_ts
             |    AND t.touch_ts >= c.conv_ts - INTERVAL 7 DAY)
             |SELECT event_id, user_id, conv_ts, channel,
             |  CAST(SUM(CASE WHEN n = 1 THEN 1000000
             |    WHEN n = 2 THEN 500000
             |    WHEN rn = 1 OR rn = n THEN 400000
             |    ELSE 200000 // (n - 2) END) AS BIGINT) AS credit_m
             |FROM j GROUP BY 1, 2, 3, 4
             |UNION ALL
             |SELECT c.event_id, c.user_id, c.conv_ts,
             |  CAST(NULL AS VARCHAR) AS channel,
             |  CAST(1000000 AS BIGINT) AS credit_m
             |FROM cv c WHERE NOT EXISTS (
             |  SELECT 1 FROM j WHERE j.event_id = c.event_id)""".stripMargin)),

    Q("q_e9_anomaly",
      (s, d) => graft.operators.Anomaly.zscores(
        Tables.events(s, d).select(col("event_id"), col("user_id"), col("value")),
        "user_id", "value", threshold = 2.0),
      Some("""WITH m AS (
             |  SELECT user_id, ROUND(AVG(value), 6) AS mean,
             |         ROUND(STDDEV_SAMP(value), 6) AS sd
             |  FROM events GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.value,
             |  CASE WHEN m.sd > 0
             |       THEN ROUND((e.value - m.mean) / m.sd, 6) END AS z,
             |  COALESCE(CASE WHEN m.sd > 0
             |       THEN ABS(ROUND((e.value - m.mean) / m.sd, 6)) >= 2.0 END,
             |    FALSE) AS is_anomaly
             |FROM events e
             |JOIN m ON e.user_id IS NOT DISTINCT FROM m.user_id""".stripMargin)),

    // ---- E13: streaming anomaly flags vs a history-moments snapshot -----
    // The q_e7 discipline: the batch query runs the STREAMING operator
    // itself. Moments train on the even-id history half; every event
    // (including cold-start odd-only users, if any) scores against that
    // snapshot — unlike q_e9, which scores each key against its own
    // full-stream distribution.
    Q("q_e13_stream_anomaly",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("value"))
        val mom = graft.operators.Anomaly.moments(
          ev.filter(col("event_id") % 2 === 0), "user_id", "value")
        graft.streaming.EventStreams.anomalyFlags(ev, mom, threshold = 2.0)
      },
      Some("""WITH m AS (
             |  SELECT user_id, ROUND(AVG(value), 6) AS mean,
             |         ROUND(STDDEV_SAMP(value), 6) AS sd
             |  FROM events WHERE event_id % 2 = 0 GROUP BY 1)
             |SELECT e.event_id, e.user_id, e.value,
             |  CASE WHEN m.sd > 0
             |       THEN ROUND((e.value - m.mean) / m.sd, 6) END AS z,
             |  COALESCE(CASE WHEN m.sd > 0
             |       THEN ABS(ROUND((e.value - m.mean) / m.sd, 6)) >= 2.0 END,
             |    FALSE) AS is_anomaly
             |FROM events e
             |LEFT JOIN m ON e.user_id IS NOT DISTINCT FROM m.user_id""".stripMargin)),

    // ---- E10: SCD type-2 dimension build from the event change log ------
    // Change compression (consecutive equal states collapse) + validity
    // intervals via lead(); the oracle replays both window passes.
    Q("q_e10_scd2",
      (s, d) => graft.operators.Scd.type2(
        Tables.events(s, d).select(col("user_id"), col("ts"), col("event_type")),
        "user_id", "ts", "event_type"),
      Some("""WITH u AS (
             |  SELECT user_id, ts, MAX(event_type) AS event_type
             |  FROM events GROUP BY 1, 2),
             |c AS (
             |  SELECT user_id, ts, event_type,
             |    lag(event_type) OVER w AS pv,
             |    row_number() OVER w AS rn
             |  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |k AS (SELECT user_id, ts, event_type FROM c
             |      WHERE rn = 1 OR pv IS DISTINCT FROM event_type)
             |SELECT user_id, event_type, ts AS valid_from,
             |  lead(ts) OVER w2 AS valid_to,
             |  lead(ts) OVER w2 IS NULL AS is_current
             |FROM k WINDOW w2 AS (PARTITION BY user_id ORDER BY ts)""".stripMargin)),

    // ---- E18: point-in-time join against the SCD2 dimension -------------
    // Each click is enriched with the user's status (last signup/purchase
    // state) AS OF the click — the leak-free temporal lookup an SCD2
    // dimension exists to serve. Operator = native as-of join + closed-
    // interval guard; the oracle replays the dimension build (the q_e10
    // chain on the filtered change stream) and joins by interval
    // containment — equivalent on a gapless dimension, which is exactly
    // what type2 produces.
    Q("q_e18_pit_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val dim = graft.operators.Scd.type2(
          ev.filter(col("event_type").isin("signup", "purchase"))
            .select(col("user_id"), col("ts"), col("event_type").as("status")),
          "user_id", "ts", "status")
          .withColumnRenamed("user_id", "pit_user")
        val facts = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        graft.operators.Scd.pointInTime(facts, dim,
            "user_id", "pit_user", "ts", "status")
          .select(col("event_id"), col("user_id"), col("ts"), col("status"))
      },
      Some("""WITH ch AS (
             |  SELECT user_id, ts, MAX(event_type) AS status
             |  FROM events WHERE event_type IN ('signup', 'purchase')
             |  GROUP BY 1, 2),
             |c AS (
             |  SELECT user_id, ts, status, lag(status) OVER w AS pv,
             |    row_number() OVER w AS rn
             |  FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
             |k AS (SELECT user_id, ts, status FROM c
             |      WHERE rn = 1 OR pv IS DISTINCT FROM status),
             |dim AS (
             |  SELECT user_id, status, ts AS valid_from,
             |    lead(ts) OVER w2 AS valid_to
             |  FROM k WINDOW w2 AS (PARTITION BY user_id ORDER BY ts))
             |SELECT f.event_id, f.user_id, f.ts, d.status
             |FROM events f LEFT JOIN dim d ON d.user_id = f.user_id
             |  AND d.valid_from <= f.ts
             |  AND (d.valid_to IS NULL OR f.ts < d.valid_to)
             |WHERE f.event_type = 'click'""".stripMargin)),

    // ---- E4: dedup-keep-first (deterministic dropDuplicates) ------------
    Q("q_e4_dedup_first",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type"),
            col("ts").as("first_ts"), col("event_id").as("first_event_id"))
      },
      Some("""SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
             |FROM (SELECT *, row_number() OVER (
             |        PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
             |      FROM events)
             |WHERE rn = 1""".stripMargin)),

    // ---- J6: native as-of join (custom LogicalPlan/Strategy/Exec) -------
    // Same business question as q_j5_asof_join but through the
    // whole-operator extension tier: clicks as-of-join the latest
    // prior-or-equal error per user. Tie semantics are the operator's own
    // (time <= time, id-independent), hence its own oracle.
    Q("q_j6_asof_native",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
        graft.plans.AsOfJoin.asofJoin(clicks, errors,
            "user_id", "err_user", "ts", "err_ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("err_ts").as("asof_error_ts"))
      },
      Some("""SELECT c.event_id, c.user_id, c.ts, max(e.ts) AS asof_error_ts
             |FROM events c LEFT JOIN events e
             |  ON e.event_type = 'error' AND e.user_id = c.user_id
             |    AND e.ts <= c.ts
             |WHERE c.event_type = 'click'
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- J11: native as-of, forward direction + tolerance ---------------
    // The other half of the operator's mode matrix under an oracle (q_j6
    // covers backward/unbounded): nearest error at-or-after each click,
    // but only within 5 minutes. Tolerance is in the time column's own
    // units — micros for timestamps.
    Q("q_j11_asof_forward_tol",
      (s, d) => {
        val e = Tables.events(s, d)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
        val errors = e.filter(col("event_type") === "error")
          .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
        graft.plans.AsOfJoin.asofJoin(clicks, errors,
            "user_id", "err_user", "ts", "err_ts",
            tolerance = Some(300000000L), forward = true)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("err_ts").as("next_error_ts"))
      },
      Some("""SELECT c.event_id, c.user_id, c.ts, min(e.ts) AS next_error_ts
             |FROM events c LEFT JOIN events e
             |  ON e.event_type = 'error' AND e.user_id = c.user_id
             |    AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 5 MINUTE
             |WHERE c.event_type = 'click'
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- J10: the SAME native as-of operator, reached from SQL text -----
    // `asof_join(...)` is a table-valued function wired by GraftExtensions
    // (spark.sql.extensions=graft.plans.GraftExtensions), so raw-SQL users
    // get the custom operator too — same plan, same oracle as q_j6.
    Q("q_j10_asof_sql",
      (s, d) => {
        val e = Tables.events(s, d)
        e.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts"))
          .createOrReplaceTempView("graft_asof_clicks")
        e.filter(col("event_type") === "error")
          .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
          .createOrReplaceTempView("graft_asof_errors")
        s.sql("""SELECT event_id, user_id, ts, err_ts AS asof_error_ts
                |FROM asof_join('graft_asof_clicks', 'graft_asof_errors',
                |               'user_id', 'err_user', 'ts', 'err_ts')""".stripMargin)
      },
      Some("""SELECT c.event_id, c.user_id, c.ts, max(e.ts) AS asof_error_ts
             |FROM events c LEFT JOIN events e
             |  ON e.event_type = 'error' AND e.user_id = c.user_id
             |    AND e.ts <= c.ts
             |WHERE c.event_type = 'click'
             |GROUP BY 1, 2, 3""".stripMargin)),

    // ---- E6: map-typed column surface (from_json → MapType ops) ---------
    // Generic on the Spark side (any key set); the oracle exploits the
    // single-key shape of the test data for the value sum only.
    Q("q_e6_map_ops",
      (s, d) => {
        val m = from_json(col("props"),
          org.apache.spark.sql.types.DataType.fromDDL("map<string,int>"))
        Tables.events(s, d).select(col("event_id"), m.as("m"))
          .select(col("event_id"),
            size(col("m")).as("n_keys"),
            array_join(array_sort(map_keys(col("m"))), ",").as("keys_csv"),
            aggregate(map_values(col("m")), lit(0), (a, v) => a + v).as("vals_sum"))
      },
      Some("""SELECT event_id,
             |  CAST(len(json_keys(props)) AS INT) AS n_keys,
             |  array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
             |  CAST(json_extract(props, '$.k') AS INT) AS vals_sum
             |FROM events""".stripMargin)),

    // ---- E5: JSON extraction from the props column ----------------------
    Q("q_e5_json_extract",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_val")),
      Some("""SELECT event_id, json_extract_string(props, '$.k') AS k_val
             |FROM events""".stripMargin)),

    // ---- E19: VARIANT semi-structured extraction ------------------------
    // The Spark-4 successor to per-path get_json_object: parse the props
    // JSON ONCE into a VARIANT value and extract many typed paths from
    // the binary encoding — at 100 TB the repeated-extraction pattern
    // stops re-parsing the string per path (q_e5 keeps the legacy
    // single-path shape under its own oracle). Typed int + string
    // extraction and a missing path (clean NULL, not an error) all
    // replay exactly in the JSON oracle.
    Q("q_e19_variant_props",
      (s, d) => Tables.events(s, d)
        .withColumn("v", parse_json(col("props")))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k_int"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("variant_get(v, '$.missing', 'string')").as("absent")),
      Some("""SELECT event_id,
             |  CAST(json_extract(props, '$.k') AS INT) AS k_int,
             |  json_extract_string(props, '$.k') AS k_str,
             |  CAST(NULL AS VARCHAR) AS absent
             |FROM events""".stripMargin)),

    // ---- E14: ordered funnel reach (view → click → purchase) ------------
    // Canonical funnel semantics: earliest qualifying event per user per
    // stage, each stage strictly after the user's FIRST completion of the
    // previous one. The oracle replays the stage recursion as CTEs.
    Q("q_e14_funnel",
      (s, d) => graft.operators.Behavior.funnel(Tables.events(s, d),
        Seq("view", "click", "purchase")),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
             |  WHERE e.event_type = 'purchase' GROUP BY 1)
             |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
             |       (SELECT count(*) FROM s1) AS users
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin)),

    // ---- E16: windowed funnel (1-hour conversion deadline per stage) ----
    // Same stage recursion as q_e14 with the standard product-analytics
    // deadline: each stage must land within an hour of the previous
    // stage's completion (the filter bites hard on this corpus: 150 → 3
    // users at stage 2, sf0.01).
    Q("q_e16_funnel_window",
      (s, d) => graft.operators.Behavior.funnel(Tables.events(s, d),
        Seq("view", "click", "purchase"), withinSeconds = Some(3600L)),
      Some("""WITH s1 AS (
             |  SELECT user_id, min(ts) AS t FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |s2 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
             |    AND e.ts <= s1.t + INTERVAL 1 HOUR
             |  WHERE e.event_type = 'click' GROUP BY 1),
             |s3 AS (
             |  SELECT e.user_id, min(e.ts) AS t FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
             |    AND e.ts <= s2.t + INTERVAL 1 HOUR
             |  WHERE e.event_type = 'purchase' GROUP BY 1)
             |SELECT CAST(1 AS INT) AS step, 'view' AS event_type,
             |       (SELECT count(*) FROM s1) AS users
             |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
             |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3)""".stripMargin)),

    // ---- E17: event-level sessionization (gaps-and-islands tag) ---------
    // Same >= break rule as the session-window aggregate (q_e3), so the
    // two agree on boundaries; ids are user#n in time order.
    Q("q_e17_sessionize",
      (s, d) => graft.operators.Behavior.sessionize(Tables.events(s, d))
        .select(col("event_id"), col("user_id"), col("ts"), col("session_id")),
      Some("""WITH o AS (
             |  SELECT event_id, user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
             |      THEN 1 ELSE 0 END AS brk
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
             |SELECT event_id, user_id, ts,
             |  CAST(user_id AS VARCHAR) || '#' || CAST(
             |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |                   ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS session_id
             |FROM o""".stripMargin)),

    // ---- E15: weekly retention cohorts ----------------------------------
    // Cohort = Monday-truncated week of first activity; one row per
    // (cohort, week offset) with retained distinct users. offset 0 is the
    // cohort size.
    Q("q_e15_retention",
      (s, d) => graft.operators.Behavior.retention(Tables.events(s, d)),
      Some("""WITH wk AS (
             |  SELECT DISTINCT user_id,
             |    CAST(date_trunc('week', ts) AS DATE) AS w
             |  FROM events),
             |c AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1)
             |SELECT c.cohort_week,
             |  CAST(date_diff('day', c.cohort_week, wk.w) // 7 AS INT) AS week_offset,
             |  count(*) AS users
             |FROM wk JOIN c ON wk.user_id = c.user_id
             |GROUP BY 1, 2""".stripMargin))
  )
}
