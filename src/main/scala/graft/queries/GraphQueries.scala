package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Graph
import graft.sources.Tables

/** Graph-ranking surface: PageRank over the customer↔supplier trade
  * graph (distinct (customer, supplier) pairs from orders ⋈ lineitem,
  * one directed edge each way — the undirected-projection construction,
  * which also guarantees no dangling nodes in THIS query; the operator
  * itself handles danglers by uniform redistribution). The DuckDB oracle
  * unrolls the same power iteration round by round in integer
  * micro-rank units — exact integer sums, floor(x + 0.5) quantization,
  * every float step a single IEEE double op — so the replay is
  * bit-exact.
  */
object GraphQueries extends graft.QueryPack {

  private val iters = 5
  private val pprIters = 3
  private val hitsIters = 3
  private val lpaIters = 3
  private val kcoreIters = 10
  private val bfsIters = 6

  /** One BFS oracle round: distance relation `prev` → `out`. Mirrors
    * [[Graph.bfsDepth]]'s min-merge (the oracle relaxes the WHOLE
    * relation where the engine relaxes only the frontier — identical
    * output, a settled node's re-relaxed dist+1 always loses the MIN).
    * Pure integers — exact. */
  private def bfsIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM $prev
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + 1 AS dist
       |    FROM e JOIN $prev p ON e.src = p.node)
       |  GROUP BY 1)""".stripMargin

  /** One weighted-SSSP oracle round — [[bfsIter]] with the edge weight
    * in the relaxation (FULL relaxation; round-for-round identical to
    * the engine's delta relaxation, see [[Graph.shortestPaths]]). */
  private def ssspIter(out: String, prev: String): String =
    s"""$out AS MATERIALIZED (SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM $prev
       |    UNION ALL
       |    SELECT e.dst AS node, p.dist + e.w AS dist
       |    FROM e JOIN $prev p ON e.src = p.node)
       |  GROUP BY 1)""".stripMargin

  /** One LPA oracle round: labels `prev` → labels `out`. Mirrors
    * [[Graph.labelPropagation]] op for op: in-neighbor label counts,
    * per-node max count, smallest label among the tied maxima, isolated
    * nodes keep their label. Integer counts + string min — exact. */
  private def lpaIter(out: String, prev: String): String =
    s"""$out AS (
       |  SELECT n.node, COALESCE(w.new_label, p.label) AS label
       |  FROM nodes n
       |  JOIN $prev p ON p.node = n.node
       |  LEFT JOIN (
       |    SELECT c.dst, MIN(c.label) AS new_label
       |    FROM (
       |      SELECT e.dst, p2.label, COUNT(*) AS cnt
       |      FROM e JOIN $prev p2 ON e.src = p2.node
       |      GROUP BY 1, 2) c
       |    JOIN (
       |      SELECT dst, MAX(cnt) AS mx FROM (
       |        SELECT e.dst, p3.label, COUNT(*) AS cnt
       |        FROM e JOIN $prev p3 ON e.src = p3.node
       |        GROUP BY 1, 2) GROUP BY 1) m
       |      ON m.dst = c.dst AND c.cnt = m.mx
       |    GROUP BY 1) w ON w.dst = n.node)""".stripMargin

  /** One k-core peeling oracle round over alive set `prev` → `out`
    * (keeping `s$n` as the degreed relation the final round projects):
    * recompute degrees over the `prev`-induced subgraph, keep nodes with
    * degree ≥ k. Mirrors [[Graph.kCore]] op for op — pure integers,
    * exact by construction; a converged round is a no-op, which is what
    * lets this fixed-round replay match the engine's early exit. */
  private def kcoreIter(n: Int, k: Int): String =
    s"""s$n AS MATERIALIZED (SELECT node, COUNT(*) AS degree FROM (
       |    SELECT e.a AS node FROM e
       |      JOIN a${n - 1} x ON x.node = e.a JOIN a${n - 1} y ON y.node = e.b
       |    UNION ALL
       |    SELECT e.b AS node FROM e
       |      JOIN a${n - 1} x ON x.node = e.a JOIN a${n - 1} y ON y.node = e.b)
       |  GROUP BY 1 HAVING COUNT(*) >= $k),
       |a$n AS MATERIALIZED (SELECT node FROM s$n)""".stripMargin

  /** One oracle iteration: micro-ranks `prev` → micro-ranks `out`.
    * Mirrors [[Graph.pageRank]] op for op: share = FLOOR(rank_m/outdeg
    * + 0.5) summed as exact integers; dangling mass = exact integer sum
    * of micro-ranks of nodes with no out-edges; new micro-rank =
    * FLOOR((1-d)*1e6 + d*(S + DM/n) + 0.5) — micros are PER NODE
    * (init 1e6 each, total mass n·1e6, normalized at output), float
    * literals CAST to DOUBLE because a bare 0.85 is a DECIMAL in
    * DuckDB, and no ROUND anywhere (its .5 tie-breaking differs
    * between engines). */
  private[queries] def duckIter(out: String, prev: String,
      e: String = "e", deg: String = "deg", nodes: String = "nodes",
      nn: String = "nn"): String =
    s"""$out AS (
       |  SELECT $nodes.node,
       |    CAST(FLOOR(
       |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * 1e6
       |      + CAST(0.85 AS DOUBLE) *
       |        (CAST(COALESCE(s.s, 0) AS DOUBLE)
       |         + CAST(dm.dm AS DOUBLE) / $nn.n)
       |      + 0.5) AS BIGINT) AS rank_m
       |  FROM $nodes
       |  CROSS JOIN $nn
       |  CROSS JOIN (
       |    SELECT COALESCE(SUM(r.rank_m), 0) AS dm
       |    FROM $prev r
       |    WHERE r.node NOT IN (SELECT src FROM $deg)) dm
       |  LEFT JOIN (
       |    SELECT $e.dst AS node,
       |      SUM(CAST(FLOOR(r.rank_m / $deg.outdeg + 0.5) AS BIGINT)) AS s
       |    FROM $e
       |    JOIN $prev r ON $e.src = r.node
       |    JOIN $deg ON $deg.src = $e.src
       |    GROUP BY 1) s ON s.node = $nodes.node)""".stripMargin

  /** One personalized-PageRank oracle iteration: micro-ranks `prev` →
    * `out`. Mirrors [[Graph.personalizedPageRank]] op for op — the seed
    * CASE (suppliers, `node LIKE 's:%'`) selects between the
    * restart+dangling expression (over the SEED count ss.s) and the
    * bare damped-contribution expression. Same FLOOR/CAST discipline
    * as [[duckIter]]. */
  private def pprIter(out: String, prev: String): String =
    s"""$out AS (
       |  SELECT nodes.node,
       |    CASE WHEN nodes.node LIKE 's:%' THEN
       |      CAST(FLOOR(
       |        (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * 1e6
       |        + CAST(0.85 AS DOUBLE) *
       |          (CAST(COALESCE(c.s, 0) AS DOUBLE)
       |           + CAST(dm.dm AS DOUBLE) / ss.s)
       |        + 0.5) AS BIGINT)
       |    ELSE
       |      CAST(FLOOR(CAST(0.85 AS DOUBLE) *
       |        CAST(COALESCE(c.s, 0) AS DOUBLE) + 0.5) AS BIGINT)
       |    END AS rank_m
       |  FROM nodes
       |  CROSS JOIN ss
       |  CROSS JOIN (
       |    SELECT COALESCE(SUM(r.rank_m), 0) AS dm
       |    FROM $prev r
       |    WHERE r.node NOT IN (SELECT src FROM deg)) dm
       |  LEFT JOIN (
       |    SELECT e.dst AS node,
       |      SUM(CAST(FLOOR(r.rank_m / deg.outdeg + 0.5) AS BIGINT)) AS s
       |    FROM e
       |    JOIN $prev r ON e.src = r.node
       |    JOIN deg ON deg.src = e.src
       |    GROUP BY 1) c ON c.node = nodes.node)""".stripMargin

  /** One WEIGHTED PageRank oracle iteration — [[duckIter]] with the
    * per-edge share `FLOOR(CAST(rank_m AS DOUBLE) * w / wsum + 0.5)`
    * (cast before the product, exactly like the engine). */
  private def wIter(out: String, prev: String): String =
    s"""$out AS (
       |  SELECT nodes.node,
       |    CAST(FLOOR(
       |      (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) * 1e6
       |      + CAST(0.85 AS DOUBLE) *
       |        (CAST(COALESCE(s.s, 0) AS DOUBLE)
       |         + CAST(dm.dm AS DOUBLE) / nn.n)
       |      + 0.5) AS BIGINT) AS rank_m
       |  FROM nodes
       |  CROSS JOIN nn
       |  CROSS JOIN (
       |    SELECT COALESCE(SUM(r.rank_m), 0) AS dm
       |    FROM $prev r
       |    WHERE r.node NOT IN (SELECT src FROM deg)) dm
       |  LEFT JOIN (
       |    SELECT e.dst AS node,
       |      SUM(CAST(FLOOR(CAST(r.rank_m AS DOUBLE) * e.w / deg.wsum
       |        + 0.5) AS BIGINT)) AS s
       |    FROM e
       |    JOIN $prev r ON e.src = r.node
       |    JOIN deg ON deg.src = e.src
       |    GROUP BY 1) s ON s.node = nodes.node)""".stripMargin

  /** One HITS oracle round: scores `s{n-1}` → `s{n}`. Mirrors
    * [[Graph.hits]] op for op — exact integer raw sums, then the
    * max-normalized rescale `FLOOR(raw·1e6/max + 0.5)` (two IEEE
    * double ops, no square roots), authorities first, hubs from the
    * NEW authorities. */
  private def hitsIter(n: Int): String =
    s"""ar$n AS (SELECT e.dst AS node, SUM(s.hub_m) AS raw
       |  FROM e JOIN s${n - 1} s ON s.node = e.src GROUP BY 1),
       |am$n AS (SELECT MAX(raw) AS mx FROM ar$n),
       |a$n AS (SELECT nodes.node,
       |    CAST(FLOOR(CAST(COALESCE(r.raw, 0) AS DOUBLE) * 1e6 / m.mx
       |      + 0.5) AS BIGINT) AS auth_m
       |  FROM nodes CROSS JOIN am$n m LEFT JOIN ar$n r ON r.node = nodes.node),
       |hr$n AS (SELECT e.src AS node, SUM(a.auth_m) AS raw
       |  FROM e JOIN a$n a ON a.node = e.dst GROUP BY 1),
       |hm$n AS (SELECT MAX(raw) AS mx FROM hr$n),
       |s$n AS (SELECT a.node, a.auth_m,
       |    CAST(FLOOR(CAST(COALESCE(r.raw, 0) AS DOUBLE) * 1e6 / m.mx
       |      + 0.5) AS BIGINT) AS hub_m
       |  FROM a$n a CROSS JOIN hm$n m LEFT JOIN hr$n r ON r.node = a.node)""".stripMargin

  def queries: Seq[Q] = Seq(

    // ---- G1: PageRank over the customer↔supplier trade graph ----------
    // Per round: one src-keyed equi-join + one dst-keyed agg (map-side
    // partial) + one keys-sized left join — the only shape that holds at
    // a 100 TB edge list. Fixed iteration count, lineage checkpointed.
    Q("q_g1_pagerank",
      (s, d) => {
        val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("ss").as("dst"))
          .unionAll(pairs.select(col("ss").as("src"), col("c").as("dst")))
        Graph.pageRank(edges, iters)
      },
      Some(s"""WITH p AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (
             |  SELECT c AS src, ss AS dst FROM p
             |  UNION ALL
             |  SELECT ss AS src, c AS dst FROM p),
             |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |r0 AS (
             |  SELECT node, CAST(1000000 AS BIGINT) AS rank_m FROM nodes),
             |${(1 to iters).map(i => duckIter(s"r$i", s"r${i - 1}")).mkString(",\n")}
             |SELECT node, CAST(rank_m AS DOUBLE) / 1e6 / nn.n AS rank
             |FROM r$iters CROSS JOIN nn""".stripMargin)),

    // ---- X102: web-graph host-quality gate (the composed signal) --------
    // canonicalUrl -> host -> DISTINCT host link graph -> pageRank ->
    // per-doc feature, under ONE oracle: 20 planted hosts (doc's own
    // host = doc_id % 20 behind canonicalization noise — casing,
    // default port, tracking params, fragment), two out-links per doc
    // to arithmetically-derived hosts. The oracle shortcuts the URL
    // noise to the host values canonicalUrl provably produces and
    // replays the distinct edge build + 3 PageRank rounds (q_g1's
    // duckIter discipline).
    Q("q_x102_host_rank_gate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // canonicalization noise: casing, USERINFO (every third doc),
        // default port, tracking params — the oracle shortcuts to the
        // bare host, so the hash proves each strip works
        val ownUrl = concat(lit("HTTP://"),
          when(col("doc_id") % 3 === 0, lit("crawler:t0k@")).otherwise(lit("")),
          lit("H"), (col("doc_id") % 20).cast("string"),
          lit(".COM:80/p/"), col("doc_id").cast("string"),
          lit("?utm_source=x&a=1"))
        val links = docs.select(col("doc_id"), explode(array(
          concat(lit("https://h"), ((col("doc_id") * 7) % 20)
            .cast("string"), lit(".com:443/l?b=2")),
          concat(lit("https://h"), ((col("doc_id") * 13 + 3) % 20)
            .cast("string"), lit(".com/l2#frag")))).as("link_url"))
        graft.operators.TextAnalysis.hostRankFeature(
          docs.select(col("doc_id"), ownUrl.as("url")), "url",
          links, "link_url", iters = 3)
      },
      Some(s"""WITH dh AS (SELECT doc_id,
             |    'h' || CAST(doc_id % 20 AS VARCHAR) || '.com' AS host
             |  FROM documents),
             |lh AS (SELECT doc_id,
             |    'h' || CAST((doc_id * 7) % 20 AS VARCHAR) || '.com' AS lhost
             |  FROM documents
             |  UNION ALL SELECT doc_id,
             |    'h' || CAST((doc_id * 13 + 3) % 20 AS VARCHAR) || '.com'
             |  FROM documents),
             |e AS (SELECT DISTINCT d.host AS src, l.lhost AS dst
             |  FROM dh d JOIN lh l USING (doc_id) WHERE d.host <> l.lhost),
             |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |r0 AS (
             |  SELECT node, CAST(1000000 AS BIGINT) AS rank_m FROM nodes),
             |${(1 to 3).map(i => duckIter(s"r$i", s"r${i - 1}")).mkString(",\n")}
             |SELECT dh.doc_id, dh.host,
             |  CAST(r3.rank_m AS DOUBLE) / 1e6 / nn.n AS host_rank
             |FROM dh LEFT JOIN r3 ON r3.node = dh.host
             |CROSS JOIN nn""".stripMargin)),

    // ---- G2: personalized PageRank, supplier-seeded ---------------------
    // Same trade graph, restart mass teleporting to the SUPPLIER nodes
    // only — proximity-to-seed-set ranking (the whitelist-weighted
    // source scoring a web-corpus mixture uses), 3 rounds, same
    // integer micro-rank replay discipline as q_g1.
    Q("q_g2_ppr",
      (s, d) => {
        val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("ss").as("dst"))
          .unionAll(pairs.select(col("ss").as("src"), col("c").as("dst")))
        Graph.personalizedPageRank(edges,
          pairs.select(col("ss").as("node")), pprIters)
      },
      Some(s"""WITH p AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (
             |  SELECT c AS src, ss AS dst FROM p
             |  UNION ALL
             |  SELECT ss AS src, c AS dst FROM p),
             |deg AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |ss AS (SELECT COUNT(*) AS s FROM nodes WHERE node LIKE 's:%'),
             |r0 AS (
             |  SELECT node,
             |    CASE WHEN node LIKE 's:%'
             |      THEN CAST(1000000 AS BIGINT)
             |      ELSE 0 END AS rank_m
             |  FROM nodes),
             |${(1 to pprIters).map(i => pprIter(s"r$i", s"r${i - 1}")).mkString(",\n")}
             |SELECT node, CAST(rank_m AS DOUBLE) / 1e6 / ss.s AS rank
             |FROM r$pprIters CROSS JOIN ss""".stripMargin)),

    // ---- G4: WEIGHTED PageRank over the trade graph ---------------------
    // Edge weight = the number of orders linking the customer-supplier
    // pair: rank splits proportionally to trade intensity instead of
    // uniformly — the natural form for an aggregated edge relation.
    // 3 rounds, same per-node micro-unit replay discipline.
    Q("q_g4_wpagerank",
      (s, d) => {
        val w = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"),
            col("o_orderkey"))
          .distinct()
          .groupBy(col("c"), col("ss"))
          .agg(count(lit(1)).as("w"))
        val edges = w.select(col("c").as("src"), col("ss").as("dst"), col("w"))
          .unionAll(w.select(col("ss").as("src"), col("c").as("dst"), col("w")))
        Graph.pageRankWeighted(edges, pprIters)
      },
      Some(s"""WITH pw AS (
             |  SELECT c, ss, COUNT(*) AS w FROM (
             |    SELECT DISTINCT 'c:' || o_custkey AS c,
             |      's:' || l_suppkey AS ss, o_orderkey
             |    FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
             |  GROUP BY 1, 2),
             |e AS (
             |  SELECT c AS src, ss AS dst, w FROM pw
             |  UNION ALL
             |  SELECT ss AS src, c AS dst, w FROM pw),
             |deg AS (SELECT src, SUM(w) AS wsum FROM e GROUP BY 1),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |nn AS (SELECT COUNT(*) AS n FROM nodes),
             |r0 AS (
             |  SELECT node, CAST(1000000 AS BIGINT) AS rank_m FROM nodes),
             |${(1 to pprIters).map(i => wIter(s"r$i", s"r${i - 1}")).mkString(",\n")}
             |SELECT node, CAST(rank_m AS DOUBLE) / 1e6 / nn.n AS rank
             |FROM r$pprIters CROSS JOIN nn""".stripMargin)),

    // ---- G3: HITS hubs/authorities over the same trade graph -----------
    // Kleinberg's alternating iteration with exact-integer raw sums and
    // max-normalization (no square roots — replayable), 3 rounds, same
    // micro-unit replay discipline as q_g1/q_g2.
    Q("q_g3_hits",
      (s, d) => {
        val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("ss").as("dst"))
          .unionAll(pairs.select(col("ss").as("src"), col("c").as("dst")))
        Graph.hits(edges, hitsIters)
      },
      Some(s"""WITH p AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (
             |  SELECT c AS src, ss AS dst FROM p
             |  UNION ALL
             |  SELECT ss AS src, c AS dst FROM p),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS auth_m,
             |    CAST(1000000 AS BIGINT) AS hub_m
             |  FROM nodes),
             |${(1 to hitsIters).map(hitsIter).mkString(",\n")}
             |SELECT node, CAST(auth_m AS DOUBLE) / 1e6 AS auth,
             |  CAST(hub_m AS DOUBLE) / 1e6 AS hub
             |FROM s$hitsIters""".stripMargin)),

    // ---- G6: label-propagation communities over the same trade graph ----
    // Synchronous LPA, ties to the smallest label — pure integer/string
    // arithmetic, so the oracle's round-by-round replay is exact by
    // construction (no quantization discipline needed, unlike q_g1).
    Q("q_g6_label_prop",
      (s, d) => {
        val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("ss").as("dst"))
          .unionAll(pairs.select(col("ss").as("src"), col("c").as("dst")))
        Graph.labelPropagation(edges, lpaIters)
      },
      Some(s"""WITH p AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (
             |  SELECT c AS src, ss AS dst FROM p
             |  UNION ALL
             |  SELECT ss AS src, c AS dst FROM p),
             |nodes AS (SELECT DISTINCT node FROM (
             |  SELECT src AS node FROM e UNION ALL SELECT dst AS node FROM e)),
             |l0 AS (SELECT node, node AS label FROM nodes),
             |${(1 to lpaIters).map(i => lpaIter(s"l$i", s"l${i - 1}")).mkString(",\n")}
             |SELECT node, label FROM l$lpaIters""".stripMargin)),

    // ---- G7: triangle count + clustering coefficient --------------------
    // Part co-occurrence graph ("bought together": parts sharing an
    // order), SPARSE at every SF (pairs grow with orders, node pairs
    // with parts² — density falls as the data grows). The edge build is
    // Graph.coOccurrenceEdges — the per-container pair expansion is
    // quadratic, so a hot basket fails LOUDLY at the cap instead of
    // hanging a task. Degree-oriented wedge join: one vertex ordering
    // per triangle ⇒ found exactly once, and a skewed node's oriented
    // out-degree is O(√m) — the published MapReduce-triangle bound.
    // Pure integers until the 6-dp lcc.
    Q("q_g7_triangles",
      (s, d) => Graph.triangles(Graph.coOccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey")),
      Some("""WITH pr AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p),
             |deg AS (SELECT node, COUNT(*) AS degree FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
             |  GROUP BY 1),
             |o AS (SELECT
             |    CASE WHEN da.degree <= db.degree THEN e.a ELSE e.b END AS u,
             |    CASE WHEN da.degree <= db.degree THEN e.b ELSE e.a END AS v
             |  FROM e
             |  JOIN deg da ON da.node = e.a
             |  JOIN deg db ON db.node = e.b),
             |tri AS (SELECT o1.u AS x, o1.v AS y, o2.v AS z
             |  FROM o o1
             |  JOIN o o2 ON o1.v = o2.u
             |  JOIN o o3 ON o3.u = o1.u AND o3.v = o2.v),
             |pn AS (SELECT node, COUNT(*) AS n_tri FROM (
             |  SELECT x AS node FROM tri
             |  UNION ALL SELECT y AS node FROM tri
             |  UNION ALL SELECT z AS node FROM tri) GROUP BY 1)
             |SELECT d.node, d.degree,
             |  COALESCE(p.n_tri, CAST(0 AS BIGINT)) AS n_tri,
             |  CASE WHEN d.degree >= 2
             |    THEN ROUND(CAST(2 * COALESCE(p.n_tri, 0) AS DOUBLE) /
             |      (d.degree * (d.degree - 1)), 6)
             |    ELSE CAST(0 AS DOUBLE) END AS lcc
             |FROM deg d LEFT JOIN pn p ON p.node = d.node""".stripMargin)),

    // ---- G12: degree histogram of the co-occurrence graph ---------------
    // The profiling pass behind every cap decision (Adamic-Adar's
    // maxDegree, the container cap): exact integer (degree, n_nodes).
    Q("q_g12_degree_histogram",
      (s, d) => Graph.degreeHistogram(Graph.coOccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey")),
      Some("""WITH pr AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p),
             |deg AS (SELECT node, COUNT(*) AS degree FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
             |  GROUP BY 1)
             |SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY 1""".stripMargin)),

    // ---- G13: degree assortativity (Newman's r) -------------------------
    // Hub-hub vs hub-leaf mixing in one number: Pearson over endpoint
    // degrees, both directions; all moments exact integer sums, one
    // 6-dp division at the end.
    Q("q_g13_assortativity",
      (s, d) => Graph.assortativity(Graph.coOccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey")),
      Some("""WITH pr AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p),
             |deg AS (SELECT node, COUNT(*) AS d FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)
             |  GROUP BY 1),
             |dd AS (SELECT da.d AS x, db.d AS y FROM e
             |  JOIN deg da ON da.node = e.a
             |  JOIN deg db ON db.node = e.b),
             |bi AS (SELECT x, y FROM dd UNION ALL SELECT y, x FROM dd),
             |sums AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             |    CAST(SUM(x * y) AS BIGINT) AS sxy,
             |    CAST(SUM(x * x) AS BIGINT) AS sxx,
             |    CAST(SUM(y * y) AS BIGINT) AS syy
             |  FROM bi)
             |SELECT m AS m_directed,
             |  ROUND(CAST(CAST(m AS HUGEINT) * sxy -
             |      CAST(sx AS HUGEINT) * sy AS DOUBLE) /
             |    sqrt(CAST(CAST(m AS HUGEINT) * sxx -
             |        CAST(sx AS HUGEINT) * sx AS DOUBLE) *
             |      CAST(CAST(m AS HUGEINT) * syy -
             |        CAST(sy AS HUGEINT) * sy AS DOUBLE)), 6)
             |    AS assortativity
             |FROM sums""".stripMargin)),

    // ---- G8: k-core of the part co-occurrence graph ---------------------
    // Iterative peeling (k = 80 cascades ~6 rounds at sf0.01 — a REAL
    // recursion, not a degree filter): a part survives only if ≥ 80 of
    // its co-purchased parts also survive. Two keyed semi-joins + one
    // hash count per round, one scalar to the driver, early exit
    // output-invariant so the fixed 10-round oracle replay is exact.
    Q("q_g8_kcore",
      (s, d) => Graph.kCore(Graph.coOccurrenceEdges(
        Tables.lineitem(s, d), "l_orderkey", "l_partkey"),
        k = 80, iters = kcoreIters),
      Some(s"""WITH pr AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
             |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p),
             |a0 AS MATERIALIZED (SELECT DISTINCT node FROM (
             |  SELECT a AS node FROM e UNION ALL SELECT b AS node FROM e)),
             |${(1 to kcoreIters).map(i => kcoreIter(i, 80)).mkString(",\n")}
             |SELECT node, degree FROM s$kcoreIters""".stripMargin)),

    // ---- G9: BFS depth from a trusted seed (crawl-depth curation) -------
    // Multi-source unit-weight shortest paths over the trade graph —
    // hop distance from the smallest customer (a deterministic seed
    // that exists at every SF). Level-synchronous frontier iteration:
    // one keyed equi-join + one keyed min-merge per round, the frontier
    // (not the settled set) drives the join, empty frontier early-exits
    // output-invariantly so the fixed 6-round oracle replay is exact.
    Q("q_g9_bfs_depth",
      (s, d) => {
        val pairs = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"))
          .distinct()
        val edges = pairs.select(col("c").as("src"), col("ss").as("dst"))
          .unionAll(pairs.select(col("ss").as("src"), col("c").as("dst")))
        val seeds = Tables.orders(s, d)
          .agg(min(col("o_custkey")).as("mc"))
          .select(concat(lit("c:"), col("mc")).as("node"))
        Graph.bfsDepth(edges, seeds, bfsIters)
      },
      Some(s"""WITH p AS (
             |  SELECT DISTINCT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS MATERIALIZED (
             |  SELECT c AS src, ss AS dst FROM p
             |  UNION ALL
             |  SELECT ss AS src, c AS dst FROM p),
             |d0 AS (SELECT 'c:' || MIN(o_custkey) AS node,
             |    CAST(0 AS BIGINT) AS dist FROM orders),
             |${(1 to bfsIters).map(i => bfsIter(s"d$i", s"d${i - 1}")).mkString(",\n")}
             |SELECT node, dist FROM d$bfsIters""".stripMargin)),

    // ---- G10: Adamic-Adar link prediction over part co-occurrence -------
    // "Should be bought together": the k best ABSENT links per part,
    // scored by Σ 1/ln(deg) over common neighbors, on the even half of
    // the catalog (exact common-neighbor work is inherently Σ C(deg,2)
    // — ~148M wedge rows on the full sf0.1 graph; the audit-slice keeps
    // the bench entry honest at ~18M while the operator itself is
    // slice-free). maxDegree = 80 actually clips at both SFs (halved
    // degrees run ~20–123), so the oracle replays the signal-free-hub
    // cut, the exact DECIMAL wedge sum, the existing-edge anti-join,
    // and the bounded per-node ranking.
    Q("q_g10_adamic_adar",
      (s, d) => Graph.adamicAdar(Graph.coOccurrenceEdges(
        Tables.lineitem(s, d).filter(col("l_partkey") % 2 === 0),
        "l_orderkey", "l_partkey"),
        k = 5, maxDegree = 80),
      Some("""WITH pr AS (
             |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
             |  WHERE l_partkey % 2 = 0),
             |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
             |  FROM pr x JOIN pr y ON x.o = y.o AND x.p < y.p),
             |nb AS (SELECT a AS z, b AS x FROM e
             |  UNION ALL SELECT b AS z, a AS x FROM e),
             |ct AS (SELECT z, CAST(ROUND(CAST(1.0 AS DOUBLE) /
             |      ln(CAST(COUNT(*) AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
             |  FROM nb GROUP BY 1
             |  HAVING COUNT(*) >= 2 AND COUNT(*) <= 80),
             |wn AS MATERIALIZED (SELECT nb.z, nb.x, ct.w
             |  FROM nb JOIN ct USING (z)),
             |pp AS (SELECT w1.x AS x, w2.x AS y,
             |    CAST(SUM(w1.w) AS DOUBLE) AS score
             |  FROM wn w1 JOIN wn w2 ON w1.z = w2.z AND w1.x < w2.x
             |  GROUP BY 1, 2),
             |pred AS (SELECT x, y, score FROM pp
             |  WHERE NOT EXISTS (SELECT 1 FROM e
             |    WHERE e.a = pp.x AND e.b = pp.y)),
             |bidir AS (SELECT x AS node, y AS candidate, score FROM pred
             |  UNION ALL SELECT y AS node, x AS candidate, score FROM pred)
             |SELECT node, candidate, score AS aa_score, rnk FROM (
             |  SELECT *, row_number() OVER (
             |      PARTITION BY node ORDER BY score DESC, candidate) AS rnk
             |  FROM bidir)
             |WHERE rnk <= 5""".stripMargin)),

    // ---- G11: weighted shortest paths (Bellman-Ford, delta-relaxed) -----
    // The trade graph with an integer edge cost (distinct orders linking
    // the pair — deterministic and data-derived; the point is the
    // weighted relaxation, exercised round by round). Delta relaxation
    // in the engine, FULL relaxation in the oracle — provably identical
    // per round, so the fixed 6-round replay is exact.
    Q("q_g11_shortest_paths",
      (s, d) => {
        val pairs = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(concat(lit("c:"), col("o_custkey")).as("c"),
            concat(lit("s:"), col("l_suppkey")).as("ss"),
            col("o_orderkey"))
        val wp = pairs.groupBy(col("c"), col("ss"))
          .agg(countDistinct(col("o_orderkey")).as("w"))
        val edges = wp.select(col("c").as("src"), col("ss").as("dst"), col("w"))
          .unionAll(wp.select(col("ss").as("src"), col("c").as("dst"), col("w")))
        val seeds = Tables.orders(s, d)
          .agg(min(col("o_custkey")).as("mc"))
          .select(concat(lit("c:"), col("mc")).as("node"))
        Graph.shortestPaths(edges, seeds, bfsIters)
      },
      Some(s"""WITH wp AS (
             |  SELECT 'c:' || o_custkey AS c, 's:' || l_suppkey AS ss,
             |    CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS w
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1, 2),
             |e AS MATERIALIZED (
             |  SELECT c AS src, ss AS dst, w FROM wp
             |  UNION ALL
             |  SELECT ss AS src, c AS dst, w FROM wp),
             |d0 AS (SELECT 'c:' || MIN(o_custkey) AS node,
             |    CAST(0 AS BIGINT) AS dist FROM orders),
             |${(1 to bfsIters).map(i => ssspIter(s"d$i", s"d${i - 1}")).mkString(",\n")}
             |SELECT node, dist FROM d$bfsIters""".stripMargin))
  )
}
