package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.{Behavior, Dedup, TextAnalysis}
import graft.sources.Tables

/** Deduplication extension surface over `documents`: exact hash-groupBy,
  * n-gram-Jaccard near-dup, MinHash-LSH banding, SimHash signatures.
  */
object DedupQueries extends graft.QueryPack {

  /** The verified-cluster chain + soft-weight + token-count roll-up as
    * oracle CTEs, per an arbitrary documents source column — ends in
    * `effj(srcx, nt, w)` (one row per doc with its token count and
    * 1e6-div-cluster_size weight). Shared by q_d31 (per lang) and the
    * q_d32 dedup-aware epoch plan (per source). Compose after the
    * duckShingles WITH RECURSIVE prefix. */
  private def duckEffTokens(srcCol: String): String =
    s"""mh AS (SELECT doc_id,
       |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
       |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
       |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
       |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
       |  FROM exd GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
       |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
       |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
       |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
       |prs AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
       |inter AS (
       |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
       |  FROM prs p
       |  JOIN exd a ON a.doc_id = p.a_id
       |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
       |  GROUP BY 1, 2),
       |ver AS (
       |  SELECT i.a_id, i.b_id FROM inter i
       |  JOIN sizes sa ON sa.doc_id = i.a_id
       |  JOIN sizes sb ON sb.doc_id = i.b_id
       |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
       |edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM ver
       |  UNION SELECT b_id, a_id FROM ver),
       |cc(node, label) AS (
       |  SELECT DISTINCT src, src FROM edges
       |  UNION
       |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
       |comp AS (SELECT node, MIN(label) AS component FROM cc
       |  GROUP BY node),
       |memw AS (SELECT d.doc_id,
       |    COALESCE(c.component, d.doc_id) AS cl, d.$srcCol AS srcx
       |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
       |cs AS (SELECT cl, COUNT(*) AS csz FROM memw GROUP BY 1),
       |tok AS (SELECT doc_id, COALESCE(len(toks), 0) AS nt FROM t),
       |effj AS (SELECT m.srcx, tok.nt, 1000000 // cs.csz AS w
       |  FROM memw m JOIN cs USING (cl)
       |  JOIN tok ON tok.doc_id = m.doc_id)""".stripMargin

  private val duckShingles =
    """WITH t AS (SELECT doc_id,
      |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
      |  FROM documents),
      |sh AS (SELECT doc_id,
      |  list_transform(range(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
      |  FROM t WHERE len(toks) >= 3),
      |exd AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM sh)""".stripMargin

  override def queries: Seq[Q] = Seq(

    // ---- D1: exact dedup (content-hash groupBy) -------------------------
    Q("q_d1_exact_dedup",
      (s, d) => Dedup.exactGroups(Tables.documents(s, d), "text", "doc_id"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
             |  COUNT(*) AS n_copies
             |FROM documents GROUP BY md5(text)""".stripMargin)),

    // ---- D2: n-gram Jaccard near-dup (shared-shingle candidates) --------
    Q("q_d2_jaccard_pairs",
      (s, d) => Dedup.jaccardPairs(
        Dedup.docShingles(Tables.documents(s, d), "text", "doc_id"), 1),
      Some(s"""$duckShingles,
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |pairs AS (
              |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              |  FROM exd a JOIN exd b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT p.a_id, p.b_id, p.inter,
              |  sa.n + sb.n - p.inter AS un,
              |  ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
              |FROM pairs p
              |JOIN sizes sa ON sa.doc_id = p.a_id
              |JOIN sizes sb ON sb.doc_id = p.b_id
              |WHERE p.inter * 10 >= (sa.n + sb.n - p.inter) * 1""".stripMargin)),

    // ---- D2b: Jaccard with a stop-shingle frequency cap (scale guard) ---
    // Note: sizes are computed on the CAPPED sets in both engines, so the
    // semantics stay a well-defined Jaccard over filtered shingle space.
    Q("q_d2b_jaccard_capped",
      (s, d) => Dedup.jaccardPairsCapped(
        Dedup.docShingles(Tables.documents(s, d), "text", "doc_id"), 20, 1),
      Some(s"""$duckShingles,
              |capped AS (
              |  SELECT doc_id, sh FROM (
              |    SELECT doc_id, sh, COUNT(*) OVER (PARTITION BY sh) AS df
              |    FROM exd) WHERE df <= 20),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM capped GROUP BY doc_id),
              |pairs AS (
              |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
              |  FROM capped a JOIN capped b ON a.sh = b.sh AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2)
              |SELECT p.a_id, p.b_id, p.inter,
              |  sa.n + sb.n - p.inter AS un,
              |  ROUND(CAST(p.inter AS DOUBLE) / (sa.n + sb.n - p.inter), 6) AS jaccard
              |FROM pairs p
              |JOIN sizes sa ON sa.doc_id = p.a_id
              |JOIN sizes sb ON sb.doc_id = p.b_id
              |WHERE p.inter * 10 >= (sa.n + sb.n - p.inter) * 1""".stripMargin)),

    // ---- D3: MinHash-LSH candidate pairs (8 hashes, bands of 2) ---------
    Q("q_d3_minhash_lsh",
      (s, d) => Dedup.minhashCandidates(
        Dedup.docShingles(Tables.documents(s, d), "text", "doc_id",
          distinct = false), 8, 2),
      Some(s"""$duckShingles,
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.band
              |FROM bands a
              |JOIN bands b ON a.band = b.band AND a.bh = b.bh
              |  AND a.doc_id < b.doc_id""".stripMargin)),

    // ---- D6: near-dup clusters (connected components over pairs) --------
    // The pairs→clusters step of a dedup pipeline: components of the
    // MinHash-LSH candidate graph, labeled by their min doc_id (the
    // keeper). Spark runs iterative min-label propagation; the oracle is
    // the same fixpoint as a recursive CTE.
    Q("q_d6_dedup_clusters",
      (s, d) => Dedup.connectedComponents(
        Dedup.minhashCandidatesMapOnly(
          Tables.documents(s, d), "text", "doc_id", 3, 8, 2)),
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM prs
              |  UNION SELECT b_id, a_id FROM prs),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node)
              |SELECT node, MIN(label) AS component FROM cc GROUP BY node""".stripMargin)),

    // ---- D19: containment near-dup (quote-inclusion detection) ----------
    // The asymmetric Broder measure: every 5th doc contributes a derived
    // "quote" row (its first 150 chars under doc_id + 1e6), whose
    // shingles are a subset of the original's — containment 1.0 where
    // Jaccard would sit near the size ratio and miss the pair. Same
    // shared-shingle join as q_d2; threshold C >= 0.8 integer-exact.
    Q("q_d19_containment",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val quotes = docs.filter(col("doc_id") % 5 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            substring(col("text"), 1, 150).as("text"))
        Dedup.containmentPairs(
          Dedup.docShingles(docs.unionAll(quotes), "text", "doc_id"), 8)
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM documents
             |  UNION ALL
             |  SELECT doc_id + 1000000, substr(text, 1, 150)
             |  FROM documents WHERE doc_id % 5 = 0),
             |t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
             |  FROM corpus),
             |sh AS (SELECT doc_id,
             |  list_transform(range(1, len(toks) - 1),
             |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS shingles
             |  FROM t WHERE len(toks) >= 3),
             |exd AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM sh),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
             |pairs AS (
             |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, COUNT(*) AS inter
             |  FROM exd a JOIN exd b ON a.sh = b.sh AND a.doc_id < b.doc_id
             |  GROUP BY 1, 2)
             |SELECT p.a_id, p.b_id, p.inter, sa.n AS na, sb.n AS nb,
             |  ROUND(CAST(p.inter AS DOUBLE) / LEAST(sa.n, sb.n), 6)
             |    AS containment
             |FROM pairs p
             |JOIN sizes sa ON sa.doc_id = p.a_id
             |JOIN sizes sb ON sb.doc_id = p.b_id
             |WHERE p.inter * 10 >= LEAST(sa.n, sb.n) * 8""".stripMargin)),

    // ---- D8: MinHash-LSH candidates, map-only signature kernel ----------
    // Same candidate set and same oracle as q_d3, but the signature is
    // computed by the native minhash_bands expression inside one
    // projection — no exploded-shingle shuffle, no k-aggregate; the band
    // equi-join is the only shuffle. The oracle hash-match proves the
    // kernel's hash family is bit-identical to the relational path's.
    Q("q_d8_minhash_maponly",
      (s, d) => Dedup.minhashCandidatesMapOnly(
        Tables.documents(s, d), "text", "doc_id", 3, 8, 2),
      Some(s"""$duckShingles,
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh)
              |SELECT a.doc_id AS a_id, b.doc_id AS b_id, a.band
              |FROM bands a
              |JOIN bands b ON a.band = b.band AND a.bh = b.bh
              |  AND a.doc_id < b.doc_id""".stripMargin)),

    // ---- D7: verified clusters (candidates → exact rescore → CC) --------
    // The full pipeline composition: LSH band collisions are only
    // CANDIDATES; an exact-Jaccard rescore gates which ones become edges,
    // so a chance band collision (guaranteed at corpus scale) can't merge
    // unrelated documents transitively. The oracle verifies candidates
    // with the same integer-exact threshold, then runs the same fixpoint
    // as a recursive CTE.
    Q("q_d7_verified_clusters",
      (s, d) => Dedup.verifiedClusters(Tables.documents(s, d), "text", "doc_id",
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1),
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node)
              |SELECT node, MIN(label) AS component FROM cc GROUP BY node""".stripMargin)),

    // ---- D20: soft dedup weights (downweight, don't drop) ---------------
    // Every doc gets 1e6 div |verified cluster| micros — the DataComp
    // trade: a crawled-five-times page trains at 1/5 weight instead of
    // vanishing. Shares q_d7's verified-cluster chain; singletons (and
    // docs with no candidate pair at all) keep full weight.
    Q("q_d20_soft_dedup_weights",
      (s, d) => Dedup.softDedupWeights(Tables.documents(s, d), "text",
        "doc_id", numHashes = 8, rowsPerBand = 2, thresholdTenths = 1),
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
              |cs AS (SELECT component, COUNT(*) AS cluster_size
              |  FROM comp GROUP BY 1)
              |SELECT d.doc_id,
              |  COALESCE(c.component, d.doc_id) AS cluster,
              |  CAST(COALESCE(cs.cluster_size, 1) AS BIGINT) AS cluster_size,
              |  CAST(1000000 // COALESCE(cs.cluster_size, 1) AS BIGINT)
              |    AS weight_m
              |FROM documents d
              |LEFT JOIN comp c ON c.node = d.doc_id
              |LEFT JOIN cs ON cs.component = c.component""".stripMargin)),

    // ---- D25: quality-aware canonical selection (keep the BEST copy) ----
    // q_d7's verified clusters resolved by ARGMAX quality (score = text
    // length — the C4-style longest-page proxy) instead of the
    // arbitrary min id: ties to the lower id, null-text docs lose
    // contested clusters but keep their singletons. The oracle replays
    // the full chain + the (score desc, id) argmax with DuckDB's
    // default NULLS LAST matching the operator's unscored floor.
    Q("q_d25_canonical_by_score",
      (s, d) => {
        val docs = Tables.documents(s, d)
        graft.operators.Dedup.canonicalByScore(
          docs.select(col("doc_id")), "doc_id",
          Dedup.verifiedClusters(docs, "text", "doc_id",
            numHashes = 8, rowsPerBand = 2, thresholdTenths = 1),
          docs.select(col("doc_id"),
            length(col("text")).cast("long").as("q")), "q")
      },
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc
              |  GROUP BY node),
              |mem AS (SELECT d.doc_id,
              |    COALESCE(c.component, d.doc_id) AS cluster,
              |    CAST(len(d.text) AS BIGINT) AS score_micros
              |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
              |cs AS (SELECT cluster, CAST(COUNT(*) AS BIGINT)
              |    AS cluster_size FROM mem GROUP BY 1),
              |bc AS (SELECT cluster, doc_id AS canonical_id FROM (
              |    SELECT cluster, doc_id, row_number() OVER (
              |      PARTITION BY cluster
              |      ORDER BY score_micros DESC, doc_id) AS rn
              |    FROM mem) WHERE rn = 1)
              |SELECT m.doc_id, m.cluster, cs.cluster_size,
              |  m.score_micros, bc.canonical_id,
              |  m.doc_id = bc.canonical_id AS keep
              |FROM mem m JOIN cs USING (cluster)
              |JOIN bc USING (cluster)""".stripMargin)),

    // ---- D29: split-leakage audit (measure an inherited split) ----------
    // The plain per-doc hash split (q_x7's) audited against the
    // verified near-dup clusters: clusters straddling a boundary are
    // eval leaks — exactly what q_d22's cluster split prevents. The
    // assignment is deliberately PARTIAL (doc_id % 17 == 0 has no
    // row — an inherited split file rarely covers the whole corpus):
    // unassigned members still count in n_docs and surface as
    // n_unassigned, so a straddle can't hide behind missing labels.
    // Oracle replays the cluster chain + the split hash + the roll-up.
    Q("q_d29_split_leakage",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.splitLeakageAudit(docs,
          docs.filter(col("doc_id") % 17 =!= 0)
            .select(col("doc_id"),
              graft.operators.Sampling.splitLabel(col("doc_id"), "exp1",
                90, 5).as("split")))
      },
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc
              |  GROUP BY node),
              |mem AS (SELECT d.doc_id,
              |    COALESCE(c.component, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id),
              |spl AS (SELECT doc_id,
              |    CASE WHEN h < 90 THEN 'train'
              |         WHEN h < 95 THEN 'val' ELSE 'test' END AS sx
              |  FROM (SELECT doc_id,
              |      CAST('0x' || substr(md5('exp1|' ||
              |        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS h
              |    FROM documents WHERE doc_id % 17 <> 0))
              |SELECT m.cluster, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(COUNT(DISTINCT spl.sx) AS BIGINT) AS n_splits,
              |  COALESCE(array_to_string(list_sort(
              |    list(DISTINCT spl.sx) FILTER (spl.sx IS NOT NULL)), '|'),
              |    '') AS splits,
              |  CAST(COUNT(*) - COUNT(spl.sx) AS BIGINT) AS n_unassigned,
              |  COUNT(DISTINCT spl.sx) > 1 AS leaked
              |FROM mem m LEFT JOIN spl USING (doc_id)
              |GROUP BY 1""".stripMargin)),

    // ---- D30: cross-source duplication matrix ----------------------------
    // The overlap report a mixture owner reads before weighting
    // sources: documents tagged src0/src1/src2 by doc_id % 3, verified
    // near-dup clusters rolled up to the source-pair grain —
    // off-diagonal rows are cross-source mirrors, diagonal rows
    // within-source duplication. Oracle replays the cluster chain +
    // the (cluster, source) reduction + the pair roll-up.
    Q("q_d30_cross_source_overlap",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .withColumn("src",
            concat(lit("src"), (col("doc_id") % 3).cast("string")))
        Dedup.crossSourceOverlap(docs, "text", "doc_id", "src")
      },
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc
              |  GROUP BY node),
              |mem AS (SELECT COALESCE(c.component, d.doc_id) AS cl,
              |    'src' || CAST(d.doc_id % 3 AS VARCHAR) AS sx,
              |    COUNT(*) AS nd
              |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id
              |  GROUP BY 1, 2)
              |SELECT a.sx AS src_a, b.sx AS src_b,
              |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
              |  CAST(SUM(a.nd) AS BIGINT) AS n_docs_a,
              |  CAST(SUM(b.nd) AS BIGINT) AS n_docs_b
              |FROM mem a JOIN mem b ON a.cl = b.cl
              |WHERE a.sx < b.sx OR (a.sx = b.sx AND a.nd >= 2)
              |GROUP BY 1, 2""".stripMargin)),

    // ---- D31: effective-token accounting per source ----------------------
    // The data-constrained-scaling budget number (Muennighoff 2023):
    // raw tokens per documents.lang next to the dedup-discounted
    // effective count (each doc's tokens x its 1e6 div cluster_size
    // soft weight) and the unique-ratio discount a mixture planner
    // multiplies in. Oracle replays the cluster chain, the weight
    // floor division, the token counts and both roll-ups.
    Q("q_d31_effective_tokens",
      (s, d) => Dedup.effectiveTokens(Tables.documents(s, d), "text",
        "doc_id", "lang"),
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |${duckEffTokens("lang")}
              |SELECT srcx AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
              |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
              |  CAST(SUM(nt * w) AS BIGINT) AS eff_tokens_micro,
              |  CAST(CASE WHEN SUM(nt) > 0 THEN
              |    (2 * SUM(nt * w) + SUM(nt)) // (2 * SUM(nt)) END
              |    AS BIGINT) AS unique_ratio_ppm
              |FROM effj GROUP BY 1""".stripMargin)),

    // ---- D32: dedup-aware epoch plan (the honest Muennighoff budget) ----
    // The q_x68 plan fed EFFECTIVE tokens instead of raw: a source
    // that looks big but is mostly duplicates offers fewer unique
    // tokens, so its quota needs more epochs (or goes unmet) — the
    // data-constrained plan on dedup-honest budgets, q_d31 composed
    // into q_x68 under ONE oracle.
    Q("q_d32_dedup_epoch_plan",
      (s, d) => {
        val eff = Dedup.effectiveTokens(Tables.documents(s, d), "text",
            "doc_id", "source")
          .select(col("source"),
            expr("(2 * eff_tokens_micro + 1000000) div (2 * 1000000)")
              .as("n_tokens"))
        graft.operators.Sampling.epochPlan(eff, "source", "n_tokens",
          weightsMicros = Map("src0" -> 400000L, "src1" -> 300000L,
            "src2" -> 50000L, "srcZZ" -> 100000L),
          totalTokens = 100000L, maxEpochs = 4)
      },
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |${duckEffTokens("source")}
              |, eff AS (SELECT srcx AS domain,
              |    (2 * SUM(nt * w) + 1000000) // (2 * 1000000) AS avail
              |  FROM effj GROUP BY 1),
              |w2 AS (SELECT * FROM (VALUES ('src0', 400000),
              |    ('src1', 300000), ('src2', 50000), ('srcZZ', 100000))
              |    v(domain, w_m)),
              |j AS (SELECT COALESCE(e.domain, w2.domain) AS domain,
              |    COALESCE(e.avail, 0) AS available_tokens,
              |    COALESCE((CAST(w2.w_m AS BIGINT) * 100000) // 1000000, 0)
              |      AS quota_tokens
              |  FROM eff e FULL OUTER JOIN w2 ON e.domain = w2.domain),
              |e2 AS (SELECT domain, available_tokens, quota_tokens,
              |    CASE WHEN quota_tokens = 0 OR available_tokens = 0 THEN 0
              |      ELSE LEAST((quota_tokens + available_tokens - 1)
              |                 // available_tokens, 4) END AS epochs
              |  FROM j)
              |SELECT domain,
              |  CAST(available_tokens AS BIGINT) AS available_tokens,
              |  CAST(quota_tokens AS BIGINT) AS quota_tokens,
              |  CAST(epochs AS BIGINT) AS epochs,
              |  CAST(LEAST(quota_tokens, epochs * available_tokens)
              |    AS BIGINT) AS effective_tokens,
              |  CAST(quota_tokens - LEAST(quota_tokens,
              |    epochs * available_tokens) AS BIGINT) AS unmet_tokens
              |FROM e2""".stripMargin)),

    // ---- D22: leakage-safe split (assign by near-dup CLUSTER, not doc) --
    // A page and its crawl-again near-duplicate hash-split by document
    // land in different splits — the silent eval leak. Splitting on the
    // verified-cluster representative makes that impossible; singletons
    // split exactly like the plain q_x7 hash split.
    Q("q_d22_cluster_split",
      (s, d) => Dedup.leakageSafeSplit(Tables.documents(s, d), "text",
        "doc_id", salt = "exp1", trainPct = 90, valPct = 5,
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1),
      Some(s"""WITH RECURSIVE ${duckShingles.stripPrefix("WITH ")},
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |prs AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b
              |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM prs p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |ver AS (
              |  SELECT i.a_id, i.b_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM ver
              |  UNION SELECT b_id, a_id FROM ver),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc GROUP BY node),
              |asg AS (SELECT d.doc_id,
              |    COALESCE(c.component, d.doc_id) AS cluster
              |  FROM documents d LEFT JOIN comp c ON c.node = d.doc_id)
              |SELECT doc_id, cluster,
              |  CASE WHEN CAST('0x' || substr(md5('exp1|' ||
              |         CAST(cluster AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 90
              |       THEN 'train'
              |       WHEN CAST('0x' || substr(md5('exp1|' ||
              |         CAST(cluster AS VARCHAR)), 1, 8) AS BIGINT) % 100 < 95
              |       THEN 'val'
              |       ELSE 'test' END AS split
              |FROM asg""".stripMargin)),

    // ---- D24: per-doc memorization-risk score ----------------------------
    // Duplication exposure: the share of a doc's distinct 3-gram
    // shingles occurring in >= 2 corpus docs — corpus-level duplication
    // pressure, distinct from within-doc repetition (q_x10) and
    // cross-corpus contamination (q_d10). md5 keys on the wire; half-up
    // ppm.
    Q("q_d24_memorization_risk",
      (s, d) => Dedup.memorizationRisk(Tables.documents(s, d), "text",
        "doc_id", k = 3),
      Some(s"""$duckShingles,
              |cnt AS (SELECT sh, COUNT(*) AS ndocs FROM exd GROUP BY 1),
              |j AS (SELECT e.doc_id, COUNT(*) AS n_shingles,
              |    CAST(SUM(CASE WHEN c.ndocs >= 2 THEN 1 ELSE 0 END)
              |      AS BIGINT) AS n_dup
              |  FROM exd e JOIN cnt c USING (sh) GROUP BY 1)
              |SELECT doc_id, CAST(n_shingles AS BIGINT) AS n_shingles,
              |  n_dup,
              |  CAST((2 * n_dup * 1000000 + n_shingles)
              |       // (2 * n_shingles) AS BIGINT) AS dup_ppm
              |FROM j""".stripMargin)),

    // ---- D23: MinHash-LSH parameter planner (exact S-curve) -------------
    // P(candidate | Jaccard s) = 1 - (1 - s^r)^b for every (b, r)
    // factoring of the 8-hash signature, on the s = k/20 grid — the
    // relation a deployment reads to pick its banding. Exact rational
    // arithmetic end to end (BigInt engine-side, recursive-CTE integer
    // powers oracle-side): zero float pow anywhere.
    Q("q_d23_lsh_curve",
      (s, d) => Dedup.lshCurve(s, numHashes = 8, sSteps = 20),
      Some("""WITH RECURSIVE
             |rs AS (SELECT unnest([1, 2, 4, 8]) AS r),
             |ks AS (SELECT CAST(unnest(range(1, 20)) AS BIGINT) AS k),
             |p1(r, k, e, kv, dv) AS (
             |  SELECT rs.r, ks.k, 1, ks.k, CAST(20 AS BIGINT) FROM rs, ks
             |  UNION ALL SELECT r, k, e + 1, kv * k, dv * 20
             |    FROM p1 WHERE e < r),
             |base AS (SELECT r, k, kv AS kr, dv AS dr, 8 // r AS b
             |  FROM p1 WHERE e = r),
             |p2(r, k, e, mv, fv) AS (
             |  SELECT r, k, 1, dr - kr, dr FROM base
             |  UNION ALL SELECT p2.r, p2.k, e + 1, mv * (b2.dr - b2.kr),
             |      fv * b2.dr
             |    FROM p2 JOIN base b2 ON b2.r = p2.r AND b2.k = p2.k
             |    WHERE e < b2.b),
             |fin AS (SELECT b.b, b.r, b.k, p2.mv, p2.fv
             |  FROM p2 JOIN base b ON b.r = p2.r AND b.k = p2.k
             |  WHERE p2.e = b.b)
             |SELECT CAST(b AS INT) AS bands, CAST(r AS INT) AS rows_per_band,
             |  CAST(k AS INT) AS s_num,
             |  CAST(((fv - mv) * 1000000) // fv AS BIGINT) AS capture_ppm
             |FROM fin""".stripMargin)),

    // ---- D4: SimHash signatures ----------------------------------------
    Q("q_d4_simhash",
      (s, d) => Dedup.simhashSignature(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("sid", "doc_id"),
      Some(s"""WITH $duckSimhashCtes
              |SELECT doc_id, simhash FROM sigs""".stripMargin)),

    // ---- D9: SimHash signatures, map-only kernel ------------------------
    // Same signatures and same oracle as q_d4, computed by the native
    // simhash64 expression inside one projection — no token explode, no
    // 64-sum aggregation. The oracle hash-match proves kernel parity.
    Q("q_d9_simhash_maponly",
      (s, d) => Dedup.simhashSignatureMapOnly(Tables.documents(s, d), "text", "doc_id")
        .withColumnRenamed("sid", "doc_id"),
      Some(s"""WITH $duckSimhashCtes
              |SELECT doc_id, simhash FROM sigs""".stripMargin)),

    // ---- D5: SimHash near-dup pairs (pigeonhole banding, Hamming <= 3) --
    // signatures ride the map-only kernel path (bit-parity proven by q_d9)
    Q("q_d5_simhash_hamming",
      (s, d) => Dedup.simhashNearDup(
        Dedup.simhashSignatureMapOnly(Tables.documents(s, d), "text", "doc_id"), 3),
      Some(s"""WITH $duckSimhashCtes,
              |bv AS (
              |  SELECT doc_id, simhash, band,
              |    substr(simhash, CAST(band * 4 AS INT) + 1, 4) AS bvv
              |  FROM sigs CROSS JOIN (SELECT unnest(range(0, 4)) AS band)),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
              |    a.simhash AS sh_a, b.simhash AS sh_b
              |  FROM bv a JOIN bv b
              |    ON a.band = b.band AND a.bvv = b.bvv AND a.doc_id < b.doc_id),
              |ham AS (
              |  SELECT a_id, b_id,
              |    bit_count(xor(CAST('0x' || substr(sh_a, 1, 4) AS INT),
              |                  CAST('0x' || substr(sh_b, 1, 4) AS INT))) +
              |    bit_count(xor(CAST('0x' || substr(sh_a, 5, 4) AS INT),
              |                  CAST('0x' || substr(sh_b, 5, 4) AS INT))) +
              |    bit_count(xor(CAST('0x' || substr(sh_a, 9, 4) AS INT),
              |                  CAST('0x' || substr(sh_b, 9, 4) AS INT))) +
              |    bit_count(xor(CAST('0x' || substr(sh_a, 13, 4) AS INT),
              |                  CAST('0x' || substr(sh_b, 13, 4) AS INT))) AS hamming
              |  FROM cand)
              |SELECT a_id, b_id, CAST(hamming AS INT) AS hamming
              |FROM ham WHERE hamming <= 3""".stripMargin)),

    // ---- D10: benchmark decontamination ---------------------------------
    // Synthetic eval set: every 50th document. Training side = the rest;
    // report each training doc's shared-shingle count and fraction.
    Q("q_d10_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contaminationReport(
          Dedup.docShingles(docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id"),
          Dedup.docShingles(docs.filter(col("doc_id") % 50 === 0), "text", "doc_id"))
          .withColumnRenamed("sid", "doc_id")
      },
      Some(duckContamination)),

    // ---- D26: contamination SPAN evidence (which item, where) -----------
    // The audit relation behind q_d10's verdict: matched shingle
    // positions fuse into maximal half-open token spans per (train doc,
    // benchmark item). The oracle replays the positional shingle join
    // and the gaps-and-islands fuse; only matching pairs emit rows.
    Q("q_d26_contamination_spans",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contaminationSpans(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |expp AS (SELECT doc_id, i - 1 AS pos,
             |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
             |    FROM t WHERE len(toks) >= 3)
             |  WHERE doc_id % 50 <> 0),
             |bset AS (SELECT DISTINCT doc_id AS bid, sh FROM (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM t WHERE len(toks) >= 3 AND doc_id % 50 = 0)),
             |hits AS (SELECT e.doc_id, b.bid, e.pos
             |  FROM expp e JOIN bset b USING (sh)),
             |lagd AS (SELECT doc_id, bid, pos,
             |    lag(pos) OVER (PARTITION BY doc_id, bid ORDER BY pos)
             |      AS prev
             |  FROM hits),
             |isl AS (SELECT doc_id, bid, pos,
             |    SUM(CASE WHEN prev IS NULL OR pos - prev > 3
             |      THEN 1 ELSE 0 END) OVER (PARTITION BY doc_id, bid
             |      ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS g
             |  FROM lagd)
             |SELECT doc_id, bid AS benchmark_id,
             |  CAST(MIN(pos) AS BIGINT) AS span_start,
             |  CAST(MAX(pos) + 3 AS BIGINT) AS span_end,
             |  CAST(COUNT(*) AS BIGINT) AS n_shingles
             |FROM isl GROUP BY doc_id, bid, g""".stripMargin)),

    // ---- D27: span-level decontamination SCRUB (remove the quote, ------
    // keep the page). Coverage = union of [pos, pos+3) over matched
    // shingle positions vs any benchmark item; kept tokens reassemble
    // in order. Oracle replays the positional join, the k-explode
    // coverage union, the anti-join, and the ordered reassembly.
    Q("q_d27_span_scrub",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.scrubContaminatedSpans(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
      },
      Some("""WITH t AS (SELECT doc_id,
             |  list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |tp AS (SELECT doc_id, i - 1 AS tpos, toks[i] AS tok
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i
             |    FROM t WHERE doc_id % 50 <> 0)),
             |expp AS (SELECT doc_id, i - 1 AS pos,
             |    toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS sh
             |  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
             |    FROM t WHERE len(toks) >= 3)
             |  WHERE doc_id % 50 <> 0),
             |bset AS (SELECT DISTINCT sh FROM (
             |  SELECT unnest(list_transform(range(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
             |  FROM t WHERE len(toks) >= 3 AND doc_id % 50 = 0)),
             |cov AS (SELECT DISTINCT e.doc_id, e.pos + j.j AS tpos
             |  FROM expp e JOIN bset USING (sh),
             |    (SELECT unnest(range(0, 3)) AS j) j),
             |kept AS (SELECT tp.doc_id,
             |    string_agg(tp.tok, ' ' ORDER BY tp.tpos) AS st,
             |    COUNT(*) AS nk
             |  FROM tp LEFT JOIN cov c
             |    ON c.doc_id = tp.doc_id AND c.tpos = tp.tpos
             |  WHERE c.doc_id IS NULL GROUP BY 1),
             |rem AS (SELECT doc_id, COUNT(*) AS nr FROM cov GROUP BY 1)
             |SELECT d.doc_id, COALESCE(kept.st, '') AS scrubbed_text,
             |  CAST(COALESCE(kept.nk, 0) AS BIGINT) AS n_tokens_kept,
             |  CAST(COALESCE(rem.nr, 0) AS BIGINT) AS n_tokens_removed
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 50 <> 0) d
             |LEFT JOIN kept USING (doc_id)
             |LEFT JOIN rem USING (doc_id)""".stripMargin)),

    // ---- D28: benchmark-side contamination (the eval-integrity list) ----
    // The reverse of q_d10: per benchmark item, how many train docs
    // touch it and the worst-case coverage of the ITEM's shingles —
    // a high number means the item is burned (its score measures
    // memorization). Oracle replays the pair-grain aggregation, the
    // (matches desc, doc asc) argmax, and the half-up coverage ppm.
    Q("q_d28_burned_items",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.burnedBenchmarkItems(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0))
      },
      Some(s"""$duckShingles,
              |bs AS (SELECT doc_id AS bid, sh FROM exd WHERE doc_id % 50 = 0),
              |ts AS (SELECT doc_id AS sid, sh FROM exd WHERE doc_id % 50 <> 0),
              |it AS (SELECT bid, COUNT(*) AS n_item_shingles FROM bs GROUP BY 1),
              |pp AS (SELECT b.bid, t.sid, COUNT(*) AS m
              |  FROM ts t JOIN bs b USING (sh) GROUP BY 1, 2),
              |rl AS (SELECT bid, CAST(COUNT(*) AS BIGINT) AS n_train_docs,
              |    wd AS worst_doc_id, wm FROM (
              |  SELECT bid, sid, m,
              |    first_value(sid) OVER (PARTITION BY bid
              |      ORDER BY m DESC, sid) AS wd,
              |    first_value(m) OVER (PARTITION BY bid
              |      ORDER BY m DESC, sid) AS wm
              |  FROM pp) GROUP BY bid, wd, wm)
              |SELECT it.bid AS benchmark_id,
              |  CAST(it.n_item_shingles AS BIGINT) AS n_item_shingles,
              |  COALESCE(rl.n_train_docs, 0) AS n_train_docs,
              |  rl.worst_doc_id,
              |  CAST(COALESCE((2 * rl.wm * 1000000 + it.n_item_shingles)
              |    // (2 * it.n_item_shingles), 0) AS BIGINT)
              |    AS max_item_coverage_ppm
              |FROM it LEFT JOIN rl USING (bid)""".stripMargin)),

    // ---- D11: decontamination with a bloom runtime pre-filter -----------
    // Bloom false positives are removed by the exact semi-join, so the
    // output is IDENTICAL to q_d10 — same oracle text, and the driver's
    // hash compare proves the equivalence every round.
    Q("q_d11_bloom_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.contaminationReportBloom(
          Dedup.docShingles(docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id"),
          Dedup.docShingles(docs.filter(col("doc_id") % 50 === 0), "text", "doc_id"))
          .withColumnRenamed("sid", "doc_id")
      },
      Some(duckContamination)),

    // ---- D16: decontamination from the PERSISTED bloom store ------------
    // The nightly-production variant of q_d11 (the q_d13 store-twin
    // discipline): writeContaminationStore lands the benchmark's
    // mergeable bloom slices + distinct shingles once, and the score
    // pass reads only the store — benchmark text never re-scanned
    // (plan-asserted in DedupClusterSpec). Shares q_d10's oracle
    // VERBATIM: output equality is the proof.
    Q("q_d16_contamination_store",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dir = TempDirs.scratch("graft_bloomstore_")
        Dedup.writeContaminationStore(
          docs.filter(col("doc_id") % 50 === 0), "text", "doc_id", dir)
        Dedup.contaminationAgainstStore(
          Dedup.docShingles(docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id"),
          dir)
          .withColumnRenamed("sid", "doc_id")
      },
      Some(duckContamination)),

    // ---- D12: incremental-corpus dedup (new batch vs curated corpus) ----
    // Existing corpus: every 3rd doc; incoming batch: the rest. Each
    // incoming doc classifies as exact_dup / near_dup / kept against the
    // existing side only (cross-corpus band join, never batch-internal).
    Q("q_d12_incremental_dedup",
      (s, d) => {
        val docs = Tables.documents(s, d)
        Dedup.dedupAgainstStatus(
          docs.filter(col("doc_id") % 3 =!= 0),
          docs.filter(col("doc_id") % 3 === 0), "text", "doc_id")
      },
      Some(duckIncrementalDedup)),

    // ---- D13: incremental dedup from PERSISTED signatures ---------------
    // The nightly-production variant of q_d12: the existing corpus's
    // hashes/bands/shingles are written once (writeCorpusSignatures) and
    // the batch classifies against those parquet relations — the existing
    // TEXT is never re-scanned (plan-asserted in DedupClusterSpec). Shares
    // q_d12's oracle VERBATIM: output equality is the proof.
    Q("q_d13_incremental_sigs",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val dir = TempDirs.scratch("graft_sigs_")
        Dedup.writeCorpusSignatures(
          docs.filter(col("doc_id") % 3 === 0), "text", "doc_id", dir)
        Dedup.dedupAgainstSignatures(
          docs.filter(col("doc_id") % 3 =!= 0), dir, "text", "doc_id")
      },
      Some(duckIncrementalDedup)),

    // ---- D14: span-level exact dedup (substring dedup, relationalized) --
    // Non-overlapping 8-token spans; a span survives only at its globally
    // first occurrence (ordered by doc_id, position); documents
    // reassemble from surviving spans, fully-redundant docs vanish.
    Q("q_d14_span_dedup",
      (s, d) => Dedup.spanDedup(Tables.documents(s, d), "text", "doc_id", 8),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |spans AS (
             |  SELECT doc_id,
             |    unnest(range(0, (len(toks)-1)//8 + 1)) AS c,
             |    unnest(list_transform(range(0, (len(toks)-1)//8 + 1),
             |      c -> array_to_string(toks[c*8+1:c*8+8], ' '))) AS span
             |  FROM t WHERE len(toks) > 0),
             |kept AS (
             |  SELECT doc_id, c, span,
             |    row_number() OVER (PARTITION BY span ORDER BY doc_id, c) AS rn
             |  FROM spans QUALIFY rn = 1)
             |SELECT doc_id, string_agg(span, ' ' ORDER BY c) AS text_dedup,
             |  COUNT(*) AS n_kept
             |FROM kept GROUP BY doc_id""".stripMargin)),

    // ---- D18: paragraph-level global exact dedup ------------------------
    // The C4-granularity boilerplate scrub: every doc gets an identical
    // "Subscribe" paragraph injected (plus every 5th doc repeating its
    // own first slice), so the globally-first doc keeps the banner and
    // every other doc sheds it — first occurrence by (doc_id, position),
    // replayed by the oracle's window. Two keyed shuffles in the engine
    // (md5-keyed first-occurrence reduce, sid-keyed rebuild).
    Q("q_d18_paragraph_dedup",
      (s, d) => {
        val t0 = coalesce(col("text"), lit(""))
        val page = concat(concat_ws("\n",
          substring(t0, 1, 80),
          lit("Subscribe to our newsletter today."),
          substring(t0, 81, 80)),
          when(col("doc_id") % 5 === 0,
            concat(lit("\n"), substring(t0, 1, 80))).otherwise(lit("")))
        Dedup.paragraphDedup(
          Tables.documents(s, d).select(col("doc_id"), page.as("text")),
          "text", "doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id, COALESCE(text, '') AS t FROM documents),
             |pg AS (SELECT doc_id,
             |    substr(t, 1, 80) || chr(10) ||
             |    'Subscribe to our newsletter today.' || chr(10) ||
             |    substr(t, 81, 80) ||
             |    CASE WHEN doc_id % 5 = 0
             |      THEN chr(10) || substr(t, 1, 80) ELSE '' END AS p
             |  FROM base),
             |paras AS (
             |  SELECT doc_id, unnest(range(0, len(ps))) AS pos,
             |    unnest(ps) AS para
             |  FROM (SELECT doc_id, list_filter(
             |      regexp_split_to_array(p, chr(10)), x -> x <> '') AS ps
             |    FROM pg)
             |  WHERE len(ps) > 0),
             |kept AS (
             |  SELECT doc_id, pos, para,
             |    row_number() OVER (PARTITION BY para ORDER BY doc_id, pos)
             |      AS rn
             |  FROM paras)
             |SELECT doc_id,
             |  COALESCE(string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
             |    ORDER BY pos), '') AS text_dedup,
             |  CAST(COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS n_kept,
             |  CAST(COUNT(*) - COUNT(CASE WHEN rn = 1 THEN 1 END) AS BIGINT)
             |    AS n_dropped
             |FROM kept GROUP BY doc_id""".stripMargin)),

    // ---- D17: variable-length substring dedup (Lee-et-al ExactSubstr) ---
    // q_d14's fixed grid misses repeats offset by a non-multiple of the
    // window; the sliding-anchor form removes EVERY repeated substring of
    // >= 8 tokens wherever it starts. The fixture injects the SAME
    // 12-token passage into every 5th doc behind a doc-varying pad prefix
    // (1-4 filler tokens), so the repeat straddles any fixed span grid —
    // the first copy keeps its passage, every later copy loses exactly
    // those tokens. Derived purely from parquet columns; the oracle
    // replays the injection, the sliding grams, the global
    // first-occurrence rule, and the coverage union.
    Q("q_d17_substring_dedup",
      (s, d) => {
        val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
        val doc2 = Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat_ws(" ",
            array_join(transform(
              sequence(lit(1), (col("doc_id") % 4 + 1).cast("int")),
              i => concat(lit("pad"), i.cast("string"))), " "),
            lit(shared), coalesce(col("text"), lit(""))))
          .otherwise(col("text")).as("text"))
        Dedup.substringDedup(doc2, "text", "doc_id", minLen = 8)
      },
      Some("""WITH doc2 AS (
             |  SELECT doc_id,
             |    CASE WHEN doc_id % 5 = 0 THEN
             |      array_to_string(list_transform(
             |        range(1, CAST(doc_id % 4 AS INT) + 2),
             |        i -> 'pad' || CAST(i AS VARCHAR)), ' ')
             |      || ' alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu '
             |      || COALESCE(text, '')
             |    ELSE text END AS text
             |  FROM documents),
             |t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(trim(text), '\s+'),
             |      x -> x <> '') AS toks
             |  FROM doc2),
             |t2 AS (SELECT doc_id, toks, len(toks) AS n
             |  FROM t WHERE len(toks) > 0),
             |g AS (
             |  SELECT doc_id, i, md5(array_to_string(toks[i+1:i+8], ' ')) AS gm
             |  FROM (SELECT doc_id, toks,
             |          unnest(range(0, n - 8 + 1)) AS i
             |        FROM t2 WHERE n >= 8)),
             |f AS (
             |  SELECT doc_id, i,
             |    row_number() OVER (PARTITION BY gm ORDER BY doc_id, i) AS rn,
             |    COUNT(*) OVER (PARTITION BY gm) AS cnt
             |  FROM g),
             |ds AS (SELECT doc_id, i FROM f WHERE cnt > 1 AND rn > 1),
             |cov AS (SELECT DISTINCT doc_id, p
             |  FROM (SELECT doc_id, unnest(range(i, i + 8)) AS p FROM ds)),
             |px AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p,
             |    unnest(toks) AS tok
             |  FROM t2),
             |keep AS (
             |  SELECT px.doc_id, px.p, px.tok
             |  FROM px LEFT JOIN cov
             |    ON cov.doc_id = px.doc_id AND cov.p = px.p
             |  WHERE cov.p IS NULL),
             |agg AS (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS text_dedup,
             |    COUNT(*) AS n_kept
             |  FROM keep GROUP BY 1)
             |SELECT t2.doc_id, COALESCE(a.text_dedup, '') AS text_dedup,
             |  CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
             |  CAST(t2.n - COALESCE(a.n_kept, 0) AS BIGINT) AS n_dropped
             |FROM t2 LEFT JOIN agg a USING (doc_id)""".stripMargin)),

    // ---- X26: C4-style boilerplate scrub (corpus-frequency rule) -------
    // Unlike q_d14's first-occurrence-wins, a span in >= 3 distinct docs
    // is removed from EVERY doc; fully-scrubbed docs stay with empty text.
    Q("q_x26_boilerplate",
      (s, d) => Dedup.boilerplateScrub(Tables.documents(s, d), "text", "doc_id",
        window = 8, minDocFreq = 3),
      Some("""WITH t AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks
             |  FROM documents),
             |spans AS (
             |  SELECT doc_id, (len(toks)-1)//8 + 1 AS ns,
             |    unnest(range(0, (len(toks)-1)//8 + 1)) AS c,
             |    unnest(list_transform(range(0, (len(toks)-1)//8 + 1),
             |      c -> array_to_string(toks[c*8+1:c*8+8], ' '))) AS span
             |  FROM t WHERE len(toks) > 0),
             |hot AS (SELECT span FROM (
             |    SELECT span, COUNT(DISTINCT doc_id) AS span_df FROM spans GROUP BY 1)
             |  WHERE span_df >= 3),
             |ka AS (
             |  SELECT doc_id, string_agg(span, ' ' ORDER BY c) AS text_clean,
             |    COUNT(*) AS n_kept
             |  FROM spans WHERE span NOT IN (SELECT span FROM hot)
             |  GROUP BY doc_id)
             |SELECT s.doc_id, COALESCE(ka.text_clean, '') AS text_clean,
             |  CAST(COALESCE(ka.n_kept, 0) AS BIGINT) AS n_kept,
             |  CAST(s.ns - COALESCE(ka.n_kept, 0) AS BIGINT) AS n_dropped
             |FROM (SELECT DISTINCT doc_id, ns FROM spans) s
             |LEFT JOIN ka USING (doc_id)""".stripMargin)),

    // ---- D33: conversation-grain dedup (tree -> ChatML -> clusters) ------
    // The adoption gap the tree surface left open: two near-identical
    // root-to-leaf conversations (a re-crawled tree, or sibling leaves
    // differing only in the final reply) both survive into SFT unless
    // dedup runs at the RENDERED-CONVERSATION grain. Fixture = the
    // q_e44 heap tree PLUS a re-crawled copy (ids offset by 1e7, same
    // structure and text — the re-crawl data shape); chain = dialogPaths
    // -> renderChatTemplate -> softDedupWeights on the rendered strings
    // (threshold 0.8 so every twin pair collapses — Jaccard 1.0 — and
    // sibling-leaf conversations sharing all but the last turn merge as
    // genuine near-dups, while cousins stay apart). ONE oracle replays
    // the recursive walk over the two-tree forest, the ChatML render,
    // and the full minhash/band/rescore/CC chain over the rendered
    // corpus. Every conversation gets exactly one row; a twin pair plus
    // its two sibling twins reads cluster_size 4 at weight 250000.
    // The tree is capped at 1250 nodes (a no-op at the sf0.01
    // correctness gate's 500 docs): in a twin HEAP forest every extra
    // level doubles the leaves while keeping sibling/cousin prefixes
    // near-identical, so the whole subtree is a LEGITIMATE near-dup
    // cluster and per-cluster pair work grows with its square — the cap
    // keeps the bench measuring the chain, not that fixture artifact.
    Q("q_d33_conversation_dedup",
      (s, d) => {
        val base = Tables.documents(s, d)
          .filter(col("doc_id") < 1250).select(col("doc_id"),
          when(col("text").isNotNull, array_join(slice(
            TextAnalysis.tokens(col("text")), 1, 6), " "))
            .otherwise(lit("")).as("txt"))
        def tree(offset: Long) = base.select(
          (col("doc_id") + lit(offset)).as("msg_id"),
          when(col("doc_id") === 0, lit(null).cast("long"))
            .otherwise(expr("(doc_id - 1) div 2") + lit(offset))
            .as("parent_id"),
          when(col("doc_id") === 0, lit("system"))
            .when(col("doc_id") % 2 === 1, lit("user"))
            .otherwise(lit("assistant")).as("role"),
          col("txt").as("text"))
        val rendered = Behavior.renderChatTemplate(
          Behavior.dialogPaths(tree(0L).unionByName(tree(10000000L)),
            "msg_id", "parent_id", "role", "text", maxDepth = 16),
          "path_id", "turn", "msg_id", "role", "text")
        Dedup.softDedupWeights(rendered, "rendered", "path_id",
          numHashes = 8, rowsPerBand = 2, thresholdTenths = 8)
          .select(col("doc_id").as("path_id"), col("cluster"),
            col("cluster_size"), col("weight_m"))
      },
      Some("""WITH RECURSIVE tt AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(text, '\s+'),
             |      x -> x <> '') AS toks
             |  FROM documents WHERE doc_id < 1250),
             |m0 AS (SELECT doc_id AS id,
             |    CASE WHEN doc_id = 0 THEN NULL
             |      ELSE (doc_id - 1) // 2 END AS parent,
             |    CASE WHEN doc_id = 0 THEN 'system'
             |      WHEN doc_id % 2 = 1 THEN 'user'
             |      ELSE 'assistant' END AS role,
             |    COALESCE(array_to_string(list_slice(toks, 1, 6), ' '), '')
             |      AS txt
             |  FROM tt),
             |f AS (SELECT id, parent, role, txt FROM m0
             |  UNION ALL
             |  SELECT id + 10000000, parent + 10000000, role, txt FROM m0),
             |p AS (
             |  SELECT id, [id] AS path FROM f WHERE parent IS NULL
             |  UNION ALL
             |  SELECT c.id, list_append(p.path, c.id)
             |  FROM p JOIN f c ON c.parent = p.id),
             |lv AS (SELECT p.id, p.path FROM p
             |  WHERE p.id NOT IN (
             |    SELECT DISTINCT parent FROM f WHERE parent IS NOT NULL)),
             |ex2 AS (SELECT id AS path_id, unnest(path) AS msg_id,
             |    generate_subscripts(path, 1) AS turn
             |  FROM lv),
             |rdoc AS (SELECT e.path_id AS doc_id,
             |    string_agg('<|im_start|>' || f.role || chr(10) || f.txt
             |        || '<|im_end|>',
             |      chr(10) ORDER BY e.turn, e.msg_id) AS rtext
             |  FROM ex2 e JOIN f ON f.id = e.msg_id GROUP BY 1),
             |t2 AS (SELECT doc_id,
             |    list_filter(regexp_split_to_array(rtext, '\s+'),
             |      x -> x <> '') AS toks
             |  FROM rdoc),
             |sh2 AS (SELECT doc_id,
             |    list_transform(range(1, len(toks) - 1),
             |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
             |      AS shingles
             |  FROM t2 WHERE len(toks) >= 3),
             |exd AS (SELECT DISTINCT doc_id, unnest(shingles) AS sh FROM sh2),
             |mh AS (SELECT doc_id,
             |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
             |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
             |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
             |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
             |  FROM exd GROUP BY doc_id),
             |bands AS (
             |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
             |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
             |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
             |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
             |prs AS (
             |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
             |  FROM bands a JOIN bands b
             |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
             |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
             |inter AS (
             |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
             |  FROM prs p
             |  JOIN exd a ON a.doc_id = p.a_id
             |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
             |  GROUP BY 1, 2),
             |ver AS (
             |  SELECT i.a_id, i.b_id FROM inter i
             |  JOIN sizes sa ON sa.doc_id = i.a_id
             |  JOIN sizes sb ON sb.doc_id = i.b_id
             |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 8),
             |edges AS (
             |  SELECT a_id AS src, b_id AS dst FROM ver
             |  UNION SELECT b_id, a_id FROM ver),
             |cc(node, label) AS (
             |  SELECT DISTINCT src, src FROM edges
             |  UNION
             |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
             |mem AS (SELECT node, MIN(label) AS component FROM cc
             |  GROUP BY node),
             |cs AS (SELECT component, COUNT(*) AS csz FROM mem GROUP BY 1)
             |SELECT r.doc_id AS path_id,
             |  COALESCE(mem.component, r.doc_id) AS cluster,
             |  CAST(COALESCE(cs.csz, 1) AS BIGINT) AS cluster_size,
             |  CAST(1000000 // COALESCE(cs.csz, 1) AS BIGINT) AS weight_m
             |FROM rdoc r
             |LEFT JOIN mem ON mem.node = r.doc_id
             |LEFT JOIN cs ON cs.component = mem.component""".stripMargin))
  )

  /** q_d10's oracle — shared verbatim by q_d11 (inline bloom prefilter)
    * and q_d16 (persisted bloom store): all three must produce the
    * identical exact contamination report. */
  private lazy val duckContamination: String =
    s"""$duckShingles,
       |bench AS (SELECT DISTINCT sh FROM exd WHERE doc_id % 50 = 0),
       |train AS (SELECT doc_id, sh FROM exd WHERE doc_id % 50 <> 0),
       |totals AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
       |shared AS (
       |  SELECT t.doc_id, COUNT(*) AS n_shared
       |  FROM train t JOIN bench b ON b.sh = t.sh GROUP BY 1)
       |SELECT t.doc_id,
       |  COALESCE(s.n_shared, 0) AS n_shared,
       |  t.n_shingles,
       |  ROUND(CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / t.n_shingles, 6) AS contamination
       |FROM totals t LEFT JOIN shared s ON s.doc_id = t.doc_id""".stripMargin

  /** q_d12's oracle — shared verbatim by q_d13 (same classification, the
    * signature source is the only difference). */
  private lazy val duckIncrementalDedup: String =
    s"""$duckShingles,
              |mh AS (SELECT doc_id,
              |  min(md5('0|' || sh)) AS m0, min(md5('1|' || sh)) AS m1,
              |  min(md5('2|' || sh)) AS m2, min(md5('3|' || sh)) AS m3,
              |  min(md5('4|' || sh)) AS m4, min(md5('5|' || sh)) AS m5,
              |  min(md5('6|' || sh)) AS m6, min(md5('7|' || sh)) AS m7
              |  FROM exd GROUP BY doc_id),
              |bands AS (
              |  SELECT doc_id, 0 AS band, md5(m0 || '|' || m1) AS bh FROM mh
              |  UNION ALL SELECT doc_id, 1, md5(m2 || '|' || m3) FROM mh
              |  UNION ALL SELECT doc_id, 2, md5(m4 || '|' || m5) FROM mh
              |  UNION ALL SELECT doc_id, 3, md5(m6 || '|' || m7) FROM mh),
              |exact AS (SELECT DISTINCT doc_id FROM documents
              |  WHERE doc_id % 3 <> 0 AND md5(text) IN (
              |    SELECT md5(text) FROM documents WHERE doc_id % 3 = 0)),
              |cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              |  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
              |  WHERE a.doc_id % 3 <> 0 AND b.doc_id % 3 = 0),
              |sizes AS (SELECT doc_id, COUNT(*) AS n FROM exd GROUP BY doc_id),
              |inter AS (
              |  SELECT p.a_id, p.b_id, COUNT(*) AS inter
              |  FROM cand p
              |  JOIN exd a ON a.doc_id = p.a_id
              |  JOIN exd b ON b.doc_id = p.b_id AND b.sh = a.sh
              |  GROUP BY 1, 2),
              |near AS (SELECT DISTINCT i.a_id AS doc_id FROM inter i
              |  JOIN sizes sa ON sa.doc_id = i.a_id
              |  JOIN sizes sb ON sb.doc_id = i.b_id
              |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 1)
              |SELECT d.doc_id,
              |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
              |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
              |       ELSE 'kept' END AS status
              |FROM (SELECT doc_id FROM documents WHERE doc_id % 3 <> 0) d
              |LEFT JOIN exact e ON e.doc_id = d.doc_id
              |LEFT JOIN near n ON n.doc_id = d.doc_id""".stripMargin

  /** Shared CTE chain ending in `sigs(doc_id, simhash)` — the DuckDB
    * replica of [[Dedup.simhashSignature]]. */
  private val duckSimhashCtes =
    """tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS t
      |  FROM documents),
      |h AS (SELECT doc_id, md5(t) AS hx FROM tok),
      |pb AS (SELECT unnest(range(0, 16)) AS p),
      |bb AS (SELECT unnest(range(0, 4)) AS b),
      |contrib AS (
      |  SELECT doc_id, p, b,
      |    CASE WHEN ((CAST(strpos('0123456789abcdef', substr(hx, CAST(p AS INT) + 1, 1)) AS INT) - 1)
      |          // (CASE b WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)) % 2 = 1
      |      THEN 1 ELSE -1 END AS c
      |  FROM h CROSS JOIN pb CROSS JOIN bb),
      |sums AS (SELECT doc_id, p, b, SUM(c) AS s FROM contrib GROUP BY doc_id, p, b),
      |digits AS (
      |  SELECT doc_id, p,
      |    SUM(CASE WHEN s > 0 THEN (CASE b WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END)
      |        ELSE 0 END) AS dig
      |  FROM sums GROUP BY doc_id, p),
      |sigs AS (
      |  SELECT doc_id,
      |    string_agg(substr('0123456789abcdef', CAST(dig AS INT) + 1, 1), '' ORDER BY p) AS simhash
      |  FROM digits GROUP BY doc_id)""".stripMargin
}
