package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.{Kmeans, Similarity}
import graft.sources.Tables

/** Similarity-search extension surface over `embeddings`. The DuckDB
  * oracles zip list elements positionally (multi-unnest) and reproduce
  * the same double-cast + round(…,6) numerics.
  */
object SimilarityQueries extends graft.QueryPack {

  /** Positionally exploded embeddings + per-vector norms, shared by all
    * three oracles. */
  private val duckEx =
    """WITH ex AS (
      |  SELECT vec_id, unnest(embedding) AS v,
      |         unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
      |  FROM ex GROUP BY vec_id)""".stripMargin

  private val duckBuckets =
    """px AS (SELECT vec_id AS plane_id, v AS pv, i FROM ex WHERE vec_id < 4),
      |pdots AS (
      |  SELECT e.vec_id, p.plane_id,
      |         ROUND(SUM(CAST(e.v AS DOUBLE) * CAST(p.pv AS DOUBLE)), 6) AS dot
      |  FROM ex e JOIN px p ON e.i = p.i GROUP BY 1, 2),
      |bkt AS (
      |  SELECT vec_id,
      |         string_agg(CASE WHEN dot >= 0 THEN '1' ELSE '0' END, '' ORDER BY plane_id) AS bucket
      |  FROM pdots GROUP BY vec_id)""".stripMargin

  /** One Lloyd iteration / post-training assignment in DuckDB — shared
    * with the hashed-tf topic-clustering oracle via [[DuckKmeansSql]]
    * (verbatim move of the SQL that has gated q_sim6 since round 3). */
  private def kmIter(n: Int): String = DuckKmeansSql.kmIter(n)
  private val duckAssignTail = DuckKmeansSql.assignTail

  /** k=8, 2 Lloyd iterations; `c2` = trained centroids, `s3` = every
    * vector scored against them (the trained-quantizer assignment input). */
  private val duckKmeans = Seq(
    "c0 AS (SELECT vec_id AS centroid_id, CAST(v AS DOUBLE) AS cv, i FROM ex WHERE vec_id < 8)",
    kmIter(1),
    kmIter(2),
    duckAssignTail
  ).mkString(",\n")

  /** Probed-list top-k search over `s3` (nProbe=2, k=5, queries < 5) —
    * the q_sim5 search block, shared verbatim by the ff-trained variant. */
  private val duckIvfSearch =
    """assign AS (
      |  SELECT vec_id AS neighbor_id, centroid_id FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
      |    FROM s3) WHERE rn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, centroid_id FROM (
      |    SELECT *, row_number() OVER (
      |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
      |    FROM s3 WHERE vec_id < 5) WHERE rn <= 2),
      |cand AS (
      |  SELECT p.query_id, a.neighbor_id
      |  FROM probes p JOIN assign a USING (centroid_id)
      |  WHERE a.neighbor_id <> p.query_id),
      |cdot AS (
      |  SELECT c.query_id, c.neighbor_id,
      |         SUM(CAST(eq.v AS DOUBLE) * CAST(en.v AS DOUBLE)) AS dot
      |  FROM cand c
      |  JOIN ex eq ON eq.vec_id = c.query_id
      |  JOIN ex en ON en.vec_id = c.neighbor_id AND en.i = eq.i
      |  GROUP BY 1, 2),
      |fin AS (
      |  SELECT cd.query_id, cd.neighbor_id,
      |         ROUND(cd.dot / (nq.nrm * nn.nrm), 6) AS score
      |  FROM cdot cd
      |  JOIN norms nq ON nq.vec_id = cd.query_id
      |  JOIN norms nn ON nn.vec_id = cd.neighbor_id)
      |SELECT query_id, neighbor_id, score, rnk FROM (
      |  SELECT *, row_number() OVER (
      |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
      |  FROM fin)
      |WHERE rnk <= 5""".stripMargin

  /** [[duckIvfSearch]] repackaged as a CTE `ivf(query_id, neighbor_id,
    * score, rnk)`: the block is a CTE list + final SELECT, so wrapping
    * the whole string in parentheses is a syntax error — split at the
    * final SELECT instead (q_sim18 composes it with the recall tail). */
  private lazy val duckIvfAsCte: String = {
    val i = duckIvfSearch.lastIndexOf("SELECT query_id")
    duckIvfSearch.substring(0, i).trim + ",\nivf AS (\n" +
      duckIvfSearch.substring(i) + ")"
  }

  /** One k-means‖ sampling round: score every vector's max 6-dp cosine
    * against the candidate set `cs{r-1}`, derive integer micro-distances
    * `dµ = round((1−mx)·1e6)` and their total `φµ`, and add every vector
    * whose md5-bucket `u16` satisfies `u16·φµ < 65536·ℓ·dµ` (HUGEINT —
    * exactly the decimal(38,0) arithmetic the Spark side runs). Members
    * have dµ = 0 and can never re-sample. MATERIALIZED for the same
    * reason as the ff chain: each round references its predecessor
    * multiple times. */
  private def kppRound(r: Int, ell: Int): String =
    s"""sc$r AS MATERIALIZED (
       |  SELECT d.vec_id, MAX(ROUND(d.dot / (nv.nrm * nc.nrm), 6)) AS mx
       |  FROM (SELECT a.vec_id, c.cid,
       |               SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot
       |        FROM cs${r - 1} c
       |        JOIN ex b ON b.vec_id = c.cid
       |        JOIN ex a ON a.i = b.i
       |        GROUP BY 1, 2) d
       |  JOIN norms nv ON nv.vec_id = d.vec_id
       |  JOIN norms nc ON nc.vec_id = d.cid
       |  GROUP BY 1),
       |dm$r AS MATERIALIZED (
       |  SELECT vec_id, CAST(ROUND((1 - mx) * 1e6) AS BIGINT) AS dmu FROM sc$r),
       |ph$r AS MATERIALIZED (SELECT SUM(dmu) AS phi FROM dm$r),
       |cs$r AS MATERIALIZED (
       |  SELECT cid FROM cs${r - 1}
       |  UNION ALL
       |  SELECT d.vec_id FROM dm$r d, ph$r
       |  WHERE CAST(CAST('0x' || substr(md5('$r|' || CAST(d.vec_id AS VARCHAR)), 1, 4)
       |               AS INTEGER) AS HUGEINT) * phi
       |      < CAST(65536 AS HUGEINT) * $ell * d.dmu)""".stripMargin

  /** The k-means‖ reduction: weight candidates by won corpus vectors
    * (argmax/ties contract as everywhere), keep the k heaviest, then
    * `refine` weighted Lloyd iterations over the candidate points.
    * `wc{refine}` = the final seeds as (centroid_id, i, cv). */
  private def kppReduce(lastRound: Int, k: Int, refine: Int): String = {
    val head =
      s"""wsc0 AS MATERIALIZED (
         |  SELECT d.vec_id, d.cid, ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
         |  FROM (SELECT a.vec_id, c.cid,
         |               SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot
         |        FROM cs$lastRound c
         |        JOIN ex b ON b.vec_id = c.cid
         |        JOIN ex a ON a.i = b.i
         |        GROUP BY 1, 2) d
         |  JOIN norms nv ON nv.vec_id = d.vec_id
         |  JOIN norms nc ON nc.vec_id = d.cid),
         |wt AS MATERIALIZED (
         |  SELECT cid, COUNT(*) AS w FROM (
         |    SELECT vec_id, cid FROM (
         |      SELECT vec_id, cid, row_number() OVER (
         |        PARTITION BY vec_id ORDER BY score DESC, cid) AS rn
         |      FROM wsc0) WHERE rn = 1)
         |  GROUP BY 1),
         |topk AS MATERIALIZED (
         |  SELECT row_number() OVER (ORDER BY w DESC, cid) - 1 AS centroid_id, cid
         |  FROM wt ORDER BY w DESC, cid LIMIT $k),
         |wc0 AS MATERIALIZED (
         |  SELECT t.centroid_id, e.i, CAST(e.v AS DOUBLE) AS cv
         |  FROM topk t JOIN ex e ON e.vec_id = t.cid)""".stripMargin
    val iters = (1 to refine).map { n =>
      s"""wkn${n - 1} AS MATERIALIZED (
         |  SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm FROM wc${n - 1} GROUP BY 1),
         |wa$n AS MATERIALIZED (
         |  SELECT cid, centroid_id FROM (
         |    SELECT s.cid, s.centroid_id, row_number() OVER (
         |      PARTITION BY s.cid ORDER BY s.score DESC, s.centroid_id) AS rn
         |    FROM (SELECT d.cid, d.centroid_id,
         |                 ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
         |          FROM (SELECT e.vec_id AS cid, c.centroid_id,
         |                       SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
         |                FROM ex e
         |                JOIN wt ON wt.cid = e.vec_id
         |                JOIN wc${n - 1} c ON e.i = c.i
         |                GROUP BY 1, 2) d
         |          JOIN norms nv ON nv.vec_id = d.cid
         |          JOIN wkn${n - 1} nc ON nc.centroid_id = d.centroid_id) s)
         |  WHERE rn = 1),
         |wm$n AS MATERIALIZED (
         |  SELECT a.centroid_id, e.i,
         |         CAST(CAST(ROUND(SUM(w.w * CAST(e.v AS DOUBLE)) / SUM(w.w), 6)
         |              AS FLOAT) AS DOUBLE) AS cv
         |  FROM wa$n a
         |  JOIN wt w ON w.cid = a.cid
         |  JOIN ex e ON e.vec_id = a.cid
         |  GROUP BY 1, 2),
         |wc$n AS MATERIALIZED (
         |  SELECT c.centroid_id, c.i, COALESCE(m.cv, c.cv) AS cv
         |  FROM wc${n - 1} c LEFT JOIN wm$n m
         |    ON m.centroid_id = c.centroid_id AND m.i = c.i)""".stripMargin
    }
    (head +: iters).mkString(",\n")
  }

  /** One farthest-first selection round: score every unchosen vector's
    * max 6-dp cosine against the chosen set `ch{n}`, pick the argmin
    * (ties to the lowest vec_id), append as ordinal `n` → `ch{n+1}`.
    * `ex` names the candidate-vector relation — "ex" for the full
    * corpus (q_sim7), the sampled CTE for q_sim11. */
  private def ffStep(n: Int, ex: String = "ex"): String =
    s"""d_ff$n AS MATERIALIZED (
       |  SELECT a.vec_id, c.cid,
       |         SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot
       |  FROM ch$n c
       |  JOIN $ex b ON b.vec_id = c.cid
       |  JOIN $ex a ON a.i = b.i
       |  WHERE a.vec_id NOT IN (SELECT cid FROM ch$n)
       |  GROUP BY 1, 2),
       |s_ff$n AS MATERIALIZED (
       |  SELECT d.vec_id, MAX(ROUND(d.dot / (nv.nrm * nc.nrm), 6)) AS mx
       |  FROM d_ff$n d
       |  JOIN norms nv ON nv.vec_id = d.vec_id
       |  JOIN norms nc ON nc.vec_id = d.cid
       |  GROUP BY 1),
       |n_ff$n AS MATERIALIZED (
       |  SELECT vec_id FROM s_ff$n ORDER BY mx ASC, vec_id ASC LIMIT 1),
       |ch${n + 1} AS MATERIALIZED (SELECT ord, cid FROM ch$n
       |  UNION ALL SELECT $n, vec_id FROM n_ff$n)""".stripMargin

  /** Farthest-first chain for k=8: ch8 = (ord 0..7, cid). Every step CTE
    * is MATERIALIZED: DuckDB inlines plain CTEs, and a chain whose step n
    * references step n−1 twice (the union + the NOT IN) would otherwise
    * expand exponentially — 2^7 copies of the base scan exhausts file
    * handles before it exhausts patience. */
  private val duckFf: String = (Seq(
    "ch1 AS MATERIALIZED (SELECT 0 AS ord, MIN(vec_id) AS cid FROM embeddings)") ++
    (1 to 7).map(n => ffStep(n))).mkString(",\n")

  /** q_sim11's sampled farthest-first chain: the candidate pool is the
    * k·sampleFactor lowest-md5(id) vectors (the engine's deterministic
    * sample), and every selection round scores against that pool only.
    * Mirrors [[graft.operators.Kmeans.farthestFirstInitSampled]]. */
  private def duckFfSampled(sampleN: Int): String = (Seq(
    s"""samp AS MATERIALIZED (
       |  SELECT vec_id FROM (SELECT DISTINCT vec_id FROM ex)
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $sampleN)""".stripMargin,
    """exs AS MATERIALIZED (
      |  SELECT ex.* FROM ex JOIN samp USING (vec_id))""".stripMargin,
    "ch1 AS MATERIALIZED (SELECT 0 AS ord, MIN(vec_id) AS cid FROM samp)") ++
    (1 to 7).map(n => ffStep(n, ex = "exs"))).mkString(",\n")

  /** The q_sim14 greedy MMR unroll: round 1 is pure λ·rel argmax;
    * round r scores every unselected candidate by
    * `7·rel_m − 3·max(sim_m to the selected set)` and picks the
    * row_number-1 winner (ties to the lowest id — the engine's packed
    * struct-max contract). Every step MATERIALIZED: each round
    * references its predecessor's selected set twice. */
  private[queries] def duckMmrRounds(k: Int): String = {
    val head =
      """sel1 AS MATERIALIZED (
        |  SELECT query_id, neighbor_id, 7 * rel_m AS mmr_m, 1 AS rnk
        |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
        |      ORDER BY 7 * rel_m DESC, neighbor_id) AS rn FROM cand)
        |  WHERE rn = 1),
        |ss1 AS MATERIALIZED (SELECT query_id, neighbor_id FROM sel1)""".stripMargin
    val rounds = (2 to k).map { r =>
      s"""mr$r AS MATERIALIZED (
         |  SELECT c.query_id, c.neighbor_id,
         |    7 * c.rel_m - 3 * MAX(p.sim_m) AS mmr_m
         |  FROM cand c
         |  JOIN pw p ON p.query_id = c.query_id
         |    AND p.a_id = c.neighbor_id
         |  JOIN ss${r - 1} s ON s.query_id = p.query_id
         |    AND s.neighbor_id = p.b_id
         |  LEFT JOIN ss${r - 1} s2 ON s2.query_id = c.query_id
         |    AND s2.neighbor_id = c.neighbor_id
         |  WHERE s2.neighbor_id IS NULL
         |  GROUP BY 1, 2, c.rel_m),
         |sel$r AS MATERIALIZED (
         |  SELECT query_id, neighbor_id, mmr_m, $r AS rnk
         |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY mmr_m DESC, neighbor_id) AS rn FROM mr$r)
         |  WHERE rn = 1),
         |ss$r AS MATERIALIZED (
         |  SELECT query_id, neighbor_id FROM ss${r - 1}
         |  UNION ALL SELECT query_id, neighbor_id FROM sel$r)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** q_sim13's oracle — shared verbatim by q_sim15 (the persisted
    * params+codes store must score byte-identically). */
  private lazy val duckSq8TopK: String =
    s"""$duckEx,
       |mm AS (SELECT i, min(CAST(v AS DOUBLE)) AS mn,
       |    max(CAST(v AS DOUBLE)) AS mx
       |  FROM ex GROUP BY i),
       |dq AS (SELECT e.vec_id, e.i,
       |    m.mn + (CASE WHEN m.mx = m.mn THEN 0
       |      ELSE LEAST(255, GREATEST(0, CAST(round(
       |        (CAST(e.v AS DOUBLE) - m.mn) * 255 / (m.mx - m.mn))
       |        AS INT))) END) * (m.mx - m.mn) / 255 AS dv
       |  FROM ex e JOIN mm m ON m.i = e.i),
       |dn AS (SELECT vec_id, sqrt(SUM(dv * dv)) AS nrm
       |  FROM dq GROUP BY vec_id),
       |dots AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    SUM(CAST(q.v AS DOUBLE) * d.dv) AS dot
       |  FROM ex q JOIN dq d ON d.i = q.i
       |  WHERE q.vec_id < 5 AND d.vec_id <> q.vec_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT t.query_id, t.neighbor_id,
       |    ROUND(t.dot / (nq.nrm * nn.nrm), 6) AS score
       |  FROM dots t
       |  JOIN norms nq ON nq.vec_id = t.query_id
       |  JOIN dn nn ON nn.vec_id = t.neighbor_id)
       |SELECT query_id, neighbor_id, score, rnk FROM (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY query_id ORDER BY score DESC, neighbor_id)
       |    AS rnk
       |  FROM scored)
       |WHERE rnk <= 5""".stripMargin

  /** Probed-list top-k search CTEs over a post-training assignment
    * relation (scores of EVERY `<ex>` vector against one codebook):
    * emits `<p>run(query_id, neighbor_id, rnk)` — the q_sim5 search
    * block parameterized so q_sim21 can replay BOTH indexes. */
  private def ivfSearchAs(p: String, s3: String, qPred: String,
      ex: String, norms: String, nProbe: Int, k: Int): String =
    s"""${p}assign AS (
       |  SELECT vec_id AS neighbor_id, centroid_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |    FROM $s3) WHERE rn = 1),
       |${p}probes AS (
       |  SELECT vec_id AS query_id, centroid_id FROM (
       |    SELECT *, row_number() OVER (
       |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |    FROM $s3 WHERE $qPred) WHERE rn <= $nProbe),
       |${p}cand AS (
       |  SELECT p.query_id, a.neighbor_id
       |  FROM ${p}probes p JOIN ${p}assign a USING (centroid_id)
       |  WHERE a.neighbor_id <> p.query_id),
       |${p}cdot AS (
       |  SELECT c.query_id, c.neighbor_id,
       |         SUM(CAST(eq.v AS DOUBLE) * CAST(en.v AS DOUBLE)) AS dot
       |  FROM ${p}cand c
       |  JOIN $ex eq ON eq.vec_id = c.query_id
       |  JOIN $ex en ON en.vec_id = c.neighbor_id AND en.i = eq.i
       |  GROUP BY 1, 2),
       |${p}run AS (
       |  SELECT query_id, neighbor_id, rnk FROM (
       |    SELECT cd.query_id, cd.neighbor_id, row_number() OVER (
       |        PARTITION BY cd.query_id
       |        ORDER BY ROUND(cd.dot / (nq.nrm * nn.nrm), 6) DESC,
       |          cd.neighbor_id) AS rnk
       |    FROM ${p}cdot cd
       |    JOIN $norms nq ON nq.vec_id = cd.query_id
       |    JOIN $norms nn ON nn.vec_id = cd.neighbor_id)
       |  WHERE rnk <= $k)""".stripMargin

  override def queries: Seq[Q] = Seq(

    // ---- SIM21: the drift -> retrain -> recall-gate reindex loop ---------
    // The operational cycle composed under ONE oracle, on a planted
    // drift built so the failure is STRUCTURAL, not a lottery: the
    // indexed (old) population lives in dims 1-32 (top half zeroed —
    // Lloyd preserves the zero subspace, so every old centroid is
    // blind to dims 33-64); the new batch carries 4 strong
    // sub-clusters in dims 33-64 (u_j + 0.25x own-noise, u_j = raw
    // corpus vector j's top half, j = vec_id % 4) plus independent
    // 0.0625x noise in dims 1-32. The two noise components are
    // INDEPENDENT halves of the raw vector, so within-sub-cluster
    // neighbor RANKING (driven by the top-half noise, invisible to
    // old centroids) decorrelates from old-index ASSIGNMENT (driven
    // only by the bottom-half noise): same-sub-cluster neighbors
    // scatter across the old lists and 2-of-8 probes miss most of
    // them — while the retrained codebook (seeds interleaved, one per
    // sub-cluster) concentrates each sub-cluster in its own list.
    // Drift gate fires (the new centroid's energy is in dims the old
    // centroid doesn't have), recall@5 over new-batch queries decides
    // the swap. The oracle replays BOTH trainings
    // (the duckKmeans chain twice, parameterized), both probed
    // searches, the exact baseline, the drift cosine and every
    // verdict cell.
    Q("q_sim21_reindex_on_drift",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val old = emb.select(col("vec_id"),
          transform(col("embedding"),
            (x, i) => when(i < 32, x).otherwise(lit(0.0f)))
            .as("embedding"))
        val reps = emb.filter(col("vec_id") < 4)
          .select(col("vec_id").as("__j"), col("embedding").as("__u"))
        val fresh = emb.withColumn("__j", col("vec_id") % 4)
          .join(broadcast(reps), Seq("__j"))
          .select((col("vec_id") + 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when(i < 32, x * lit(0.0625f))
                .otherwise(element_at(col("__u"), i + 1) + x * lit(0.25f)))
              .as("embedding"))
        Similarity.reindexOnDrift(old, fresh, numCentroids = 8,
          iters = 2, nProbe = 2, k = 5,
          col("vec_id") >= 1000000L && col("vec_id") < 1000005L,
          driftGateMicros = 900000L, recallGatePpm = 700000L)
      },
      Some(s"""$duckEx,
              |exo AS (SELECT vec_id,
              |    CASE WHEN i <= 32 THEN v ELSE CAST(0 AS FLOAT) END AS v, i
              |  FROM ex),
              |normso AS (SELECT vec_id,
              |    sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
              |  FROM exo GROUP BY 1),
              |exn AS (SELECT e.vec_id + 1000000 AS vec_id,
              |    CASE WHEN e.i <= 32
              |      THEN CAST(CAST(e.v AS DOUBLE) * 0.0625 AS FLOAT)
              |      ELSE CAST(CAST(r.v AS DOUBLE)
              |        + CAST(e.v AS DOUBLE) * 0.25 AS FLOAT) END AS v, e.i
              |  FROM ex e JOIN ex r
              |    ON r.vec_id = e.vec_id % 4 AND r.i = e.i),
              |exm AS (SELECT * FROM exo UNION ALL SELECT * FROM exn),
              |normsm AS (SELECT vec_id,
              |    sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
              |  FROM exm GROUP BY 1),
              |c0 AS (SELECT vec_id AS centroid_id, CAST(v AS DOUBLE) AS cv, i
              |  FROM exo WHERE vec_id < 8),
              |${DuckKmeansSql.kmIter(1, "", "exo", "normso")},
              |${DuckKmeansSql.kmIter(2, "", "exo", "normso")},
              |mc0 AS (
              |  SELECT CAST(vec_id * 2 AS BIGINT) AS centroid_id,
              |    CAST(v AS DOUBLE) AS cv, i FROM exo WHERE vec_id < 4
              |  UNION ALL
              |  SELECT CAST((vec_id - 1000000) * 2 + 1 AS BIGINT),
              |    CAST(v AS DOUBLE), i FROM exn WHERE vec_id < 1000004),
              |${DuckKmeansSql.kmIter(1, "m", "exm", "normsm")},
              |${DuckKmeansSql.kmIter(2, "m", "exm", "normsm")},
              |${DuckKmeansSql.assignTailFor("exm", "normsm", "c2",
                  "okn2", "s3o")},
              |${DuckKmeansSql.assignTailFor("exm", "normsm", "mc2",
                  "nkn2", "s3n")},
              |${ivfSearchAs("ro", "s3o",
                  "vec_id >= 1000000 AND vec_id < 1000005",
                  "exm", "normsm", 2, 5)},
              |${ivfSearchAs("rn", "s3n",
                  "vec_id >= 1000000 AND vec_id < 1000005",
                  "exm", "normsm", 2, 5)},
              |fdot AS (
              |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
              |         SUM(CAST(q.v AS DOUBLE) * CAST(t.v AS DOUBLE)) AS dot
              |  FROM exm q JOIN exm t ON q.i = t.i
              |  WHERE q.vec_id >= 1000000 AND q.vec_id < 1000005
              |    AND t.vec_id <> q.vec_id
              |  GROUP BY 1, 2),
              |etop AS (SELECT query_id, neighbor_id FROM (
              |  SELECT d.query_id, d.neighbor_id, row_number() OVER (
              |      PARTITION BY d.query_id
              |      ORDER BY ROUND(d.dot / (nq.nrm * nn.nrm), 6) DESC,
              |        d.neighbor_id) AS rnk
              |  FROM fdot d
              |  JOIN normsm nq ON nq.vec_id = d.query_id
              |  JOIN normsm nn ON nn.vec_id = d.neighbor_id)
              |  WHERE rnk <= 5),
              |eqx AS (SELECT DISTINCT query_id FROM etop),
              |ho AS (SELECT a.query_id, COUNT(*) AS hits
              |  FROM rorun a JOIN etop e
              |    ON a.query_id = e.query_id
              |   AND a.neighbor_id = e.neighbor_id
              |  GROUP BY 1),
              |hn AS (SELECT a.query_id, COUNT(*) AS hits
              |  FROM rnrun a JOIN etop e
              |    ON a.query_id = e.query_id
              |   AND a.neighbor_id = e.neighbor_id
              |  GROUP BY 1),
              |ro2 AS (SELECT q.query_id,
              |    CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_old
              |  FROM eqx q LEFT JOIN ho h USING (query_id)),
              |rn2 AS (SELECT q.query_id,
              |    CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits_new
              |  FROM eqx q LEFT JOIN hn h USING (query_id)),
              |mo AS (SELECT (2 * SUM(hits_old) * 1000000 + 5 * COUNT(*))
              |    // (2 * 5 * COUNT(*)) AS mean_old FROM ro2),
              |mn AS (SELECT (2 * SUM(hits_new) * 1000000 + 5 * COUNT(*))
              |    // (2 * 5 * COUNT(*)) AS mean_new FROM rn2),
              |cca AS (SELECT i, CAST(CAST(ROUND(AVG(CAST(v AS DOUBLE)), 6)
              |    AS FLOAT) AS DOUBLE) AS c FROM exo GROUP BY 1),
              |ccb AS (SELECT i, CAST(CAST(ROUND(AVG(CAST(v AS DOUBLE)), 6)
              |    AS FLOAT) AS DOUBLE) AS c FROM exn GROUP BY 1),
              |cx AS (SELECT SUM(a.c * b.c) AS dd, SUM(a.c * a.c) AS a2,
              |    SUM(b.c * b.c) AS b2
              |  FROM cca a JOIN ccb b USING (i)),
              |dr AS (SELECT CAST(CASE WHEN a2 > 0 AND b2 > 0 THEN
              |    ROUND(ROUND(dd / (sqrt(a2) * sqrt(b2)), 6) * 1e6) END
              |    AS BIGINT) AS ccm FROM cx),
              |vd AS (SELECT dr.ccm AS centroid_cos_micros,
              |    COALESCE(dr.ccm < 900000, TRUE) AS drifted,
              |    CAST(mo.mean_old AS BIGINT) AS mean_recall_old_ppm,
              |    CAST(mn.mean_new AS BIGINT) AS mean_recall_new_ppm,
              |    COALESCE(dr.ccm < 900000, TRUE)
              |      AND mn.mean_new >= 700000 AS reindex_accepted
              |  FROM dr, mo, mn)
              |SELECT o.query_id, o.hits_old,
              |  CAST((2 * o.hits_old * 1000000 + 5) // 10 AS BIGINT)
              |    AS recall_old_ppm,
              |  n.hits_new,
              |  CAST((2 * n.hits_new * 1000000 + 5) // 10 AS BIGINT)
              |    AS recall_new_ppm,
              |  vd.*
              |FROM ro2 o JOIN rn2 n USING (query_id), vd""".stripMargin)),

    // ---- SIM20: embedding-batch drift monitor -----------------------------
    // Even vs odd vec_ids as yesterday/today batches: per-dim centroid
    // means under the kmeans float discipline, mean squared norms in
    // exact micros, the 6-dp micro cosine between centroids. The
    // oracle replays both sides from the exploded relation.
    Q("q_sim20_embedding_drift",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.embeddingDrift(
          emb.filter(col("vec_id") % 2 === 0),
          emb.filter(col("vec_id") % 2 === 1))
      },
      Some("""WITH ea AS (SELECT vec_id, unnest(embedding) AS v,
             |    unnest(range(1, len(embedding) + 1)) AS i
             |  FROM embeddings WHERE vec_id % 2 = 0),
             |eb AS (SELECT vec_id, unnest(embedding) AS v,
             |    unnest(range(1, len(embedding) + 1)) AS i
             |  FROM embeddings WHERE vec_id % 2 = 1),
             |ca AS (SELECT i, CAST(CAST(ROUND(AVG(CAST(v AS DOUBLE)), 6)
             |    AS FLOAT) AS DOUBLE) AS c
             |  FROM ea GROUP BY 1),
             |cb AS (SELECT i, CAST(CAST(ROUND(AVG(CAST(v AS DOUBLE)), 6)
             |    AS FLOAT) AS DOUBLE) AS c
             |  FROM eb GROUP BY 1),
             |na AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_a,
             |    CAST(CAST(ROUND(AVG(m), 6) AS DECIMAL(18,6)) * 1000000
             |      AS BIGINT) AS msq_a_micros
             |  FROM (SELECT vec_id,
             |      SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS m
             |    FROM ea GROUP BY 1)),
             |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_b,
             |    CAST(CAST(ROUND(AVG(m), 6) AS DECIMAL(18,6)) * 1000000
             |      AS BIGINT) AS msq_b_micros
             |  FROM (SELECT vec_id,
             |      SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE)) AS m
             |    FROM eb GROUP BY 1)),
             |cx AS (SELECT SUM(ca.c * cb.c) AS d,
             |    SUM(ca.c * ca.c) AS a2, SUM(cb.c * cb.c) AS b2
             |  FROM ca JOIN cb USING (i))
             |SELECT na.n_a, nb.n_b, na.msq_a_micros, nb.msq_b_micros,
             |  CAST(CASE WHEN a2 > 0 AND b2 > 0 THEN
             |    ROUND(ROUND(d / (sqrt(a2) * sqrt(b2)), 6) * 1e6) END
             |    AS BIGINT) AS centroid_cos_micros
             |FROM na, nb, cx""".stripMargin)),

    // ---- SIM1: brute-force cosine top-k --------------------------------
    Q("q_sim1_cosine_topk",
      (s, d) => Similarity.bruteForceTopK(
        Tables.embeddings(s, d), col("vec_id") < 5, 10),
      Some(s"""$duckEx,
              |dots AS (
              |  SELECT qx.vec_id AS query_id, e.vec_id AS neighbor_id,
              |         SUM(CAST(qx.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS dot
              |  FROM ex qx JOIN ex e ON qx.i = e.i
              |  WHERE qx.vec_id < 5 AND e.vec_id <> qx.vec_id
              |  GROUP BY 1, 2),
              |scored AS (
              |  SELECT d.query_id, d.neighbor_id,
              |         ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS score
              |  FROM dots d
              |  JOIN norms nq ON nq.vec_id = d.query_id
              |  JOIN norms nn ON nn.vec_id = d.neighbor_id)
              |SELECT query_id, neighbor_id, score, rnk FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
              |  FROM scored)
              |WHERE rnk <= 10""".stripMargin)),

    // ---- SIM19: ranking-quality eval (nDCG/MRR/recall@k) -----------------
    // trec_eval closed in-engine over the q_sim1 run and a synthetic
    // graded qrels relation ((q·7 + d) % 5 -> grades 2/1/0 — engine-
    // independent). All integer: gains 2^rel − 1, the one irrational
    // (1/log2(r+1)) inlined as the SAME micro-literal table in both
    // engines (Similarity.ndcgDiscountsM), ndcg as half-up ppm.
    Q("q_sim19_rank_eval",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val run = Similarity.bruteForceTopK(emb, col("vec_id") < 5, 10)
        val qrels = emb.select(col("vec_id").as("doc_id"))
          .crossJoin(broadcast(emb.filter(col("vec_id") < 5)
            .select(col("vec_id").as("query_id"))))
          .filter(col("query_id") =!= col("doc_id"))
          .withColumn("rel",
            when((col("query_id") * 7 + col("doc_id")) % 5 === 0, 2)
              .when((col("query_id") * 7 + col("doc_id")) % 5 === 1, 1)
              .otherwise(0))
        Similarity.rankEval(run, qrels, k = 10)
      },
      Some {
        val disc = Similarity.ndcgDiscountsM(10).zipWithIndex
          .map { case (dm, i) => s"(${i + 1}, ${dm})" }.mkString(", ")
        s"""$duckEx,
           |run AS (
           |  SELECT query_id, neighbor_id, rnk FROM (
           |    SELECT d.query_id, d.neighbor_id,
           |      row_number() OVER (PARTITION BY d.query_id
           |        ORDER BY ROUND(d.dot / (nq.nrm * nn.nrm), 6) DESC,
           |          d.neighbor_id) AS rnk
           |    FROM (
           |      SELECT qx.vec_id AS query_id, e.vec_id AS neighbor_id,
           |             SUM(CAST(qx.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS dot
           |      FROM ex qx JOIN ex e ON qx.i = e.i
           |      WHERE qx.vec_id < 5 AND e.vec_id <> qx.vec_id
           |      GROUP BY 1, 2) d
           |    JOIN norms nq ON nq.vec_id = d.query_id
           |    JOIN norms nn ON nn.vec_id = d.neighbor_id)
           |  WHERE rnk <= 10),
           |qrels AS (
           |  SELECT q.vec_id AS query_id, e.vec_id AS doc_id,
           |    CASE (q.vec_id * 7 + e.vec_id) % 5
           |      WHEN 0 THEN 2 WHEN 1 THEN 1 ELSE 0 END AS rel
           |  FROM embeddings e, (SELECT vec_id FROM embeddings WHERE vec_id < 5) q
           |  WHERE q.vec_id <> e.vec_id),
           |disc(rnk, dm) AS (SELECT * FROM (VALUES $disc)),
           |nrel AS (SELECT query_id,
           |    CAST(COUNT(CASE WHEN rel > 0 THEN 1 END) AS BIGINT) AS n_rel
           |  FROM qrels GROUP BY 1),
           |ideal AS (
           |  SELECT query_id, SUM(((CAST(1 AS BIGINT) << rel) - 1) * dm) AS idcg
           |  FROM (SELECT query_id, rel, row_number() OVER (
           |      PARTITION BY query_id ORDER BY rel DESC, doc_id) AS rn
           |    FROM qrels WHERE rel > 0)
           |  JOIN disc ON disc.rnk = rn
           |  WHERE rn <= 10 GROUP BY 1),
           |per AS (
           |  SELECT r.query_id,
           |    SUM(((CAST(1 AS BIGINT) << COALESCE(j.rel, 0)) - 1) * d.dm) AS dcg,
           |    COUNT(CASE WHEN j.rel > 0 THEN 1 END) AS hits,
           |    MIN(CASE WHEN j.rel > 0 THEN r.rnk END) AS fr
           |  FROM run r
           |  LEFT JOIN qrels j ON j.query_id = r.query_id
           |    AND j.doc_id = r.neighbor_id
           |  JOIN disc d ON d.rnk = r.rnk
           |  GROUP BY 1)
           |SELECT n.query_id, n.n_rel,
           |  CAST(COALESCE(1000000 // p.fr, 0) AS BIGINT) AS mrr_ppm,
           |  CAST(CASE WHEN n.n_rel > 0
           |    THEN (COALESCE(p.hits, 0) * 1000000) // n.n_rel END
           |    AS BIGINT) AS recall_ppm,
           |  CAST(CASE WHEN i.idcg IS NOT NULL
           |    THEN (2 * COALESCE(p.dcg, 0) * 1000000 + i.idcg) // (2 * i.idcg)
           |    END AS BIGINT) AS ndcg_ppm
           |FROM nrel n
           |LEFT JOIN ideal i ON i.query_id = n.query_id
           |LEFT JOIN per p ON p.query_id = n.query_id""".stripMargin
      }),

    // ---- SIM14: MMR diversity re-rank over the q_sim1 run ---------------
    // Greedy maximal marginal relevance in exact integer micros:
    // mmr = 7·rel_m − 3·maxsim_m, ties to the lowest doc id; the oracle
    // unrolls the 5 greedy rounds as MATERIALIZED CTEs (the kpp/ff
    // discipline) over the same rank-10 candidate run.
    Q("q_sim14_mmr",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Similarity.mmrRerank(
          Similarity.bruteForceTopK(emb, col("vec_id") < 5, 10)
            .select(col("query_id"), col("neighbor_id"), col("score")),
          emb, k = 5, lambdaTenths = 7)
      },
      Some(s"""$duckEx,
              |cand AS MATERIALIZED (
              |  SELECT query_id, neighbor_id,
              |    CAST(ROUND(score * 1000000) AS BIGINT) AS rel_m
              |  FROM (
              |    SELECT query_id, neighbor_id, score, row_number() OVER (
              |      PARTITION BY query_id ORDER BY score DESC, neighbor_id)
              |      AS rnk
              |    FROM (SELECT d.query_id, d.neighbor_id,
              |        ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS score
              |      FROM (SELECT qx.vec_id AS query_id,
              |          e.vec_id AS neighbor_id,
              |          SUM(CAST(qx.v AS DOUBLE) * CAST(e.v AS DOUBLE))
              |            AS dot
              |        FROM ex qx JOIN ex e ON qx.i = e.i
              |        WHERE qx.vec_id < 5 AND e.vec_id <> qx.vec_id
              |        GROUP BY 1, 2) d
              |      JOIN norms nq ON nq.vec_id = d.query_id
              |      JOIN norms nn ON nn.vec_id = d.neighbor_id))
              |  WHERE rnk <= 10),
              |cids AS MATERIALIZED (SELECT DISTINCT neighbor_id FROM cand),
              |dd AS MATERIALIZED (
              |  SELECT x.vec_id AS aa, y.vec_id AS bb,
              |    SUM(CAST(x.v AS DOUBLE) * CAST(y.v AS DOUBLE)) AS dot
              |  FROM ex x JOIN cids ca ON ca.neighbor_id = x.vec_id
              |  JOIN ex y ON y.i = x.i
              |  JOIN cids cb ON cb.neighbor_id = y.vec_id
              |  WHERE x.vec_id <> y.vec_id
              |  GROUP BY 1, 2),
              |pw AS MATERIALIZED (
              |  SELECT a.query_id, a.neighbor_id AS a_id,
              |    b.neighbor_id AS b_id,
              |    CAST(ROUND(ROUND(dd.dot / (na.nrm * nb.nrm), 6) * 1000000)
              |      AS BIGINT) AS sim_m
              |  FROM cand a
              |  JOIN cand b ON b.query_id = a.query_id
              |    AND b.neighbor_id <> a.neighbor_id
              |  JOIN dd ON dd.aa = a.neighbor_id AND dd.bb = b.neighbor_id
              |  JOIN norms na ON na.vec_id = a.neighbor_id
              |  JOIN norms nb ON nb.vec_id = b.neighbor_id),
              |${duckMmrRounds(5)}
              |SELECT query_id, neighbor_id AS doc_id, mmr_m, rnk
              |FROM (${(1 to 5).map(r => s"SELECT * FROM sel$r")
                .mkString(" UNION ALL ")})""".stripMargin)),

    // ---- SIM12: SQ8 scalar quantization, map-only encode ----------------
    // Per-dimension affine grid from one hash agg; codes inline as a
    // joined string (the driver compare can't diff LIST cells). The
    // oracle replays the grid, the rounding, and the clamps per element.
    Q("q_sim12_sq8_encode",
      (s, d) => graft.operators.Sq.sqEncode(Tables.embeddings(s, d))
        .select(col("vec_id"),
          col("codes").cast("array<string>").as("c_str"))
        .select(col("vec_id"), array_join(col("c_str"), ",").as("codes_str")),
      Some(s"""$duckEx,
              |mm AS (SELECT i, min(CAST(v AS DOUBLE)) AS mn,
              |    max(CAST(v AS DOUBLE)) AS mx
              |  FROM ex GROUP BY i),
              |cd AS (SELECT e.vec_id, e.i,
              |    CASE WHEN m.mx = m.mn THEN 0
              |      ELSE LEAST(255, GREATEST(0, CAST(round(
              |        (CAST(e.v AS DOUBLE) - m.mn) * 255 / (m.mx - m.mn))
              |        AS INT))) END AS c
              |  FROM ex e JOIN mm m ON m.i = e.i)
              |SELECT vec_id, string_agg(c, ',' ORDER BY i) AS codes_str
              |FROM cd GROUP BY vec_id""".stripMargin)),

    // ---- SIM13: SQ8 asymmetric top-k (exact query vs dequantized corpus)
    // The ADC discipline at the scalar tier: queries keep float vectors,
    // corpus rides as uint8 codes and dequantizes in the map stage;
    // cosine at 6 dp, ties to the lowest id, self excluded.
    Q("q_sim13_sq8_topk",
      (s, d) => graft.operators.Sq.sqTopK(
        Tables.embeddings(s, d), col("vec_id") < 5, 5),
      Some(duckSq8TopK)),

    // ---- SIM15: SQ8 search from the PERSISTED index ---------------------
    // The nightly shape: params grid + uint8 codes persist once; query
    // batches score against the stores only (the float corpus enters
    // the plan solely as the 5 query vectors). Lossless integer store
    // -> shares q_sim13's oracle VERBATIM; equality is the proof.
    Q("q_sim15_sq8_store",
      (s, d) => {
        val dir = TempDirs.scratch("graft_sq8_")
        graft.operators.Sq.writeSqIndex(Tables.embeddings(s, d), dir)
        graft.operators.Sq.sqTopKFromIndex(s, dir,
          Tables.embeddings(s, d).filter(col("vec_id") < 5), 5)
      },
      Some(duckSq8TopK)),


    // ---- SIM10: hard-negative mining (contrastive-training pairs) -------
    // Top-40 retrieval, drop the near-dup band (score >= 0.35, q_sim3's
    // tau), keep the 10 best survivors — similar-but-not-duplicate, the
    // negatives a contrastive batch actually needs. Oracle = the q_sim1
    // scoring chain + rank-40 cut + band filter + re-rank.
    Q("q_sim10_hard_negatives",
      (s, d) => Similarity.hardNegatives(Tables.embeddings(s, d),
        col("vec_id") < 5, k = 10, kRetrieve = 40, tauNear = 0.35),
      Some(s"""$duckEx,
              |dots AS (
              |  SELECT qx.vec_id AS query_id, e.vec_id AS neighbor_id,
              |         SUM(CAST(qx.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS dot
              |  FROM ex qx JOIN ex e ON qx.i = e.i
              |  WHERE qx.vec_id < 5 AND e.vec_id <> qx.vec_id
              |  GROUP BY 1, 2),
              |scored AS (
              |  SELECT d.query_id, d.neighbor_id,
              |         ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS score
              |  FROM dots d
              |  JOIN norms nq ON nq.vec_id = d.query_id
              |  JOIN norms nn ON nn.vec_id = d.neighbor_id),
              |cand AS (
              |  SELECT query_id, neighbor_id, score FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rk
              |    FROM scored)
              |  WHERE rk <= 40)
              |SELECT query_id, neighbor_id, score, rnk FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
              |  FROM cand WHERE score < 0.35)
              |WHERE rnk <= 10""".stripMargin)),

    // ---- SIM2: sign-LSH bucketing (the ANN scale path) ------------------
    Q("q_sim2_lsh_buckets",
      (s, d) => Similarity.lshBuckets(Tables.embeddings(s, d), 4),
      Some(s"""$duckEx,
              |$duckBuckets
              |SELECT vec_id, bucket FROM bkt""".stripMargin)),

    // ---- SIM6: k-means quantizer training (Lloyd's, DataFrame-only) -----
    // The oracle replays the same 2 fixed iterations as recursive CTE-free
    // SQL; hash-matching here proves both engines materialize bit-identical
    // trained centroids.
    Q("q_sim6_kmeans",
      (s, d) => Kmeans.train(Tables.embeddings(s, d), 8, 2)
        .select(col("centroid_id"), posexplode(col("cv")).as(Seq("p", "x")))
        .select(col("centroid_id"), (col("p") + 1).cast("long").as("dim"),
          col("x").cast("double").as("cval")),
      Some(s"""$duckEx,
              |$duckKmeans
              |SELECT centroid_id, i AS dim, cv AS cval FROM c2""".stripMargin)),

    // ---- SIM7: farthest-first init + Lloyd training ----------------------
    // The k-means++-style seeding, deterministic (argmin of max cosine,
    // ties to the lowest id). The oracle replays all 7 selection rounds
    // AND the 2 Lloyd iterations; hash equality proves both the greedy
    // chain and the training are bit-identical across engines.
    Q("q_sim7_ff_kmeans",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Kmeans.trainFrom(e, Kmeans.farthestFirstInit(e, 8), 2)
          .select(col("centroid_id"), posexplode(col("cv")).as(Seq("p", "x")))
          .select(col("centroid_id"), (col("p") + 1).cast("long").as("dim"),
            col("x").cast("double").as("cval"))
      },
      Some(s"""$duckEx,
              |$duckFf,
              |c0 AS (SELECT CAST(c.ord AS BIGINT) AS centroid_id,
              |    CAST(e.v AS DOUBLE) AS cv, e.i
              |  FROM ch8 c JOIN ex e ON e.vec_id = c.cid),
              |${kmIter(1)},
              |${kmIter(2)}
              |SELECT centroid_id, i AS dim, cv AS cval FROM c2""".stripMargin)),

    // ---- SIM11: SAMPLED farthest-first init + Lloyd training ------------
    // q_sim7's scale form: one md5-ordered corpus pass extracts a
    // k·32-vector sample, the k-serial greedy loop runs over the
    // SAMPLE only (sample-sized jobs, corpus never rescanned), then
    // Lloyd trains on the full corpus as usual. The oracle replays the
    // sample cut, all 7 selection rounds over it, and both Lloyd
    // iterations — bit-identical across engines.
    Q("q_sim11_ff_sampled",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Kmeans.trainFrom(e, Kmeans.farthestFirstInitSampled(e, 8, 32), 2)
          .select(col("centroid_id"), posexplode(col("cv")).as(Seq("p", "x")))
          .select(col("centroid_id"), (col("p") + 1).cast("long").as("dim"),
            col("x").cast("double").as("cval"))
      },
      Some(s"""$duckEx,
              |${duckFfSampled(8 * 32)},
              |c0 AS (SELECT CAST(c.ord AS BIGINT) AS centroid_id,
              |    CAST(e.v AS DOUBLE) AS cv, e.i
              |  FROM ch8 c JOIN ex e ON e.vec_id = c.cid),
              |${kmIter(1)},
              |${kmIter(2)}
              |SELECT centroid_id, i AS dim, cv AS cval FROM c2""".stripMargin)),

    // ---- SIM4: IVF coarse-quantizer assignment on TRAINED centroids -----
    Q("q_sim4_ivf_assign",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.assignToCentroids(e, Kmeans.train(e, 8, 2))
      },
      Some(s"""$duckEx,
              |$duckKmeans
              |SELECT vec_id, centroid_id, score FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |  FROM s3)
              |WHERE rn = 1""".stripMargin)),

    // ---- SIM5: IVF probed-list top-k search on TRAINED centroids --------
    Q("q_sim5_ivf_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopKWith(e, Kmeans.train(e, 8, 2),
          col("vec_id") < 5, nProbe = 2, k = 5)
      },
      Some(s"""$duckEx,
              |$duckKmeans,
              |$duckIvfSearch""".stripMargin)),

    // ---- SIM8: IVF top-k on K-MEANS‖-seeded centroids -------------------
    // Same probed search as q_sim5, scale-path seeding: k-means‖ samples
    // candidates in O(rounds) corpus passes (no k-serial driver loop —
    // this used to run on the farthest-first chain, whose k−1 sequential
    // rounds are exactly the shape that dies at large k; q_sim7 keeps
    // that operator under oracle as the documented recall/latency
    // trade). The oracle reuses q_sim9's seeding chain at k=8, aliases
    // its wc2 seeds to the c2 trained-centroid contract, and reuses the
    // assignment + search blocks verbatim.
    Q("q_sim8_kpp_ivf_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.ivfTopKWith(e,
          Kmeans.kmeansParallelInit(e, 8, rounds = 3, oversample = 32,
            refineIters = 2),
          col("vec_id") < 5, nProbe = 2, k = 5)
      },
      Some(s"""$duckEx,
              |cs0 AS MATERIALIZED (SELECT MIN(vec_id) AS cid FROM embeddings),
              |${kppRound(1, 32)},
              |${kppRound(2, 32)},
              |${kppRound(3, 32)},
              |${kppReduce(3, 8, 2)},
              |c2 AS (SELECT centroid_id, i, cv FROM wc2),
              |$duckAssignTail,
              |$duckIvfSearch""".stripMargin)),

    // ---- SIM3: embedding near-dup (bucket candidates + exact rescore) ---
    // 0.35 sits in the meaningful tail of the synthetic corpus (its max
    // in-bucket cosine is ~0.47), so the rescore+filter path is actually
    // exercised — a production dedup threshold like 0.9 returns the empty
    // set here, which would make this an empty==empty check.
    Q("q_sim3_embedding_neardup",
      (s, d) => Similarity.nearDupByCosine(Tables.embeddings(s, d), 4, 0.35),
      Some(s"""$duckEx,
              |$duckBuckets,
              |pairs AS (
              |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
              |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              |pd AS (
              |  SELECT p.a_id, p.b_id,
              |         SUM(CAST(ea.v AS DOUBLE) * CAST(eb.v AS DOUBLE)) AS dot
              |  FROM pairs p
              |  JOIN ex ea ON ea.vec_id = p.a_id
              |  JOIN ex eb ON eb.vec_id = p.b_id AND eb.i = ea.i
              |  GROUP BY 1, 2)
              |SELECT * FROM (
              |  SELECT pd.a_id, pd.b_id,
              |         ROUND(pd.dot / (na.nrm * nb.nrm), 6) AS score
              |  FROM pd
              |  JOIN norms na ON na.vec_id = pd.a_id
              |  JOIN norms nb ON nb.vec_id = pd.b_id)
              |WHERE score >= 0.35""".stripMargin)),

    // ---- SIM9: k-means|| oversampled seeding at k=64 --------------------
    // The LARGE-k init: round count independent of k (3 sampling rounds +
    // 2 weighted refinements — never k sequential driver rounds like the
    // ff chain). The oracle replays the md5-bucketed distance-proportional
    // sampling, the weighting/top-k reduction, AND both weighted Lloyd
    // iterations; hash equality proves the whole seeding is bit-identical
    // across engines at production-shaped k.
    Q("q_sim9_kmeanspar_seeds",
      (s, d) => Kmeans.kmeansParallelInit(Tables.embeddings(s, d), 64,
          rounds = 3, oversample = 32, refineIters = 2)
        .select(col("centroid_id"), posexplode(col("cv")).as(Seq("p", "x")))
        .select(col("centroid_id"), (col("p") + 1).cast("long").as("dim"),
          col("x").cast("double").as("cval")),
      Some(s"""$duckEx,
              |cs0 AS MATERIALIZED (SELECT MIN(vec_id) AS cid FROM embeddings),
              |${kppRound(1, 32)},
              |${kppRound(2, 32)},
              |${kppRound(3, 32)},
              |${kppReduce(3, 64, 2)}
              |SELECT centroid_id, i AS dim, cv AS cval FROM wc2""".stripMargin)),

    // ---- SIM17: recall@k of a truncated-dimension tier vs exact ---------
    // The matryoshka evaluation: the first 16 of 64 dims retrieve
    // brute-force top-10 (cosine re-normalizes, so truncation alone IS
    // the MRL cheap tier), scored against the full-dimension baseline by
    // the generic recallAtK gate (exact hits + half-up ppm). Queries the
    // cheap tier misses entirely still emit hits=0. The oracle replays
    // both retrieval tiers and the semi-join count.
    Q("q_sim17_mrl_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val trunc = emb.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("embedding"))
        Similarity.recallAtK(
          Similarity.bruteForceTopK(trunc, col("vec_id") < 5, 10),
          Similarity.bruteForceTopK(emb, col("vec_id") < 5, 10), 10)
      },
      Some(s"""$duckEx,
              |e16 AS (SELECT vec_id, v, i FROM ex WHERE i <= 16),
              |n16 AS (SELECT vec_id,
              |    sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
              |  FROM e16 GROUP BY 1),
              |fdot AS (
              |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
              |         SUM(CAST(q.v AS DOUBLE) * CAST(t.v AS DOUBLE)) AS dot
              |  FROM ex q JOIN ex t ON q.i = t.i
              |  WHERE q.vec_id < 5 AND t.vec_id <> q.vec_id
              |  GROUP BY 1, 2),
              |etop AS (SELECT query_id, neighbor_id FROM (
              |  SELECT d.query_id, d.neighbor_id, row_number() OVER (
              |      PARTITION BY d.query_id
              |      ORDER BY ROUND(d.dot / (nq.nrm * nn.nrm), 6) DESC,
              |        d.neighbor_id) AS rnk
              |  FROM fdot d
              |  JOIN norms nq ON nq.vec_id = d.query_id
              |  JOIN norms nn ON nn.vec_id = d.neighbor_id)
              |  WHERE rnk <= 10),
              |tdot AS (
              |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
              |         SUM(CAST(q.v AS DOUBLE) * CAST(t.v AS DOUBLE)) AS dot
              |  FROM e16 q JOIN e16 t ON q.i = t.i
              |  WHERE q.vec_id < 5 AND t.vec_id <> q.vec_id
              |  GROUP BY 1, 2),
              |atop AS (SELECT query_id, neighbor_id FROM (
              |  SELECT d.query_id, d.neighbor_id, row_number() OVER (
              |      PARTITION BY d.query_id
              |      ORDER BY ROUND(d.dot / (nq.nrm * nn.nrm), 6) DESC,
              |        d.neighbor_id) AS rnk
              |  FROM tdot d
              |  JOIN n16 nq ON nq.vec_id = d.query_id
              |  JOIN n16 nn ON nn.vec_id = d.neighbor_id)
              |  WHERE rnk <= 10),
              |hits AS (SELECT a.query_id, COUNT(*) AS hits
              |  FROM atop a JOIN etop e
              |    ON a.query_id = e.query_id
              |   AND a.neighbor_id = e.neighbor_id
              |  GROUP BY 1)
              |SELECT q.query_id,
              |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
              |  CAST((2 * COALESCE(h.hits, 0) * 1000000 + 10) // 20
              |    AS BIGINT) AS recall_ppm
              |FROM (SELECT DISTINCT query_id FROM etop) q
              |LEFT JOIN hits h USING (query_id)""".stripMargin)),

    // ---- SIM18: recall@k of the PRODUCTION IVF tier vs exact -------------
    // recallAtK composed over q_sim5's probed search (trained quantizer,
    // nProbe=2) against the exact brute force — the acceptance gate an
    // IVF deployment runs before swapping tiers. The oracle replays the
    // whole chain: training, assignment, probed search, exact baseline,
    // and the semi-join count.
    Q("q_sim18_ivf_recall",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Similarity.recallAtK(
          Similarity.ivfTopKWith(e, Kmeans.train(e, 8, 2),
            col("vec_id") < 5, nProbe = 2, k = 5),
          Similarity.bruteForceTopK(e, col("vec_id") < 5, 5), 5)
      },
      Some(s"""$duckEx,
              |$duckKmeans,
              |$duckIvfAsCte,
              |fdot AS (
              |  SELECT q.vec_id AS query_id, t.vec_id AS neighbor_id,
              |         SUM(CAST(q.v AS DOUBLE) * CAST(t.v AS DOUBLE)) AS dot
              |  FROM ex q JOIN ex t ON q.i = t.i
              |  WHERE q.vec_id < 5 AND t.vec_id <> q.vec_id
              |  GROUP BY 1, 2),
              |etop AS (SELECT query_id, neighbor_id FROM (
              |  SELECT d.query_id, d.neighbor_id, row_number() OVER (
              |      PARTITION BY d.query_id
              |      ORDER BY ROUND(d.dot / (nq.nrm * nn.nrm), 6) DESC,
              |        d.neighbor_id) AS rnk
              |  FROM fdot d
              |  JOIN norms nq ON nq.vec_id = d.query_id
              |  JOIN norms nn ON nn.vec_id = d.neighbor_id)
              |  WHERE rnk <= 5),
              |hh AS (SELECT a.query_id, COUNT(*) AS hits
              |  FROM ivf a JOIN etop e2
              |    ON a.query_id = e2.query_id
              |   AND a.neighbor_id = e2.neighbor_id
              |  GROUP BY 1)
              |SELECT q.query_id,
              |  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
              |  CAST((2 * COALESCE(h.hits, 0) * 1000000 + 5) // 10
              |    AS BIGINT) AS recall_ppm
              |FROM (SELECT DISTINCT query_id FROM etop) q
              |LEFT JOIN hh h USING (query_id)""".stripMargin)),

    // ---- SIM16: margin-based bitext mining (ratio margin, exact ppm) ----
    // Artetxe-Schwenk: source side vec_id < 25 (the mined-query set —
    // broadcasts), targets the rest; k = 4 neighbors on BOTH sides feed
    // the hub-deflating denominator. Every number is integer micros/ppm
    // (margin = 2k·cm / (sx+sy), long division truncating toward zero in
    // both engines), so the oracle replays each rank and tie exactly.
    Q("q_sim16_bitext_margin",
      (s, d) => Similarity.bitextMarginTopK(Tables.embeddings(s, d),
        col("vec_id") < 25, k = 4),
      Some(s"""$duckEx,
              |dots AS (
              |  SELECT a.vec_id AS src_id, b.vec_id AS tgt_id,
              |         SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot
              |  FROM ex a JOIN ex b ON a.i = b.i
              |  WHERE a.vec_id < 25 AND b.vec_id >= 25
              |  GROUP BY 1, 2),
              |cd AS (
              |  SELECT d.src_id, d.tgt_id,
              |    CAST(ROUND(ROUND(d.dot / (na.nrm * nb.nrm), 6) * 1e6)
              |      AS BIGINT) AS cm
              |  FROM dots d JOIN norms na ON na.vec_id = d.src_id
              |  JOIN norms nb ON nb.vec_id = d.tgt_id),
              |sx AS (SELECT src_id, SUM(cm) AS sx FROM (
              |    SELECT src_id, cm, row_number() OVER (
              |      PARTITION BY src_id ORDER BY cm DESC, tgt_id) AS rn
              |    FROM cd)
              |  WHERE rn <= 4 GROUP BY 1),
              |sy AS (SELECT tgt_id, SUM(cm) AS sy FROM (
              |    SELECT tgt_id, cm, row_number() OVER (
              |      PARTITION BY tgt_id ORDER BY cm DESC, src_id) AS rn
              |    FROM cd)
              |  WHERE rn <= 4 GROUP BY 1),
              |mg AS (SELECT c.src_id, c.tgt_id,
              |    (2 * 4 * c.cm * 1000000) // (sx.sx + sy.sy) AS margin_ppm
              |  FROM cd c JOIN sx USING (src_id) JOIN sy USING (tgt_id)
              |  WHERE sx.sx + sy.sy > 0)
              |SELECT src_id, tgt_id, CAST(margin_ppm AS BIGINT) AS margin_ppm
              |FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY src_id ORDER BY margin_ppm DESC, tgt_id) AS rn
              |  FROM mg)
              |WHERE rn = 1""".stripMargin)),

    // ---- D21: semantic decontamination (embedding cosine vs eval set) ---
    // The embedding-space twin of the n-gram contamination gate (q_d10):
    // benchmark vectors are vec_id < 50 (a fixed-size eval suite — it
    // broadcasts at any corpus scale); a train vector is contaminated at
    // max 6-dp cosine >= 0.35 (exact integer-micro compare at the cut).
    // Verdict per train vector, never a silent drop.
    Q("q_d21_semantic_decontaminate",
      (s, d) => Similarity.semanticDecontaminate(Tables.embeddings(s, d),
        col("vec_id") < 50, tauMicros = 350000L),
      Some(s"""$duckEx,
              |dd AS (
              |  SELECT t.vec_id, e.vec_id AS eval_id,
              |         SUM(CAST(t.v AS DOUBLE) * CAST(e.v AS DOUBLE)) AS dot
              |  FROM ex t JOIN ex e ON t.i = e.i
              |  WHERE t.vec_id >= 50 AND e.vec_id < 50
              |  GROUP BY 1, 2),
              |mx AS (
              |  SELECT d.vec_id,
              |         MAX(ROUND(d.dot / (nt.nrm * ne.nrm), 6)) AS max_eval_cos
              |  FROM dd d
              |  JOIN norms nt ON nt.vec_id = d.vec_id
              |  JOIN norms ne ON ne.vec_id = d.eval_id
              |  GROUP BY 1)
              |SELECT vec_id, max_eval_cos,
              |       CAST(ROUND(max_eval_cos * 1e6) AS BIGINT) < 350000 AS kept
              |FROM mx""".stripMargin)),

    // ---- D15: SemDeDup — semantic dedup (k-means + within-cluster cos) --
    // The oracle replays the full chain: the 2-iteration k=8 training
    // (duckKmeans's c2/s3), the argmax assignment, every within-cluster
    // pair's 6-dp cosine, and the higher-id drop rule.
    Q("q_d15_semantic_dedup",
      (s, d) => Similarity.semanticDedup(Tables.embeddings(s, d),
        k = 8, iters = 2, tau = 0.35),
      Some(s"""$duckEx,
              |$duckKmeans,
              |sd_assign AS (
              |  SELECT vec_id, centroid_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |    FROM s3) WHERE rn = 1),
              |sd_dots AS (
              |  SELECT ma.vec_id AS a_id, mb.vec_id AS b_id,
              |         SUM(CAST(ea.v AS DOUBLE) * CAST(eb.v AS DOUBLE)) AS dot
              |  FROM sd_assign ma JOIN sd_assign mb
              |    ON ma.centroid_id = mb.centroid_id AND ma.vec_id < mb.vec_id
              |  JOIN ex ea ON ea.vec_id = ma.vec_id
              |  JOIN ex eb ON eb.vec_id = mb.vec_id AND eb.i = ea.i
              |  GROUP BY 1, 2),
              |sd_drop AS (
              |  SELECT DISTINCT sd.b_id AS vec_id
              |  FROM sd_dots sd
              |  JOIN norms na ON na.vec_id = sd.a_id
              |  JOIN norms nb ON nb.vec_id = sd.b_id
              |  WHERE ROUND(sd.dot / (na.nrm * nb.nrm), 6) >= 0.35)
              |SELECT a.vec_id, a.centroid_id,
              |       CASE WHEN dr.vec_id IS NOT NULL
              |            THEN 'dropped' ELSE 'kept' END AS status
              |FROM sd_assign a LEFT JOIN sd_drop dr USING (vec_id)""".stripMargin))
  )
}
