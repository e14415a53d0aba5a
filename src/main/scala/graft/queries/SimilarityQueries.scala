package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Similarity
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

  override def queries: Seq[Q] = Seq(

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

    // ---- SIM2: sign-LSH bucketing (the ANN scale path) ------------------
    Q("q_sim2_lsh_buckets",
      (s, d) => Similarity.lshBuckets(Tables.embeddings(s, d), 4),
      Some(s"""$duckEx,
              |$duckBuckets
              |SELECT vec_id, bucket FROM bkt""".stripMargin)),

    // ---- SIM4: IVF coarse-quantizer assignment (inverted lists) ---------
    Q("q_sim4_ivf_assign",
      (s, d) => Similarity.ivfAssign(Tables.embeddings(s, d), 8),
      Some(s"""$duckEx,
              |cents AS (SELECT vec_id AS centroid_id, v AS cv, i FROM ex WHERE vec_id < 8),
              |cdots AS (
              |  SELECT e.vec_id, c.centroid_id,
              |         SUM(CAST(e.v AS DOUBLE) * CAST(c.cv AS DOUBLE)) AS dot
              |  FROM ex e JOIN cents c ON e.i = c.i GROUP BY 1, 2),
              |scored AS (
              |  SELECT d.vec_id, d.centroid_id,
              |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
              |  FROM cdots d
              |  JOIN norms nv ON nv.vec_id = d.vec_id
              |  JOIN norms nc ON nc.vec_id = d.centroid_id)
              |SELECT vec_id, centroid_id, score FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |  FROM scored)
              |WHERE rn = 1""".stripMargin)),

    // ---- SIM5: IVF probed-list top-k search -----------------------------
    Q("q_sim5_ivf_topk",
      (s, d) => Similarity.ivfTopK(Tables.embeddings(s, d),
        col("vec_id") < 5, numCentroids = 8, nProbe = 2, k = 5),
      Some(s"""$duckEx,
              |cents AS (SELECT vec_id AS centroid_id, v AS cv, i FROM ex WHERE vec_id < 8),
              |cdots AS (
              |  SELECT e.vec_id, c.centroid_id,
              |         SUM(CAST(e.v AS DOUBLE) * CAST(c.cv AS DOUBLE)) AS dot
              |  FROM ex e JOIN cents c ON e.i = c.i GROUP BY 1, 2),
              |cscored AS (
              |  SELECT d.vec_id, d.centroid_id,
              |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
              |  FROM cdots d
              |  JOIN norms nv ON nv.vec_id = d.vec_id
              |  JOIN norms nc ON nc.vec_id = d.centroid_id),
              |assign AS (
              |  SELECT vec_id AS neighbor_id, centroid_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |    FROM cscored) WHERE rn = 1),
              |probes AS (
              |  SELECT vec_id AS query_id, centroid_id FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |    FROM cscored WHERE vec_id < 5) WHERE rn <= 2),
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
              |WHERE rnk <= 5""".stripMargin)),

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
              |WHERE score >= 0.35""".stripMargin))
  )
}
