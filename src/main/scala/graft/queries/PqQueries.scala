package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Pq
import graft.sources.Tables

/** Product-quantization surface over `embeddings` (64-dim): m=4 subspaces
  * of 16 dims, k=4 codebook entries per subspace, 2 Lloyd iterations —
  * small enough that the DuckDB oracle replays ALL FOUR per-subspace
  * k-means trainings as generated CTE chains (the same fixed-iteration
  * replay technique as q_sim6, suffixed per subspace), yet large enough
  * that codes, LUTs, and ADC ranking are all non-trivially exercised.
  */
object PqQueries extends graft.QueryPack {

  private val M = 4
  private val SubDim = 16
  private val K = 4
  private val TopK = 10

  private val duckEx =
    """ex AS (
      |  SELECT vec_id, unnest(embedding) AS v,
      |         unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings)""".stripMargin

  /** Subspace slice re-based to local dims 1..SubDim, its norms, and the
    * first-K seed centroids — the per-subspace analogue of q_sim6's base. */
  private def subBase(s: Int): String = {
    val lo = s * SubDim + 1
    val hi = (s + 1) * SubDim
    s"""ex_$s AS (SELECT vec_id, v, i - ${s * SubDim} AS i
       |  FROM ex WHERE i BETWEEN $lo AND $hi),
       |norms_$s AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
       |  FROM ex_$s GROUP BY 1),
       |c0_$s AS (SELECT vec_id AS centroid_id, CAST(v AS DOUBLE) AS cv, i
       |  FROM ex_$s WHERE vec_id < $K)""".stripMargin
  }

  /** One Lloyd iteration in subspace `s` (mirrors Kmeans.train exactly:
    * 6-dp cosine argmax with ties to the lowest centroid id, per-dim mean
    * rounded to 6 dp and narrowed through FLOAT, empty clusters keep the
    * previous centroid). */
  private def kmIter(s: Int, n: Int): String = {
    val prev = s"c${n - 1}_$s"
    s"""kn${n - 1}_$s AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm
       |  FROM $prev GROUP BY 1),
       |s${n}_$s AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ex_$s e JOIN $prev c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN norms_$s nv ON nv.vec_id = d.vec_id
       |  JOIN kn${n - 1}_$s nc ON nc.centroid_id = d.centroid_id),
       |a${n}_$s AS (SELECT vec_id, centroid_id FROM (
       |  SELECT vec_id, centroid_id, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM s${n}_$s) WHERE rn = 1),
       |m${n}_$s AS (SELECT a.centroid_id, e.i,
       |    CAST(CAST(ROUND(AVG(CAST(e.v AS DOUBLE)), 6) AS FLOAT) AS DOUBLE) AS cv
       |  FROM a${n}_$s a JOIN ex_$s e ON e.vec_id = a.vec_id GROUP BY 1, 2),
       |c${n}_$s AS (SELECT c.centroid_id, c.i, COALESCE(m.cv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN m${n}_$s m
       |    ON m.centroid_id = c.centroid_id AND m.i = c.i)""".stripMargin
  }

  /** Assignment of every vector against the trained codebook of subspace
    * `s`: `codes_s` = (vec_id, code, score). */
  private def assignSub(s: Int): String =
    s"""kn2_$s AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm FROM c2_$s GROUP BY 1),
       |sc_$s AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ex_$s e JOIN c2_$s c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN norms_$s nv ON nv.vec_id = d.vec_id
       |  JOIN kn2_$s nc ON nc.centroid_id = d.centroid_id),
       |codes_$s AS (SELECT vec_id, centroid_id AS code, score FROM (
       |  SELECT vec_id, centroid_id, score, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM sc_$s) WHERE rn = 1)""".stripMargin

  /** All four trained codebooks (ex + per-subspace base + 2 iterations). */
  private val trained: String =
    (Seq(duckEx) ++ (0 until M).flatMap(s =>
      Seq(subBase(s), kmIter(s, 1), kmIter(s, 2)))).mkString(",\n")

  private val withCodes: String =
    (Seq(trained) ++ (0 until M).map(assignSub)).mkString(",\n")

  override def queries: Seq[Q] = Seq(

    // ---- PQ1: per-subspace codebook training ----------------------------
    Q("q_pq1_codebooks",
      (s, d) => Pq.trainCodebooks(Tables.embeddings(s, d), M, 64, K, 2)
        .select(col("sub_id"), col("centroid_id"), posexplode(col("cv")).as(Seq("p", "x")))
        .select(col("sub_id"), col("centroid_id"),
          (col("p") + 1).cast("long").as("dim"), col("x").cast("double").as("cval")),
      Some(s"""WITH $trained
              |${(0 until M).map(s =>
                 s"SELECT CAST($s AS INTEGER) AS sub_id, centroid_id, i AS dim, cv AS cval FROM c2_$s")
                 .mkString("\nUNION ALL\n")}""".stripMargin)),

    // ---- PQ2: corpus encoding (m codes per vector) ----------------------
    Q("q_pq2_encode",
      (s, d) => Pq.encode(Tables.embeddings(s, d),
        Pq.trainCodebooks(Tables.embeddings(s, d), M, 64, K, 2), M, 64),
      Some(s"""WITH $withCodes
              |${(0 until M).map(s =>
                 s"SELECT vec_id, CAST($s AS INTEGER) AS sub_id, code, score FROM codes_$s")
                 .mkString("\nUNION ALL\n")}""".stripMargin)),

    // ---- PQ3: ADC approximate inner-product top-k -----------------------
    Q("q_pq3_adc_topk",
      (s, d) => Pq.adcTopK(Tables.embeddings(s, d),
        Pq.trainCodebooks(Tables.embeddings(s, d), M, 64, K, 2),
        col("vec_id") < 5, M, 64, TopK),
      Some(s"""WITH $withCodes,
              |${(0 until M).map(s =>
                 s"""lut_$s AS (
                    |  SELECT q.vec_id AS query_id, c.centroid_id AS code,
                    |         ROUND(SUM(CAST(q.v AS DOUBLE) * c.cv), 6) AS contrib
                    |  FROM ex_$s q JOIN c2_$s c ON q.i = c.i
                    |  WHERE q.vec_id < 5 GROUP BY 1, 2),
                    |contrib_$s AS (
                    |  SELECT l.query_id, e.vec_id AS neighbor_id, l.contrib
                    |  FROM codes_$s e JOIN lut_$s l ON l.code = e.code)""".stripMargin)
                 .mkString(",\n")},
              |allc AS (${(0 until M).map(s => s"SELECT * FROM contrib_$s")
                 .mkString(" UNION ALL ")}),
              |agg AS (
              |  SELECT query_id, neighbor_id, ROUND(SUM(contrib), 6) AS approx_score
              |  FROM allc WHERE neighbor_id <> query_id GROUP BY 1, 2)
              |SELECT query_id, neighbor_id, approx_score, rnk FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY approx_score DESC, neighbor_id) AS rnk
              |  FROM agg)
              |WHERE rnk <= $TopK""".stripMargin))
  )
}
