package graft.queries

/** Shared DuckDB-oracle SQL for replaying [[graft.operators.Kmeans]]
  * bit-for-bit, against ANY exploded vector relation the surrounding
  * query defines as `ex (vec_id, v, i)` (i 1-based) with `norms
  * (vec_id, nrm)` — embeddings (SimilarityQueries) or derived vectors
  * (TextQueries' hashed tf doc vectors). Centroid chains start from a
  * `c0 (centroid_id, cv, i)` the caller builds. */
private[queries] object DuckKmeansSql {

  /** One Lloyd iteration in DuckDB, mirroring [[graft.operators.Kmeans.train]]
    * exactly: assign (argmax of 6-dp cosine, ties to lowest centroid id)
    * then update (per-dim mean rounded to 6 dp, cast through FLOAT — the
    * same IEEE narrowing Spark's float storage applies), empty clusters
    * keep the previous centroid. `c{n}`/`kn{n}` = centroids/norms after
    * n iterations, `s{n}` = scores of every vector against `c{n-1}`. */
  def kmIter(n: Int, p: String = "", ex: String = "ex",
      norms: String = "norms"): String = {
    val prev = s"${p}c${n - 1}"
    s"""${p}kn${n - 1} AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm
       |  FROM $prev GROUP BY 1),
       |${p}s$n AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM $ex e JOIN $prev c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN $norms nv ON nv.vec_id = d.vec_id
       |  JOIN ${p}kn${n - 1} nc ON nc.centroid_id = d.centroid_id),
       |${p}a$n AS (SELECT vec_id, centroid_id FROM (
       |  SELECT vec_id, centroid_id, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM ${p}s$n) WHERE rn = 1),
       |${p}m$n AS (SELECT a.centroid_id, e.i,
       |    CAST(CAST(ROUND(AVG(CAST(e.v AS DOUBLE)), 6) AS FLOAT) AS DOUBLE) AS cv
       |  FROM ${p}a$n a JOIN $ex e ON e.vec_id = a.vec_id GROUP BY 1, 2),
       |${p}c$n AS (SELECT c.centroid_id, c.i, COALESCE(m.cv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN ${p}m$n m
       |    ON m.centroid_id = c.centroid_id AND m.i = c.i)""".stripMargin
  }

  /** Post-training assignment: `<out>` = every `<ex>` vector's 6-dp
    * score against the trained `<cents>` (norm helper CTE `<kn>`). */
  def assignTailFor(ex: String, norms: String, cents: String,
      kn: String, out: String): String =
    s"""$kn AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm FROM $cents GROUP BY 1),
       |$out AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM $ex e JOIN $cents c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN $norms nv ON nv.vec_id = d.vec_id
       |  JOIN $kn nc ON nc.centroid_id = d.centroid_id)""".stripMargin

  /** Post-training assignment: `s3` = every vector's 6-dp score against
    * the trained `c2`. */
  val assignTail: String = assignTailFor("ex", "norms", "c2", "kn2", "s3")
}
