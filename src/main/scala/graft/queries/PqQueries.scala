package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.{Kmeans, Pq}
import graft.sources.Tables

/** Product-quantization surface over `embeddings` (64-dim): m=4 subspaces
  * of 16 dims, k=4 codebook entries per subspace, 2 Lloyd iterations —
  * small enough that the DuckDB oracle replays EVERY k-means training
  * (four subspace codebooks, plus the 8-centroid full-space coarse
  * quantizer for IVF-PQ) as generated CTE chains — the same
  * fixed-iteration replay technique as q_sim6, parameterized by a CTE
  * suffix — yet large enough that codes, LUTs, candidate pruning and ADC
  * ranking are all non-trivially exercised.
  */
object PqQueries extends graft.QueryPack {

  private val M = 4
  private val SubDim = 16
  private val K = 4
  private val CoarseK = 8
  private val NProbe = 2
  private val TopK = 10

  private val duckEx =
    """ex AS (
      |  SELECT vec_id, unnest(embedding) AS v,
      |         unnest(range(1, len(embedding) + 1)) AS i
      |  FROM embeddings)""".stripMargin

  /** Dimension slice [lo, hi] re-based to local dims 1.., its norms, and
    * the first-`k` seed centroids, all CTEs suffixed `_sfx`. Subspace
    * codebooks use 16-dim slices; the coarse quantizer uses the full
    * vector (lo=1, hi=64). */
  private def base(sfx: String, lo: Int, hi: Int, k: Int): String =
    s"""ex_$sfx AS (SELECT vec_id, v, i - ${lo - 1} AS i
       |  FROM ex WHERE i BETWEEN $lo AND $hi),
       |norms_$sfx AS (SELECT vec_id, sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
       |  FROM ex_$sfx GROUP BY 1),
       |c0_$sfx AS (SELECT vec_id AS centroid_id, CAST(v AS DOUBLE) AS cv, i
       |  FROM ex_$sfx WHERE vec_id < $k)""".stripMargin

  /** One Lloyd iteration over slice `sfx` (mirrors Kmeans.train exactly:
    * 6-dp cosine argmax with ties to the lowest centroid id, per-dim mean
    * rounded to 6 dp and narrowed through FLOAT, empty clusters keep the
    * previous centroid). */
  private def kmIter(sfx: String, n: Int): String = {
    val prev = s"c${n - 1}_$sfx"
    s"""kn${n - 1}_$sfx AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm
       |  FROM $prev GROUP BY 1),
       |s${n}_$sfx AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ex_$sfx e JOIN $prev c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN norms_$sfx nv ON nv.vec_id = d.vec_id
       |  JOIN kn${n - 1}_$sfx nc ON nc.centroid_id = d.centroid_id),
       |a${n}_$sfx AS (SELECT vec_id, centroid_id FROM (
       |  SELECT vec_id, centroid_id, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM s${n}_$sfx) WHERE rn = 1),
       |m${n}_$sfx AS (SELECT a.centroid_id, e.i,
       |    CAST(CAST(ROUND(AVG(CAST(e.v AS DOUBLE)), 6) AS FLOAT) AS DOUBLE) AS cv
       |  FROM a${n}_$sfx a JOIN ex_$sfx e ON e.vec_id = a.vec_id GROUP BY 1, 2),
       |c${n}_$sfx AS (SELECT c.centroid_id, c.i, COALESCE(m.cv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN m${n}_$sfx m
       |    ON m.centroid_id = c.centroid_id AND m.i = c.i)""".stripMargin
  }

  /** Assignment of every vector against trained codebook `c2_sfx`:
    * `codes_sfx` = (vec_id, code, score); `sc_sfx` keeps ALL scores (the
    * probe-ranking input for the coarse quantizer). */
  private def assignAll(sfx: String): String =
    s"""kn2_$sfx AS (SELECT centroid_id, sqrt(SUM(cv * cv)) AS nrm FROM c2_$sfx GROUP BY 1),
       |sc_$sfx AS (
       |  SELECT d.vec_id, d.centroid_id,
       |         ROUND(d.dot / (nv.nrm * nc.nrm), 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ex_$sfx e JOIN c2_$sfx c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN norms_$sfx nv ON nv.vec_id = d.vec_id
       |  JOIN kn2_$sfx nc ON nc.centroid_id = d.centroid_id),
       |codes_$sfx AS (SELECT vec_id, centroid_id AS code, score FROM (
       |  SELECT vec_id, centroid_id, score, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM sc_$sfx) WHERE rn = 1)""".stripMargin

  /** Per-query ADC lookup table for subspace `s`. */
  private def lutSub(s: Int): String =
    s"""lut_$s AS (
       |  SELECT q.vec_id AS query_id, c.centroid_id AS code,
       |         ROUND(SUM(CAST(q.v AS DOUBLE) * c.cv), 6) AS contrib
       |  FROM ex_$s q JOIN c2_$s c ON q.i = c.i
       |  WHERE q.vec_id < 5 GROUP BY 1, 2)""".stripMargin

  private def subChain(s: Int): Seq[String] = subChainAt(s, SubDim, K)

  /** Subspace chain at EXPLICIT geometry — the generators are fully
    * parameter-generic (k and subDim appear only as data/bounds), so the
    * same SQL shape replays the m=4/k=4 toy codebooks and the
    * production-size m=8/k=256 ones. */
  private def subChainAt(s: Int, subDim: Int, k: Int): Seq[String] = {
    val lo = s * subDim + 1
    Seq(base(s.toString, lo, lo + subDim - 1, k), kmIter(s.toString, 1),
      kmIter(s.toString, 2))
  }

  /** All four trained subspace codebooks. */
  private val trained: String =
    (Seq(duckEx) ++ (0 until M).flatMap(subChain)).mkString(",\n")

  private val withCodes: String =
    (Seq(trained) ++ (0 until M).map(s => assignAll(s.toString))).mkString(",\n")

  // ---- production geometry: m=16 × 4 dims, k=256 entries, L2 codes ----
  // 8-bit codes, 16 bytes/vector vs 256 raw. L2 (not cosine) assignment:
  // argmin |x−c|² = argmax (2·dot − |c|²) — see Pq.subScoreL2 for why
  // cosine caps ADC recall (~0.7 here) while L2 reaches 0.8+. Codebooks
  // train on the id-prefix SAMPLE (vec_id < TrainMax) and encode the
  // full corpus — the production shape (PQ trains on ~10⁵ samples, never
  // the corpus). The L2 generators need no vector norms at all.
  private val MProd = 16
  private val TrainMax = 1000

  private def baseL2(sfx: String, lo: Int, hi: Int, k: Int): String =
    s"""ex_$sfx AS (SELECT vec_id, v, i - ${lo - 1} AS i
       |  FROM ex WHERE i BETWEEN $lo AND $hi),
       |ext_$sfx AS (SELECT * FROM ex_$sfx WHERE vec_id < $TrainMax),
       |c0_$sfx AS (SELECT vec_id AS centroid_id, CAST(v AS DOUBLE) AS cv, i
       |  FROM ext_$sfx WHERE vec_id < $k)""".stripMargin

  private def kmIterL2(sfx: String, n: Int): String = {
    val prev = s"c${n - 1}_$sfx"
    s"""kn${n - 1}_$sfx AS (SELECT centroid_id, SUM(cv * cv) AS nrm2
       |  FROM $prev GROUP BY 1),
       |s${n}_$sfx AS (
       |  SELECT d.vec_id, d.centroid_id, ROUND(2 * d.dot - nc.nrm2, 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ext_$sfx e JOIN $prev c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN kn${n - 1}_$sfx nc ON nc.centroid_id = d.centroid_id),
       |a${n}_$sfx AS (SELECT vec_id, centroid_id FROM (
       |  SELECT vec_id, centroid_id, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM s${n}_$sfx) WHERE rn = 1),
       |m${n}_$sfx AS (SELECT a.centroid_id, e.i,
       |    CAST(CAST(ROUND(AVG(CAST(e.v AS DOUBLE)), 6) AS FLOAT) AS DOUBLE) AS cv
       |  FROM a${n}_$sfx a JOIN ext_$sfx e ON e.vec_id = a.vec_id GROUP BY 1, 2),
       |c${n}_$sfx AS (SELECT c.centroid_id, c.i, COALESCE(m.cv, c.cv) AS cv
       |  FROM $prev c LEFT JOIN m${n}_$sfx m
       |    ON m.centroid_id = c.centroid_id AND m.i = c.i)""".stripMargin
  }

  /** L2 assignment of the FULL corpus slice against trained `c2_sfx`. */
  private def assignAllL2(sfx: String): String =
    s"""kn2_$sfx AS (SELECT centroid_id, SUM(cv * cv) AS nrm2 FROM c2_$sfx GROUP BY 1),
       |sc_$sfx AS (
       |  SELECT d.vec_id, d.centroid_id, ROUND(2 * d.dot - nc.nrm2, 6) AS score
       |  FROM (SELECT e.vec_id, c.centroid_id,
       |               SUM(CAST(e.v AS DOUBLE) * c.cv) AS dot
       |        FROM ex_$sfx e JOIN c2_$sfx c ON e.i = c.i GROUP BY 1, 2) d
       |  JOIN kn2_$sfx nc ON nc.centroid_id = d.centroid_id),
       |codes_$sfx AS (SELECT vec_id, centroid_id AS code, score FROM (
       |  SELECT vec_id, centroid_id, score, row_number() OVER (
       |    PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
       |  FROM sc_$sfx) WHERE rn = 1)""".stripMargin

  private def subChainL2(s: Int): Seq[String] = {
    val subDim = 64 / MProd
    val lo = s * subDim + 1
    Seq(baseL2(s.toString, lo, lo + subDim - 1, 256), kmIterL2(s.toString, 1),
      kmIterL2(s.toString, 2))
  }

  private val withCodesProd: String =
    (Seq(duckEx) ++ (0 until MProd).flatMap(subChainL2) ++
      (0 until MProd).map(s => assignAllL2(s.toString))).mkString(",\n")

  /** + the full-space coarse quantizer (k=8) and its corpus assignment. */
  private val withCoarse: String =
    (Seq(withCodes, base("g", 1, M * SubDim, CoarseK), kmIter("g", 1),
      kmIter("g", 2), assignAll("g"))).mkString(",\n")

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

    // ---- PQ6: the map-only encode KERNEL under its own oracle -----------
    // Same oracle arithmetic as q_pq2 minus the score column (the kernel
    // returns codes only — the corpus payload); hash equality against the
    // relational replay is the kernel's bit-parity proof at the driver
    // level, the q_d8/q_d9 map-only-twin discipline.
    Q("q_pq6_encode_maponly",
      (s, d) => Pq.encodeCodes(Tables.embeddings(s, d),
        Pq.trainCodebooks(Tables.embeddings(s, d), M, 64, K, 2), M, 64),
      Some(s"""WITH $withCodes
              |${(0 until M).map(s =>
                 s"SELECT vec_id, CAST($s AS INTEGER) AS sub_id, code FROM codes_$s")
                 .mkString("\nUNION ALL\n")}""".stripMargin)),

    // ---- PQ3: ADC approximate inner-product top-k -----------------------
    Q("q_pq3_adc_topk",
      (s, d) => Pq.adcTopK(Tables.embeddings(s, d),
        Pq.trainCodebooks(Tables.embeddings(s, d), M, 64, K, 2),
        col("vec_id") < 5, M, 64, TopK),
      Some(s"""WITH $withCodes,
              |${(0 until M).map(s =>
                 s"""${lutSub(s)},
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
              |WHERE rnk <= $TopK""".stripMargin)),

    // ---- PQ4: IVF-PQ — coarse-list pruning + ADC scoring (IVFADC) -------
    Q("q_pq4_ivfpq_topk",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        Pq.ivfAdcTopK(e, Kmeans.train(e, CoarseK, 2),
          Pq.trainCodebooks(e, M, 64, K, 2),
          col("vec_id") < 5, NProbe, M, 64, TopK)
      },
      Some(s"""WITH $withCoarse,
              |assign_g AS (SELECT vec_id AS neighbor_id, code AS centroid_id FROM codes_g),
              |probes AS (
              |  SELECT vec_id AS query_id, centroid_id FROM (
              |    SELECT vec_id, centroid_id, row_number() OVER (
              |      PARTITION BY vec_id ORDER BY score DESC, centroid_id) AS rn
              |    FROM sc_g WHERE vec_id < 5) WHERE rn <= $NProbe),
              |cand AS (
              |  SELECT p.query_id, a.neighbor_id
              |  FROM probes p JOIN assign_g a USING (centroid_id)
              |  WHERE a.neighbor_id <> p.query_id),
              |${(0 until M).map(s =>
                 s"""${lutSub(s)},
                    |ctr_$s AS (
                    |  SELECT c.query_id, c.neighbor_id, l.contrib
                    |  FROM cand c
                    |  JOIN codes_$s e ON e.vec_id = c.neighbor_id
                    |  JOIN lut_$s l ON l.query_id = c.query_id AND l.code = e.code)""".stripMargin)
                 .mkString(",\n")},
              |allc AS (${(0 until M).map(s => s"SELECT * FROM ctr_$s")
                 .mkString(" UNION ALL ")}),
              |agg AS (
              |  SELECT query_id, neighbor_id, ROUND(SUM(contrib), 6) AS approx_score
              |  FROM allc GROUP BY 1, 2)
              |SELECT query_id, neighbor_id, approx_score, rnk FROM (
              |  SELECT *, row_number() OVER (
              |    PARTITION BY query_id ORDER BY approx_score DESC, neighbor_id) AS rnk
              |  FROM agg)
              |WHERE rnk <= $TopK""".stripMargin)),

    // ---- PQ5: ADC at PRODUCTION codebook geometry (m=16, k=256, L2) -----
    // The toy q_pq1-q_pq4 oracles pin the arithmetic; this one pins the
    // regime PQ actually deploys at — 8-bit L2 codes from sample-trained
    // codebooks, where recall becomes usable (SimilaritySpec measures
    // >= 0.8 vs brute force). The oracle replays all SIXTEEN k=256
    // codebook trainings plus the full-corpus encode.
    Q("q_pq5_adc_prod",
      (s, d) => {
        val e = Tables.embeddings(s, d)
        val cb = Pq.trainCodebooks(e.filter(col("vec_id") < TrainMax),
          MProd, 64, 256, 2, metric = "l2")
        Pq.adcTopK(e, cb, col("vec_id") < 5, MProd, 64, TopK, metric = "l2")
      },
      Some(s"""WITH $withCodesProd,
              |${(0 until MProd).map(s =>
                 s"""${lutSub(s)},
                    |contrib_$s AS (
                    |  SELECT l.query_id, e.vec_id AS neighbor_id, l.contrib
                    |  FROM codes_$s e JOIN lut_$s l ON l.code = e.code)""".stripMargin)
                 .mkString(",\n")},
              |allc AS (${(0 until MProd).map(s => s"SELECT * FROM contrib_$s")
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
