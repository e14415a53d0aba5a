package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar quantization (SQ8) for embedding columns — the simplest and
  * most widely deployed vector-compression scheme (FAISS
  * `ScalarQuantizer`, Lucene/Elasticsearch `int8_hnsw`, pgvector
  * `halfvec`/int8): each dimension gets an independent affine grid
  * `[mn_i, mx_i]` split into 256 steps, and a d-float vector becomes d
  * uint8 codes — 4× smaller than float32 with near-lossless recall at
  * ANN workloads. The memory-side companion to [[Pq]]: PQ compresses
  * harder (sub-byte per dimension) but needs trained codebooks; SQ8
  * trains from two scalars per dimension and decodes with one
  * multiply-add, which is why it is the default compression tier in
  * production vector stores.
  *
  * Search is ASYMMETRIC (the standard ADC discipline): queries keep
  * their exact float vectors; only corpus vectors are quantized. The
  * score is the cosine of the query against the DEQUANTIZED corpus
  * vector `mn_i + code_i · rng_i / 255` — deterministic arithmetic both
  * engines replay bit-for-bit (per-element IEEE ops in fixed order; the
  * 6-dp rounding + id tie-break contract of the whole similarity
  * stack).
  *
  * Scale shape: training is ONE hash aggregation over (corpus × dim)
  * exploded rows with map-side combine, producing a dim-sized relation
  * (the only shuffle anywhere in this file); the params then inline as
  * literal arrays via a bounded driver read (the [[Similarity.lshBuckets]]
  * discipline — dim ≤ 4096 enforced), making encode and dequantize
  * MAP-ONLY projections; top-k scoring is the [[Similarity.bruteForceTopK]]
  * broadcast shape with the bounded [[Similarity.perQueryTopK]] buffer —
  * at most k pairs per query per map task ever shuffle. Swap the scan
  * for an [[Similarity.ivfTopKWith]] candidate list at corpus scale;
  * the encode/dequantize stages are retrieval-agnostic.
  */
object Sq {

  /** Per-dimension quantization grid from the corpus itself:
    * `(i: int 0-based, mn: double, mx: double)` — one hash aggregation
    * over the exploded (vector × dimension) relation; null embeddings
    * contribute no rows. Persist this dim-sized frame as the store for
    * nightly encode-only runs. */
  def sqTrain(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    emb.select(posexplode(col(vecCol)).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))

  /** Bounded driver read of a [[sqTrain]] params frame → dense
    * `(mn, rng)` arrays indexed by dimension. Fail-fast, never a
    * corpus-sized collect: the relation is dims-sized by construction. */
  private[graft] def collectParams(params: DataFrame,
      maxDims: Int = 4096): (Array[Double], Array[Double]) = {
    val rows = params.select(col("i"), col("mn"), col("mx")).collect()
    require(rows.nonEmpty,
      "sq: params are empty — the corpus has no non-null embeddings")
    require(rows.length <= maxDims,
      s"sq: ${rows.length} dimensions exceed the $maxDims literal-inline " +
        "cap — quantize per-block or raise maxDims deliberately")
    val dims = rows.map(_.getInt(0))
    require(dims.min == 0 && dims.max == rows.length - 1,
      s"sq: dimension indices must be dense 0..${rows.length - 1}")
    val mn = new Array[Double](rows.length)
    val rng = new Array[Double](rows.length)
    rows.foreach { r =>
      mn(r.getInt(0)) = r.getDouble(1)
      rng(r.getInt(0)) = r.getDouble(2) - r.getDouble(1)
    }
    (mn, rng)
  }

  /** Map-only SQ8 encode against driver-held params:
    * `code_i = clamp(round((v_i − mn_i) · 255 / rng_i), 0, 255)`
    * (a constant dimension — `rng_i = 0` — codes to 0). Returns
    * `(vec_id, codes: array<int>)`; a null embedding stays null. */
  def sqEncodeWith(emb: DataFrame, mn: Array[Double], rng: Array[Double],
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(mn.length == rng.length, "sq: mn/rng length mismatch")
    val mnL = array(mn.map(lit): _*)
    val rngL = array(rng.map(lit): _*)
    emb.select(col(idCol).as("vec_id"),
      transform(col(vecCol), (x, i) =>
        when(element_at(rngL, i + 1) === 0.0, lit(0))
          .otherwise(least(lit(255), greatest(lit(0),
            round((x.cast("double") - element_at(mnL, i + 1)) * 255 /
              element_at(rngL, i + 1)).cast("int"))))).as("codes"))
  }

  /** Train + encode in one call (two corpus passes — min/max grids need
    * their own pass by construction). */
  def sqEncode(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val (mn, rng) = collectParams(sqTrain(emb, idCol, vecCol))
    sqEncodeWith(emb, mn, rng, idCol, vecCol)
  }

  /** Map-only dequantize: `dv_i = mn_i + code_i · rng_i / 255` (exactly
    * mn_i for constant dimensions since their code is 0). */
  private def dequant(codes: Column, mnL: Column, rngL: Column): Column =
    transform(codes, (c, i) =>
      element_at(mnL, i + 1) +
        c.cast("double") * element_at(rngL, i + 1) / lit(255.0))

  /** Shared asymmetric scoring core: dequantize a codes relation
    * map-side, broadcast the (small by construction) query set, rank
    * through the bounded top-k buffer. Self-pairs (a query id also
    * present in the corpus) are excluded — the brute-force contract. */
  private def topKAgainstCodes(codes: DataFrame, mn: Array[Double],
      rng: Array[Double], queries: DataFrame, k: Int,
      qIdCol: String, qVecCol: String): DataFrame = {
    val mnL = array(mn.map(lit): _*)
    val rngL = array(rng.map(lit): _*)
    val deq = Par.spread(codes)
      .select(col("vec_id"), dequant(col("codes"), mnL, rngL).as("dv"))
      .withColumn("nn", Similarity.norm(col("dv")))
    val q = queries
      .select(col(qIdCol).as("query_id"), col(qVecCol).as("qv"),
        Similarity.norm(col(qVecCol)).as("qn"))
    val scored = deq.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(Similarity.dot(col("qv"), col("dv")) / (col("qn") * col("nn")), 6)
          .as("score"))
    Similarity.perQueryTopK(scored, k)
  }

  /** Asymmetric top-k over the quantized corpus: exact float queries
    * against dequantized SQ8 corpus vectors, cosine rounded to 6 dp,
    * ties to the lowest neighbor id, self excluded — the
    * [[Similarity.bruteForceTopK]] contract with the corpus side 4×
    * smaller. Scoring uses the interpreted HOF dot (the dequantized
    * side is double — outside [[graft.functions.FloatVecDot]]'s
    * float-only kernel); at corpus scale feed IVF candidates instead of
    * the full scan and the per-pair cost disappears into the pruning. */
  def sqTopK(emb: DataFrame, queryPred: Column, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (mn, rng) = collectParams(sqTrain(emb, idCol, vecCol))
    topKAgainstCodes(sqEncodeWith(emb, mn, rng, idCol, vecCol), mn, rng,
      emb.filter(queryPred), k, idCol, vecCol)
  }

  /** Persist the SQ8 index — the dims-sized `params` grid and the
    * uint8 `codes` relation — so nightly query batches
    * ([[sqTopKFromIndex]]) never touch the float corpus again: the
    * [[graft.operators.TextAnalysis.writeBm25Index]] discipline applied
    * to vector search. Codes are 4× narrower than the float vectors —
    * at 100 TB the store IS the point: the full-precision embeddings
    * can live in cold storage while every search reads the quantized
    * relation. */
  def writeSqIndex(emb: DataFrame, dir: String, idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val params = sqTrain(emb, idCol, vecCol)
    params.write.mode("overwrite").parquet(s"$dir/params")
    val (mn, rng) = collectParams(params)
    sqEncodeWith(emb, mn, rng, idCol, vecCol)
      .write.mode("overwrite").parquet(s"$dir/codes")
  }

  /** [[sqTopK]] against a PERSISTED index ([[writeSqIndex]] output):
    * the params grid and integer codes persist losslessly, so scores
    * are byte-identical to the in-job path — the registered query
    * shares q_sim13's oracle verbatim; output equality is the proof.
    * Only the stores and the caller's query vectors enter the plan. */
  def sqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, dir: String,
      queries: DataFrame, k: Int, qIdCol: String = "vec_id",
      qVecCol: String = "embedding"): DataFrame = {
    val (mn, rng) = collectParams(spark.read.parquet(s"$dir/params"))
    topKAgainstCodes(spark.read.parquet(s"$dir/codes"), mn, rng,
      queries, k, qIdCol, qVecCol)
  }
}
