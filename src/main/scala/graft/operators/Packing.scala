package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign every
  * document to a fixed token-budget pack, so a trainer can concatenate
  * each pack into one max-sequence-length example instead of padding one
  * document per sequence (the standard pretraining input shape).
  *
  * Deterministic relational rendering: documents are sharded by
  * md5(salt|id) (stable under re-runs and repartitioning), ordered
  * within their shard by the same hash, and packed by EXCLUSIVE
  * cumulative token count — a document belongs to the budget span where
  * its first token lands (`floor(cum_before / budget)`), and spans
  * renumber densely into pack ids (a document longer than the budget
  * consumes several spans; dense_rank closes those gaps so consumers
  * can enumerate packs 0..max). A document straddling a boundary stays
  * in the pack it started, so a pack's total is < budget +
  * max-document-tokens: bounded overflow, never
  * underfill (the greedy no-overflow variant leaves holes instead and
  * needs a sequential scan that has no distributed rendering —
  * trainers that cannot tolerate overflow truncate the final document
  * of each pack at load time, which this layout makes a local
  * operation).
  *
  * Scale shape: sharding is map-only; the one shuffle keys by shard,
  * and each shard sorts independently — the shard count is the
  * parallelism knob (size shards so one shard's documents fit a task,
  * e.g. corpus_docs / 100k). A global ORDER BY over the corpus is the
  * wrong plan at 100 TB and never happens here: two packs only ever
  * share a shard, and shard boundaries ARE pack boundaries (the
  * cumulative sum restarts per shard).
  *
  * Token counts use [[TextAnalysis.tokens]] (whitespace split, empties
  * filtered) so the numbers agree with the rest of the text stack and
  * replay in DuckDB. Returns `(<idCol>, shard, pack, n_tokens)`.
  */
object Packing {

  def packSequences(docs: DataFrame, budget: Int, shards: Int, salt: String,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packByCount(docs.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).as("n_tokens")),
      budget, shards, salt, idCol)

  /** [[packSequences]] over a PRECOMPUTED token-count column — the shape
    * a real pipeline uses once counts come from an actual tokenizer
    * (e.g. [[TextAnalysis.bpeTokenize]]'s `n_bpe`) rather than the
    * whitespace proxy. Same sharding/ordering/budget semantics; the
    * count column is taken as-is. */
  def packByCount(docs: DataFrame, budget: Int, shards: Int, salt: String,
      idCol: String = "doc_id", countCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    require(shards > 0, s"shard count must be positive, got $shards")
    // ONE salted key per row; the shard derives from it via the shared
    // Sampling.bucketOfKey instead of recomputing the md5
    val base = docs.select(col(idCol),
        Sampling.saltedKey(col(idCol), salt).as("hk"),
        col(countCol).as("n_tokens"))
      .withColumn("shard", Sampling.bucketOfKey(col("hk"), shards))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("hk"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // span = which budget-multiple the doc STARTS in; a doc longer than
    // the budget consumes several spans, so spans can skip — dense_rank
    // renumbers them into gapless pack ids (same shard partitioning, the
    // rank rides the window stage)
    val wr = Window.partitionBy(col("shard")).orderBy(col("span"))
    base.withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("span", floor((col("cum") - col("n_tokens")) / budget))
      .select(col(idCol), col("shard"),
        (dense_rank().over(wr) - 1).cast("int").as("pack"),
        col("n_tokens"))
  }
}
