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

  /** Trainer-ready packed SFT with LOSS-MASK spans — the
    * [[packByCount]] ∘ [[graft.operators.Behavior.sftPairs]]
    * composition that closes the packing story: an SFT trainer that
    * packs examples must still mask the loss to ASSISTANT-RESPONSE
    * tokens only, so each packed sequence needs per-segment token
    * spans. Every (context, response) example packs as ONE unit
    * (`n = |context tokens| + |response tokens|` through
    * [[packByCount]] — same sharding, same hash order, same
    * exclusive-cumsum budget spans), and each pack row carries
    * `segments: array<struct<doc_id, tok_start, tok_end, mask>>` —
    * half-open token spans into the pack's concatenated token stream,
    * in concatenation order: per example the context span
    * (`mask = false`, excluded from the loss) then the response span
    * (`mask = true`); zero-length spans (empty context — a first-turn
    * response — or an empty response) are omitted, a span with no
    * tokens masks nothing. By construction spans tile
    * `[0, n_tokens)` gaplessly and `n_masked` = Σ response tokens.
    *
    * Scale shape: [[packByCount]]'s one shard-keyed shuffle, one
    * id-keyed join of the counts back onto the pack assignment, and
    * one (shard, pack)-partitioned window + aggregation — never a
    * corpus-wide sort; segments-per-pack is bounded by budget (each
    * non-empty example contributes ≥ 1 token). Token counts use
    * [[TextAnalysis.tokens]] (the whitespace convention, oracle-
    * replayable); swap in a real tokenizer's counts upstream by
    * pre-tokenizing context/response. Returns `(shard, pack, n_docs,
    * n_tokens, n_masked, segments)`. */
  def packSftWithMasks(pairs: DataFrame, budget: Int, shards: Int,
      salt: String, idCol: String = "doc_id",
      contextCol: String = "context", responseCol: String = "response")
      : DataFrame = {
    val counts = pairs.select(col(idCol),
      size(TextAnalysis.tokens(col(contextCol))).cast("long").as("__nc"),
      size(TextAnalysis.tokens(col(responseCol))).cast("long").as("__nr"))
    val packed = packByCount(
      counts.select(col(idCol), (col("__nc") + col("__nr")).as("n_tokens")),
      budget, shards, salt, idCol)
    // intra-pack offsets: the SAME deterministic order packByCount used
    // (salted hash, id tiebreak), exclusive running sum within the pack
    val wo = Window.partitionBy(col("shard"), col("pack"))
      .orderBy(Sampling.saltedKey(col(idCol), salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val spans = packed.join(counts, Seq(idCol))
      .withColumn("__start", coalesce(sum(col("n_tokens")).over(wo), lit(0L)))
      .select(col(idCol), col("shard"), col("pack"), col("n_tokens"),
        col("__nc"), col("__nr"), col("__start"))
    // one row per example with its (≤ 2) non-empty spans — no explode,
    // so zero-token examples still count into n_docs with no segment
    val perDoc = spans.select(col("shard"), col("pack"), col("n_tokens"),
        col("__nr"),
        filter(array(
          struct(col("__start").as("tok_start"),
            (col("__start") + col("__nc")).as("tok_end"),
            col(idCol).as("doc_id"), lit(false).as("mask")),
          struct((col("__start") + col("__nc")).as("tok_start"),
            (col("__start") + col("n_tokens")).as("tok_end"),
            col(idCol).as("doc_id"), lit(true).as("mask"))),
          s => s.getField("tok_end") > s.getField("tok_start")).as("sgs"))
    perDoc.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("__nr")).as("n_masked"),
        transform(array_sort(flatten(collect_list(col("sgs")))), s =>
          struct(s.getField("doc_id").as("doc_id"),
            s.getField("tok_start").as("tok_start"),
            s.getField("tok_end").as("tok_end"),
            s.getField("mask").as("mask"))).as("segments"))
  }

  /** Pack-fill audit — the observability twin of the padded regime's
    * padding audit ([[lengthBucketBatches]]), for the CONCATENATION
    * regime: [[packByCount]]'s bounded-overflow contract means a pack
    * totals `budget ≤ total < budget + max-doc` (except each shard's
    * underfull tail pack), and a trainer that hard-truncates at the
    * budget loses exactly the overflow tokens — so `overflow_tokens`
    * IS the truncation-loss estimate, and `fill_ppm` (half-up ppm of
    * total/budget, honestly > 1e6 in the overflow regime) is the
    * capacity number. One hash aggregation over the pack assignment.
    * Returns `(shard, pack, n_docs, n_tokens, fill_ppm,
    * overflow_tokens)`. */
  def packFill(packed: DataFrame, budget: Int): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    packed.groupBy(col("shard"), col("pack"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .withColumn("fill_ppm",
        expr(s"(2 * n_tokens * 1000000 + $budget) div (2 * $budget)"))
      .withColumn("overflow_tokens",
        greatest(lit(0L), col("n_tokens") - budget))
  }

  /** Length-bucketed batch planning — the PADDED-batch counterpart to
    * [[packByCount]]'s concatenation layout (HF `group_by_length` /
    * fairseq length-sorted batching): models that cannot concatenate
    * (reward models, encoders, judge inference) pad every sequence in
    * a batch to the batch max, so batching similar lengths together is
    * THE padding-waste lever. Buckets are power-of-2 length classes
    * (bucket = binary digit count of the token count — exact integer
    * cross-engine, no float log2 at the boundary), which bounds
    * in-batch length spread below 2× and therefore padding waste below
    * 50% BY CONSTRUCTION for non-empty sequences (max < 2·min inside a
    * bucket; zero-token rows share bucket 1 with 1-token rows and are
    * the one place a mixed batch can touch exactly 50%); within
    * (shard, bucket) the deterministic salted-hash order (the
    * [[packByCount]] contract: stable under re-runs and
    * repartitioning) chops into fixed `batchSize` batches. Per row the
    * batch's audit stats ride along: `padding_ppm` = half-up ppm of
    * wasted pad tokens over the batch's padded volume — the number a
    * capacity planner actually bills (an all-empty batch pads nothing:
    * max 0 defines padding 0).
    *
    * Scale shape: ONE shuffle keyed by (shard, bucket); both windows
    * share that partitioning (the second adds the batch key — no
    * second exchange), shards bound each partition's rows exactly as
    * in [[packByCount]]. Returns `(<idCol>, shard, bucket, batch,
    * n_tokens, batch_docs, batch_max, padding_ppm)`. */
  def lengthBucketBatches(docs: DataFrame, batchSize: Int, shards: Int,
      salt: String, idCol: String = "doc_id",
      countCol: String = "n_tokens"): DataFrame = {
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    require(shards > 0, s"shard count must be positive, got $shards")
    val base = docs.select(col(idCol),
        Sampling.saltedKey(col(idCol), salt).as("hk"),
        col(countCol).cast("long").as("n_tokens"))
      .withColumn("shard", Sampling.bucketOfKey(col("hk"), shards))
      .withColumn("bucket", length(conv(col("n_tokens"), 10, 2)).cast("long"))
    val w = Window.partitionBy(col("shard"), col("bucket"))
      .orderBy(col("hk"), col(idCol))
    val asg = base.withColumn("__rn", row_number().over(w))
      .withColumn("batch", expr(s"(__rn - 1) div $batchSize"))
    val wb = Window.partitionBy(col("shard"), col("bucket"), col("batch"))
    asg
      .withColumn("batch_docs", count(lit(1)).over(wb))
      .withColumn("batch_max", max(col("n_tokens")).over(wb))
      .withColumn("__bsum", sum(col("n_tokens")).over(wb))
      .withColumn("padding_ppm", when(col("batch_max") > 0, expr(
        "(2 * (batch_max * batch_docs - __bsum) * 1000000 " +
          "+ batch_max * batch_docs) div (2 * batch_max * batch_docs)"))
        .otherwise(lit(0L)))
      .select(col(idCol), col("shard"), col("bucket"), col("batch"),
        col("n_tokens"), col("batch_docs"), col("batch_max"),
        col("padding_ppm"))
  }
}
