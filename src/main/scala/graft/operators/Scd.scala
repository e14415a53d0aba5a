package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) construction from a change log —
  * the warehouse-ETL staple: turn `(key, ts, value)` change events into
  * validity intervals `(key, value, valid_from, valid_to, is_current)`
  * where `valid_to` is the next change's timestamp (null = open/current).
  *
  * Change compression comes first: a row whose value equals the key's
  * previous value is no change at all and is dropped (null-safely — a
  * null value is a real state), so intervals always describe actual
  * transitions. Observations pre-reduce to one row per (key, ts) with
  * `max(value)` for deterministic tie handling, mirroring [[Resample]].
  *
  * Shape: everything keys by the dimension key — one shuffle, then two
  * window passes over key-local history (bounded by a key's change
  * count, the natural unit; no corpus-wide sort). This is the batch
  * rebuild; an incremental merge against an existing dimension is the
  * same compression applied to (current open rows ∪ new changes).
  */
object Scd {

  /** Point-in-time (temporal) join: enrich each fact with the dimension
    * state that was valid AT the fact's timestamp — the lookup every
    * SCD2 dimension exists to serve, and the join that makes training
    * data leak-free (features must reflect what was knowable at event
    * time, not the current row). A fact before the key's first interval
    * gets a null state (left semantics); a fact inside an interval gets
    * exactly that interval's value.
    *
    * Shape: the native as-of join ([[graft.plans.AsOfJoin]] — sort-merge
    * on the key, backward scan on time, whole-stage codegen) picks the
    * latest `valid_from <= fact ts` per fact; one map-side guard then
    * null-outs matches whose interval had already CLOSED before the fact
    * (possible only when a key's history has gaps, which [[type2]]'s
    * gapless chaining never produces — but dimensions from other builders
    * may). No interval-range shuffle, no per-fact window. */
  def pointInTime(facts: DataFrame, dim: DataFrame,
      factKeyCol: String, dimKeyCol: String, factTsCol: String,
      valueCol: String): DataFrame = {
    Seq("valid_from", "valid_to", valueCol).foreach(c =>
      require(!facts.columns.contains(c),
        s"facts already carry a '$c' column — rename it before the " +
          "point-in-time join (the dimension's interval columns ride the " +
          "join and are dropped afterwards)"))
    val joined = graft.plans.AsOfJoin.asofJoin(
      facts, dim.select(col(dimKeyCol), col(valueCol),
        col("valid_from"), col("valid_to")),
      factKeyCol, dimKeyCol, factTsCol, "valid_from")
    joined.withColumn(valueCol,
      when(col("valid_to").isNull || col(factTsCol) < col("valid_to"),
        col(valueCol)))
      .drop("valid_from", "valid_to")
  }

  def type2(changes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val uniq = changes.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    // lag over a struct: the struct is null ONLY on a key's first row,
    // so "first row" and "value changed (null-safely)" separate cleanly
    val compressed = uniq
      .withColumn("__pv", lag(struct(col(valueCol).as("v")), 1).over(w))
      .filter(col("__pv").isNull || !(col("__pv.v") <=> col(valueCol)))
      .drop("__pv")
    compressed
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col(valueCol), col("valid_from"),
        col("valid_to"), col("is_current"))
  }

  /** Incremental nightly merge — the production shape: fold a batch of
    * NEW changes into an existing type-2 dimension without replaying the
    * full history. Closed intervals pass through untouched (they can
    * never change again); each key's OPEN row re-enters the builder as a
    * pseudo-change at its own `valid_from`, so compression against the
    * current state works across the batch boundary (a new change equal
    * to the current state folds away, exactly as in a full rebuild) and
    * the open row's original `valid_from` is preserved.
    *
    * Contract: every new change must be strictly newer than its key's
    * open `valid_from` (late-arriving history would silently interleave
    * before the current state — rebuild from the full log instead; the
    * equality `merge(dim, batch) == type2(full log)` is spec-proven for
    * in-contract batches). `strict = true` enforces the contract with a
    * validation join over (open rows ⋈ batch) — both small relative to
    * the closed history — and raises naming the violating key count
    * instead of emitting a corrupt dimension. Only the open rows and
    * the batch shuffle; the closed majority of a years-old dimension
    * never moves. */
  def mergeType2(dim: DataFrame, changes: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, strict: Boolean = false): DataFrame = {
    val closed = dim.filter(!col("is_current"))
      .select(col(keyCol), col(valueCol), col("valid_from"),
        col("valid_to"), col("is_current"))
    if (strict) {
      val lateKeys = changes.alias("c")
        .join(dim.filter(col("is_current")).alias("o"), Seq(keyCol))
        .filter(col(s"c.$tsCol") <= col("o.valid_from"))
        .select(col(keyCol)).distinct().count()
      require(lateKeys == 0L,
        s"mergeType2(strict=true): $lateKeys key(s) have changes at or " +
          s"before their open valid_from — late-arriving history cannot " +
          s"be merged incrementally; rebuild with type2(full log)")
    }
    val openAsChanges = dim.filter(col("is_current"))
      .select(col(keyCol), col("valid_from").as(tsCol), col(valueCol))
    val rebuilt = type2(
      openAsChanges.unionByName(
        changes.select(col(keyCol), col(tsCol), col(valueCol))),
      keyCol, tsCol, valueCol)
    closed.unionByName(rebuilt)
  }
}
