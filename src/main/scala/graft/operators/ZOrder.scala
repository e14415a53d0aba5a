package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout for multi-dimensional file pruning.
  *
  * A table sorted by ONE key prunes row groups only for filters on that
  * key; a 100 TB fact table queried by both `order` and `part` needs
  * locality in BOTH. Interleaving the bits of the two keys' normalized
  * ranks gives a single sort key whose contiguous ranges are small
  * rectangles in (a, b) space — so every output file carries TIGHT
  * parquet min/max statistics on both columns and readers skip files for
  * a filter on either one. This is the layout trick behind lakehouse
  * `OPTIMIZE ZORDER BY`; here it is ~40 lines of column expressions.
  *
  * Normalization maps each key to a 16-bit rank-space linearly from its
  * (min, max), computed in ONE tiny aggregate broadcast back with a
  * 1-row cross join — no window, no sort, no second scan of the data
  * (Spark folds both mins/maxes into a single partial-aggregate pass).
  * Linear rank-space is exact for uniform-ish keys; heavily skewed keys
  * would want quantile-based ranks — out of scope until a consumer
  * needs it.
  */
object ZOrder {

  /** Interleave the low 16 bits of `a16` (even positions) and `b16`
    * (odd positions) into one 32-bit Morton value. Static unrolled fold
    * of shift/and/or — stays inside whole-stage codegen. */
  def interleave16(a16: Column, b16: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, k) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a16, k).bitwiseAND(lit(1L)), 2 * k))
        .bitwiseOR(shiftleft(shiftright(b16, k).bitwiseAND(lit(1L)), 2 * k + 1))
    }

  /** Scale `v` from [mn, mx] to integer [0, 65535] (constant column if
    * the domain is a single point). */
  private def rank16(v: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0L)).otherwise(
      floor((v - mn).cast("double") / (mx - mn).cast("double") * 65535.0)
        .cast("long"))

  private val Z = "_graft_zorder"
  private val B = Seq("_graft_za_min", "_graft_za_max", "_graft_zb_min", "_graft_zb_max")

  /** `df` plus a `_graft_zorder` column over two numeric keys. Fails
    * fast on (implausible) column-name collisions rather than silently
    * replacing user data. */
  def withZOrder(df: DataFrame, colA: String, colB: String): DataFrame = {
    (Z +: B).foreach(c => require(!df.columns.contains(c),
      s"input already has a column named $c"))
    val bounds = df.agg(
      min(col(colA)).cast("long").as(B(0)), max(col(colA)).cast("long").as(B(1)),
      min(col(colB)).cast("long").as(B(2)), max(col(colB)).cast("long").as(B(3)))
    df.crossJoin(broadcast(bounds))
      .withColumn(Z, interleave16(
        rank16(col(colA).cast("long"), col(B(0)), col(B(1))),
        rank16(col(colB).cast("long"), col(B(2)), col(B(3)))))
      .drop(B: _*)
  }

  /** Write parquet range-partitioned + sorted by the Morton key: each
    * file covers a small (colA, colB) rectangle, so min/max stats prune
    * on filters over EITHER column. */
  def zorderedParquet(df: DataFrame, path: String, numFiles: Int,
      colA: String, colB: String): Unit =
    withZOrder(df, colA, colB)
      .repartitionByRange(numFiles, col(Z))
      .sortWithinPartitions(col(Z))
      .drop(Z)
      .write.mode("overwrite").parquet(path)
}
