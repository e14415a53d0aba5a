package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed snapshot diff — the audit primitive of a nightly ETL: given two
  * snapshots of the same table, classify every key as `added` /
  * `removed` / `changed` / `unchanged`. The row-level complement of
  * [[Scd.mergeType2]] (which folds changes INTO a dimension; this op
  * REPORTS them — reconciliation checks, CDC bootstrapping, sink
  * validation).
  *
  * Non-key columns compare via an md5 over their null-safe string forms
  * (unit-separator joined, a distinct sentinel for NULL so `("a", null)`
  * never collides with `("a", "")` or a shifted split) — so the compare
  * cost is one map-side hash per row and the join carries one 32-char
  * hash instead of the full row. Callers hashing floating-point columns
  * should pre-cast them to DECIMAL in the snapshot projection: double →
  * string rendering is engine-specific, exact decimals are not.
  *
  * Keys are assumed unique per snapshot (it is a snapshot, not a log);
  * duplicate keys fan out through the full-outer join exactly as SQL
  * would.
  *
  * Scale shape: one full-outer equi-join on the key columns (AQE
  * broadcasts a small side); everything else is map-side projection. No
  * window, no collect.
  */
object Diff {

  private val sep = "\u001f"      // unit separator
  private val nullMark = "\u001e" // record separator as the NULL sentinel

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshots must share a schema, got ${oldSnap.columns.toSeq} vs " +
        s"${newSnap.columns.toSeq}")
    val cmp = oldSnap.columns.toSeq.filterNot(keyCols.contains)
    require(cmp.nonEmpty, "snapshots have no non-key columns to compare")
    val rowHash = md5(concat_ws(sep,
      cmp.map(c => coalesce(col(c).cast("string"), lit(nullMark))): _*))
    val o = oldSnap.select(keyCols.map(col) :+ rowHash.as("__h_old"): _*)
    val n = newSnap.select(keyCols.map(col) :+ rowHash.as("__h_new"): _*)
    o.join(n, keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("__h_old").isNull, lit("added"))
          .when(col("__h_new").isNull, lit("removed"))
          .when(col("__h_old") === col("__h_new"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"): _*)
  }
}
