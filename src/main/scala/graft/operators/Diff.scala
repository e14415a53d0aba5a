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
  * Non-key columns compare via an md5 over the concatenation of each
  * column's OWN md5 (with a non-hex sentinel for NULL): every component
  * is either exactly 32 hex chars or the literal `null`, which contains
  * no hex digit — so the token stream parses unambiguously and no
  * arrangement of values (separators embedded in data, null vs empty
  * string, shifted splits) can make two different rows concatenate
  * equal. The compare cost is one map-side hash chain per row and the
  * join carries one 32-char hash instead of the full row. Callers
  * hashing floating-point columns should pre-cast them to DECIMAL in
  * the snapshot projection: double → string rendering is
  * engine-specific, exact decimals are not.
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

  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshots must share a schema, got ${oldSnap.columns.toSeq} vs " +
        s"${newSnap.columns.toSeq}")
    val cmp = oldSnap.columns.toSeq.filterNot(keyCols.contains)
    require(cmp.nonEmpty, "snapshots have no non-key columns to compare")
    // "null" contains no hex digit, md5 output is exactly 32 hex chars:
    // the concatenation parses unambiguously, so distinct value tuples
    // can never hash-collide by construction (only by md5 itself)
    val rowHash = md5(concat(
      cmp.map(c => coalesce(md5(col(c).cast("string")), lit("null"))): _*))
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
