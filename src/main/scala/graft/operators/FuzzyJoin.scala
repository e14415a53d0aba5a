package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join — entity resolution over identifier
  * strings: find every pair of rows whose key strings are within
  * Levenshtein distance 1 (near-miss ids, typo'd names), without ever
  * comparing all pairs.
  *
  * Candidate generation uses the DELETION NEIGHBORHOOD: two strings at
  * edit distance ≤ 1 necessarily share a member of {s} ∪ {s minus one
  * char} (substitution pairs share the variant with the differing char
  * deleted from both; insert/delete pairs share the shorter string
  * itself). So candidates come from ONE keyed equi-join on the variant
  * string — the same never-all-pairs discipline as the dedup family —
  * and the exact `levenshtein` rescore runs only on candidates. Variant
  * fan-out is O(len) per row: built for short identifier/name columns,
  * not document text (that's [[Dedup]]'s job). Distance ≥ 2 would need
  * depth-2 deletion neighborhoods (O(len²) variants) — out of scope
  * until a consumer needs it.
  */
object FuzzyJoin {

  /** {s} ∪ all single-character deletions of s (deduplicated). */
  def deletionVariants(s: Column): Column =
    array_union(
      transform(sequence(lit(1), length(s)),
        i => concat(s.substr(lit(1), i - 1), s.substr(i + 1, length(s)))),
      array(s))

  private def variantRelation(df: DataFrame, idCol: String, strCol: String,
      idAs: String, strAs: String): DataFrame =
    df.select(col(idCol).as(idAs), col(strCol).as(strAs))
      .select(col(idAs), col(strAs), explode(deletionVariants(col(strAs))).as("v"))

  /** All (a_id, b_id, dist) pairs with dist ≤ 1 and a_id < b_id.
    *
    * Shape note: a true pair is discovered through up to len+1 shared
    * variants, so the raw join output carries ~len× multiplicity — the
    * dedup therefore runs FIRST and NARROW (ids only; strings would
    * multiply the shuffle payload by the name length), then the names
    * come back via a small self-keyed join (broadcast-able: one row per
    * input) and the rescore uses the thresholded levenshtein, which
    * abandons a row as soon as the distance exceeds 1. Measured at
    * sf0.1: 4.2s → narrow form materially cheaper (same result, the
    * q_j12 oracle is unchanged). */
  def selfJoin(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val v = variantRelation(df, idCol, strCol, "sid", "s")
    val names = df.select(col(idCol).as("nid"), col(strCol).as("nname"))
    v.select(col("sid").as("a_id"), col("v"))
      .join(v.select(col("sid").as("b_id"), col("v")), Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .join(names.select(col("nid").as("a_id"), col("nname").as("a_name")), Seq("a_id"))
      .join(names.select(col("nid").as("b_id"), col("nname").as("b_name")), Seq("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name"), 1))
      .filter(col("dist") >= 0)
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** [[selfJoin]] with Jaro-Winkler scoring — blocking + scoring, the
    * standard entity-resolution split: the deletion-1 neighborhood is
    * the BLOCKER (recall bounded to edit-distance-1 pairs, as all
    * blocking bounds recall), and the native codegen'd
    * [[graft.functions.JaroWinkler]] is the SCORER — prefix-weighted
    * similarity a name-matcher thresholds on, where raw edit distance
    * treats all single edits alike. The cut is an exact integer-micro
    * compare on the 6-dp score (the house rounding discipline). Returns
    * `(a_id, b_id, jw)` for pairs scoring ≥ `minSimMicros`/1e6. */
  def selfJoinJaroWinkler(df: DataFrame, idCol: String, strCol: String,
      minSimMicros: Long): DataFrame = {
    require(minSimMicros >= 0 && minSimMicros <= 1000000L,
      s"minSimMicros in [0, 1e6], got $minSimMicros")
    graft.functions.JaroWinkler.register(df.sparkSession)
    val v = variantRelation(df, idCol, strCol, "sid", "s")
    val names = df.select(col(idCol).as("nid"), col(strCol).as("nname"))
    v.select(col("sid").as("a_id"), col("v"))
      .join(v.select(col("sid").as("b_id"), col("v")), Seq("v"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
      .join(names.select(col("nid").as("a_id"), col("nname").as("a_name")),
        Seq("a_id"))
      .join(names.select(col("nid").as("b_id"), col("nname").as("b_name")),
        Seq("b_id"))
      .withColumn("jw", round(expr("jaro_winkler(a_name, b_name)"), 6))
      .filter(round(col("jw") * 1e6).cast("long") >= minSimMicros)
      .select(col("a_id"), col("b_id"), col("jw"))
  }

  /** Two-table variant — resolve each left row against a reference table
    * (dirty feed × canonical dimension): every (left_id, right_id) pair
    * within distance 1, exact matches included. Same candidate shape.
    * `broadcastRight = true` broadcasts the right variant relation —
    * set it when the right side is a dimension small enough to ship
    * (variant fan-out is O(len) rows per name, so a table can exceed
    * the auto-broadcast threshold well before its base size suggests). */
  def join(left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      broadcastRight: Boolean = false): DataFrame = {
    val lv = variantRelation(left, leftId, leftStr, "left_id", "ls")
    val rv0 = variantRelation(right, rightId, rightStr, "right_id", "rs")
    val rv = if (broadcastRight) broadcast(rv0) else rv0
    val rnames0 = right.select(col(rightId).as("right_id"), col(rightStr).as("rs"))
    val rnames = if (broadcastRight) broadcast(rnames0) else rnames0
    lv.select(col("left_id"), col("v"))
      .join(rv.select(col("right_id"), col("v")), Seq("v"))
      .select(col("left_id"), col("right_id")).distinct()
      .join(left.select(col(leftId).as("left_id"), col(leftStr).as("ls")), Seq("left_id"))
      .join(rnames, Seq("right_id"))
      .withColumn("dist", levenshtein(col("ls"), col("rs"), 1))
      .filter(col("dist") >= 0)
      .select(col("left_id"), col("right_id"), col("dist"))
  }
}
