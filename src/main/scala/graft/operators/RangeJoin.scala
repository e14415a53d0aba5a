package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range-join shapes. The tiny-dimension case (a handful of bands) is
  * best served by Catalyst's BroadcastNestedLoopJoin (`q_j4_range_join`);
  * this object covers the case both sides are LARGE, where a nested loop
  * — broadcast or not — is quadratic and a 100 TB non-starter.
  */
object RangeJoin {

  /** Large×large point-in-interval join via binning: every point maps to
    * one bin of width `binWidth`, every interval explodes into the bins
    * it overlaps, and candidates meet in a plain equi-join on the bin id
    * with the exact `lo <= v < hi` predicate as a residual filter.
    *
    * The shuffle is keyed by bin — distributed, AQE-skew-splittable —
    * and candidate work is |pairs within binWidth|, not |L|×|R|. Pick
    * `binWidth` near the typical interval width: much wider inflates
    * candidates per bin, much narrower inflates the interval explosion
    * (an interval spans width/binWidth + 1 bins).
    *
    * Column names must be disjoint across the two inputs (the exact
    * predicate references both sides after the join).
    */
  def binnedPointInterval(points: DataFrame, vCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("graft_bin",
      floor(col(vCol) / binWidth).cast("long"))
    // inclusive upper bin: when hi lands exactly on a bin edge this adds
    // one candidate bin whose residual filter rejects everything — cheap,
    // and it sidesteps open-boundary floating-point edge cases
    val i = intervals.withColumn("graft_bin",
      explode(sequence(floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    p.join(i, Seq("graft_bin"))
      .filter(col(vCol) >= col(loCol) && col(vCol) < col(hiCol))
      .drop("graft_bin")
  }
}
