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

  /** Large×large interval-OVERLAP join (both sides are intervals; closed
    * endpoints: overlap ⇔ aLo ≤ bHi ∧ bLo ≤ aHi) via the same binning:
    * both sides explode into the bins their interval touches and
    * candidates meet in a plain equi-join on the bin id. A pair sharing
    * several bins would duplicate, so the FIRST-COMMON-BIN rule keeps
    * exactly one copy — a pair's first shared bin is
    * `max(floor(aLo/w), floor(bLo/w))`, a MAP-SIDE filter referencing
    * only the joined row: no distinct, no second shuffle, no state.
    *
    * Same tuning rule as [[binnedPointInterval]]: `binWidth` near the
    * typical interval width; the shuffle keys on bin (AQE-splittable)
    * and candidate work is |pairs within a bin|, never |A|×|B|. Column
    * names must be disjoint across the inputs. */
  def binnedIntervalOverlap(a: DataFrame, aLo: String, aHi: String,
      b: DataFrame, bLo: String, bHi: String, binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def spans(df: DataFrame, lo: String, hi: String): DataFrame =
      df.withColumn("graft_bin",
        explode(sequence(floor(col(lo) / binWidth).cast("long"),
          floor(col(hi) / binWidth).cast("long"))))
    spans(a, aLo, aHi).join(spans(b, bLo, bHi), Seq("graft_bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("graft_bin") ===
        greatest(floor(col(aLo) / binWidth), floor(col(bLo) / binWidth))
          .cast("long"))
      .drop("graft_bin")
  }
}
