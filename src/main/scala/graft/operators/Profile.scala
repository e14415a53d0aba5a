package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: one row per profiled column with row count,
  * null count, and distinct count — the completeness/uniqueness metrics
  * a pipeline gates on before publishing a dataset (the deequ-style
  * check surface, rendered as plain aggregates).
  *
  * ONE aggregation job for every column: Spark plans the multi-column
  * distinct set through its Expand-based rewrite (rows multiply by the
  * number of profiled columns map-side, then hash-aggregate — no
  * per-column scan, no driver loop). `exact = false` swaps
  * `count_distinct` for HLL `approx_count_distinct` (±2 % default),
  * collapsing the Expand: at 100 TB profile breadth is usually worth
  * more than distinct-count exactness.
  *
  * Returns `(column, n_rows, n_null, n_distinct)` — nulls do not count
  * as a distinct value.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    cols.foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${df.columns.mkString(", ")}"))
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        (if (exact) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"__nd_$c"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
