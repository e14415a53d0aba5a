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
  * `count_distinct` for HLL `approx_count_distinct` at rsd = 0.02
  * (±2 %, passed explicitly — Spark's default rsd is 0.05), collapsing
  * the Expand: at 100 TB profile breadth is usually worth
  * more than distinct-count exactness.
  *
  * Returns `(column, n_rows, n_null, n_distinct)` — nulls do not count
  * as a distinct value.
  */
object Profile {

  def describe(df: DataFrame, cols: Seq[String],
      exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    require(cols.distinct.size == cols.size,
      s"duplicate columns in profile list: $cols")
    cols.foreach(c => require(df.columns.contains(c),
      s"column '$c' not in ${df.columns.mkString(", ")}"))
    // metric aliases index by POSITION, not by column name: a column
    // named `a.b` would otherwise turn col("__nn_a.b") into a struct
    // field access
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(s"`$c`")).as(s"__nn_$i"),
        (if (exact) countDistinct(col(s"`$c`"))
         else approx_count_distinct(col(s"`$c`"), 0.02)).as(s"__nd_$i"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_null"),
        col(s"__nd_$i").as("n_distinct"))
    }
    one.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
  }
}
