package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators. AQE's skew-join handling covers joins at
  * runtime; for aggregations over pathologically hot keys (a handful of
  * grouping values receiving most rows — exactly the lineitem
  * returnflag/linestatus shape at 100 TB) the classic fix is two-phase
  * salted aggregation: spray each hot key across `saltBuckets` partial
  * groups, aggregate, then aggregate the partials. Works for any
  * algebraic aggregate (sum/count/min/max); results are identical to the
  * direct groupBy because the combine is associative.
  */
object Skew {

  /** Two-phase aggregation. `aggs` is (column, phase1 aggregate, phase2
    * combiner of the partials); each entry reads and writes the same
    * column name (pre-select/rename inputs accordingly).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: Seq[(String, Column => Column, Column => Column)]): DataFrame = {
    val salted = df.withColumn("graft_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val p1 = aggs.map { case (c, f, _) => f(col(c)).as(c) }
    val p2 = aggs.map { case (c, _, g) => g(col(c)).as(c) }
    salted
      .groupBy((keys.map(col) :+ col("graft_salt")): _*)
      .agg(p1.head, p1.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(p2.head, p2.tail: _*)
  }
}
