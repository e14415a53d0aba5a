package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` Spark internals, isolated in a
  * subpackage of `org.apache.spark.sql` (the standard technique for Spark
  * extension libraries that need to wrap a custom [[LogicalPlan]] into a
  * public DataFrame). Everything else in graft stays on public API; only
  * these four entry points live here, so the internal surface area stays
  * a handful of lines wide and easy to audit against Spark upgrades.
  */
object GraftSqlBridge {

  /** Wrap a raw Catalyst expression as a public Column (Spark 4 removed
    * the public `new Column(expr)` path). */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The reverse direction: a Column's underlying Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap an (analyzed-child) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Idempotently add a planner strategy to the session (the runtime
    * equivalent of `spark.sql.extensions` config-time injection). */
  def addStrategy(spark: SparkSession, s: SparkStrategy): Unit = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(s)) {
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ s
    }
  }
}
