package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy

/** Minimal bridge into `private[sql]` Spark internals, isolated in a
  * subpackage of `org.apache.spark.sql` (the standard technique for Spark
  * extension libraries that need to wrap a custom [[LogicalPlan]] into a
  * public DataFrame). Everything else in graft stays on public API; only
  * these two entry points live here, so the internal surface area is two
  * lines wide and easy to audit against Spark upgrades.
  */
object GraftSqlBridge {

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
