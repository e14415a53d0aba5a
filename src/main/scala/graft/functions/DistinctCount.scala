package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Native kernel: number of DISTINCT strings in an array, one O(n) hash
  * pass per row inside whole-stage codegen.
  *
  * Exists because `size(array_distinct(x))` is an interpreted HOF doing
  * O(n²) string compares per row (measured 4× regression on the sf0.1
  * bench). This kernel is the linear scalar-function spelling for
  * projections and SQL sessions (injected via GraftExtensions);
  * production consumers: [[graft.operators.TextAnalysis.repetitionMetrics]]
  * and [[graft.operators.TextAnalysis.qualityScore]] — both map-only
  * sites, A/B notes at the call sites.
  *
  * Honest scope note (bench-measured): it did NOT earn a place in the
  * dedup hot path — wiring per-doc shingle-set sizes through it forced an
  * extra tokenize+shingle corpus pass and lost to the aggregation that
  * rides the rescore join's already-shuffled exploded relation (same-load
  * A/B at sf0.1: 3.9s → 11.3s for q_d7). Use it where the array is
  * ALREADY materialized in the row; never rebuild an array just to count
  * it.
  *
  * Null elements are skipped (consistent with the exploded-distinct
  * relation, where a null shingle row cannot exist). */
case class DistinctCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"distinct_count requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    DistinctCount.compute(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DistinctCount$$.MODULE$$.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): DistinctCount =
    copy(child = newChild)
}

object DistinctCount {

  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    // UTF8String implements hashCode/equals over the bytes — a plain
    // HashSet gives the O(n) pass
    val seen = new java.util.HashSet[Object](Math.max(8, n * 2))
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) seen.add(arr.getUTF8String(i))
      i += 1
    }
    seen.size()
  }

  /** Register `distinct_count` in the session's function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "distinct_count", exprs => DistinctCount(exprs.head), "internal")
}
