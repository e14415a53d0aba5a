package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Descending, Expression, GenericInternalRow, JoinedRow,
  SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.expressions.RowOrdering
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.graftbridge.GraftSqlBridge
import org.apache.spark.sql.SparkSessionExtensions

/** Native as-of join: for each left row, attach the latest right row with
  * the same key whose time is <= the left row's time (left-outer: the
  * right side is null when no prior row exists).
  *
  * This is the whole-operator extension tier — custom `LogicalPlan` +
  * `SparkStrategy` + `SparkPlan` — for a semantics Spark's relational
  * operators can't express as one operator (the composed alternative,
  * union + carry-forward window in `q_j5_asof_join`, only works when both
  * sides share one schema; a window over a non-equi join explodes
  * candidates first).
  *
  * Scale shape: `requiredChildDistribution` hash-clusters both sides by
  * key and `requiredChildOrdering` sorts by (key, time), so Catalyst's
  * EnsureRequirements inserts exactly one co-partitioning exchange + sort
  * per side — the sort-merge-join shape — and the merge itself is a
  * single forward pass per partition holding ONE buffered right row.
  * O(1) state, no per-row probe, no candidate explosion; on 1000
  * executors each partition merges independently.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(lk, rk, lt, rt, tol, fwd, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    tolerance: Option[Long],
    forward: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched rows"))

  // hash-cluster both children by key: EnsureRequirements co-partitions
  // them (re-using an existing partitioning when one side already hashes
  // by the key) and inserts the per-partition sorts below
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) ::
      ClusteredDistribution(rightKey :: Nil) :: Nil

  // forward mode scans time DESCENDING: as the left frontier moves to
  // smaller times, the eligible (rt >= lt) right set only grows — the
  // same monotone two-pointer merge, mirrored
  private def timeDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, timeDir)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, timeDir))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val numRightCols = right.output.size
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExpr = leftKey
    val rKeyExpr = rightKey
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val outputAttrs = output
    val tol = tolerance
    val fwd = forward
    // tolerance needs time DIFFERENCES, not just ordering — restrict it to
    // the long/int-backed time types (timestamp = micros, date = days)
    tol.foreach { _ =>
      require(timeIsLongBacked(timeType),
        s"as-of tolerance requires a long/int-backed time type, got $timeType")
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated classes are not serializable: build orderings on the
      // executor (the codegen cache dedups the source per JVM)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(keyType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val timeAsLong: InternalRow => Long = timeType match {
        case org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.DateType => r => r.getInt(0).toLong
        case _ => r => r.getLong(0)
      }
      val lKeyProj = UnsafeProjection.create(Seq(lKeyExpr), leftOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rKeyProj = UnsafeProjection.create(Seq(rKeyExpr), rightOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val resultProj = UnsafeProjection.create(outputAttrs, outputAttrs)
      // null keys/times never match and (sorting nulls-first) never block
      // the merge pointer, so drop null-keyed right rows up front
      val rBuf = rIter.filter { r =>
        !rKeyProj(r).isNullAt(0) && !rTimeProj(r).isNullAt(0)
      }.buffered
      val nullRight = new GenericInternalRow(numRightCols)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // the single piece of merge state: last right row at or before the
        // current merge frontier, plus the key and time it belongs to
        private var lastKey: UnsafeRow = _
        private var lastRight: InternalRow = _
        private var lastTime: Long = Long.MinValue

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyProj(l)
          if (lk.isNullAt(0)) { numOutputRows += 1; return resultProj(joined(l, nullRight)) }
          val lt = lTimeProj(l)
          if (lt.isNullAt(0)) { numOutputRows += 1; return resultProj(joined(l, nullRight)) }
          var scan = true
          while (scan && rBuf.hasNext) {
            val r = rBuf.head
            val c = keyOrd.compare(rKeyProj(r), lk)
            if (c < 0) {
              rBuf.next() // stale key: its carry-forward state is obsolete
            } else if (c == 0 && {
              val tc = timeOrd.compare(rTimeProj(r), lt)
              if (fwd) tc >= 0 else tc <= 0 // eligible side of the frontier
            }) {
              lastKey = rKeyProj(r).copy()
              lastRight = r.copy()
              if (tol.isDefined) lastTime = timeAsLong(rTimeProj(r))
              rBuf.next()
            } else {
              scan = false // right frontier is ahead of this left row
            }
          }
          val matched = lastRight != null && keyOrd.compare(lastKey, lk) == 0 &&
            tol.forall { t =>
              val gap = if (fwd) lastTime - timeAsLong(lt)
                else timeAsLong(lt) - lastTime
              gap <= t
            }
          numOutputRows += 1
          if (matched) numMatchedRows += 1
          resultProj(joined(l, if (matched) lastRight else nullRight))
        }
      }
    }
  }

  private def timeIsLongBacked(t: org.apache.spark.sql.types.DataType): Boolean =
    t match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.TimestampType | org.apache.spark.sql.types.DateType |
           org.apache.spark.sql.types.TimestampNTZType => true
      case _ => false
    }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Config-time injection: `spark.sql.extensions=graft.plans.GraftExtensions`
  * wires the whole custom surface — the as-of planner strategy plus the
  * native expressions — into every session of the application. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL text surface for the as-of join: TVF parse + side-aware resolve
    e.injectTableFunction((AsOfSql.identifier, AsOfSql.info, AsOfSql.builder))
    e.injectResolutionRule(_ => ResolveAsOfJoinTvf)
    e.injectFunction((FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[graft.functions.FloatVecDot].getName, "vec_dot"),
      exprs => graft.functions.FloatVecDot(exprs.head, exprs(1))))
    e.injectFunction((FunctionIdentifier("hex_hamming"),
      new ExpressionInfo(classOf[graft.functions.HexHamming].getName, "hex_hamming"),
      exprs => graft.functions.HexHamming(exprs.head, exprs(1))))
  }
}

object AsOfJoin {

  /** DataFrame-level entry point. Resolves the named columns against each
    * side, registers the planner strategy (idempotent), and wraps the
    * logical node. Column names may repeat across sides — output
    * attributes stay distinct by expression id.
    *
    * `tolerance` bounds the lookback (or lookahead): a right row only
    * matches when |leftTime - rightTime| <= tolerance on the matching
    * side, in the time column's own units (micros for timestamps, days
    * for dates). None = unbounded. `forward = true` flips the direction:
    * the match is the NEAREST right row at-or-after the left time
    * (pandas merge_asof direction='forward'). */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKeyCol: String, rightKeyCol: String,
      leftTimeCol: String, rightTimeCol: String,
      tolerance: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    GraftSqlBridge.addStrategy(spark, AsOfJoinStrategy)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def resolve(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    require(resolve(lPlan, leftKeyCol).dataType == resolve(rPlan, rightKeyCol).dataType,
      "as-of key columns must share a type")
    require(resolve(lPlan, leftTimeCol).dataType == resolve(rPlan, rightTimeCol).dataType,
      "as-of time columns must share a type")
    GraftSqlBridge.ofRows(spark, AsOfJoinPlan(lPlan, rPlan,
      resolve(lPlan, leftKeyCol), resolve(rPlan, rightKeyCol),
      resolve(lPlan, leftTimeCol), resolve(rPlan, rightTimeCol),
      tolerance, forward))
  }
}
