package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType}

/** SQL syntax surface for the native as-of join, so the flagship custom
  * operator is reachable from `spark.sql` text, not only the DataFrame
  * API:
  *
  * {{{
  *   SELECT * FROM asof_join(
  *     'clicks', 'errors',        -- left/right table or view names
  *     'user_id', 'err_user',     -- left/right key columns
  *     'ts', 'err_ts'             -- left/right time columns
  *     [, tolerance [, forward]]) -- optional long micros/days, boolean
  * }}}
  *
  * Wired by [[GraftExtensions]] (config
  * `spark.sql.extensions=graft.plans.GraftExtensions`, the standard
  * deployment for Spark extension libraries) in two analyzer-time steps:
  *
  *  1. a table-valued function (`injectTableFunction`) parses the literal
  *     arguments into [[AsOfJoinTvf]], a deliberately-unresolved marker
  *     node holding the two `UnresolvedRelation`s and the column NAMES —
  *     names, not `UnresolvedAttribute`s, so the generic
  *     `ResolveReferences` rule cannot mis-resolve a key against the
  *     wrong side when both sides share a column name;
  *  2. a resolution rule (`injectResolutionRule`) waits until both
  *     children resolve, then binds each column name against its own
  *     side only and rewrites to the real [[AsOfJoinPlan]].
  */
case class AsOfJoinTvf(
    left: LogicalPlan, right: LogicalPlan,
    leftKeyCol: String, rightKeyCol: String,
    leftTimeCol: String, rightTimeCol: String,
    tolerance: Option[Long], forward: Boolean) extends BinaryNode {

  // placeholder until ResolveAsOfJoinTvf rewrites it; an empty output is
  // the UnresolvedRelation convention for not-yet-known schemas
  override def output: Seq[Attribute] = Nil
  override lazy val resolved: Boolean = false

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinTvf =
    copy(left = newLeft, right = newRight)
}

object ResolveAsOfJoinTvf extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case t: AsOfJoinTvf if t.left.resolved && t.right.resolved =>
      def res(p: LogicalPlan, name: String, side: String): Attribute =
        p.output.find(a => conf.resolver(a.name, name)).getOrElse(
          throw new IllegalArgumentException(
            s"asof_join: column $name not found on the $side side " +
              s"(${p.output.map(_.name).mkString(", ")})"))
      // key arguments accept comma-separated lists for composite keys,
      // mirroring AsOfJoin.asofJoinMulti
      def keys(s: String): Seq[String] = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val (lNames, rNames) = (keys(t.leftKeyCol), keys(t.rightKeyCol))
      if (lNames.isEmpty || lNames.length != rNames.length)
        throw new IllegalArgumentException(
          s"asof_join: key lists must be non-empty and equal length, " +
            s"got '${t.leftKeyCol}' vs '${t.rightKeyCol}'")
      val lk = AsOfJoin.compositeKey(lNames.map(res(t.left, _, "left")))
      val rk = AsOfJoin.compositeKey(rNames.map(res(t.right, _, "right")))
      val lt = res(t.left, t.leftTimeCol, "left")
      val rt = res(t.right, t.rightTimeCol, "right")
      require(org.apache.spark.sql.types.DataType.equalsStructurally(
          lk.dataType, rk.dataType, ignoreNullability = true),
        "as-of key columns must share types")
      require(lt.dataType == rt.dataType, "as-of time columns must share a type")
      AsOfJoinPlan(t.left, t.right, lk, rk, lt, rt, t.tolerance, t.forward)
  }
}

object AsOfSql {

  private def str(e: Expression, what: String): String = e match {
    case Literal(s, StringType) if s != null => s.toString
    case other => throw new IllegalArgumentException(
      s"asof_join: $what must be a string literal, got $other")
  }

  /** `Seq[Expression] => LogicalPlan` builder behind the `asof_join` TVF. */
  val builder: Seq[Expression] => LogicalPlan = { args =>
    if (args.length < 6 || args.length > 8)
      throw new IllegalArgumentException(
        "asof_join(leftTable, rightTable, leftKey, rightKey, leftTime, " +
          s"rightTime[, tolerance[, forward]]) — got ${args.length} arguments")
    val tolerance = args.lift(6).map {
      case Literal(v: Long, LongType) => v
      case Literal(v: Int, IntegerType) => v.toLong
      case other => throw new IllegalArgumentException(
        s"asof_join: tolerance must be an integer literal, got $other")
    }
    val forward = args.lift(7).map {
      case Literal(b: Boolean, BooleanType) => b
      case other => throw new IllegalArgumentException(
        s"asof_join: forward must be a boolean literal, got $other")
    }.getOrElse(false)
    def rel(e: Expression, what: String) =
      UnresolvedRelation(str(e, what).split('.').toSeq)
    AsOfJoinTvf(
      rel(args(0), "left table"), rel(args(1), "right table"),
      str(args(2), "left key"), str(args(3), "right key"),
      str(args(4), "left time"), str(args(5), "right time"),
      tolerance, forward)
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("asof_join")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[AsOfJoinTvf].getName, "asof_join")
}
