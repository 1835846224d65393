package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, EqualTo, Literal, NamedExpression, SortOrder, SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan, Project, Union, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** AS-OF JOIN as a first-class logical operator (SURVEY.md §7.3's
  * reserved "whole-operator" extension slot, built per the preference
  * order: a custom `LogicalPlan` + `Rule[LogicalPlan]` registered via
  * `SparkSessionExtensions` — no custom physical exec, because the
  * right physical plan already exists: the rewrite lowers to
  * Union → Window(last, ignoreNulls) → Filter, which Tungsten runs as
  * one shuffle + one sort per key. Lowering at the logical level (post-
  * hoc resolution) means the expansion still flows through the whole
  * optimizer: pushdown, pruning and AQE all see ordinary operators.
  *
  * Semantics: for every left row, the right row with the greatest
  * `rightTs` ≤ `leftTs` within the same key (ties on timestamp resolve
  * to "right sorts before left", i.e. an equal-timestamp right row
  * matches).
  *
  * Join columns are carried as NAMES, resolved against the children at
  * lowering time: the analyzer's DeduplicateRelations may re-id either
  * child when the two sides share lineage (self-as-of), and captured
  * Attribute references would go stale — names cannot.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: String,
    leftTs: String,
    rightKey: String,
    rightTs: String,
    payload: String,
    asofPayloadOut: AttributeReference,
    asofTsOut: AttributeReference) extends BinaryNode {

  override def output: Seq[Attribute] = left.output :+ asofPayloadOut :+ asofTsOut

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)

  private def attr(p: LogicalPlan, name: String): Attribute =
    p.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"as-of join: column $name not in ${p.output.map(_.name).mkString(", ")}"))

  /** Lower to built-in operators, preserving this node's output
    * attribute ids (downstream references stay valid).
    */
  def rewrite: LogicalPlan = {
    val (lKey, lTs) = (attr(left, leftKey), attr(left, leftTs))
    val (rKey, rTs, rPayload) =
      (attr(right, rightKey), attr(right, rightTs), attr(right, payload))
    def nullOf(a: Attribute): Literal = Literal.create(null, a.dataType)

    // union layout: __key, __ts, __side (0=right, 1=left), __p, __pts, <left cols>
    val aKey = Alias(lKey, "__key")()
    val aTs = Alias(lTs, "__ts")()
    val aSide = Alias(Literal(1), "__side")()
    val aP = Alias(nullOf(rPayload), "__p")()
    val aPts = Alias(nullOf(rTs), "__pts")()
    val leftProj = Project(
      Seq(aKey, aTs, aSide, aP, aPts) ++ left.output, left)
    val rightProj = Project(
      Seq[NamedExpression](
        Alias(rKey, "__key")(), Alias(rTs, "__ts")(),
        Alias(Literal(0), "__side")(), Alias(rPayload, "__p")(),
        Alias(rTs, "__pts")()) ++
        left.output.map(a => Alias(nullOf(a), a.name)()), right)
    val union = Union(Seq(leftProj, rightProj))

    val keyAttr = aKey.toAttribute
    val spec = WindowSpecDefinition(
      Seq(keyAttr),
      Seq(SortOrder(aTs.toAttribute, Ascending),
        SortOrder(aSide.toAttribute, Ascending)),
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    def lastOver(a: Attribute): WindowExpression =
      WindowExpression(
        AggregateExpression(Last(a, ignoreNulls = true), Complete, isDistinct = false),
        spec)
    val wP = Alias(lastOver(aP.toAttribute), "__asof_p")()
    val wTs = Alias(lastOver(aPts.toAttribute), "__asof_ts")()
    val win = Window(Seq(wP, wTs), Seq(keyAttr),
      Seq(SortOrder(aTs.toAttribute, Ascending),
        SortOrder(aSide.toAttribute, Ascending)), union)

    val onlyLeft = Filter(EqualTo(aSide.toAttribute, Literal(1)), win)
    Project(
      left.output ++ Seq(
        Alias(wP.toAttribute, asofPayloadOut.name)(exprId = asofPayloadOut.exprId),
        Alias(wTs.toAttribute, asofTsOut.name)(exprId = asofTsOut.exprId)),
      onlyLeft)
  }
}

/** Analyzer rule lowering [[AsOfJoinNode]]; injected by
  * [[GraftExtensions]] as a post-hoc resolution rule.
  */
class ResolveAsOfJoin extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case n: AsOfJoinNode => n.rewrite
  }
}

/** User-facing API. */
object AsOf {

  /** left.asofJoin(right): every left row gains `asof_<payload>` and
    * `asof_ts` from the latest right row at-or-before its timestamp
    * with the same key. Requires a session built
    * `.withExtensions(new GraftExtensions)`.
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, leftTs: String,
      rightKey: String, rightTs: String,
      payload: String): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${p.output.map(_.name).mkString(", ")}"))
    val pAttr = attr(rp, payload)
    val tsAttr = attr(rp, rightTs)
    attr(lp, leftKey); attr(lp, leftTs); attr(rp, rightKey) // validate early
    val node = AsOfJoinNode(lp, rp,
      leftKey, leftTs, rightKey, rightTs, payload,
      AttributeReference(s"asof_$payload", pAttr.dataType, nullable = true)(),
      AttributeReference("asof_ts", tsAttr.dataType, nullable = true)())
    GraftPlanBridge.ofRows(left.sparkSession, node)
  }
}
