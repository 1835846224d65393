package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a pure interval join
  * (`b.x BETWEEN a.lo AND a.hi`, no equality conjunct) from the
  * O(|A|·|B|) nested-loop plan Spark would otherwise pick into a binned
  * equi-join — the standard range-join optimization real engines apply.
  *
  * The interval side explodes each row over the fixed-width bins its
  * [lo, hi] covers; the point side computes its single bin; the join
  * becomes a hash/sort-merge EQUI-join on the bin id with the original
  * predicate re-applied. Every qualifying pair meets in exactly one bin
  * (the point's), so no dedup is needed; over-covered bins are removed
  * by the retained original condition. Floor division keeps bin
  * assignment monotone for negative values too.
  *
  * Enabled by `spark.graft.rangeJoin.binSize` > 0 (the bin width in the
  * column's own units — pick ~the typical interval length). The rule
  * leaves every join with an equality conjunct alone, and its own
  * output contains one, so it never re-fires on its result. This is
  * the `injectOptimizerRule` counterpart to the as-of join's post-hoc
  * lowering: the rewritten plan is ordinary operators, so pushdown,
  * AQE, and join selection all proceed normally.
  *
  * (q_range_join performs this rewrite BY HAND inside the query — this
  * rule is the same transformation applied transparently to the naive
  * formulation.)
  */
class RewriteRangeJoin extends Rule[LogicalPlan] {

  private val ConfKey = "spark.graft.rangeJoin.binSize"

  private def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  /** (point, bound, isLower, strict) normalization of one comparison. */
  private def asBound(e: Expression): Option[(Expression, Expression, Boolean)] = e match {
    case GreaterThanOrEqual(x, lo) => Some((x, lo, true))
    case GreaterThan(x, lo)        => Some((x, lo, true))
    case LessThanOrEqual(x, hi)    => Some((x, hi, false))
    case LessThan(x, hi)           => Some((x, hi, false))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val binSize = conf.getConfString(ConfKey, "0").toLong
    if (binSize <= 0) return plan

    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitAnd(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case EqualNullSafe(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
          case _ => false
        }
        if (hasEqui) j
        else {
          val bounds = conjuncts.flatMap(c => asBound(c).map(c -> _))
          val lowers = bounds.collect { case (_, (x, b, true)) => (x, b) }
          val uppers = bounds.collect { case (_, (x, b, false)) => (x, b) }
          val pair = for {
            (xl, lo) <- lowers.headOption
            (xu, hi) <- uppers.find(_._1.semanticEquals(xl))
          } yield (xl, lo, hi)

          pair match {
            case Some((x, lo, hi))
                if integral(x) && integral(lo) && integral(hi) &&
                  bounds.length == conjuncts.length && // ONLY range conjuncts
                  // point on one side, both bounds on the other
                  ((x.references.subsetOf(right.outputSet) &&
                    (lo.references ++ hi.references).subsetOf(left.outputSet)) ||
                   (x.references.subsetOf(left.outputSet) &&
                    (lo.references ++ hi.references).subsetOf(right.outputSet))) =>
              val pointOnRight = x.references.subsetOf(right.outputSet)
              val (intervalSide, pointSide) =
                if (pointOnRight) (left, right) else (right, left)

              def bin(e: Expression): Expression =
                Cast(Floor(Divide(Cast(e, DoubleType),
                  Literal(binSize.toDouble))), LongType)

              val binAttr = AttributeReference("__graft_bin", LongType,
                nullable = false)()
              // Sequence is TimeZoneAwareExpression: without an explicit
              // zone it stays unresolved and fails plan validation
              val seq = new Sequence(bin(lo), bin(hi), Some(Literal(1L)))
                .withTimeZone(conf.sessionLocalTimeZone)
              // inverted interval (lo > hi): the naive join matches
              // nothing, but Sequence with step 1 THROWS — guard with an
              // empty bin list so semantics stay match-nothing
              val safeSeq = If(LessThanOrEqual(bin(lo), bin(hi)), seq,
                Literal.create(Seq.empty[Long],
                  org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)))
              val gen = Generate(
                Explode(safeSeq),
                unrequiredChildIndex = Nil, outer = false, qualifier = None,
                generatorOutput = Seq(binAttr), child = intervalSide)
              val newCond = And(EqualTo(binAttr, bin(x)), cond)
              val newJoin =
                if (pointOnRight) Join(gen, pointSide, Inner, Some(newCond), hint)
                else Join(pointSide, gen, Inner, Some(newCond), hint)
              // restore the original output (drop the bin column, keep
              // attribute order and ids so downstream references hold)
              Project(j.output, newJoin)
            case _ => j
          }
        }
    }
  }
}
