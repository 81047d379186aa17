package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, And, Attribute, AttributeReference, CreateArray, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, Pmod, PredicateHelper, Subtract}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule (Catalyst `Rule[LogicalPlan]` extension, SURVEY.md
  * §7.4 toolkit): rewrite a pure band join — an inner join whose only
  * cross-side condition is `r <= l AND r > l - w` on integral
  * microsecond columns — into the linear binned equi-join of
  * ops/Relational.bandJoin.
  *
  * Without this, Spark plans a band join as BroadcastNestedLoopJoin (or
  * a cartesian product): every left row compared against every right
  * row — O(|L|·|R|), the plan that dies first at 100 TB. The rewrite
  * buckets both sides by the band width (left to its bin, right
  * exploded to bin and bin+1 — a band of width w crosses at most one
  * w-aligned boundary), joins on the bin id, and re-applies the exact
  * band predicate to bin-local candidates: shuffle cost 2|R| + |L|
  * rows, same result, AQE handles hot bins.
  *
  * The user writes the naive declarative form; the optimizer picks the
  * scalable physical strategy — exactly how Catalyst is meant to be
  * extended. Fires only on the guarded shape (both band bounds between
  * the same long-typed attribute pair, no equi conjunct already
  * present), so it can never touch an already-fine join; its own
  * rewrite introduces an equi conjunct, which makes it idempotent.
  */
object RangeJoinBinningRule extends Rule[LogicalPlan] with PredicateHelper {

  /** The (leftTs, rightTs, width) of a band condition `r <= l AND
    * r > l - w`, if the conjunction is exactly that shape. */
  private def bandShape(cond: Expression, left: LogicalPlan,
                        right: LogicalPlan): Option[(Attribute, Attribute, Long)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 2) return None

    def sides(a: Expression, b: Expression): Option[(Attribute, Attribute)] =
      (a, b) match {
        case (l: Attribute, r: Attribute)
            if l.dataType == LongType && r.dataType == LongType &&
              left.outputSet.contains(l) && right.outputSet.contains(r) =>
          Some((l, r))
        case _ => None
      }

    // upper bound: r <= l (either written direction)
    val upper = conjuncts.collectFirst {
      case LessThanOrEqual(r: Attribute, l: Attribute)
          if sides(l, r).isDefined => sides(l, r).get
      case GreaterThanOrEqual(l: Attribute, r: Attribute)
          if sides(l, r).isDefined => sides(l, r).get
    }
    // lower bound: r > l - w (either written direction)
    val lower = conjuncts.collectFirst {
      case GreaterThan(r: Attribute, Subtract(l: Attribute, Literal(w: Long, LongType), _))
          if sides(l, r).isDefined => (sides(l, r).get, w)
      case LessThan(Subtract(l: Attribute, Literal(w: Long, LongType), _), r: Attribute)
          if sides(l, r).isDefined => (sides(l, r).get, w)
    }
    (upper, lower) match {
      case (Some((l1, r1)), Some(((l2, r2), w)))
          if l1.semanticEquals(l2) && r1.semanticEquals(r2) && w > 0 =>
        Some((l1, r1, w))
      case _ => None
    }
  }

  /** floor(ts / w) in exact integer arithmetic (valid for negative ts
    * too: pmod is non-negative, so ts - pmod(ts, w) is the floor
    * multiple). */
  private def bin(ts: Expression, w: Long): Expression =
    IntegralDivide(Subtract(ts, Pmod(ts, Literal(w))), Literal(w))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if bandShape(cond, left, right).isDefined =>
      val (lTs, rTs, w) = bandShape(cond, left, right).get
      val lBinAlias = Alias(bin(lTs, w), "__graft_bin_l")()
      val leftP = Project(left.output :+ lBinAlias, left)
      val rBinAttr = AttributeReference("__graft_bin_r", LongType,
        nullable = false)()
      val rBin = bin(rTs, w)
      val gen = Generate(
        Explode(CreateArray(Seq(rBin, Add(rBin, Literal(1L))))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(rBinAttr), child = right)
      val newCond = And(EqualTo(lBinAlias.toAttribute, rBinAttr), cond)
      Project(j.output, Join(leftP, gen, Inner, Some(newCond), hint))
  }
}

object RangeJoinBinning {
  /** Enable the rewrite on a live session (idempotent); also injected by
    * `graft.GraftExtensions` for config-built sessions. */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinBinningRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinBinningRule
}
