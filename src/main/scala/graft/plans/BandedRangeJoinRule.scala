package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure inequality band join
  * `A JOIN B ON abs(a - b) <= tol` (a from A, b from B, both LONG) into the
  * banded equi-join `TemporalJoins.bandedRangeJoin` builds by hand —
  * automatically, for any user who writes the raw predicate in SQL or the
  * DataFrame API.
  *
  * Without an equi conjunct Catalyst can only plan such a join as a
  * broadcast-nested-loop — every left row scans every right row. The
  * rewrite replicates the RIGHT side into its 3 adjacent tol-width bands
  * (a Generate/explode), attaches floor(a/tol) to the left, joins on band
  * equality, and keeps the original predicate as the exact post-filter —
  * a shuffled hash join whose per-key fan-out is bounded by band
  * population, the difference between O(n·m) and O(matches) at scale.
  *
  * Scope guards: inner joins whose condition's conjuncts contain exactly
  * one such abs-band predicate and NO equi conjunct (if one exists the
  * join is already hash-plannable and the rewrite only adds work — and the
  * band equality we add makes the rule its own fixpoint). Registered via
  * GraftExtensions.injectOptimizerRule, or per-session through
  * `spark.experimental.extraOptimizations`.
  */
object BandedRangeJoinRule extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  private def longLit(e: Expression): Option[Long] = e match {
    case Literal(v: Long, LongType) => Some(v)
    case Literal(v: Int, _)         => Some(v.toLong)
    case Cast(inner, LongType, _, _) => longLit(inner)
    case _ => None
  }

  /** (leftExpr, rightExpr, tol) when `c` is abs(x - y) <= tol with x
    * bound entirely to `left` and y to `right` (either order). */
  private def bandPredicate(c: Expression, left: LogicalPlan,
                            right: LogicalPlan): Option[(Expression, Expression, Long)] =
    c match {
      case LessThanOrEqual(Abs(Subtract(x, y, _), _), lit) =>
        longLit(lit).flatMap { tol =>
          if (tol <= 0 || x.dataType != LongType || y.dataType != LongType) None
          else if (x.references.subsetOf(left.outputSet) &&
                   y.references.subsetOf(right.outputSet)) Some((x, y, tol))
          else if (y.references.subsetOf(left.outputSet) &&
                   x.references.subsetOf(right.outputSet)) Some((y, x, tol))
          else None
        }
      case _ => None
    }

  private def isEqui(c: Expression, left: LogicalPlan, right: LogicalPlan): Boolean = {
    def crossSides(l: Expression, r: Expression): Boolean =
      (l.references.subsetOf(left.outputSet) && r.references.subsetOf(right.outputSet)) ||
        (r.references.subsetOf(left.outputSet) && l.references.subsetOf(right.outputSet))
    c match {
      // <=> is hash-plannable too (ExtractEquiJoinKeys) — skip those joins
      case EqualTo(l, r)       => crossSides(l, r)
      case EqualNullSafe(l, r) => crossSides(l, r)
      case _                   => false
    }
  }

  /** floor(e / tol) in EXACT long arithmetic: (e - pmod(e, tol)) / tol.
    * A double-division floor would mis-band longs past 2^53 (nanosecond
    * epochs are ~1.7e18) and silently DROP matching pairs. */
  private def floorBand(e: Expression, tol: Long): Expression = {
    val t = Literal(tol)
    new IntegralDivide(Subtract(e, Pmod(e, t)), t)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved && {
          val cs = conjuncts(cond)
          cs.exists(c => bandPredicate(c, left, right).isDefined) &&
            !cs.exists(c => isEqui(c, left, right))
        } =>
      val cs = conjuncts(cond)
      val (a, b, tol) =
        cs.flatMap(c => bandPredicate(c, left, right)).head
      // left: band = floor(a / tol), projected alongside the full output
      val lBand = Alias(floorBand(a, tol), "__graft_lband")()
      val newLeft = Project(left.output :+ lBand, left)
      // right: explode the 3 adjacent bands
      val rBase = floorBand(b, tol)
      val bandAttr = AttributeReference("__graft_rband", LongType)()
      val gen = Explode(CreateArray(Seq(
        Subtract(rBase, Literal(1L)), rBase, Add(rBase, Literal(1L)))))
      val newRight = Generate(gen, unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bandAttr), child = right)
      val newCond = And(EqualTo(lBand.toAttribute, bandAttr), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
