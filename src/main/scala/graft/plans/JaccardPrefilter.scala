package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType
import graft.functions.JaccardSorted

/** Optimizer rule (SURVEY.md §2 X: `Rule[LogicalPlan]` injection):
  * `jaccard_sorted(a, b) >= τ` implies `|a| >= τ·|b|` and `|b| >= τ·|a|`
  * (the intersection can't exceed either set). Prepending those O(1)
  * length checks lets the common-case non-match skip the O(|a|+|b|)
  * merge walk entirely — on a 100 TB near-dup pass, most candidate
  * pairs fail the threshold, so the cheap conjunct carries the stage.
  * Semantics-preserving: the added conjuncts are implied by the
  * original predicate.
  */
object JaccardPrefilter extends Rule[LogicalPlan] {

  private def sizeOf(e: Expression): Expression = Cast(Size(e), DoubleType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) if !alreadyRewritten(cond) =>
      val newCond = cond.transformUp {
        case geq @ GreaterThanOrEqual(JaccardSorted(a, b), Literal(t: Double, DoubleType))
            if t > 0.0 && t <= 1.0 =>
          val pre = And(
            GreaterThanOrEqual(sizeOf(a), Multiply(Literal(t), sizeOf(b))),
            GreaterThanOrEqual(sizeOf(b), Multiply(Literal(t), sizeOf(a))))
          And(pre, geq)
      }
      if (newCond fastEquals cond) f else Filter(newCond, child)
  }

  /** Fixed-point guard: once a Size node appears next to a JaccardSorted
    * comparison we've been here — don't stack prefilters. */
  private def alreadyRewritten(cond: Expression): Boolean =
    cond.exists(_.isInstanceOf[Size]) && cond.exists(_.isInstanceOf[JaccardSorted])
}
