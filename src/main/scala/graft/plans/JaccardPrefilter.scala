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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // Null-preservation relies on size(null)=null (the ANSI/modern
    // default). Under effective legacy semantics (sizeOfNull=true AND
    // ANSI off), size(null)=-1 makes the conjunct false where the
    // original predicate is null — under a NOT that flips "row
    // dropped" to "row kept". Skip the rewrite there.
    if (conf.legacySizeOfNull) plan
    else plan.transform {
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
  }

  /** Fixed-point guard: look for the exact conjunct shape this rule
    * emits — `cast(size(_)) >= lit * cast(size(_))` — rather than any
    * Size node, so a user filter that merely mentions size() still gets
    * the prefilter. */
  private def isOurPrefilter(e: Expression): Boolean = e match {
    case GreaterThanOrEqual(l: Cast, m: Multiply) =>
      l.child.isInstanceOf[Size] &&
        (m.right match {
          case c: Cast => m.left.isInstanceOf[Literal] && c.child.isInstanceOf[Size]
          case _ => false
        })
    case _ => false
  }
  private def alreadyRewritten(cond: Expression): Boolean = cond.exists(isOurPrefilter)
}
