package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: guard `levenshtein(a, b) <= k` with the free necessary
  * condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is at least the length difference, so the guard never
  * changes which rows pass — but it rules out the O(|a|·|b|) DP for every
  * candidate pair whose lengths already decide it, which in a blocked
  * fuzzy join (the J6 ER shape) is most of the block. Null semantics are
  * preserved: if either side is null both the guard and the distance are
  * null, and the AND stays null.
  *
  * The rewrite targets the 2-arg form users naturally write (Spark's
  * 3-arg `levenshtein(a, b, k)` bails out of the DP early but still walks
  * the strings; the guard skips the call entirely). Guards are added as
  * extra conjuncts and detected by semantic equality on re-runs, so the
  * rule is idempotent under the optimizer's fixed-point execution. Applied
  * to both Filter predicates and Join conditions.
  */
class LevenshteinPrefilter extends Rule[LogicalPlan] {

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  private def guardFor(e: Expression): Option[Expression] = e match {
    case LessThanOrEqual(Levenshtein(l, r, None), k) =>
      Some(LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), k))
    case LessThan(Levenshtein(l, r, None), k) =>
      Some(LessThan(Abs(Subtract(Length(l), Length(r))), k))
    case _ => None
  }

  /** Does a conjunct already bound an Abs by the same limit? Matched
    * structurally, not by semantic equality: later fixed-point rounds see
    * the guard AFTER constant folding (`length(lit)` → a number), so an
    * exact comparison would re-add the guard every round. Over-matching an
    * unrelated user `abs(...) <= k` just skips the optimization — never
    * changes results.
    */
  private def hasAbsBound(cs: Seq[Expression], bound: Expression,
                          strict: Boolean): Boolean = cs.exists {
    case LessThanOrEqual(Abs(_, _), b) if !strict => b.semanticEquals(bound)
    case LessThan(Abs(_, _), b) if strict => b.semanticEquals(bound)
    case _ => false
  }

  /** The condition with missing guards prepended; None when unchanged. */
  private def guarded(cond: Expression): Option[Expression] = {
    val cs = conjuncts(cond)
    val missing = cs.flatMap { c =>
      guardFor(c).filterNot { _ =>
        val (bound, strict) = c match {
          case LessThanOrEqual(_, k) => (k, false)
          case LessThan(_, k) => (k, true)
        }
        hasAbsBound(cs, bound, strict)
      }
    }
    if (missing.isEmpty) None else Some((missing ++ cs).reduce(And))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      guarded(cond).map(Filter(_, child)).getOrElse(f)
    case j @ Join(_, _, _, Some(cond), _) =>
      guarded(cond).map(c => j.copy(condition = Some(c))).getOrElse(j)
  }
}
