package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: a BOUNDED comparison of an unbounded levenshtein —
  * `levenshtein(a, b) <= k` and its variants — is rewritten to the
  * thresholded form `levenshtein(a, b, k) >= 0`, which Spark evaluates
  * with a banded O(n·k) dynamic program and an early exit instead of the
  * full O(n·m) matrix. Semantically exact: the 3-arg form returns the
  * distance when it is ≤ k and -1 otherwise, so `dist <= k` ⟺
  * `lev(a,b,k) >= 0` (nulls propagate identically).
  *
  * Catalyst doesn't do this itself (SPARK- the 3-arg form exists for
  * callers who know it); in fuzzy-linkage joins the predicate dominates
  * runtime, so the rewrite is the difference between the banded and the
  * quadratic DP across every candidate pair. Injected by
  * [[GraftExtensions]] via `injectOptimizerRule`.
  */
object BoundedLevenshteinRule extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 0 => bounded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 0 => bounded(l, r, k)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
        if k >= 1 => bounded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
        if k >= 1 => bounded(l, r, k - 1)
  }
}
