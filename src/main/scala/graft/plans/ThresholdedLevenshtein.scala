package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: rewrite naive bounded-edit-distance
  * predicates into Spark's thresholded Levenshtein.
  *
  * `levenshtein(a, b) <= k` computes the FULL O(|a|·|b|) dynamic-program
  * and then throws away everything but one bit; Spark's three-argument
  * form `levenshtein(a, b, k)` runs the O(min(|a|,|b|)·k) diagonal band
  * and returns −1 as soon as the distance provably exceeds k. The two
  * predicates are equivalent row-for-row — `d <= k  ⇔  d' >= 0` where
  * `d'` is the thresholded result (−1 iff d > k), and a NULL input
  * yields NULL on both sides — so the rewrite is safe in any expression
  * context, not just Filter. On an 80-char fuzzy-join verify (q309's
  * shape) the band is ~6× less work per candidate; a SQL user writing
  * the natural predicate gets the banded plan for free.
  *
  * Fires only on the beneficial shapes with a foldable non-negative
  * integer bound: `lev <= k`, `lev < k` (as k−1), and their flipped
  * `k >= lev` / `k > lev` forms. An already-thresholded call (threshold
  * = Some) never re-fires, so the rule is idempotent.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule` — the config-only SQL deployment path.
  */
object ThresholdedLevenshtein extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Int): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k))), Literal(0))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 0 => banded(l, r, k)
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType))
          if k >= 1 => banded(l, r, k - 1)
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 0 => banded(l, r, k)
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None))
          if k >= 1 => banded(l, r, k - 1)
    }
}
