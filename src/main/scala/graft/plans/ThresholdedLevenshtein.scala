package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

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
  * Fires on the beneficial shapes — `lev <= k`, `lev < k` (as k−1), and
  * their flipped `k >= lev` / `k > lev` forms — with any FOLDABLE
  * integral bound (literal, `2L`, `1 + 1`, a folded parameter): the
  * bound is evaluated at plan time and range-checked. The Levenshtein
  * side may sit under a value-preserving integral up-cast
  * (`Cast(lev, LongType)` — what the analyzer inserts to compare against
  * a BIGINT bound, the common generated-SQL shape); narrowing casts are
  * left alone (they can overflow-throw under ANSI, so removing them
  * would change semantics). An already-thresholded call (threshold =
  * Some) never re-fires, so the rule is idempotent.
  *
  * Registered by [[graft.functions.GraftExtensions]] via
  * `injectOptimizerRule` — the config-only SQL deployment path.
  */
object ThresholdedLevenshtein extends Rule[LogicalPlan] {

  private def banded(l: Expression, r: Expression, k: Long): Expression =
    GreaterThanOrEqual(Levenshtein(l, r, Some(Literal(k.toInt))), Literal(0))

  /** A bare `levenshtein(a, b)` — possibly under integral UP-casts
    * (Int → Long is the analyzer's coercion for a BIGINT bound).
    * IntegerType is included for the no-op `cast(lev as int)` a SQL
    * generator may emit. */
  private object Lev {
    private def widening(t: DataType): Boolean =
      t == IntegerType || t == LongType
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case Levenshtein(l, r, None) => Some((l, r))
      case Cast(Lev(l, r), t, _, _) if widening(t) => Some((l, r))
      case _ => None
    }
  }

  /** A foldable integral bound, folded to its Long value at plan time.
    * Bounded to Int range: the threshold argument is an Int, and a bound
    * ≥ Int.MaxValue can't prune anything a string could reach anyway. */
  private object Bound {
    def unapply(e: Expression): Option[Long] = e.dataType match {
      case ByteType | ShortType | IntegerType | LongType if e.foldable =>
        e.eval() match {
          case null => None
          case v: Number if v.longValue() < Int.MaxValue =>
            Some(v.longValue())
          case _ => None
        }
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Lev(l, r), Bound(k)) if k >= 0 => banded(l, r, k)
      case LessThan(Lev(l, r), Bound(k)) if k >= 1 => banded(l, r, k - 1)
      case GreaterThanOrEqual(Bound(k), Lev(l, r)) if k >= 0 => banded(l, r, k)
      case GreaterThan(Bound(k), Lev(l, r)) if k >= 1 => banded(l, r, k - 1)
    }
}
