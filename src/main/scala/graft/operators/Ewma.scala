package graft.operators

import org.apache.spark.sql.DataFrame

/** Per-key ordered exponential smoothing in exact integer arithmetic —
  * `s₀ = x₀; sₜ = (sₜ₋₁ + xₜ) div 2` (α = ½ fixed point, integral
  * division) — the deterministic, cross-engine-replayable form of the
  * classic EWMA: every intermediate is a BIGINT, so the whole recurrence
  * hash-matches an oracle replay with no float drift.
  *
  * Scale shape — the sorted-run fold, NOT a groupBy materialization:
  * `repartition(key)` + `sortWithinPartitions(key, order…)` puts each
  * key's timeline contiguously in one partition, and a single
  * `mapPartitions` scan folds the recurrence with O(1) state (reset on
  * key change). No per-key buffer, no collect_list, no window — per-key
  * history length is unbounded and memory stays constant, which is what
  * an ordered recurrence needs at 100 TB (a window can't express a
  * value-RECURSIVE fold; a groupBy-and-sort-in-memory caps the key's
  * history at executor memory).
  *
  * Inputs must be non-negative: integral division truncates toward zero
  * on the JVM but floors in most SQL engines — equal only for
  * non-negative operands, so the contract is enforced, not assumed.
  */
object Ewma {

  /** (key, tieCol, x) sorted by (key, orderMillis, tieCol) → one output
    * row per input row: (key, tieCol as id, x, ewma). Delegates the
    * sorted-run scaffolding to [[KeyedFold]]. */
  def halfLife(df: DataFrame, key: String, orderCol: String, tieCol: String,
               xCol: String): DataFrame = {
    def checked(x: Long): Long = {
      require(x >= 0L, s"ewmaHalf requires non-negative inputs (got $x)")
      x
    }
    KeyedFold.fold(df, key, orderCol, tieCol, xCol, "ewma")(
      init = x => checked(x),
      step = (s, x) => (s + checked(x)) / 2)
  }

  /** Holt double-exponential (trend-adjusted) smoothing, α = β = ½ integer
    * fixed point: `l₀ = x₀, b₀ = 0; lₜ = (lₜ₋₁ + bₜ₋₁ + xₜ) div 2;
    * bₜ = (bₜ₋₁ + lₜ − lₜ₋₁) div 2`. Level AND trend ride [[KeyedFold.fold2]]'s
    * two-long sorted-run state — the recurrence a window can't express and
    * a collect_list can't hold at 100 TB. Unlike [[halfLife]], negatives
    * are LEGAL here (a falling series has negative trend): JVM `/` and
    * DuckDB `//` both truncate toward zero (verified −3/2 = −1 on both),
    * so the oracle replay is exact without a sign restriction.
    * Output: (key, id, x, level, trend). */
  def holt(df: DataFrame, key: String, orderCol: String, tieCol: String,
           xCol: String): DataFrame =
    KeyedFold.fold2(df, key, orderCol, tieCol, xCol, "level", "trend")(
      init = x => (x, 0L),
      step = { case ((l, b), x) =>
        val l1 = (l + b + x) / 2
        (l1, (b + l1 - l) / 2)
      })
}
