package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}

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

  /** HOLT–WINTERS additive triple-exponential smoothing, α = β = γ = ½
    * integer fixed point with season length `m` — [[holt]] plus a
    * seasonal component: slot j = (t−1) mod m carries the seasonal
    * state, so the state per key is exactly m + 2 longs no matter how
    * long the series runs (the sorted-run-fold property, extended:
    * still O(1)-per-key memory, still one partition scan). Recurrence
    * for t ≥ 2, with s̄ = s[(t−1) mod m] (last updated m steps ago):
    * `lₜ = (lₜ₋₁ + bₜ₋₁ + (xₜ − s̄)) div 2; bₜ = (bₜ₋₁ + lₜ − lₜ₋₁)
    * div 2; sₜ = (s̄ + (xₜ − lₜ)) div 2`. Init: l = x₁, b = 0, all
    * seasonal slots 0. Signed values legal ([[holt]]'s verified
    * truncating-division parity). Keys are STRINGS here (series are
    * typically named, e.g. per event type); order must be unique per
    * key. Output: (key, orderCol, x, level, trend, seas) where seas is
    * the slot value AFTER this step's update. */
  def holtWinters(df: DataFrame, key: String, orderCol: String,
                  xCol: String, m: Int): DataFrame = {
    require(m >= 1, s"holtWinters needs season length m >= 1 (got $m)")
    val s = df.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val prepared = df.select(col(key).cast("string").as("k"),
      col(orderCol).cast("long").as("o"),
      col(xCol).cast("long").as("x"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"))
      .as[(String, Long, Long)]
    prepared.mapPartitions { iter =>
      var curKey: String = null
      var l = 0L; var b = 0L; var t = 0L
      val seas = new Array[Long](m)
      iter.map { case (k, o, x) =>
        if (curKey == null || k != curKey) {
          curKey = k; l = x; b = 0L; t = 1L
          java.util.Arrays.fill(seas, 0L)
          (k, o, x, l, b, 0L)
        } else {
          t += 1
          val j = ((t - 1) % m).toInt
          val sp = seas(j)
          val l1 = (l + b + (x - sp)) / 2
          val b1 = (b + l1 - l) / 2
          val s1 = (sp + (x - l1)) / 2
          l = l1; b = b1; seas(j) = s1
          (k, o, x, l1, b1, s1)
        }
      }
    } // Tuple6 encoder via the session implicits (Encoders.tuple caps at 5)
      .toDF(key, orderCol, xCol, "level", "trend", "seas")
  }
}
