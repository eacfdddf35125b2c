package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

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
    * row per input row: (key, tieCol as id, x, ewma). */
  def halfLife(df: DataFrame, key: String, orderCol: String, tieCol: String,
               xCol: String): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val prepared = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("o"),
      col(tieCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"), col("id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { iter =>
      var curKey = Long.MinValue
      var state = 0L
      var first = true
      iter.map { case (k, _, id, x) =>
        require(x >= 0L, s"ewmaHalf requires non-negative inputs (got $x)")
        if (first || k != curKey) { curKey = k; state = x; first = false }
        else state = (state + x) / 2
        (k, id, x, state)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong))
      .toDF(key, tieCol, xCol, "ewma")
  }
}
