package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-key one-sided CUSUM drift detector in exact integer arithmetic —
  * `s₀ = max(0, x₀ − k); sₜ = max(0, sₜ₋₁ + xₜ − k)` (Page's cumulative
  * sum against reference level `k`), with an alarm when the statistic
  * exceeds threshold `h`. The standard streaming change-point primitive
  * for data-quality monitoring: a sustained upward shift in the input
  * accumulates; in-control noise resets to zero.
  *
  * Scale shape: delegates to [[KeyedFold]] — one keyed sort shuffle and
  * a single constant-memory partition scan; per-key history is unbounded.
  * All-integer, so the oracle replays each prefix with `list_reduce`
  * seeded by a prepended 0 (which makes the reduce compute
  * `max(0, ·)` from the first element onward), hash-exact.
  */
object Cusum {

  /** Adds `cusum` (the running statistic) and `alarm` (`cusum > h`). */
  def drift(df: DataFrame, key: String, orderCol: String, tieCol: String,
            xCol: String, k: Long, h: Long): DataFrame = {
    require(h >= 0, s"threshold h must be >= 0 (got $h)")
    KeyedFold.fold(df, key, orderCol, tieCol, xCol, "cusum")(
      init = x => math.max(0L, x - k),
      step = (s, x) => math.max(0L, s + x - k))
      .withColumn("alarm", col("cusum") > h)
  }
}
