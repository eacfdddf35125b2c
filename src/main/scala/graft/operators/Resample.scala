package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Regular-grid time-series resampling: bucket each key's observations
  * onto a fixed step (e.g. hourly), then DENSIFY — emit one row per
  * (key, grid tick) across the key's observed span, including empty
  * ticks, so downstream gap-fill ([[Impute]]) and window logic see a
  * complete, regular timeline.
  *
  * Scale shape: the per-bucket aggregation is a map-side-combined
  * groupBy; the span frame is |keys|-bounded (one min/max row per key);
  * the grid explode is a NARROW `sequence` over that bounded frame with
  * fan-out = span/step per key (the caller's step choice bounds it, and
  * `maxTicks` enforces the bound — a key whose span implies more ticks
  * than the budget fails fast instead of exploding a runaway range);
  * the final join is keyed. No global sort, no window, no self-join.
  *
  * Grid arithmetic is integral (epoch-millis longs), so tick boundaries
  * are deterministic and the oracle regenerates the same grid with
  * `range()` — no timestamp-zone semantics in the compared output.
  */
object Resample {

  /** One row per (key, tick) with the per-bucket aggregates, empty ticks
    * null. `aggs` are (outName, aggColumn-over-bucket) pairs evaluated
    * per (key, bucket). Output: key, `tick_ms`, aggs…. */
  def toGrid(df: DataFrame, key: String, tsMillis: Column, stepMs: Long,
             aggs: Seq[(String, Column)], maxTicks: Long = 1000000L): DataFrame = {
    require(stepMs > 0, s"stepMs must be positive (got $stepMs)")
    // floor-to-step in pure Long arithmetic (pmod floors for negatives
    // too, so ticks agree with a SQL engine's floor division exactly)
    val bucketed = df
      .withColumn("tick_ms", tsMillis - pmod(tsMillis, lit(stepMs)))
    val hourly = bucketed.groupBy(col(key), col("tick_ms"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val span = hourly.groupBy(col(key))
      .agg(min(col("tick_ms")).as("t0"), max(col("tick_ms")).as("t1"))
    // in-plan budget guard: no extra job, evaluated per key on the
    // bounded span frame; a runaway span raises instead of exploding
    val nTicks = (col("t1") - col("t0")) / lit(stepMs) + 1
    val lastTick = when(nTicks <= maxTicks, col("t1"))
      .otherwise(raise_error(format_string(
        s"grid would emit %.0f ticks for one key (budget $maxTicks); " +
          "choose a coarser step", nTicks)))
    val grid = span
      .select(col(key),
        explode(sequence(col("t0"), lastTick, lit(stepMs))).as("tick_ms"))
    grid.join(hourly, Seq(key, "tick_ms"), "left")
  }
}
