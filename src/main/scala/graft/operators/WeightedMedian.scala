package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-group WEIGHTED median (lower median: the smallest value
  * whose cumulative weight reaches half the group's total) — the robust
  * center for weighted corpora (docs weighted by tokens, line items by
  * quantity) that plain `percentile` can't give and an approximate
  * sketch shouldn't (release gates want exactness).
  *
  * Scale shape: the cumulative weight comes from
  * [[RunningTotal.grouped]]'s range-partitioned prefix sum over the
  * (group, value, id) order — no `Window.partitionBy(group)` single-task
  * concentration at any group size; group totals are a |groups|-bounded
  * aggregate broadcast back; the median is then one filter
  * (`2·cumw ≥ W`) and a map-side-combined min per group. */
object WeightedMedian {

  /** Returns (group, w_total, median) — unordered. `(valueCol, idCol)`
    * must be unique per row within a group; weights must be positive. */
  def lower(df: DataFrame, groupCol: String, valueCol: String,
            idCol: String, weightCol: String): DataFrame = {
    val base = df.select(col(groupCol), col(valueCol).cast("long").as("__v"),
      col(idCol).cast("long").as("__id"),
      col(weightCol).cast("long").as("__w"))
    val cum = RunningTotal.grouped(base, groupCol, Seq("__v", "__id"),
      "__w", "__cumw")
    val totals = base.groupBy(col(groupCol))
      .agg(sum(col("__w")).as("w_total"))
    cum.join(broadcast(totals), Seq(groupCol))
      .where(col("__cumw") * 2 >= col("w_total"))
      .groupBy(col(groupCol), col("w_total"))
      .agg(min(col("__v")).as("median"))
      .select(col(groupCol), col("w_total"), col("median"))
  }
}
