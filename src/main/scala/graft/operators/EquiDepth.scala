package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group equi-depth (equal-frequency) histograms — the profiling
  * summary equi-WIDTH bins can't give on skewed data: every bucket holds
  * the same row count, so bucket boundaries ARE the group's quantile
  * structure (an exact `ntile`, with deterministic (value, id)
  * tie-breaking).
  *
  * Scale shape: the within-group position comes from
  * [[RunningTotal.grouped]]'s range-partitioned prefix sum — the exact
  * rank with NO `Window.partitionBy(group)` single-task concentration at
  * any group size; per-group row counts are a |groups|-bounded aggregate
  * broadcast back; the bucket id is then the row-local
  * `((pos−1)·B) div n` and the histogram one map-side-combined
  * aggregate. Output is |groups|·B rows.
  */
object EquiDepth {

  /** Returns (group, bucket 0..b−1, n_rows, lo, hi) — unordered. `(valueCol,
    * idCol)` must be unique per row within a group (the rank tie-break). */
  def histogram(df: DataFrame, groupCol: String, valueCol: String,
                idCol: String, b: Int): DataFrame = {
    require(b >= 1, s"bucket count must be >= 1 (got $b)")
    val base = df.select(col(groupCol), col(valueCol).cast("long").as("__v"),
        col(idCol).cast("long").as("__id"))
      .withColumn("__one", lit(1L))
    val ranked = RunningTotal.grouped(base, groupCol, Seq("__v", "__id"),
      "__one", "__pos")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__cnt"))
    ranked
      .join(broadcast(counts), Seq(groupCol))
      .withColumn("bucket", expr(s"((__pos - 1) * $b) div __cnt"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("__v")).as("lo"), max(col("__v")).as("hi"))
  }
}
