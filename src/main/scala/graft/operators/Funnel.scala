package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis: how far each user progressed through a sequence
  * of event stages (view → click → purchase …) with strictly increasing
  * event times, matched earliest-first (greedy). Greedy earliest-first is
  * equivalent to the stage-by-stage `min(ts) > prev` chaining a SQL engine
  * would run, which is exactly how the oracle checks it.
  *
  * Scale shape: events are filtered to the stage types BEFORE the shuffle,
  * then ONE user-keyed groupBy collects the (ts, stage) pairs and a
  * codegen'd `aggregate` fold walks them in time order — no per-stage
  * self-join over the raw event table (k-1 extra shuffles and k scans at
  * 100 TB), no window pass. Per-user state is bounded by that user's
  * stage-event count; a pathological user is one oversized array, not a
  * skewed join.
  */
object Funnel {

  /** Per-user funnel depth over `stages` (1-based count of completed
    * stages; users with no stage events are absent). Ties in event time do
    * NOT advance the funnel (strictly-increasing times), matching the SQL
    * `ts > prev` convention at microsecond resolution. */
  def depth(events: DataFrame, userCol: String, typeCol: String, tsCol: String,
            stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty && stages == stages.distinct,
      "stages must be non-empty and distinct")
    val idx = stages.zipWithIndex.foldLeft(lit(-1)) { case (acc, (st, i)) =>
      when(col(typeCol) === st, lit(i)).otherwise(acc)
    }
    val ev = events.filter(col(typeCol).isin(stages: _*))
      .select(col(userCol),
        struct(unix_micros(col(tsCol)).as("t"), idx.as("i")).as("e"))
    val zero = struct(lit(0).as("d"), lit(Long.MinValue).as("t"))
    val step = (acc: Column, e: Column) =>
      when(e("i") === acc("d") && e("t") > acc("t"),
        struct((acc("d") + 1).as("d"), e("t").as("t")))
        .otherwise(acc)
    ev.groupBy(col(userCol))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col(userCol),
        aggregate(col("es"), zero, step)("d").cast("long").as("funnel_depth"))
  }
}
