package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Missing-value imputation for keyed time series — the gap-fill
  * primitive of sensor/event pipelines: carry the last observed value
  * forward (LOCF) and/or the next observed value backward within each
  * key's timeline.
  *
  * Scale shape: two frame-bounded window passes partitioned on the key —
  * the sort distributes across keys, state per row is one running value,
  * and nothing leaves whole-stage codegen (`last`/`first` with
  * ignoreNulls are codegen'd window functions). No join, no self-union;
  * at 100 TB the only cost is the one (key, order) sort shuffle both
  * directions share.
  *
  * Ordering must be made total by the caller (pass a tie-breaking column
  * after the timestamp) or fills at duplicate timestamps are
  * nondeterministic.
  */
object Impute {

  /** Adds `<valueCol>_ffill` (last non-null at or before the row) and
    * `<valueCol>_bfill` (first non-null at or after the row). Rows before
    * the first / after the last observation stay null in the respective
    * direction. */
  def fill(df: DataFrame, key: String, order: Seq[Column],
           valueCol: String): DataFrame = {
    val back = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    df.withColumn(s"${valueCol}_ffill",
        last(col(valueCol), ignoreNulls = true).over(back))
      .withColumn(s"${valueCol}_bfill",
        first(col(valueCol), ignoreNulls = true).over(fwd))
  }
}
