package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline) per partition — "shortest documents with
  * the richest vocabulary", "cheapest parts with the highest margin":
  * keep a row iff no other row in its partition is at least as good on
  * both axes and strictly better on one (minimize `minCol`, maximize
  * `maxCol`; exact ties on both axes are mutually non-dominating and all
  * kept).
  *
  * Scale shape: the naive skyline is an O(n²) self-join; for two
  * dimensions it collapses into ONE sort on (partition, minCol) with two
  * running-max RANGE windows — r is dominated exactly when a strictly
  * smaller-minCol row reaches its maxCol (`m1 >= max`) or a ≤-minCol row
  * strictly exceeds it (`m2 > max`). One shuffle, no join, stays in
  * whole-stage codegen; the partition column keeps the sort distributed
  * (a global frontier would single-partition the window — partition by a
  * real key, e.g. source or category).
  *
  * `minCol` must be integral (the strict-predecessor frame is
  * `RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING`).
  */
object Skyline {

  def frontier2d(df: DataFrame, part: String, minCol: String,
                 maxCol: String): DataFrame = {
    val below = Window.partitionBy(col(part)).orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, -1)
    val upTo = Window.partitionBy(col(part)).orderBy(col(minCol))
      .rangeBetween(Window.unboundedPreceding, 0)
    df.withColumn("__below", max(col(maxCol)).over(below))
      .withColumn("__upto", max(col(maxCol)).over(upTo))
      .where((col("__below").isNull || col("__below") < col(maxCol)) &&
        col("__upto") <= col(maxCol))
      .drop("__below", "__upto")
  }
}
