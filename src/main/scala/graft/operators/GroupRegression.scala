package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group closed-form simple linear regression (ordinary least
  * squares over one regressor) — the distributed "trend per segment"
  * primitive: slope/intercept of y over x for every group in ONE
  * map-side-combined aggregate pass.
  *
  *   slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *   intercept = (Σy − slope·Σx) / n
  *
  * Exactness contract: x and y are INTEGER columns (quantize floats to
  * fixed-point first, as every cross-engine-exact query here does); the
  * five sufficient statistics accumulate as decimal(38,0) — order-
  * independent, no float sum nondeterminism — and the slope numerator/
  * denominator are EXACT integers. Only the final divide (and the
  * intercept's multiply-subtract-divide chain, evaluated in a fixed
  * order) run in IEEE doubles, so results hash identically on any
  * engine. A group with zero x-variance yields NULL slope/intercept
  * rather than a division artifact.
  *
  * Scale shape: one partial-aggregated groupBy — the same cost as a
  * count(*) per group; no window, no second pass, no driver state.
  * Integer range: |n·Σxy| < 10³⁸ holds through ~10¹² rows of
  * |x|,|y| ≤ 10⁶-scale fixed-point values.
  */
object GroupRegression {

  /** Returns (group, n, slope, intercept); unordered. */
  def fit(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("decimal(38,0)")
    val y = col(yCol).cast("decimal(38,0)")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
        sum(x).as("__sx"), sum(y).as("__sy"),
        sum(x * y).as("__sxy"), sum(x * x).as("__sxx"))
      .withColumn("__num", col("__n") * col("__sxy") - col("__sx") * col("__sy"))
      .withColumn("__den", col("__n") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope",
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise(col("__num").cast("double") / col("__den").cast("double")))
      .withColumn("intercept",
        when(col("__den") === 0, lit(null).cast("double"))
          .otherwise((col("__sy").cast("double") -
            col("slope") * col("__sx").cast("double")) / col("__n").cast("double")))
      .select(col(groupCol), col("__n").cast("long").as("n"),
        col("slope"), col("intercept"))
  }
}
