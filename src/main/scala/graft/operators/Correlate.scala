package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass Pearson correlation matrix over integral fixed-point columns
  * — the numeric-profiling primitive of a dataset card: which measures
  * move together, computed for ALL column pairs in a single
  * map-side-combined aggregate over the corpus (the same
  * sufficient-statistics discipline as [[GroupRegression]]).
  *
  * Exactness contract: inputs are INTEGER columns (quantize floats to
  * fixed point first); n, Σx, Σx², Σxy accumulate as decimal(38,0) —
  * order-independent, no float-sum nondeterminism — and the correlation
  * numerator `n·Σxy − Σx·Σy` and variance terms `n·Σx² − (Σx)²` are
  * EXACT integers. r² (and the numerator's sign) are emitted instead of
  * r — no sqrt, so the only floating step is the final exact-int-to-
  * double cast and one divide, IEEE-identical on any engine.
  *
  * Scale shape: ONE aggregate pass (2c + c(c−1)/2 + 1 partial-combined
  * sums for c columns); the reshape to pair rows unions bounded
  * single-row projections — no shuffle after the agg, no second scan.
  * Integer range: |n·Σxy| < 10³⁸ holds through ~10¹² rows of
  * |x| ≤ 10⁶-scale fixed-point values.
  */
object Correlate {

  /** Returns (col_a, col_b, n, sign, r2) for every unordered column pair,
    * with r2 NULL when either side has zero variance. Unordered frame. */
  def matrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least 2 columns (got ${cols.size})")
    require(cols.distinct.size == cols.size, "duplicate column names")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    def dec(c: String) = col(c).cast("decimal(38,0)")
    val aggs =
      cols.flatMap(c => Seq(sum(dec(c)).as(s"__s_$c"),
        sum(dec(c) * dec(c)).as(s"__ss_$c"))) ++
        pairs.map { case (a, b) => sum(dec(a) * dec(b)).as(s"__sp_${a}_$b") }
    // the 1-row stats frame feeds one projection per pair: checkpoint so
    // the corpus aggregate runs ONCE, not once per pair (the q121 lesson)
    val one = df.agg(count(lit(1)).cast("decimal(38,0)").as("__n"),
      aggs: _*).localCheckpoint(true)
    val perPair = pairs.map { case (a, b) =>
      val num = col("__n") * col(s"__sp_${a}_$b") - col(s"__s_$a") * col(s"__s_$b")
      val denA = col("__n") * col(s"__ss_$a") - col(s"__s_$a") * col(s"__s_$a")
      val denB = col("__n") * col(s"__ss_$b") - col(s"__s_$b") * col(s"__s_$b")
      one.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").cast("long").as("n"),
        signum(num.cast("double")).cast("long").as("sign"),
        when(denA === 0 || denB === 0, lit(null).cast("double"))
          .otherwise((num.cast("double") * num.cast("double")) /
            (denA.cast("double") * denB.cast("double"))).as("r2"))
    }
    perPair.reduce(_ unionByName _)
  }
}
