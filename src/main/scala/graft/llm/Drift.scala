package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring between two corpus snapshots — the audit a
  * recurring ingestion pipeline runs before a new crawl batch is admitted
  * into the training mix (did the source/language composition shift?).
  *
  * Both statistics are RATIONAL in the cell counts, so the whole comparison
  * runs in fixed-point integers and hash-matches any engine:
  *   - total-variation distance  TVD = ½ Σ |p_ref − p_cur|
  *   - chi-square distance      χ²d = ½ Σ (p_ref − p_cur)² / (p_ref + p_cur)
  * (no logarithms — libm transcendentals are not correctly-rounded, see
  * TextAnalysis's IDF note; TVD and χ²-distance carry the same signal as
  * PSI/JS for threshold alerting without the float hazard).
  *
  * Scale shape: one map-side-combined aggregate per snapshot (output is
  * bounded by the feature's domain — sources, languages), one equi-join of
  * the two bounded histograms, one bounded rollup for the summary. The
  * corpus rows shuffle ONLY as pre-aggregated (value, count) cells; a 100 TB
  * snapshot contributes as many cells as it has distinct feature values.
  */
object Drift {

  private val Fp = 1000000L

  /** Per-value drift detail between two snapshots over `keyCol`.
    * Output: (value, n_ref, n_cur, p_ref_fp, p_cur_fp, delta_fp) sorted by
    * value; p_*_fp = count·10⁶ div total (0 for an empty snapshot), delta_fp
    * = |p_ref_fp − p_cur_fp|. Values absent on one side count 0 there. */
  def histogramDrift(ref: DataFrame, cur: DataFrame, keyCol: String): DataFrame = {
    def hist(df: DataFrame, n: String) =
      graft.io.Tables.widen(df)
        .groupBy(col(keyCol).cast("string").as("value"))
        .agg(count(lit(1)).as(n))
    val h = hist(ref, "n_ref").join(hist(cur, "n_cur"), Seq("value"), "full_outer")
      .select(col("value"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    // snapshot totals: one bounded agg over the (already tiny) histogram,
    // carried as a literal-free cross of a 1-row frame (no collect)
    val totals = h.agg(sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"))
    // `div` (integer division), not `/` (which widens to double on longs)
    h.crossJoin(broadcast(totals))
      .select(col("value"), col("n_ref"), col("n_cur"),
        when(col("__tr") > 0, expr(s"(n_ref * ${Fp}L) div __tr"))
          .otherwise(lit(0L)).cast("long").as("p_ref_fp"),
        when(col("__tc") > 0, expr(s"(n_cur * ${Fp}L) div __tc"))
          .otherwise(lit(0L)).cast("long").as("p_cur_fp"))
      .withColumn("delta_fp", abs(col("p_ref_fp") - col("p_cur_fp")))
  }

  /** One-row drift summary over a [[histogramDrift]] detail frame:
    * (n_values, tvd_fp, chi2_fp). tvd_fp = Σ delta_fp div 2;
    * chi2_fp = Σ delta_fp²·10⁶ div (2·(p_ref_fp + p_cur_fp)) — the χ²
    * distance ×10⁶, every term a bounded long (delta ≤ 10⁶ ⇒ the
    * numerator ≤ 10¹⁸ < 2⁶³). */
  def summary(detail: DataFrame): DataFrame =
    detail
      .select(col("delta_fp"),
        when(col("p_ref_fp") + col("p_cur_fp") > 0,
          expr(s"(delta_fp * delta_fp * ${Fp}L) div (2L * (p_ref_fp + p_cur_fp))"))
          .otherwise(lit(0L)).as("__chi"))
      .agg(
        count(lit(1)).as("n_values"),
        expr("sum(delta_fp) div 2L").cast("long").as("tvd_fp"),
        sum(col("__chi")).cast("long").as("chi2_fp"))

  /** Per-tick drift scoreboard: TVD of each ingestion tick's composition
    * against a reference histogram. `tickHist` is (tick, value, n) —
    * typically maintained INCREMENTALLY by a streaming aggregation —
    * and `ref` is (value, n_ref), the bounded reference composition.
    *
    * Values present in `ref` but absent from a tick count 0 there (the
    * grid is ticks × reference values); values outside the reference
    * domain are ignored — a reference must cover its domain by
    * construction. Output: (tick, tvd_fp) — everything bounded: the grid
    * is |ticks|·|values| rows, the corpus itself never appears. */
  def perTickDrift(tickHist: DataFrame, ref: DataFrame): DataFrame = {
    // Reference `tickHist` exactly ONCE: a streaming memory-sink view
    // cannot be self-joined (conflicting-attribute resolution fails), and
    // single-reference is the cheaper plan anyway. Per-tick totals come
    // from a window over the bounded histogram, and the contribution of
    // reference values ABSENT from a tick (|0 − pr| = pr) is recovered by
    // the identity Σ_absent pr = PRTOT − Σ_present pr.
    val refTot = ref.agg(sum(col("n_ref")).as("__tr"))
    val refFp = ref.crossJoin(broadcast(refTot))
      .select(col("value"), expr(s"(n_ref * ${Fp}L) div __tr").as("__pr"))
    val prTot = refFp.agg(sum(col("__pr")).as("__prtot"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("tick"))
    tickHist
      .withColumn("__tot", sum(col("n")).over(w))
      .join(broadcast(refFp), Seq("value"), "left")
      .select(col("tick"), col("__pr"),
        expr(s"(n * ${Fp}L) div __tot").as("__p"))
      .groupBy(col("tick"))
      .agg(sum(when(col("__pr").isNotNull, abs(col("__p") - col("__pr")))
          .otherwise(lit(0L))).as("__dsum"),
        sum(coalesce(col("__pr"), lit(0L))).as("__prsum"))
      .crossJoin(broadcast(prTot))
      .select(col("tick"),
        expr("(__dsum + __prtot - __prsum) div 2L").cast("long").as("tvd_fp"))
  }
}
