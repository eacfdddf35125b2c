package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar int8 quantization for embedding storage: per-vector symmetric
  * quantization `q_i = floor(v_i * 127 / max|v|)` (floor, not round —
  * floor truncates identically across engines, while round modes differ),
  * carried with the per-vector `scale = max|v| / 127` needed to
  * dequantize. 4× smaller vectors, cosine error bounded by the
  * quantization step; the standard storage/bandwidth lever for
  * billion-vector corpora.
  */
object Quantize {

  /** Per-vector max absolute component. */
  def maxAbs(vec: Column): Column =
    array_max(transform(vec.cast("array<double>"), x => abs(x)))

  /** int8 codes as array<int> given an ALREADY-PROJECTED maxAbs column
    * (an expression captured in the lambda would re-evaluate per element —
    * the O(dim²) HOF trap). Zero vectors quantize to zeros. */
  def quantizeInt8(vec: Column, maxAbsCol: Column): Column =
    transform(vec.cast("array<double>"), x =>
      when(maxAbsCol > 0, floor(x * 127.0 / maxAbsCol).cast("int")).otherwise(lit(0)))

  /** Dequantized (approximate) vector: q_i * scale. */
  def dequantize(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)

  /** Annotate a corpus with quantized codes + scale (maxAbs staged as a
    * projected column first). */
  def withQuantized(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("__m", maxAbs(col(vecCol)))
      .withColumn("qvec", quantizeInt8(col(vecCol), col("__m")))
      .withColumn("qscale", col("__m") / 127.0)
      .drop("__m")
}
