package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sign-matrix random projection (Achlioptas 2001, "Database-friendly
  * random projections": a ±1 matrix satisfies the Johnson–Lindenstrauss
  * lemma with the same distortion bounds as Gaussian entries) — the
  * dimensionality-reduction half of a compressed similarity index:
  * project `inDim`-wide embeddings onto `outDim` ±1 hyperplanes, search
  * in the cheap projected space, and audit recall against the exact
  * full-width ranking.
  *
  * Determinism: the matrix entry (j, i) is the PARITY of the first hex
  * nibble of `md5("seed:j:i")` — reproducible on any engine with an md5,
  * so the DuckDB oracle can rebuild the identical matrix (the query layer
  * inlines it as literals on both sides; no RNG state anywhere, per the
  * repo-wide no-`Math.random` discipline).
  *
  * Scale shape: the matrix is outDim×inDim ±1 literals (16×64 here — a few
  * hundred bytes), baked into the plan itself; the projection is a
  * row-local `array(dot, dot, …)` of [[DotProduct]] native kernels —
  * NO shuffle, NO join, the corpus is scanned once and stays put. At 100 TB
  * the projected column is what lands in the ANN index; the full-width
  * vector never leaves its partition.
  *
  * Numeric contract: each projected component is a left-to-right
  * double fold from 0.0 ([[DotProduct]]'s bit-parity contract), so
  * projected vectors — and every cosine computed from them — are
  * bit-identical across engines.
  */
object RandomProjection {

  /** The deterministic ±1 matrix, row-major: `signs(j)(i)` is hyperplane j,
    * input component i. */
  def signMatrix(outDim: Int, inDim: Int, seed: String): Array[Array[Double]] = {
    require(outDim >= 1 && inDim >= 1)
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(outDim, inDim) { (j, i) =>
      val h = md.digest(s"$seed:$j:$i".getBytes("UTF-8"))
      md.reset()
      // first hex nibble = high nibble of byte 0; even → +1, odd → -1
      if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
    }
  }

  /** Append `outCol` = the `outDim`-wide projection of `vecCol`
    * (array<double>). Row-local; see object scaladoc for the scale and
    * bit-parity contract. */
  def project(df: DataFrame, vecCol: String, outCol: String,
              outDim: Int, inDim: Int, seed: String = "rp"): DataFrame = {
    val m = signMatrix(outDim, inDim, seed)
    val comps = m.map { row =>
      DotProduct.dotNative(col(vecCol), typedLit(row.toSeq))
    }
    df.withColumn(outCol, array(comps.toIndexedSeq: _*))
  }
}
