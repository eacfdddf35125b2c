package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) for vector compression: split each dim-D
  * vector into `m` contiguous subvectors of D/m, quantize each subvector to
  * its nearest entry in a per-subspace codebook of `ksub` centroids, store
  * only the m small codes. At m=4/ksub=16 a 64-dim float vector (256 B)
  * compresses to 4 codes (≤4 B before bit-packing) — the memory lever that
  * makes billion-vector indexes fit in RAM (IVF-PQ is the standard
  * composition: [[Ivf]] cells route the search, PQ codes pay for residency).
  *
  * Scale shape: codebooks are bounded (m·ksub rows — same broadcast license
  * as [[Ivf]] centroids); encoding packs them into ONE broadcast row and
  * runs the native [[NearestCodeL2]] argmin per subspace — zero row
  * multiplication, zero shuffle, the corpus never leaves its partitions.
  * Decoding (reconstruction) is per-row `slice`+`flatten` over the same
  * broadcast row.
  *
  * Codebooks here are FIXED deterministically (the subvectors of the ksub
  * smallest-id corpus vectors) rather than k-means-fitted, for the same
  * reason as q56's fixed IVF centroids: the whole encode→decode→search
  * path becomes oracle-expressible, so the compression path is
  * hash-checked end to end. A fitted variant would reuse [[Ivf.fit]]'s
  * per-subspace mean machinery unchanged.
  */
object Pq {

  /** Per-subspace codebooks: (subspace 0..m-1, code 0..ksub-1,
    * centroid array<double> of length dim/m). Deterministic: code c in
    * every subspace is the corresponding slice of the (c+1)-th smallest-id
    * corpus vector. */
  def codebooks(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    val base = corpus.orderBy(col(idCol)).limit(ksub)
      .select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("code", row_number().over(Window.orderBy(col(idCol))) - 1)
    base.select(col("code"),
        posexplode(array((0 until m).map(s => slice(col("v"), s * sub + 1, sub)): _*)))
      .select(col("pos").as("subspace"), col("code"), col("col").as("centroid"))
  }

  /** The m codebooks packed into ONE row: `__cbflat[s]` is subspace s's
    * ksub centroids concatenated in code order (array_sort on the struct
    * sorts by the leading field — same packing trick as [[Ivf.assign]]).
    * Runs on m·ksub rows once, not per corpus row. */
  private def packed(cb: DataFrame): DataFrame =
    cb.groupBy(col("subspace"))
      .agg(array_sort(collect_list(struct(col("code"), col("centroid")))).as("cs"))
      .select(col("subspace"), flatten(expr("transform(cs, c -> c.centroid)")).as("flat"))
      .agg(array_sort(collect_list(struct(col("subspace"), col("flat")))).as("fs"))
      .select(expr("transform(fs, f -> f.flat)").as("__cbflat"))

  /** Adds `codes: array<int>` (length m) — each vector's per-subspace
    * nearest-codebook-entry indices. One broadcast of the packed codebooks;
    * per row, m native argmin loops over the vector in place. */
  def encode(corpus: DataFrame, cb: DataFrame, m: Int, dim: Int,
             vecCol: String = "embedding"): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    corpus.crossJoin(broadcast(packed(cb)))
      .withColumn("codes", array((0 until m).map(s =>
        NearestCodeL2.nearestCode(col(vecCol).cast("array<double>"),
          element_at(col("__cbflat"), s + 1), s * sub, sub)): _*))
      .drop("__cbflat")
  }

  /** The m codes bit-packed into ONE integer (storage form: 4 codes ×
    * ksub ≤ 16 → 16 bits): `(((c0 << b) | c1) << b) | c2 …` with
    * b = ⌈log2 ksub⌉. Pure bitwise Column fold — stays in codegen; the
    * inverse is [[unpackCodes]]. `m·b ≤ 31` keeps the key a positive int. */
  def packCodes(codes: Column, m: Int, ksub: Int): Column = {
    val b = 32 - Integer.numberOfLeadingZeros(ksub - 1).min(31)
    require(m * b <= 31, s"packed width ${m * b} exceeds a positive int")
    (0 until m).foldLeft(lit(0)) { (acc, s) =>
      shiftleft(acc, b).bitwiseOR(element_at(codes, s + 1)) }
  }

  /** Inverse of [[packCodes]]: one packed int back to `array<int>`. */
  def unpackCodes(packed: Column, m: Int, ksub: Int): Column = {
    val b = 32 - Integer.numberOfLeadingZeros(ksub - 1).min(31)
    // mask is the full b-bit window (1<<b)-1, NOT ksub-1: for non-power-
    // of-two ksub the latter has holes and would corrupt valid codes
    array((0 until m).map(s =>
      shiftrightunsigned(packed, (m - 1 - s) * b).bitwiseAND(lit((1 << b) - 1))): _*)
  }

  /** Adds `outCol: array<double>` — the reconstructed (approximate) vector:
    * the concatenation of each subspace's centroid for the row's code. */
  def decode(encoded: DataFrame, cb: DataFrame, m: Int, dim: Int,
             outCol: String = "approx"): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must be divisible by m $m")
    val sub = dim / m
    encoded.crossJoin(broadcast(packed(cb)))
      .withColumn(outCol, flatten(array((0 until m).map(s =>
        slice(element_at(col("__cbflat"), s + 1),
          col("codes")(s) * sub + 1, lit(sub))): _*)))
      .drop("__cbflat")
  }
}
