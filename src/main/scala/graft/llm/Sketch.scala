package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Streaming-friendly sketches for corpus statistics at 100 TB: Count-Min
  * (heavy-hitter counts) and HyperLogLog (distinct counts). Both are built
  * by a typed `Aggregator` whose buffer is a small fixed array, so Spark
  * applies partial aggregation (one sketch per partition, merged on the
  * driver side of a single-row shuffle) — one pass over the data, constant
  * state, no groupBy on the raw key domain.
  *
  * Cross-engine determinism: both sketches hash with the md5-hex trick used
  * throughout `graft.llm` ([[Sampling.hashBucket]]) — the first 8 hex chars
  * of `md5(...)` parsed as an unsigned 32-bit value. Both the bucket
  * assignment and the estimate arithmetic are exactly re-computable in
  * ANSI SQL (DuckDB oracle), so the estimates themselves are hash-checked,
  * not just "close enough".
  *
  * Reference ground: the reference's summary stats (`airflow.py:101-107`)
  * are exact global counts; these sketches are the scale path for the same
  * questions (how many distinct X, what are the top X) when the key domain
  * no longer fits an exact groupBy.
  */
object Sketch {

  // ------------------------------------------------------------- shared hash

  /** First 8 hex chars of md5(prefix + key-as-string) as an unsigned 32-bit
    * value in a BIGINT column. DuckDB equivalent:
    * `('0x' || substr(md5(<prefix> || CAST(k AS VARCHAR)), 1, 8))::BIGINT`. */
  def hash32(key: Column, prefix: String = ""): Column =
    conv(substring(md5(concat(lit(prefix), key.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Same hash on the JVM side (Aggregator path) — byte-for-byte identical
    * to [[hash32]]: the first 4 digest bytes big-endian ARE the first 8 hex
    * chars. */
  private[llm] def hash32Jvm(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    var h = 0L
    var i = 0
    while (i < 4) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  // ------------------------------------------------------------ Count-Min

  /** Row `i`'s bucket for `key` in a width-`w` Count-Min sketch (Column
    * form — identical to the Aggregator's placement). */
  def cmsBucket(i: Int, key: Column, width: Int): Column =
    hash32(key, s"$i|") % width

  /** Count-Min estimate for `key` read from a built sketch: the minimum of
    * the d bucket counters the key hashes to. The sketch is shipped as ONE
    * array literal (d·w longs), so the lookup is a per-row codegen'd
    * `element_at` — no join against a counts table. Guaranteed
    * overestimate: est ≥ true count, with excess ≤ 2n/w at 1−(1/2)^d
    * confidence (Cormode & Muthukrishnan, J.Alg 2005). */
  def cmsEstimate(sketch: Array[Long], depth: Int, width: Int, key: Column): Column = {
    require(sketch.length == depth * width,
      s"sketch length ${sketch.length} != depth $depth * width $width")
    val flat = lit(sketch)
    val reads = (0 until depth).map { i =>
      element_at(flat, (lit(i * width) + cmsBucket(i, key, width) + lit(1)).cast("int"))
    }
    if (reads.size == 1) reads.head else least(reads: _*)
  }
}

/** Count-Min sketch builder: `Aggregator[String, Array[Long], Array[Long]]`.
  * Buffer is the flattened d×w counter matrix; reduce bumps one counter per
  * hash row, merge is elementwise sum (counters are order-independent, so
  * the sketch is exactly reproducible under any partitioning). */
class CmsAgg(depth: Int, width: Int)
  extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], key: String): Array[Long] = {
    var i = 0
    while (i < depth) {
      val b = (Sketch.hash32Jvm(s"$i|$key") % width).toInt
      buf(i * width + b) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

/** HyperLogLog distinct-count sketch (Flajolet et al., AofA 2007) with
  * m = 2^p registers. Hash is 32-bit ([[Sketch.hash32]]); register index is
  * the low p bits (`h % m`), the remaining `32-p` bits drive
  * rho = 1 + leading-zero-count — computed via the binary-string form
  * (`lpad(bin(w), 32-p, '0')` → position of first '1') so the SQL oracle is
  * bit-identical. Register merge is elementwise max: order-independent,
  * partition-safe, unions of sketches are free.
  */
object Hll {
  /** Raw-estimate numerator alpha_m · m² · 2^(32-p+1... ) — see
    * [[estimate]]; precomputed once so the Spark literal and the SQL
    * literal are the SAME double. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1.0 + 1.079 / m)
  }

  /** Register width in bits for the rho computation: 32 - log2(m). */
  def rhoBits(m: Int): Int = 32 - Integer.numberOfTrailingZeros(m)

  /** Column-form register contribution of one key: (register j, rho).
    * groupBy(j).agg(max(rho)) over these gives the register table — the
    * SQL-oracle-checkable twin of [[HllAgg]]. */
  def jCol(key: Column, m: Int): Column = Sketch.hash32(key) % m
  def rhoCol(key: Column, m: Int): Column = {
    val bits = rhoBits(m)
    val w = shiftright(Sketch.hash32(key), Integer.numberOfTrailingZeros(m))
    val pos = instr(lpad(bin(w), bits, "0"), "1")
    when(pos === 0, bits + 1).otherwise(pos)
  }

  /** Exact-integer register sum: S = Σ_j 2^(bits+1 − M_j) with M_j = 0 for
    * untouched registers. Every term is an integer (M_j ≤ bits+1), so S is
    * exact on both engines; the estimate is then ONE double division
    * `numerator / S`, identical IEEE op both sides:
    * E = alpha_m · m² · 2^(bits+1) / S  (raw HLL estimate, no small/large
    * range correction — the query surfaces V = zero-register count so a
    * caller can apply linear counting when E is small). */
  def numerator(m: Int): Double =
    alpha(m) * m.toDouble * m.toDouble * math.pow(2.0, (rhoBits(m) + 1).toDouble)
}

/** HyperLogLog builder: buffer = m byte registers, reduce = max with the
  * key's rho, merge = elementwise max. */
class HllAgg(m: Int) extends Aggregator[String, Array[Byte], Array[Byte]] {
  require(m >= 16 && Integer.bitCount(m) == 1, s"m must be a power of two >= 16, got $m")
  private val p = Integer.numberOfTrailingZeros(m)
  private val bits = 32 - p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(buf: Array[Byte], key: String): Array[Byte] = {
    val h = Sketch.hash32Jvm(key)
    val j = (h % m).toInt
    val w = (h >>> p).toInt // < 2^bits
    // leading zeros within `bits` bits + 1 == position of first '1' in the
    // zero-padded binary string (bits+1 when w == 0) — same as Hll.rhoCol.
    val rho = if (w == 0) bits + 1 else bits - (32 - Integer.numberOfLeadingZeros(w)) + 1
    if (rho > buf(j)) buf(j) = rho.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Array[Byte] = buf

  override def bufferEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
  override def outputEncoder: Encoder[Array[Byte]] = ExpressionEncoder[Array[Byte]]()
}
