package graft.llm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN,BUF,OUT]` computing a k-hash MinHash signature over
  * a group of shingles — the Dataset-API counterpart of
  * [[Dedup.minhashSignatures]] (which expresses the same thing as k
  * `min(...)` Column aggregates). Same hash family: hash s of a shingle is
  * the first 16 hex chars of `md5("<s>|" + shingle)`, here parsed as an
  * unsigned 64-bit value (unsigned ordering ≡ lexicographic on the
  * fixed-width lowercase hex, so signatures agree with the SQL form
  * value-for-value).
  *
  * Usage:
  * {{{
  *   shingled.as[(Long, String)].groupByKey(_._1).mapValues(_._2)
  *     .agg(new MinHashAgg(16).toColumn.name("sig"))
  * }}}
  *
  * Scale shape: partial aggregation applies (reduce per partition, merge
  * across), buffer is k longs — constant state per group.
  */
class MinHashAgg(k: Int) extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(-1L) // unsigned max

  private def hash(seed: Int, shingle: String): Long = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(s"$seed|$shingle".getBytes(StandardCharsets.UTF_8))
    // first 8 bytes big-endian == first 16 hex chars
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var s = 0
    while (s < k) {
      val h = hash(s, shingle)
      if (java.lang.Long.compareUnsigned(h, buf(s)) < 0) buf(s) = h
      s += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var s = 0
    while (s < k) {
      if (java.lang.Long.compareUnsigned(b(s), a(s)) < 0) a(s) = b(s)
      s += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
