package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded per-group top-k as a MAP-SIDE-COMBINABLE aggregate — the 100 TB
  * alternative to the window-function top-n (q33): `row_number() OVER
  * (PARTITION BY g ORDER BY score)` shuffles and sorts EVERY row of the
  * corpus; this aggregator keeps at most k (score, id) pairs per group per
  * map task, so the shuffle carries |groups|·k fixed-size buffers instead
  * of the corpus. Exact, not approximate: top-k is distributive (the true
  * top-k of a union is contained in the union of per-part top-ks).
  *
  * Ordering is (score DESC, id ASC) with the id tie-break making the
  * result — and the cross-engine oracle replay — deterministic.
  */
class TopKAgg(k: Int) extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1 (got $k)")

  override def zero: Array[(Long, Long)] = Array.empty

  /** true iff a=(score,id) ranks strictly before b. */
  private def before(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def reduce(buf: Array[(Long, Long)], x: (Long, Long)): Array[(Long, Long)] = {
    if (buf.length == k && !before(x, buf(k - 1))) buf
    else {
      // insert in rank order (buf is small: k entries, linear insert)
      var i = buf.length
      while (i > 0 && before(x, buf(i - 1))) i -= 1
      val out = new Array[(Long, Long)](math.min(buf.length + 1, k))
      java.lang.System.arraycopy(buf, 0, out, 0, i)
      if (i < out.length) out(i) = x
      if (i + 1 <= out.length - 1)
        java.lang.System.arraycopy(buf, i, out, i + 1, out.length - 1 - i)
      out
    }
  }

  override def merge(a: Array[(Long, Long)], b: Array[(Long, Long)]): Array[(Long, Long)] = {
    // standard sorted-merge of two rank-ordered runs, truncated at k
    val out = new Array[(Long, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      out(o) =
        if (j >= b.length || (i < a.length && !before(b(j), a(i)))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      o += 1
    }
    out
  }

  override def finish(buf: Array[(Long, Long)]): Array[(Long, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
}

object TopK {

  /** Exact top-k rows per group: (group, rank 1..k, idCol, scoreCol).
    * One ObjectHashAggregate with partial combine — the shuffle carries
    * per-group k-entry buffers, never corpus rows. */
  def topKByGroup(df: DataFrame, group: String, scoreCol: String,
                  idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), ExpressionEncoder[(Long, Long)]())
    df.groupBy(col(group))
      .agg(topk(col(scoreCol).cast("long"), col(idCol).cast("long")).as("top"))
      .select(col(group), posexplode(col("top")))
      .select(col(group), (col("pos") + 1).cast("long").as("rank"),
        col("col._2").as(idCol), col("col._1").as(scoreCol))
  }
}
