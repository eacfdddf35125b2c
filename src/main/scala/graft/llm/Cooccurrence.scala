package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed term co-occurrence statistics — the corpus-wide table behind
  * embedding training (word2vec skip-gram counts, GloVe co-occurrence
  * matrices) and PMI-based collocation mining over a training corpus.
  *
  * Pair generation is ROW-LOCAL: for each gap d in 1..window, the token
  * array is zipped with itself shifted by d (`zip_with` of two `slice`s),
  * so a document of n tokens emits exactly Σ_d (n−d) unordered pairs with
  * zero joins and zero row multiplication beyond the linear n·window
  * fan-out. The alternative — posexplode + self-join on the document id —
  * puts an O(n²)-per-document join in the plan; never do that.
  *
  * Association strength is the PRE-LOG PMI ratio in fixed point:
  *
  *   ratio_fp = (c_xy · T² · 10⁶) div (P · c_x · c_y)
  *
  * where c_xy is the pair count, c_x/c_y unigram instance counts, T total
  * token instances, and P total pair instances — i.e. 10⁶ ·
  * p(x,y)/(p(x)p(y)), whose log is the PMI. Staying pre-log keeps the
  * whole computation integer (DECIMAL(38,0) products, one integral
  * division), so results hash-match SQL exactly; consumers take the log
  * downstream where bit-parity no longer matters. DECIMAL(38,0) carries
  * c_xy·T²·10⁶ up to T ≈ 10¹³ tokens; past that, drop the 10⁶ scale or a
  * T factor (rank order is unaffected — P, T are global constants).
  *
  * Scale shape: one map-side-combined groupBy on the pair, one on the
  * unigram; the vocabulary-sized count frames join the (much smaller)
  * surviving-pair frame hash-partitioned; the two global totals are
  * 1-row aggregates broadcast by construction.
  */
object Cooccurrence {

  /** Co-occurring term pairs within `window` token positions, with counts
    * and fixed-point association ratios. Pairs are unordered
    * (term_a ≤ term_b); returns (term_a, term_b, c_xy, c_x, c_y,
    * ratio_fp), unordered — callers sort at the dump layer.
    *
    * @param minCount drop pairs seen fewer than this many times — the
    *   standard noise floor, and what bounds the output size
    */
  def pairs(docs: DataFrame, textCol: String, idCol: String,
            window: Int = 3, minCount: Long = 5L): DataFrame = {
    require(window >= 1, s"window must be >= 1 (got $window)")
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val pairArrays = (1 to window).map { d =>
      zip_with(
        slice(col("toks"), lit(1), greatest(size(col("toks")) - d, lit(0))),
        slice(col("toks"), lit(1 + d), greatest(size(col("toks")) - d, lit(0))),
        (a, b) => struct(least(a, b).as("a"), greatest(a, b).as("b")))
    }
    val pairInst = toked.select(explode(concat(pairArrays: _*)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
    val pairCounts = pairInst.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("c_xy"))
      .where(col("c_xy") >= minCount)
    val uni = toked.select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    // T and P: 1-row global totals. P is derived from per-doc arithmetic
    // (Σ_d (n−d) summed over docs), not a second pass over the pair frame.
    val totals = toked.agg(
      sum(size(col("toks"))).cast("long").as("t_tokens"),
      sum((1 to window).map(d =>
        greatest(size(col("toks")) - d, lit(0)).cast("long")).reduce(_ + _))
        .cast("long").as("t_pairs"))
    pairCounts
      .join(uni.select(col("t").as("a"), col("c").as("c_x")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("c").as("c_y")), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("a").as("term_a"), col("b").as("term_b"),
        col("c_xy"), col("c_x"), col("c_y"),
        expr("(cast(c_xy as decimal(38,0)) * t_tokens * t_tokens * 1000000)" +
          " div (cast(t_pairs as decimal(38,0)) * c_x * c_y)").as("ratio_fp"))
  }
}
