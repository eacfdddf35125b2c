package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** All-pairs document similarity over the term inverted index — the exact
  * counterpart to the probabilistic near-dup family (MinHash [[Dedup]],
  * SimHash): every document pair whose bag-of-words cosine clears a
  * threshold, found WITHOUT an O(n²) cross join.
  *
  * This is the AllPairs / DISCO shape (Bayardo et al., WWW'07; the
  * reference has no equivalent — its dedup surface stops at exact
  * `drop_duplicates`, `transformation_pipeline.py:51`): build postings
  * tf(doc, term), self-join postings PER TERM, and bound the blow-up by
  * pruning the posting lists first:
  *
  *  - `df == 1` terms cannot produce a pair — dropped (this removes the
  *    long tail, typically most of the vocabulary);
  *  - `df > maxDf` terms are stopword-like: they contribute little
  *    discriminative weight but df·(df−1)/2 pair candidates each — the
  *    classic quadratic blow-up. Dropping them bounds the per-term join
  *    fan-out at maxDf²/2 regardless of corpus size, which is what makes
  *    the plan survive a 100× scale-up. Similarity is therefore DEFINED
  *    over the pruned term space (norms use the same kept postings), so
  *    the operator is self-consistent and exactly reproducible.
  *
  * Plan shape: one token-explode shuffle to tf (map-side combined), one
  * term-keyed df agg (bounded by vocabulary), the per-term posting
  * self-join (one shuffle on term), a (doc_a, doc_b)-keyed dot agg, and
  * two doc-keyed norm joins. No window, no cross join, no collect. At
  * cluster scale the postings would be bucketed by term so the self-join
  * is shuffle-free; AQE handles the residual term skew within the maxDf
  * bound.
  *
  * Cross-engine exactness: the score is kept RATIONAL instead of float —
  * cos²(a,b) = dot²/(‖a‖²·‖b‖²) in fixed-point,
  * `cos2_fp = (dot·dot·10⁶) div (na2·nb2)` — because a float
  * sqrt/divide chain is not bit-stable across engines. Thresholding on
  * cos² is equivalent to thresholding on cos for non-negative tf vectors.
  * Overflow bound: dot ≤ max(‖·‖²) so dot²·10⁶ stays under 2⁶³ for
  * documents up to ~10⁵ tokens — far past this corpus; callers feeding
  * pathological inputs should rescale first.
  */
object AllPairs {

  /** All document pairs with fixed-point cos² ≥ `minCos2Fp` (parts per
    * million) over df-pruned bag-of-`n`-gram vectors. The terms are word
    * n-grams (default 3 — the near-dup family's shingle width), NOT
    * unigrams: unigram df concentrates on the head of the vocabulary (on a
    * bounded vocabulary EVERY term exceeds any useful maxDf and the
    * operator degenerates to the empty set), while shingles are selective
    * by construction — exactly why MinHash shingles the same way. Returns
    * (doc_a, doc_b, dot, cos2_fp) with doc_a < doc_b, unordered. */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
                  maxDf: Int, minCos2Fp: Long, n: Int = 3): DataFrame = {
    require(maxDf >= 2, s"maxDf must be >= 2 (got $maxDf)")
    val tf = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode(Curation.ngramsFromTokens(col("toks"), n)).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val kept = tf.join(df.where(col("df").between(2, maxDf)), Seq("term"))
      .select(col("doc_id"), col("term"), col("tf"))
    val norms = kept.groupBy(col("doc_id"))
      .agg(sum(col("tf") * col("tf")).as("n2"))
    val dots = kept.as("a")
      .join(kept.as("b"), col("a.term") === col("b.term") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("__na2")), Seq("doc_a"))
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("__nb2")), Seq("doc_b"))
      .withColumn("cos2_fp",
        expr("(dot * dot * 1000000L) div (__na2 * __nb2)"))
      .where(col("cos2_fp") >= minCos2Fp)
      .select(col("doc_a"), col("doc_b"), col("dot"), col("cos2_fp"))
  }
}
