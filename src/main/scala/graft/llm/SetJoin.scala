package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact set-similarity join with PREFIX FILTERING — the PPJoin/AllPairs
  * family for Jaccard (Chaudhuri et al. ICDE'06; Xiao et al. WWW'08),
  * complementing [[AllPairs]]'s cosine form: every document pair whose
  * distinct-n-gram Jaccard similarity clears a rational threshold
  * τ = tauNum/tauDen, found WITHOUT an O(n²) cross join and WITHOUT the
  * probabilistic misses of MinHash.
  *
  * The prefix-filter principle: order every document's term set by one
  * GLOBAL canonical order (ascending document frequency, ties by term —
  * rarest first), and take the prefix of length |x| − ⌈τ·|x|⌉ + 1. If
  * J(x,y) ≥ τ, the two prefixes MUST share at least one term (pigeonhole:
  * a pair disjoint on both prefixes can overlap on at most
  * (|x| − px) + … < the required intersection). So candidate generation =
  * a self-join of PREFIX postings only — and because the canonical order
  * puts the rarest terms in the prefix, per-term join fan-out is small by
  * construction (df-ascending is exactly the heuristic that makes PPJoin
  * subquadratic in practice).
  *
  * Plan shape: one explode shuffle to distinct (doc, term), one df agg
  * (bounded by vocabulary), one collect_list back to per-doc sorted
  * arrays (row-local sort of a doc's own vocab — never a window), the
  * prefix-posting self-join (one shuffle on term), then an exact
  * `array_intersect` verify on the candidate pairs only. The length
  * filter τ·max(|x|,|y|) ≤ min(|x|,|y|) is applied inside the join
  * condition, in cross-multiplied integer form.
  *
  * Cross-engine exactness: the threshold test is
  * `inter · tauDen ≥ union · tauNum` (pure 64-bit integers) and the
  * reported score is fixed-point parts-per-million
  * `jac_fp = inter·10⁶ div union` — no float anywhere.
  *
  * At 100 TB: prefix postings would be bucketed by term like any inverted
  * index; the df table is vocabulary-bounded; candidate verification
  * joins only pairs that survived BOTH the prefix and length filters.
  * Degenerate corpora (thousands of near-identical docs) still pay the
  * true output size — that is inherent to an EXACT join; the MinHash and
  * SimHash paths with `maxBucket` guards are the capped alternatives.
  */
object SetJoin {

  /** All document pairs with distinct-`n`-gram Jaccard ≥ tauNum/tauDen.
    * Returns (doc_a, doc_b, inter, uni, jac_fp) with doc_a < doc_b,
    * unordered. */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   tauNum: Long, tauDen: Long, n: Int = 3): DataFrame = {
    require(tauDen > 0 && tauNum > 0 && tauNum <= tauDen,
      s"need 0 < tauNum/tauDen <= 1 (got $tauNum/$tauDen)")
    val sets = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode(Curation.ngramsFromTokens(col("toks"), n)).as("term"))
      .distinct()
    val dfreq = sets.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // per-doc canonical order: ascending (df, term), materialized as one
    // row-local array_sort over the doc's own vocabulary (never a window)
    val ordered = sets.join(dfreq, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_list(struct(col("df"), col("term"))))
        .as("__dt"))
      .select(col("doc_id"),
        transform(col("__dt"), x => x.getField("term")).as("terms"),
        size(col("__dt")).cast("long").as("sz"))
    // prefix length |x| - ceil(tau*|x|) + 1, integer ceil-div; posexplode
    // keeps each term's 0-based POSITION in the canonical order for the
    // positional filter below
    val prefix = ordered.select(col("doc_id"), col("sz"),
      posexplode(slice(col("terms"), lit(1), expr(
        s"cast(sz - ((sz * $tauNum + ${tauDen - 1}) div $tauDen) + 1 as int)"))))
      .select(col("doc_id"), col("sz"), col("pos"), col("col").as("term"))
    // PPJoin positional filter (Xiao et al. WWW'08): J ≥ τ needs overlap
    // α = ⌈τ/(1+τ)·(|x|+|y|)⌉, and for a term shared at 0-based positions
    // (pa, pb) the overlap is bounded by min(pa, pb) common terms strictly
    // before it (both arrays share ONE total order, so "before" agrees)
    // plus 1 + min(|x|−pa−1, |y|−pb−1) from it onward. A qualifying pair
    // satisfies the bound at EVERY shared term, so adding it to the join
    // prunes candidates without losing any true pair. Integer form:
    // bound·(tauNum+tauDen) ≥ (|x|+|y|)·tauNum  ⇔  bound ≥ α.
    val posBound =
      (least(col("a.pos"), col("b.pos")) + lit(1L) +
        least(col("a.sz") - col("a.pos") - 1L,
          col("b.sz") - col("b.pos") - 1L)) * lit(tauNum + tauDen) >=
        (col("a.sz") + col("b.sz")) * lit(tauNum)
    val cands = prefix.as("a")
      .join(prefix.as("b"), col("a.term") === col("b.term") &&
        col("a.doc_id") < col("b.doc_id") &&
        // length filter: tau * max <= min, cross-multiplied
        greatest(col("a.sz"), col("b.sz")) * tauNum <=
          least(col("a.sz"), col("b.sz")) * tauDen &&
        posBound)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // exact verify on candidates only: row-local array_intersect
    cands
      .join(ordered.select(col("doc_id").as("doc_a"),
        col("terms").as("__ta"), col("sz").as("__sa")), Seq("doc_a"))
      .join(ordered.select(col("doc_id").as("doc_b"),
        col("terms").as("__tb"), col("sz").as("__sb")), Seq("doc_b"))
      .withColumn("inter",
        size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("uni", col("__sa") + col("__sb") - col("inter"))
      .where(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("uni"),
        expr("(inter * 1000000L) div (uni)").as("jac_fp"))
  }
}
