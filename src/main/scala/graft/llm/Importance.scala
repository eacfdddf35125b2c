package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-selection importance weighting over hashed n-gram features — the
  * DSIR shape (Xie et al., NeurIPS 2023): score every raw document by how
  * much its hashed n-gram distribution looks like a TARGET subset's,
  * then sample/select by that score. The reference has no selection
  * operator at all; this is the standard "pick the 10% of the crawl that
  * looks like the high-quality corpus" move.
  *
  * Differences from the paper, chosen for engine-grade determinism:
  * the per-bucket weight is the RATIONAL add-one ratio
  * `ratio_fp(b) = ((t_b + 1) · 10⁶) div (r_b + 1)` (target count over raw
  * count, parts-per-million) instead of a float log-likelihood ratio —
  * integer arithmetic is bit-stable across engines, and since
  * target ⊆ raw implies t_b ≤ r_b, every ratio is ≤ 10⁶, so a document's
  * score `Σ c_b · ratio_fp(b)` cannot overflow before ~10¹² tokens.
  * Monotonicity in "target-likeness" is what selection needs; the exact
  * link function is not.
  *
  * Shape: ONE tokenize+hash pass reduced immediately to per-(doc, bucket)
  * counts (the only corpus-sized shuffle, map-side combined); both
  * distribution tables aggregate those counts down to ≤ `buckets` rows;
  * the scoring join is a BROADCAST of the bucket table back onto the
  * per-doc counts. The counts frame feeds three consumers, so it is
  * localCheckpointed — without that, each consumer would re-run the
  * tokenize+explode+shuffle upstream (the q121 lesson).
  */
object Importance {

  /** Per-document importance score against a target subset:
    * (doc_id, n_grams, score_fp). Docs with fewer than `n` tokens score
    * (0, 0). `targetPred` marks the target rows (e.g. `col("lang") === "en"`).
    * Unordered. */
  def hashedNgramScores(docs: DataFrame, textCol: String, idCol: String,
                        targetPred: Column, buckets: Int, n: Int = 2): DataFrame = {
    require(buckets > 0, s"buckets must be > 0 (got $buckets)")
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), targetPred.as("is_target"),
        TextAnalysis.tokens(col(textCol)).as("toks"))
    val counts = toked
      .select(col("doc_id"), col("is_target"),
        explode(Curation.ngramsFromTokens(col("toks"), n)).as("gram"))
      .withColumn("b", Sketch.hash32(col("gram")) % buckets)
      .groupBy(col("doc_id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val raw = counts.groupBy(col("b")).agg(sum(col("c")).as("r_cnt"))
    val tgt = counts.where(col("is_target"))
      .groupBy(col("b")).agg(sum(col("c")).as("t_cnt"))
    val table = raw.join(tgt, Seq("b"), "left")
      .select(col("b"),
        expr("((coalesce(t_cnt, 0L) + 1L) * 1000000L) div (r_cnt + 1L)")
          .as("ratio_fp"))
    val scored = counts.join(broadcast(table), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_grams"),
        sum(col("c") * col("ratio_fp")).as("score_fp"))
    toked.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
  }
}
