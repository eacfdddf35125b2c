package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes INFERENCE against a literal (driver-inlined)
  * model — the deploy-the-classifier-on-the-ingest-stream step. Training
  * happens batch-side (InfoQueries q273: chi-square-selected vocabulary,
  * Laplace weights in [[graft.functions.Ilog2]] fixed point); the trained
  * model is bounded (|V'| x |labels|, 8 tokens per label by construction),
  * so it inlines as literal map/array columns and scoring is ROW-LOCAL:
  * no aggregate, no state, no shuffle — it drops unchanged into a
  * `readStream → writeStream` chain (the q139/q173 stateless-gate shape).
  *
  * Per row: score_i = prior_i + Σ_tokens w(token, i) (each token
  * OCCURRENCE contributes its weight once — multinomial), then argmax
  * with ties to the lexicographically smallest label via one
  * `array_min(zip_with(...))` over (−score, label) structs. The weight
  * lookup is an O(|V'|) literal-map probe per token — gate-sized models
  * only; use the broadcast-join batch form (q274) for dictionary-sized
  * vocabularies.
  */
object NaiveBayes {

  /** Max |labels|x|V'| cells a literal model may inline into the plan. */
  val MaxLiteralCells = 8192

  /** Score + classify each row of `df`. `labels`, `priors` (aligned to
    * labels) and `weights` (token -> per-label weight array aligned to
    * labels) come from a bounded driver collect of the trained model.
    * Output: (doc_id, <passCols...>, pred_lang, score_fp). */
  def classifyLiteral(df: DataFrame, textCol: String, idCol: String,
                      labels: Seq[String], priors: Seq[Long],
                      weights: Map[String, Seq[Long]],
                      passCols: Seq[String] = Nil): DataFrame = {
    require(labels.nonEmpty && labels.size == priors.size,
      s"labels (${labels.size}) and priors (${priors.size}) must align")
    require(weights.values.forall(_.size == labels.size),
      "every weight vector must align with labels")
    // literal-plan budget: the weight map is inlined into the plan as a
    // typedLit, so |labels|x|V'| cells is plan SIZE, not data — a
    // mis-parameterized vocabulary would silently build a megabyte-scale
    // literal plan (and re-serialize it per task). Gate-sized models only.
    require(labels.size * weights.size <= MaxLiteralCells,
      s"classifyLiteral model has ${labels.size} labels x ${weights.size} " +
        s"tokens = ${labels.size * weights.size} literal cells " +
        s"(budget $MaxLiteralCells); shrink the vocabulary (df floor / " +
        "top-k per label) or use the broadcast-join batch form (q274 shape)")
    val wlit = typedLit(weights)
    val plit = typedLit(priors)
    val llit = typedLit(labels)
    df
      .withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      // per-label scores: prior + fold over token occurrences; the map
      // probe inside the fold touches a |V'|-entry literal — bounded
      .withColumn("__scores",
        transform(sequence(lit(0), lit(labels.size - 1)), i =>
          element_at(plit, i + 1) +
            aggregate(col("__toks"), lit(0L), (acc, t) =>
              acc + coalesce(element_at(element_at(wlit, t), i + 1), lit(0L)))))
      .withColumn("__best", array_min(zip_with(col("__scores"), llit,
        (sc, l) => struct((-sc).as("neg"), l.as("p")))))
      .select((col(idCol).as("doc_id") +: passCols.map(col)) ++ Seq(
        col("__best.p").as("pred_lang"),
        (-col("__best.neg")).as("score_fp")): _*)
  }
}
