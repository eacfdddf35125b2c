package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Semantic deduplication (SemDeDup, Abbas et al. 2023): cluster the
  * embedding space coarsely, then resolve exact cosine duplicates ONLY
  * within each cluster — the quadratic pair search is confined to cells,
  * never the corpus. The reference has no embedding-space operator at all
  * (its dedup surface is exact `drop_duplicates`,
  * `transformation_pipeline.py:51`); this is the scale path for "drop
  * semantically redundant training documents".
  *
  * Shape: one [[Ivf.assign]] pass (broadcast packed centroids + the native
  * codegen NearestCell expression — zero shuffle over the corpus), one
  * cell-keyed self-join for within-cell pairs, one count per dropped
  * vector, one left join back. The pair join's fan-out is bounded by the
  * largest cell, which is the operator's scale dial: at 100 TB you raise k
  * (SemDeDup uses ~100k clusters for LAION-scale) so cells stay thousands
  * of vectors; AQE's skew-join split handles stragglers. No checkpoint —
  * every re-referenced frame is narrow (scan + broadcast), so re-execution
  * multiplies no Exchange.
  *
  * Decision rule (deterministic): a vector is DROPPED when any
  * smaller-id vector in its cell has cosine ≥ `threshold` — i.e. each
  * near-dup group keeps its minimum id. Cosine is the same in-order double
  * fold as [[Similarity.dot]] with norms precomputed per row (same bits:
  * `dot / (sqrt(aa) * sqrt(bb))` with identical operation order), so the
  * whole decision is hash-exact across engines.
  */
object SemDedup {

  /** Per-vector semantic-dedup verdict: (vec_id, cell, n_dups_prior,
    * kept) — `n_dups_prior` counts the smaller-id within-cell neighbors at
    * cosine ≥ `threshold`; `kept` ⇔ that count is 0. Unordered. */
  def verdicts(corpus: DataFrame, centroids: DataFrame, dim: Int,
               threshold: Double,
               idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val asg = Ivf.assign(corpus, centroids, dim, idCol, vecCol)
      .select(col(idCol).as("vec_id"),
        col(vecCol).cast("array<double>").as("emb"), col("cell"))
      .withColumn("nrm", sqrt(Similarity.dot(col("emb"), col("emb"), dim)))
    val dropped = asg.as("a")
      .join(asg.as("b"), col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .where(Similarity.dot(col("a.emb"), col("b.emb"), dim) /
        (col("a.nrm") * col("b.nrm")) >= threshold)
      .groupBy(col("b.vec_id").as("vec_id"))
      .agg(count(lit(1)).as("n_dups_prior"))
    asg.select(col("vec_id"), col("cell"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dups_prior"), lit(0L)).as("n_dups_prior"),
        (coalesce(col("n_dups_prior"), lit(0L)) === 0L).as("kept"))
  }
}
