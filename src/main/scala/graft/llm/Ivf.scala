package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) index for approximate nearest-neighbor search:
  * k-means coarse quantizer + cell-restricted search — the standard
  * billion-vector ANN architecture, built here from pure DataFrame ops
  * (posexplode / groupBy-avg / broadcast argmax), no MLlib.
  *
  * Scale shape per Lloyd iteration: one broadcast of k centroids (k ≤ a few
  * thousand — always driver-safe), one corpus scan for assignment (argmax of
  * k cosines per row, no shuffle), one (cell, dim)-keyed aggregation for the
  * new means (shuffle of corpus×dim skinny rows with map-side partial
  * aggregation). Assignment and search never pair corpus rows with each
  * other — candidate generation is a cell equi-join, like [[Similarity]]'s
  * sign-LSH but with learned, data-adaptive cells.
  */
object Ivf {

  /** Deterministic k-means: initial centroids are the k smallest-id
    * vectors; `iters` Lloyd rounds. Returns (cell, centroid: array<double>).
    */
  def fit(corpus: DataFrame, k: Int, iters: Int, dim: Int,
          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c0 = corpus.orderBy(col(idCol)).limit(k)
      .orderBy(col(idCol))
      .select(col(idCol), col(vecCol).cast("array<double>").as("centroid"))
      .withColumn("cell", row_number().over(Window.orderBy(col(idCol))) - 1)
      .select(col("cell"), col("centroid"))

    val fitted = (1 to iters).foldLeft(c0) { (centroids, _) =>
      val assigned = assign(corpus, centroids, dim, idCol, vecCol)
      // new centroid = per-cell elementwise mean as `dim` aggregates in ONE
      // groupBy: a single shuffle carrying k×dim map-side partials. (The
      // previous posexplode formulation pushed corpus×dim rows through the
      // aggregation machinery and needed a second groupBy + array_sort to
      // reassemble the vector.) Each component accumulates in
      // DECIMAL(27,12) and divides the count as a double: the mean is then
      // independent of partial-aggregation order — the fitted centroids
      // (and every downstream assignment) are bit-identical across
      // partitionings, and the whole Lloyd chain is oracle-expressible
      // (q35's DuckDB oracle mirrors this exact operation order).
      val sums = (0 until dim).map(j =>
        sum(element_at(col(vecCol), j + 1).cast("double")
          .cast("decimal(27,12)")).as(s"__s$j"))
      assigned.groupBy(col("cell"))
        .agg(sums.head, sums.tail :+ count(lit(1)).as("__n"): _*)
        .select(col("cell"),
          array((0 until dim).map(j =>
            col(s"__s$j").cast("double") / col("__n")): _*).as("centroid"))
    }
    // k-means is inherently iterative and its result is referenced from
    // multiple places downstream (topK packs it once for assignment and
    // once for probe routing): truncate the lineage ONCE at the end (an
    // eager k-row materialization) so no consumer re-runs the Lloyd chain.
    // Intermediate rounds chain linearly (each round referenced exactly
    // once by the next), so per-round checkpoints would only add jobs.
    if (iters > 0) fitted.localCheckpoint(true) else fitted
  }

  /** Assign every vector to its nearest centroid (max cosine; ties to the
    * lower cell id). The bounded centroid set (k ≤ a few thousand — the same
    * broadcast license as `qcut`'s cut points) is packed into ONE broadcast
    * row of flat arrays (cell ids, concatenated centroids, precomputed
    * norms); per-row assignment is the native codegen [[NearestCell]]
    * expression — one O(k·dim) generated loop. Zero row multiplication and
    * zero shuffle: the corpus never leaves its partitions (the previous
    * corpus×k crossJoin + window argmax shuffled k× the corpus per Lloyd
    * round). See [[NearestCell]]'s scaladoc for why the composable
    * formulations (window argmax / HOF fold / unrolled CASE) all lose. */
  def assign(corpus: DataFrame, centroids: DataFrame, dim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // packed in ascending cell order (array_sort on the struct sorts by the
    // first field), so NearestCell's strict-improvement loop keeps the
    // LOWEST cell on score ties — same as the old window's
    // `score desc, cell asc`. The transform/flatten below run once on the
    // single packed row, not per corpus row.
    val packed = centroids.agg(array_sort(collect_list(struct(
        col("cell"), col("centroid"),
        Similarity.norm(col("centroid"), dim).as("cnorm")))).as("__cents"))
      .select(
        expr("transform(__cents, c -> c.cell)").as("__cells"),
        flatten(expr("transform(__cents, c -> c.centroid)")).as("__flat"),
        expr("transform(__cents, c -> c.cnorm)").as("__norms"))
    corpus.crossJoin(broadcast(packed))
      .withColumn("cell", element_at(col("__cells"),
        NearestCell.nearestCell(col(vecCol).cast("array<double>"),
          col("__flat"), col("__norms")) + 1))
      .drop("__cells", "__flat", "__norms")
  }

  /** IVF top-k search: route each query to its `nProbe` closest cells, then
    * score only vectors assigned to those cells. Recall/cost dial: nProbe=1
    * is fastest, nProbe=#cells is exact brute force. */
  def topK(queries: DataFrame, corpus: DataFrame, centroids: DataFrame,
           k: Int, nProbe: Int, dim: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // per-vector norms staged once per ROW so the pair scoring below is a
    // single dot product — dot/(qn*cn) is the exact cosine expression with
    // the same operation order (see Similarity.cosineWithNorms)
    val assigned = assign(corpus, centroids, dim, idCol, vecCol)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col("cell"),
        Similarity.norm(col(vecCol), dim).as("__cn"))
    val probes = {
      // the query side is small by contract (it broadcasts below), so the
      // crossJoin+window probe routing stays modest: queries×k rows
      val w = Window.partitionBy(col(idCol)).orderBy(col("score").desc, col("cell"))
      queries.crossJoin(broadcast(centroids))
        .withColumn("score", Similarity.cosine(col(vecCol), col("centroid"), dim))
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") <= nProbe)
        .select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col("cell"),
          Similarity.norm(col(vecCol), dim).as("__qn"))
    }
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("qvec"), col("cvec"), dim) /
          (col("__qn") * col("__cn"))).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Diversity-preserving coreset: one representative per cell — the
    * member with the highest cosine to its OWN centroid (ties → lower id),
    * plus the cell population. The standard cheap move for
    * diversity-aware corpus subsampling: cells partition the embedding
    * space, so taking each cell's best-centered member keeps one exemplar
    * per region instead of k near-duplicates from the densest region.
    *
    * Scale shape: assignment is the shuffle-free [[assign]]; the score is
    * one dot product per row against the broadcast centroid; the argmax is
    * a map-side-combined `max(struct(score, -id))` groupBy on the BOUNDED
    * cell key — deliberately NOT a `row_number` window per cell, whose
    * partitions grow with the corpus (corpus/k rows in one task at 100 TB).
    */
  def cellRepresentatives(corpus: DataFrame, centroids: DataFrame, dim: Int,
                          idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = assign(corpus, centroids, dim, idCol, vecCol)
      .join(broadcast(centroids.select(col("cell"), col("centroid"))), Seq("cell"))
      .select(col("cell"), col(idCol),
        Similarity.cosine(col(vecCol), col("centroid"), dim).as("s"))
    scored.groupBy(col("cell"))
      .agg(max(struct(col("s"), (-col(idCol)).as("nid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cell"), (-col("best.nid")).as("rep_id"),
        col("best.s").as("rep_score"), col("n_members"))
  }
}
