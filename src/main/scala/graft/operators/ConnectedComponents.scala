package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that turns
  * near-duplicate CANDIDATE PAIRS ([[graft.llm.Dedup]]'s LSH/SimHash
  * output) into dedup DECISIONS: every document in a component gets the
  * component's minimum doc id as its cluster id; keep the minimum, drop the
  * rest.
  *
  * Algorithm: iterative min-label propagation to a fixpoint. Each round is
  * one join (edge endpoint → current label) + one min-aggregate — two
  * shuffles keyed by node id, no driver-side graph state; the driver only
  * runs the O(diameter) convergence loop (the same bounded-driver-loop
  * license as [[graft.llm.Ivf.fit]]'s Lloyd rounds). Near-dup graphs are
  * dense bucket cliques, so the diameter — and the round count — is small
  * (2-3 in practice).
  *
  * 100 TB note: propagation rounds scale with component diameter. For
  * adversarial long-chain graphs, the alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce") caps
  * rounds at O(log n) with the same join-per-round shape; propagation is
  * preferred here because dedup components are shallow and each round is
  * one cheap equi-join.
  */
object ConnectedComponents {

  /** @param pairs undirected edges, one per row
    * @param aCol / bCol edge endpoint columns (same type)
    * @param maxIters hard round cap (propagation converges in
    *                 O(component diameter) rounds)
    * @return (id, cluster_id) for every node with at least one edge;
    *         cluster_id = min node id in the component
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIters: Int = 20): DataFrame = {
    // both directions, deduped, materialized once: every round re-reads it
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      // each node pulls the smallest label among itself and its neighbors
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next
        .join(labels.select(col("id"), col("label").as("old")), Seq("id"))
        .where(col("label") =!= col("old"))
        .count()
      labels = next
      converged = changed == 0
      i += 1
    }
    labels.select(col("id"), col("label").as("cluster_id"))
  }
}
