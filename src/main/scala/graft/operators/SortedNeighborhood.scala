package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sorted-neighborhood method (SNM) blocking — the classic record-linkage
  * complement to hash blocking (LSH/SimHash): sort the corpus by a
  * domain-chosen blocking key and emit every pair within a sliding window
  * of `w` positions. Where LSH buckets by CONTENT similarity, SNM blocks
  * by KEY LOCALITY — near-dups whose edits fall outside the hashed
  * feature (title variants, prefix-stable records) surface here, which is
  * why production entity-resolution stacks run both and union the
  * candidate sets (Hernández & Stolfo 1995's merge/purge).
  *
  * Scale shape: the global position comes from
  * [[RunningTotal.grouped]]'s range-partitioned prefix sum (no
  * single-task window at any corpus size); the window expansion is a
  * narrow `sequence` explode with fan-out w−1; candidates come from ONE
  * equi-join on the dense rank (both sides hash-partition on it). Total
  * candidate count is exactly (n−1)+(n−2)+…: linear in the corpus at
  * fixed w, never all-pairs. The ranked frame feeds both join sides, so
  * it is localCheckpoint'ed once (the q121 fan-out lesson).
  */
object SortedNeighborhood {

  /** Candidate pairs (doc_a < doc_b, with their window `gap`) from a
    * sliding window of `w` consecutive positions in (sortKey, id) order. */
  def pairs(df: DataFrame, idCol: String, sortKey: Column, w: Int): DataFrame = {
    require(w >= 2, s"window must be >= 2 (got $w)")
    val keyed = df.select(col(idCol).cast("long").as("id"), sortKey.as("sk"))
      .withColumn("__g", lit(0)).withColumn("__one", lit(1L))
    val ranked = RunningTotal.grouped(keyed, "__g", Seq("sk", "id"),
        "__one", "__r", groupCountHint = Some(1L))
      .select(col("id"), col("__r").as("r"))
      .localCheckpoint(true)
    ranked
      .withColumn("r2", explode(sequence(col("r") + 1, col("r") + (w - 1))))
      .join(ranked.select(col("id").as("id_b"), col("r").as("r2")), Seq("r2"))
      .select(least(col("id"), col("id_b")).as("doc_a"),
        greatest(col("id"), col("id_b")).as("doc_b"),
        (col("r2") - col("r")).as("gap"))
  }
}
