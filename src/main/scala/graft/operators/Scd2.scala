package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge: apply a batch of keyed changes
  * to a versioned dimension, closing the affected open rows (their
  * `valid_to` becomes the change's effective date) and appending the new
  * versions as open rows. The standard upsert-with-history shape of every
  * warehouse dimension and training-data metadata table.
  *
  * Scale shape: ONE equi-join on the key between the dimension's open rows
  * and the (typically much smaller — broadcastable by AQE) change batch,
  * plus a union — no window, no global ordering, no driver state. At
  * 100 TB the dimension is written partitioned by key range and the merge
  * rewrites only the partitions holding changed keys (the join output
  * carries the key, so partition pruning on the write side is free);
  * closed history rows are immutable and never rewritten.
  *
  * Contract: `dim` carries `keyCol`, the tracked attribute columns,
  * `valid_from`, `valid_to` (null = open). `changes` carries `keyCol`, the
  * same attribute columns (the NEW values), and `effectiveCol`. A change
  * for a key with no open row is an INSERT (no row to close); at most one
  * change per key per batch (the caller dedups — standard CDC compaction).
  */
object Scd2 {

  def merge(dim: DataFrame, changes: DataFrame, keyCol: String,
            effectiveCol: String = "effective"): DataFrame = {
    val attrs = dim.columns.filterNot(c =>
      c == keyCol || c == "valid_from" || c == "valid_to").toSeq
    require(changes.columns.toSet == (attrs.toSet + keyCol + effectiveCol),
      s"changes must carry exactly ($keyCol, ${attrs.mkString(", ")}, $effectiveCol)")

    val closing = changes.select(col(keyCol), col(effectiveCol).as("__eff"))
    // open rows joined against the change batch: matched ones close at the
    // effective date, unmatched (and all already-closed) rows pass through
    val merged = dim.join(closing, Seq(keyCol), "left")
      .withColumn("valid_to",
        when(col("valid_to").isNull && col("__eff").isNotNull, col("__eff"))
          .otherwise(col("valid_to")))
      .drop("__eff")
    val inserted = changes.select(
      (col(keyCol) +: attrs.map(col) :+
        col(effectiveCol).as("valid_from") :+
        lit(null).cast(dim.schema("valid_to").dataType).as("valid_to")): _*)
    merged.unionByName(inserted)
  }
}
