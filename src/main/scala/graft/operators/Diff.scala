package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation: classify every key of two table versions as
  * `added` / `removed` / `changed` / `unchanged` — the data-ops primitive
  * behind snapshot audits, backfill validation, and CDC sanity checks
  * ("did the rewrite change anything it shouldn't have?").
  *
  * Scale shape: ONE full-outer equi-join on the key (both sides shuffle on
  * the same key — co-partitioned if the tables are bucketed by it) and a
  * map-side-combined count. Attribute comparison is columnwise null-safe
  * equality (`<=>`) — no row serialization, no hashing, stays in codegen.
  */
object Diff {

  /** Per-key classification: (key columns..., change_type). */
  def classify(oldDf: DataFrame, newDf: DataFrame, keyCol: String): DataFrame = {
    val attrs = oldDf.columns.filterNot(_ == keyCol).toSeq
    require(newDf.columns.sorted.sameElements(oldDf.columns.sorted),
      s"schemas differ: ${oldDf.columns.mkString(",")} vs ${newDf.columns.mkString(",")}")
    val l = oldDf.select(col(keyCol).as("__k"),
      struct(attrs.map(col): _*).as("__l"))
    val r = newDf.select(col(keyCol).as("__k"),
      struct(attrs.map(col): _*).as("__r"))
    l.join(r, Seq("__k"), "full_outer")
      .select(col("__k").as(keyCol),
        when(col("__l").isNull, lit("added"))
          .when(col("__r").isNull, lit("removed"))
          .when(col("__l") <=> col("__r"), lit("unchanged"))
          .otherwise(lit("changed")).as("change_type"))
  }

  /** Reconciliation summary: one row per change_type with its key count. */
  def summary(oldDf: DataFrame, newDf: DataFrame, keyCol: String): DataFrame =
    classify(oldDf, newDf, keyCol)
      .groupBy(col("change_type")).agg(count(lit(1)).as("n_keys"))
}
