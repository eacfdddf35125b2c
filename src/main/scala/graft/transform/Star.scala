package graft.transform

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generic star-schema building blocks: dimension extraction with dense
  * surrogate keys (O26+O27) and fact assembly via dim joins (O22–O25).
  *
  * Reference semantics: `drop_duplicates().reset_index(); id = index + 1`
  * (`/root/reference/transformation_pipeline.py:72-93`) — contiguous 1-based
  * ids. Encounter order is irreproducible in a parallel engine, so ids are
  * assigned in natural-key sort order instead (dense 1..N, identical join
  * structure; the one documented semantic change).
  */
object Star {

  /** O26+O27 — distinct natural key + dense 1..N surrogate ids.
    *
    * Scale note: `dropDuplicates` is a parallel map-side-combined shuffle;
    * the `row_number` window runs over the ALREADY-REDUCED dim, whose
    * cardinality is bounded (that's what makes it a dimension). A global
    * window over a bounded set is not a bottleneck. For unbounded key sets
    * use [[denseIdsScalable]] instead.
    *
    * Sort order pins nulls first (Spark's ASC default) — oracle SQL must say
    * `NULLS FIRST` to match.
    */
  def buildDim(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val keys = keyCols.map(k => col(s"`$k`"))
    val w = Window.orderBy(keys.map(_.asc_nulls_first): _*)
    df.select(keys: _*).dropDuplicates()
      .withColumn(idCol, row_number().over(w))
  }

  /** O27 scale path — dense contiguous 1..N ids WITHOUT a single-partition
    * window: range-repartition by the key, sort within partitions, then
    * `zipWithIndex` (one extra job to count partitions; no global sort on
    * one node). Order equals the global key sort, so ids match
    * [[buildDim]]'s assignment.
    */
  def denseIdsScalable(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame = {
    val keys = keyCols.map(k => col(s"`$k`").asc_nulls_first)
    val sorted = df.repartitionByRange(keys: _*).sortWithinPartitions(keys: _*)
    val outSchema = sorted.schema.add(idCol, LongType, nullable = false)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(indexed, outSchema)
  }

  /** O22–O25 — attach one dimension to the fact on its natural key.
    * Dims are bounded → always broadcast (no shuffle of the fact side).
    * `nullSafe=true` uses `<=>` (Catalyst `EqualNullSafe`) so a null key
    * still joins to the dim's null row — pandas `merge` NaN==NaN semantics
    * (`transformation_pipeline.py:99`); plain `=` would drop those rows.
    */
  def joinDim(fact: DataFrame, dim: DataFrame, keyCols: Seq[String],
              nullSafe: Boolean = false): DataFrame = {
    if (!nullSafe) fact.join(broadcast(dim), keyCols, "inner")
    else {
      val cond = keyCols.map(k => fact(s"`$k`") <=> dim(s"`$k`")).reduce(_ && _)
      keyCols.foldLeft(fact.join(broadcast(dim), cond, "inner")) {
        (d, k) => d.drop(dim(s"`$k`"))
      }
    }
  }
}
