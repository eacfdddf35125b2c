package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single most recent right row with
  * `rightTs <= leftTs` on the same key. The operator Spark's join surface
  * lacks natively (SPARK-22947); composed here from existing operators per
  * the build preference order: union the two sides, one window pass with
  * `last(..., ignoreNulls)` carries the latest right attributes forward in
  * time order, then keep the left rows.
  *
  * Scale shape: ONE shuffle (the window's partition-by-key), no range
  * explosion, no per-left-row scan of the right side — each partition is a
  * single ordered sweep. Contrast with the naive `leftTs >= rightTs`
  * non-equi join + max-filter, which materializes every (left, earlier
  * right) pair. Keys with millions of rows sweep linearly; skewed keys can
  * pre-salt with [[Skew]] at the cost of a second merge pass.
  *
  * Ties (`rightTs == leftTs`) are inclusive — the right row sorts before
  * the left row at equal timestamps, matching DuckDB's `ASOF JOIN` with a
  * `<=` condition.
  */
object AsOfJoin {

  /** @param left       rows to annotate
    * @param right      rows to look up as-of each left timestamp
    * @param keys       equality keys present on both sides
    * @param leftTs     left event-time column name
    * @param rightTs    right event-time column name
    * @param rightVals  right columns to carry onto matching left rows
    * @param inner      drop left rows with no prior right row (ASOF JOIN
    *                   semantics); false keeps them with nulls (left outer)
    * @param forward    false (default): most recent right row with
    *                   `rightTs <= leftTs`; true: NEAREST FOLLOWING right
    *                   row (`rightTs >= leftTs`, ties inclusive) — the same
    *                   single ordered sweep run in reverse time order,
    *                   matching DuckDB `ASOF JOIN ... ON r.ts >= l.ts`
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightVals: Seq[String],
           inner: Boolean = true, forward: Boolean = false): DataFrame = {
    val keyCols = keys.map(k => col(s"`$k`"))
    // leftTs is re-emitted from __ts in the final select — keeping it in the
    // payload list would duplicate the column (AMBIGUOUS_REFERENCE downstream)
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTs)
    val outNames = keys ++ Seq(leftTs) ++ leftCols
    require(rightVals.forall(!outNames.contains(_)),
      s"rightVals ${rightVals.mkString(",")} collide with left output columns; alias the right side first")
    // union schema: keys ++ ts ++ side ++ left payload ++ right payload
    val rStruct = struct(rightVals.map(c => col(s"`$c`")): _*)
    val l = left.select(
      keyCols ++
        Seq(col(s"`$leftTs`").as("__ts"), lit(1).as("__side")) ++
        leftCols.map(c => col(s"`$c`")) :+
        lit(null).as("__r"): _*)
    val r0 = right.select(
      keyCols ++
        Seq(col(s"`$rightTs`").as("__ts"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).as(c)) :+
        rStruct.as("__r"): _*)
    // right rows (side 0) sort before left rows at equal ts → inclusive
    // ties in BOTH directions; the right payload rides as ONE struct so
    // all carried columns come from the SAME right row. Forward is the
    // identical sweep with time reversed (desc), so "last right seen"
    // becomes "nearest following right".
    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r0, allowMissingColumns = false)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    val leftRows = carried.where(col("__side") === 1)
    val matched = if (inner) leftRows.where(col("__asof").isNotNull) else leftRows
    matched.select(
      keyCols ++
        Seq(col("__ts").as(leftTs)) ++
        leftCols.map(c => col(s"`$c`")) ++
        rightVals.map(c => col(s"__asof.`$c`").as(c)): _*)
  }
}
