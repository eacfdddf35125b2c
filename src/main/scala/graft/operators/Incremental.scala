package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental view maintenance for distributive aggregates over a
  * weighted changelog — the "never rescan the base" refresh primitive a
  * 100 TB rollup needs: the materialized state is a bounded per-group
  * frame, each refresh partial-aggregates ONLY the delta batch (inserts
  * carry weight +1, retractions −1), and the merge is a union of two
  * already-aggregated frames re-summed on the group key. Cost per refresh
  * is O(|delta| + |groups|) regardless of base size; a group whose merged
  * row count reaches zero vanishes from the view, exactly as a full
  * recompute would drop it.
  *
  * Counts maintain as `sum(weight)`, sums as `sum(weight * value)` — the
  * standard weighted-relation encoding (averages derive as sum/count at
  * read time; MIN/MAX are NOT maintainable this way and are out of scope).
  *
  * Scale shape: both [[partial]] and [[merge]] are single hash
  * aggregations with map-side combine; the merge input is |groups|-sized
  * on the state side and |delta groups|-sized on the delta side — no
  * shuffle ever touches base-table rows again.
  */
object Incremental {

  /** One partial-aggregation pass over a weighted changelog.
    *
    * @param values  output-column-name → value expression; each becomes
    *                `sum(weight * value)` under that name. The row count
    *                is always maintained as `n_rows = sum(weight)`.
    */
  def partial(changes: DataFrame, keys: Seq[String], weight: Column,
              values: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "at least one group key required")
    val aggs = sum(weight).cast("long").as("n_rows") +:
      values.map { case (n, c) => sum(weight * c).cast("long").as(n) }
    changes.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge aggregate states (associative + commutative, so any number of
    * partials in any order): union by name, re-sum per group, and drop
    * groups whose maintained row count has reached zero. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "at least one state frame required")
    val u = states.reduce(_ unionByName _)
    val aggCols = u.columns.filterNot(keys.contains).toSeq
    require(aggCols.contains("n_rows"), "state frames must carry n_rows")
    u.groupBy(keys.map(col): _*)
      .agg(sum(col(aggCols.head)).cast("long").as(aggCols.head),
        aggCols.tail.map(c => sum(col(c)).cast("long").as(c)): _*)
      .where(col("n_rows") =!= 0L)
  }
}
