package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** The sorted-run fold — the shared scale shape behind every per-key
  * ordered RECURRENCE (EWMA, CUSUM, pattern-state machines): values that
  * depend on the previous OUTPUT, which no window frame can express
  * (window functions see previous *inputs*, not previous results).
  *
  * Shape: `repartition(key)` + `sortWithinPartitions(key, order, tie)`
  * puts each key's timeline contiguously in one partition, then ONE
  * `mapPartitions` scan folds the recurrence with O(1) state, reset on
  * key change. No `collect_list`, no per-key buffer: a key's history
  * length is unbounded and memory stays constant — the property an
  * ordered recurrence needs at 100 TB, where a groupBy materialization
  * would cap each key's history at executor memory.
  *
  * The fold runs in Long arithmetic so results are deterministic and
  * cross-engine replayable (a DuckDB oracle can unroll the recurrence
  * with `list_reduce` over per-key prefix lists, hash-exact).
  */
object KeyedFold {

  /** One output row per input row: (key, tie, x, state-after-x), column
    * names (keyName, tieName, xName, outName). `init` seeds the state
    * from the key's first value; `step` advances it. Both must be pure. */
  def fold(df: DataFrame, key: String, orderCol: String, tieCol: String,
           xCol: String, outName: String)
          (init: Long => Long, step: (Long, Long) => Long): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val prepared = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("o"),
      col(tieCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"), col("id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { iter =>
      var curKey = Long.MinValue
      var state = 0L
      var first = true
      iter.map { case (k, _, id, x) =>
        if (first || k != curKey) { curKey = k; state = init(x); first = false }
        else state = step(state, x)
        (k, id, x, state)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong))
      .toDF(key, tieCol, xCol, outName)
  }

  /** [[fold]] with TWO longs of carried state (outA, outB) — the shape a
    * coupled recurrence (level + trend, mean + variance) needs. Same
    * sorted-run contract: one partition scan, O(1) state, key-contiguous
    * layout from repartition + sortWithinPartitions. */
  def fold2(df: DataFrame, key: String, orderCol: String, tieCol: String,
            xCol: String, outA: String, outB: String)
           (init: Long => (Long, Long),
            step: ((Long, Long), Long) => (Long, Long)): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val prepared = df.select(col(key).cast("long").as("k"),
      col(orderCol).cast("long").as("o"),
      col(tieCol).cast("long").as("id"),
      col(xCol).cast("long").as("x"))
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"), col("id"))
      .as[(Long, Long, Long, Long)]
    prepared.mapPartitions { iter =>
      var curKey = Long.MinValue
      var a = 0L
      var b = 0L
      var first = true
      iter.map { case (k, _, id, x) =>
        if (first || k != curKey) {
          curKey = k; val s0 = init(x); a = s0._1; b = s0._2; first = false
        } else { val s1 = step((a, b), x); a = s1._1; b = s1._2 }
        (k, id, x, a, b)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))
      .toDF(key, tieCol, xCol, outA, outB)
  }
}
