package graft.operators

import org.apache.spark.sql.DataFrame

/** The view→click→purchase subsequence automaton shared by the batch
  * fold (q210) and its streaming certification: 3 stages plus a
  * completion counter packed into ONE long (`completions·10 + stage`),
  * so the whole matcher state is a single BIGINT wherever it runs — in
  * a [[KeyedFold]] partition scan or in a streaming GroupState. */
object PatternDfa {

  /** Event codes: 1 = view, 2 = click, 3 = purchase, 0 = other. */
  def step(a: Long, b: Long): Long =
    if (a % 10 == 0 && b == 1L) a + 1
    else if (a % 10 == 1 && b == 2L) a + 1
    else if (a % 10 == 2 && b == 3L) (a / 10 + 1) * 10
    else a

  /** Batch fold: one row per input row with the running `dfa` state. */
  def fold(df: DataFrame, key: String, orderCol: String, tieCol: String,
           xCol: String): DataFrame =
    KeyedFold.fold(df, key, orderCol, tieCol, xCol, "dfa")(
      init = x => step(0L, x), step = step)
}
