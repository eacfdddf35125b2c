package graft.io

import org.apache.spark.sql.{DataFrame, Row}

/** The ONE licensed gate for query-path driver collects.
  *
  * A `.collect()` inside an operator or query is the classic scale hazard:
  * fine when the frame is domain-bounded (|event types|, a trained gate's
  * vocabulary, a single argmax row), fatal when a schema drift or a new
  * corpus quietly makes it data-sized. The repo's rule is that every such
  * collect carries a BUDGET — previously as prose in a comment, here as an
  * executable `require`: the plan fetches at most `maxRows + 1` rows (a
  * `limit` in the plan, so an over-budget frame never ships to the driver
  * wholesale) and anything past the budget fails fast with the caller's
  * stated license. `grep -rn "\.collect()" src/main/scala/graft/{queries,llm}`
  * finding nothing outside this helper is the review invariant.
  *
  * Row ORDER is not part of the contract (the `limit` may reorder an
  * upstream sort): callers that need an order must re-establish it
  * driver-side from collected columns, as [[graft.llm.TextAnalysis.vocabTopV]]
  * does.
  */
object Bounded {

  /** Collect `df` asserting it holds at most `maxRows` rows; `why` states
    * the domain bound that licenses the collect (it is the failure
    * message's headline when the bound breaks). */
  def collect(df: DataFrame, maxRows: Int, why: String): Array[Row] = {
    require(maxRows >= 1, s"Bounded.collect: maxRows must be >= 1 (got $maxRows)")
    val rows = df.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"Bounded.collect over budget: more than $maxRows rows where $why")
    rows
  }
}
