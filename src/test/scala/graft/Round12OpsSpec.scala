package graft

import org.apache.spark.sql.functions._

import graft.queries.LexicalQueries

/** Plan-shape locks for the round-12 lexical/mixture family — the
  * assertions that would catch a future edit silently replacing a
  * scale-correct shape with one that only works at test scale. Values
  * are oracle-checked elsewhere (CORRECTNESS + LexicalFuzzSpec); these
  * lock the PHYSICAL shapes the scaladocs promise. */
class Round12OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q380/q381 census: vocab aggregation map-side combines (partial agg)") {
    val p = SparkEntry.queries("q380_chao1_vocab")(spark, sf)
      .queryExecution.executedPlan.toString()
    // the (source, token) count and the census both plan partial
    // aggregates — the property that makes the corpus pass one-shot
    assert(p.contains("partial_count") || p.contains("Partial"),
      s"vocab census lost its map-side combine:\n$p")
  }

  test("q383 benford: the dense digit grid joins via broadcast, never shuffle") {
    val p = SparkEntry.queries("q383_benford")(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"),
      s"benford grid lost its broadcast:\n$p")
  }

  test("q386 dedup tokens: keeper election joins by key, not nested-loop") {
    // the election join back on (hash, keeper id) must stay an equi-join
    // (SortMergeJoin or [Broadcast|Shuffled]HashJoin) — a nested-loop
    // here would be O(n^2) at corpus scale
    val plan = LexicalQueries.dedupTokens(
        graft.io.Tables.widen(graft.io.Tables.documents(spark, sf))
          .select(col("doc_id"), col("source"), col("text")))
      .queryExecution.executedPlan.toString()
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin|BroadcastNestedLoopJoin)".r
      .findAllIn(plan).toSeq
    assert(joins.nonEmpty && !joins.contains("BroadcastNestedLoopJoin") ||
      // the bounded per-source readout legitimately broadcasts; only the
      // election itself must be keyed — check an equi-join exists
      joins.exists(j => j != "BroadcastNestedLoopJoin"),
      s"keeper election joins:\n$joins\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("HashJoin"),
      s"keeper election lost its equi-join:\n$plan")
  }

  test("q382 zipf: regression moments reduce the ranked frame, no global sort") {
    val p = SparkEntry.queries("q382_zipf_slope")(spark, sf)
      .queryExecution.executedPlan.toString()
    // the only sort is the window's partition-local sort and the final
    // orderBy; no Exchange SinglePartition before the aggregate
    assert(!p.contains("Exchange SinglePartition") ||
      p.indexOf("Exchange SinglePartition") > p.indexOf("HashAggregate"),
      s"zipf funnels through one partition before aggregating:\n$p")
  }

  test("q392 group-sequential: one corpus pass, one grouped aggregate") {
    val p = SparkEntry.queries("q392_group_sequential")(spark, sf)
      .queryExecution.executedPlan.toString()
    // both looks reduce in the SAME aggregate (conditional sums), so the
    // events relation is scanned once
    assert("(?s)events".r.findAllIn(p).size >= 1 &&
      !p.contains("Union"), s"q392 grew a second pass:\n$p")
  }
}
