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
    // The election join back on (hash h, keeper doc_id) must stay an
    // equi-join — a nested-loop here would be O(n²) at corpus scale. The
    // round-12 advice showed the old substring disjunction passed as long
    // as ANY keyed join existed anywhere, so this walks the plan tree and
    // asserts on the election join NODE itself: some equi-join carries
    // BOTH h and doc_id in its join keys, and no nested-loop join's
    // condition or output touches the hash column at all.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastNestedLoopJoinExec}
    val qe = LexicalQueries.dedupTokens(
        graft.io.Tables.widen(graft.io.Tables.documents(spark, sf))
          .select(col("doc_id"), col("source"), col("text")))
      .queryExecution
    val exec: SparkPlan = qe.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val joins = exec.collect { case j: BaseJoinExec => j }
    def keyNames(j: BaseJoinExec): Set[String] =
      (j.leftKeys ++ j.rightKeys).flatMap(_.references.map(_.name)).toSet
    val election = joins.filter { j =>
      val k = keyNames(j); k.contains("h") && k.contains("doc_id")
    }
    assert(election.nonEmpty,
      s"no equi-join keyed on (h, doc_id) — the election lost its keys:\n$exec")
    assert(election.forall(!_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      s"election join regressed to a nested-loop:\n$exec")
    val bnlj = exec.collect { case j: BroadcastNestedLoopJoinExec => j }
    assert(!bnlj.exists(j =>
        j.condition.exists(_.references.exists(_.name == "h")) ||
        j.left.output.exists(_.name == "h") ||
        j.right.output.exists(_.name == "h")),
      s"a nested-loop join touches the election hash column:\n$exec")
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
