package graft

/** Scale guarantees, enforced as regression tests over EVERY registered
  * query: plans must never contain an unpruned all-pairs operator. A
  * `CartesianProduct` appearing in any future edit of the dedup/similarity
  * pipelines is exactly the failure mode that works at sf0.01 and dies at
  * 100 TB — so it fails CI here instead. (Broadcast nested-loop joins of a
  * deliberately-broadcast small side — query vectors, qcut cut points — are
  * fine and expected.)
  */
class PlanGuaranteesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without CartesianProduct") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"),
        s"$name contains an all-pairs operator:\n$plan")
    }
  }

  test("flagship entry returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }
}
