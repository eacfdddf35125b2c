package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: when a dimension side carries a
  * selective filter, Catalyst's `InjectRuntimeFilter` can build a bloom
  * filter from it and push a `might_contain` probe into the FACT side's
  * scan — rows that cannot join are dropped before the shuffle. At 100 TB
  * this is the difference between shuffling the whole fact table and
  * shuffling the ~1/25 of it that survives the dimension predicate.
  *
  * The default thresholds (creation side ≤ 10 MB after filtering,
  * application side ≥ 10 GB scan) are sized for cluster-scale data, so the
  * rule deliberately does NOT fire on sf0.01 testdata — this spec lowers
  * them to zero to prove the engine's join shapes are eligible (equi-join,
  * selective creation side, shuffle on the application side), i.e. that at
  * production scale the filter injects with stock configuration.
  */
class RuntimeFilterSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom probe into the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // creation side must fall BELOW its threshold, application side ABOVE
      // its own — relax both so the tiny testdata qualifies
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // a broadcast join re-plans the probe away (broadcast IS the filter);
      // force the shuffle-join regime the thresholds target at scale
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.io.Tables.lineitem(spark, sfDir)
      val part = graft.io.Tables.part(spark, sfDir)
        .where(col("p_brand") === "Brand#23")
      val joined = li.join(part, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand")).agg(sum(col("l_quantity")).as("qty"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("might_contain"),
        s"no bloom runtime filter injected on the fact side:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
