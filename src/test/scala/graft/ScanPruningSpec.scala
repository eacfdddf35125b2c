package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec

/** Scan-level scale guarantees, enforced as regression tests: column
  * pruning (`ReadSchema` carries only referenced columns) and predicate
  * pushdown (`PushedFilters` reaches the parquet reader) must survive
  * future edits. A scan that silently starts reading all 11 lineitem
  * columns for a 5-column aggregate, or re-reads a year of orders because
  * a date filter stopped pushing, is exactly the regression that is
  * invisible at sf0.01 and dominates at 100 TB — so it fails CI here.
  *
  * Uses `queryExecution.sparkPlan` (the pre-AQE physical plan): AQE wraps
  * `executedPlan` in an opaque AdaptiveSparkPlanExec, but scans and their
  * pushdown are fixed at initial planning.
  */
class ScanPruningSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }

  private def scanOf(df: DataFrame, table: String): FileSourceScanExec =
    scans(df).find(_.relation.location.rootPaths.exists(_.toString.contains(table)))
      .getOrElse(fail(s"no parquet scan of $table in plan"))

  test("q02 (TPC-H Q1 shape): lineitem scan prunes 11 columns to the 5 used") {
    val scan = scanOf(queries.RelationalQueries.q02_pricing_summary(spark, sfDir), "lineitem")
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("l_quantity", "l_extendedprice", "l_discount",
      "l_returnflag", "l_linestatus"),
      s"lineitem scan reads $read — column pruning regressed")
  }

  test("q62 (EXISTS date window): the quarter filter reaches the orders scan") {
    val scan = scanOf(queries.TpchQueries.q62_order_priority(spark, sfDir), "orders")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(o_orderdate") &&
      pushed.contains("LessThan(o_orderdate"),
      s"orders scan pushed only: $pushed — the date window is no longer " +
        "pruning the scan and a year of orders would be read at scale")
  }

  test("q16 (star join): every scan pushes IsNotNull on its join key") {
    val allScans = scans(SparkEntry.entry(spark))
    assert(allScans.nonEmpty)
    allScans.foreach { scan =>
      val pushed = scan.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains("IsNotNull"),
        s"scan of ${scan.relation.location.rootPaths.mkString} pushes no " +
          s"join-key null filter (PushedFilters: $pushed)")
    }
  }

  test("q86 (TPC-H Q6): all four predicates push to the lineitem scan") {
    val scan = scanOf(queries.TpchQueries.q86_forecast_revenue(spark, sfDir), "lineitem")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount", "LessThanOrEqual(l_discount",
        "LessThan(l_quantity").foreach { f =>
      assert(pushed.contains(f),
        s"q86 scan is missing pushed filter $f (PushedFilters: $pushed) — " +
          "the no-join Q6 aggregate would read the whole fact table at scale")
    }
  }

  test("q79 (curation): the widened documents scan reads only doc_id and text") {
    val scan = scanOf(queries.CurationQueries.q79_curation_pipeline(spark, sfDir), "documents")
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read == Set("doc_id", "text"),
      s"documents scan reads $read — lang/source/len columns should be pruned")
  }

  test("q104 (partitioned write): the read-back scan partition-prunes to flag R") {
    val scan = scanOf(
      queries.RelationalQueries.q104_partitioned_scan(spark, sfDir), "part_rt_")
    val pf = scan.partitionFilters.map(_.toString).mkString(";")
    assert(pf.contains("l_returnflag") && pf.contains("R"),
      s"no partition filter on the partitioned read-back (got: $pf)")
    // the pruning is REAL, not cosmetic: every file selected for the scan
    // lives under the matching partition directory
    val files = scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .flatMap(_.files).map(_.getPath.toString)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("l_returnflag=R")),
      s"scan selected non-matching partition files: ${files.filterNot(_.contains("l_returnflag=R")).take(3)}")
  }
}
