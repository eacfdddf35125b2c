package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.io.Layout

/** Physical layout at scale: bucketed co-located joins must plan without a
  * shuffle; partitioned layouts must prune at the directory level. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketing equi-join plans with zero shuffle exchanges") {
    val a = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("va"))
    val b = spark.range(1000).select($"id".as("k"), ($"id" * 3).as("vb"))
    Layout.writeBucketed(a, "bkt_a", 4, Seq("k"))
    Layout.writeBucketed(b, "bkt_b", 4, Seq("k"))
    val joined = Layout.readTable(spark, "bkt_a")
      .join(Layout.readTable(spark, "bkt_b"), Seq("k"))
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, "bucketed join must not shuffle either side")
    assert(joined.count() == 1000)
  }

  test("partitioned parquet write prunes partitions under an equality filter") {
    val dir = Files.createTempDirectory("layout_part").toString + "/t"
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("c", 4)).toDF("cat", "v")
    Layout.writePartitioned(df, dir, Seq("cat"))
    val read = spark.read.parquet(dir).where($"cat" === "b")
    val scanDesc = read.queryExecution.executedPlan.toString()
    assert(scanDesc.contains("PartitionFilters") &&
      scanDesc.contains("cat#") && scanDesc.contains("= b)"),
      s"expected partition filter in plan:\n$scanDesc")
    assert(read.collect().map(_.getAs[Int]("v")).toSeq == Seq(3))
  }
}
