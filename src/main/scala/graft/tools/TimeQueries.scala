package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: time a comma-separated list of registered queries at a given
  * sf dir (defaults mirror Bench: local[32], 32 shuffle partitions, the
  * toRdd action so projections aren't pruned). For iterating on one
  * query's plan without paying a full Bench run. */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q35_topk_ivf_kmeans"))
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect() // JVM warmup
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, d).queryExecution.toRdd.count()
      println(f"$n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$rows")
    }
    spark.stop()
  }
}
