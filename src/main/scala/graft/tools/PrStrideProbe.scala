package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev A/B probe for the PageRank loop's materialization stride: a
  * synthetic 10M-edge / 500k-node graph (the ScaleStressHarness shape) at
  * a production-grade round count, timed twice (min reported) with the
  * noop-equivalent toRdd.count action. Compares the per-round-checkpoint
  * loop (round ≤15) against checkpoint-every-k on identical data. */
object PrStrideProbe {
  def main(args: Array[String]): Unit = {
    val iters = args.headOption.map(_.toInt).getOrElse(12)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(10000000L)
      .select((col("id") % 500000L).as("src"),
        ((col("id") * 31L + 7L) % 500000L).as("dst"))
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.operators.PageRank.ranksFp(edges, "src", "dst", iters = iters)
        .queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      dt
    }
    val runs = Seq(once(), once())
    println(f"""{"probe":"pr_stride","iters":$iters,"secs_min":${runs.min}%.3f,"runs":[${runs.map(r => f"$r%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
