package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: print formatted physical plans for selected queries so the
  * scale checklist (broadcasts, partial aggs, pushdown, codegen spans) can
  * be audited by eye. */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q02_pricing_summary", "q10_star_schema", "q16_join_multi"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
