package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.Dedup

/** Dev-only micro benchmark for the dedup pipeline stages (not part of the
  * driver contract). */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val doc = Tables.documents(spark, d)
    println(s"doc partitions: ${doc.rdd.getNumPartitions}")
    time("scan")(doc.count())
    val sh = Dedup.docShingles(doc, "text", "doc_id")
    time("shingles+distinct")(sh.count())
    val sig = Dedup.minhashSignatures(sh, 8)
    time("minhash sigs")(sig.count())
    time("lsh pairs")(Dedup.lshCandidatePairs(sig, 4, 2).count())
    time("full q23 again")(Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4).count())

    // q24 variant: fully uncached — rely on AQE + exchange reuse
    val sh2 = Dedup.docShingles(doc, "text", "doc_id")
    val pairs2 = Dedup.lshCandidatePairs(Dedup.minhashSignatures(sh2, 8), 4, 2)
    time("jaccard fully uncached")(Dedup.ngramJaccard(sh2, pairs2).count())
    time("jaccard uncached again")(Dedup.ngramJaccard(sh2, pairs2).count())
    spark.stop()
  }
}
