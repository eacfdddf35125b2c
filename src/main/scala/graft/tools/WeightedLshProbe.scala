package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.Dedup

/** Dev-only probe for q277's weighted-LSH banding selectivity: candidate
  * counts and verify cost per (bands, rowsPerBand) at a given sf. The
  * weighted element relation shares every "tok~1" element across any two
  * docs with overlapping vocabulary, so its signatures are far more
  * similar than the plain set pipeline's — banding needs to be tighter. */
object WeightedLshProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    val el = Dedup.weightedShingles(Tables.documents(spark, d), "text", "doc_id")
      .localCheckpoint(true)
    time("elements")(el.count())
    val sig = Dedup.minhashSignatures(el, 8).localCheckpoint(true)
    time("signatures")(sig.count())
    for ((b, r) <- Seq((4, 2), (2, 4), (1, 8))) {
      val pairs = Dedup.lshCandidatePairs(sig, b, r)
      time(s"pairs b=$b r=$r")(pairs.count())
      val ver = Dedup.ngramJaccard(el, pairs)
      time(s"verified b=$b r=$r")(ver.count())
      time(s"ge 0.5 b=$b r=$r")(ver.where(col("jaccard") >= 0.5).count())
    }
    spark.stop()
  }
}
