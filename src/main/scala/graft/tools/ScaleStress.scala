package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Dedup

/** Dev-only stress run: the MinHash-LSH dedup pipeline over a 20×-exploded
  * documents table (100k docs), to confirm the per-stage scaling is linear
  * in corpus size — i.e. candidate generation stays bucket-bounded and no
  * stage degenerates to all-pairs. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/documents_x20.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet(path)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("docs")(doc.count())
    time("exact dedup")(Dedup.dedupExact(doc, "text", "doc_id").count())
    time("lsh candidates")(Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4).count())
    time("simhash neardup")(Dedup.simhashNearDupPairs(doc, "text", "doc_id", 32, 8, 3).count())
    spark.stop()
  }
}
