package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical-layout helpers for 100 TB tables: bucketing for co-located
  * (shuffle-free) joins and hive-style partitioning for partition pruning.
  *
  * At scale, the fact table is written once bucketed by its join key; every
  * later equi-join on that key then runs with NO exchange on either side
  * (verified by plan in `LayoutSpec`). Time- or category-partitioned
  * layouts let predicate pushdown skip whole directories.
  */
object Layout {

  /** Write a bucketed, bucket-sorted table into the session catalog.
    * Joins between tables bucketed the same way on the same keys need no
    * shuffle (`spark.sql.sources.bucketing.enabled`, on by default). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** Write hive-partitioned parquet: one directory per distinct value of
    * `partitionCols` — equality/range predicates on those columns prune at
    * the directory level before any I/O. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
