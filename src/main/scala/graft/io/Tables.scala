package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver's parquet testdata (`TESTDATA.md`): one parquet
  * per table under `/root/testdata/sf{N}/`. Explicit helpers keep query
  * code terse and make the scan the narrowest thing Catalyst can prune.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Repartition up to the session's parallelism when the source produced
    * fewer splits (e.g. one small parquet file → one partition, which would
    * serialize every per-row-expensive stage built on it). At scale the
    * input already has ≥cores splits and this is a no-op — no shuffle. */
  def widen(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.parquet` stores `ts` as TIMESTAMP(NANOS), which Spark reads
    * only as a raw long (`spark.sql.legacy.parquet.nanosAsLong=true` — set
    * by Verify/Bench). Convert ns→µs with integer division (a double
    * division would lose precision above 2^53 ns) and surface a proper
    * timestamp column.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.LongType
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** Cheap dataset statistics, cached per dataset directory. The kind of
  * bounded metadata probe (one row, one column) that is fine to run once
  * but should never be re-fired per query invocation. */
object Stats {
  private val embDims = new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  /** Width of the fixed-width `embeddings.embedding` column — used to unroll
    * cosine folds into codegen-friendly flat sums. One-row probe, memoized. */
  def embeddingDim(s: SparkSession, dir: String): Int =
    embDims.computeIfAbsent(dir, { _ =>
      import org.apache.spark.sql.functions.{col, size}
      Integer.valueOf(Tables.embeddings(s, dir).select(size(col("embedding"))).head().getInt(0))
    }).intValue()
}
