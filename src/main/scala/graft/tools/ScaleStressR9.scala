package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis

/** Dev-only 100× scale stress for the ROUND-8/9 info-theory training path
  * and the Holt–Winters sorted-run fold — the two probes the round-8
  * verdict asked for:
  *
  *  1. q272's chi-square contingency grid is |langs| × |candidate vocab|
  *     (`InfoQueries.contingencyOf`): the claim is that it is VOCABULARY-
  *     bounded, with the candidate floor (df ≥ 5, df < n) keeping margins
  *     positive. At 100× corpus with DISJOINT per-replica vocabularies
  *     (the ScaleStress100 replica trick: every token suffixed by its
  *     replica index), per-replica document frequencies are unchanged, so
  *     the surviving candidate set — and therefore the grid — must grow
  *     EXACTLY 100× while |langs| stays fixed. Super-linear growth would
  *     indict the candidate floor's interaction with corpus growth.
  *
  *  2. `Ewma.holtWinters`'s sorted-run fold claims O(m + 2) state per key
  *     and one partition scan regardless of key count: at 100× KEYS
  *     (event_type replicated with disjoint suffixes, per-key series
  *     identical to base) output rows must be exactly 100× and runtime
  *     ~linear — the 100 TB shape where the key space, not the series
  *     length, carries the scale.
  *
  * Emits one JSON line per stage and a final summary (band [95, 105]) —
  * the committed `SCALESTRESS_r9.json` artifact, companion to r7/r8/r8b.
  */
object ScaleStressR9 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def stage(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      println(s"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9},"rows":$n}""")
      n
    }

    // ---- 1) chi-square contingency grid (q272's training shape) --------
    val base = graft.io.Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"))
    val baseN = base.count()
    // disjoint vocab per replica; the LABEL space (lang) stays fixed —
    // labels are bounded in reality, vocabulary is not
    def replica(df: DataFrame) = df.select(
      (col("rep") * baseN + col("doc_id")).as("doc_id"),
      regexp_replace(col("text"), lit("(\\w+)"),
        concat(lit("$1r"), col("rep"))).as("text"),
      col("lang"))
    val doc1 = replica(base.withColumn("rep", lit(0L))).localCheckpoint(true)
    val doc100 = {
      val b = replica(base.crossJoin(broadcast(spark.range(reps).toDF("rep"))))
        .repartition(64)
        .localCheckpoint(true)
      stage("build corpus x100")(b.count())
      b
    }

    // the q272 contingency shape (InfoQueries.contingencyOf), rebuilt from
    // the same public primitives: doc-level presence, df-floored candidate
    // vocabulary, |langs| x |candidates| zero-cell grid
    def grid(docs: DataFrame): Long = {
      val dp = docs.select(col("lang"), col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
        .localCheckpoint(true)
      val n = docs.agg(count(lit(1)).as("n"))
      val dl = docs.groupBy(col("lang")).agg(count(lit(1)).as("d_l"))
      val cand = dp.groupBy(col("tok")).agg(count(lit(1)).as("d_t"))
        .join(broadcast(n), expr("d_t >= 5") && col("d_t") < col("n"))
      val a = dp.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("a"))
      broadcast(dl).crossJoin(broadcast(cand))
        .join(a, Seq("lang", "tok"), "left").na.fill(0L, Seq("a"))
        .count()
    }
    val g1 = stage("chi2 contingency grid x1")(grid(doc1))
    val g100 = stage("chi2 contingency grid x100")(grid(doc100))

    // ---- 2) Holt-Winters sorted-run fold at 100x keys -------------------
    val daily = graft.io.Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    def hw(keyed: DataFrame): Long =
      graft.operators.Ewma.holtWinters(keyed, "k", "day", "x", m = 7)
        .queryExecution.toRdd.count()
    val k1 = stage("holt-winters x1 keys")(
      hw(daily.select(col("event_type").as("k"), col("day"), col("x"))))
    val k100 = stage(s"holt-winters x100 keys") {
      val big = daily.crossJoin(broadcast(spark.range(reps).toDF("rep")))
        .select(concat(col("event_type"), lit("r"), col("rep")).as("k"),
          col("day"), col("x"))
        .repartition(64)
        .localCheckpoint(true)
      hw(big)
    }

    val gGrowth = g100.toDouble / g1
    val kGrowth = k100.toDouble / k1
    val lo = 95.0
    val hi = 105.0
    val linear = gGrowth >= lo && gGrowth <= hi && kGrowth >= lo && kGrowth <= hi
    println(s"""{"summary":"round-9 info-theory/holt-winters growth at 100x disjoint replicas","chi2_grid":${f"$gGrowth%.3f"},"hw_rows":${f"$kGrowth%.3f"},"band":[$lo,$hi],"linear":$linear}""")
    spark.stop()
    if (!linear) sys.exit(1)
  }
}
