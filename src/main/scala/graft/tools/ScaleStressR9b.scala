package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.TextAnalysis

/** Dev-only 100× scale stress for the round-9 additions:
  *
  *  1. q298's exact KS statistic: the per-distinct-value frame is the
  *     only corpus-growth-sensitive stage (the prefix sum and the final
  *     max are one pass each over it). At 100× events with DISJOINT
  *     per-replica value ranges (value + 1000·replica — base values live
  *     in [0, 560.21]), the distinct-value frame must grow EXACTLY 100×
  *     and the range-partitioned prefix sum must stay ~linear — the
  *     100 TB shape where the value domain, not the row count, carries
  *     the cumulative work.
  *
  *  2. q300's TextRank graph: the claim is CONTENT-bounded, not
  *     corpus-bounded — under 100× corpus replication with the SAME
  *     token space, the freq ≥ 20 vocabulary and the distinct edge set
  *     must stay EXACTLY constant (only per-token counts scale), so the
  *     power iteration runs on an unchanged graph no matter how large
  *     the corpus grows.
  *
  * Emits one JSON line per stage and a final summary — the committed
  * `SCALESTRESS_r9b.json` artifact, companion to r9 (chi2/Holt-Winters).
  */
object ScaleStressR9b {
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

    // ---- 1) q298 KS: distinct-value frame + prefix sum -----------------
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "view"))
      .select(col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
      .localCheckpoint(true)

    def ksRows(e: DataFrame): Long = {
      val pv = e.groupBy(col("value"))
        .agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb"))
        .withColumn("g", lit(0))
      val ca = graft.operators.RunningTotal.grouped(pv, "g", Seq("value"),
        "na", "cum_a", groupCountHint = Some(1L))
      val cb = graft.operators.RunningTotal.grouped(ca, "g", Seq("value"),
        "nb", "cum_b", groupCountHint = Some(1L))
      cb.queryExecution.toRdd.count()
    }

    val v1 = stage("ks value frame x1")(ksRows(ev))
    val big = ev.crossJoin(
        spark.range(reps).select(col("id").cast("double").as("r")))
      .select((col("value") + col("r") * 1000.0).as("value"),
        col("ia"), col("ib"))
      .localCheckpoint(true)
    val v100 = stage(s"ks value frame x$reps")(ksRows(big))

    // ---- 2) q300 TextRank: vocab + edges under corpus replication ------
    val doc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)

    def graphSize(docs: DataFrame): (Long, Long) = {
      val byPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val tk = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "u")))
      val bg = tk.withColumn("v", lead(col("u"), 1).over(byPos))
        .where(col("v").isNotNull && col("u") =!= col("v"))
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val vocab = bg.select(col("u").as("tok"))
        .union(bg.select(col("v").as("tok")))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .where(col("freq") >= 20L)
        .localCheckpoint(true)
      val nv = vocab.count()
      val ne = bg
        .join(vocab.select(col("tok").as("u")), Seq("u"), "left_semi")
        .join(vocab.select(col("tok").as("v")), Seq("v"), "left_semi")
        .distinct().count()
      (nv, ne)
    }

    var g1: (Long, Long) = (0L, 0L)
    stage("textrank graph x1") { g1 = graphSize(doc); g1._1 }
    val docBig = doc.crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("doc_id") + col("r") * 10000000L).as("doc_id"), col("text"))
      .localCheckpoint(true)
    var g100: (Long, Long) = (0L, 0L)
    stage(s"textrank graph x$reps") { g100 = graphSize(docBig); g100._1 }

    val ksGrowth = v100.toDouble / v1 / reps * 100.0
    val vocabRatio = g100._1.toDouble / g1._1
    val edgeRatio = g100._2.toDouble / g1._2
    val ok = ksGrowth >= 95.0 && ksGrowth <= 105.0 &&
      vocabRatio == 1.0 && edgeRatio == 1.0
    println(s"""{"summary":"round-9b KS value-domain growth + TextRank content-bounded graph at ${reps}x","ks_values":$ksGrowth,"vocab_ratio":$vocabRatio,"edge_ratio":$edgeRatio,"band":[95.0,105.0],"linear":$ok}""")
    spark.stop()
  }
}
