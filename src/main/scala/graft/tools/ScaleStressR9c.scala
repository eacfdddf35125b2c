package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.TextAnalysis

/** Dev-only 100× scale stress for the round-9d additions:
  *
  *  1. q305's rank-sum ROC AUC: the only corpus-scaling stage is the
  *     per-doc scan; everything after runs on the per-(scorer, score)
  *     reduced frame, which is SCORE-DOMAIN-bounded — under 100× corpus
  *     replication with the same texts it must stay EXACTLY constant.
  *     Stronger: the tie-averaged AUC is exactly invariant under k-fold
  *     row duplication (the mid-rank identity's +1 terms cancel:
  *     2R⁺ − P(P+1) and 2PN both scale by k², so the truncating div
  *     yields the identical ppm) — the certificate that the metric read
  *     at 100 TB equals the metric read on any uniform sample.
  *
  *  2. q309's sorted-neighborhood blocking: candidates are POSITIONAL —
  *     (w−1) per row regardless of key collisions — so the candidate
  *     count must grow exactly linearly (±window-boundary constant) at
  *     100× rows, never quadratically, even though all 100 replicas of a
  *     doc share the same sort key. The Levenshtein verify after it is
  *     row-local per candidate, so candidate linearity bounds the family.
  *
  * Emits one JSON line per stage and a final summary — the committed
  * `SCALESTRESS_r9c.json` artifact, companion to r9 (chi²/Holt-Winters)
  * and r9b (KS/TextRank).
  */
object ScaleStressR9c {
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

    val doc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .localCheckpoint(true)
    // replica id offset derived from the data, so replicas stay disjoint
    // at ANY scale factor (a fixed 10^7 stride would collide once ids
    // reach it and silently merge replicas)
    val stride = doc.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    val docBig = doc.crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("doc_id") + col("r") * stride).as("doc_id"),
        col("text"), col("lang"), col("n_chars"))
      .localCheckpoint(true)

    // ---- 1) q305 AUC: reduced-frame boundedness + exact invariance -----
    val enPat = TextAnalysis.langProfiles.head._2
    def auc(docs: DataFrame): (Long, Long) = {
      val chars = docs.select(lit("chars_vs_tokens").as("scorer"),
        col("n_chars").as("score"),
        when(TextAnalysis.bpeTokenCount(col("text")) > 56L, 1L)
          .otherwise(0L).as("pos"))
      val stops = docs.select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(regexp_extract_all(lower(col("text")), lit(enPat), lit(0)))
            .cast("long").as("s_en"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tok"))
        .where(col("n_tok") > 0)
        .select(lit("stopwords_vs_lang").as("scorer"),
          expr("1000000 * s_en div n_tok").as("score"), col("pos"))
      val perScore = chars.unionAll(stops)
        .groupBy(col("scorer"), col("score"))
        .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
        .localCheckpoint(true)
      val cum = graft.operators.RunningTotal.grouped(perScore, "scorer",
        Seq("score"), "n_s", "cum_n", groupCountHint = Some(2L))
      val out = cum.groupBy(col("scorer"))
        .agg(sum(col("p_s") * (col("cum_n") * 2 - col("n_s") + 1))
            .as("two_r_pos"),
          sum(col("p_s")).as("pos"), sum(col("n_s")).as("n_all"))
        .withColumn("auc_ppm", expr(
          "(two_r_pos - pos * (pos + 1)) * 1000000" +
            " div (2 * pos * (n_all - pos))"))
        .orderBy(col("scorer"))
        .select(col("auc_ppm")).collect().map(_.getLong(0))
      (perScore.count(), out(0) * 10000000L + out(1)) // packed pair
    }
    var a1: (Long, Long) = (0L, 0L)
    stage("auc reduced frame x1") { a1 = auc(doc); a1._1 }
    var a100: (Long, Long) = (0L, 0L)
    stage(s"auc reduced frame x$reps") { a100 = auc(docBig); a100._1 }

    // ---- 2) q309 SNM: positional candidate linearity --------------------
    def snmCands(docs: DataFrame): Long = {
      val keyed = docs.select(col("doc_id"),
        array_join(slice(TextAnalysis.tokens(col("text")), 1, 4), " ")
          .as("sk"))
      graft.operators.SortedNeighborhood.pairs(keyed, "doc_id", col("sk"),
        w = 5).queryExecution.toRdd.count()
    }
    val c1 = stage("snm candidates x1")(snmCands(doc))
    val c100 = stage(s"snm candidates x$reps")(snmCands(docBig))

    val frameRatio = a100._1.toDouble / a1._1
    val aucEqual = a1._2 == a100._2
    val candGrowth = c100.toDouble / c1 / reps * 100.0
    val ok = frameRatio == 1.0 && aucEqual &&
      candGrowth >= 95.0 && candGrowth <= 105.0
    println(s"""{"summary":"round-9d AUC scale-invariance + SNM candidate linearity at ${reps}x","auc_frame_ratio":$frameRatio,"auc_ppm_equal":$aucEqual,"snm_candidates":$candGrowth,"band":[95.0,105.0],"linear":$ok}""")
    spark.stop()
  }
}
