package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.Dedup

/** Dev-only stage-level probe for the round-15 optimization pass: times the
  * internal stages of the most expensive batch queries so the optimization
  * targets the stage that actually costs, not the one that looks expensive
  * (guide §1 "measure first"). Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args(1).split(",").toSet else Set.empty[String]
    def on(k: String): Boolean = which.isEmpty || which(k)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $n%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$r")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    if (on("q142")) {
      val fpB = Dedup.simhash(Tables.documents(spark, d), "text", "doc_id", 64)
      time("q142 fp build")(fpB.count())
      val fp = fpB.localCheckpoint(true)
      // raw join fan-out: candidate rows before the distinct/filter
      val nBands = 8; val bandBits = 8
      val bandCols = (0 until nBands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
      }
      val exact = fp.select(col("doc_id"), col("simhash"),
          explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      time("q142 bucket-size histogram")(
        { exact.groupBy(col("band"), col("bkey")).count()
            .agg(max(col("count")), sum(col("count") * col("count")))
            .show(); -1L })
      val index = exact.select(col("band"), col("bkey"),
        col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
      val flips = lit(0L) +: (0 until bandBits).map(i => lit(1L << i))
      val probes = exact
        .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
          col("band"), explode(array(flips.map(col("bkey").bitwiseXOR): _*)).as("bkey"))
      time("q142 raw candidate rows")(
        probes.join(index, Seq("band", "bkey"))
          .where(col("doc_a") < col("doc_b")).count())
      time("q142 pairs from fp (noop)")(noop(
        Dedup.simhashMultiProbePairsFromFp(fp, 64, 8, 10)))
      time("q142 pairs+sort (noop)")(noop(
        Dedup.simhashMultiProbePairsFromFp(fp, 64, 8, 10)
          .orderBy(col("doc_a"), col("doc_b"))))
    }

    if (on("q205")) {
      val ev = Tables.events(spark, d).select(col("user_id"),
        unix_millis(col("ts")).as("tsm"),
        round(abs(col("value")) * 10000).cast("long").as("x"))
      time("q205 events scan")(ev.count())
      val grid0 = graft.operators.Resample.toGrid(ev, "user_id", col("tsm"),
        3600000L, Seq("n_obs" -> count(lit(1)), "x_sum" -> sum(col("x"))))
        .withColumn("n_obs", coalesce(col("n_obs"), lit(0L)))
      time("q205 grid (noop, no ckpt)")(noop(grid0))
      val t0 = System.nanoTime()
      val grid = grid0.localCheckpoint(true)
      println(f"PROBE q205 grid localCheckpoint        ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=-1")
      time("q205 impute (noop)")(noop(
        graft.operators.Impute.fill(grid, "user_id", Seq(col("tick_ms")), "x_sum")))
      time("q205 impute+sort (noop)")(noop(
        graft.operators.Impute.fill(grid, "user_id", Seq(col("tick_ms")), "x_sum")
          .orderBy(col("user_id"), col("tick_ms"))))
      grid.unpersist()
    }

    if (on("q180")) {
      val docs = Tables.widen(Tables.documents(spark, d))
      val verified = graft.llm.SetJoin.jaccardPairs(docs, "doc_id", "text", 1L, 2L)
        .select(col("doc_a"), col("doc_b"))
      time("q180 verified pairs (noop)")(noop(verified))
      val v = verified.localCheckpoint(true)
      time("q180 components from pairs")(noop(
        graft.operators.ConnectedComponents.components(v, "doc_a", "doc_b")))
      time("q180 full (toRdd)")(
        graft.SparkEntry.queries("q180_dedup_verified")(spark, d)
          .queryExecution.toRdd.count())
    }

    if (on("q230")) {
      val pairs = {
        val op = Tables.lineitem(spark, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
        op.as("a").join(op.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
          .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      }
      time("q230 edges")(pairs.count())
      time("q230 perNode (noop)")(noop(
        graft.operators.Triangles.perNode(pairs, "u", "v")))
    }

    if (on("q277")) {
      val el = Dedup.weightedShingles(Tables.documents(spark, d), "text", "doc_id")
      time("q277 weighted shingles")(el.count())
      val elC = el.localCheckpoint(true)
      val pairs = Dedup.lshCandidatePairs(
        Dedup.minhashSignatures(elC, 8), 2, 4)
      time("q277 candidate pairs")(pairs.count())
      val pairsC = pairs.localCheckpoint(true)
      time("q277 verify (noop)")(noop(
        Dedup.ngramJaccard(elC, pairsC).where(col("jaccard") >= 0.5)))
    }

    if (on("q342")) {
      val ev = Tables.events(spark, d).select(col("event_type").as("g"),
        col("event_id").cast("long").as("eid"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      time("q342 full (noop)")(noop(
        graft.queries.ResamplingQueries.bootstrapSe(ev, 32)))
    }

    spark.stop()
  }
}
