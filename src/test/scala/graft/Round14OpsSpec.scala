package graft

import org.apache.spark.sql.functions._

/** Round-14 operator tests: the ANN index-state recovery cert (q400) and
  * its stateful cell-directory counter. */
class Round14OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  // The recovery cert's full pipeline — literal-centroid assignment,
  // kill-and-resume run, max(seq) readout — must land on EXACTLY the
  // batch cell-quality frame (q262: Ivf.fit + Ivf.assign + NearestCell).
  // This certifies two things at once: the literal-map assignment follows
  // the NearestCell tie convention (first max = lower cell), and the
  // recovered directory counter agrees with a from-scratch count.
  test("q400 recovery output equals the batch q262 cell-quality frame") {
    val rec = SparkEntry.queries("q400_recovery_ivf")(spark, sf)
      .collect().map(_.toString).toSeq
    val batch = SparkEntry.queries("q262_ivf_cell_quality")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(rec.nonEmpty && rec == batch)
  }

  // The counter's state-sensitivity claim: numbering within a cell is
  // cumulative in vec_id order within each batch and CONTINUES across
  // micro-batches (max(seq) = member count only when state survives —
  // the recovery cert reads exactly that).
  test("cellDirectory numbering continues across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.CellVec]
    val q = Streaming.cellDirectory(mem.toDS())
      .writeStream.format("memory").queryName("cell_dir")
      .outputMode("append").start()
    try {
      // batch 1: cell 0 arrives out of vec_id order — numbered sorted
      mem.addData(Streaming.CellVec(0L, 5L, 10L),
        Streaming.CellVec(0L, 2L, 11L), Streaming.CellVec(1L, 9L, 12L))
      q.processAllAvailable()
      // batch 2: cell 0 continues at 3, not 1
      mem.addData(Streaming.CellVec(0L, 7L, 13L))
      q.processAllAvailable()
      val rows = spark.table("cell_dir").collect()
        .map(r => (r.getAs[Long]("cell"), r.getAs[Long]("vec_id"),
          r.getAs[Long]("seq"))).toSet
      assert(rows == Set((0L, 2L, 1L), (0L, 5L, 2L), (0L, 7L, 3L),
        (1L, 9L, 1L)))
    } finally q.stop()
  }

  // nProbe = 8 probes every cell of the k = 8 quantizer, so that sweep
  // level IS brute force — recall@10 must be exactly 1.0 for every
  // query. An in-band anchor: if cell assignment and the probe routing
  // ever disagree with the exact ranking, this is the first thing to go.
  test("q402 probe curve: nProbe=8 row is brute-force-equal (recall 1.0)") {
    val out = SparkEntry.queries("q402_ivf_probe_curve")(spark, sf)
      .where(col("nprobe") === 8L).collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_hits") == 10L &&
        r.getAs[Double]("recall_at_10") == 1.0,
        s"query ${r.getAs[Long]("query_id")} not exact at nProbe=8: $r")
    }
    // and the curve is monotone in nProbe per query
    val curve = SparkEntry.queries("q402_ivf_probe_curve")(spark, sf)
      .collect().map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("nprobe"),
        r.getAs[Long]("n_hits")))
      .groupBy(_._1).values
    curve.foreach { rows =>
      val hits = rows.sortBy(_._2).map(_._3)
      assert(hits.zip(hits.tail).forall { case (a, b) => a <= b },
        s"recall not monotone in nProbe: ${rows.toSeq.sortBy(_._2)}")
    }
  }

  // Independent BigInt-RATIONAL recount of Fleiss' kappa from the
  // definition (per-subject P_i, then P-bar and P_e as exact fractions)
  // — a different route than the engine's cleared-denominator single
  // formula, so a shared algebra slip cannot pass both.
  test("q401 Fleiss kappa matches a BigInt rational recount from the definition") {
    import org.apache.spark.sql.functions.{expr, when, length}
    val out = SparkEntry.queries("q401_fleiss_kappa")(spark, sf).head()
    val aCount = expr("length(text) - length(replace(text, 'a', ''))")
    val tiers = graft.io.Tables.documents(spark, sf).select(
        when(col("n_chars") < 200, 0).when(col("n_chars") < 350, 1)
          .otherwise(2).as("r1"),
        when(graft.llm.TextAnalysis.wsTokenCount(col("text")) < 40, 0)
          .when(graft.llm.TextAnalysis.wsTokenCount(col("text")) < 70, 1)
          .otherwise(2).as("r2"),
        when(aCount < 20, 0).when(aCount < 35, 1).otherwise(2).as("r3"))
      .collect().map(r => Seq(r.getInt(0), r.getInt(1), r.getInt(2)))
    val n = BigInt(tiers.length)
    val counts = tiers.map(rs => (0 to 2).map(j => BigInt(rs.count(_ == j))))
    // P-bar = sum_i (sum_j n_ij^2 - 3) / (6N); P_e = sum_j (C_j / 3N)^2
    val pbarNum = counts.map(c => c.map(x => x * x).sum - 3).sum // over 6N
    val cj = (0 to 2).map(j => counts.map(_(j)).sum)
    val peNum = cj.map(c => c * c).sum // over 9N^2
    // kappa = (pbar - pe) / (1 - pe) with denominators cleared to 18N^2
    val kNum = pbarNum * 3 * n - peNum * 2
    val kDen = 18 * n * n - peNum * 2
    def ppm(num: BigInt, den: BigInt): Long = ((num * 1000000) / den).toLong
    assert(out.getAs[Long]("n") == n.toLong)
    assert(out.getAs[Long]("pbar_ppm") == ppm(pbarNum, 6 * n))
    assert(out.getAs[Long]("pe_ppm") == ppm(peNum, 9 * n * n))
    assert(out.getAs[Long]("kappa_ppm") == ppm(kNum, kDen))
    // bounded and, on three correlated size tiers, positive
    assert(out.getAs[Long]("kappa_ppm") > 0L &&
      out.getAs[Long]("kappa_ppm") <= 1000000L)
  }
}
