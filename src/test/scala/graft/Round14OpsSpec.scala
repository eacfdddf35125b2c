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

  // Independent BigInt recount of the day-of-week eta^2 from collected
  // daily counts — plain per-group loops, not the engine's cleared-
  // denominator grid algebra.
  test("q403 eta^2 matches a BigInt driver recount") {
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = SparkEntry.queries("q403_dow_eta2")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1).foreach { case (g, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val q = rows.map(r => BigInt(r._3) * r._3).sum
      val sst = n * q - s * s
      val byDow = rows.groupBy(r => (r._2 + 4) % 7)
      val t = byDow.values.map { grp =>
        val sg = grp.map(r => BigInt(r._3)).sum
        (n * sg * sg) / grp.length // per-group floor, the engine's convention
      }.sum
      val ssb = (t - s * s).max(BigInt(0)) // engine clamps the floor dip
      val r = out(g)
      assert(r.getAs[Long]("n_days") == n.toLong, s"$g n_days")
      assert(r.getAs[Long]("sst_n") == sst.toLong, s"$g sst")
      assert(r.getAs[Long]("ssb_n") == ssb.toLong, s"$g ssb")
      val want = if (sst == 0) None else Some(((ssb * 1000000) / sst).toLong)
      val got = if (r.isNullAt(r.fieldIndex("eta2_ppm"))) None
        else Some(r.getAs[Long]("eta2_ppm"))
      assert(got == want, s"$g eta2")
      // eta^2 is a variance fraction: 0 <= ssb <= sst
      assert(ssb >= 0 && ssb <= sst, s"$g bounds")
    }
  }

  // The floor-dip clamp: a fixture where the per-group floored SSB terms
  // sum to one unit BELOW s² (true SSB ≈ 0) must read ssb_n = 0, not -1.
  // Construction (review finding): dow groups of sizes 3 and 7 with
  // counts (2,1,1) and (3,1,1,1,1,1,1) → s=13, q=21, sst = 10·21−169 =
  // 41, t = (10·16 div 3) + (10·81 div 7) = 53+115 = 168 = s²−1.
  test("q403 clamps the per-group floor dip at ssb_n = 0") {
    import spark.implicits._
    // days 0,7,14 land on one dow; 1,8,15,22,29,36,43 on another
    val days = Seq(0L, 0L, 7L, 14L) ++ // counts 2,1,1
      (Seq(1L, 1L, 1L, 8L, 15L, 22L, 29L, 36L, 43L)) // counts 3,1,1,1,1,1,1
    val rel = days.map(d => ("g", d)).toDF("event_type", "day")
    val r = graft.queries.ForecastQueries.dowEta2(rel).head()
    assert(r.getAs[Long]("n_days") == 10L)
    assert(r.getAs[Long]("sst_n") == 41L)
    assert(r.getAs[Long]("ssb_n") == 0L, s"clamp missing: $r")
    assert(r.getAs[Long]("eta2_ppm") == 0L)
  }

  // Independent recount of the assortativity signed r^2 from the edge
  // list via plain maps (degree counting + textbook Pearson clearings).
  test("q404 assortativity matches a BigInt driver recount") {
    val edges = graft.queries.CoPurchase.purchaseEdges(spark, sf)
      .select(col("c"), col("p")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val dc = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dp = edges.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val xs = edges.map { case (c, p) => (BigInt(dc(c)), BigInt(dp(p))) }
    val m = BigInt(xs.length)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map { case (x, y) => x * y }.sum
    val sxx = xs.map { case (x, _) => x * x }.sum
    val syy = xs.map { case (_, y) => y * y }.sum
    val num = m * sxy - sx * sy
    val den = (m * sxx - sx * sx) * (m * syy - sy * sy)
    val want = if (den == 0) None
      else Some((num.signum * num * num * 10000 / den).toLong)
    val out = SparkEntry.queries("q404_assortativity")(spark, sf).head()
    assert(out.getAs[Long]("n_edges") == m.toLong)
    val got = if (out.isNullAt(out.fieldIndex("assort_bp_signed"))) None
      else Some(out.getAs[Long]("assort_bp_signed"))
    assert(got == want)
  }

  // Vocab-growth recount: collected token first-seen map + quarter
  // thresholds recomputed driver-side; also asserts the curve's
  // structural invariants (monotone vocab, quarter 4 covers everything).
  test("q405 vocab growth matches a driver recount and is monotone") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ids = docs.map(_._1)
    val (lo, hi) = (ids.min, ids.max)
    val toks = docs.flatMap { case (id, t) =>
      t.toLowerCase.split("\\W+").filter(_.nonEmpty).map(id -> _) }
    val firstSeen = toks.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val out = SparkEntry.queries("q405_vocab_growth")(spark, sf).collect()
    assert(out.length == 4)
    (1 to 4).foreach { qq =>
      val t = lo + ((hi - lo + 1) * qq) / 4 - 1
      val r = out(qq - 1)
      assert(r.getAs[Long]("quarter") == qq.toLong)
      assert(r.getAs[Long]("doc_id_max") == t)
      assert(r.getAs[Long]("n_docs") == ids.count(_ <= t).toLong)
      assert(r.getAs[Long]("n_occurrences") == toks.count(_._1 <= t).toLong)
      assert(r.getAs[Long]("vocab") ==
        firstSeen.values.count(_ <= t).toLong)
    }
    val vocabs = out.map(_.getAs[Long]("vocab"))
    assert(vocabs.zip(vocabs.tail).forall { case (a, b) => a <= b })
    assert(out.map(_.getAs[Long]("new_vocab")).sum == vocabs.last)
    assert(out(3).getAs[Long]("vocab") == firstSeen.size.toLong)
  }

  // Entropy census recount: byte histogram from the payload heads via
  // the same deterministic payload (encode(text)), entropy re-derived
  // with the Ilog2 JVM fold — and the information-theoretic bound
  // h <= ilog2(V)·T checked per class.
  test("q406 payload entropy matches a driver recount") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[Int, Long]
    docs.foreach { t =>
      val bytes = t.getBytes("UTF-8").take(64)
      bytes.foreach { b => val v = b & 0xff
        counts(v) = counts.getOrElse(v, 0L) + 1L }
    }
    val byCls = counts.toSeq.groupBy(_._1 / 16)
    val out = SparkEntry.queries("q406_payload_entropy")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.keySet == byCls.keySet.map(_.toLong))
    byCls.foreach { case (cls, vs) =>
      val t = vs.map(_._2).sum
      val sx = vs.map { case (_, c) =>
        BigInt(c) * graft.functions.Ilog2.impl(c) }.sum
      val h = BigInt(t) * graft.functions.Ilog2.impl(t) - sx
      val r = out(cls.toLong)
      assert(r.getAs[Long]("n_bytes") == t, s"cls $cls bytes")
      assert(r.getAs[Long]("n_values") == vs.length.toLong, s"cls $cls values")
      assert(r.getAs[Long]("h_xlx") == h.toLong, s"cls $cls h")
      assert(r.getAs[Long]("bits_per_byte_fp16") == (h / t).toLong)
      assert(h >= 0 && (h / t) <= 8L * 65536L, s"cls $cls bound")
    }
  }

  // Brier/Murphy recount in BigInt from the raw (bin, outcome) pairs —
  // per-term, not the engine's grid algebra — plus the decomposition
  // identity brier ≈ rel − res + unc to the per-bin floor noise
  // (≤ 1 ppm per non-empty bin on each floored term).
  test("q407 Brier decomposition matches a BigInt recount and the Murphy identity") {
    val pairs = graft.io.Tables.documents(spark, sf).select(
        expr("least((length(text) - length(replace(text, ' the ', ''))) div 5, 10)")
          .as("k"),
        (col("lang") === "en").cast("long").as("o"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = BigInt(pairs.length)
    val c = BigInt(pairs.map(_._2).sum)
    val grid = pairs.groupBy(_._1).map { case (k, g) =>
      (BigInt(k), BigInt(g.length), BigInt(g.map(_._2).sum)) }.toSeq
    val bnum = grid.map { case (k, nk, ck) =>
      ck * (k - 10) * (k - 10) + (nk - ck) * k * k }.sum
    val relnum = grid.map { case (k, nk, ck) =>
      val d = k * nk - 10 * ck; d * d / nk }.sum
    val resnum = grid.map { case (_, nk, ck) =>
      val d = n * ck - c * nk; d * d / nk }.sum
    val out = SparkEntry.queries("q407_brier_decomposition")(spark, sf).head()
    val brier = (bnum * 1000000 / (100 * n)).toLong
    val rel = (relnum * 1000000 / (100 * n)).toLong
    val res = (resnum * 1000000 / (n * n * n)).toLong
    val unc = (c * (n - c) * 1000000 / (n * n)).toLong
    assert(out.getAs[Long]("n") == n.toLong)
    assert(out.getAs[Long]("o_bar_ppm") == (c * 1000000 / n).toLong)
    assert(out.getAs[Long]("brier_ppm") == brier)
    assert(out.getAs[Long]("rel_ppm") == rel)
    assert(out.getAs[Long]("res_ppm") == res)
    assert(out.getAs[Long]("unc_ppm") == unc)
    // Murphy: brier = rel − res + unc, up to the floors. Each floored
    // unit lost in relnum is worth 10⁶/(100N) ppm of rel (the dominant
    // noise); resnum units are 10⁶/N³ and the final floors ≤ 1 ppm each.
    val relUnitPpm = (BigInt(1000000) / (100 * n)).toLong + 1
    assert(math.abs(brier - (rel - res + unc)) <=
      grid.size * relUnitPpm + 3L,
      s"identity violated: $brier vs ${rel - res + unc}")
  }

  // Vocabulary register: exactly-once emission at first arrival, state
  // survives across micro-batches (a second-arrival token is silent).
  test("vocabRegister emits each token once with its first-batch min doc_id") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.TokDoc]
    val q = Streaming.vocabRegister(mem.toDS())
      .writeStream.format("memory").queryName("vocab_reg")
      .outputMode("append").start()
    try {
      mem.addData(Streaming.TokDoc("alpha", 7L), Streaming.TokDoc("alpha", 3L),
        Streaming.TokDoc("beta", 5L))
      q.processAllAvailable()
      mem.addData(Streaming.TokDoc("alpha", 1L), Streaming.TokDoc("gamma", 9L))
      q.processAllAvailable()
      val rows = spark.table("vocab_reg").collect()
        .map(r => (r.getAs[String]("tok"), r.getAs[Long]("first_doc"))).toSet
      // alpha re-arrives in batch 2 with a SMALLER id — the register must
      // stay silent (first-arrival semantics; the cert's staging makes
      // the first batch hold the true min, this unit pins the semantics)
      assert(rows == Set(("alpha", 3L), ("beta", 5L), ("gamma", 9L)))
    } finally q.stop()
  }
}
