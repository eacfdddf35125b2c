package graft

import org.apache.spark.sql.functions._

import graft.queries.{HypothesisCompositionQueries, HypothesisQueries}

/** Round-11 distribution-statistics tests: every statistic in the
  * hypothesis family is recomputed on sf0.001 by an INDEPENDENT
  * driver-side implementation (BigInt arithmetic, the textbook formula
  * rather than the engine's cross-multiplied form) — the DuckDB oracle
  * certifies cross-engine exactness; these certify the MATH and lock
  * the plan shapes (broadcast-only joins, no sort-merge, no cartesian,
  * windows only inside bounded frames). */
class HypothesisSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def events: Array[(String, Long, Long, Long)] =
    graft.io.Tables.events(spark, sf).select(
        col("event_type"),
        expr("cast(round(value * 100) as bigint)"),
        expr("unix_millis(ts) div 86400000"),
        expr("cast(get_json_object(props, '$.k') as long)"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q356: HDR bracket contains the true quantile; registers match") {
    val ev = events.filter(_._2 >= 1)
    val out = HypothesisQueries.q356_hdr_quantiles(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = ev.groupBy(_._1)
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      val p = r.getAs[Long]("p")
      val vs = byType(g).map(_._2)
      // naive register recount
      val reg = vs.groupBy(v => graft.functions.Ilog2.impl(v) / 8192)
      val n = vs.length.toLong
      assert(r.getAs[Long]("n") == n, s"$g/$p n")
      val rank = (p * n + 99) / 100
      var cum = 0L
      val (b, bvs) = reg.toSeq.sortBy(_._1).find { case (_, g2) =>
        cum += g2.length; cum >= rank }.get
      assert(r.getAs[Long]("bucket") == b, s"$g/$p bucket")
      assert(r.getAs[Long]("lo") == bvs.min && r.getAs[Long]("hi") == bvs.max,
        s"$g/$p register bounds")
      // the certified bracket: the true ceiling-rank quantile is inside
      val truth = vs.sorted.apply((rank - 1).toInt)
      assert(truth >= bvs.min && truth <= bvs.max, s"$g/$p bracket")
      // design bound: bucket spans at most a 2^(1/8) ratio
      assert(r.getAs[Long]("width_ppm") <= 90508L, s"$g/$p width")
    }
  }

  test("q358: Friedman matches a textbook BigInt recount") {
    val cells = events.groupBy(e => (e._3, e._1)).view
      .mapValues(_.map(_._2).sum).toMap
    val k = cells.keys.map(_._2).toSet.size
    val complete = cells.groupBy(_._1._1).filter(_._2.size == k)
    val n = complete.size
    // within-block ×2 average ranks
    val r2 = complete.toSeq.flatMap { case (_, m) =>
      val vs = m.toSeq.map { case ((_, g), v) => (g, v) }
      vs.map { case (g, v) =>
        (g, vs.count(_._2 < v).toLong + vs.count(_._2 <= v).toLong + 1L) }
    }
    val r2sum = r2.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val a4 = r2.map(x => BigInt(x._2) * x._2).sum
    val c4 = BigInt(n) * k * (k + 1) * (k + 1)
    val s4 = r2sum.values.map(rj => BigInt(rj - n.toLong * (k + 1)).pow(2)).sum
    val qPpm = ((k - 1) * s4 * 1000000 / (a4 - c4)).toLong
    val out = HypothesisQueries.q358_friedman(spark, sf).collect()
    assert(out.length == k)
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      assert(r.getAs[Long]("r2_sum") == r2sum(g), s"$g r2_sum")
      assert(r.getAs[Long]("n_blocks") == n.toLong && r.getAs[Long]("k") == k.toLong)
      assert(r.getAs[Long]("q_ppm") == qPpm, s"$g q_ppm")
    }
    // sanity: ×2 ranks across the n complete blocks must sum to n·k(k+1)
    assert(r2.map(_._2).sum == n.toLong * k * (k + 1))
  }

  test("q359: Brown–Forsythe matches a BigInt recount with lower medians") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val per = docs.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val med = per.map { case (s0, vs) => s0 -> vs((vs.length - 1) / 2) }
    val zm = per.map { case (s0, vs) =>
      val zs = vs.map(v => (v - med(s0)).abs)
      (s0, (vs.length.toLong, zs.map(BigInt(_)).sum,
        zs.map(z => BigInt(z) * z).sum))
    }
    val nTot = zm.values.map(_._1).sum
    val zTot = zm.values.map(_._2).sum
    val k = zm.size
    val ssb = zm.values.map { case (ng, zg, _) =>
      (zg * nTot - zTot * ng).pow(2) * 1000000 / (BigInt(ng) * nTot * nTot) }.sum
    val ssw = zm.values.map { case (ng, zg, zzg) =>
      (ng * zzg - zg * zg) * 1000000 / ng }.sum
    val fPpm = ((nTot - k) * ssb * 1000000 / ((k - 1) * ssw)).toLong
    val out = HypothesisQueries.q359_brown_forsythe(spark, sf).collect()
    assert(out.length == k)
    out.foreach { r =>
      val s0 = r.getAs[String]("source")
      val (ng, zg, _) = zm(s0)
      assert(r.getAs[Long]("n_g") == ng && r.getAs[Long]("med") == med(s0))
      assert(r.getAs[Long]("z_mean_ppm") == (zg * 1000000 / ng).toLong)
      assert(r.getAs[Long]("f_ppm") == fPpm, s"$s0 f_ppm")
    }
  }

  test("q360/q361: CvM and energy distance match BigInt recounts") {
    val rel = events.filter(_._4 >= 0)
    val byType = rel.groupBy(_._1)
    val cvm = HypothesisQueries.q360_cramer_von_mises(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val en = HypothesisQueries.q361_energy_distance(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    byType.foreach { case (g, rows) =>
      val a = rows.filter(e => dayOf(e._3) <= 15).map(_._4)
      val b = rows.filter(e => dayOf(e._3) > 15).map(_._4)
      val (n, m) = (BigInt(a.length), BigInt(b.length))
      // CvM over the pooled points (Anderson's representation)
      val support = (a ++ b).distinct.sorted
      val num = support.map { v =>
        val w = BigInt(a.count(_ == v) + b.count(_ == v))
        val d = BigInt(a.count(_ <= v)) * m - BigInt(b.count(_ <= v)) * n
        w * d * d
      }.sum
      val tPpm = (num * 1000000 / (n * m * (n + m) * (n + m))).toLong
      val rc = cvm(g)
      assert(rc.getAs[Long]("n_a") == n.toLong && rc.getAs[Long]("n_b") == m.toLong)
      assert(rc.getAs[Long]("t_ppm") == tPpm, s"$g cvm")
      // energy distance, V-statistic form
      def cross(x: Array[Long], y: Array[Long]): BigInt =
        x.map(v1 => y.map(v2 => BigInt((v1 - v2).abs)).sum).sum
      val (axy, bxx, cyy) = (cross(a, b), cross(a, a), cross(b, b))
      val numE = 2 * axy * n * m - bxx * m * m - cyy * n * n
      val re = en(g)
      assert(re.getAs[Long]("e_ppm") == (numE * 1000000 / (n * n * m * m)).toLong)
      assert(re.getAs[Long]("t_milli") == (numE * 1000 / (n * m * (n + m))).toLong)
      assert(numE >= 0, s"$g energy nonneg") // zero iff equal distributions
    }
  }

  private def dayOf(dayIdx: Long): Int = {
    // events span Jan 2024; dayofmonth == day-index − index(Jan 1) + 1
    val jan1 = java.time.LocalDate.of(2024, 1, 1).toEpochDay
    (dayIdx - jan1 + 1).toInt
  }

  test("q362: Ljung–Box matches a BigInt recount (signed truncation)") {
    val daily = events.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._2).sum).toMap
    val out = HypothesisQueries.q362_ljung_box(spark, sf).collect()
    assert(out.nonEmpty)
    val byType = daily.groupBy(_._1._1)
    byType.foreach { case (g, m) =>
      val series = m.toSeq.map { case ((_, d0), x) => (d0, x) }.sortBy(_._1)
      val n = BigInt(series.length)
      val sx = series.map(e => BigInt(e._2)).sum
      val y = series.map { case (d0, x) => (d0, n * x - sx) }.toMap
      val den = y.values.map(v => v * v).sum
      // BigInt / truncates toward zero — the verified div semantics
      def tdiv(a: BigInt, b: BigInt): BigInt = a / b
      val rPpm = (1 to 7).map { kk =>
        val num = y.toSeq.map { case (d0, yv) =>
          y.get(d0 + kk).map(_ * yv).getOrElse(BigInt(0)) }.sum
        kk.toLong -> tdiv(num * 1000000, den).toLong
      }.toMap
      val qsum = rPpm.map { case (kk, r0) =>
        BigInt(r0) * r0 / (n - kk) }.sum
      val qMicro = (n * (n + 2) * qsum / 1000000).toLong
      out.filter(_.getAs[String]("event_type") == g).foreach { r =>
        val kk = r.getAs[Long]("lag")
        assert(r.getAs[Long]("n_days") == n.toLong)
        assert(r.getAs[Long]("r_ppm") == rPpm(kk), s"$g lag $kk")
        assert(r.getAs[Long]("q_micro") == qMicro, s"$g q_micro")
        assert(r.getAs[Boolean]("white_noise") == (qMicro <= 14067140L))
      }
    }
  }

  test("hypothesis family plan locks: broadcast-only joins, bounded windows") {
    HypothesisQueries.defs.foreach { case (name, q) =>
      val plan = planOf(q(spark, sf))
      assert(!plan.contains("SortMergeJoin"), s"$name sort-merge join")
      assert(!plan.contains("CartesianProduct"), s"$name cartesian")
    }
    // the register builder reduces the corpus before any join: exactly one
    // corpus-scale exchange (the groupBy) feeds the q356 readout
    val plan356 = planOf(HypothesisQueries.q356_hdr_quantiles(spark, sf))
    assert(plan356.contains("BroadcastNestedLoopJoin") ||
      plan356.contains("BroadcastHashJoin"), "q356 percentile join broadcast")
  }

  test("q363: runs test matches a driver recount of the sign sequence") {
    val daily = events.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._2).sum).toMap
    val out = HypothesisQueries.q363_runs_test(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1._1).foreach { case (g, m) =>
      val series = m.toSeq.map { case ((_, d0), x) => (d0, x) }.sortBy(_._1)
      val med = series.map(_._2).sorted.apply((series.length - 1) / 2)
      val kept = series.filter(_._2 != med).map(e => e._2 > med)
      val (a, b) = (kept.count(identity).toLong, kept.count(!_).toLong)
      val runs = 1L + kept.zip(kept.tail).count { case (x, y) => x != y }
      val n = a + b
      val num = BigInt((runs - 1) * n - 2 * a * b)
      val z2 = (num * num * (n - 1) * 1000000 /
        (BigInt(2) * a * b * (2 * a * b - n))).toLong
      val r = out(g)
      assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("n_above") == a &&
        r.getAs[Long]("n_below") == b && r.getAs[Long]("runs") == runs, s"$g")
      assert(r.getAs[Long]("z2_ppm") == z2, s"$g z2")
      assert(r.getAs[Boolean]("random_order") == (z2 <= 3841459L))
    }
  }

  test("q364/q365: HL shift and Cliff's delta match pairwise recounts") {
    val rel = events.filter(_._4 >= 0)
    val hl = HypothesisQueries.q364_hodges_lehmann(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val cd = HypothesisQueries.q365_cliffs_delta(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rel.groupBy(_._1).foreach { case (g, rows) =>
      val a = rows.filter(e => dayOf(e._3) <= 15).map(_._4)
      val b = rows.filter(e => dayOf(e._3) > 15).map(_._4)
      val diffs = (for (x <- a; y <- b) yield y - x).sorted
      val t = diffs.length.toLong
      val hlTrue = diffs(((t + 1) / 2 - 1).toInt) // lower median, rank (t+1) div 2
      val rh = hl(g)
      assert(rh.getAs[Long]("n_pairs") == t && rh.getAs[Long]("hl_shift") == hlTrue,
        s"$g hl")
      val (gt, lt, eq) = (diffs.count(_ > 0).toLong, diffs.count(_ < 0).toLong,
        diffs.count(_ == 0).toLong)
      val delta = (BigInt(gt - lt) * 1000000 / t).toLong
      val rc = cd(g)
      assert(rc.getAs[Long]("n_gt") == gt && rc.getAs[Long]("n_lt") == lt &&
        rc.getAs[Long]("n_eq") == eq && rc.getAs[Long]("delta_ppm") == delta,
        s"$g cliff")
      val mag = if (delta.abs < 147000) "negligible"
        else if (delta.abs < 330000) "small"
        else if (delta.abs < 474000) "medium" else "large"
      assert(rc.getAs[String]("magnitude") == mag, s"$g magnitude")
    }
  }

  test("q366: Mood's median matches a BigInt recount on the pooled split") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val all = docs.map(_._2).sorted
    val m = all((all.length - 1) / 2)
    val per = docs.groupBy(_._1).view.mapValues { g =>
      (g.length.toLong, g.count(_._2 > m).toLong) }.toMap
    val nTot = per.values.map(_._1).sum
    val aTot = per.values.map(_._2).sum
    val tsum = per.values.map { case (ng, ag) =>
      BigInt(ag * nTot - ng * aTot).pow(2) * 1000000 / ng }.sum
    val chi2 = (tsum / (BigInt(aTot) * (nTot - aTot))).toLong
    val out = HypothesisQueries.q366_mood_median(spark, sf).collect()
    assert(out.length == per.size)
    out.foreach { r =>
      val s0 = r.getAs[String]("source")
      assert(r.getAs[Long]("pooled_median") == m)
      assert(r.getAs[Long]("n_g") == per(s0)._1 &&
        r.getAs[Long]("n_above") == per(s0)._2, s"$s0 counts")
      assert(r.getAs[Long]("chi2_ppm") == chi2, s"$s0 chi2")
      if (per.size == 20)
        assert(r.getAs[Boolean]("homogeneous") == (chi2 <= 30143527L))
      else assert(r.isNullAt(r.fieldIndex("homogeneous")), s"$s0 df guard")
    }
  }

  test("q367: Wilcoxon signed-rank matches a recount over the day pairing") {
    val daily = events.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._2).sum).toMap
    val d0 = daily.keys.map(_._2).min
    val out = HypothesisQueries.q367_wilcoxon_signed(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1._1).foreach { case (g, m) =>
      val s2 = m.map { case ((_, d), x) => d -> x }
      val diffs = (d0 until d0 + 15).flatMap { d =>
        for (x <- s2.get(d); y <- s2.get(d + 15)) yield y - x
      }.filter(_ != 0L)
      val n = diffs.length.toLong
      val ads = diffs.map(_.abs)
      val w2 = diffs.filter(_ > 0).map { dv =>
        ads.count(_ < dv.abs).toLong + ads.count(_ <= dv.abs).toLong + 1L }.sum
      val e2 = n * (n + 1) / 2
      val tie3 = ads.groupBy(identity).values
        .map(t => BigInt(t.size).pow(3) - t.size).sum
      val z2 = (BigInt(w2 - e2).pow(2) * 12 * 1000000 /
        (BigInt(2) * n * (n + 1) * (2 * n + 1) - tie3)).toLong
      val r = out(g)
      assert(r.getAs[Long]("n_pairs") == n && r.getAs[Long]("w2") == w2 &&
        r.getAs[Long]("e2") == e2, s"$g moments")
      assert(r.getAs[Long]("z2_ppm") == z2, s"$g z2")
      assert(r.getAs[Boolean]("shifted") == (z2 > 3841459L))
    }
  }

  test("q370: the Durbin–Levinson ladder matches an independent recount") {
    // independent re-implementation: plain Long arrays, textbook indexing
    val acf = HypothesisQueries.q362_ljung_box(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag"),
        r.getAs[Long]("r_ppm")))
    val out = HypothesisQueries.q370_pacf(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
        (r.getAs[Long]("r_ppm"), r.getAs[Long]("pacf_ppm"))).toMap
    def tdiv(a: BigInt, b: BigInt): Long = (a / b).toLong
    acf.groupBy(_._1).foreach { case (g, rows) =>
      val rs = rows.sortBy(_._2).map(_._3).toArray
      val phi = Array.ofDim[Long](8)
      phi(1) = rs(0)
      assert(out((g, 1L)) == ((rs(0), rs(0))), s"$g lag1 = r1")
      for (k <- 2 to 7) {
        var num = BigInt(rs(k - 1)) * 1000000
        var den = BigInt("1000000000000")
        for (j <- 1 until k) {
          num -= BigInt(phi(j)) * rs(k - 1 - j)
          den -= BigInt(phi(j)) * rs(j - 1)
        }
        val pkk = tdiv(num * 1000000, den)
        val next = Array.ofDim[Long](8)
        for (j <- 1 until k) next(j) = phi(j) - tdiv(BigInt(pkk) * phi(k - j), 1000000)
        next(k) = pkk
        for (j <- 1 to k) phi(j) = next(j)
        assert(out((g, k.toLong)) == ((rs(k - 1), pkk)), s"$g lag $k")
      }
    }
  }

  test("q371: seasonality strength matches a BigInt recount") {
    val daily = events.groupBy(e => (e._1, e._3)).view
      .mapValues(_.map(_._2).sum).toMap
    val out = HypothesisQueries.q371_seasonality_strength(spark, sf).collect()
    assert(out.nonEmpty)
    daily.groupBy(_._1._1).foreach { case (g, m) =>
      val byDow = m.toSeq.map { case ((_, d0), x) => (d0 % 7, x) }.groupBy(_._1)
      val n = BigInt(m.size)
      val s0 = m.values.map(BigInt(_)).sum
      val gm = s0 * 1000000 / n
      val md = byDow.view.mapValues { xs =>
        (xs.size.toLong, xs.map(e => BigInt(e._2)).sum * 1000000 / xs.size) }.toMap
      val ssb = md.values.map { case (nd, mdv) => nd * (mdv - gm).pow(2) }.sum
      val sst = m.values.map(x => (BigInt(x) * 1000000 - gm).pow(2)).sum
      val eta2 = (ssb * 1000000 / sst).toLong
      val dcount = BigInt(md.size)
      val f = ((n - dcount) * ssb * 1000000 / ((dcount - 1) * (sst - ssb))).toLong
      out.filter(_.getAs[String]("event_type") == g).foreach { r =>
        val dow = r.getAs[Long]("dow")
        assert(r.getAs[Long]("n_d") == md(dow)._1 &&
          r.getAs[Long]("mean_ppm") == md(dow)._2.toLong, s"$g dow $dow")
        assert(r.getAs[Long]("eta2_ppm") == eta2 && r.getAs[Long]("f_ppm") == f,
          s"$g eta2/f")
      }
    }
  }

  test("q374: KS-uniform matches a dense-grid BigInt recount") {
    val rel = events.filter(_._4 >= 0)
    val out = HypothesisQueries.q374_ks_uniform(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rel.groupBy(_._1).foreach { case (g, rows) =>
      val vs = rows.map(_._4)
      val n = BigInt(vs.length)
      val dNum = (0L until 100L).map { v =>
        (BigInt(vs.count(_ <= v)) * 100 - n * (v + 1)).abs }.max
      val r = out(g)
      assert(r.getAs[Long]("n") == n.toLong && r.getAs[Long]("d_num") == dNum)
      assert(r.getAs[Long]("d_ppm") == (dNum * 1000000 / (n * 100)).toLong)
      assert(r.getAs[Boolean]("uniform") ==
        (dNum * dNum * 1000000 <= BigInt(1844164) * n * 100 * 100), s"$g gate")
    }
  }

  test("q375: the SPRT walk, crossing, and decision match a driver fold") {
    val rel = events.filter(_._4 >= 0)
    val out = HypothesisQueries.q375_sprt(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val (inc1, inc0, thr) = (21098L, -17238L, 278392L) // pinned Ilog2 values
    rel.groupBy(_._1).foreach { case (g, rows) =>
      val cells = rows.groupBy(_._3).view.mapValues { day =>
        (day.count(_._4 < 50).toLong, day.count(_._4 >= 50).toLong) }
      val walk = cells.toSeq.sortBy(_._1).scanLeft((0L, 0L)) {
        case ((_, acc), (day, (n1, n0))) => (day, acc + n1 * inc1 + n0 * inc0)
      }.tail
      val r = out(g)
      assert(r.getAs[Long]("n_days") == cells.size.toLong, s"$g days")
      assert(r.getAs[Long]("final_llr_fp") == walk.last._2, s"$g final")
      walk.find(w => math.abs(w._2) >= thr) match {
        case Some((day, cum)) =>
          assert(r.getAs[Long]("crossed_day") == day, s"$g crossing")
          assert(r.getAs[String]("decision") ==
            (if (cum >= thr) "accept_h1" else "accept_h0"), s"$g decision")
        case None =>
          assert(r.isNullAt(r.fieldIndex("crossed_day")) &&
            r.getAs[String]("decision") == "continue", s"$g continue")
      }
    }
  }

  test("sprtFromDailyCounts: a walk inside the boundaries reports continue") {
    import spark.implicits._
    // tiny balanced counts: |cum| stays far below log2(19) fp
    val cells = Seq(("t", 1L, 1L, 1L), ("t", 2L, 1L, 1L), ("t", 3L, 0L, 1L))
      .toDF("g", "day", "n1", "n0")
    val r = HypothesisQueries.sprtFromDailyCounts(cells,
      21098L, -17238L, 278392L).head()
    assert(r.getAs[String]("decision") == "continue" &&
      r.isNullAt(r.fieldIndex("crossed_day")))
    assert(r.getAs[Long]("final_llr_fp") ==
      2L * 21098L + 3L * -17238L)
  }

  test("q373: day->week register merge reproduces the direct build") {
    val out = HypothesisCompositionQueries.q373_hdr_rollup(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merged_matches_direct"),
        s"${r.getAs[String]("event_type")}/${r.getAs[Long]("p")}")
      assert(r.getAs[Long]("width_ppm") <= 90508L)
    }
    // the merged path must really be the two-stage rollup, not a rewrite
    // of the direct build: the plan carries both the daily and the weekly
    // register aggregations
    val plan = HypothesisCompositionQueries.q373_hdr_rollup(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("day"), "daily register stage present")
  }

  test("q372: Cochran's Q matches a BigInt recount over the user grid") {
    val grid = graft.io.Tables.events(spark, sf)
      .where(dayofmonth(col("ts")) <= 7)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k = grid.map(_._2).size
    val cT = grid.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rU = grid.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val sc = cT.values.map(BigInt(_)).sum
    val scc = cT.values.map(c0 => BigInt(c0) * c0).sum
    val sr = rU.values.map(BigInt(_)).sum
    val srr = rU.values.map(r0 => BigInt(r0) * r0).sum
    // sf0.001 is legitimately degenerate here: every active user covers
    // all k types, so Σr_u(k − r_u) = 0 and Q must fail closed to NULL
    val den = k * sr - srr
    val qPpm: Option[Long] =
      if (den == 0) None
      else Some(((k - 1) * (k * scc - sc * sc) * 1000000 / den).toLong)
    val out = HypothesisQueries.q372_cochrans_q(spark, sf).collect()
    assert(out.length == k)
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      assert(r.getAs[Long]("reach") == cT(g), s"$g reach")
      assert(r.getAs[Long]("k") == k.toLong &&
        r.getAs[Long]("n_users") == rU.size.toLong)
      qPpm match {
        case Some(q0) =>
          assert(r.getAs[Long]("q_ppm") == q0, s"$g q")
          if (k == 5) assert(r.getAs[Boolean]("differs") == (q0 > 9487729L))
          else assert(r.isNullAt(r.fieldIndex("differs")), s"$g df guard")
        case None =>
          assert(r.isNullAt(r.fieldIndex("q_ppm")), s"$g fail-closed q")
          assert(r.isNullAt(r.fieldIndex("differs")), s"$g fail-closed gate")
      }
    }
    // the non-degenerate path must also be exercised: recompute at sf0.01
    val grid01 = graft.io.Tables.events(spark, "/root/testdata/sf0.01")
      .where(dayofmonth(col("ts")) <= 7)
      .select(col("user_id"), col("event_type")).distinct()
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val k01 = grid01.map(_._2).size
    val r01 = grid01.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val den01 = k01 * r01.values.map(BigInt(_)).sum -
      r01.values.map(r0 => BigInt(r0) * r0).sum
    if (den01 != 0) {
      val c01 = grid01.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val sc01 = c01.values.map(BigInt(_)).sum
      val scc01 = c01.values.map(c0 => BigInt(c0) * c0).sum
      val q01 = ((k01 - 1) * (k01 * scc01 - sc01 * sc01) * 1000000 / den01).toLong
      val out01 = HypothesisQueries
        .q372_cochrans_q(spark, "/root/testdata/sf0.01").collect()
      out01.foreach(r => assert(r.getAs[Long]("q_ppm") == q01, "sf0.01 q"))
    }
  }

  test("q368: the gate verdict equals the recomputed member predicate") {
    val cvm = HypothesisQueries.q360_cramer_von_mises(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("t_ppm")).toMap
    val mag = HypothesisQueries.q365_cliffs_delta(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[String]("magnitude"))
      .toMap
    val lb = HypothesisQueries.q362_ljung_box(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Boolean]("white_noise"))
      .toMap
    val rt = HypothesisQueries.q363_runs_test(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Boolean]("random_order"))
      .toMap
    val out = HypothesisCompositionQueries.q368_distribution_gate(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      val expect = cvm(g) <= 461000L &&
        Set("negligible", "small")(mag(g)) && lb(g) && rt(g)
      assert(r.getAs[Boolean]("healthy") == expect, s"$g verdict")
      assert(r.getAs[String]("magnitude") == mag(g), s"$g magnitude passthrough")
    }
  }

  test("cellSum: per-cell sums carry across micro-batch boundaries") {
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.CellSumObs]
    mem.addData(Streaming.CellSumObs("a", 1L, 10L),
      Streaming.CellSumObs("a", 1L, 5L), Streaming.CellSumObs("b", 2L, -3L))
    mem.addData(Streaming.CellSumObs("a", 1L, 7L)) // same cell, next batch
    val name = "cellsum_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.cellSum(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fin = spark.table(name).groupBy("rf", "a")
      .agg(max(struct(col("seen"), col("s"))).as("f"))
      .select(col("rf"), col("a"), col("f.s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(fin == Seq(("a", 1L, 22L), ("b", 2L, -3L)))
  }

  // NOTE: register mergeability at corpus scale is certified by
  // q357_recovery_hdr vs q356's batch oracle; this unit test pins the
  // (count, min, max) fold and the cross-boundary state carry.
  test("hdrSketch: registers carry across micro-batch boundaries") {
    import graft.streaming.Streaming
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.HdrObs]
    mem.addData(Streaming.HdrObs("a", 3L, 9L), Streaming.HdrObs("a", 3L, 12L),
      Streaming.HdrObs("b", 0L, 1L))
    mem.addData(Streaming.HdrObs("a", 3L, 8L)) // new min for the cell
    val name = "hdr_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.hdrSketch(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fin = spark.table(name).groupBy("g", "b")
      .agg(max(struct(col("seen"), col("c"), col("lo"), col("hi"))).as("f"))
      .select(col("g"), col("b"), col("f.c"), col("f.lo"), col("f.hi"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    assert(fin == Seq(("a", 3L, 3L, 8L, 12L), ("b", 0L, 1L, 1L, 1L)))
  }

  test("hdrQuantiles: degenerate single-value corpus collapses to one bucket") {
    import spark.implicits._
    val one = Seq(("t", 7L), ("t", 7L), ("t", 7L)).toDF("g", "v")
    val out = HypothesisQueries.hdrQuantiles(spark,
      HypothesisQueries.hdrRegisters(one)).collect()
    assert(out.length == 3) // one row per percentile
    out.foreach { r =>
      assert(r.getAs[Long]("lo") == 7L && r.getAs[Long]("hi") == 7L &&
        r.getAs[Long]("width_ppm") == 0L)
    }
  }
}
