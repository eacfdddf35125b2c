package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{EvalQueries, HypothesisQueries}

/** Property-based degenerate-input fuzzing for the hypothesis family —
  * the round-10 AgreementFuzzSpec discipline applied to the round-11
  * statistics: the family's denominators (runs 2ab(2ab−n), Wilcoxon
  * tie-corrected variance, Friedman A4−C4, CvM/energy half sizes,
  * Ljung–Box Σy², seasonality SST) are exactly where tie-heavy and
  * one-sided inputs bite, and the sf corpus never produces them. Every
  * statistic is recomputed EXACTLY (BigInt) from a plain driver fold
  * whose ranks/medians come from sorts, not the engine's distributed
  * machinery; fail-closed rows (empty kept sequence, empty half,
  * all-zero diffs, constant series) are asserted PRESENT with NULL
  * statistics — the convention a vanished group would silently break.
  * The fuzzing already earned its keep at authoring time: it exposed
  * q370 reading a NULL ACF as 0 via getAs[Long] (fixed with the
  * symmetric null-type drop). Deterministic seed driving per
  * PropertySpec; small case counts — each case is a full Spark chain. */
class HypothesisFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(1111L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  /** (g, day, c) daily observations: tiny value domain (tie-heavy),
    * sparse days with gaps, group g0 always present. */
  private val dailyGen: Gen[Seq[(String, Long, Long)]] = for {
    nG <- Gen.choose(1, 3)
    n <- Gen.choose(2, 40)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, nG - 1)
      day <- Gen.choose(0L, 29L)
      c <- Gen.choose(-3L, 3L)
    } yield (s"g$g", day, c))
  } yield ("g0", rows.head._2, rows.head._3) +: rows.tail

  /** (g, half, v) two-sample observations; a group may legitimately get
    * only one half. */
  private val relGen: Gen[Seq[(String, String, Long)]] = for {
    nG <- Gen.choose(1, 3)
    n <- Gen.choose(2, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, nG - 1)
      h <- Gen.oneOf("a", "b")
      v <- Gen.choose(0L, 3L)
    } yield (s"g$g", h, v))
  } yield rows

  private def daily(rows: Seq[(String, Long, Long)]): Map[(String, Long), Long] =
    rows.groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).sum).toMap

  test("runs test: fuzzed series match a driver fold; all-equal fails closed") {
    cases(dailyGen, 8) { rows =>
      val out = HypothesisQueries.runsTest(rows.toDF("g", "day", "c"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      daily(rows).groupBy(_._1._1).foreach { case (g, m) =>
        val series = m.toSeq.map { case ((_, d), x) => (d, x) }.sortBy(_._1)
        val med = series.map(_._2).sorted.apply((series.length - 1) / 2)
        val kept = series.filter(_._2 != med).map(_._2 > med)
        val (a, b) = (kept.count(identity).toLong, kept.count(!_).toLong)
        val r = out.getOrElse(g, fail(s"group $g vanished (fail-closed)"))
        assert(r.getAs[Long]("n_days") == a + b &&
          r.getAs[Long]("n_above") == a && r.getAs[Long]("n_below") == b, g)
        if (kept.isEmpty) {
          assert(r.isNullAt(r.fieldIndex("runs")) &&
            r.isNullAt(r.fieldIndex("z2_ppm")) &&
            r.isNullAt(r.fieldIndex("random_order")), s"$g all-equal")
        } else {
          val runs = 1L + kept.zip(kept.tail).count { case (x, y) => x != y }
          assert(r.getAs[Long]("runs") == runs, s"$g runs")
          val n = a + b
          val den = BigInt(2) * a * b * (2 * a * b - n)
          if (den == 0) assert(r.isNullAt(r.fieldIndex("z2_ppm")), s"$g one-sided")
          else {
            val num = BigInt((runs - 1) * n - 2 * a * b)
            assert(r.getAs[Long]("z2_ppm") ==
              (num * num * (n - 1) * 1000000 / den).toLong, s"$g z2")
          }
        }
      }
    }
  }

  test("wilcoxon: fuzzed pairings match a driver fold; all-zero fails closed") {
    cases(dailyGen, 8) { rows =>
      val d = daily(rows)
      val d0 = rows.map(_._2).min
      val out = HypothesisQueries.wilcoxonSigned(rows.toDF("g", "day", "c"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      d.groupBy(_._1._1).foreach { case (g, m) =>
        val s2 = m.map { case ((_, dd), x) => dd -> x }
        val diffs = (d0 until d0 + 15).flatMap { dd =>
          for (x <- s2.get(dd); y <- s2.get(dd + 15)) yield y - x
        }.filter(_ != 0L)
        val r = out.getOrElse(g, fail(s"group $g vanished (fail-closed)"))
        assert(r.getAs[Long]("n_pairs") == diffs.length.toLong, s"$g n")
        if (diffs.isEmpty) {
          assert(r.isNullAt(r.fieldIndex("w2")) &&
            r.isNullAt(r.fieldIndex("z2_ppm")) &&
            r.isNullAt(r.fieldIndex("shifted")), s"$g no pairs")
        } else {
          val n = diffs.length.toLong
          val ads = diffs.map(_.abs)
          val w2 = diffs.filter(_ > 0).map { dv =>
            ads.count(_ < dv.abs).toLong + ads.count(_ <= dv.abs).toLong + 1L
          }.sum
          val tie3 = ads.groupBy(identity).values
            .map(t => BigInt(t.size).pow(3) - t.size).sum
          val den = BigInt(2) * n * (n + 1) * (2 * n + 1) - tie3
          assert(r.getAs[Long]("w2") == w2 &&
            r.getAs[Long]("e2") == n * (n + 1) / 2, s"$g moments")
          if (den == 0) assert(r.isNullAt(r.fieldIndex("z2_ppm")), s"$g tied")
          else assert(r.getAs[Long]("z2_ppm") ==
            (BigInt(w2 - n * (n + 1) / 2).pow(2) * 12 * 1000000 / den).toLong,
            s"$g z2")
        }
      }
    }
  }

  test("HL shift / Cliff's delta: fuzzed halves match; empty half fails closed") {
    cases(relGen, 8) { rows =>
      val df = rows.toDF("g", "half", "v")
      val hl = HypothesisQueries.hodgesLehmann(df)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      val cd = HypothesisQueries.cliffsDelta(df)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val a = rs.filter(_._2 == "a").map(_._3)
        val b = rs.filter(_._2 == "b").map(_._3)
        val diffs = (for (x <- a; y <- b) yield y - x).sorted
        val rh = hl.getOrElse(g, fail(s"$g vanished from HL"))
        val rc = cd.getOrElse(g, fail(s"$g vanished from Cliff"))
        assert(rh.getAs[Long]("n_pairs") == diffs.length.toLong, s"$g pairs")
        if (diffs.isEmpty) {
          assert(rh.isNullAt(rh.fieldIndex("hl_shift")), s"$g hl null")
          assert(rc.getAs[Long]("n_gt") == 0L &&
            rc.isNullAt(rc.fieldIndex("delta_ppm")) &&
            rc.isNullAt(rc.fieldIndex("magnitude")), s"$g cliff null")
        } else {
          val t = diffs.length.toLong
          assert(rh.getAs[Long]("hl_shift") == diffs(((t + 1) / 2 - 1).toInt),
            s"$g hl")
          val (gt, lt) = (diffs.count(_ > 0).toLong, diffs.count(_ < 0).toLong)
          assert(rc.getAs[Long]("delta_ppm") ==
            (BigInt(gt - lt) * 1000000 / t).toLong, s"$g delta")
        }
      }
    }
  }

  test("friedman: fuzzed blocks match a driver fold; all-tied fails closed") {
    cases(dailyGen, 8) { rows =>
      val cells = daily(rows)
      val k = cells.keys.map(_._1).toSet.size
      val complete = cells.groupBy(_._1._2).filter(_._2.size == k)
      val out = HypothesisQueries.friedman(
          rows.map(r => (r._2, r._1, r._3)).toDF("day", "g", "c"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      if (complete.isEmpty) assert(out.isEmpty, "no complete blocks")
      else {
        val n = complete.size
        val r2 = complete.toSeq.flatMap { case (_, m) =>
          val vs = m.toSeq.map { case ((g, _), v) => (g, v) }
          vs.map { case (g, v) =>
            (g, vs.count(_._2 < v).toLong + vs.count(_._2 <= v).toLong + 1L) }
        }
        val r2sum = r2.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        val a4 = r2.map(x => BigInt(x._2) * x._2).sum
        val c4 = BigInt(n) * k * (k + 1) * (k + 1)
        val s4 = r2sum.values
          .map(rj => BigInt(rj - n.toLong * (k + 1)).pow(2)).sum
        r2sum.foreach { case (g, rj) =>
          val r = out.getOrElse(g, fail(s"$g vanished"))
          assert(r.getAs[Long]("r2_sum") == rj, s"$g r2_sum")
          if (a4 == c4) assert(r.isNullAt(r.fieldIndex("q_ppm")), s"$g tied")
          else assert(r.getAs[Long]("q_ppm") ==
            ((k - 1) * s4 * 1000000 / (a4 - c4)).toLong, s"$g q")
        }
      }
    }
  }

  test("CvM / energy: fuzzed halves match; one-sided groups fail closed") {
    cases(relGen, 8) { rows =>
      val df = rows.toDF("g", "half", "v")
      val cv = HypothesisQueries.cramerVonMises(df)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      val en = HypothesisQueries.energyDistance(df)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val a = rs.filter(_._2 == "a").map(_._3)
        val b = rs.filter(_._2 == "b").map(_._3)
        val (n, m) = (BigInt(a.length), BigInt(b.length))
        val rc = cv.getOrElse(g, fail(s"$g vanished from CvM"))
        val re = en.getOrElse(g, fail(s"$g vanished from energy"))
        if (n == 0 || m == 0) {
          assert(rc.isNullAt(rc.fieldIndex("t_ppm")), s"$g cvm one-sided")
          assert(re.isNullAt(re.fieldIndex("e_ppm")), s"$g energy one-sided")
        } else {
          val support = (a ++ b).distinct.sorted
          val num = support.map { v =>
            val w = BigInt(a.count(_ == v) + b.count(_ == v))
            val d0 = BigInt(a.count(_ <= v)) * m - BigInt(b.count(_ <= v)) * n
            w * d0 * d0
          }.sum
          assert(rc.getAs[Long]("t_ppm") ==
            (num * 1000000 / (n * m * (n + m) * (n + m))).toLong, s"$g cvm")
          def cross(x: Seq[Long], y: Seq[Long]): BigInt =
            x.map(v1 => y.map(v2 => BigInt((v1 - v2).abs)).sum).sum
          val numE = 2 * cross(a, b) * n * m - cross(a, a) * m * m -
            cross(b, b) * n * n
          assert(re.getAs[Long]("e_ppm") ==
            (numE * 1000000 / (n * n * m * m)).toLong, s"$g energy")
        }
      }
    }
  }

  test("ljung-box / pacf: constant series drop symmetrically; gaps exact") {
    // constant series: every y = 0, den = 0 -> NULL r_ppm rows in q362's
    // frame, and the pacf drops the type entirely (matching the oracle's
    // rl filter)
    val const = (0L until 10L).map(d => ("g0", d, 5L))
    val lb = HypothesisQueries.ljungBox(const.toDF("g", "day", "c")).collect()
    assert(lb.nonEmpty && lb.forall(_.isNullAt(lb.head.fieldIndex("r_ppm"))))
    val pc = HypothesisQueries.pacf(spark, const.toDF("g", "day", "c"))
    assert(pc.collect().isEmpty, "constant series must drop from pacf")
    // gapped series: lag pairs only where day+k exists — BigInt recount
    cases(dailyGen, 6) { rows =>
      val d = daily(rows)
      val out = HypothesisQueries.pacf(spark,
          rows.toDF("g", "day", "c")).collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
          r.getAs[Long]("pacf_ppm")).toMap
      d.groupBy(_._1._1).foreach { case (g, m) =>
        val series = m.toSeq.map { case ((_, dd), x) => (dd, x) }.sortBy(_._1)
        val n = BigInt(series.length)
        val sx = series.map(e => BigInt(e._2)).sum
        val y = series.map { case (dd, x) => (dd, n * x - sx) }.toMap
        val den = y.values.map(v => v * v).sum
        if (den == 0 || series.length < 2) {
          assert(!out.keys.exists(_._1 == g), s"$g must drop")
        } else {
          val rs = (1 to 7).filter(_ < series.length).map { kk =>
            val num = y.toSeq.map { case (dd, yv) =>
              y.get(dd + kk).map(_ * yv).getOrElse(BigInt(0)) }.sum
            (num * 1000000 / den).toLong
          }
          var phi = Vector(BigInt(rs(0)))
          assert(out((g, 1L)) == rs(0), s"$g lag1")
          var k = 2
          var alive = true
          while (alive && k <= rs.length) {
            val num = BigInt(rs(k - 1)) * 1000000 -
              (1 until k).map(j => phi(j - 1) * rs(k - 1 - j)).sum
            val dk = BigInt("1000000000000") -
              (1 until k).map(j => phi(j - 1) * rs(j - 1)).sum
            if (dk == 0) { alive = false }
            else {
              val pkk = num * 1000000 / dk
              phi = (1 until k).map(j =>
                phi(j - 1) - pkk * phi(k - 1 - j) / 1000000).toVector :+ pkk
              assert(out((g, k.toLong)) == pkk.toLong, s"$g lag $k")
              k += 1
            }
          }
        }
      }
    }
  }

  test("seasonality: constant series and single-phase groups fail closed") {
    val const = (0L until 10L).map(d => ("g0", d, 5L))
    val r = HypothesisQueries.seasonalityStrength(
      const.toDF("g", "day", "c")).collect()
    assert(r.nonEmpty && r.forall(_.isNullAt(r.head.fieldIndex("eta2_ppm"))))
    // all observations on one weekly phase: eta2 = 0 exactly, F NULL
    val onePhase = Seq(("g0", 0L, 3L), ("g0", 7L, 9L), ("g0", 14L, 4L))
    val r2 = HypothesisQueries.seasonalityStrength(
      onePhase.toDF("g", "day", "c")).collect()
    assert(r2.length == 1 && r2.head.getAs[Long]("eta2_ppm") == 0L &&
      r2.head.isNullAt(r2.head.fieldIndex("f_ppm")))
  }

  test("cochran's q: fuzzed presence grids match; saturated/single-type fail closed") {
    // (user_id, g) presence pairs; small universes force saturation and
    // single-type degenerates the sf corpus never produces
    val gridGen: Gen[Seq[(Long, String)]] = for {
      nG <- Gen.choose(1, 6)
      nU <- Gen.choose(1, 5)
      n <- Gen.choose(1, 25)
      rows <- Gen.listOfN(n, for {
        u <- Gen.choose(0L, nU - 1L)
        g <- Gen.choose(0, nG - 1)
      } yield (u, s"g$g"))
    } yield rows
    cases(gridGen, 8) { rows =>
      val cell = rows.distinct
      val k = cell.map(_._2).distinct.size.toLong
      val cT = cell.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val rU = cell.groupBy(_._1).view.mapValues(_.size.toLong)
      val sc = BigInt(cT.values.sum)
      val scc = cT.values.map(c => BigInt(c) * c).sum
      val den = BigInt(k) * rU.values.sum - rU.values.map(r => BigInt(r) * r).sum
      val out = HypothesisQueries.cochransQ(rows.toDF("user_id", "g"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      cT.foreach { case (g, reach) =>
        val r = out.getOrElse(g, fail(s"type $g vanished (fail-closed)"))
        assert(r.getAs[Long]("reach") == reach, s"$g reach")
        assert(r.getAs[Long]("k") == k && r.getAs[Long]("n_users") ==
          rU.size.toLong, s"$g k/users")
        if (den == 0) {
          // single type, or every user saturated the grid: Q undefined
          assert(r.isNullAt(r.fieldIndex("q_ppm")), s"$g degenerate q")
          assert(r.isNullAt(r.fieldIndex("differs")), s"$g degenerate verdict")
        } else {
          val q = BigInt(k - 1) * (k * scc - sc * sc) * 1000000 / den
          assert(r.getAs[Long]("q_ppm") == q.toLong, s"$g q")
          if (k == 5)
            assert(r.getAs[Boolean]("differs") == (q > 9487729), s"$g verdict")
          else assert(r.isNullAt(r.fieldIndex("differs")), s"$g wrong-df NULL")
        }
      }
    }
  }

  test("ks-uniform: fuzzed grids match; all-mass-in-one-bucket exact") {
    val B = 5
    val ksGen: Gen[Seq[(String, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 30)
      oneBucket <- Gen.oneOf(true, false)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        v <- if (oneBucket) Gen.const(0L) else Gen.choose(0L, B - 1L)
      } yield (s"g$g", v))
    } yield rows
    cases(ksGen, 8) { rows =>
      val out = HypothesisQueries.ksUniform(spark,
          rows.toDF("g", "v"), B)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val n = BigInt(rs.size)
        val cnt = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
        val dNum = (0L until B).map { v =>
          val cum = BigInt((0L to v).map(w => cnt.getOrElse(w, 0L)).sum)
          (cum * B - n * (v + 1)).abs
        }.max
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n") == n.toLong &&
          r.getAs[Long]("d_num") == dNum.toLong, s"$g census")
        assert(r.getAs[Long]("d_ppm") ==
          (dNum * 1000000 / (n * B)).toLong, s"$g d")
        assert(r.getAs[Boolean]("uniform") ==
          (dNum * dNum * 1000000 <= BigInt(1844164) * n * B * B), s"$g verdict")
      }
    }
    // exact decision-threshold tie: D = 1.358/sqrt(n) exactly would need
    // d_num^2*10^6 == 1844164*n*B^2; with n=1, B=5 the one-point mass at
    // v=0 gives d_num = 4 (16e6 > 46.1e6 false -> uniform). Verify the
    // <= boundary direction with the minimal frame rather than a hunt.
    val one = HypothesisQueries.ksUniform(spark,
      Seq(("g0", 0L)).toDF("g", "v"), B).collect()
    assert(one.length == 1 && one.head.getAs[Long]("d_num") == 4L &&
      one.head.getAs[Boolean]("uniform"))
  }

  test("sprt: fuzzed day walks match; threshold ties and gapped days exact") {
    // constructed ties at the decision boundary, both signs, with small
    // integer constants: +thr exactly -> accept_h1, -thr -> accept_h0
    val tiePlus = Seq(("g0", 0L, 2L, 0L), ("g0", 1L, 0L, 5L))
    val rp = HypothesisQueries.sprtFromDailyCounts(
      tiePlus.toDF("g", "day", "n1", "n0"), 3L, -2L, 6L).collect()
    assert(rp.length == 1 && rp.head.getAs[Long]("crossed_day") == 0L &&
      rp.head.getAs[String]("decision") == "accept_h1" &&
      rp.head.getAs[Long]("final_llr_fp") == -4L, "tie at +thr")
    val tieMinus = Seq(("g0", 3L, 0L, 3L))
    val rm = HypothesisQueries.sprtFromDailyCounts(
      tieMinus.toDF("g", "day", "n1", "n0"), 3L, -2L, 6L).collect()
    assert(rm.length == 1 && rm.head.getAs[Long]("crossed_day") == 3L &&
      rm.head.getAs[String]("decision") == "accept_h0", "tie at -thr")
    // fuzzed walks against a BigInt driver ladder with the REAL Ilog2
    // constants: gapped days, all-one-outcome, never-crossing
    val (i1, i0, th) = (HypothesisQueries.SprtInc1,
      HypothesisQueries.SprtInc0, HypothesisQueries.SprtThr)
    val walkGen: Gen[Seq[(String, Long, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 40)
      oneSided <- Gen.oneOf(true, false)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        day <- Gen.choose(0L, 20L) // sparse: most days empty
        k <- if (oneSided) Gen.const(10L) else Gen.choose(0L, 99L)
      } yield (s"g$g", day, k))
    } yield rows
    cases(walkGen, 8) { rows =>
      val cells = rows.groupBy(r => (r._1, r._2)).view.mapValues { rs =>
        (rs.count(_._3 < 50).toLong, rs.count(_._3 >= 50).toLong)
      }.toMap
      val df = cells.toSeq.map { case ((g, d), (n1, n0)) => (g, d, n1, n0) }
        .toDF("g", "day", "n1", "n0")
      val out = HypothesisQueries.sprtFromDailyCounts(df, i1, i0, th)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      cells.groupBy(_._1._1).foreach { case (g, m) =>
        val walk = m.toSeq.map { case ((_, d), (n1, n0)) =>
          (d, n1 * i1 + n0 * i0) }.sortBy(_._1)
        val cums = walk.scanLeft((0L, 0L)) { case ((_, acc), (d, inc)) =>
          (d, acc + inc) }.tail
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n_days") == walk.length.toLong, s"$g days")
        assert(r.getAs[Long]("final_llr_fp") == cums.last._2, s"$g final")
        cums.find { case (_, c) => c.abs >= th } match {
          case None =>
            assert(r.isNullAt(r.fieldIndex("crossed_day")) &&
              r.getAs[String]("decision") == "continue", s"$g no crossing")
          case Some((d, c)) =>
            assert(r.getAs[Long]("crossed_day") == d, s"$g crossing day")
            assert(r.getAs[String]("decision") ==
              (if (c >= th) "accept_h1" else "accept_h0"), s"$g decision")
        }
      }
    }
  }

  test("robust z: fuzzed series match a median/MAD driver fold; MAD=0 fails closed") {
    cases(dailyGen, 8) { rows =>
      val out = EvalQueries.robustZ(daily(rows).toSeq
          .map { case ((g, dd), x) => (g, dd, x) }.toDF("g", "day", "x"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      daily(rows).groupBy(_._1._1).foreach { case (g, m) =>
        val xs = m.values.toSeq.sorted
        def lowerMed(v: Seq[Long]): Long = v.sorted.apply((v.length - 1) / 2)
        val med = lowerMed(xs)
        val ads = xs.map(x => (x - med).abs)
        val mad = lowerMed(ads)
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n_days") == xs.length.toLong &&
          r.getAs[Long]("med") == med && r.getAs[Long]("mad") == mad,
          s"$g medians")
        if (mad == 0)
          assert(r.isNullAt(r.fieldIndex("n_outlier_days")), s"$g MAD=0 NULL")
        else assert(r.getAs[Long]("n_outlier_days") ==
          ads.count(_ * 6745 > mad * 35000).toLong, s"$g flags")
      }
    }
  }

  test("mood median: one-sided splits fail closed; tiny frames exact") {
    // all-equal corpus: nothing is above the pooled median -> A = 0 ->
    // NULL chi-square on both engines
    val eq = Seq(("s0", 5L), ("s1", 5L), ("s1", 5L))
    val r = HypothesisQueries.moodMedian(eq.toDF("source", "v")).collect()
    assert(r.length == 2 && r.forall(_.isNullAt(r.head.fieldIndex("chi2_ppm"))))
    // two sources, clean split: BigInt recount
    val two = Seq(("s0", 1L), ("s0", 1L), ("s1", 9L), ("s1", 9L), ("s1", 1L))
    val out = HypothesisQueries.moodMedian(two.toDF("source", "v")).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // pooled lower median of (1,1,1,9,9) = 1; above: s0 0/2, s1 2/3
    val (n, aT) = (BigInt(5), BigInt(2))
    val t0 = (BigInt(0) * n - BigInt(2) * aT).pow(2) * 1000000 / 2
    val t1 = (BigInt(2) * n - BigInt(3) * aT).pow(2) * 1000000 / 3
    val chi = ((t0 + t1) / (aT * (n - aT))).toLong
    assert(out("s0").getAs[Long]("chi2_ppm") == chi &&
      out("s1").getAs[Long]("n_above") == 2L)
  }
}
