package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.EvalQueries

/** Property-based TIE FUZZING for the rank/agreement statistics family
  * (round-11 ask): the family's denominators — tie terms, n³−n, grid
  * margins, pair counts — are exactly where degenerate inputs bite, and
  * the sf corpus never produces them. Generators draw tie-heavy (tiny
  * value domains), all-tied, single-group, two-point, and single-row
  * shapes; every statistic is checked EXACTLY (BigInt) against an
  * independent driver-side computation whose ranks come from a plain
  * sort, not the engine's distributed window/prefix-sum machinery — so a
  * pass certifies the distributed rank algebra, not a shared formula.
  * Fail-closed NULL paths (zero rank variance, no concordance pairs,
  * all-tied H', single-day trend groups) are asserted as NULLs, not
  * absent rows. Generator driving follows PropertySpec's deterministic
  * seed pattern (no scalatestplus bridge offline); case counts are small
  * because each case is a full Spark job chain. */
class AgreementFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(1106L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  /** (group, a, b) observations over tiny domains — tie-heavy by
    * construction; group 0 always present. */
  private val obsGen: Gen[Seq[(Long, Long, Long)]] = for {
    nG <- Gen.choose(1, 3)
    n <- Gen.choose(2, 24)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0L, (nG - 1).toLong)
      a <- Gen.choose(0L, 2L)
      b <- Gen.choose(0L, 2L)
    } yield (g, a, b))
  } yield (0L, rows.head._2, rows.head._3) +: rows.tail

  // ---- Spearman (q326 readout) -------------------------------------------

  /** 2-scaled tie-averaged ranks from a plain driver sort. */
  private def ranks2(vs: Seq[Long]): Seq[Long] = {
    val byV = vs.zipWithIndex.sortBy(_._1)
    val out = new Array[Long](vs.size)
    var i = 0
    while (i < byV.size) {
      var j = i
      while (j < byV.size && byV(j)._1 == byV(i)._1) j += 1
      val twoAvg = (i + 1).toLong + j.toLong // 2*avg of ranks i+1..j
      (i until j).foreach(k => out(byV(k)._2) = twoAvg)
      i = j
    }
    out.toSeq
  }

  private def refSpearman(g: Seq[(Long, Long)]): Option[Long] = {
    val xs = ranks2(g.map(_._1)).map(BigInt(_))
    val ys = ranks2(g.map(_._2)).map(BigInt(_))
    val n = BigInt(g.size)
    val num = n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum
    val dx = n * xs.map(x => x * x).sum - xs.sum * xs.sum
    val dy = n * ys.map(y => y * y).sum - ys.sum * ys.sum
    if (dx * dy == 0) None
    else {
      val mag = ((num * num * 10000) / (dx * dy)).toLong
      Some(if (num < 0) -mag else mag)
    }
  }

  test("spearman: fuzzed tie-heavy frames match driver-sorted exact ranks") {
    cases(obsGen, 10) { rows =>
      val out = EvalQueries.spearmanFromPairs(
          rows.toDF("ym", "qv", "pv"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)),
            r.getBoolean(3))).toMap
      rows.groupBy(_._1).foreach { case (ym, g) =>
        val want = refSpearman(g.map(t => (t._2, t._3)))
        val (got, strong) = out(ym)
        assert(got == want, s"ym=$ym got=$got want=$want rows=$g")
        assert(strong == want.exists(_.abs >= 2500), s"ym=$ym strong")
      }
    }
  }

  test("spearman: all-tied and two-point degenerates fail closed / exact") {
    // zero rank variance on either axis -> NULL rho², strong=false
    val allTied = Seq((0L, 5L, 1L), (0L, 5L, 2L), (0L, 5L, 3L))
    val r = EvalQueries.spearmanFromPairs(allTied.toDF("ym", "qv", "pv")).head()
    assert(r.isNullAt(2) && !r.getBoolean(3))
    // two points, distinct on both axes -> rho² = 1 exactly, sign by slope
    val two = Seq((0L, 1L, 9L), (0L, 2L, 3L))
    val r2 = EvalQueries.spearmanFromPairs(two.toDF("ym", "qv", "pv")).head()
    assert(r2.getLong(2) == -10000L && r2.getBoolean(3))
    // single row -> n=1, both denominators zero -> NULL
    val one = EvalQueries.spearmanFromPairs(
      Seq((7L, 1L, 1L)).toDF("ym", "qv", "pv")).head()
    assert(one.getLong(1) == 1L && one.isNullAt(2))
  }

  // ---- Kendall τ-b from the grid (q327/q334 readout) ----------------------

  test("kendall grid: fuzzed C/D/ties match naive all-pairs; degenerates NULL") {
    cases(obsGen, 10) { rows0 =>
      val rows = rows0.map { case (g, a, b) => ("g" + g, a, b) }
      val grid = rows.toDF("rf", "a", "b")
        .groupBy(col("rf"), col("a"), col("b")).agg(count(lit(1)).as("c"))
      val out = EvalQueries.kendallFromGrid(grid).collect()
        .map(r => r.getString(0) -> r).toMap
      rows.groupBy(_._1).foreach { case (rf, g) =>
        var (cc, dd, ta, tb) = (0L, 0L, 0L, 0L)
        for (i <- g.indices; j <- (i + 1) until g.size) {
          val (_, a1, b1) = g(i); val (_, a2, b2) = g(j)
          if (a1 != a2 && b1 != b2) {
            if ((a1 < a2) == (b1 < b2)) cc += 1 else dd += 1
          }
          if (a1 == a2) ta += 1
          if (b1 == b2) tb += 1
        }
        val r = out.getOrElse(rf, fail(s"group $rf vanished (fail-closed " +
          s"contract: degenerate groups must surface with NULLs)"))
        val n = BigInt(g.size)
        val n0 = n * (n - 1) / 2
        assert(r.getAs[Long]("n0") == n0.toLong && r.getAs[Long]("tie_a") == ta
          && r.getAs[Long]("tie_b") == tb, s"$rf margins")
        if (g.map(_._2).distinct.size < 2) {
          // single distinct a: no cell pairs -> NULL C/D and NULL τ-b²
          assert(r.isNullAt(r.fieldIndex("concordant")) &&
            r.isNullAt(r.fieldIndex("taub2_ppm_signed")), s"$rf degenerate")
        } else {
          assert(r.getAs[Long]("concordant") == cc &&
            r.getAs[Long]("discordant") == dd, s"$rf C/D")
          val den = (n0 - ta) * (n0 - tb)
          val want: Option[Long] =
            if (den == 0) None
            else {
              val cd = BigInt(cc - dd)
              Some((if (cd < 0) -1 else 1) * ((cd * cd * 1000000) / den).toLong)
            }
          val got = if (r.isNullAt(r.fieldIndex("taub2_ppm_signed"))) None
            else Some(r.getAs[Long]("taub2_ppm_signed"))
          assert(got == want, s"$rf taub2 got=$got want=$want")
        }
      }
    }
  }

  // ---- Kruskal–Wallis (q332 readout) --------------------------------------

  test("kruskal-wallis: fuzzed tie-heavy frames match driver-sorted ranks") {
    cases(obsGen, 8) { rows0 =>
      val rows = rows0.map { case (g, a, _) => (a, "g" + g) }
      val out = EvalQueries.kruskalWallis(rows.toDF("score", "g")).head()
      // independent exact reference: 2R_j from a driver sort
      val r2 = ranks2(rows.map(_._1))
      val byG = rows.map(_._2).zip(r2).groupBy(_._1)
      val n = BigInt(rows.size)
      val rsum = byG.values.map { grp =>
        val twoR = grp.map(t => BigInt(t._2)).sum
        twoR * twoR / (4 * BigInt(grp.size))
      }.sum
      val h = BigInt(12000000) * rsum / (n * (n + 1)) - 3 * (n + 1) * 1000000
      val tie = rows.map(_._1).groupBy(identity).values
        .map { g => val t = BigInt(g.size); t * t * t - t }.sum
      val n3 = n * n * n - n
      assert(out.getAs[Long]("n") == rows.size.toLong)
      assert(out.getAs[Long]("n_groups") == byG.size.toLong)
      assert(out.getAs[Long]("tie_sum") == tie.toLong)
      assert(out.getAs[Long]("h_ppm") == h.toLong)
      val want = if (n3 == tie) None else Some((h * n3 / (n3 - tie)).toLong)
      val got = if (out.isNullAt(out.fieldIndex("hc_ppm"))) None
        else Some(out.getAs[Long]("hc_ppm"))
      assert(got == want, s"hc got=$got want=$want rows=$rows")
      assert(out.getAs[Boolean]("significant") == want.exists(_ >= 9487729L))
    }
  }

  test("kruskal-wallis: all-tied input yields NULL H' and fails closed") {
    val rows = Seq((7L, "a"), (7L, "a"), (7L, "b"), (7L, "c"))
    val out = EvalQueries.kruskalWallis(rows.toDF("score", "g")).head()
    assert(out.isNullAt(out.fieldIndex("hc_ppm")))
    assert(!out.getAs[Boolean]("significant"))
  }

  // ---- Mann–Kendall + Sen (q338 readout) -----------------------------------

  /** Daily frames: per group a strictly increasing day axis with a small
    * value domain (tie-heavy); group 0 gets a SINGLE day half the time —
    * the degenerate no-pairs shape. */
  private val dailyGen: Gen[Seq[(String, Long, Long)]] = for {
    nG <- Gen.choose(1, 3)
    degenerate <- Gen.oneOf(true, false)
    k0 <- if (degenerate) Gen.const(1) else Gen.choose(2, 10)
    k1 <- Gen.choose(2, 10)
    k2 <- Gen.choose(2, 10)
    xs0 <- Gen.listOfN(k0, Gen.choose(0L, 2L))
    xs1 <- Gen.listOfN(k1, Gen.choose(0L, 2L))
    xs2 <- Gen.listOfN(k2, Gen.choose(0L, 2L))
  } yield Seq(xs0, xs1, xs2).take(nG).zipWithIndex.flatMap {
    case (xs, gi) => xs.zipWithIndex.map { case (x, i) =>
      ("g" + gi, (i * (gi + 1)).toLong, x) }
  }

  test("mann-kendall: fuzzed S/var/z²/Sen match a naive recount; 1-day NULL") {
    cases(dailyGen, 8) { rows =>
      val out = EvalQueries.mannKendall(rows.toDF("g", "day", "x")).collect()
        .map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, grp) =>
        val pts = grp.map(t => (t._2, t._3)).sortBy(_._1)
        val r = out.getOrElse(g, fail(s"group $g vanished (fail-closed)"))
        val n = pts.size.toLong
        val tie = pts.groupBy(_._2).values
          .map { q => val t = q.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
        val var18 = n * (n - 1) * (2 * n + 5) - tie
        assert(r.getAs[Long]("n_days") == n && r.getAs[Long]("var18") == var18)
        if (n == 1) {
          assert(r.isNullAt(r.fieldIndex("s_stat")) &&
            r.isNullAt(r.fieldIndex("sen_slope_ppm")) &&
            r.isNullAt(r.fieldIndex("z2_ppm")), s"$g single-day NULLs")
          assert(!r.getAs[Boolean]("significant") &&
            r.getAs[String]("direction") == "none")
        } else {
          val ps = for (i <- pts.indices; j <- (i + 1) until pts.size)
            yield (pts(i), pts(j))
          val s = ps.map { case ((_, xi), (_, xj)) =>
            java.lang.Long.signum(xj - xi).toLong }.sum
          assert(r.getAs[Long]("s_stat") == s, s"$g S")
          val slopes = ps.map { case ((di, xi), (dj, xj)) =>
            (xj - xi) * 1000000L / (dj - di) }.sorted
          assert(r.getAs[Long]("sen_slope_ppm") ==
            slopes((slopes.size + 1) / 2 - 1), s"$g sen")
          val zNum = BigInt(math.max(math.abs(s) - 1, 0L))
          val want: Option[Long] =
            if (var18 == 0) None
            else Some((zNum * zNum * 18000000 / var18).toLong)
          val got = if (r.isNullAt(r.fieldIndex("z2_ppm"))) None
            else Some(r.getAs[Long]("z2_ppm"))
          assert(got == want, s"$g z2 got=$got want=$want")
        }
      }
    }
  }
}
