package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.ExperimentQueries

/** Degenerate-input fuzzing for the q392 two-look Pocock gate — the
  * round-12 verdict's ask #4: the decision boundary had stress gates
  * but no exact-BigInt driver fold (the discipline that caught the PACF
  * and Mood wrap bugs). Every case recomputes
  * z²·10⁶ = (x·10⁶ − 400000·n)² div (240000·n) from plain BigInt and
  * replays the verdict logic: reject at the FIRST look whose statistic
  * meets 4 743 684 = ⌊2.178²·10⁶⌋, NULL looks (n = 0) are
  * non-crossings, exact-threshold equality FIRES (the gate is ≥).
  * Shapes the sf tables never produce: single-look-only groups,
  * all-k<50 (x = n) and all-k≥50 (x = 0) groups, and the searched
  * exact-boundary census (n = 44 388, x = 17 980) whose statistic is
  * EXACTLY the critical value. */
class ExperimentFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Thr = 4743684L

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(392392L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  /** Exact driver fold of the per-look statistic; None = fail-closed. */
  private def z2(x: Long, n: Long): Option[Long] =
    if (n == 0) None
    else {
      val d = BigInt(x) * 1000000 - BigInt(400000) * n
      Some((d * d / (BigInt(240000) * n)).toLong)
    }

  /** Full driver replay of the q392 verdict over raw (g, look, k) rows. */
  private def replay(rows: Seq[(String, Long, Long)])
      : Map[String, (Long, Long, Option[Long], Long, Long, Option[Long],
                     Option[Long], String)] =
    rows.groupBy(_._1).view.mapValues { rs =>
      val l1 = rs.filter(_._2 == 1L)
      val n1 = l1.size.toLong
      val x1 = l1.count(_._3 < 50).toLong
      val n2 = rs.size.toLong
      val x2 = rs.count(_._3 < 50).toLong
      val z1 = z2(x1, n1); val zz2 = z2(x2, n2)
      val look =
        if (z1.exists(_ >= Thr)) Some(1L)
        else if (zz2.exists(_ >= Thr)) Some(2L)
        else None
      (n1, x1, z1, n2, x2, zz2, look,
        if (look.isDefined) "reject_h0" else "accept_h0")
    }.toMap

  private def check(rows: Seq[(String, Long, Long)]): Unit = {
    val out = ExperimentQueries.pocockTwoLook(rows.toDF("g", "look", "k"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val exp = replay(rows)
    assert(out.keySet == exp.keySet, "group universe")
    for ((g, (n1, x1, z1, n2, x2, zz2, look, dec)) <- exp) {
      val r = out(g)
      assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("x1") == x1,
        s"$g look-1 census")
      assert(r.getAs[Long]("n2") == n2 && r.getAs[Long]("x2") == x2,
        s"$g look-2 census")
      def optLong(f: String): Option[Long] =
        if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))
      assert(optLong("z2_1_micro") == z1, s"$g z2_1")
      assert(optLong("z2_2_micro") == zz2, s"$g z2_2")
      assert(optLong("reject_look") == look, s"$g reject look")
      assert(r.getAs[String]("decision") == dec, s"$g decision")
    }
  }

  test("q392: exact-threshold census fires at look 1; one observation fewer does not") {
    // searched boundary: (x·10⁶ − 400000·n)² div (240000·n) == 4743684
    // exactly at n = 44388, x = 17980 (and z² is monotone in |x − 0.4n|,
    // so x = 17979 sits strictly below with the SAME n)
    val n = 44388; val x = 17980
    assert(z2(x.toLong, n.toLong).contains(Thr), "searched pair drifted")
    def census(g: String, xx: Int): Seq[(String, Long, Long)] =
      (Seq.fill(xx)((g, 1L, 0L)) ++ Seq.fill(n - xx)((g, 1L, 99L)))
    check(census("at", x) ++ census("below", x - 1))
  }

  test("q392: single-look groups fail closed; saturated shares reject") {
    check(
      // only look-2 rows: n1 = 0 → z2_1 NULL, verdict falls to look 2
      Seq.fill(30)(("late", 2L, 10L)) ++
      // only look-1 rows: n2 == n1 (look 1 counts in the full-month look)
      Seq.fill(30)(("early", 1L, 10L)) ++
      // all-k<50 and all-k≥50: the extreme shares, reject at look 1
      Seq.fill(25)(("alllo", 1L, 0L)) ++ Seq.fill(25)(("allhi", 1L, 77L)) ++
      // one-observation groups (smallest legal census)
      Seq(("one1", 1L, 3L), ("one2", 2L, 88L)))
  }

  /** q399's tail-dependence readout against a plain sort-and-count
    * driver fold: thresholds from the ceil-rank order statistic on a
    * sorted copy, tail counts by filtering, every division exact BigInt.
    * Degenerates: constant x (empty tail → NULL λ/lift, false gate),
    * perfectly coupled y = x (maximal lift), tiny n. */
  test("q399: fuzzed frames match a sort-and-count recount; constant marginals fail closed") {
    val gen: Gen[Seq[(String, Long, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 40)
      shape <- Gen.oneOf("indep", "coupled", "constx")
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        x <- if (shape == "constx") Gen.const(7L) else Gen.choose(0L, 19L)
        y <- if (shape == "coupled") Gen.const(-1L) else Gen.choose(0L, 9L)
      } yield (s"g$g", x, if (y == -1L) x else y))
    } yield rows
    cases(gen, 10) { rows =>
      val out = ExperimentQueries.tailDependence(rows.toDF("g", "x", "y"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val n = rs.size.toLong
        def thr(vs: Seq[Long]): Long = {
          val sorted = vs.sorted
          sorted(((90 * n + 99) / 100 - 1).toInt) // ceil-rank order stat
        }
        val tx = thr(rs.map(_._2)); val ty = thr(rs.map(_._3))
        val nx = rs.count(_._2 > tx).toLong
        val ny = rs.count(_._3 > ty).toLong
        val nxy = rs.count(r => r._2 > tx && r._3 > ty).toLong
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n") == n && r.getAs[Long]("tx") == tx &&
          r.getAs[Long]("ty") == ty, s"$g thresholds")
        assert(r.getAs[Long]("n_x") == nx && r.getAs[Long]("n_y") == ny &&
          r.getAs[Long]("n_xy") == nxy, s"$g tails")
        def opt(f: String): Option[Long] =
          if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))
        assert(opt("lambda_u_ppm") ==
          (if (nx == 0) None else Some((BigInt(nxy) * 1000000 / nx).toLong)),
          s"$g lambda")
        val lift = if (nx == 0 || ny == 0) None
          else Some((BigInt(nxy) * n * 1000000 / (BigInt(nx) * ny)).toLong)
        assert(opt("lift_ppm") == lift, s"$g lift")
        assert(r.getAs[Boolean]("dependent") ==
          lift.exists(_ >= 2000000L), s"$g gate")
      }
    }
  }

  /** Random-census fuzz (moved here from LexicalFuzzSpec — this is the
    * statistic's family file), with the one-sided / second-look-only
    * generator knobs that exercise the fail-closed paths. */
  test("q392: random censuses match the BigInt replay; empty look-1 exact") {
    val gen: Gen[Seq[(String, Long, Long)]] = for {
      nG <- Gen.choose(1, 4)
      n <- Gen.choose(1, 60)
      oneSided <- Gen.oneOf(true, false)
      secondOnly <- Gen.oneOf(true, false)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        look <- if (secondOnly) Gen.const(2L) else Gen.oneOf(1L, 2L)
        k <- if (oneSided) Gen.const(10L) else Gen.choose(0L, 99L)
      } yield (s"g$g", look, k))
    } yield rows
    cases(gen, 10)(check)
  }
}
