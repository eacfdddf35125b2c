package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{EvalQueries, HypothesisQueries, ResamplingQueries}

/** Independent-reference fuzzing for the last statistics block that was
  * verified only against the oracle sharing its derivation (round-12
  * verdict ask #5): Mann–Whitney U (q316), Hodges–Lehmann shift (q364),
  * the Poisson-bootstrap SE (q342) and the delete-a-block jackknife
  * (q343). Every driver fold here takes the TEXTBOOK route the engine
  * deliberately avoids — plain sorts for tie-averaged ranks, the
  * brute-force n·m pairwise-difference multiset for HL, per-rep replica
  * recounts from a from-scratch md5, per-source leave-one-out loops — in
  * exact BigInt, over degenerate series the sf corpus never produces
  * (all-tied, one-sided, single-observation, single-source). A pass
  * certifies the engine's distributed formulation (rank prefix sums,
  * difference-weight frames, hash-draw ensembles), not a shared
  * formula. */
class RankResamplingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(316364L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  private def optLong(r: org.apache.spark.sql.Row, f: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))

  // ---- q316 Mann–Whitney -----------------------------------------------

  /** Driver replay from a plain sort: tie-averaged 2×ranks, then the
    * exact z²·10⁶ quotient. None = fail-closed NULL. */
  private def mwReplay(rows: Seq[(Long, Long)])
      : (Long, Long, Long, Option[Long]) = {
    val sorted = rows.sortBy(_._1)
    val n = rows.size.toLong
    val n1 = rows.count(_._2 == 1L).toLong
    // 2×tie-averaged rank per row position
    var i = 0
    var twoRPos = BigInt(0)
    var ties = BigInt(0)
    while (i < sorted.size) {
      var j = i
      while (j < sorted.size && sorted(j)._1 == sorted(i)._1) j += 1
      val twoAvg = (i + 1).toLong + j.toLong
      val block = (j - i).toLong
      ties += BigInt(block) * block * block - block
      (i until j).foreach { k => if (sorted(k)._2 == 1L) twoRPos += twoAvg }
      i = j
    }
    val u2 = twoRPos - BigInt(n1) * (n1 + 1)
    val d = u2 - BigInt(n1) * (n - n1)
    val den = BigInt(4) * n1 * (n - n1) * (BigInt(n) * n * n - n - ties)
    val z2 = if (den == 0) None
      else Some((d * d * 12 * n * (n - 1) * 1000000 / den).toLong)
    (n1, n - n1, u2.toLong, z2)
  }

  test("q316: fuzzed tie-heavy series match a plain-sort recount; all-tied and one-sided fail closed") {
    val gen: Gen[Seq[(Long, Long)]] = for {
      n <- Gen.choose(1, 30)
      shape <- Gen.oneOf("mixed", "alltied", "onesided")
      rows <- Gen.listOfN(n, for {
        s <- if (shape == "alltied") Gen.const(7L) else Gen.choose(0L, 4L)
        p <- if (shape == "onesided") Gen.const(1L) else Gen.oneOf(0L, 1L)
      } yield (s, p))
    } yield rows
    cases(gen, 10) { rows =>
      val r = EvalQueries.mannWhitney(rows.toDF("score", "pos")).collect()(0)
      val (n1, n2, u2, z2) = mwReplay(rows)
      assert(r.getAs[Long]("n_click") == n1 && r.getAs[Long]("n_view") == n2,
        "census")
      assert(r.getAs[Long]("u2") == u2, "2U")
      assert(optLong(r, "z2_ppm") == z2, "z2")
      assert(r.getAs[Boolean]("significant") == z2.exists(_ >= 3841459L),
        "gate")
    }
  }

  // ---- q364 Hodges–Lehmann ----------------------------------------------

  test("q364: fuzzed halves match the brute-force pairwise-difference median; empty halves fail closed") {
    val gen: Gen[Seq[(String, String, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 25)
      oneHalf <- Gen.oneOf(true, false) // starve one half sometimes
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        h <- if (oneHalf) Gen.const("a") else Gen.oneOf("a", "b")
        v <- Gen.choose(0L, 6L) // tie-heavy
      } yield (s"g$g", h, v))
    } yield rows
    cases(gen, 10) { rows =>
      val out = HypothesisQueries.hodgesLehmann(rows.toDF("g", "half", "v"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val as = rs.filter(_._2 == "a").map(_._3)
        val bs = rs.filter(_._2 == "b").map(_._3)
        val diffs = (for (a <- as; b <- bs) yield b - a).sorted
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n_pairs") == diffs.size.toLong, s"$g pairs")
        if (diffs.isEmpty)
          assert(r.isNullAt(r.fieldIndex("hl_shift")), s"$g empty-half NULL")
        else {
          // lower median: smallest d with cumulative weight >= ceil(t/2)
          val lowerMedian = diffs((diffs.size + 1) / 2 - 1)
          assert(r.getAs[Long]("hl_shift") == lowerMedian, s"$g shift")
        }
      }
    }
  }

  // ---- q342 Poisson bootstrap --------------------------------------------

  /** Driver replica of Kmv.hash32: first 8 hex chars of md5, base 16. */
  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(8)
    java.lang.Long.parseLong(hex, 16)
  }

  private def poissonC(u: Long): Long =
    if (u < 3679) 0L else if (u < 7358) 1L else if (u < 9197) 2L
    else if (u < 9810) 3L else 4L

  test("q342: fuzzed ensembles match a from-scratch md5 draw recount; zero-replica reps excluded") {
    val gen: Gen[Seq[(String, Long, Long)]] = for {
      nG <- Gen.choose(1, 2)
      n <- Gen.choose(1, 12) // tiny n makes zero-replica reps REAL (P=.37^n)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        v <- Gen.choose(-50L, 50L)
      } yield (s"g$g", v))
    } yield rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
    val B = 8
    cases(gen, 8) { rows =>
      val out = ResamplingQueries.bootstrapSe(
        rows.toDF("g", "eid", "v"), b = B)
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val reps = (1 to B).flatMap { j =>
          val cs = rs.map { case (_, eid, v) =>
            (poissonC(hash32(s"$eid:$j") % 10000), v) }
          val nc = cs.map(_._1).sum
          if (nc == 0) None
          else Some(cs.map { case (c, v) => BigInt(c) * v }.sum * 1000000 /
            nc)
        }
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n") == rs.size.toLong, s"$g n")
        assert(r.getAs[Long]("mean_ppm") ==
          (rs.map(x => BigInt(x._3)).sum * 1000000 / rs.size).toLong,
          s"$g mean")
        assert(r.getAs[Long]("b_eff") == reps.size.toLong, s"$g b_eff")
        val bEff = BigInt(reps.size)
        val sm = reps.map(m => BigInt(m.toLong)).sum
        val smm = reps.map(m => BigInt(m.toLong) * m.toLong).sum
        val se2 = (bEff * smm - sm * sm) / (bEff * (bEff - 1))
        val se = graft.functions.Isqrt.impl(se2.toLong)
        assert(r.getAs[Long]("se_ppm") == se, s"$g se")
        assert(r.getAs[Long]("ci_lo_ppm") ==
          r.getAs[Long]("mean_ppm") - 2 * se, s"$g ci")
      }
    }
  }

  // ---- q343 delete-a-block jackknife --------------------------------------

  test("q343: fuzzed corpora match a leave-one-out loop; a whole-corpus source fails closed") {
    val gen: Gen[Seq[(String, Long)]] = for {
      nS <- Gen.choose(1, 4) // nS = 1 exercises the 0/0-guarded loo
      n <- Gen.choose(1, 20)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nS - 1)
        v <- Gen.choose(0L, 40L)
      } yield (s"s$s", v))
    } yield rows
    cases(gen, 10) { rows =>
      val out = ResamplingQueries.jackknifeBlocks(rows.toDF("source", "v"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      val n = BigInt(rows.size)
      val t = BigInt(rows.map(_._2).sum)
      val bySrc = rows.groupBy(_._1)
      val loos = bySrc.view.mapValues { rs =>
        val ns = rs.size; val ts = rs.map(_._2).sum
        if (n - ns == 0) None
        else Some((t - ts) * 1000000 / (n - ns))
      }.toMap
      val defined = loos.values.flatten.toSeq
      bySrc.foreach { case (s, rs) =>
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_s") == rs.size.toLong &&
          r.getAs[Long]("t_s") == rs.map(_._2).sum, s"$s census")
        assert(r.getAs[Long]("mean_all_ppm") == (t * 1000000 / n).toLong,
          s"$s mean")
        assert(optLong(r, "loo_ppm") == loos(s).map(_.toLong), s"$s loo")
        if (loos(s).isEmpty)
          assert(r.isNullAt(r.fieldIndex("influence_ppm")),
            s"$s whole-corpus NULL influence")
        // a NULL loo only happens when the source IS the whole corpus
        // (single-source), where the all-NULL sum is NULL on both
        // engines -> variance NULL, never a fabricated zero
        val sCnt = BigInt(bySrc.size)
        val expVar =
          if (defined.isEmpty) None
          else {
            val sl = defined.sum
            val sll = defined.map(x => x * x).sum
            Some((sCnt - 1) * (sCnt * sll - sl * sl) / (sCnt * sCnt * sCnt))
          }
        assert(optLong(r, "var_jack_ppm2") == expVar.map(_.toLong),
          s"$s var")
      }
    }
  }
}
