package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Ilog2
import graft.queries.LexicalQueries

/** Degenerate-input fuzzing for the lexical/concentration family,
  * written WITH the family (the round-11 lesson: a statistic that ships
  * without an independent reference can share a flaw with its oracle).
  * Every statistic is recomputed exactly from a plain driver fold —
  * scala sorts, BigInt arithmetic, the same public Ilog2.impl fold —
  * over corpora the sf tables never produce: all-singleton sources
  * (f2 = 0), empty-text sources (fail-closed NULL rows asserted
  * PRESENT), single-token vocabularies (Zipf n < 2 → NULL), types with
  * every value below 1 (Benford NULL), all-mass-in-one-digit grids,
  * constant-length sources (Gini exactly 0) and zero-length corpora
  * (Gini NULL). */
class LexicalFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(4444L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  /** (source, text) docs over a tiny vocabulary (heavy collisions, real
    * singleton/doubleton structure); some texts empty. */
  private val docsGen: Gen[Seq[(String, String)]] = for {
    nS <- Gen.choose(1, 3)
    n <- Gen.choose(1, 15)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, nS - 1)
      k <- Gen.choose(0, 6)
      ws <- Gen.listOfN(k, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield (s"s$s", ws.mkString(" ")))
  } yield rows

  private def tokenCounts(rows: Seq[(String, String)]): Map[String, Map[String, Long]] =
    rows.groupBy(_._1).view.mapValues { rs =>
      rs.flatMap(_._2.toLowerCase.split("\\W+").filter(_.nonEmpty))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap

  test("chao1 / good-turing: fuzzed corpora match; empty sources fail closed") {
    cases(docsGen, 8) { rows =>
      val cnt = tokenCounts(rows)
      val ch = LexicalQueries.chao1(rows.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      val gt = LexicalQueries.goodTuring(rows.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      rows.map(_._1).distinct.foreach { s =>
        val m = cnt(s)
        val rc = ch.getOrElse(s, fail(s"$s vanished from chao1"))
        val rg = gt.getOrElse(s, fail(s"$s vanished from good-turing"))
        if (m.isEmpty) {
          // all-empty texts: the source must be PRESENT with NULL census
          assert(rc.isNullAt(rc.fieldIndex("chao1")), s"$s empty chao1")
          assert(rg.isNullAt(rg.fieldIndex("p0_ppm")), s"$s empty gt")
        } else {
          val v = m.size.toLong
          val f1 = m.values.count(_ == 1L).toLong
          val f2 = m.values.count(_ == 2L).toLong
          val n = m.values.sum
          assert(rc.getAs[Long]("v_obs") == v && rc.getAs[Long]("f1") == f1 &&
            rc.getAs[Long]("f2") == f2 && rc.getAs[Long]("n_tokens") == n,
            s"$s census")
          assert(rc.getAs[Long]("chao1") ==
            v + (BigInt(f1) * (f1 - 1) / (2 * (f2 + 1))).toLong, s"$s chao1")
          assert(rg.getAs[Long]("p0_ppm") ==
            (BigInt(f1) * 1000000 / n).toLong, s"$s p0")
          if (f1 == 0)
            assert(rg.isNullAt(rg.fieldIndex("r1_star_micro")), s"$s r1 null")
          else assert(rg.getAs[Long]("r1_star_micro") ==
            (BigInt(f2) * 2000000 / f1).toLong, s"$s r1")
        }
      }
    }
  }

  test("zipf slope: fuzzed vocabularies match an Ilog2 OLS recount; n<2 fails closed") {
    cases(docsGen, 8) { rows =>
      val out = LexicalQueries.zipfSlope(rows.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      tokenCounts(rows).foreach { case (s, m) =>
        if (m.nonEmpty) {
          val top = m.toSeq.sortBy { case (t, c) => (-c, t) }.take(100)
          val pts = top.zipWithIndex.map { case ((_, c), i) =>
            (Ilog2.impl(i + 1L), Ilog2.impl(c)) }
          val r = out.getOrElse(s, fail(s"$s vanished"))
          assert(r.getAs[Long]("n_top") == pts.length.toLong, s"$s n_top")
          if (pts.length < 2)
            assert(r.isNullAt(r.fieldIndex("slope_ppm")), s"$s single-token")
          else {
            val n = BigInt(pts.length)
            val sx = pts.map(p => BigInt(p._1)).sum
            val sy = pts.map(p => BigInt(p._2)).sum
            val sxy = pts.map(p => BigInt(p._1) * p._2).sum
            val sxx = pts.map(p => BigInt(p._1) * p._1).sum
            val slope = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
            assert(r.getAs[Long]("slope_ppm") == slope.toLong, s"$s slope")
          }
        }
      }
    }
  }

  test("benford: fuzzed digit grids match; sub-1 types and one-digit mass exact") {
    val P = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val relGen: Gen[Seq[(String, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 40)
      oneDigit <- Gen.oneOf(true, false)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        v <- if (oneDigit) Gen.choose(10L, 19L) // first digit always 1
             else Gen.choose(-5L, 999L)         // includes sub-1 values
      } yield (s"g$g", v))
    } yield rows
    cases(relGen, 8) { rows =>
      val out = LexicalQueries.benford(rows.toDF("g", "v"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val pos = rs.map(_._2).filter(_ >= 1L)
        val r = out.getOrElse(g, fail(s"$g vanished"))
        if (pos.isEmpty) {
          assert(r.isNullAt(r.fieldIndex("chi2_micro")) &&
            r.isNullAt(r.fieldIndex("benford")), s"$g sub-1 fail-closed")
        } else {
          val o = pos.groupBy(v => v.toString.head.asDigit.toLong)
            .view.mapValues(_.size.toLong).toMap
          val n = BigInt(pos.size)
          val chi = (1 to 9).map { d =>
            val od = BigInt(o.getOrElse(d.toLong, 0L))
            val t = od * 1000000 - n * P(d - 1)
            t * t / (n * P(d - 1))
          }.sum
          assert(r.getAs[Long]("n") == n.toLong, s"$g n")
          assert(r.getAs[Long]("chi2_micro") == chi.toLong, s"$g chi2")
          assert(r.getAs[Boolean]("benford") == (chi <= 15507313), s"$g gate")
        }
      }
    }
  }

  test("sqrt mixture: fuzzed corpora match a BigInt isqrt recount; empty corpus fails closed") {
    def isqrtExact(n: Long): Long = {
      var r = math.max(math.sqrt(n.toDouble).toLong - 2, 0L)
      while ((r + 1) * (r + 1) <= n) r += 1
      r
    }
    cases(docsGen, 8) { rows =>
      val out = LexicalQueries.sqrtMixture(rows.toDF("source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      val tok = rows.groupBy(_._1).view.mapValues(
        _.map(_._2.split("\\s+").count(_.nonEmpty).toLong).sum).toMap
      val nAll = BigInt(tok.values.sum)
      val rtAll = BigInt(tok.values.map(isqrtExact).sum)
      tok.foreach { case (s, n) =>
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_tok") == n, s"$s n_tok")
        if (nAll == 0) assert(r.isNullAt(r.fieldIndex("share_ppm")), s"$s all-empty")
        else {
          val share = BigInt(n) * 1000000 / nAll
          val weight = BigInt(isqrtExact(n)) * 1000000 / rtAll
          assert(r.getAs[Long]("share_ppm") == share.toLong, s"$s share")
          assert(r.getAs[Long]("weight_ppm") == weight.toLong, s"$s weight")
          if (share == 0)
            assert(r.isNullAt(r.fieldIndex("boost_micro")), s"$s zero-share boost")
          else assert(r.getAs[Long]("boost_micro") ==
            (weight * 1000000 / share).toLong, s"$s boost")
        }
      }
    }
  }

  test("dedup tokens: cross-source elections match; all-losers source fails closed") {
    // duplicate texts ACROSS sources: the keeper is the global min doc_id,
    // so a source can lose every election (n_keepers 0, waste 1e6)
    val dupGen: Gen[Seq[(Long, String, String)]] = for {
      nS <- Gen.choose(1, 3)
      n <- Gen.choose(1, 12)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nS - 1)
        t <- Gen.oneOf("aa bb", "cc", "dd ee ff", "", "aa")
      } yield (s"s$s", t))
    } yield rows.zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
    cases(dupGen, 8) { rows =>
      val out = LexicalQueries.dedupTokens(rows.toDF("doc_id", "source", "text"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      val keepers = rows.groupBy(_._3).values.map(_.map(_._1).min).toSet
      rows.groupBy(_._2).foreach { case (s, rs) =>
        def tk(t: String) = t.split("\\s+").count(_.nonEmpty).toLong
        val raw = rs.map(r => tk(r._3)).sum
        val kept = rs.filter(r => keepers(r._1))
        val eff = kept.map(r => tk(r._3)).sum
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_docs") == rs.size.toLong &&
          r.getAs[Long]("tok_raw") == raw &&
          r.getAs[Long]("n_keepers") == kept.size.toLong &&
          r.getAs[Long]("tok_eff") == eff, s"$s census")
        if (raw == 0) assert(r.isNullAt(r.fieldIndex("waste_ppm")), s"$s 0/0")
        else assert(r.getAs[Long]("waste_ppm") ==
          (BigInt(raw - eff) * 1000000 / raw).toLong, s"$s waste")
      }
    }
  }

  test("trimmed mean: fuzzed lengths match a sort-and-trim driver fold") {
    val lenGen2: Gen[Seq[(String, Long)]] = for {
      nS <- Gen.choose(1, 3)
      n <- Gen.choose(1, 35)
      constant <- Gen.oneOf(true, false)
      cv <- Gen.choose(0L, 40L)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nS - 1)
        v <- if (constant) Gen.const(cv) else Gen.choose(0L, 40L)
      } yield (s"s$s", v))
    } yield rows
    cases(lenGen2, 8) { rows =>
      val out = LexicalQueries.trimmedMean(rows.toDF("source", "v"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      rows.groupBy(_._1).foreach { case (s, rs) =>
        val vs = rs.map(_._2).sorted
        val n = vs.length
        val t = n / 10
        val kept = vs.slice(t, n - t)
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_docs") == n.toLong &&
          r.getAs[Long]("n_trimmed_per_tail") == t.toLong, s"$s census")
        assert(r.getAs[Long]("lo_cut") == vs(t) &&
          r.getAs[Long]("hi_cut") == vs(n - t - 1), s"$s cuts")
        assert(r.getAs[Long]("trimmed_mean_ppm") ==
          (BigInt(kept.sum) * 1000000 / kept.length).toLong, s"$s mean")
      }
    }
  }

  test("gini: fuzzed lengths match an O(n^2) pairwise recount; constants exact") {
    val lenGen: Gen[Seq[(String, Long)]] = for {
      nS <- Gen.choose(1, 3)
      n <- Gen.choose(1, 25)
      constant <- Gen.oneOf(true, false)
      cv <- Gen.choose(0L, 50L)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nS - 1)
        v <- if (constant) Gen.const(cv) else Gen.choose(0L, 50L)
      } yield (s"s$s", v))
    } yield rows
    cases(lenGen, 8) { rows =>
      val out = LexicalQueries.giniLengths(rows.toDF("source", "v"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      rows.groupBy(_._1).foreach { case (s, rs) =>
        val vs = rs.map(_._2)
        val n = BigInt(vs.size)
        val t = BigInt(vs.sum)
        // independent reference: the O(n^2) mean-absolute-difference form
        val pairAbs = (for (a <- vs; b <- vs) yield BigInt((a - b).abs)).sum
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_docs") == n.toLong &&
          r.getAs[Long]("total_chars") == t.toLong, s"$s census")
        if (t == 0)
          assert(r.isNullAt(r.fieldIndex("gini_ppm")), s"$s zero-total NULL")
        else {
          // pairAbs counts each unordered pair twice -> P = pairAbs/2,
          // G*1e6 = 2*P*1e6 div (n*T) = pairAbs*1e6 div (n*T)
          assert(r.getAs[Long]("gini_ppm") ==
            (pairAbs * 1000000 / (n * t)).toLong, s"$s gini")
          if (vs.distinct.size == 1)
            assert(r.getAs[Long]("gini_ppm") == 0L, s"$s constant = 0")
        }
      }
    }
  }

  /** q393's trimmed mean against a plain sort-and-drop driver fold —
    * the round-12 verdict's ask #4: the windowed clip arithmetic
    * (lo_clip/hi_clip off cumulative counts) must agree with the
    * textbook definition on corpora the sf tables never produce,
    * especially n ≤ 10 where t = ⌊n/10⌋ = 0 and NOTHING may be
    * trimmed (lo_cut = min, hi_cut = max, trimmed mean = mean). */
  test("trimmed mean: fuzzed lengths match a sort-and-drop recount; n<=10 trims nothing") {
    val lenGen: Gen[Seq[(String, Long)]] = for {
      nS <- Gen.choose(1, 3)
      tiny <- Gen.oneOf(true, false) // force the t = 0 regime half the time
      n <- if (tiny) Gen.choose(1, 10) else Gen.choose(1, 45)
      constant <- Gen.oneOf(true, false)
      cv <- Gen.choose(0L, 30L)
      rows <- Gen.listOfN(n, for {
        s <- Gen.choose(0, nS - 1)
        v <- if (constant) Gen.const(cv) else Gen.choose(0L, 20L) // heavy ties
      } yield (s"s$s", v))
    } yield rows
    cases(lenGen, 10) { rows =>
      val out = LexicalQueries.trimmedMean(rows.toDF("source", "v"))
        .collect().map(r => r.getAs[String]("source") -> r).toMap
      rows.groupBy(_._1).foreach { case (s, rs) =>
        val vs = rs.map(_._2).sorted
        val n = vs.size
        val t = n / 10
        val kept = vs.slice(t, n - t)
        val st = kept.map(BigInt(_)).sum
        val r = out.getOrElse(s, fail(s"$s vanished"))
        assert(r.getAs[Long]("n_docs") == n.toLong &&
          r.getAs[Long]("n_trimmed_per_tail") == t.toLong, s"$s census")
        assert(r.getAs[Long]("lo_cut") == vs(t), s"$s lo_cut")
        assert(r.getAs[Long]("hi_cut") == vs(n - t - 1), s"$s hi_cut")
        assert(r.getAs[Long]("trimmed_mean_ppm") ==
          (st * 1000000 / (n - 2 * t)).toLong, s"$s trimmed mean")
        if (n <= 10) {
          assert(t == 0, s"$s tiny census must not trim")
          assert(r.getAs[Long]("lo_cut") == vs.min &&
            r.getAs[Long]("hi_cut") == vs.max, s"$s untrimmed cuts")
          assert(r.getAs[Long]("trimmed_mean_ppm") ==
            (vs.map(BigInt(_)).sum * 1000000 / n).toLong, s"$s plain mean")
        }
      }
    }
  }
}
