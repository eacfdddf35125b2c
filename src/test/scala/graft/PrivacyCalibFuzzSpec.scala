package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{CalibrationQueries, PrivacyQueries}

/** Property-based fuzzing for the privacy/calibration families: the
  * sf corpus exercises none of their degenerate shapes (negative
  * outcomes, all-tied scores, single-bucket sensitive domains,
  * single-value sources), and those are exactly where the minimax/PAV
  * equivalence, the inverse-CDF boundary convention, and the EMD
  * (B−1)-normalization guard bite. Every case is checked EXACTLY
  * against an independent driver-side BigInt implementation — for the
  * isotonic fit that reference is the SEQUENTIAL pool-adjacent-violators
  * sweep, a genuinely different algorithm from the engine's bounded
  * minimax, so a pass certifies the floor-commutes-with-min/max argument
  * on arbitrary inputs, negatives included (both engines and BigInt
  * truncate division toward zero). Generator driving follows
  * PropertySpec's deterministic seed pattern; case counts are small
  * because each case is a full Spark job chain. */
class PrivacyCalibFuzzSpec extends SparkSpec {
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

  // ---- q350 isotonic: minimax == sequential PAV, negatives included ------

  /** Sequential PAV in exact rationals; fitted ppm truncated toward
    * zero, the shared integral-division convention. */
  private def pavPpm(buckets: Seq[(Long, Long)]): Seq[Long] = {
    val stack = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt, Int)]
    for ((nB, sB) <- buckets) {
      stack += ((BigInt(nB), BigInt(sB), 1))
      while (stack.size >= 2 && {
        val (n2, s2, _) = stack(stack.size - 1)
        val (n1, s1, _) = stack(stack.size - 2)
        s1 * n2 > s2 * n1
      }) {
        val (n2, s2, w2) = stack.remove(stack.size - 1)
        val (n1, s1, w1) = stack.remove(stack.size - 1)
        stack += ((n1 + n2, s1 + s2, w1 + w2))
      }
    }
    stack.toSeq.flatMap { case (n, sSum, w) =>
      Seq.fill(w)((sSum * 1000000 / n).toLong) }
  }

  /** (g, x, y) points: tiny x domain (heavy bucket ties), SIGNED y. */
  private val ptsGen: Gen[Seq[(String, Long, Long)]] = for {
    nG <- Gen.choose(1, 2)
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, nG - 1).map(i => s"g$i")
      x <- Gen.choose(0L, 5L)
      y <- Gen.choose(-100L, 100L)
    } yield (g, x, y))
  } yield rows

  test("q350 fuzz: minimax fit == sequential PAV on signed, tied inputs") {
    cases(ptsGen, 10) { rows =>
      val out = CalibrationQueries.isotonic(rows.toDF("g", "x", "y"))
        .collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("k_val")) ->
          (r.getAs[Long]("raw_cents_ppm"), r.getAs[Long]("iso_cents_ppm")))
        .toMap
      for ((g, grs) <- rows.groupBy(_._1)) {
        val buckets = grs.groupBy(_._2).toSeq.sortBy(_._1)
          .map { case (x, rs) => (x, rs.size.toLong, rs.map(_._3).sum) }
        val fit = pavPpm(buckets.map(b => (b._2, b._3)))
        buckets.zip(fit).foreach { case ((x, nB, sB), f) =>
          val (raw, iso) = out((g, x))
          assert(raw == (BigInt(sB) * 1000000 / nB).toLong, s"$g/$x raw")
          assert(iso == f, s"$g/$x minimax=$iso pav=$f in $buckets")
        }
        val isoSeq = buckets.map(b => out((g, b._1))._2)
        assert(isoSeq.zip(isoSeq.tail).forall { case (a, b) => a <= b },
          s"$g not monotone: $isoSeq")
      }
    }
  }

  // ---- q349 quantile normalization: boundary + degenerate sources --------

  /** (source, v) rows: 1–3 sources, values over a tiny domain so
    * single-value sources and full ties occur. */
  private val docGen: Gen[Seq[(String, Long)]] = for {
    nS <- Gen.choose(1, 3)
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      s <- Gen.choose(0, nS - 1).map(i => s"s$i")
      v <- Gen.choose(0L, 4L)
    } yield (s, v))
  } yield rows

  test("q349 fuzz: inverse-CDF mapping matches a BigInt recount") {
    cases(docGen, 10) { rows =>
      val out = CalibrationQueries.quantileNorm(rows.toDF("source", "v"))
        .collect()
        .map(r => r.getAs[String]("source") ->
          (r.getAs[Long]("n_s"), r.getAs[Long]("mean_raw_ppm"),
            r.getAs[Long]("mean_norm_ppm"), r.getAs[Long]("min_norm"),
            r.getAs[Long]("max_norm"))).toMap
      val n = BigInt(rows.size)
      val gVals = rows.map(_._2).distinct.sorted
      val gCum = gVals.map(v => v -> rows.count(_._2 <= v).toLong)
      for ((src, rs) <- rows.groupBy(_._1)) {
        val nS = BigInt(rs.size)
        val mapped = rs.map { case (_, v) =>
          val cumS = BigInt(rs.count(_._2 <= v))
          gCum.find { case (_, cg) => BigInt(cg) * nS >= cumS * n }.get._1
        }
        val (nOut, mr, mn, lo, hi) = out(src)
        assert(nOut == rs.size.toLong, s"$src n")
        assert(mr == (BigInt(rs.map(_._2).sum) * 1000000 / nS).toLong,
          s"$src raw")
        assert(mn == (BigInt(mapped.sum) * 1000000 / nS).toLong, s"$src norm")
        assert(lo == mapped.min && hi == mapped.max, s"$src range")
      }
      // structural: the top of every source's distribution maps to the
      // pooled maximum (cum_s = n_s clears every rank line)
      assert(out.values.forall(_._5 == gVals.max), "max must map to pooled max")
    }
  }

  // ---- q348 t-closeness: single-bucket domains fail closed ----------------

  /** (g, day, sens) released rows: sens over 0..29 (1–3 deciles), a
    * fraction of cases collapsing to a single global bucket. */
  private val relGen: Gen[Seq[(String, String, Long)]] = for {
    maxSens <- Gen.oneOf(9L, 9L, 29L) // 1/3 of cases: single decile
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      g <- Gen.choose(0, 1).map(i => s"t$i")
      day <- Gen.choose(1, 3).map(i => s"2024-01-0$i")
      sv <- Gen.choose(0L, maxSens)
    } yield (g, day, sv))
  } yield rows

  test("q348 fuzz: EMD matches a BigInt recount; one bucket -> NULL") {
    cases(relGen, 10) { rows =>
      val out = PrivacyQueries.tCloseness(rows.toDF("g", "day", "sens"))
        .collect()
        .map(r => r.getAs[String]("event_type") -> r).toMap
      val rel = rows.map { case (g, day, sv) => (g, day, sv / 10) }
      val buckets = rel.map(_._3).distinct.sorted
      val nB = buckets.size
      val nG = BigInt(rel.size)
      val gCum = buckets.map(b => rel.count(_._3 <= b).toLong)
      for ((g, grs) <- rel.groupBy(_._1)) {
        val r = out(g)
        assert(r.getAs[Long]("n_classes") ==
          grs.map(_._2).distinct.size.toLong, s"$g classes")
        if (nB == 1) {
          assert(r.isNullAt(r.fieldIndex("max_emd_ppm")),
            s"$g: single bucket must fail closed")
          assert(r.getAs[Long]("classes_over_t20") == 0L, s"$g over_t")
        } else {
          val emds = grs.groupBy(_._2).toSeq.map { case (_, rs) =>
            val nC = BigInt(rs.size)
            val num = buckets.zipWithIndex.map { case (b, i) =>
              val cumC = BigInt(rs.count(_._3 <= b))
              (cumC * nG - BigInt(gCum(i)) * nC).abs
            }.sum
            (num * 1000000 / (nC * nG * (nB - 1))).toLong
          }
          assert(r.getAs[Long]("max_emd_ppm") == emds.max, s"$g max")
          assert(r.getAs[Long]("classes_over_t20") ==
            emds.count(_ > 200000L).toLong, s"$g over_t")
        }
      }
    }
  }
}
