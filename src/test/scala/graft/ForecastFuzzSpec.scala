package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Cusum, Ewma}

/** Independent-reference fuzzing for the forecast/smoothing family —
  * the round-11 verdict's gap: Holt, Holt–Winters, EWMA and CUSUM
  * predate the fuzz discipline and were verified only against DuckDB
  * oracles that REPLAY the same recurrence with the same constants, so
  * a flaw shared by both derivations (the PACF gapped-series precedent)
  * would pass every hash. Here each operator's output is recomputed by
  * a plain driver fold — scala sorts and explicit loops, none of the
  * engine's repartition/sortWithinPartitions/mapPartitions machinery —
  * over fuzzed series the sf corpus never produces: constant, gapped,
  * shorter-than-one-season, negative-trend, interleaved multi-key, and
  * order-tie-heavy inputs, plus exact-threshold CUSUM ties.
  * Deterministic seed driving per PropertySpec; small case counts (each
  * case is a full Spark chain). */
class ForecastFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(3333L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  /** (key, order, id, x) rows with few distinct orders (tie-heavy: the
    * tie column must decide), sparse orders (gaps), signed values. Ids
    * are globally unique so each output row is addressable. */
  private def seriesGen(minX: Long, maxX: Long): Gen[Seq[(Long, Long, Long, Long)]] =
    for {
      nK <- Gen.choose(1, 3)
      n <- Gen.choose(1, 30)
      constant <- Gen.oneOf(true, false)
      cv <- Gen.choose(minX.max(0L), maxX)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(0L, nK - 1L)
        o <- Gen.choose(0L, 9L)
        x <- if (constant) Gen.const(cv) else Gen.choose(minX, maxX)
      } yield (k, o, x))
    } yield rows.zipWithIndex.map { case ((k, o, x), i) => (k, o, i.toLong, x) }

  private def sortedRuns(rows: Seq[(Long, Long, Long, Long)])
      : Map[Long, Seq[(Long, Long)]] =
    rows.groupBy(_._1).view.mapValues(
      _.sortBy(r => (r._2, r._3)).map(r => (r._3, r._4))).toMap

  test("ewma: fuzzed runs match a driver fold; constant series is a fixpoint") {
    cases(seriesGen(0L, 7L), 8) { rows =>
      val out = Ewma.halfLife(rows.toDF("k", "o", "id", "x"),
          "k", "o", "id", "x")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("ewma")).toMap
      assert(out.size == rows.size, "one output row per input row")
      sortedRuns(rows).foreach { case (_, run) =>
        var s = 0L
        run.zipWithIndex.foreach { case ((id, x), i) =>
          s = if (i == 0) x else (s + x) / 2
          assert(out(id) == s, s"id $id")
        }
        // a constant-valued run must hold the constant exactly
        if (run.map(_._2).distinct.size == 1)
          run.foreach { case (id, x) => assert(out(id) == x, "fixpoint") }
      }
    }
    // the non-negative contract is enforced, not assumed
    intercept[org.apache.spark.SparkException] {
      Ewma.halfLife(Seq((0L, 0L, 0L, -1L)).toDF("k", "o", "id", "x"),
        "k", "o", "id", "x").collect()
    }
  }

  test("holt: fuzzed signed runs match; falling series carries negative trend") {
    cases(seriesGen(-9L, 9L), 8) { rows =>
      val out = Ewma.holt(rows.toDF("k", "o", "id", "x"), "k", "o", "id", "x")
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("level"), r.getAs[Long]("trend")))).toMap
      sortedRuns(rows).foreach { case (_, run) =>
        var l = 0L; var b = 0L
        run.zipWithIndex.foreach { case ((id, x), i) =>
          if (i == 0) { l = x; b = 0L }
          else {
            val l1 = (l + b + x) / 2
            b = (b + l1 - l) / 2
            l = l1
          }
          assert(out(id) == ((l, b)), s"id $id")
        }
      }
    }
    // strictly falling series: the trend must go (and stay) negative
    val fall = (0L until 8L).map(i => (0L, i, i, 100L - 20L * i))
    val ft = Ewma.holt(fall.toDF("k", "o", "id", "x"), "k", "o", "id", "x")
      .orderBy(col("id")).collect().map(_.getAs[Long]("trend"))
    assert(ft.drop(2).forall(_ < 0L), s"negative-trend path: ${ft.toSeq}")
  }

  test("holt-winters: gapped/short/constant/negative series match a driver fold") {
    val m = 7
    cases(seriesGen(-9L, 9L), 8) { rows =>
      // one observation per (key, order): HW keys on the order directly
      val dedup = rows.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = Ewma.holtWinters(dedup.map(r => (s"k${r._1}", r._2, r._4))
          .toDF("g", "o", "x"), "g", "o", "x", m = m)
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("o")) ->
          ((r.getAs[Long]("level"), r.getAs[Long]("trend"),
            r.getAs[Long]("seas")))).toMap
      dedup.groupBy(_._1).foreach { case (k, rs) =>
        val run = rs.sortBy(_._2).map(r => (r._2, r._4))
        var l = 0L; var b = 0L
        val seas = new Array[Long](m)
        run.zipWithIndex.foreach { case ((o, x), i) =>
          val exp = if (i == 0) { l = x; b = 0L; (l, b, 0L) }
          else {
            // slot index is POSITIONAL (i mod m), not calendar: an order
            // gap must NOT shift the seasonal slot (the PACF bug class)
            val j = i % m
            val sp = seas(j)
            val l1 = (l + b + (x - sp)) / 2
            val b1 = (b + l1 - l) / 2
            val s1 = (sp + (x - l1)) / 2
            l = l1; b = b1; seas(j) = s1
            (l1, b1, s1)
          }
          assert(out((s"k$k", o)) == exp, s"key k$k order $o (pos $i)")
        }
      }
    }
    // shorter than one season: with all slots still 0, HW must equal
    // plain Holt on the same series
    val short = Seq((0L, 0L, 0L, 10L), (0L, 1L, 1L, 14L), (0L, 2L, 2L, 6L))
    val hw = Ewma.holtWinters(short.map(r => ("g", r._2, r._4))
        .toDF("g", "o", "x"), "g", "o", "x", m = 7)
      .orderBy(col("o")).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("trend")))
    val h = Ewma.holt(short.toDF("k", "o", "id", "x"), "k", "o", "id", "x")
      .orderBy(col("id")).collect()
      .map(r => (r.getAs[Long]("level"), r.getAs[Long]("trend")))
    assert(hw.toSeq == h.toSeq, "sub-season HW == Holt while slots are zero")
  }

  test("cusum: fuzzed walks match; exact-threshold tie does not alarm") {
    val (kRef, h) = (2L, 5L)
    cases(seriesGen(0L, 7L), 8) { rows =>
      val out = Cusum.drift(rows.toDF("k", "o", "id", "x"),
          "k", "o", "id", "x", k = kRef, h = h)
        .collect().map(r => r.getAs[Long]("id") ->
          ((r.getAs[Long]("cusum"), r.getAs[Boolean]("alarm")))).toMap
      sortedRuns(rows).foreach { case (_, run) =>
        var s = 0L
        run.zipWithIndex.foreach { case ((id, x), i) =>
          s = math.max(0L, (if (i == 0) 0L else s) + x - kRef)
          assert(out(id) == ((s, s > h)), s"id $id")
        }
      }
    }
    // the statistic landing EXACTLY on h must not alarm (strict >) and
    // the next in-control value must decay, not latch
    val tie = Seq((0L, 0L, 0L, 7L), (0L, 1L, 1L, 0L))
    val r = Cusum.drift(tie.toDF("k", "o", "id", "x"),
        "k", "o", "id", "x", k = 2L, h = 5L)
      .orderBy(col("id")).collect()
      .map(x => (x.getAs[Long]("cusum"), x.getAs[Boolean]("alarm")))
    assert(r.toSeq == Seq((5L, false), (3L, false)), s"threshold tie: ${r.toSeq}")
  }
}
