package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal
import graft.operators.{Ewma, Kmv}

/** Unit coverage for the round-8 operators: the two-long Holt fold, KMV
  * difference estimates, and the byte-class histogram stage. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("holt: level tracks a constant series exactly, trend settles to zero") {
    val df = Seq((1L, 1L, 1L, 100L), (1L, 2L, 2L, 100L), (1L, 3L, 3L, 100L),
      (1L, 4L, 4L, 100L)).toDF("k", "o", "id", "x")
    val out = Ewma.holt(df, "k", "o", "id", "x")
      .orderBy(col("id")).collect()
    // l0=100,b0=0; each step l=(100+0+100)/2=100, b=(0+0)/2=0 — fixed point
    assert(out.map(_.getAs[Long]("level")).toSeq == Seq(100L, 100L, 100L, 100L))
    assert(out.map(_.getAs[Long]("trend")).toSeq == Seq(0L, 0L, 0L, 0L))
  }

  test("holt: negative trend on a falling series, truncating division") {
    val df = Seq((1L, 1L, 1L, 100L), (1L, 2L, 2L, 0L), (1L, 3L, 3L, -100L))
      .toDF("k", "o", "id", "x")
    val out = Ewma.holt(df, "k", "o", "id", "x").orderBy(col("id")).collect()
    // step2: l=(100+0+0)/2=50, b=(0+50-100)/2=-25 (trunc toward zero)
    // step3: l=(50-25-100)/2=-37 (trunc: -75/2=-37), b=(-25-37-50)/2=-56
    assert(out(1).getAs[Long]("level") == 50L)
    assert(out(1).getAs[Long]("trend") == -25L)
    assert(out(2).getAs[Long]("level") == -37L)
    assert(out(2).getAs[Long]("trend") == -56L)
  }

  test("holt: state resets across keys in one sorted partition run") {
    val df = Seq((1L, 1L, 1L, 40L), (1L, 2L, 2L, 80L),
      (2L, 1L, 3L, 10L)).toDF("k", "o", "id", "x")
    val out = Ewma.holt(df, "k", "o", "id", "x")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("level"), r.getAs[Long]("trend"))).toMap
    assert(out(3L) == ((10L, 0L))) // fresh init, not contaminated by key 1
    assert(out(2L) == ((60L, 10L))) // l=(40+0+80)/2=60, b=(0+20)/2=10
  }

  test("kmv differenceEstimates: disjoint sets -> diff ≈ own cardinality, subset -> zero") {
    // group 1: e0..e99; group 2: e0..e99 (identical); group 3: f0..f99 (disjoint)
    val rows = (0 until 100).flatMap(i =>
      Seq(("g1", s"e$i"), ("g2", s"e$i"), ("g3", s"f$i")))
    val df = rows.toDF("g", "e")
    val sk = Kmv.sketch(df, "g", "e", 16)
    val est = Kmv.differenceEstimates(sk, "g", 16)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("diff_ab_est"), r.getAs[Long]("diff_ba_est"))).toMap
    val (d12a, d12b) = est(("g1", "g2"))
    assert(d12a == 0L && d12b == 0L) // identical sets: no difference
    val (d13a, d13b) = est(("g1", "g3"))
    assert(d13a > 50L && d13b > 50L) // disjoint: both directions large
  }

  test("winnowing: shared token run >= k+w-1 guarantees a shared fingerprint") {
    // docs 1 and 2 share a 7-token run (> k+w-1 = 6); doc 3 is disjoint
    val common = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"one two $common three"),
      (2L, s"$common nine ten eleven twelve"),
      (3L, "completely different words about storage engines and planners")
    ).toDF("doc_id", "text")
    val fp = graft.llm.Dedup.winnowingFingerprints(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "SWA guarantee violated: 7-token shared run produced no shared fingerprint")
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
  }

  test("winnowing: short documents (no full window) emit nothing") {
    val docs = Seq((1L, "too few tokens here")).toDF("doc_id", "text")
    assert(graft.llm.Dedup.winnowingFingerprints(docs, "text", "doc_id")
      .count() == 0L)
  }

  test("ilog2: exact at powers of two, close to log2 elsewhere, monotone") {
    import graft.functions.Ilog2.impl
    for (k <- 0 to 62) assert(impl(1L << k) == k.toLong * 65536)
    val vals = (1L to 2000L) ++ Seq(123456789L, (1L << 40) + 12345L, Long.MaxValue)
    for (v <- vals) {
      val got = impl(v) / 65536.0
      val want = math.log(v.toDouble) / math.log(2.0)
      assert(math.abs(got - want) < 1e-4, s"ilog2($v): $got vs $want")
    }
    // monotone non-decreasing (truncation never inverts order)
    assert(vals.sorted.map(impl).sliding(2).forall(p => p.head <= p.last))
    intercept[IllegalArgumentException](impl(0L))
  }

  test("ilog2: native expression matches impl through codegen") {
    val df = Seq(1L, 2L, 3L, 1000L, 65537L, Long.MaxValue).toDF("x")
    val got = df.select(graft.functions.Ilog2.ilog2(col("x")).as("l"))
      .collect().map(_.getLong(0))
    assert(got.sameElements(
      Array(1L, 2L, 3L, 1000L, 65537L, Long.MaxValue).map(graft.functions.Ilog2.impl)))
  }

  test("weightedShingles: log-bucketed replication separates repetition levels") {
    // doc 1 says "spam" once, doc 2 says it 9 times -> r = 1 vs min(bitlen(9)=4, 4)
    val docs = Seq((1L, "spam ham eggs"), (2L, Seq.fill(9)("spam").mkString(" ") + " ham eggs"))
      .toDF("doc_id", "text")
    val el = graft.llm.Dedup.weightedShingles(docs, "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val d1 = el.filter(_._1 == 1L).map(_._2).toSet
    val d2 = el.filter(_._1 == 2L).map(_._2).toSet
    assert(d1 == Set("spam~1", "ham~1", "eggs~1"))
    assert(d2 == Set("spam~1", "spam~2", "spam~3", "spam~4", "ham~1", "eggs~1"))
    // weighted Jaccard = min-sum / max-sum = 3/6; set Jaccard would be 1.0
    assert((d1 intersect d2).size == 3 && (d1 union d2).size == 6)
  }

  test("NaiveBayes.classifyLiteral: argmax with smallest-label tie-break") {
    val docs = Seq((1L, "aa bb"), (2L, "cc"), (3L, "zz zz")).toDF("doc_id", "text")
    val labels = Seq("de", "en")
    val priors = Seq(-10L, -10L) // equal priors: doc 3 (no vocab hits) ties -> "de"
    val weights = Map("aa" -> Seq(-1L, -5L), "bb" -> Seq(-1L, -5L), "cc" -> Seq(-7L, -2L))
    val got = graft.llm.NaiveBayes
      .classifyLiteral(docs, "text", "doc_id", labels, priors, weights)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(got(0) == ((1L, "de", -12L))) // -10-2 vs -10-10
    assert(got(1) == ((2L, "en", -12L))) // -17 vs -12
    assert(got(2) == ((3L, "de", -10L))) // tie -> lexicographically smallest
  }

  test("NaiveBayes.classifyLiteral: refuses an over-budget literal model") {
    val docs = Seq((1L, "aa")).toDF("doc_id", "text")
    val labels = Seq("de", "en", "fr", "es")
    val priors = Seq(-1L, -1L, -1L, -1L)
    // 4 labels x 2049 tokens = 8196 cells > MaxLiteralCells (8192): the
    // guard must fire BEFORE a megabyte-scale literal plan is built
    val big = (0 until 2049).map(i => s"t$i" -> Seq(-1L, -1L, -1L, -1L)).toMap
    val e = intercept[IllegalArgumentException] {
      graft.llm.NaiveBayes.classifyLiteral(docs, "text", "doc_id", labels, priors, big)
    }
    assert(e.getMessage.contains("literal cells") &&
      e.getMessage.contains("broadcast-join"))
    // at the budget boundary it must still work
    val ok = (0 until 2048).map(i => s"t$i" -> Seq(-1L, -1L, -1L, -1L)).toMap
    assert(graft.llm.NaiveBayes
      .classifyLiteral(docs, "text", "doc_id", labels, priors, ok).count() == 1L)
  }

  test("holtWinters: matches a reference fold, resets per key, tracks seasonality") {
    val xs = Seq(10L, 20L, 10L, 20L, 10L, 20L, 10L, 20L)
    val rows = xs.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) } ++
      Seq(("b", 0L, 100L), ("b", 1L, 50L))
    val df = rows.toDF("k", "o", "x")
    val got = graft.operators.Ewma.holtWinters(df, "k", "o", "x", m = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(t => (t._1, t._2))
    // independent reference fold
    def ref(series: Seq[Long], m: Int): Seq[(Long, Long, Long)] = {
      var l = series.head; var b = 0L; val s = Array.fill(m)(0L)
      (l, 0L, 0L) +: series.zipWithIndex.drop(1).map { case (x, i) =>
        val j = i % m; val sp = s(j)
        val l1 = (l + b + (x - sp)) / 2; val b1 = (b + l1 - l) / 2
        val s1 = (sp + (x - l1)) / 2
        l = l1; b = b1; s(j) = s1; (l1, b1, s1)
      }
    }
    val wantA = ref(xs, 2)
    got.filter(_._1 == "a").zip(wantA).foreach { case ((_, _, l, b, sv), (rl, rb, rs)) =>
      assert((l, b, sv) == ((rl, rb, rs)))
    }
    val wantB = ref(Seq(100L, 50L), 2)
    got.filter(_._1 == "b").zip(wantB).foreach { case ((_, _, l, b, sv), (rl, rb, rs)) =>
      assert((l, b, sv) == ((rl, rb, rs)))
    }
    // alternating series: the two seasonal slots drift apart in sign
    val lastSeas = got.filter(_._1 == "a").takeRight(2).map(_._5)
    assert(lastSeas.exists(_ < 0) && lastSeas.exists(_ > 0))
  }

  test("byteClassCounts: nibble classes over the head bytes, cap respected") {
    // 0x00, 0x10, 0x1F, 0xFF -> classes 0, 1, 1, 15
    val payload = Array[Byte](0x00, 0x10, 0x1f, 0xff.toByte)
    val df = Seq((7L, payload)).toDF("id", "p")
    val got = Multimodal.byteClassCounts(df, "id", "p", maxBytes = 64)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 1L, 1L -> 2L, 15L -> 1L))
    val capped = Multimodal.byteClassCounts(df, "id", "p", maxBytes = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(capped == Map(0L -> 1L, 1L -> 1L)) // only first 2 bytes counted
  }
}
