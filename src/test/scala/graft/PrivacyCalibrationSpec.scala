package graft

import org.apache.spark.sql.functions._

import graft.functions.Ilog2
import graft.queries.{CalibrationQueries, PrivacyQueries}

/** Round-11 privacy-audit + calibration tests: every statistic is
  * recomputed on sf0.001 by an independent driver-side implementation
  * (plain grouping, BigInt arithmetic, and for q350 the SEQUENTIAL
  * pool-adjacent-violators sweep in exact rationals — a genuinely
  * different algorithm from the engine's minimax form). The DuckDB
  * oracle certifies cross-engine exactness; these certify the
  * statistics themselves and the structural invariants (monotone
  * isotonic fit, aligned post-normalization means). */
class PrivacyCalibrationSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The released view, collected once: (event_type, day, sens). */
  private lazy val released: Seq[(String, String, Option[Long])] =
    graft.io.Tables.events(spark, sf).select(
        col("event_type"),
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd"),
        get_json_object(col("props"), "$.k").cast("long"))
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))

  test("q346: class census and suppression rates match a driver recount") {
    val out = PrivacyQueries.q346_k_anonymity(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("k_req")) -> r)
      .toMap
    val classes = released.groupBy(r => (r._1, r._2)).view
      .mapValues(_.size.toLong).toMap
    val byType = classes.groupBy(_._1._1)
    assert(out.size == byType.size * 3)
    for ((g, cls) <- byType; k <- Seq(2L, 5L, 10L)) {
      val sizes = cls.values.toSeq
      val viol = sizes.filter(_ < k)
      val r = out((g, k))
      assert(r.getAs[Long]("n_classes") == sizes.size.toLong, s"$g/$k classes")
      assert(r.getAs[Long]("n_rows") == sizes.sum, s"$g/$k rows")
      assert(r.getAs[Long]("min_class") == sizes.min, s"$g/$k min")
      assert(r.getAs[Long]("viol_classes") == viol.size.toLong &&
        r.getAs[Long]("viol_rows") == viol.sum, s"$g/$k violations")
      assert(r.getAs[Long]("suppress_ppm") == viol.sum * 1000000L / sizes.sum,
        s"$g/$k suppression")
    }
  }

  test("q347: distinct and entropy l-diversity match an Ilog2 recount") {
    val out = PrivacyQueries.q347_l_diversity(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val byType = released.collect { case (g, day, Some(sv)) => (g, day, sv) }
      .groupBy(_._1)
    assert(out.size == byType.size)
    for ((g, rows) <- byType) {
      val perClass = rows.groupBy(_._2).toSeq.map { case (_, rs) =>
        val counts = rs.groupBy(_._3).values.map(_.size.toLong)
        val n = counts.sum
        val sFp = counts.map(c => c * Ilog2.impl(c)).sum
        (counts.size.toLong, Ilog2.impl(n) - sFp / n)
      }
      val r = out(g)
      assert(r.getAs[Long]("n_classes") == perClass.size.toLong, s"$g classes")
      assert(r.getAs[Long]("min_l") == perClass.map(_._1).min, s"$g min_l")
      assert(r.getAs[Long]("classes_fail_l3") ==
        perClass.count(_._1 < 3).toLong, s"$g fail_l3")
      assert(r.getAs[Long]("min_h_fp") == perClass.map(_._2).min, s"$g min_h")
      assert(r.getAs[Long]("classes_fail_h2") ==
        perClass.count(_._2 < Ilog2.One).toLong, s"$g fail_h2")
    }
  }

  test("q348: worst-class EMD matches a BigInt recount") {
    val out = PrivacyQueries.q348_t_closeness(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val rel = released.collect { case (g, day, Some(sv)) => (g, day, sv / 10) }
    val buckets = rel.map(_._3).distinct.sorted
    val nB = buckets.size
    val nG = BigInt(rel.size)
    val globalCum = buckets.scanLeft(0L) { (acc, b) =>
      acc + rel.count(_._3 == b) }.tail
    for ((g, rows) <- rel.groupBy(_._1)) {
      val emds = rows.groupBy(_._2).map { case (_, rs) =>
        val nC = BigInt(rs.size)
        val num = buckets.zipWithIndex.map { case (b, i) =>
          val cumC = BigInt(rs.count(_._3 <= b))
          (cumC * nG - BigInt(globalCum(i)) * nC).abs
        }.sum
        (num * 1000000 / (nC * nG * (nB - 1))).toLong
      }.toSeq
      val r = out(g)
      assert(r.getAs[Long]("n_classes") == emds.size.toLong, s"$g classes")
      assert(r.getAs[Long]("max_emd_ppm") == emds.max, s"$g max_emd")
      assert(r.getAs[Long]("classes_over_t20") ==
        emds.count(_ > 200000L).toLong, s"$g over_t")
    }
  }

  test("q349: inverse-CDF mapping matches a recount; normalized means align") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val out = CalibrationQueries.q349_quantile_norm(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val n = BigInt(docs.size)
    val globalVals = docs.map(_._2).distinct.sorted
    val globalCum = globalVals.map(v => v -> docs.count(_._2 <= v).toLong)
    for ((src, rows) <- docs.groupBy(_._1)) {
      val nS = BigInt(rows.size)
      val mapped = rows.map { case (_, v) =>
        val cumS = BigInt(rows.count(_._2 <= v))
        // smallest pooled value whose cum clears the cross-multiplied rank
        globalCum.find { case (_, cg) => BigInt(cg) * nS >= cumS * n }.get._1
      }
      val r = out(src)
      assert(r.getAs[Long]("n_s") == rows.size.toLong, s"$src n")
      assert(r.getAs[Long]("mean_raw_ppm") ==
        (BigInt(rows.map(_._2).sum) * 1000000 / nS).toLong, s"$src raw")
      assert(r.getAs[Long]("mean_norm_ppm") ==
        (BigInt(mapped.sum) * 1000000 / nS).toLong, s"$src norm")
      assert(r.getAs[Long]("min_norm") == mapped.min &&
        r.getAs[Long]("max_norm") == mapped.max, s"$src range")
    }
    // the point of quantile normalization: post-mapping means cluster on
    // the pooled distribution — the spread across sources must shrink
    val rawSpread = out.values.map(_.getAs[Long]("mean_raw_ppm"))
    val normSpread = out.values.map(_.getAs[Long]("mean_norm_ppm"))
    assert(normSpread.max - normSpread.min <= rawSpread.max - rawSpread.min,
      "normalization widened the cross-source mean spread")
  }

  /** Sequential pool-adjacent-violators in exact rationals: merge any
    * adjacent blocks whose averages violate monotonicity, left to right
    * (the textbook algorithm — NOT the engine's minimax form). */
  private def pav(buckets: Seq[(Long, Long)]): Seq[BigInt] = {
    // each block: (n, s, width); fitted ppm = floor(s*1e6/n)
    val stack = scala.collection.mutable.ArrayBuffer.empty[(BigInt, BigInt, Int)]
    for ((nB, sB) <- buckets) {
      stack += ((BigInt(nB), BigInt(sB), 1))
      while (stack.size >= 2 && {
        val (n2, s2, _) = stack(stack.size - 1)
        val (n1, s1, _) = stack(stack.size - 2)
        s1 * n2 > s2 * n1 // prev avg > next avg: violation
      }) {
        val (n2, s2, w2) = stack.remove(stack.size - 1)
        val (n1, s1, w1) = stack.remove(stack.size - 1)
        stack += ((n1 + n2, s1 + s2, w1 + w2))
      }
    }
    stack.toSeq.flatMap { case (nBk, sBk, w) =>
      Seq.fill(w)(sBk * 1000000 / nBk) }
  }

  test("q350: minimax fit equals floor(sequential PAV * 1e6) exactly") {
    val pts = graft.io.Tables.events(spark, sf).select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long"),
        expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val out = CalibrationQueries.q350_isotonic(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("k_val")) -> r)
      .toMap
    for ((g, rows) <- pts.groupBy(_._1)) {
      val buckets = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (x, rs) => (x, rs.size.toLong, rs.map(_._3).sum) }
      val fitted = pav(buckets.map(b => (b._2, b._3)))
      buckets.zip(fitted).foreach { case ((x, nB, sB), f) =>
        val r = out((g, x))
        assert(r.getAs[Long]("n_b") == nB, s"$g/$x n_b")
        assert(r.getAs[Long]("raw_cents_ppm") ==
          (BigInt(sB) * 1000000 / nB).toLong, s"$g/$x raw")
        assert(r.getAs[Long]("iso_cents_ppm") == f.toLong,
          s"$g/$x iso != PAV")
      }
      // structural invariant, independent of the reference: monotone
      val iso = buckets.map(b => out((g, b._1)).getAs[Long]("iso_cents_ppm"))
      assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
        s"$g fit not monotone")
    }
  }

  test("q350 helper: PAV pools a strictly decreasing series to one block") {
    // all-decreasing input: the fit is the global mean everywhere
    val fit = pav(Seq((1L, 30L), (1L, 20L), (1L, 10L)))
    assert(fit.distinct.size == 1 && fit.head == BigInt(20) * 1000000)
  }

  // Plan locks: the privacy audits are pure groupBy algebra (no window,
  // no join reaches the corpus); the calibration pair may only join
  // bounded frames — broadcast hash (or the broadcast cross for the
  // one-row totals), never a sort-merge join or an unbroadcast cartesian.
  test("plan shapes: audits join nothing; calibration joins broadcast only") {
    for (q <- Seq(PrivacyQueries.q346_k_anonymity,
        PrivacyQueries.q347_l_diversity)) {
      val p = q(spark, sf).queryExecution.executedPlan.toString()
      assert(!p.contains("Window") && !p.contains("Join"),
        s"privacy audit grew a window or join:\n$p")
    }
    val p348 = PrivacyQueries.q348_t_closeness(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p348.contains("SortMergeJoin") && !p348.contains("CartesianProduct"),
      s"q348 lost a broadcast:\n$p348")
    val p349 = CalibrationQueries.q349_quantile_norm(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p349.contains("SortMergeJoin") && !p349.contains("CartesianProduct"),
      s"q349 lost a broadcast:\n$p349")
    assert(p349.split("Window").length - 1 == 1,
      s"q349 must carry exactly the one as-of sweep window:\n$p349")
    val p350 = CalibrationQueries.q350_isotonic(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p350.contains("SortMergeJoin") && !p350.contains("CartesianProduct"),
      s"q350 lost a broadcast:\n$p350")
    assert(p350.split("BroadcastHashJoin").length - 1 >= 3,
      s"q350's bounded-frame joins must all broadcast:\n$p350")
  }
}
