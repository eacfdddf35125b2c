package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.LexicalQueries
import graft.tools.ScaleStress.{Emitter, Family, Reps}

/** Scale-stress family for the round-12 lexical/concentration statistics
  * (q380–q384). Two replica constructions, each matched to what the
  * statistic claims (the [[ScaleStress]] methodology):
  *
  * - DISJOINT-VOCABULARY ×K (tokens suffixed per replica, source kept):
  *   the per-source census fields (V, f1, f2, N) must scale EXACTLY ×K,
  *   Chao1 must equal the formula recomputed from the scaled census
  *   (it is NOT homogeneous — ×K enters the correction quadratically),
  *   Good–Turing ratios must be BIT-identical (the ×K cancels inside
  *   one floor), and the Zipf top-100 at ×K must equal a driver
  *   expansion of the ×1 count multiset (each count appears K times, so
  *   at K = 100 the window holds one count value and the slope is
  *   exactly 0 — asserted as the sharp sub-case).
  * - PLAIN ROW DUPLICATION ×K: Benford cell counts scale ×K, so each
  *   per-digit quotient is floor(K·num/den) — recomputed exactly from
  *   the ×1 grid; Gini is a ratio of equally-scaled integers
  *   (P ×K², n·T ×K²) and must be BIT-identical.
  */
private[tools] object StressLexicalFamilies {

  val lexical: Family = (spark, sfDir, em) => {
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("text"), col("n_chars"))
      .localCheckpoint(true)

    // ---- disjoint-vocab replication (census/zipf statistics) ----
    def vocabReplica(k: Int): DataFrame = docs
      .crossJoin(broadcast(spark.range(k).select(col("id").as("__rep"))))
      .select(col("source"),
        regexp_replace(col("text"), lit("(\\w+)"),
          concat(lit("$1r"), col("__rep"))).as("text"))
      .localCheckpoint(true)

    def censusOf(d: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      LexicalQueries.chao1(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("v_obs"),
          r.getAs[Long]("f1"), r.getAs[Long]("f2"),
          r.getAs[Long]("n_tokens"), r.getAs[Long]("chao1")))
      }.toMap
    var c1: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("chao1 census x1") { c1 = censusOf(docs.select(col("source"),
      col("text"))); c1.size.toLong }
    var cK: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"chao1 census x$Reps") {
      cK = censusOf(vocabReplica(Reps)); cK.size.toLong }
    val censusLinear = c1.nonEmpty && c1.forall { case (s, (v, f1, f2, n, _)) =>
      cK.get(s).exists { case (vK, f1K, f2K, nK, chK) =>
        vK == v * Reps && f1K == f1 * Reps && f2K == f2 * Reps &&
          nK == n * Reps &&
          chK == vK + (BigInt(f1K) * (f1K - 1) / (2 * (f2K + 1))).toLong
      }
    }

    def gtOf(d: DataFrame): Map[String, (Long, Option[Long])] =
      LexicalQueries.goodTuring(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("p0_ppm"),
          if (r.isNullAt(r.fieldIndex("r1_star_micro"))) None
          else Some(r.getAs[Long]("r1_star_micro"))))
      }.toMap
    var g1: Map[String, (Long, Option[Long])] = Map.empty
    em.stage("good-turing x1") { g1 = gtOf(docs.select(col("source"),
      col("text"))); g1.size.toLong }
    var gK: Map[String, (Long, Option[Long])] = Map.empty
    em.stage(s"good-turing x$Reps") {
      gK = gtOf(vocabReplica(Reps)); gK.size.toLong }
    val gtIdentical = g1.nonEmpty && g1 == gK

    // Zipf: expected ×K top-100 = the ×1 count multiset with every count
    // repeated K times (disjoint replicas keep per-token counts), so at
    // K = 100 the window holds one count value -> slope exactly 0.
    def vocabCounts(d: DataFrame): Map[String, Seq[Long]] =
      d.select(col("source"),
          explode(graft.llm.TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("c")))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    var z1: Map[String, Long] = Map.empty
    em.stage("zipf slope x1") {
      z1 = LexicalQueries.zipfSlope(docs.select(col("source"), col("text")))
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Long]("slope_ppm")).toMap
      z1.size.toLong
    }
    var zK: Map[String, Long] = Map.empty
    em.stage(s"zipf slope x$Reps") {
      zK = LexicalQueries.zipfSlope(vocabReplica(Reps))
        .collect().map(r => r.getAs[String]("source") ->
          r.getAs[Long]("slope_ppm")).toMap
      zK.size.toLong
    }
    var zipfExpected = true
    em.stage("zipf xK expectation (driver expansion)") {
      val counts = vocabCounts(docs.select(col("source"), col("text")))
      counts.foreach { case (s, cs) =>
        val top = cs.sorted(Ordering[Long].reverse)
          .flatMap(c => Seq.fill(Reps)(c)).take(100)
        val pts = top.zipWithIndex.map { case (c, i) =>
          (graft.functions.Ilog2.impl(i + 1L), graft.functions.Ilog2.impl(c)) }
        val exp = if (pts.length < 2) None else {
          val n = BigInt(pts.length)
          val sx = pts.map(p => BigInt(p._1)).sum
          val sy = pts.map(p => BigInt(p._2)).sum
          val sxy = pts.map(p => BigInt(p._1) * p._2).sum
          val sxx = pts.map(p => BigInt(p._1) * p._1).sum
          Some(((n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)).toLong)
        }
        if (exp != zK.get(s)) zipfExpected = false
        if (exp.exists(_ != 0L)) zipfExpected = false // K=100: flat window
      }
      counts.size.toLong
    }

    // ---- plain duplication (benford / gini) ----
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val rel = Tables.events(spark, sfDir).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("v")).localCheckpoint(true)
    def benfordOf(d: DataFrame): Map[String, (Long, Long, Boolean)] =
      LexicalQueries.benford(d).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n"),
          r.getAs[Long]("chi2_micro"), r.getAs[Boolean]("benford")))
      }.toMap
    var b1: Map[String, (Long, Long, Boolean)] = Map.empty
    em.stage("benford x1") { b1 = benfordOf(rel); b1.size.toLong }
    var bK: Map[String, (Long, Long, Boolean)] = Map.empty
    em.stage(s"benford x$Reps") { bK = benfordOf(dup(rel)); bK.size.toLong }
    val P = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    var benfordExact = true
    em.stage("benford xK expectation (per-digit floors)") {
      val cells = rel.where(col("v") >= 1L)
        .withColumn("dg", substring(col("v").cast("string"), 1, 1).cast("long"))
        .groupBy(col("g"), col("dg")).agg(count(lit(1)).as("o"))
        .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("dg")) ->
          r.getAs[Long]("o")).toMap
      val types = cells.keys.map(_._1).toSet
      types.foreach { g =>
        val n = BigInt((1 to 9).map(d => cells.getOrElse((g, d.toLong), 0L)).sum)
        val chiK = (1 to 9).map { d =>
          val o = BigInt(cells.getOrElse((g, d.toLong), 0L)) * Reps
          val t = o * 1000000 - n * Reps * P(d - 1)
          t * t / (n * Reps * P(d - 1))
        }.sum
        if (!bK.get(g).exists { case (nK, c2K, gate) =>
          nK == (n * Reps).toLong && c2K == chiK.toLong &&
            gate == (chiK <= 15507313) }) benfordExact = false
      }
      types.size.toLong
    }

    val lens = Tables.documents(spark, sfDir).select(col("source"),
      col("n_chars").cast("long").as("v")).localCheckpoint(true)
    def giniOf(d: DataFrame): Map[String, (Long, Long, Long)] =
      LexicalQueries.giniLengths(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
          r.getAs[Long]("total_chars"), r.getAs[Long]("gini_ppm")))
      }.toMap
    var gi1: Map[String, (Long, Long, Long)] = Map.empty
    em.stage("gini x1") { gi1 = giniOf(lens); gi1.size.toLong }
    var giK: Map[String, (Long, Long, Long)] = Map.empty
    em.stage(s"gini x$Reps") { giK = giniOf(dup(lens)); giK.size.toLong }
    val giniIdentical = gi1.nonEmpty && gi1.forall { case (s, (n, t, g)) =>
      giK.get(s).contains((n * Reps, t * Reps, g)) }

    // sqrt mixture under plain duplication: shares are bit-identical
    // (the xK cancels in one floor); weights are NOT homogeneous
    // (isqrt(K n) != K isqrt(n)) and must match an exact recount from
    // the x1 token counts
    def isqrtExact(n: BigInt): BigInt = {
      var r = BigInt(math.sqrt(n.toDouble).toLong).max(2) - 2
      while ((r + 1) * (r + 1) <= n) r += 1
      r
    }
    def mixOf(d: DataFrame): Map[String, (Long, Long, Long)] =
      LexicalQueries.sqrtMixture(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_tok"),
          r.getAs[Long]("share_ppm"), r.getAs[Long]("weight_ppm")))
      }.toMap
    val docTexts = docs.select(col("source"), col("text"))
    var m1: Map[String, (Long, Long, Long)] = Map.empty
    em.stage("sqrt mixture x1") { m1 = mixOf(docTexts); m1.size.toLong }
    var mK: Map[String, (Long, Long, Long)] = Map.empty
    em.stage(s"sqrt mixture x$Reps") {
      mK = mixOf(dup(docTexts)); mK.size.toLong }
    val rtAllK = m1.values.map(v => isqrtExact(BigInt(v._1) * Reps)).sum
    val mixtureExact = m1.nonEmpty && m1.forall { case (s, (n, share, _)) =>
      mK.get(s).exists { case (nK, shareK, weightK) =>
        nK == n * Reps && shareK == share &&
          weightK == (isqrtExact(BigInt(n) * Reps) * 1000000 / rtAllK).toLong
      }
    }

    // dedup tokens under strided-id duplication: every replica's text
    // duplicates the original, so keepers (global min doc_id) stay the
    // x1 keepers EXACTLY — n_keepers/tok_eff invariant, raw x K, waste
    // recomputed from the x1 fields
    def dtOf(d: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      LexicalQueries.dedupTokens(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
          r.getAs[Long]("tok_raw"), r.getAs[Long]("n_keepers"),
          r.getAs[Long]("tok_eff"), r.getAs[Long]("waste_ppm")))
      }.toMap
    val docIds = Tables.widen(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("source"), col("text")).localCheckpoint(true)
    var d1: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("dedup tokens x1") { d1 = dtOf(docIds); d1.size.toLong }
    var dK: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"dedup tokens x$Reps") {
      dK = dtOf(ScaleStress.strideReplica(spark, docIds, "doc_id", Reps,
        Seq("source", "text")))
      dK.size.toLong
    }
    val dedupExpected = d1.nonEmpty && d1.forall {
      case (s, (n, raw, keep, eff, _)) =>
        dK.get(s).exists { case (nK, rawK, keepK, effK, wasteK) =>
          nK == n * Reps && rawK == raw * Reps && keepK == keep &&
            effK == eff && (raw == 0 ||
              wasteK == (BigInt(raw) * Reps - eff) * 1000000 / (BigInt(raw) * Reps))
        }
    }

    // trimmed mean under plain duplication: t(xK) = (K*n) div 10 is NOT
    // K*t when 10 does not divide n, so the expectation is an exact
    // driver recount over the x1 value-counts with every count * K
    def tmOf(d: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      LexicalQueries.trimmedMean(d).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_docs"),
          r.getAs[Long]("n_trimmed_per_tail"), r.getAs[Long]("lo_cut"),
          r.getAs[Long]("hi_cut"), r.getAs[Long]("trimmed_mean_ppm")))
      }.toMap
    var t1: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("trimmed mean x1") { t1 = tmOf(lens); t1.size.toLong }
    var tK: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"trimmed mean x$Reps") { tK = tmOf(dup(lens)); tK.size.toLong }
    var trimmedExpected = true
    em.stage("trimmed mean xK expectation (driver recount)") {
      val vc = lens.groupBy(col("source"), col("v")).count()
        .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("v"),
          r.getAs[Long]("count")))
      vc.groupBy(_._1).foreach { case (s, rows) =>
        val pairs = rows.map(r => (r._2, r._3 * Reps)).sortBy(_._1)
        val n = pairs.map(_._2).sum
        val t = n / 10
        def rankVal(rk: Long): Long = { // value at 1-based rank
          var cum = 0L
          pairs.find { case (_, c) => cum += c; cum >= rk }.get._1
        }
        var low = t; var high = t
        var st = BigInt(0)
        pairs.foreach { case (v, c) =>
          val lc = math.min(low, c); low -= lc
          st += BigInt(v) * (c - lc)
        }
        pairs.reverse.foreach { case (v, c) =>
          val hc = math.min(high, c); high -= hc
          st -= BigInt(v) * hc
        }
        val exp = (n, t, rankVal(t + 1), rankVal(n - t),
          (st * 1000000 / (n - 2 * t)).toLong)
        if (!tK.get(s).contains(exp)) trimmedExpected = false
      }
      vc.length.toLong
    }

    em.line(s"""{"summary":"round-12 lexical invariances at ${Reps}x","census_linear":$censusLinear,"good_turing_bit_identical":$gtIdentical,"zipf_expected":$zipfExpected,"benford_exact":$benfordExact,"gini_bit_identical":$giniIdentical,"mixture_exact":$mixtureExact,"dedup_expected":$dedupExpected,"trimmed_mean_expected":$trimmedExpected,"linear":${censusLinear && gtIdentical && zipfExpected && benfordExact && giniIdentical && mixtureExact && dedupExpected && trimmedExpected}}""")
  }
}
