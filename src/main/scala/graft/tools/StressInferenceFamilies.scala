package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.{AllPairs, Dedup, NaiveBayes, RandomProjection, SetJoin, TextAnalysis}
import graft.tools.ScaleStress.{Emitter, Family, Reps, ratio3, strideReplica, tokenReplica}

/** Scale-stress families (round 11: resampling, privacy/calibration, experimentation, and hypothesis-family invariances), split out of
  * [[ScaleStress]] (round-11 verdict: no non-test source file over
  * ~1500 lines). The harness contract, replica methodology, and JSON
  * line format are documented on [[ScaleStress]]; each family here is
  * exactly the code previously inlined there. */
private[tools] object StressInferenceFamilies {
  /** SCALESTRESS_r11: the q342/q343 resampling batch under exact row
    * DUPLICATION. Bootstrap: replica counts are keyed by eid, so the k
    * copies of a row draw the SAME Poisson count in every rep — each
    * rep's (Σc·v, Σc) scales exactly k, the rep means are the same
    * rationals, and mean/SE/CI must come back BIT-IDENTICAL at k×.
    * Jackknife: (n_s, t_s, N, T) all scale k, so every loo / influence /
    * variance readout is the same rational — also bit-identical. The
    * timed stages carry the real corpus-scaling cost: the ×B replica
    * hash explosion over the k×-duplicated corpus (10M rows × 32 reps
    * of md5 at k=100 on sf0.1). */
  val resampling: Family = (spark, sfDir, em) => {
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val evBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"), col("event_id").cast("long").as("eid"),
      expr("cast(round(value * 100) as bigint)").as("v"))
      .localCheckpoint(true)
    def boot(ev: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      graft.queries.ResamplingQueries.bootstrapSe(ev, 32).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("mean_ppm"),
          r.getAs[Long]("b_eff"), r.getAs[Long]("se_ppm"),
          r.getAs[Long]("ci_lo_ppm"), r.getAs[Long]("ci_hi_ppm")))
      }.toMap
    var b1: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("bootstrap x1") { b1 = boot(evBase); b1.size.toLong }
    var bK: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"bootstrap x$Reps") { bK = boot(dup(evBase)); bK.size.toLong }
    val bootIdentical = b1.nonEmpty && b1 == bK
    val docBase = Tables.documents(spark, sfDir).select(col("source"),
      length(col("text")).cast("long").as("v")).localCheckpoint(true)
    def jack(docs: DataFrame): Map[String, (Long, Long, Long, Long)] =
      graft.queries.ResamplingQueries.jackknifeBlocks(docs).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("mean_all_ppm"),
          r.getAs[Long]("loo_ppm"), r.getAs[Long]("influence_ppm"),
          r.getAs[Long]("var_jack_ppm2")))
      }.toMap
    var j1: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage("jackknife x1") { j1 = jack(docBase); j1.size.toLong }
    var jK: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"jackknife x$Reps") { jK = jack(dup(docBase)); jK.size.toLong }
    val jackIdentical = j1.nonEmpty && j1 == jK
    em.line(s"""{"summary":"round-11 resampling invariances at ${Reps}x duplication","bootstrap_bit_identical":$bootIdentical,"jackknife_bit_identical":$jackIdentical,"linear":${bootIdentical && jackIdentical}}""")
  }

  /** SCALESTRESS_r11b: the privacy-audit + calibration family (q346–
    * q350). Plain 100× row duplication is the RIGHT stress here — these
    * statistics make claims about counts and distributions, and each
    * claim has a provable transform under duplication: k-anonymity
    * census fields scale exactly ×100 and every violation vanishes
    * (100·c ≥ 100 > k for every threshold ≤ 10); distinct-l and every
    * distributional ratio (t-closeness EMD, quantile-normalized means,
    * the isotonic fit) are ratios of equally-scaled integers, so their
    * floors are BIT-identical; entropy-l is invariant up to Ilog2
    * truncation (log2(100n) − log2(100c) telescopes), certified to a
    * ±4 fp-unit band (each of the three logs truncates < 1 unit). */
  val privacy: Family = (spark, sfDir, em) => {
    import graft.queries.{CalibrationQueries, PrivacyQueries}
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val relBase = PrivacyQueries.release(spark, sfDir).localCheckpoint(true)

    def kanon(rel: DataFrame): Map[(String, Long), (Long, Long, Long, Long, Long, Long)] =
      PrivacyQueries.kAnonymity(rel).collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("k_req")) ->
          ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_rows"),
            r.getAs[Long]("min_class"), r.getAs[Long]("viol_classes"),
            r.getAs[Long]("viol_rows"), r.getAs[Long]("suppress_ppm")))
      }.toMap
    var ka1: Map[(String, Long), (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage("k-anonymity x1") { ka1 = kanon(relBase); ka1.size.toLong }
    var kaK: Map[(String, Long), (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"k-anonymity x$Reps") { kaK = kanon(dup(relBase)); kaK.size.toLong }
    val kanonExact = ka1.nonEmpty && ka1.forall { case (key, (nc, nr, mc, _, _, _)) =>
      kaK(key) == ((nc, nr * Reps, mc * Reps, 0L, 0L, 0L)) }

    def ldiv(rel: DataFrame): Map[String, (Long, Long, Long, Long)] =
      PrivacyQueries.lDiversity(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n_classes"),
          r.getAs[Long]("min_l"), r.getAs[Long]("classes_fail_l3"),
          r.getAs[Long]("min_h_fp")))
      }.toMap
    var ld1: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage("l-diversity x1") { ld1 = ldiv(relBase); ld1.size.toLong }
    var ldK: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"l-diversity x$Reps") { ldK = ldiv(dup(relBase)); ldK.size.toLong }
    val ldivStructural = ld1.nonEmpty && ld1.forall { case (g, (nc, ml, f3, _)) =>
      val (ncK, mlK, f3K, _) = ldK(g); (ncK, mlK, f3K) == ((nc, ml, f3)) }
    val entropyMaxDelta = if (ld1.isEmpty) Long.MaxValue
      else ld1.map { case (g, (_, _, _, h)) => math.abs(ldK(g)._4 - h) }.max

    def tclose(rel: DataFrame): Map[String, (Long, Long, Long)] =
      PrivacyQueries.tCloseness(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n_classes"),
          r.getAs[Long]("max_emd_ppm"), r.getAs[Long]("classes_over_t20")))
      }.toMap
    var tc1: Map[String, (Long, Long, Long)] = Map.empty
    em.stage("t-closeness x1") { tc1 = tclose(relBase); tc1.size.toLong }
    var tcK: Map[String, (Long, Long, Long)] = Map.empty
    em.stage(s"t-closeness x$Reps") { tcK = tclose(dup(relBase)); tcK.size.toLong }
    val tcloseIdentical = tc1.nonEmpty && tc1 == tcK

    val docBase = Tables.documents(spark, sfDir).select(col("source"),
      col("n_chars").cast("long").as("v")).localCheckpoint(true)
    def qnorm(docs: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      CalibrationQueries.quantileNorm(docs).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_s"),
          r.getAs[Long]("mean_raw_ppm"), r.getAs[Long]("mean_norm_ppm"),
          r.getAs[Long]("min_norm"), r.getAs[Long]("max_norm")))
      }.toMap
    var qn1: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("quantile-norm x1") { qn1 = qnorm(docBase); qn1.size.toLong }
    var qnK: Map[String, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"quantile-norm x$Reps") { qnK = qnorm(dup(docBase)); qnK.size.toLong }
    val qnormExact = qn1.nonEmpty && qn1.forall { case (src, (n, mr, mn, lo, hi)) =>
      qnK(src) == ((n * Reps, mr, mn, lo, hi)) }

    val ptsBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"),
      expr("try_cast(get_json_object(props, '$.k') as long)").as("x"),
      expr("cast(round(value * 100) as bigint)").as("y")).localCheckpoint(true)
    def iso(pts: DataFrame): Map[(String, Long), (Long, Long, Long)] =
      CalibrationQueries.isotonic(pts).collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("k_val")) ->
          ((r.getAs[Long]("n_b"), r.getAs[Long]("raw_cents_ppm"),
            r.getAs[Long]("iso_cents_ppm")))
      }.toMap
    var is1: Map[(String, Long), (Long, Long, Long)] = Map.empty
    em.stage("isotonic x1") { is1 = iso(ptsBase); is1.size.toLong }
    var isK: Map[(String, Long), (Long, Long, Long)] = Map.empty
    em.stage(s"isotonic x$Reps") { isK = iso(dup(ptsBase)); isK.size.toLong }
    val isoExact = is1.nonEmpty && is1.forall { case (key, (n, raw, fit)) =>
      isK(key) == ((n * Reps, raw, fit)) }

    em.line(s"""{"summary":"round-11b privacy/calibration invariances at ${Reps}x duplication","kanon_census_exact_violations_zero":$kanonExact,"ldiv_structure_identical":$ldivStructural,"entropy_fp_max_delta":$entropyMaxDelta,"entropy_band_ok":${entropyMaxDelta <= 4},"tclose_bit_identical":$tcloseIdentical,"qnorm_means_bit_identical":$qnormExact,"isotonic_bit_identical":$isoExact,"linear":${kanonExact && ldivStructural && entropyMaxDelta <= 4 && tcloseIdentical && qnormExact && isoExact}}""")
  }

  /** SCALESTRESS_r11b (second stage): the experimentation family (q351–
    * q353) under 100× duplication. Provable transforms: Neyman moments
    * are ratios of equally-scaled integers → sd and both allocations
    * BIT-identical, strata counts ×100 exact; CUPED's θ is a ratio of
    * ×10⁴-scaled moments → bit-identical, per-arm means scale ×100 and
    * variances ×10⁴ up to the single readout floor (banded exactly);
    * PSI's unsmoothed value is duplication-invariant and the add-one
    * smoothing perturbation shrinks ∝ 1/n — certified to a ±64 fp band
    * (0.001 bits). */
  val experiment: Family = (spark, sfDir, em) => {
    import graft.queries.ExperimentQueries
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val relBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"),
      when(dayofmonth(col("ts")) <= 15, lit("a")).otherwise(lit("b"))
        .as("half"),
      expr("try_cast(get_json_object(props, '$.k') as long) div 10").as("b"))
      .where(col("b").isNotNull).localCheckpoint(true)
    def runPsi(rel: DataFrame): Map[String, Long] =
      ExperimentQueries.psi(rel).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("psi_fp"))
        .toMap
    var p1: Map[String, Long] = Map.empty
    em.stage("psi x1") { p1 = runPsi(relBase); p1.size.toLong }
    var pK: Map[String, Long] = Map.empty
    em.stage(s"psi x$Reps") { pK = runPsi(dup(relBase)); pK.size.toLong }
    val psiMaxDelta = if (p1.isEmpty) Long.MaxValue
      else p1.map { case (g, v) => math.abs(pK(g) - v) }.max

    val docBase = Tables.documents(spark, sfDir).select(col("source"),
      col("n_chars").cast("long").as("v")).localCheckpoint(true)
    def runNey(docs: DataFrame): Map[String, (Long, Long, Long, Long)] =
      ExperimentQueries.neyman(docs).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_h"),
          r.getAs[Long]("sd_centi"), r.getAs[Long]("alloc_neyman"),
          r.getAs[Long]("alloc_prop")))
      }.toMap
    var ny1: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage("neyman x1") { ny1 = runNey(docBase); ny1.size.toLong }
    var nyK: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"neyman x$Reps") { nyK = runNey(dup(docBase)); nyK.size.toLong }
    val neymanExact = ny1.nonEmpty && ny1.forall { case (s, (n, sd, an, ap)) =>
      nyK(s) == ((n * Reps, sd, an, ap)) }

    val evBase = Tables.events(spark, sfDir).select(
      col("user_id"),
      when(dayofmonth(col("ts")) <= 15, lit(1)).otherwise(lit(0)).as("pre"),
      expr("cast(round(value * 100) as bigint)").as("cents"))
      .localCheckpoint(true)
    def runCuped(ev: DataFrame): Map[Long, (Long, Long, Long, Long, Long, Long)] =
      ExperimentQueries.cuped(ev).collect().map { r =>
        r.getAs[Long]("arm") -> ((r.getAs[Long]("n_users"),
          r.getAs[Long]("theta_ppm"), r.getAs[Long]("mean_y_ppm"),
          r.getAs[Long]("mean_adj_ppm"), r.getAs[Long]("var_y_cents2"),
          r.getAs[Long]("var_ratio_ppm")))
      }.toMap
    var c1: Map[Long, (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage("cuped x1") { c1 = runCuped(evBase); c1.size.toLong }
    var cK: Map[Long, (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"cuped x$Reps") { cK = runCuped(dup(evBase)); cK.size.toLong }
    val cupedOk = c1.nonEmpty && c1.forall { case (arm, (n, th, my, ma, vy, vr)) =>
      val (nK, thK, myK, maK, vyK, vrK) = cK(arm)
      nK == n && thK == th &&
        math.abs(myK - Reps.toLong * my) <= Reps.toLong &&
        math.abs(maK - Reps.toLong * ma) <= Reps.toLong &&
        math.abs(vyK - Reps.toLong * Reps * vy) <= Reps.toLong * Reps &&
        math.abs(vrK - vr) <= 1000L
    }
    // group-sequential (q392): z^2 at xK duplication is exactly
    // floor(K * d^2 / den) per look, recomputed from the x1 cells in
    // BigInt — cells scale xK exactly, decisions follow the recount
    val gsBase = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        when(dayofmonth(col("ts")) <= 15, 1L).otherwise(2L).as("look"),
        expr("try_cast(get_json_object(props, '$.k') as long)").as("k"))
      .where(col("k").isNotNull).localCheckpoint(true)
    def runGs(rel: DataFrame): Map[String, (Long, Long, Long, Long, Long, Long, String)] =
      ExperimentQueries.pocockTwoLook(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n1"),
          r.getAs[Long]("x1"), r.getAs[Long]("z2_1_micro"),
          r.getAs[Long]("n2"), r.getAs[Long]("x2"),
          r.getAs[Long]("z2_2_micro"), r.getAs[String]("decision")))
      }.toMap
    var gs1: Map[String, (Long, Long, Long, Long, Long, Long, String)] = Map.empty
    em.stage("group-sequential x1") { gs1 = runGs(gsBase); gs1.size.toLong }
    var gsK: Map[String, (Long, Long, Long, Long, Long, Long, String)] = Map.empty
    em.stage(s"group-sequential x$Reps") {
      gsK = runGs(dup(gsBase)); gsK.size.toLong }
    def z2K(x: Long, n: Long): Long = {
      val d = BigInt(x) * Reps * 1000000 - BigInt(400000) * n * Reps
      (d * d / (BigInt(240000) * n * Reps)).toLong
    }
    val gsExact = gs1.nonEmpty && gs1.forall {
      case (g, (n1, x1, _, n2, x2, _, _)) =>
        gsK.get(g).exists { case (n1K, x1K, z1K, n2K, x2K, z2Kv, dK) =>
          n1K == n1 * Reps && x1K == x1 * Reps && n2K == n2 * Reps &&
            x2K == x2 * Reps && z1K == z2K(x1, n1) && z2Kv == z2K(x2, n2) &&
            dK == (if (z2K(x1, n1) >= 4743684L || z2K(x2, n2) >= 4743684L)
              "reject_h0" else "accept_h0")
        }
    }
    // tail dependence (q399): thresholds are order statistics (invariant
    // under xK duplication: ceil(0.9*Kn)-th of the duplicated multiset is
    // the same value), tails scale xK, and both ppm ratios cancel K —
    // the whole readout must be BIT-IDENTICAL except n/n_x/n_y/n_xy xK
    val tdBase = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("x"),
        expr("try_cast(get_json_object(props, '$.k') as long)").as("y"))
      .where(col("y").isNotNull).localCheckpoint(true)
    def runTd(rel: DataFrame): Map[String, (Long, Long, Long, Long, Long, Long, Long, Long)] =
      ExperimentQueries.tailDependence(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n"),
          r.getAs[Long]("tx"), r.getAs[Long]("ty"), r.getAs[Long]("n_x"),
          r.getAs[Long]("n_y"), r.getAs[Long]("n_xy"),
          r.getAs[Long]("lambda_u_ppm"), r.getAs[Long]("lift_ppm")))
      }.toMap
    var td1: Map[String, (Long, Long, Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage("tail-dependence x1") { td1 = runTd(tdBase); td1.size.toLong }
    var tdK: Map[String, (Long, Long, Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"tail-dependence x$Reps") { tdK = runTd(dup(tdBase)); tdK.size.toLong }
    val tdExact = td1.nonEmpty && td1.forall {
      case (g, (n, tx, ty, nx, ny, nxy, lam, lift)) =>
        tdK.get(g).contains((n * Reps, tx, ty, nx * Reps, ny * Reps,
          nxy * Reps, lam, lift))
    }
    em.line(s"""{"summary":"round-11b experimentation invariances at ${Reps}x duplication","psi_fp_max_delta":$psiMaxDelta,"psi_band_ok":${psiMaxDelta <= 64},"neyman_bit_identical":$neymanExact,"cuped_theta_identical_scaling_banded":$cupedOk,"group_sequential_exact":$gsExact,"tail_dependence_exact":$tdExact,"linear":${psiMaxDelta <= 64 && neymanExact && cupedOk && gsExact && tdExact}}""")
  }

  /** SCALESTRESS_r11c: the hypothesis family (q356–q362) under 100×
    * duplication. Provable transforms, asserted tight: HDR quantiles —
    * the ceiling rank obeys ceil(ceil(K·pn/100)/K) = ceil(pn/100), so
    * the selected bucket and its (lo, hi) bracket are INVARIANT while n
    * scales ×100 exactly; Friedman — cell totals ×100 leave every
    * within-block rank unchanged → all outputs bit-identical; Ljung–Box
    * — y, num, den all scale so r_ppm and q_micro are bit-identical;
    * energy distance — numerator and denominator both scale ×100⁴ →
    * e_ppm bit-identical, t_milli ×100 within the single floor (±100);
    * CvM — t_ppm ×100 within ±100; Brown–Forsythe — medians and
    * z-means bit-identical, n_g ×100 exact, and F carries the
    * (N−k)/(k−1) small-sample factor so it drifts by ≤ k/(n−k)
    * relative (banded at 0.5% + quantization slack). */
  val hypothesis: Family = (spark, sfDir, em) => {
    import graft.queries.HypothesisQueries
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)

    val hdrBase = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("v"))
      .where(col("v") >= 1).localCheckpoint(true)
    def runHdr(ev: DataFrame): Map[(String, Long), (Long, Long, Long, Long, Long)] =
      HypothesisQueries.hdrQuantiles(spark, HypothesisQueries.hdrRegisters(ev))
        .collect().map { r =>
          (r.getAs[String]("event_type"), r.getAs[Long]("p")) ->
            ((r.getAs[Long]("n"), r.getAs[Long]("bucket"),
              r.getAs[Long]("lo"), r.getAs[Long]("hi"),
              r.getAs[Long]("width_ppm")))
        }.toMap
    var h1: Map[(String, Long), (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("hdr x1") { h1 = runHdr(hdrBase); h1.size.toLong }
    var hK: Map[(String, Long), (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"hdr x$Reps") { hK = runHdr(dup(hdrBase)); hK.size.toLong }
    val hdrOk = h1.nonEmpty && h1.forall { case (key, (n, b, lo, hi, w)) =>
      hK(key) == ((n * Reps, b, lo, hi, w)) }

    val friBase = Tables.events(spark, sfDir).select(
        expr("unix_millis(ts) div 86400000").as("day"),
        col("event_type").as("g"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .localCheckpoint(true)
    def runFri(ev: DataFrame): Map[String, (Long, Long, Long, Long)] =
      HypothesisQueries.friedman(ev).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("r2_sum"),
          r.getAs[Long]("n_blocks"), r.getAs[Long]("k"),
          r.getAs[Long]("q_ppm")))
      }.toMap
    var f1: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage("friedman x1") { f1 = runFri(friBase); f1.size.toLong }
    var fK: Map[String, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"friedman x$Reps") { fK = runFri(dup(friBase)); fK.size.toLong }
    val friedmanExact = f1.nonEmpty && f1.forall { case (g, t) => fK(g) == t }

    val bfBase = Tables.documents(spark, sfDir).select(col("source"),
      col("n_chars").cast("long").as("v")).localCheckpoint(true)
    def runBf(docs: DataFrame): Map[String, (Long, Long, Long, Long, Long, Long)] =
      HypothesisQueries.brownForsythe(docs).collect().map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("n_g"),
          r.getAs[Long]("med"), r.getAs[Long]("z_mean_ppm"),
          r.getAs[Long]("f_ppm"), r.getAs[Long]("n_tot"),
          r.getAs[Long]("k")))
      }.toMap
    var b1: Map[String, (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage("brown-forsythe x1") { b1 = runBf(bfBase); b1.size.toLong }
    var bK: Map[String, (Long, Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"brown-forsythe x$Reps") { bK = runBf(dup(bfBase)); bK.size.toLong }
    // F is a test statistic: ssb/ssw scale ×K but the (N−k)/(k−1)
    // small-sample factor makes the exact transform
    // F_K = F_1·(K·N−k)/(N−k) up to the term-quantization floors
    val bfOk = b1.nonEmpty && b1.forall { case (s0, (ng, med, zm, fp, nt, k)) =>
      val (ngK, medK, zmK, fpK, _, _) = bK(s0)
      val expected = (BigInt(fp) * (Reps.toLong * nt - k) / (nt - k)).toLong
      ngK == ng * Reps && medK == med && zmK == zm &&
        math.abs(fpK - expected) <= expected / 500 + 2000
    }

    val relBase = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        when(dayofmonth(col("ts")) <= 15, lit("a")).otherwise(lit("b"))
          .as("half"),
        expr("try_cast(get_json_object(props, '$.k') as long)").as("v"))
      .where(col("v").isNotNull).localCheckpoint(true)
    def runCvm(rel: DataFrame): Map[String, Long] =
      HypothesisQueries.cramerVonMises(rel).collect()
        .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("t_ppm"))
        .toMap
    var c1: Map[String, Long] = Map.empty
    em.stage("cvm x1") { c1 = runCvm(relBase); c1.size.toLong }
    var cK: Map[String, Long] = Map.empty
    em.stage(s"cvm x$Reps") { cK = runCvm(dup(relBase)); cK.size.toLong }
    val cvmOk = c1.nonEmpty && c1.forall { case (g, t) =>
      math.abs(cK(g) - Reps.toLong * t) <= Reps.toLong }

    def runEn(rel: DataFrame): Map[String, (Long, Long)] =
      HypothesisQueries.energyDistance(rel).collect().map { r =>
        r.getAs[String]("event_type") ->
          ((r.getAs[Long]("e_ppm"), r.getAs[Long]("t_milli")))
      }.toMap
    var e1: Map[String, (Long, Long)] = Map.empty
    em.stage("energy x1") { e1 = runEn(relBase); e1.size.toLong }
    var eK: Map[String, (Long, Long)] = Map.empty
    em.stage(s"energy x$Reps") { eK = runEn(dup(relBase)); eK.size.toLong }
    val energyOk = e1.nonEmpty && e1.forall { case (g, (ep, tm)) =>
      val (epK, tmK) = eK(g)
      epK == ep && math.abs(tmK - Reps.toLong * tm) <= Reps.toLong }

    val lbBase = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        expr("unix_millis(ts) div 86400000").as("day"),
        expr("cast(round(value * 100) as bigint)").as("c"))
      .localCheckpoint(true)
    def runLb(ev: DataFrame): Map[(String, Long), (Long, Long)] =
      HypothesisQueries.ljungBox(ev).collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("lag")) ->
          ((r.getAs[Long]("r_ppm"), r.getAs[Long]("q_micro")))
      }.toMap
    var l1: Map[(String, Long), (Long, Long)] = Map.empty
    em.stage("ljung-box x1") { l1 = runLb(lbBase); l1.size.toLong }
    var lK: Map[(String, Long), (Long, Long)] = Map.empty
    em.stage(s"ljung-box x$Reps") { lK = runLb(dup(lbBase)); lK.size.toLong }
    val lbExact = l1.nonEmpty && l1.forall { case (key, t) => lK(key) == t }

    // runs test / Wilcoxon: daily totals scale ×K, signs, ranks, runs and
    // both z² are bit-identical
    def runRuns(ev: DataFrame): Seq[Seq[Any]] =
      HypothesisQueries.runsTest(ev).collect().toSeq.map(_.toSeq)
    var r1: Seq[Seq[Any]] = Seq.empty
    em.stage("runs x1") { r1 = runRuns(lbBase); r1.size.toLong }
    var rK: Seq[Seq[Any]] = Seq.empty
    em.stage(s"runs x$Reps") { rK = runRuns(dup(lbBase)); rK.size.toLong }
    val runsExact = r1.nonEmpty && r1 == rK
    def runWsr(ev: DataFrame): Seq[Seq[Any]] =
      HypothesisQueries.wilcoxonSigned(ev).collect().toSeq.map(_.toSeq)
    var w1: Seq[Seq[Any]] = Seq.empty
    em.stage("wilcoxon x1") { w1 = runWsr(lbBase); w1.size.toLong }
    var wK: Seq[Seq[Any]] = Seq.empty
    em.stage(s"wilcoxon x$Reps") { wK = runWsr(dup(lbBase)); wK.size.toLong }
    val wsrExact = w1.nonEmpty && w1 == wK

    // HL / Cliff's δ: pair weights scale ×K² — the weighted-median rank
    // identity keeps the shift invariant, δ's floor divides equally-scaled
    // integers; n_pairs scales ×K² exactly
    def runHl(rel: DataFrame): Map[String, (Long, Long)] =
      HypothesisQueries.hodgesLehmann(rel).collect().map { r =>
        r.getAs[String]("event_type") ->
          ((r.getAs[Long]("n_pairs"), r.getAs[Long]("hl_shift")))
      }.toMap
    var hl1: Map[String, (Long, Long)] = Map.empty
    em.stage("hl x1") { hl1 = runHl(relBase); hl1.size.toLong }
    var hlK: Map[String, (Long, Long)] = Map.empty
    em.stage(s"hl x$Reps") { hlK = runHl(dup(relBase)); hlK.size.toLong }
    val hlOk = hl1.nonEmpty && hl1.forall { case (g, (np, hs)) =>
      hlK(g) == ((np * Reps * Reps, hs)) }
    def runCd(rel: DataFrame): Map[String, (Long, Long)] =
      HypothesisQueries.cliffsDelta(rel).collect().map { r =>
        r.getAs[String]("event_type") ->
          ((r.getAs[Long]("delta_ppm"),
            r.getAs[Long]("n_gt") + r.getAs[Long]("n_lt") +
              r.getAs[Long]("n_eq")))
      }.toMap
    var cd1: Map[String, (Long, Long)] = Map.empty
    em.stage("cliffs x1") { cd1 = runCd(relBase); cd1.size.toLong }
    var cdK: Map[String, (Long, Long)] = Map.empty
    em.stage(s"cliffs x$Reps") { cdK = runCd(dup(relBase)); cdK.size.toLong }
    val cdOk = cd1.nonEmpty && cd1.forall { case (g, (dp, t)) =>
      cdK(g) == ((dp, t * Reps * Reps)) }

    // PACF: the ACF inputs scale exactly (y, num, den all carry the same
    // K²), so every ladder rung is bit-identical. Seasonality: quantized
    // means scale ×K within one floor each — on ppm-scale deviations the
    // perturbation is ~1e-10 relative, so η²/F sit in a ±16 band.
    def runPacf(ev: DataFrame): Seq[(String, Long, Long, Long)] =
      HypothesisQueries.pacf(spark, ev).collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("lag"),
          r.getAs[Long]("r_ppm"), r.getAs[Long]("pacf_ppm"))
      }.toSeq.sorted
    var p1s: Seq[(String, Long, Long, Long)] = Seq.empty
    em.stage("pacf x1") { p1s = runPacf(lbBase); p1s.size.toLong }
    var pKs: Seq[(String, Long, Long, Long)] = Seq.empty
    em.stage(s"pacf x$Reps") { pKs = runPacf(dup(lbBase)); pKs.size.toLong }
    val pacfExact = p1s.nonEmpty && p1s == pKs
    def runSea(ev: DataFrame): Map[(String, Long), (Long, Long, Long, Long)] =
      HypothesisQueries.seasonalityStrength(ev).collect().map { r =>
        (r.getAs[String]("event_type"), r.getAs[Long]("dow")) ->
          ((r.getAs[Long]("n_d"), r.getAs[Long]("mean_ppm"),
            r.getAs[Long]("eta2_ppm"), r.getAs[Long]("f_ppm")))
      }.toMap
    var s1: Map[(String, Long), (Long, Long, Long, Long)] = Map.empty
    em.stage("seasonality x1") { s1 = runSea(lbBase); s1.size.toLong }
    var sK: Map[(String, Long), (Long, Long, Long, Long)] = Map.empty
    em.stage(s"seasonality x$Reps") { sK = runSea(dup(lbBase)); sK.size.toLong }
    val seaOk = s1.nonEmpty && s1.forall { case (key, (nd, mp, e2, fp)) =>
      val (ndK, mpK, e2K, fpK) = sK(key)
      ndK == nd && math.abs(mpK - Reps.toLong * mp) <= Reps.toLong &&
        math.abs(e2K - e2) <= 16L && math.abs(fpK - fp) <= 16L
    }

    // KS-uniform: d_num scales ×K exactly; the 5% verdict is RECOMPUTED
    // at K, never assumed invariant — a real deviation becomes
    // significant as n grows, which is the statistic working, not drift
    val ksBase = relBase.select(col("g"), col("v")).localCheckpoint(true)
    def runKs(rel: DataFrame): Map[String, (Long, Long, Long, Boolean)] =
      HypothesisQueries.ksUniform(spark, rel, 100).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n"),
          r.getAs[Long]("d_num"), r.getAs[Long]("d_ppm"),
          r.getAs[Boolean]("uniform")))
      }.toMap
    var k1: Map[String, (Long, Long, Long, Boolean)] = Map.empty
    em.stage("ks-uniform x1") { k1 = runKs(ksBase); k1.size.toLong }
    var kK: Map[String, (Long, Long, Long, Boolean)] = Map.empty
    em.stage(s"ks-uniform x$Reps") { kK = runKs(dup(ksBase)); kK.size.toLong }
    val ksOk = k1.nonEmpty && k1.forall { case (g, (n, dn, dp, _)) =>
      val (nK, dnK, dpK, uK) = kK(g)
      val expectU = BigInt(dnK) * dnK * 1000000 <=
        BigInt(1844164) * nK * 100 * 100
      nK == n * Reps && dnK == dn * Reps && math.abs(dpK - dp) <= 1 &&
        uK == expectU
    }

    // SPRT: the cumulative walk scales ×K exactly, so the expected first
    // crossing at K is computable from the 1× walk — crossings can only
    // move EARLIER (and may flip decision if an early dip crosses first);
    // both are asserted against the exact recomputation, not a band
    val sprtRaw = Tables.events(spark, sfDir).select(
        col("event_type").as("g"),
        expr("unix_millis(ts) div 86400000").as("day"),
        expr("try_cast(get_json_object(props, '$.k') as long)").as("k"))
      .where(col("k").isNotNull).localCheckpoint(true)
    // The query's own constants, not a copy — if the Ilog2 fold or the
    // hypotheses change, this stress certifies what q375 actually runs.
    val (inc1, inc0, thr) = (HypothesisQueries.SprtInc1,
      HypothesisQueries.SprtInc0, HypothesisQueries.SprtThr)
    def runSprt(raw: DataFrame): Map[String, (Long, Long, Option[Long], String)] = {
      val cells = raw.groupBy(col("g"), col("day"))
        .agg(sum(when(col("k") < 50, 1L).otherwise(0L)).as("n1"),
          sum(when(col("k") < 50, 0L).otherwise(1L)).as("n0"))
      HypothesisQueries.sprtFromDailyCounts(cells, inc1, inc0, thr)
        .collect().map { r =>
          r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
            r.getAs[Long]("final_llr_fp"),
            if (r.isNullAt(r.fieldIndex("crossed_day"))) None
            else Some(r.getAs[Long]("crossed_day")),
            r.getAs[String]("decision")))
        }.toMap
    }
    var sp1: Map[String, (Long, Long, Option[Long], String)] = Map.empty
    em.stage("sprt x1") { sp1 = runSprt(sprtRaw); sp1.size.toLong }
    var spK: Map[String, (Long, Long, Option[Long], String)] = Map.empty
    em.stage(s"sprt x$Reps") { spK = runSprt(dup(sprtRaw)); spK.size.toLong }
    // exact expectation from the 1× walk (bounded collect: |types|·31)
    val walks = sprtRaw.groupBy(col("g"), col("day"))
      .agg((sum(when(col("k") < 50, 1L).otherwise(0L)) * inc1 +
        sum(when(col("k") < 50, 0L).otherwise(1L)) * inc0).as("llr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { rows =>
        rows.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, acc), (_, d0, l)) =>
          (d0, acc + l) }.tail.toSeq
      }.toMap
    val sprtOk = sp1.nonEmpty && sp1.forall { case (g, (nd, fin, cd1, _)) =>
      val (ndK, finK, cdK, decK) = spK(g)
      val walkK = walks(g).map { case (d0, c) => (d0, c * Reps) }
      val expect = walkK.find(w => math.abs(w._2) >= thr)
      val expectDec = expect.map { case (_, c) =>
        if (c >= thr) "accept_h1" else "accept_h0" }.getOrElse("continue")
      ndK == nd && finK == fin * Reps &&
        cdK == expect.map(_._1) && decK == expectDec &&
        (cd1.isEmpty || cdK.exists(_ <= cd1.get))
    }

    // Cochran's Q: duplication adds only identical (user, type) rows, so
    // the presence grid — and every output — must be BIT-identical (the
    // distinct() dedup robustness the blocked test depends on)
    val cqBase = Tables.events(spark, sfDir)
      .where(dayofmonth(col("ts")) <= 7)
      .select(col("user_id"), col("event_type").as("g")).localCheckpoint(true)
    def runCq(rel: DataFrame): Seq[Seq[Any]] =
      HypothesisQueries.cochransQ(rel).collect().toSeq.map(_.toSeq)
    var cq1: Seq[Seq[Any]] = Seq.empty
    em.stage("cochran x1") { cq1 = runCq(cqBase); cq1.size.toLong }
    var cqK: Seq[Seq[Any]] = Seq.empty
    em.stage(s"cochran x$Reps") { cqK = runCq(dup(cqBase)); cqK.size.toLong }
    val cqExact = cq1.nonEmpty && cq1 == cqK

    // Mood's median: pooled median and per-source shares invariant; χ² is
    // a test statistic scaling ×K exactly up to the per-group micro
    // floors (±2K band). This stage is ALSO the wrap sentinel: before the
    // quotient–remainder fix, five per-group terms passed 2⁶³ here and
    // the silent long wrap turned ×100 into ×13.5.
    def runMood(docs: DataFrame): (Map[String, (Long, Long, Long)], Long) = {
      val rows = HypothesisQueries.moodMedian(docs).collect()
      (rows.map { r =>
        r.getAs[String]("source") -> ((r.getAs[Long]("pooled_median"),
          r.getAs[Long]("n_g"), r.getAs[Long]("n_above")))
      }.toMap, rows.head.getAs[Long]("chi2_ppm"))
    }
    var m1: (Map[String, (Long, Long, Long)], Long) = (Map.empty, 0L)
    em.stage("mood x1") { m1 = runMood(bfBase); m1._1.size.toLong }
    var mK: (Map[String, (Long, Long, Long)], Long) = (Map.empty, 0L)
    em.stage(s"mood x$Reps") { mK = runMood(dup(bfBase)); mK._1.size.toLong }
    val moodOk = m1._1.nonEmpty && m1._1.forall { case (s0, (med, ng, ag)) =>
      mK._1(s0) == ((med, ng * Reps, ag * Reps)) } &&
      math.abs(mK._2 - Reps.toLong * m1._2) <= 2L * Reps

    em.line(s"""{"summary":"round-11c hypothesis-statistics invariances at ${Reps}x duplication","hdr_bracket_invariant_n_scales":$hdrOk,"friedman_bit_identical":$friedmanExact,"brown_forsythe_banded":$bfOk,"cvm_scales_within_floor":$cvmOk,"energy_e_bit_identical_t_scales":$energyOk,"ljung_box_bit_identical":$lbExact,"pacf_bit_identical":$pacfExact,"seasonality_banded":$seaOk,"cochran_q_bit_identical":$cqExact,"ks_uniform_scales_verdict_recomputed":$ksOk,"sprt_walk_scales_crossing_recomputed":$sprtOk,"runs_bit_identical":$runsExact,"wilcoxon_bit_identical":$wsrExact,"hl_shift_invariant_pairs_scale":$hlOk,"cliffs_delta_bit_identical":$cdOk,"mood_median_invariant_chi2_banded":$moodOk,"linear":${hdrOk && friedmanExact && bfOk && cvmOk && energyOk && lbExact && pacfExact && seaOk && cqExact && ksOk && sprtOk && runsExact && wsrExact && hlOk && cdOk && moodOk}}""")
  }
}
