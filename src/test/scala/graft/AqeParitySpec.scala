package graft

import org.apache.spark.sql.DataFrame

/** AQE on/off PARITY certification (round-11 ask): the oracle suite pins
  * one plan world (AQE as the session default), but a production 100 TB
  * cluster runs Adaptive Query Execution with runtime re-planning —
  * coalesced shuffle reads, demoted/promoted broadcasts, skew-join
  * splitting. None of that may change ANSWERS. A representative slice —
  * multi-join TPC-H shapes plus the salted-join/salted-agg skew family
  * (the operators AQE's skew handling overlaps with) — runs with
  * `spark.sql.adaptive.enabled` both ways and must return identical row
  * multisets. Exactness is expectable because the repo's house arithmetic
  * is reassociation-proof (DECIMAL sums, integer fixed-point), so a plan
  * change cannot shift a value — which is exactly what this spec locks.
  *
  * Plan behavior under AQE, asserted rather than assumed: q327's
  * domain-bounded grid join stays a broadcast join (AQE keeps planned
  * broadcasts); q326's shared rank windows must still not funnel through
  * a single-partition Exchange. The one lock that legitimately DEGRADES
  * under AQE is static exchange reuse (`ReusedExchange`): AQE re-plans
  * per-stage and applies its own reuse, so the round-10 lock asserting a
  * shared `hashpartitioning(ym)` exchange is only asserted in the
  * non-adaptive world (Round10OpsSpec) — here we assert the adaptive plan
  * introduces no single-partition funnel in its place.
  */
class AqeParitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Run a registry query under an explicit AQE setting (skew-join
    * splitting force-enabled in the adaptive world so the skew path is
    * actually exercised at test scale), restoring session defaults. */
  private def runWith(aqe: Boolean, name: String): (Seq[String], String) = {
    val conf = spark.conf
    val oldAqe = conf.getOption("spark.sql.adaptive.enabled")
    val oldSkew = conf.getOption("spark.sql.adaptive.skewJoin.enabled")
    val oldForce =
      conf.getOption("spark.sql.adaptive.forceOptimizeSkewedJoin")
    try {
      conf.set("spark.sql.adaptive.enabled", aqe.toString)
      conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", aqe.toString)
      val df: DataFrame = SparkEntry.queries(name)(spark, sf)
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString())
    } finally {
      def restore(k: String, v: Option[String]): Unit =
        v.fold(conf.unset(k))(conf.set(k, _))
      restore("spark.sql.adaptive.enabled", oldAqe)
      restore("spark.sql.adaptive.skewJoin.enabled", oldSkew)
      restore("spark.sql.adaptive.forceOptimizeSkewedJoin", oldForce)
    }
  }

  private val slice = Seq(
    // TPC-H shapes: multi-join + agg, outer-join agg, dim-heavy min-cost,
    // nation-volume join tree, share-of-total window readout
    "q66_shipping_priority",
    "q63_custdist",
    "q64_min_cost_supplier",
    "q67_local_supplier_volume",
    "q82_market_share",
    // the skew family: AQE's skew-join splitting overlaps the manual salt
    "q60_salted_join",
    "q76_salted_agg",
    // the round-10 plan-locked statistics (broadcast grid, shared windows)
    "q326_spearman",
    "q327_kendall_grid",
    // round-11 additions: the t-closeness class x bucket grid (broadcast
    // cross + zero-fill left join), the quantile-norm as-of sweep, the
    // isotonic minimax's three bounded broadcast joins, and CUPED's
    // moment-broadcast rejoin — each a join shape AQE could re-plan
    "q348_t_closeness",
    "q349_quantile_norm",
    "q350_isotonic",
    "q353_cuped",
    // round-11 hypothesis family: the HDR percentile expansion (bounded
    // windows + a broadcast nested-loop over 3 rows + a grid join back),
    // the pairwise difference-weight grid with its weighted-median scan,
    // and the Wilcoxon pairing join + tie-correction rejoin — the three
    // join shapes the family adds that AQE could re-plan
    "q356_hdr_quantiles",
    "q364_hodges_lehmann",
    "q367_wilcoxon_signed",
    // the ninth-batch shapes: the dense KS grid (broadcast range cross +
    // zero-fill left join) and the SPRT crossing scan (calendar window +
    // broadcast crossing rejoin)
    "q374_ks_uniform",
    "q375_sprt",
    // round-12 lexical family: the census right-join universe (fail-closed
    // NULL rows must survive a re-planned join), the vocab-bounded top-100
    // ranking window, and the dense Benford digit grid (broadcast range
    // cross + zero-fill left + broadcast chi rejoin)
    "q380_chao1_vocab",
    "q382_zipf_slope",
    "q383_benford",
    "q384_gini_lengths",
    // the mixture pair: grand-total broadcast rejoin; keeper election's
    // corpus-scale shuffle equi-join back on (hash, min doc_id)
    "q385_sqrt_mixture",
    "q386_dedup_tokens",
    // the round-12 tail: the two-look cells reduction and the clipped
    // trimmed-mean windows over the counts frame
    "q392_group_sequential",
    "q393_trimmed_mean",
    // round-13: Davies-Bouldin's k/k²-bounded broadcast rejoins + the
    // one-row index broadcast, and Theil-Sen's calendar-bounded pair
    // self-join with its broadcast median rejoin (q396 joins NOTHING —
    // its narrow map has no join for AQE to re-plan — so q397/q398 are
    // the family's AQE-sensitive shapes)
    "q397_davies_bouldin",
    "q398_theil_sen",
    // tail-dependence: two broadcast threshold rejoins into the counts
    // frame — the joint-tail count must survive a re-planned join
    "q399_tail_dependence",
    // round-14: the probe-curve sweep — four cell-restricted broadcast
    // equi-joins + per-(query,nprobe) rank windows + the hit semi-joins,
    // all shapes AQE could re-plan (q401's single aggregate joins nothing)
    "q402_ivf_probe_curve",
    // the eta^2 grid rejoin (5-row frames), the assortativity degree
    // attach (two corpus-keyed equi-joins — the skew-join overlap), and
    // the vocab-growth checkpoint crosses (4-row broadcasts)
    "q403_dow_eta2",
    "q404_assortativity",
    "q405_vocab_growth")

  slice.foreach { name =>
    test(s"$name: identical rows with AQE off and on") {
      val (off, _) = runWith(aqe = false, name)
      val (on, planOn) = runWith(aqe = true, name)
      assert(planOn.contains("AdaptiveSparkPlan"),
        s"$name did not actually plan adaptively:\n$planOn")
      assert(off == on,
        s"$name diverges under AQE: ${off.size} vs ${on.size} rows; " +
          s"first diff: ${off.zip(on).find { case (a, b) => a != b }}")
    }
  }

  test("plan locks under AQE: q327 broadcast holds, no single-partition funnels") {
    val (_, p327) = runWith(aqe = true, "q327_kendall_grid")
    assert(p327.contains("BroadcastHashJoin") ||
      p327.contains("BroadcastNestedLoopJoin"),
      s"q327 grid join lost its broadcast under AQE:\n$p327")
    val (_, p326) = runWith(aqe = true, "q326_spearman")
    assert(!p326.contains("Exchange SinglePartition"),
      s"q326 funnels through a single partition under AQE:\n$p326")
    // q60's build side (the 3-row surrogate-key dim) legitimately holds a
    // bounded SinglePartition exchange — scope the funnel check to the
    // STREAMED side, i.e. the plan text before the first BroadcastExchange
    // (the repo's plan-guard scoping rule).
    val (_, p60) = runWith(aqe = true, "q60_salted_join")
    val streamed60 = p60.substring(0,
      math.max(p60.indexOf("BroadcastExchange"), 0) match {
        case 0 => p60.length; case i => i })
    assert(!streamed60.contains("Exchange SinglePartition"),
      s"q60 salted join's streamed side funnels through one partition:\n$p60")
  }
}
