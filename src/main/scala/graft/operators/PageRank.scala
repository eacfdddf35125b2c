package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list (Page/Brin/Motwani/Winograd
  * 1999) — the classic link-authority score a web-scale curation pipeline
  * uses to weight crawl quality (OpenWebText/CCNet-style "well-linked
  * pages are higher quality" priors).
  *
  * Exactness: ranks are FIXED-POINT BIGINTs. With `scale` = 10¹²,
  * r⁰ = scale div n, and each round computes
  *
  *   rᵢ₊₁(v) = base + (85 · Σ_{u→v} (rᵢ(u) div outdeg(u))) div 100
  *   base    = ((scale div n) · 15) div 100
  *
  * — every operation an integer multiply/divide/sum, so the result is
  * bit-identical across engines and partitionings (a float rank would make
  * the per-destination sum order-dependent). The damping factor is the
  * standard 0.85 expressed as the rational 85/100.
  *
  * Semantics notes, both deliberate and documented:
  *  - FIXED iteration count, not convergence-tested: the caller picks
  *    `iters` (power iteration's error decays as 0.85^k, so 20–50 rounds
  *    is production-grade; tests use fewer). Deterministic round count is
  *    also what makes the result oracle-checkable.
  *  - Dangling nodes (outdeg 0) drop their mass by default — the common
  *    simplification; total mass then decays toward the teleport floor but
  *    RELATIVE ranking is preserved, which is all a quality-weighting
  *    consumer reads. `danglingRedistribute = true` switches to the full
  *    Page et al. treatment: each round the dangling nodes' pooled rank is
  *    split `div n` across every node (inside the damped term), keeping
  *    total mass ≈ scale so absolute ranks stay comparable across graphs.
  *    The pooled mass is a ONE-ROW aggregate broadcast into the round's
  *    plan — no per-round driver collect.
  *
  * Scale shape (100 TB): per round, ONE hash-partitioned equi-join of the
  * rank table against the degree-annotated edge list (both sides
  * partitioned on the source id) and ONE map-side-combined sum keyed by
  * destination — no all-pairs stage, no driver-side graph state beyond the
  * single node count. The edge⋈degree join is computed once before the
  * loop and localCheckpoint'd; each round's rank frame is localCheckpoint'd
  * to truncate lineage (same license as
  * [[ConnectedComponents.componentsStar]]'s bounded driver loop).
  */
object PageRank {

  /** Fixed-point ranks after `iters` power-iteration rounds.
    * Returns (id, r_fp), unordered — callers sort at the dump layer. */
  def ranksFp(edges: DataFrame, srcCol: String, dstCol: String,
              iters: Int, scale: Long = 1000000000000L,
              danglingRedistribute: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(scale >= 1000000L, s"scale must be >= 10^6 (got $scale)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    // one driver scalar (a bounded collect by construction — same license
    // as the corpus-size reads in BooksEtl.summarize)
    val n = nodes.count()
    require(n > 0, "PageRank over an empty graph")
    val init = scale / n
    val base = (init * 15L) / 100L
    // degree-annotated edges, computed once: (src, dst, deg)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint(true)
    // dangling node set is fixed across rounds: nodes with no out-edges
    val danglingIds =
      if (danglingRedistribute)
        nodes.join(deg, nodes("id") === deg("src"), "left_anti").localCheckpoint(true)
      else null
    // Per-round join strategy: the rank frame and the per-dst sum frame
    // are both |nodes|-bounded, so when the graph fits the count gate
    // broadcast them into the round's two joins. The edge table — the
    // O(m) side — then never exchanges inside a round: each round is ONE
    // shuffle (the map-side-combined per-dst sum) instead of three
    // (edge⋈rank, the sum, nodes⋈sum). Past the gate (billions of nodes
    // at 100 TB) both joins revert to shuffle joins automatically.
    // The gate is LOWER than Triangles' one-shot 4M gate: a loop builds
    // 2 broadcasts per round, every round, so the per-round budget is
    // sized for that churn (1M nodes ≈ tens of MB per built hash
    // relation) rather than for one relation built once.
    val bounded = (df: DataFrame) =>
      if (n <= PerRoundBroadcastMaxNodes) broadcast(df) else df
    var r = nodes.select(col("id"), lit(init).as("r_fp"))
    for (_ <- 1 to iters) {
      val s = ed.join(bounded(r), col("src") === col("id"))
        .select(col("dst"), expr("r_fp div deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val joined = nodes.join(bounded(s), nodes("id") === s("dst"), "left")
      r = if (danglingRedistribute) {
        // pooled dangling mass, pre-split div n: one row, broadcast into
        // the plan so the round stays a single distributed job. This
        // branch reads r TWICE per round (rank join + dangling pool), so
        // every round is materialized — a lazy r would execute its chain
        // once per consumer.
        val share = r.join(bounded(danglingIds), Seq("id"), "left_semi")
          .agg(coalesce(sum(col("r_fp")), lit(0L)).as("t"))
          .select(expr(s"t div ${n}L").as("__share"))
        joined.crossJoin(broadcast(share))
          .select(nodes("id"),
            (lit(base) + expr("(85 * (coalesce(s, 0L) + __share)) div 100")).as("r_fp"))
          .localCheckpoint(true)
      } else {
        // Per-round materialization kept DELIBERATELY: a
        // checkpoint-every-k stride (lazy intermediate rounds, broadcast
        // builds still once) was A/B'd at 10M edges / 500k nodes / 12
        // rounds in round 16 and measured a WASH — alternating probes
        // spanned 13.9–20.5 s (stride) vs 14.5–21.3 s (per-round); the
        // round barrier is the broadcast build, not the checkpoint write.
        joined.select(nodes("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r_fp"))
          .localCheckpoint(true)
      }
    }
    r
  }

  /** Node-count gate for PER-ROUND broadcasts inside iterative loops —
    * deliberately below the 4M one-shot gate (Triangles) because a loop
    * re-broadcasts every round (round-15 advice: count-based per-round
    * broadcasts near the gate are a new driver-memory risk profile). */
  private[operators] val PerRoundBroadcastMaxNodes = 1000000L

  /** WEIGHTED fixed-point PageRank: each out-edge carries `r·w div Σw`
    * of its source's rank instead of the uniform `r div deg` — the
    * strength-aware variant a co-purchase / citation graph wants (a
    * 100-count edge should pull 100× a singleton). Same per-round shape
    * as [[ranksFp]]: ONE hash join (rank ⋈ weighted edges on src) + ONE
    * map-side-combined sum, rank frames localCheckpoint'ed. Weights must
    * be POSITIVE (raise_error-guarded, the Bfs.sssp rule) and bounded so
    * `scale · w` stays under 2⁶³ — fine for count-valued weights.
    * Dangling mass evaporates (callers wanting redistribution: q143's
    * [[ranksFp]] flag shows the shape). Returns (id, r_fp). */
  def ranksFpWeighted(edges: DataFrame, srcCol: String, dstCol: String,
                      wCol: String, iters: Int,
                      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1 (got $iters)")
    require(scale >= 1000000L, s"scale must be >= 10^6 (got $scale)")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"),
      when(col(wCol).cast("long") <= 0, raise_error(concat(
          lit("ranksFpWeighted: edge weights must be positive, got "),
          col(wCol).cast("string"))))
        .otherwise(col(wCol).cast("long")).as("w"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "PageRank over an empty graph")
    val init = scale / n
    val base = (init * 15L) / 100L
    val sw = e.groupBy(col("src")).agg(sum(col("w")).as("sw"))
    val ed = e.join(sw, Seq("src")).localCheckpoint(true)
    // same |nodes|-gated broadcast discipline as [[ranksFp]]: one shuffle
    // per round (the per-dst sum), edges never exchange inside a round
    val bounded = (df: DataFrame) =>
      if (n <= PerRoundBroadcastMaxNodes) broadcast(df) else df
    var r = nodes.select(col("id"), lit(init).as("r_fp"))
    for (_ <- 1 to iters) {
      val s = ed.join(bounded(r), col("src") === col("id"))
        .select(col("dst"), expr("(r_fp * w) div sw").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // per-round materialization kept: stride A/B'd a wash, see [[ranksFp]]
      r = nodes.join(bounded(s), nodes("id") === s("dst"), "left")
        .select(nodes("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("r_fp"))
        .localCheckpoint(true)
    }
    r
  }
}
