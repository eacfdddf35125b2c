package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Reproducible hash-based sampling — the scale-correct way to sample,
  * mix, and split training corpora. Seeded RNG sampling differs between
  * engines, runs, and partitionings; a content/id hash bucket is
  * deterministic everywhere, stable under re-runs and repartitioning, and
  * lets train/val/test membership be recomputed from the row alone (no
  * membership table to join at 100 TB).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the md5 of the key — the first 8
    * hex chars as an unsigned int (cross-engine exact: DuckDB
    * `('0x' || substr(md5(k),1,8))::BIGINT`). */
  def hashBucket(key: Column, buckets: Int = 100): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Keep a deterministic `percent`% of rows by key hash. Buckets are pinned
    * at 100 so `percent` always means a percentage — a configurable bucket
    * count would silently change the threshold semantics. */
  def sampleHash(key: Column, percent: Int): Column =
    hashBucket(key, 100) < percent

  /** Assign train/val/test by hash range: [0,trainPct) → train,
    * [trainPct, trainPct+valPct) → val, rest → test. Membership is a pure
    * function of the key — no shuffle, no state, re-derivable anywhere. */
  def assignSplit(key: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = hashBucket(key, 100)
    when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test")
  }

  /** Stratified keep-predicate: the sample rate (percent) is chosen by the
    * stratum value — the standard corpus-mixing move (downsample the
    * dominant language/source, keep the rare ones whole). Still a pure
    * per-row function of (key, stratum): no per-stratum count pass, no
    * shuffle, exact in expectation at any scale. */
  def stratifiedKeep(key: Column, stratum: Column,
                     rates: Map[String, Int], defaultPct: Int = 100): Column = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (k, v)) =>
      when(stratum === k, v).otherwise(acc)
    }
    hashBucket(key, 100) < rate
  }

  /** Mixture-resampling keep-predicate (DoReMi-style domain reweighting):
    * resample so stratum s contributes ~weight_s/Σweights of a
    * `targetTotal`-row corpus, i.e. per-stratum keep rate
    * r_s = (w_s · T) / (n_s · Σw). All-integer comparison over a
    * million-bucket key hash:
    *
    *   keep  ⟺  bucket(key) · n_s · Σw  <  w_s · T · 10⁶
    *
    * so P(keep) = r_s exactly (up to bucket granularity) with zero float
    * arithmetic — deterministic, re-derivable per row once (n_s, Σw, T) are
    * joined in (stratum counts are a bounded broadcast by definition).
    * Caller guarantees r_s ≤ 1 (T ≤ min_s n_s·Σw/w_s) — rates cap at 1
    * implicitly since a bucket can't exceed 10⁶. LHS magnitude:
    * 10⁶ · n_s · Σw must stay under 2⁶³ — holds to ~10¹² rows per stratum
    * at Σw ≤ a few thousand.
    */
  def mixtureKeep(key: Column, nStratum: Column, weight: Column,
                  sumWeights: Column, targetTotal: Column): Column =
    hashBucket(key, 1000000) * nStratum * sumWeights <
      weight * targetTotal * lit(1000000L)

  /** Priority-sampling priority (Duffield/Lund/Thorup, JACM '07):
    * q = w / u with u uniform in (0, 1] — the k highest-priority rows per
    * group are a weighted-without-replacement sample whose subset-sum
    * estimator is unbiased. Deterministic-exact form: u comes from the
    * million-bucket key hash (so membership is re-derivable from the row,
    * like every sampler here) and the priority stays INTEGER,
    *
    *   priority_fp = (w_fp · 10⁶) div (bucket(key) + 1)
    *
    * — no float division, so Spark and the oracle agree bit-for-bit.
    * `weightFp` must be a positive integer (pre-scale decimals: cents,
    * ppm); magnitude bound w_fp < 2⁴³ keeps the product under 2⁶³. */
  def priorityFp(key: Column, weightFp: Column): Column =
    call_function("div", weightFp * lit(1000000L), hashBucket(key, 1000000) + lit(1L))

  /** Deterministic global training-order shuffle with balanced shard
    * assignment — the "shuffle the corpus before writing training shards"
    * step, made reproducible: order rows by the md5 of their id (a fixed
    * pseudo-random permutation, re-derivable from the data alone — no RNG
    * state, no seed file), then deal them round-robin into `nShards`
    * shards. Appends `shard` (0..nShards-1) and `shard_pos` (0-based
    * position within the shard); shard sizes differ by at most 1.
    *
    * The global rank comes from [[graft.operators.RunningTotal.grouped]]
    * over a constant group — a range-partitioned two-phase prefix sum, NOT
    * a single-task global window, so the permutation scales to any corpus
    * (the same escape [[graft.transform.Star.denseIdsScalable]] uses).
    * Rank determinism rides on md5-order uniqueness of the ids — 128 bits,
    * the same no-collision license as [[Curation.dedupSpans]]'s span
    * election.
    */
  def shardAssign(df: org.apache.spark.sql.DataFrame, idCol: String,
                  nShards: Int): org.apache.spark.sql.DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1 (got $nShards)")
    val withH = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__g", lit(0))
      .withColumn("__one", lit(1L))
    graft.operators.RunningTotal.grouped(withH, "__g", "__h", "__one", "__rank",
        Some(1L)) // constant group: the pre-pass is provably unnecessary
      .withColumn("shard", (col("__rank") - 1L) % nShards)
      .withColumn("shard_pos", expr(s"(__rank - 1) div $nShards"))
      .drop("__h", "__g", "__one", "__rank")
  }

  /** Source-interleaved curriculum layout: rows are shuffled WITHIN their
    * source (md5-of-id order, as in [[shardAssign]]) and the sources are
    * then dealt out round-robin — position p of every source precedes
    * position p+1 of any source, so consecutive training rows cycle
    * through the mixture instead of streaming one domain at a time (the
    * standard heterogeneous-batch layout; a plain global shuffle gives
    * this only in expectation, this gives it by construction). Appends
    * `src_pos` (0-based rank within the source) and `interleave_pos`
    * (0-based global rank by (src_pos, source)).
    *
    * Both ranks come from [[graft.operators.RunningTotal.grouped]] — the
    * within-source rank grouped BY source, the global rank over the
    * composite (src_pos, source) order — so no single-task window appears
    * anywhere, at any corpus or source size.
    */
  def interleaveBySource(df: org.apache.spark.sql.DataFrame, idCol: String,
                         sourceCol: String,
                         sourceCountHint: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    val withH = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__one", lit(1L))
    val inSrc = graft.operators.RunningTotal
      .grouped(withH, sourceCol, "__h", "__one", "__src_rank", sourceCountHint)
      .withColumn("src_pos", col("__src_rank") - 1L)
      .drop("__src_rank", "__h")
      .withColumn("__g", lit(0))
    graft.operators.RunningTotal
      .grouped(inSrc, "__g", Seq("src_pos", sourceCol), "__one", "__rank",
        groupCountHint = Some(1L)) // constant group
      .withColumn("interleave_pos", col("__rank") - 1L)
      .drop("__g", "__one", "__rank")
  }

  /** Per-source document cap (the CommonCrawl "max docs per domain" rule):
    * keep the `k` documents with the smallest `md5(id)` in each source — a
    * deterministic uniform sample of exactly min(k, |source|) docs, stable
    * under corpus growth EXCEPT at the cap boundary (a new doc with a
    * smaller hash displaces the current k-th; any cap rule must displace
    * something).
    *
    * The within-source rank comes from the grouped prefix sum
    * ([[graft.operators.RunningTotal]]) over the composite (hash, id)
    * order — never a `Window.partitionBy(source)`, so a billion-document
    * source never concentrates on one task. Returns the input plus
    * (cap_rank, kept); unordered.
    */
  def capPerSource(df: org.apache.spark.sql.DataFrame, idCol: String,
                   sourceCol: String, k: Long,
                   sourceCountHint: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 1, s"cap must be >= 1 (got $k)")
    val withH = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__one", lit(1L))
    graft.operators.RunningTotal
      .grouped(withH, sourceCol, Seq("__h", idCol), "__one", "__rank",
        groupCountHint = sourceCountHint)
      .withColumn("cap_rank", col("__rank"))
      .withColumn("kept", col("__rank") <= k)
      .drop("__h", "__one", "__rank")
  }

  /** Per-source TOKEN budget (the token-denominated sibling of
    * [[capPerSource]]): admit documents in deterministic md5(id) order
    * until the source's cumulative token count exceeds `budget` — the
    * standard "at most N tokens per domain" mixture rule, which caps by
    * what training actually consumes rather than by document count.
    *
    * Because the cumulative sum is monotone, the admitted set is a strict
    * PREFIX of the hash order: the first document that would overflow the
    * budget ends admission for its source (no best-fit backfilling — that
    * would make membership depend on later arrivals, breaking the
    * incremental/streaming equivalence). A document alone larger than the
    * budget blocks its source entirely, by design.
    *
    * The running sum rides [[graft.operators.RunningTotal.grouped]] over
    * the composite (hash, id) order — never a `Window.partitionBy(source)`
    * — so a billion-document source never concentrates on one task.
    * Returns the input plus (cum_tokens, kept); unordered.
    */
  def tokenBudgetPerSource(df: org.apache.spark.sql.DataFrame, idCol: String,
                           sourceCol: String, tokenCol: String,
                           budget: Long,
                           sourceCountHint: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    require(budget >= 1, s"budget must be >= 1 (got $budget)")
    val withH = df.withColumn("__h", md5(col(idCol).cast("string")))
    graft.operators.RunningTotal
      .grouped(withH, sourceCol, Seq("__h", idCol), tokenCol, "cum_tokens",
        groupCountHint = sourceCountHint)
      .withColumn("kept", col("cum_tokens") <= budget)
      .drop("__h")
  }

  /** Temperature-scaled source mixture with LARGEST-REMAINDER rounding:
    * allocate an integer sampling quota of exactly `total` documents
    * across sources, with source s weighted by ⌊√cₛ⌋ (the α = 0.5
    * mixture temperature of multilingual-LM practice — flattens the
    * head, lifts the tail) and the fractional shares rounded by the
    * Hamilton/largest-remainder method so the quotas sum EXACTLY to
    * `total`.
    *
    * Everything is 64-bit-integer exact, so the result is reproducible
    * across engines: the integer sqrt is `floor(sqrt(double))` hardened
    * by a ±1 correction (exact for any count < 2⁶³ regardless of float
    * rounding); shares are `(total·wₛ) div W` with remainder
    * `(total·wₛ) mod W`; the `total − Σ base` leftover units go to the
    * largest remainders (ties by source name). The remainder rank rides
    * [[graft.operators.RunningTotal.grouped]] and the two scalar totals
    * (W, leftover) ride one-row aggregates broadcast back onto the
    * table — the per-source aggregate is only #sources rows, but the
    * house rule (no single-task global window, ever) costs nothing to
    * keep.
    *
    * Returns (source, n_docs, w, base, rem, rem_rank, quota); unordered.
    * Σ quota = total by construction.
    */
  def temperatureQuotas(df: org.apache.spark.sql.DataFrame, sourceCol: String,
                        total: Long): org.apache.spark.sql.DataFrame = {
    require(total >= 0, s"total must be >= 0 (got $total)")
    val counts = df.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      // integer sqrt: float estimate, then correct — exact even where the
      // double sqrt rounds across an integer boundary
      .withColumn("__w0", floor(sqrt(col("n_docs").cast("double"))).cast("long"))
      .withColumn("w",
        when((col("__w0") + 1L) * (col("__w0") + 1L) <= col("n_docs"), col("__w0") + 1L)
          .when(col("__w0") * col("__w0") > col("n_docs"), col("__w0") - 1L)
          .otherwise(col("__w0")))
      .drop("__w0")
    // scalar totals ride ONE-ROW aggregates broadcast back onto the table
    // (never an empty-frame global window)
    val shares = counts
      .crossJoin(broadcast(counts.agg(sum(col("w")).as("__W"))))
      .withColumn("base", expr(s"($total * w) div __W"))
      .withColumn("rem", expr(s"($total * w) % __W"))
      .withColumn("__negrem", -col("rem"))
      .withColumn("__one", lit(1L))
      .withColumn("__g", lit(0))
    val ranked = graft.operators.RunningTotal
      .grouped(shares, "__g", Seq("__negrem", "source"), "__one", "rem_rank",
        groupCountHint = Some(1L)) // constant group over #sources rows
    val leftover = ranked
      .crossJoin(broadcast(ranked.agg((lit(total) - sum(col("base"))).as("__R"))))
    leftover
      .withColumn("quota",
        col("base") + when(col("rem_rank") <= col("__R"), 1L).otherwise(0L))
      .select(col("source"), col("n_docs"), col("w"), col("base"),
        col("rem"), col("rem_rank"), col("quota"))
  }

  /** Epoch-repetition mixing plan: how many times each document is seen
    * when source `s` must contribute `quota_tokens` training tokens but
    * only carries `src_tokens` of them — the up-sampling side of mixture
    * design (the multi-epoch regime of Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models": small high-quality sources repeat;
    * the fractional tail is a deterministic hash-order prefix, so reruns
    * pick the SAME tail docs).
    *
    *  - `full_epochs = quota div src_tokens` — every doc repeats this many
    *    times;
    *  - the remaining `quota mod src_tokens` budget admits one more copy
    *    of the docs whose cumulative token count (in (md5(id), id) order —
    *    [[tokenBudgetPerSource]]'s exact rule) still fits;
    *  - `n_copies = full_epochs + (extra ? 1 : 0)`.
    *
    * `quotas` is (source, quota) — bounded by the source set, broadcast.
    * Scale shape: one per-source agg (bounded), one broadcast join, one
    * grouped prefix sum ([[graft.operators.RunningTotal]] — range-
    * partitioned, never a per-source window). Sources absent from `quotas`
    * get quota 0 (n_copies 0), so a partial plan is safe, not silent.
    *
    * Returns (doc_id, source, n_tokens, cum_tokens, full_epochs, extra,
    * n_copies); unordered. */
  def epochPlan(df: org.apache.spark.sql.DataFrame, idCol: String,
                sourceCol: String, tokenCol: String,
                quotas: org.apache.spark.sql.DataFrame,
                sourceCountHint: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    val totals = df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).as("__src_tokens"))
    val withH = df.withColumn("__h", md5(col(idCol).cast("string")))
    val cum = graft.operators.RunningTotal
      .grouped(withH, sourceCol, Seq("__h", idCol), tokenCol, "cum_tokens",
        groupCountHint = sourceCountHint)
    cum
      .join(broadcast(totals), Seq(sourceCol))
      .join(broadcast(quotas.select(col("source").as(sourceCol),
        col("quota").as("__quota"))), Seq(sourceCol), "left")
      .withColumn("__quota", coalesce(col("__quota"), lit(0L)))
      .withColumn("full_epochs", expr("__quota div __src_tokens"))
      .withColumn("extra",
        col("cum_tokens") <= col("__quota") % col("__src_tokens"))
      .withColumn("n_copies",
        col("full_epochs") + when(col("extra"), 1L).otherwise(0L))
      .drop("__h", "__src_tokens", "__quota")
  }

  /** Length-bucketed batching layout: assign each document to the smallest
    * power-of-two token bucket that holds it (floor 16, cap 2048 — longer
    * docs clamp into the top bucket) and report the padding waste per
    * bucket — the pre-flight a batch-inference or packing scheduler reads
    * to pick bucket edges. One row-local CASE + one map-side-combined
    * groupBy over ≤9 keys; nothing else moves.
    *
    * Returns (bucket, n_docs, sum_tokens, padding, waste_fp) where
    * `padding = Σ (bucket − n_tokens)` over the bucket's docs (clamped
    * docs contribute 0) and `waste_fp = padding·10⁶ div (n_docs·bucket)`;
    * unordered. */
  def lengthBuckets(df: org.apache.spark.sql.DataFrame, tokenCol: String)
      : org.apache.spark.sql.DataFrame = {
    val n = col(tokenCol)
    val edges = Seq(16L, 32L, 64L, 128L, 256L, 512L, 1024L, 2048L)
    val bucket = edges.init.reverse.foldLeft(lit(edges.last)) { (acc, e) =>
      when(n <= e, e).otherwise(acc)
    }
    df.where(n > 0)
      .withColumn("bucket", bucket)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(n).as("sum_tokens"),
        sum(greatest(col("bucket") - n, lit(0L))).as("padding"))
      .withColumn("waste_fp",
        expr("(padding * 1000000L) div (n_docs * bucket)"))
  }
}
