package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.RunningTotal

/** Corpus-curation operators for large-scale training-data pipelines:
  * benchmark-contamination detection (join + stateless streaming forms),
  * repetition-based quality filters (Gopher-style), a corpus-derived
  * bigram-LM fluency score, cross-document span deduplication with
  * reassembly, and deterministic sequence packing.
  *
  * Each is shaped for the 100 TB case:
  *  - contamination: the benchmark side is bounded (eval sets are small) →
  *    ONE broadcast row of its n-grams, row-local `array_intersect` on the
  *    corpus side — the corpus never shuffles (same license as
  *    [[Ivf.assign]]'s packed centroids); the [[contaminationFilter]] form
  *    is fully stateless for streams;
  *  - repetition stats: entirely row-local (sort + one fold per document),
  *    zero shuffles — the cheapest possible quality gate;
  *  - LM fluency: fixed-point integer probabilities, so sums are
  *    order-independent and the big⋈big gram join stays hash-partitioned;
  *  - span dedup: two hash-partitioned shuffles (winner election on the
  *    span hash, reassembly on the doc id), never all-pairs;
  *  - packing: grouped prefix sums via [[RunningTotal]] — no
  *    one-task-per-group window.
  */
object Curation {

  /** Word n-grams over an ALREADY-MATERIALIZED token-array column (see
    * [[TextAnalysis.shinglesFromTokens]] for why a projected column, not an
    * inline tokens() call). Docs with fewer than `n` tokens → empty array. */
  def ngramsFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram width must be >= 1, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  // ----------------------------------------------------- contamination
  /** Benchmark-contamination report: for every corpus document NOT in the
    * benchmark set, how many of its distinct word `n`-grams appear anywhere
    * in the benchmark documents' n-grams (GPT-3/PaLM-style decontamination,
    * re-expressed relationally).
    *
    * The benchmark n-gram set is packed into one broadcast row; the overlap
    * is a row-local `array_intersect` — zero shuffle of the corpus and zero
    * row multiplication at any scale, because eval benchmarks are KB-to-MB
    * sized by construction. Returns (doc_id, n_grams, n_overlap,
    * contaminated); unordered — callers sort if they need to dump.
    *
    * @param isBench predicate selecting benchmark docs, evaluated against
    *   the CALLER's columns (before the id rename) — so it references the
    *   original id column name, matching `Importance.hashedNgramScores`
    */
  def contamination(docs: DataFrame, textCol: String, idCol: String,
                    isBench: Column, n: Int = 8): DataFrame = {
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"),
        isBench.as("__bench"))
      .select(col("doc_id"),
        array_distinct(ngramsFromTokens(col("toks"), n)).as("grams"),
        col("__bench"))
    // one row: the sorted distinct benchmark gram set (bounded by design)
    val benchGrams = toked.where(col("__bench"))
      .select(explode(col("grams")).as("g")).distinct()
      .agg(sort_array(collect_list(col("g"))).as("__bench_grams"))
    toked.where(!col("__bench"))
      .crossJoin(broadcast(benchGrams))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        size(array_intersect(col("grams"), col("__bench_grams"))).cast("long").as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }

  /** The distinct benchmark n-gram set as a driver-side Seq (sorted for
    * determinism) — the batch half of the streaming contamination gate:
    * compute once here, then gate the corpus stream with
    * [[contaminationFilter]].
    *
    * The collect is HARD-BOUNDED: the plan fetches at most `maxGrams + 1`
    * rows (`limit` pushes into the exchange, so the driver can never
    * receive an unbounded set even on a mis-specified predicate), and a
    * `require` rejects sets over budget. Eval benchmarks are KB-to-MB by
    * construction; a "benchmark" beyond the budget is a corpus — use the
    * broadcast-join form [[contamination]] for that.
    *
    * @param isBench predicate over the caller's columns selecting benchmark docs
    * @param maxGrams driver budget for distinct grams (default 2^20 ≈ 1M,
    *   ~tens of MB of strings — far above any real eval set)
    */
  def benchGramSet(docs: DataFrame, textCol: String, isBench: Column,
                   n: Int, maxGrams: Int = 1 << 20): Seq[String] = {
    graft.io.Bounded.collect(graft.io.Tables.widen(docs).where(isBench)
        .select(TextAnalysis.tokens(col(textCol)).as("toks"))
        .select(explode(array_distinct(ngramsFromTokens(col("toks"), n))).as("g"))
        .distinct(),
      maxRows = maxGrams,
      why = s"a benchmark's distinct $n-grams are gate configuration; one " +
        "this large is a corpus — use the join form (Curation.contamination)")
      .map(_.getString(0)).sorted.toSeq
  }

  /** Stateless contamination annotator for a KNOWN benchmark gram set —
    * the streaming-gate form of [[contamination]]: the gram set is a plain
    * literal array (bounded by construction — eval benchmarks are KB-MB),
    * so this works identically on a batch frame and a `readStream` frame
    * (no join, no state, no watermark; production computes the set once in
    * batch, then gates the incoming corpus stream with it). */
  def contaminationFilter(docs: DataFrame, textCol: String, idCol: String,
                          benchGrams: Seq[String], n: Int): DataFrame =
    docs
      // project tokens BEFORE the gram lambda (see shinglesFromTokens: an
      // inline split would re-run the regex per array element)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), array_distinct(ngramsFromTokens(col("toks"), n)).as("grams"))
      // membership count via the native set-literal expression rather than
      // size(array_intersect(grams, typedLit(set))): ArrayIntersect
      // rebuilds the literal side's hash set per ROW, which at a ~15k-gram
      // benchmark dominates the gate; LitSetOverlap builds it once per
      // task. Value-identical because `grams` is distinct and null-free.
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        graft.functions.LitSetOverlap.overlapCount(col("grams"), benchGrams)
          .as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)

  // ------------------------------------------------- repetition quality
  /** Per-document repetition statistics (Gopher-style quality signals),
    * computed entirely row-locally: n-grams are sorted so equal grams are
    * adjacent, then one `aggregate` fold counts the longest run (= the top
    * gram's frequency) and the mass in runs of length ≥ 2 (= instances of
    * any repeated gram). Integer outputs only — the keep decision is pure
    * integer arithmetic, so it hashes identically cross-engine.
    *
    * keep = top 2-gram ≤ 20% of 2-gram instances AND repeated 5-gram mass
    * ≤ 30% of 5-gram instances (vacuously true for docs too short to have
    * grams).
    */
  def repetitionStats(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val withGrams = toked.select(col("doc_id"),
      ngramsFromTokens(col("toks"), 2).as("g2"),
      ngramsFromTokens(col("toks"), 5).as("g5"))
    def runStats(grams: Column): Column = {
      val folded = aggregate(
        array_sort(grams),
        struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
          lit(0L).as("top"), lit(0L).as("dup")),
        (st, x) => {
          val same = st.getField("prev") <=> x
          val run = when(same, st.getField("run") + 1L).otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(st.getField("top"), run).as("top"),
            (st.getField("dup") + when(!same && st.getField("run") >= 2L,
              st.getField("run")).otherwise(lit(0L))).as("dup"))
        },
        st => struct(st.getField("top").as("top"),
          (st.getField("dup") + when(st.getField("run") >= 2L,
            st.getField("run")).otherwise(lit(0L))).as("dup")))
      folded
    }
    withGrams
      .withColumn("__s2", runStats(col("g2")))
      .withColumn("__s5", runStats(col("g5")))
      .select(col("doc_id"),
        size(col("g2")).cast("long").as("total_2grams"),
        col("__s2.top").as("top2_count"),
        size(col("g5")).cast("long").as("total_5grams"),
        col("__s5.dup").as("dup5_count"))
      .withColumn("keep",
        col("top2_count") * 5 <= col("total_2grams") &&
          col("dup5_count") * 10 <= col("total_5grams") * 3)
  }

  // ----------------------------------------------------- LM fluency score
  /** Corpus-derived bigram language-model fluency score (the CCNet-style
    * quality signal, re-expressed hash-exactly): build a bigram LM from the
    * corpus itself — p(w₂|w₁) = c(w₁w₂)/c(w₁·) — then score each document
    * by the sum/mean of its bigrams' probabilities. Fluent text built from
    * common transitions scores high; gibberish scores low.
    *
    * Exactness: probabilities are FIXED-POINT — `(c₂ · 10¹²) div c₁` as a
    * BIGINT — so per-doc sums are order-independent integer adds and the
    * result hash-matches SQL exactly (a float p would make the sum depend
    * on partial-aggregation order, and a log-prob would pull in libm).
    * The 10¹² scale bounds bigram counts to ~9·10⁶ before `c₂·10¹²`
    * overflows a long — drop to 10⁶ (still 6 significant digits) for
    * corpora past that.
    *
    * Scale shape: LM construction is one map-side-combined groupBy on the
    * bigram plus a bounded re-agg on the first word; scoring is a
    * hash-partitioned equi-join of doc bigrams against the LM table (both
    * sides partitioned on the gram — the standard big⋈big shape) and one
    * final doc-keyed sum.
    *
    * Known limit of an UNSMOOTHED self-derived LM (`addOne = false`): a
    * first-word that appears once gives its only transition p = 1, so
    * all-hapax gibberish scores high. `addOne = true` applies Laplace
    * smoothing — p = (c₂+1)/(c₁+V) with V the unigram vocabulary size —
    * still pure integer arithmetic (V is a 1-row broadcast aggregate), and
    * hapax transitions now score ~10¹²/V instead of 10¹². Production
    * scoring uses a pretrained LM; swap the `lm` relation for an external
    * model table to get the CCNet setup.
    */
  def lmScore(docs: DataFrame, textCol: String, idCol: String,
              addOne: Boolean = false): DataFrame = {
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val docBi = toked
      .select(col("doc_id"), explode(ngramsFromTokens(col("toks"), 2)).as("g"))
    val biCounts = docBi.groupBy(col("g")).agg(count(lit(1)).as("c2"))
    val w1Counts = biCounts
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val joined = biCounts
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .join(w1Counts, Seq("w1"))
    val lm =
      if (!addOne) joined.select(col("g"), expr("(c2 * 1000000000000) div c1").as("p_fp"))
      else {
        val vocab = toked.select(explode(col("toks")).as("t")).distinct()
          .agg(count(lit(1)).as("v"))
        joined.crossJoin(broadcast(vocab))
          .select(col("g"),
            expr("((c2 + 1) * 1000000000000) div (c1 + v)").as("p_fp"))
      }
    val scored = docBi.join(lm, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("score_fp"))
    toked.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
      .withColumn("avg_fp",
        when(col("n_bigrams") > 0, expr("score_fp div n_bigrams")).otherwise(lit(0L)))
  }

  /** Interpolated Kneser-Ney bigram scoring — the production-grade
    * smoothing tier above [[lmScore]]'s raw and Laplace forms, made
    * hash-exact by expressing the standard discount D = 0.75 as the
    * RATIONAL 3/4:
    *
    *   p_KN(w₂|w₁) = (c₁₂ − 3/4)/c₁ + (3/4)·(N₁₊(w₁·)/c₁)·p_cont(w₂)
    *   p_cont(w₂)  = N₁₊(·w₂) / |bigram types|
    *
    * in fixed point:  p_fp = ((4c₁₂ − 3)·10¹²) div (4c₁)
    *                       + (3 · N₁₊(w₁·) · pcont_fp(w₂)) div (4c₁)
    *
    * — every term an integer multiply/divide, so per-doc sums are
    * order-independent and oracle-exact. No max(·,0) clamp is needed: a
    * corpus-derived LM only scores bigrams it contains (c₁₂ ≥ 1 →
    * 4c₁₂ − 3 ≥ 1). The continuation counts N₁₊ are one extra aggregate
    * each over the (already bounded) bigram-type table; |types| is a
    * 1-row broadcast. Same big⋈big scoring join as [[lmScore]].
    * Magnitude bound: 4c₁₂·10¹² caps bigram counts at ~2·10⁶ before
    * overflow — drop the scale to 10⁶ past that, as in [[lmScore]].
    */
  def lmScoreKN(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val docBi = toked
      .select(col("doc_id"), explode(ngramsFromTokens(col("toks"), 2)).as("g"))
    val biCounts = docBi.groupBy(col("g")).agg(count(lit(1)).as("c2"))
      .withColumn("w1", substring_index(col("g"), " ", 1))
      .withColumn("w2", substring_index(col("g"), " ", -1))
      .localCheckpoint(true) // bounded (bigram types), read by 4 aggregates
    val w1c = biCounts.groupBy(col("w1"))
      .agg(sum(col("c2")).as("c1"), count(lit(1)).as("succ"))
    val predC = biCounts.groupBy(col("w2")).agg(count(lit(1)).as("pred"))
    val types = biCounts.agg(count(lit(1)).as("t_types"))
    val lm = biCounts
      .join(w1c, Seq("w1"))
      .join(predC, Seq("w2"))
      .crossJoin(broadcast(types))
      .select(col("g"),
        (expr("((4 * c2 - 3) * 1000000000000) div (4 * c1)") +
          expr("(3 * succ * ((pred * 1000000000000) div t_types)) div (4 * c1)"))
          .as("p_fp"))
    val scored = docBi.join(lm, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_fp")).as("score_fp"))
    toked.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
      .withColumn("avg_fp",
        when(col("n_bigrams") > 0, expr("score_fp div n_bigrams")).otherwise(lit(0L)))
  }

  // ----------------------------------------------------- span dedup
  /** Cross-document exact span deduplication with reassembly (the C4
    * line-dedup shape, over fixed-width word spans since this corpus has no
    * newlines): split each doc into non-overlapping `spanWords`-word spans,
    * keep each distinct span's FIRST occurrence (lexicographic min of
    * (doc_id, span_idx)), drop every other copy, and reassemble documents
    * from their surviving spans in order.
    *
    * Distributed shape: winner election is one map-side-combined min-agg on
    * the span hash; membership is an equi-join back on the same hash (AQE
    * reuses the exchange); reassembly is one agg on doc_id. Never all-pairs,
    * no windows over unbounded partitions.
    *
    * Returns (doc_id, n_spans_total, n_spans_kept, kept_text) for every doc
    * with ≥1 token — kept_text is '' when every span was a duplicate.
    */
  def dedupSpans(docs: DataFrame, textCol: String, idCol: String,
                 spanWords: Int = 10): DataFrame = {
    require(spanWords > 0)
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
    val spans = toked
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), size(col("toks")), lit(spanWords)),
          st => concat_ws(" ", slice(col("toks"), st, lit(spanWords))))).as(Seq("idx", "span")))
      // election key is the 128-bit md5, not the span text: compact shuffle
      // payload, and wide enough that collisions are not a practical concern
      // at any corpus size (a 64-bit hash has ~3% birthday risk at 10^12
      // spans; 128 bits has ~0 at 10^18)
      .withColumn("h", md5(col("span")))
    val winners = spans.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("idx"))).as("w"))
    val kept = spans.join(winners, Seq("h"))
      .where(col("doc_id") === col("w.doc_id") && col("idx") === col("w.idx"))
    val reassembled = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans_kept"),
        concat_ws(" ", transform(array_sort(collect_list(struct(col("idx"), col("span")))),
          s => s.getField("span"))).as("kept_text"))
    toked.select(col("doc_id"),
        expr(s"cast((size(toks) - 1) div $spanWords + 1 as bigint)").as("n_spans_total"))
      .join(reassembled, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_spans_total"),
        coalesce(col("n_spans_kept"), lit(0L)).as("n_spans_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Stateless literal-weights form of [[linearScore]] — the streaming
    * gate (same relationship as [[contaminationFilter]] to
    * [[contamination]]): the weight table is a bounded LITERAL map (models
    * are KB-MB of slots by construction), the per-token lookup and the
    * score sum are row-local, so this works identically on a batch frame
    * and a `readStream` frame — no join, no state, no watermark. Integer
    * adds commute, so the row-local fold equals the batch groupBy sum
    * bit-for-bit. A weights map covering every slot reproduces
    * [[linearScore]] exactly (spec-asserted). */
  def linearScoreLiteral(docs: DataFrame, textCol: String, idCol: String,
                         weights: Map[Long, Long], buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val wmap = map(weights.toSeq.sortBy(_._1)
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .withColumn("__ws", transform(col("toks"), t =>
        coalesce(element_at(wmap, Sampling.hashBucket(t, buckets)), lit(0L))))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("__ws"), lit(0L), (a, x) => a + x).as("score_fp"))
      .withColumn("keep", col("score_fp") > 0L)
  }

  // --------------------------------------- per-source score calibration
  /** Per-source percentile calibration of a quality score — the CCNet
    * move: scores from different domains aren't comparable (each domain
    * has its own scale), so rank WITHIN the source and emit the percentile
    * plus a low/mid/high tercile bucket; a global threshold then applies
    * uniformly across domains.
    *
    *   pct_fp = (rank − 1) · 10⁶ div (n_s − 1)   (0 for singleton sources)
    *
    * with rank the row's position within its source ordered by
    * (score, id) — the id tiebreak makes ties deterministic, so the
    * result hashes identically cross-engine. The rank comes from
    * [[graft.operators.RunningTotal.grouped]]'s composite-order form, NOT
    * a per-source window — a billion-row source never lands on one task;
    * per-source counts are a bounded broadcast (domains are bounded by
    * definition). Returns (doc_id, source, score, pct_fp, tercile),
    * unordered.
    */
  def calibrateBySource(df: DataFrame, scoreCol: String, idCol: String,
                        sourceCol: String,
                        sourceCountHint: Option[Long] = None): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        col(scoreCol).as("score"))
      .withColumn("__one", lit(1L))
    val ranked = RunningTotal.grouped(base, "source",
      Seq("score", "doc_id"), "__one", "__rank",
      groupCountHint = sourceCountHint)
    val counts = ranked.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    ranked.join(broadcast(counts), Seq("source"))
      .select(col("doc_id"), col("source"), col("score"),
        when(col("n_s") > 1, expr("((__rank - 1) * 1000000) div (n_s - 1)"))
          .otherwise(lit(0L)).as("pct_fp"))
      .withColumn("tercile",
        when(col("pct_fp") * 3 < 1000000L, "low")
          .when(col("pct_fp") * 3 < 2000000L, "mid")
          .otherwise("high"))
  }

  // --------------------------------------- linear quality classifier
  /** Hashed bag-of-words linear classifier INFERENCE — the plumbing of a
    * fasttext/logistic quality scorer (the GPT-3/LLaMA "looks like
    * reference text" filter): each token hashes into one of `buckets`
    * feature slots, the document score is the sum of the matching integer
    * weights, keep = score > 0. The weight table is an input — production
    * loads trained weights; tests and the registered query inject a
    * deterministic stub (same honest-stub license as
    * [[Multimodal.StubDecoder]]: the MODEL is fake, the inference plumbing
    * is real and oracle-checked).
    *
    * Scale shape: one explode + hash per token (row-local), the weight
    * table broadcast (bounded by `buckets` by contract), one
    * map-side-combined per-doc sum. Integer weights keep the score an
    * order-independent BIGINT sum — hash-exact cross-engine.
    *
    * @param weights (bucket, w_fp) rows, one per occupied feature slot
    */
  def linearScore(docs: DataFrame, textCol: String, idCol: String,
                  weights: DataFrame, buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1 (got $buckets)")
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
    val tb = toked.select(col("doc_id"), explode(col("toks")).as("t"))
      .select(col("doc_id"), Sampling.hashBucket(col("t"), buckets).as("bucket"))
    // LEFT join so n_tokens counts ALL tokens, not just those whose bucket
    // has a weight row — keeps this form and [[linearScoreLiteral]] agreeing
    // on n_tokens under partial-coverage weight tables (unmatched buckets
    // contribute weight 0, exactly as an absent feature slot should)
    val sc = tb.join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("w_fp"), lit(0L))).as("score_fp"))
    toked.select(col("doc_id"))
      .join(sc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_fp"), lit(0L)).as("score_fp"))
      .withColumn("keep", col("score_fp") > 0L)
  }

  // ------------------------------------------- duplicated-substring audit
  /** Exact duplicated-substring audit at CHARACTER level — the relational
    * re-expression of suffix-array exact-substring dedup (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): find
    * every char `k`-gram that occurs ≥ 2 times anywhere in the corpus
    * (including same-document repeats, as in the paper), then merge each
    * document's duplicated positions into maximal intervals and report
    * per-doc duplication coverage — the numbers that decide what an exact
    * substring-cut pass would remove.
    *
    * Shape: gram emission is row-local (one `transform` over the position
    * sequence — O(n·k) bytes per doc, the inherent cost of char shingling);
    * duplicate election is ONE map-side-combined count on the md5 of the
    * gram (128-bit election key, same no-collision license as
    * [[dedupSpans]]); membership joins back on the same hash so AQE reuses
    * the exchange; interval merging is a row-local fold over each doc's
    * sorted duplicated positions (bounded by document length — never a
    * window over an unbounded partition). A corpus-sized shuffle of char
    * grams is the honest cost of EXACT substring dedup — the probabilistic
    * escapes (MinHash q23, SimHash q25) are the cheap tier of the same
    * family.
    *
    * Returns (doc_id, n_chars, n_dup_grams, n_islands, dup_chars,
    * coverage_fp) — coverage_fp = dup_chars·10⁶ div n_chars; unordered.
    */
  def dupSubstrings(docs: DataFrame, textCol: String, idCol: String,
                    k: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val base = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), col(textCol).as("text"),
        length(col(textCol)).cast("long").as("n_chars"))
    val grams = base.where(col("n_chars") >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1L), col("n_chars") - (k - 1)),
          i => struct(i.as("i"),
            md5(col("text").substr(i, lit(k))).as("h")))).as("g"))
      .select(col("doc_id"), col("g.i").as("i"), col("g.h").as("h"))
    val dup = grams.groupBy(col("h")).agg(count(lit(1)).as("c"))
      .where(col("c") >= 2L).select(col("h"))
    val perDoc = grams.join(dup, Seq("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_grams"),
        sort_array(collect_list(col("i"))).as("ps"))
      .select(col("doc_id"), col("n_dup_grams"),
        aggregate(col("ps"),
          struct(lit(-1L).as("end"), lit(0L).as("isl"), lit(0L).as("cov")),
          (st, p) => {
            val fresh = p >= st.getField("end")
            struct((p + k).as("end"),
              (st.getField("isl") + when(fresh, 1L).otherwise(0L)).as("isl"),
              (st.getField("cov") + when(fresh, lit(k.toLong))
                .otherwise(p + k - st.getField("end"))).as("cov"))
          }).as("m"))
    base.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"),
        coalesce(col("m.isl"), lit(0L)).as("n_islands"),
        coalesce(col("m.cov"), lit(0L)).as("dup_chars"))
      .withColumn("coverage_fp",
        when(col("n_chars") > 0, expr("(dup_chars * 1000000) div n_chars"))
          .otherwise(lit(0L)))
  }

  // ----------------------------------------------------- sequence packing
  /** Deterministic GPT-style sequence packing audit: documents are laid out
    * in (source, doc_id) order, concatenated, and chopped into fixed
    * `budget`-token training sequences; a document's sequence is the one its
    * first token lands in. Emits per (source, seq_id): how many documents
    * start there, their total token mass, and how many straddle a sequence
    * boundary (lose context at training time) — the planning numbers a
    * packing run needs before writing any shards.
    *
    * The prefix sum uses [[RunningTotal.grouped]] — range-partitioned
    * two-phase cumsum, NOT a per-source window, so a billion-document source
    * never lands on one task.
    */
  def packStats(docs: DataFrame, textCol: String, idCol: String,
                sourceCol: String, budget: Int,
                sourceCountHint: Option[Long] = None): DataFrame = {
    require(budget > 0)
    val toked = graft.io.Tables.widen(docs)
      .select(col(sourceCol).as("source"), col(idCol).as("doc_id"),
        TextAnalysis.wsTokenCount(col(textCol)).as("n_tokens"))
      .where(col("n_tokens") > 0)
    val cum = RunningTotal.grouped(toked, "source", "doc_id", "n_tokens",
      "cum_tokens", sourceCountHint)
    cum
      // integer `div`, not double division: exact at any cumulative size
      // (a source's token total can pass 2^52 at 100 TB, where doubles
      // start dropping integers)
      .select(col("source"), col("n_tokens"),
        expr(s"(cum_tokens - n_tokens) div $budget").as("seq_id"),
        expr(s"(cum_tokens - 1) div $budget").as("end_seq"))
      .groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_started_tokens"),
        sum(when(col("end_seq") > col("seq_id"), 1L).otherwise(0L)).as("n_crossing"))
  }

  // ------------------------------------------- Gopher structural rules
  /** Stopwords for the Gopher "natural language" check — a deliberately
    * tiny fixed list (the rule needs ≥ 2 hits, not linguistic coverage). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "a", "in", "that", "have", "with")

  /** Gopher-style STRUCTURAL document-quality rules (Rae et al. 2021,
    * "Scaling Language Models" §A1.1) — the doc-shape half of the Gopher
    * filter, complementing [[repetitionStats]]' repetition half:
    *
    *  - word count in [minWords, maxWords];
    *  - mean word length in [3, 10] chars;
    *  - ≥ 80% of words contain at least one letter;
    *  - ≥ 2 stopword hits ([[GopherStopwords]]);
    *  - ≤ 90% of lines start with a bullet (`-`, `*`, `•`);
    *  - ≤ 30% of lines end with an ellipsis (`...`, `…`).
    *
    * Every stat is an integer and every threshold a cross-multiplied
    * integer comparison — no float ratio anywhere — so keep decisions
    * hash-match SQL exactly. Entirely row-local (tokenize + two
    * array-filter counts + a line scan per document): zero shuffles, the
    * same cheapest-tier license as [[repetitionStats]]. At 100 TB this is
    * a map over the corpus scan, typically fused into whatever pass reads
    * the text anyway.
    *
    * Returns (doc_id, n_words, sum_word_chars, n_alpha_words,
    * n_stop_hits, n_lines, n_bullet_lines, n_ellipsis_lines, keep);
    * unordered.
    */
  def gopherRules(docs: DataFrame, textCol: String, idCol: String,
                  minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val toked = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks"),
        split(col(textCol), "\n", -1).as("lines"))
    toked.select(col("doc_id"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(col("toks"), lit(0L), (acc, x) => acc + length(x))
          .as("sum_word_chars"),
        size(filter(col("toks"), x => x.rlike("[a-z]"))).cast("long")
          .as("n_alpha_words"),
        size(filter(col("toks"), x => x.isin(GopherStopwords: _*))).cast("long")
          .as("n_stop_hits"),
        size(col("lines")).cast("long").as("n_lines"),
        size(filter(col("lines"), l => {
          val t = ltrim(l)
          t.startsWith("-") || t.startsWith("*") || t.startsWith("•")
        })).cast("long").as("n_bullet_lines"),
        size(filter(col("lines"), l => {
          val t = rtrim(l)
          t.endsWith("...") || t.endsWith("…")
        })).cast("long").as("n_ellipsis_lines"))
      .withColumn("keep",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          // 3 ≤ mean word length ≤ 10, cross-multiplied
          col("sum_word_chars") >= col("n_words") * 3L &&
          col("sum_word_chars") <= col("n_words") * 10L &&
          // ≥ 80% alpha words
          col("n_alpha_words") * 5L >= col("n_words") * 4L &&
          col("n_stop_hits") >= 2L &&
          // ≤ 90% bullet lines, ≤ 30% ellipsis lines
          col("n_bullet_lines") * 10L <= col("n_lines") * 9L &&
          col("n_ellipsis_lines") * 10L <= col("n_lines") * 3L)
  }

  // --------------------------------------------- C4 line-level cleaning
  /** C4-style LINE-level cleaning (Raffel et al. 2020, §2.2): a line
    * survives iff it ends in terminal punctuation (`.` `!` `?` `"`), has
    * at least `minLineWords` words, and (lowercased) contains none of
    * `{`, `javascript`, `lorem ipsum`; the document is reassembled from
    * surviving lines in original order and kept iff any line survives.
    *
    * Entirely row-local — one split + one array filter + one join per
    * document, zero shuffles (same license as [[gopherRules]]). The
    * cleaned text itself is returned so callers (and the oracle hash)
    * certify the reassembly, not just the counts.
    *
    * Returns (doc_id, n_lines, n_kept, kept_chars, clean_text, keep);
    * unordered. `clean_text` is the empty string when nothing survives.
    */
  def c4Clean(docs: DataFrame, textCol: String, idCol: String,
              minLineWords: Int = 3): DataFrame = {
    require(minLineWords >= 1, s"minLineWords must be >= 1 (got $minLineWords)")
    val lined = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), split(col(textCol), "\n", -1).as("lines"))
    val kept = lined.select(col("doc_id"), col("lines"),
      filter(col("lines"), l => {
        val t = rtrim(l)
        val lo = lower(l)
        (t.endsWith(".") || t.endsWith("!") || t.endsWith("?") || t.endsWith("\"")) &&
          size(filter(split(lo, "\\W+"), w => w =!= "")) >= minLineWords &&
          !lo.contains("{") && !lo.contains("javascript") && !lo.contains("lorem ipsum")
      }).as("kept_lines"))
    kept.select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept_lines")).cast("long").as("n_kept"),
        concat_ws("\n", col("kept_lines")).as("clean_text"))
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        length(col("clean_text")).cast("long").as("kept_chars"),
        col("clean_text"))
      .withColumn("keep", col("n_kept") >= 1L)
  }

  // --------------------------------------------------- dataset card rollup
  /** Per-source dataset "nutrition label" — the release-gate summary a
    * training-mix owner reads before shipping a snapshot: volume (docs,
    * chars, mean doc length), exact-duplicate load (docs whose content hash
    * appears more than once ANYWHERE in the corpus — cross-source copies
    * count against both sources), and language composition (distinct
    * languages + the plurality language, ties to the alphabetically first).
    *
    * Scale shape: one corpus scan feeds (a) a map-side-combined content-hash
    * aggregate (shuffle carries pre-combined (hash, count) cells) joined
    * back on the hash — the q19 exact-dedup shape — and (b) a bounded
    * (source, lang) aggregate; the final rollup is over source-bounded
    * rows. No window, no all-pairs, nothing driver-side. */
  def datasetCard(docs: DataFrame, textCol: String, idCol: String,
                  sourceCol: String, langCol: String): DataFrame = {
    val base = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
        col(langCol).as("lang"), md5(col(textCol)).as("__h"),
        length(col(textCol)).cast("long").as("__chars"))
    val copies = base.groupBy(col("__h")).agg(count(lit(1)).as("__copies"))
    val flagged = base.join(copies, Seq("__h"))
      .withColumn("__dup", (col("__copies") > 1L).cast("long"))
    val volume = flagged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__chars")).as("total_chars"),
        sum(col("__dup")).as("n_dup_docs"))
    // plurality language: min(struct(-n, lang)) = highest count, ties to
    // the alphabetically first language — no per-source window
    val langs = base.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_langs"),
        min(struct((-col("__n")).as("__neg"), col("lang"))).as("__top"))
      .select(col("source"), col("n_langs"), col("__top.lang").as("top_lang"))
    volume.join(langs, Seq("source"))
      .select(col("source"), col("n_docs"), col("total_chars"),
        expr("total_chars div n_docs").as("mean_chars"),
        col("n_dup_docs"),
        expr("(n_dup_docs * 1000000L) div n_docs").as("dup_rate_fp"),
        col("n_langs"), col("top_lang"))
  }

  // ------------------------------------------------- robust length outliers
  /** Median/MAD robust outlier flags per group: a row is an outlier when
    * |x − median| > cut · MAD (MAD = median absolute deviation), computed
    * per `groupCol`. Robust statistics don't move when the outliers
    * themselves get worse — unlike mean/stddev, a crawl where 1% of docs
    * are 100× too long still gets the RIGHT center — which is why length
    * screens use median/MAD, not z-scores.
    *
    * `exact = true` uses the exact interpolating percentile (two grouped
    * sort-buffer passes — certifiable, and fine while per-group row counts
    * fit a task). At 100 TB per-group buffers don't fit: `exact = false`
    * switches both passes to `approx_percentile` at `accuracy`, keeping
    * the identical plan shape (the q144 qcut precedent). Both group-stat
    * frames are bounded by |groups| and broadcast back. Output: input
    * columns + (med, mad, is_outlier), unordered. */
  def robustOutliers(df: DataFrame, valCol: String, groupCol: String,
                     cut: Double = 3.0, exact: Boolean = true,
                     accuracy: Int = 10000): DataFrame = {
    def pct(c: org.apache.spark.sql.Column) =
      if (exact) percentile(c, lit(0.5))
      else approx_percentile(c, lit(0.5), lit(accuracy))
    val wide = graft.io.Tables.widen(df)
    val med = wide.groupBy(col(groupCol).as("__g"))
      .agg(pct(col(valCol).cast("double")).as("med"))
    val withMed = wide.join(broadcast(med),
      col(groupCol) === col("__g")).drop("__g")
    val mad = withMed
      .groupBy(col(groupCol).as("__g"))
      .agg(pct(abs(col(valCol).cast("double") - col("med"))).as("mad"))
    withMed.join(broadcast(mad), col(groupCol) === col("__g")).drop("__g")
      .withColumn("is_outlier",
        abs(col(valCol).cast("double") - col("med")) > lit(cut) * col("mad"))
  }
}
