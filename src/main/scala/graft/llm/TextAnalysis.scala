package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, token counting, quality scoring, language ID,
  * fingerprinting. Everything here is a pure Column expression (whole-stage
  * codegen, SQL-expressible for the DuckDB oracle) — no UDFs, no collects;
  * all of it scales as embarrassingly-parallel per-row work.
  *
  * Cross-engine parity notes (oracle = DuckDB): tokenization is
  * `lower → split \W+ → drop empties` on both sides; hex digests are
  * lowercase md5 on both sides; `element_at`/DuckDB list indexing are both
  * 1-based.
  */
object TextAnalysis {

  /** Lowercased `\W+` word tokens, empties dropped. */
  def tokens(c: Column): Column =
    filter(split(lower(c), "\\W+"), t => t =!= "")

  /** Word 3-shingles over an ALREADY-MATERIALIZED token-array column.
    * Take tokens from a projected column, not an inline [[tokens]] call:
    * expressions captured inside a higher-order-function lambda re-evaluate
    * per element, so an inline regex split would run O(tokens²) regexes per
    * document. An attribute reference is free. */
  def shinglesFromTokens(toks: Column): Column =
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Word 3-shingles over [[tokens]] — the unit for MinHash/Jaccard near-dup.
    * Docs with fewer than 3 tokens produce no shingles. Convenience form for
    * single-expression use; hot paths should project [[tokens]] first and
    * call [[shinglesFromTokens]] (see scaladoc there). */
  def shingles3(c: Column): Column = shinglesFromTokens(tokens(c))

  /** Whitespace token count. */
  def wsTokenCount(c: Column): Column =
    size(filter(split(c, "\\s+"), t => t =!= "")).cast("long")

  /** BPE-ish token count: alpha runs, digit runs, and single non-alnum
    * marks — a cheap, deterministic proxy for subword tokenizer load. */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Punctuation ratio: non-alnum-non-space chars / total chars (0 for empty). */
  def punctRatio(c: Column): Column = {
    val total = length(c)
    when(total > 0, (total - length(regexp_replace(c, "[^A-Za-z0-9\\s]", ""))).cast("double") / total)
      .otherwise(lit(0.0))
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Word-boundary alternation regexes keep this expressible in
    * both engines. */
  val langProfiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|in|is|was|for|with|that)\\b",
    "es" -> "\\b(el|la|de|que|y|en|los|del|las|por)\\b",
    "de" -> "\\b(der|die|und|das|ist|von|mit|den|im|für)\\b",
    "fr" -> "\\b(le|la|les|des|et|est|un|une|du|dans)\\b",
    "zh" -> "\\b(de|shi|le|zai|wo|you|he|ta|zhe|men)\\b")

  /** Stopword-hit count for one language profile. */
  def langScore(c: Column, pattern: String): Column =
    size(regexp_extract_all(lower(c), lit(pattern), lit(0))).cast("long")

  /** Language-ID heuristic: argmax stopword-profile score, ties resolved by
    * profile order, all-zero → "und" (undetermined).
    *
    * Single-expression form: every CASE arm embeds the 5-regex `greatest`,
    * so the regex scans multiply. Fine for one-off use; hot paths should use
    * [[withLangId]], which stages the scores as projected columns first. */
  def langId(c: Column): Column = {
    val scores = langProfiles.map { case (lang, pat) => lang -> langScore(c, pat) }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
  }

  /** Staged language ID: lowercase once, project the 5 profile scores once,
    * then argmax over cheap attribute references — one lower() and one
    * regex pass per profile per row, nothing re-evaluated. */
  def withLangId(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val lowered = df.select(df.columns.toIndexedSeq.map(col) :+ lower(col(textCol)).as("__lower"): _*)
    val scoreCols = langProfiles.map { case (lang, pat) =>
      size(regexp_extract_all(col("__lower"), lit(pat), lit(0))).cast("long").as(s"__s_$lang")
    }
    val scored = lowered.select(df.columns.toIndexedSeq.map(col) ++ scoreCols: _*)
    val refs = langProfiles.map { case (lang, _) => lang -> col(s"__s_$lang") }
    val best = refs.map(_._2).reduce((a, b) => greatest(a, b))
    val detected = refs.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    scored.withColumn(outCol, detected)
      .drop(langProfiles.map(p => s"__s_${p._1}"): _*)
  }

  /** Stopword ratio against the combined profile vocabulary. */
  def stopwordRatio(c: Column): Column = {
    val hits = langProfiles.map { case (_, pat) => langScore(c, pat) }.reduce(_ + _)
    val total = wsTokenCount(c)
    when(total > 0, hits.cast("double") / total).otherwise(lit(0.0))
  }

  /** Composite quality score in [0,1]: length saturation + low punctuation
    * + stopword presence — the usual cheap pre-filter before expensive
    * dedup/training steps. Raw double (no rounding): the formula has one
    * fixed evaluation order, so it is bit-identical across engines. */
  def qualityScore(c: Column): Column = {
    val lenScore = least(length(c).cast("double") / 400.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio(c) * 4.0, lit(1.0))
    val stopScore = least(stopwordRatio(c) * 5.0, lit(1.0))
    lenScore * 0.4 + punctScore * 0.3 + stopScore * 0.3
  }

  /** PII-style redaction: emails, URLs, then digit runs → typed
    * placeholders, in that order (a URL's digits must not be <NUM>-ed
    * before the URL match). Pure regexp_replace chain — codegen'd,
    * SQL-expressible. */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c,
          "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
        "https?://[^\\s]+", "<URL>"),
      "[0-9]+", "<NUM>")

  /** Training-data chunking: split each document into token chunks of
    * `chunkSize` with `overlap` tokens of context between neighbors
    * (stride = chunkSize - overlap). Output one row per chunk:
    * (doc_id, chunk_id 1-based, n_chunk_tokens, chunk_fp = md5 of the
    * chunk's space-joined tokens). Embarrassingly parallel — tokens are
    * projected once, chunk starts are a `sequence`, `posexplode` fans out.
    * Documents with no tokens produce no chunks; the final chunk is the one
    * whose start ≤ n_tokens - overlap, so every token is covered. */
  def chunk(df: DataFrame, textCol: String, idCol: String,
            chunkSize: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toked = graft.io.Tables.widen(df)
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .where(size(col("toks")) > 0)
    val starts = sequence(lit(1), greatest(size(col("toks")) - overlap, lit(1)), lit(stride))
    toked
      .select(col("doc_id"), col("toks"), posexplode(starts).as(Seq("pos", "start")))
      .select(col("doc_id"),
        (col("pos") + 1).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("start"), lit(chunkSize))).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", slice(col("toks"), col("start"), lit(chunkSize)))).as("chunk_fp"))
  }

  /** Document fingerprint: md5 over whitespace-normalized lowercase text,
    * plus a 64-bit hex prefix for compact join keys. */
  def normalizedText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def fingerprint(c: Column): Column = md5(normalizedText(c))

  def fingerprint64(c: Column): Column = substring(fingerprint(c), 1, 16)

  /** Karp–Rabin rolling hash (base 257 mod 2^61-1) over the normalized
    * text — the streaming-friendly fingerprint variant. Not expressible as
    * a Catalyst built-in chain, so it is a Scala UDF verified by unit tests
    * (omitted from the SQL oracle per the driver contract).
    */
  def rollingHashImpl(s: String): Long = {
    if (s == null) return 0L
    val Mod = (1L << 61) - 1
    val Base = 257L
    var h = 0L
    var i = 0
    while (i < s.length) {
      // (h * Base + c) mod 2^61-1 without overflow: split h into hi/lo
      val hi = h >>> 32
      val lo = h & 0xffffffffL
      // h*257 = hi*257*2^32 + lo*257; reduce mod (2^61-1) via 2^61 ≡ 1
      var acc = lo * Base + s.charAt(i).toLong
      var hiPart = hi * Base // multiplied by 2^32 below
      // hiPart * 2^32 mod (2^61-1): shift then fold
      var shifted = (hiPart << 32) & Mod
      var overflow = hiPart >>> 29 // bits above 2^61
      acc = acc + shifted + overflow
      h = (acc & Mod) + (acc >>> 61)
      if (h >= Mod) h -= Mod
      i += 1
    }
    h
  }

  val rollingHash = udf(rollingHashImpl _)

  /** TF-IDF top-k terms per document. The IDF factor is FIXED-POINT
    * integer arithmetic — `(N·10⁶) div df`, monotone in N/df like
    * log(N/df) — because libm transcendentals are not correctly-rounded
    * and cannot be hash-checked across engines. Scale shape: one token
    * shuffle for TF (map-side combined), one term-keyed agg for DF
    * (vocabulary-bounded), broadcast 1-row corpus count, one top-k window
    * per doc. */
  def tfIdfTopK(docs: DataFrame, k: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tokens = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\W+")).as("term"))
      .where(col("term") =!= "")
    val tf = tokens.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("tfidf_fp", expr("tf * ((__n * 1000000L) div df)"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf_fp").desc, col("term"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf_fp"))
  }

  /** BM25 ranked retrieval: top-k documents for a bag of query terms
    * (Robertson/Spärck Jones; k1 = 1.2, b = 0.75). Cross-engine-exact
    * variant of the scoring function:
    *
    *  - the IDF factor is the same fixed-point integer family as
    *    [[tfIdfTopK]] — `(N·10⁶) div df` — because `ln` is not
    *    correctly-rounded across libms;
    *  - the tf saturation term is kept RATIONAL: with k1 = 6/5, b = 3/4,
    *    `tf·(k1+1) / (tf + k1(1−b+b·dl/avgdl))` scaled by `10·T`
    *    (T = corpus token count, avgdl = T/N) becomes
    *    `22·T·tf / (10·T·tf + 3·T + 9·dl·N)` — integer numerator and
    *    denominator, one IEEE double multiply+divide at the end (identical
    *    bits on any engine);
    *  - the per-term scores are summed in the FIXED order of `queryTerms`
    *    (a max-pivot per term, then one left-to-right addition chain), not
    *    a float SUM whose order the engine picks.
    *
    * Scale shape: the token explode is filtered to the query terms BEFORE
    * the tf groupBy (the only corpus-sized shuffle is the dl count), df and
    * corpus totals are one broadcast row each, and the final top-k is a
    * single ordered limit. Integer ranges: needs `idf_fp·22·T·tf` < 2^63
    * and `T·tf` < 2^53 — holds to ~10^9-token corpora × tf ≤ 10^3; beyond
    * that drop to plain double scoring (ranking-stable, no longer
    * hash-checkable). */
  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int,
               idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty && queryTerms == queryTerms.distinct,
      "queryTerms must be non-empty and distinct")
    val tokens = docs.select(col(idCol),
        explode(split(lower(col(textCol)), "\\W+")).as("term"))
      .where(col("term") =!= "")
    val dl = tokens.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val tf = tokens.where(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = docs.agg(count(lit(1)).as("__n"))
      .crossJoin(broadcast(dl.agg(sum(col("dl")).as("__t"))))
    val perTerm = tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("idf_fp", expr("(__n * 1000000L) div df"))
      .withColumn("score",
        (col("idf_fp") * (lit(22L) * col("__t") * col("tf"))).cast("double") /
        (lit(10L) * col("__t") * col("tf") + lit(3L) * col("__t") +
          lit(9L) * col("dl") * col("__n")).cast("double"))
    // fixed-order per-doc sum: one pivot column per query term, added
    // left-to-right so the float result is engine-independent
    val aggCols = queryTerms.map(t =>
      max(when(col("term") === t, col("score"))).as(s"__s_$t"))
    val pivoted = perTerm.groupBy(col(idCol)).agg(aggCols.head, aggCols.tail: _*)
    val total = queryTerms.map(t => coalesce(col(s"__s_$t"), lit(0.0)))
      .reduceLeft(_ + _)
    pivoted.withColumn("bm25", total)
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("bm25"))
  }

  /** Vocabulary coverage / OOV rate: build the top-`vocabSize` corpus
    * vocabulary (by count desc, term asc — the deterministic tie-break a
    * hash-checked boundary needs) and score every document's
    * out-of-vocabulary TOKEN rate against it. The standard tokenizer-fit
    * pre-flight: a doc whose tokens mostly fall outside the head
    * vocabulary is boilerplate, another language, or noise.
    *
    * Scale shape: the vocab build is one map-side-combined groupBy bounded
    * by vocabulary (not corpus) size; the top-V cut is an orderBy+limit on
    * that bounded table (a TakeOrderedAndProject, never a global window);
    * the per-doc score re-explodes tokens once and joins them against the
    * BROADCAST vocab — the corpus never shuffles, and the only corpus-
    * sized agg is the per-doc rollup (map-side combined on doc_id).
    *
    * Returns (doc_id, n_tokens, n_oov, oov_fp = n_oov·10⁶ div n_tokens);
    * token-less docs surface with zeros (LEFT join back to the input);
    * unordered. */
  def vocabCoverage(docs: DataFrame, textCol: String, idCol: String,
                    vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be >= 1 (got $vocabSize)")
    val toks = graft.io.Tables.widen(docs)
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
    val vocab = toks.groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__cnt").desc, col("term")).limit(vocabSize)
      .select(col("term"), lit(1).as("__in_v"))
    val perDoc = toks.join(broadcast(vocab), Seq("term"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
    graft.io.Tables.widen(docs).select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_fp",
        when(col("n_tokens") > 0,
          expr("(n_oov * 1000000L) div n_tokens")).otherwise(0L))
  }

  /** Driver-side top-V vocabulary for [[oovGateLiteral]]: the bounded
    * collect a literal gate needs, with the budget made explicit —
    * vocabularies are gate configuration (like the contamination gram set
    * and the classifier weights), not data. */
  def vocabTopV(docs: DataFrame, textCol: String, vocabSize: Int,
                maxVocab: Int = 100000): Seq[String] = {
    require(vocabSize >= 1 && vocabSize <= maxVocab,
      s"vocabSize must be in [1, $maxVocab] (got $vocabSize)")
    // Bounded.collect does not preserve plan order — re-establish the
    // (freq desc, term asc) vocabulary order driver-side from the
    // collected counts.
    graft.io.Bounded.collect(graft.io.Tables.widen(docs)
        .select(explode(tokens(col(textCol))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col("term")).limit(vocabSize)
        .select(col("term"), col("__cnt")),
      maxRows = vocabSize, why = "a top-V vocabulary is gate configuration")
      .sortBy(r => (-r.getLong(1), r.getString(0)))
      .map(_.getString(0)).toSeq
  }

  /** Stream-safe OOV gate against a LITERAL vocabulary: row-local token
    * membership against the inlined vocab array — no aggregate, no state,
    * no shuffle, so it drops into a `readStream → writeStream` chain
    * unchanged (the q139 stateless-gate shape). Same output contract as
    * [[vocabCoverage]] plus the keep verdict; per-token membership is an
    * O(V) scan of the literal array, fine for gate-sized vocabularies
    * (use the broadcast-join form for dictionary-sized ones). */
  def oovGateLiteral(df: DataFrame, textCol: String, idCol: String,
                     vocab: Seq[String], keepBelowFp: Long): DataFrame = {
    require(vocab.nonEmpty, "oovGateLiteral: empty vocabulary")
    val vlit = typedLit(vocab)
    // no Tables.widen here: this gate must stay streaming-safe (widen
    // probes df.rdd, which streaming frames reject)
    df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"),
        size(col("__toks")).cast("long").as("n_tokens"),
        size(filter(col("__toks"), t => !array_contains(vlit, t)))
          .cast("long").as("n_oov"))
      .withColumn("oov_fp",
        when(col("n_tokens") > 0,
          expr("(n_oov * 1000000L) div n_tokens")).otherwise(0L))
      .withColumn("keep", col("oov_fp") < keepBelowFp)
  }

  /** Per-group lexical-diversity profile: token count, type (distinct-token)
    * count, hapax legomena (types occurring once in the group), and the
    * fixed-point type-token and hapax ratios — the vocabulary-growth audit
    * that flags template-generated or boilerplate-heavy sources (low TTR)
    * and OCR/noise-heavy ones (hapax spike) before they enter the mix.
    *
    * Scale shape: one explode pass → a map-side-combined (group, token)
    * aggregate whose output is vocabulary-bounded per group, then one
    * bounded rollup. The corpus shuffles only as pre-aggregated token
    * cells; no row ever carries more than one token. */
  def typeTokenStats(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val perToken = graft.io.Tables.widen(df)
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("grp"), col("tok"))
      .agg(count(lit(1)).as("__n"))
    perToken.groupBy(col("grp"))
      .agg(sum(col("__n")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__n") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .select(col("grp"), col("n_tokens"), col("n_types"), col("n_hapax"),
        when(col("n_tokens") > 0, expr("(n_types * 1000000L) div n_tokens"))
          .otherwise(0L).cast("long").as("ttr_fp"),
        when(col("n_types") > 0, expr("(n_hapax * 1000000L) div n_types"))
          .otherwise(0L).cast("long").as("hapax_fp"))
  }

  /** Pairwise vocabulary overlap between groups (sources): Jaccard of the
    * distinct-token sets for every group pair — the mix-design diagnostic
    * for "are these two crawls really different domains?".
    *
    * Scale shape: the corpus collapses to distinct (group, token) postings
    * (vocabulary-bounded) in one map-side-combined pass; the pair
    * intersection self-joins the POSTINGS on token — per-token fan-out is
    * ≤ C(|groups|, 2), so with S sources the whole pair table is ≤ S²
    * rows regardless of corpus size. No doc ever meets another doc.
    * Output: (grp_a, grp_b, n_inter, n_union, jaccard_fp), unordered. */
  def vocabOverlap(df: DataFrame, textCol: String, groupCol: String): DataFrame = {
    val postings = graft.io.Tables.widen(df)
      .select(col(groupCol).as("grp"), explode(tokens(col(textCol))).as("tok"))
      .distinct()
    val sizes = postings.groupBy(col("grp")).agg(count(lit(1)).as("n"))
    val inter = postings.as("a").join(postings.as("b"),
        col("a.tok") === col("b.tok") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("grp_a"), col("b.grp").as("grp_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("grp").as("grp_a"), col("n").as("__na"))), Seq("grp_a"))
      .join(broadcast(sizes.select(col("grp").as("grp_b"), col("n").as("__nb"))), Seq("grp_b"))
      .select(col("grp_a"), col("grp_b"), col("n_inter"),
        (col("__na") + col("__nb") - col("n_inter")).as("n_union"))
      .withColumn("jaccard_fp", expr("(n_inter * 1000000L) div n_union"))
  }

  /** Exact PHRASE search over token positions — the query layer the
    * positional index (q236's build) exists for: documents containing the
    * consecutive-token phrase `terms`, with occurrence count and first
    * position. Positions are assigned row-locally by `posexplode` (no
    * window, no zipWithIndex); each term's postings are then equi-joined
    * on (doc, pos − offset) — an n-way hash join of df-bounded posting
    * lists, never a scan of full documents. At 100 TB the postings come
    * straight off the stored positional index instead of a re-tokenize,
    * and per-term posting size (document frequency) bounds every join
    * input — the classic intersect-shortest-first retrieval shape, here
    * left to Catalyst since all joins are equi-joins on the same key.
    * Output: (doc_id, n_occ, first_pos), 0-based positions. */
  def phraseSearch(df: DataFrame, textCol: String, idCol: String,
                   terms: Seq[String]): DataFrame = {
    require(terms.size >= 2, s"phraseSearch needs >= 2 terms, got $terms")
    val toks = df.select(col(idCol).as("doc_id"),
      posexplode(tokens(col(textCol))).as(Seq("pos", "term")))
    val postings = terms.zipWithIndex.map { case (t, i) =>
      toks.where(col("term") === t)
        .select(col("doc_id"), (col("pos").cast("long") - i).as("base"))
    }
    val matches = postings.reduce((a, b) => a.join(b, Seq("doc_id", "base")))
    matches.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occ"), min(col("base")).as("first_pos"))
  }
}
