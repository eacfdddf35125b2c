package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One (band, bucket-key, doc) arrival — top-level so the encoder's
  * generated code can reach the constructor (same reason as
  * [[graft.streaming.SessionState]]). */
case class BandBucket(band: Int, bkey: String, doc_id: Long)

/** Deduplication operators for training-data pipelines, each designed for
  * the 100 TB shape of the problem:
  *
  *  - exact: one hash-groupBy shuffle, map-side combined;
  *  - MinHash+LSH: k min-hash aggregates computed in a SINGLE groupBy pass
  *    (one shuffle over (doc, shingle), partial aggregation on the map
  *    side), then banding → bucket self-join. Candidate generation never
  *    goes all-pairs: only docs sharing a band bucket meet in the join;
  *  - SimHash: per-bit majority votes as one groupBy with `bits` aggregates;
  *  - n-gram Jaccard: exact verification over candidate pairs only (shingle
  *    equi-join, never a cross join);
  *  - embedding near-dup: cosine over bucket-colocated pairs (see
  *    [[Similarity]] for the ANN path).
  *
  * Hashes are md5-hex-prefix based so the DuckDB oracle can reproduce them
  * bit-for-bit (lexicographic min over fixed-width lowercase hex ==
  * numeric min over the underlying value).
  */
object Dedup {

  /** "\uffff" — sorts after every lowercase-hex string. */
  private val MaxSentinel = "\uffff"


  /** Exact dedup: group documents by content hash, keep the smallest id.
    * Output: one row per distinct content (keeper_id, content_hash,
    * n_copies). */
  def dedupExact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every `k`-token gram, slide
    * a `w`-hash window, keep each window's MINIMUM hash; the distinct
    * kept hashes are the document's fingerprints. Guarantees: any shared
    * token run of length ≥ k + w − 1 between two documents shares at
    * least one fingerprint (the detection floor), while only ~2/(w+1) of
    * the grams are retained — the storage/recall dial plagiarism and
    * near-dup pipelines tune.
    *
    * Plan shape, all per-document keyed windows (never corpus-global):
    * one posexplode, one lead-window pass to build grams, one
    * ROWS-frame min window over the hash sequence, one distinct. The
    * hash is the md5-derived 32-bit value ([[graft.operators.Kmv.hash32]]),
    * so the whole stage replays exactly in SQL. Output: (idCol, h),
    * unordered, one row per distinct fingerprint; documents shorter than
    * k + w − 1 tokens emit nothing (no full window exists). */
  def winnowingFingerprints(df: DataFrame, textCol: String, idCol: String,
                            k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing needs k,w >= 1 (got $k,$w)")
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val tk = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "tok")))
    val gramCols = col("tok") +: (1 until k).map(j =>
      lead(col("tok"), j).over(byPos))
    // window expressions are projected first (one physical window pass),
    // then filtered: a WHERE can't hold a window function directly
    val kg = tk
      .select(col(idCol), col("pos"),
        concat_ws(" ", gramCols: _*).as("kg"),
        lead(col("tok"), k - 1).over(byPos).as("__last"))
      .where(col("__last").isNotNull)
      .select(col(idCol), col("pos"),
        graft.operators.Kmv.hash32(col("kg")).as("h"))
    val mins = kg
      .withColumn("m", min(col("h")).over(
        byPos.rowsBetween(Window.currentRow, w - 1)))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col(idCol))))
      .where(col("pos") <= col("n") - w) // only full w-hash windows
    mins.select(col(idCol), col("m").as("h")).distinct()
  }

  /** N-gram NOVELTY attribution (first-occurrence credit): every distinct
    * word `n`-gram in the corpus is owned by the smallest doc_id that
    * contains it; a document's novelty is the fraction of its distinct
    * n-grams it owns. Duplicated and boilerplate-heavy documents score low
    * — the within-corpus complement of the new-vs-existing incremental
    * dedup, and the doc-level aggregate of span dedup's winner election.
    *
    * Plan shape: one explode shuffle to distinct (doc, gram), one
    * gram-keyed min agg (bounded by the distinct-gram vocabulary), one
    * equi-join back on the gram, one doc-keyed count agg. No window, no
    * cross join; the gram join is hash-partitioned on a key whose
    * cardinality grows with corpus CONTENT, not corpus size squared — the
    * same license as [[AllPairs]]'s postings. Docs with fewer than `n`
    * tokens report (0, 0) and novelty_fp 0.
    *
    * Outputs are integer-exact: (doc_id, n_grams, n_novel,
    * novelty_fp = n_novel·10⁶ div n_grams); unordered. */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 5): DataFrame = {
    val grams = graft.io.Tables.widen(df)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode_outer(array_distinct(
          Curation.ngramsFromTokens(col("toks"), n))).as("gram"))
    val owners = grams.where(col("gram").isNotNull)
      .groupBy(col("gram")).agg(min(col("doc_id")).as("__owner"))
    grams
      .join(owners, Seq("gram"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("gram")).as("n_grams"),
        sum(when(col("__owner") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_grams"), col("n_novel"),
        when(col("n_grams") > 0L,
          expr("(n_novel * 1000000L) div n_grams")).otherwise(0L).as("novelty_fp"))
  }

  /** (doc, shingle) distinct pairs — the input relation for MinHash and
    * exact-Jaccard. One shuffle (the distinct). Tokens are projected into a
    * column before shingling so the regex split runs once per document, not
    * once per element inside the shingle lambda. */
  def docShingles(df: DataFrame, textCol: String, idCol: String): DataFrame =
    graft.io.Tables.widen(df)
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"),
        explode(TextAnalysis.shinglesFromTokens(col("toks"))).as("shingle"))
      .distinct()

  /** WEIGHTED near-dup elements: each (doc, token) with occurrence count
    * c is replicated `min(bitLength(c), cap)` times as elements
    * "tok~1".."tok~r" — LOG-BUCKETED term weights, so a document that
    * repeats a term 100x genuinely differs from one mentioning it once,
    * while the element relation grows logarithmically in counts (capped),
    * never linearly. Plain SET machinery downstream ([[minhashSignatures]]
    * → [[lshCandidatePairs]] → [[ngramJaccard]]) then computes exactly the
    * weighted Jaccard of the bucketed weight vectors:
    * Σ min(r_a, r_b) / Σ max(r_a, r_b) — the standard reduction of
    * weighted-minhash to set-minhash by element replication (integer
    * weights), with the log bucketing keeping replication bounded. */
  def weightedShingles(df: DataFrame, textCol: String, idCol: String,
                       cap: Int = 4): DataFrame = {
    require(cap >= 1, s"weightedShingles needs cap >= 1 (got $cap)")
    graft.io.Tables.widen(df)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("tok"),
        explode(sequence(lit(1), least(length(bin(col("c"))), lit(cap)))).as("j"))
      .select(col("doc_id"), concat_ws("~", col("tok"), col("j")).as("shingle"))
  }

  /** MinHash signatures: k independent min-hashes computed as k aggregate
    * expressions in ONE groupBy over the (doc, shingle) relation — a single
    * shuffle regardless of k, with map-side partial mins. Hash s of a
    * shingle is the 16-hex-char prefix of md5("<s>|" + shingle). */
  def minhashSignatures(shingled: DataFrame, k: Int): DataFrame = {
    val aggs = (0 until k).map { s =>
      min(substring(md5(concat(lit(s"$s|"), col("shingle"))), 1, 16)).as(s"h$s")
    }
    shingled.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: split the k-row signature into `bands` bands of
    * `rowsPerBand`, key each band by the concatenated hashes, self-join on
    * (band, key). Only same-bucket docs ever meet: candidate generation is
    * O(bucket²) not O(n²). Returns distinct (doc_a < doc_b) pairs.
    *
    * `maxBucket` is the degenerate-corpus guard: a bucket holding more than
    * `maxBucket` docs carries no discriminative signal (hash collisions of
    * near-uniform content) but costs O(bucket²) — standard LSH practice is
    * to drop such buckets entirely. Measured on a 100k-doc corpus with a
    * 30-word shared vocabulary: unbounded buckets → quadratic blowup;
    * capped → linear. */
  def lshCandidatePairs(sig: DataFrame, bands: Int, rowsPerBand: Int,
                        maxBucket: Int = 1000): DataFrame = {
    // materialize the signatures once (k longs per doc): the md5 pipeline
    // above this point is the expensive part, and the self-join below
    // references it from two sides — lineage truncation beats relying on
    // exchange reuse across the window+join combination
    val sigM = sig.localCheckpoint(true)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*).as("bkey"))
    }
    val buckets = sigM.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val left = buckets.select(col("band"), col("bkey"), col("doc_id").as("doc_a"))
    val right = buckets.select(col("band"), col("bkey"), col("doc_id").as("doc_b"))
    left.join(right, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** FUZZY cross-corpus contamination candidates: MinHash-LSH between a
    * training corpus and a benchmark set — the probabilistic tier of
    * decontamination ([[Curation.contamination]] is the exact-n-gram
    * tier; fuzzy overlap catches paraphrased/partially-copied eval items
    * that exact grams miss). Both sides shingle and sign with the SAME
    * hash family ([[docShingles]] + [[minhashSignatures]] — a doc's
    * signature depends only on its own shingles, so subset vs whole-corpus
    * computation cannot differ), then candidates are the band-bucket
    * equi-join of corpus buckets against benchmark buckets — the corpus
    * NEVER self-joins, so the pair fan-out is bounded by the (small by
    * construction) benchmark side. `maxBucket` caps degenerate corpus
    * buckets exactly as in [[lshCandidatePairs]].
    *
    * Returns distinct (doc_id, bench_id) candidates, unordered; verify
    * with [[ngramJaccard]] over the candidate set downstream.
    */
  def crossCorpusCandidates(corpus: DataFrame, bench: DataFrame,
                            textCol: String, idCol: String,
                            k: Int, bands: Int,
                            maxBucket: Int = 1000): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rpb = k / bands
    def bucketize(df: DataFrame): DataFrame = {
      val sig = minhashSignatures(docShingles(df, textCol, idCol), k)
        .localCheckpoint(true)
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat((0 until rpb).map(r => col(s"h${b * rpb + r}")): _*).as("bkey"))
      }
      sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    }
    val corpusBuckets = bucketize(corpus)
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val benchBuckets = bucketize(bench)
      .select(col("band"), col("bkey"), col("doc_id").as("bench_id"))
    corpusBuckets.join(benchBuckets, Seq("band", "bkey"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
  }

  /** [[crossCorpusCandidates]] over PRECOMPUTED signature frames — the
    * staged-signature entry point. A doc's signature depends only on its
    * own shingles, so signatures built over the whole corpus and row-
    * filtered to the two sides are value-identical to signatures built
    * from the filtered doc sets (the subset-vs-whole invariant already
    * documented on [[crossCorpusCandidates]]); a bench/verify session
    * therefore computes ONE signature table and fans it into both sides
    * of every cross-corpus gate instead of re-running shingle → k-hash
    * builds per side per invocation. `k` must match the signature
    * frame's h0..h{k-1} columns. */
  def crossCorpusCandidatesFromSig(corpusSig: DataFrame, benchSig: DataFrame,
                                   k: Int, bands: Int,
                                   maxBucket: Int = 1000): DataFrame = {
    require(k % bands == 0, s"bands ($bands) must divide k ($k)")
    val rpb = k / bands
    def bucketize(sig: DataFrame): DataFrame = {
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat((0 until rpb).map(r => col(s"h${b * rpb + r}")): _*).as("bkey"))
      }
      sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    }
    val corpusBuckets = bucketize(corpusSig)
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val benchBuckets = bucketize(benchSig)
      .select(col("band"), col("bkey"), col("doc_id").as("bench_id"))
    corpusBuckets.join(benchBuckets, Seq("band", "bkey"))
      .select(col("doc_id"), col("bench_id"))
      .distinct()
  }

  /** Stateless per-ROW band-bucket projection — the streaming-compatible
    * form of [[minhashSignatures]] + banding: each doc's k-hash signature
    * is computed from its own shingles (min over the doc's shingle hashes ≡
    * the batch groupBy-min), then emitted as one (band, bkey, doc_id) row
    * per band. No shuffle, no state — works identically on a batch frame
    * and a `readStream` frame. Docs with no shingles (< 3 tokens) are
    * dropped, as in the batch path.
    *
    * Implemented as a typed `mapPartitions` with a direct MessageDigest —
    * deliberately NOT the composable `array_min(transform(md5(…)))` form:
    * higher-order functions evaluate INTERPRETED per element, and k·|sh|
    * interpreted md5 calls per doc measured ~10× slower than this loop
    * (12 s vs ~1.5 s for 5 k docs × 8 hashes at sf0.1). Hash values are
    * byte-identical to the batch path (lowercase-hex md5 of
    * "s|shingle" UTF-8, first 16 chars) — `LshStreamSpec` asserts the two
    * implementations produce the same candidate pairs. Callers widen batch
    * frames themselves (widen probes the plan, which a streaming frame
    * forbids). */
  def bandBuckets(docs: DataFrame, textCol: String, idCol: String,
                  k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands evenly")
    val rowsPerBand = k / bands
    val s = docs.sparkSession
    import s.implicits._
    val rows = docs
      .select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
    rows.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      def h16(s: String): String = {
        md.reset()
        val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val out = new Array[Char](16) // first 8 bytes = 16 hex chars
        var i = 0
        while (i < 8) {
          out(2 * i) = hex((d(i) >> 4) & 0xf); out(2 * i + 1) = hex(d(i) & 0xf)
          i += 1
        }
        new String(out)
      }
      it.flatMap { case (id, text) =>
        // tokens/shingles exactly as TextAnalysis.tokens/shinglesFromTokens:
        // lower → split \W+ → drop empties → word 3-grams. Locale.ROOT so a
        // Turkish-locale JVM ('I'→'ı') can't diverge from Spark's
        // locale-independent lower() and break the batch≡stream guarantee.
        val toks = Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT)
          .split("\\W+").filter(_.nonEmpty)
        if (toks.length < 3) Iterator.empty
        else {
          val mins = Array.fill(k)(MaxSentinel)
          var i = 0
          while (i <= toks.length - 3) {
            val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
            var sIdx = 0
            while (sIdx < k) {
              val hv = h16(sIdx.toString + "|" + sh)
              if (hv < mins(sIdx)) mins(sIdx) = hv
              sIdx += 1
            }
            i += 1
          }
          (0 until bands).iterator.map { b =>
            val bkey = (0 until rowsPerBand).map(r => mins(b * rowsPerBand + r)).mkString
            BandBucket(b, bkey, id)
          }
        }
      }
    }.toDF()
  }

  /** Full MinHash-LSH near-dup candidates: shingle → sign → band → bucket
    * join. Default 16 hashes in 4 bands of 4 ≈ Jaccard-0.7 threshold. */
  def dedupNearMinhash(df: DataFrame, textCol: String, idCol: String,
                       k: Int = 16, bands: Int = 4): DataFrame = {
    require(k % bands == 0, "k must divide into bands evenly")
    lshCandidatePairs(minhashSignatures(docShingles(df, textCol, idCol), k), bands, k / bands)
  }

  /** SimHash fingerprint (default 16 bits, up to the classic Charikar 64):
    * per-bit majority vote over md5-prefix hashes of the document's
    * distinct tokens. One groupBy with `bits` sum-aggregates — a single
    * shuffle. Near-dup docs land on equal (or Hamming-close) fingerprints.
    *
    * The vote hash is an 8-hex-char (32-bit) md5 prefix for bits ≤ 32 —
    * kept narrow so the 32-bit fingerprints of earlier corpora stay
    * byte-stable — and a 16-hex-char (64-bit) prefix above that; nibble
    * positions past the prefix would silently produce garbage votes, hence
    * the hard bound. Bit 63's weight is `1L << 63` = Long.MinValue: the
    * fold adds it LAST (ascending bit order), so partial sums of distinct
    * non-negative powers stay ≤ 2^63-1 and the final add cannot overflow
    * under ANSI arithmetic — the fingerprint is the standard two's-
    * complement reading of the 64-bit pattern. */
  def simhash(df: DataFrame, textCol: String, idCol: String, bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash supports 1..64 bits, got $bits")
    val hexLen = if (bits <= 32) 8 else 16
    val words = graft.io.Tables.widen(df)
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .distinct()
    val h = substring(md5(col("w")), 1, hexLen)
    val voteAggs = (0 until bits).map { b =>
      val nibble = conv(substring(h, hexLen - b / 4, 1), 16, 10).cast("int")
      val bit = shiftright(nibble, b % 4).bitwiseAND(lit(1))
      sum(when(bit === 1, 1).otherwise(-1)).as(s"v$b")
    }
    val votes = words.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
    val fp = (0 until bits).map { b =>
      when(col(s"v$b") >= 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    votes.select(col("doc_id"), fp.as("simhash"))
  }

  /** SimHash near-dup candidate pairs: band the `bits`-bit fingerprint into
    * `bits/bandBits` bands and self-join per band — by pigeonhole, any pair
    * within Hamming distance < nBands shares at least one band, so
    * candidate generation is complete for `maxHamming ≤ nBands-1` while
    * never going all-pairs. Emits (doc_a, doc_b, hamming ≤ maxHamming).
    *
    * CAPACITY BOUND (pick bandBits for your corpus size): each band has
    * only 2^bandBits distinct keys, so a corpus larger than about
    * 2^bandBits · maxBucket docs saturates EVERY bucket past the
    * degenerate-corpus guard and candidates silently vanish (measured at
    * 100× stress: 8-bit bands cap out at ~256k docs; 500k docs need
    * bandBits ≥ 16). Widening bands trades completeness radius for key
    * space — recover radius with [[simhashMultiProbePairs]]. */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          bits: Int = 16, bandBits: Int = 4,
                          maxHamming: Int = 3, maxBucket: Int = 1000): DataFrame =
    // materialize fingerprints once (1 long per doc) — same rationale as
    // [[lshCandidatePairs]]
    simhashNearDupPairsFromFp(simhash(df, textCol, idCol, bits).localCheckpoint(true),
      bits, bandBits, maxHamming, maxBucket)

  /** [[simhashNearDupPairs]] over a PRECOMPUTED (doc_id, simhash) frame —
    * the staged-fingerprint entry point (a bench/verify session computes
    * fingerprints once and fans them into every banding variant). */
  def simhashNearDupPairsFromFp(fp: DataFrame, bits: Int, bandBits: Int,
                                maxHamming: Int, maxBucket: Int = 1000): DataFrame = {
    require(bits % bandBits == 0, "bandBits must divide bits")
    val nBands = bits / bandBits
    require(maxHamming < nBands, "banding is only candidate-complete for maxHamming < nBands")
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
    }
    val buckets = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      // degenerate-corpus guard — see [[lshCandidatePairs]] maxBucket note
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
    val left = buckets.select(col("band"), col("bkey"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val right = buckets.select(col("band"), col("bkey"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    left.join(right, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Stateless per-row SimHash band buckets — the SimHash counterpart of
    * [[bandBuckets]] for STREAMING near-dup candidate generation: each
    * document's `bits`-bit fingerprint is computed ROW-LOCALLY (a doc's
    * distinct tokens, md5 votes, majority per bit — byte-identical to the
    * batch [[simhash]] aggregate; `SimhashStreamSpec` asserts it) and
    * banded into bits/bandBits `BandBucket` rows ready for
    * [[graft.streaming.Streaming.lshCandidateStream]]'s per-bucket
    * pairing. No shuffle, no state — works identically on a batch frame
    * and a `readStream` frame. Docs with zero tokens emit nothing, as in
    * the batch path (they never enter the vote aggregate). */
  def simhashBandBuckets(docs: DataFrame, textCol: String, idCol: String,
                         bits: Int = 32, bandBits: Int = 8): DataFrame = {
    require(bits >= 1 && bits <= 64, s"simhash supports 1..64 bits, got $bits")
    require(bits % bandBits == 0, "bandBits must divide bits")
    val hexLen = if (bits <= 32) 8 else 16
    val nBands = bits / bandBits
    val s = docs.sparkSession
    import s.implicits._
    val rows = docs
      .select(col(idCol).cast("long").as("_1"), col(textCol).as("_2"))
      .as[(Long, String)]
    rows.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      def hHex(in: String): Array[Char] = {
        md.reset()
        val d = md.digest(in.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        val out = new Array[Char](hexLen)
        var i = 0
        while (i < hexLen / 2) {
          out(2 * i) = hex((d(i) >> 4) & 0xf); out(2 * i + 1) = hex(d(i) & 0xf)
          i += 1
        }
        out
      }
      it.flatMap { case (id, text) =>
        // exactly TextAnalysis.tokens + the per-doc distinct of [[simhash]]
        val toks = Option(text).getOrElse("").toLowerCase(java.util.Locale.ROOT)
          .split("\\W+").filter(_.nonEmpty).distinct
        if (toks.isEmpty) Iterator.empty
        else {
          val votes = new Array[Int](bits)
          toks.foreach { t =>
            val h = hHex(t)
            var b = 0
            while (b < bits) {
              // batch form: conv(substring(h, hexLen - b/4, 1), 16, 10),
              // 1-indexed substring → 0-based char hexLen - 1 - b/4
              val nib = Character.digit(h(hexLen - 1 - b / 4), 16)
              votes(b) += (if (((nib >> (b % 4)) & 1) == 1) 1 else -1)
              b += 1
            }
          }
          var fp = 0L
          var b = 0
          while (b < bits) { if (votes(b) >= 0) fp |= (1L << b); b += 1 }
          (0 until nBands).iterator.map { bb =>
            val bkey = (fp >> (bb * bandBits)) & ((1L << bandBits) - 1)
            BandBucket(bb, bkey.toString, id)
          }
        }
      }
    }.toDF()
  }

  /** Multi-probe (Hamming-ball radius-1) SimHash candidate pairs — the
    * recall-doubling extension of [[simhashNearDupPairs]]: band the
    * fingerprint identically, but PROBE each document's band keys AND all
    * their 1-bit perturbations against the exact-key index.
    *
    * Completeness: a pair at Hamming distance d must have some band whose
    * keys differ in ≤ 1 bit whenever d ≤ 2·nBands−1 (if every band
    * differed in ≥ 2 bits, d would be ≥ 2·nBands), and a 1-bit-differing
    * band key is reached by exactly one perturbation — so candidates are
    * complete for `maxHamming ≤ 2·nBands−1`, DOUBLE the exact-banding
    * radius, at a fixed (bandBits+1)× probe fan-out per band. Still never
    * all-pairs: the join is an equi-join on (band, key), the probe side
    * fan-out is a constant, and oversized index buckets are dropped by the
    * same degenerate-corpus guard as the exact form. Hamming is verified
    * exactly (`bit_count(xor)`) so extra candidates only cost compute,
    * never precision. */
  def simhashMultiProbePairs(df: DataFrame, textCol: String, idCol: String,
                             bits: Int = 64, bandBits: Int = 8,
                             maxHamming: Int = 10, maxBucket: Int = 1000): DataFrame =
    simhashMultiProbePairsFromFp(simhash(df, textCol, idCol, bits).localCheckpoint(true),
      bits, bandBits, maxHamming, maxBucket)

  /** [[simhashMultiProbePairs]] over a PRECOMPUTED (doc_id, simhash)
    * frame — the staged-fingerprint entry point. */
  def simhashMultiProbePairsFromFp(fp: DataFrame, bits: Int, bandBits: Int,
                                   maxHamming: Int, maxBucket: Int = 1000): DataFrame = {
    require(bits % bandBits == 0, "bandBits must divide bits")
    val nBands = bits / bandBits
    require(maxHamming < 2 * nBands,
      "1-bit multi-probe banding is only candidate-complete for maxHamming < 2*nBands")
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
    }
    val exact = fp.select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // index side: exact keys only, oversized buckets dropped (guard sized
    // on the index — probes aimed at a dropped bucket simply match nothing)
    val index = exact
      .withColumn("__bsz", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
      .select(col("band"), col("bkey"),
        col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    // probe side: the exact key plus its bandBits 1-bit flips
    val flips = lit(0L) +: (0 until bandBits).map(i => lit(1L << i))
    val probes = exact
      .select(col("doc_id").as("doc_a"), col("simhash").as("sim_a"),
        col("band"), explode(array(flips.map(col("bkey").bitwiseXOR): _*)).as("bkey"))
    probes.join(index, Seq("band", "bkey"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
  }

  /** Exact n-gram Jaccard over candidate pairs only: shingle equi-join for
    * the intersection, per-doc set sizes for the union. Feed it LSH
    * candidates — never the full cross product. The intersection join keys
    * on (doc, shingle) explicitly so the plan is a two-key hash join, not a
    * per-pair shingle cross product filtered afterwards. */
  def ngramJaccard(shingled: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("set_size"))
    val inter = pairs
      .join(shingled.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("set_size").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("set_size").as("size_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
          (col("size_a") + col("size_b") - col("n_inter"))).as("jaccard"))
  }

  /** CONTAINMENT scoring over candidate pairs — the asymmetric cousin of
    * [[ngramJaccard]]: `inter/|A|` (how much of A lies inside B) and
    * `inter/|B|`. Jaccard misses near-SUBSET relations entirely — a quote
    * or an excerpt embedded in a 100× longer doc has tiny Jaccard but
    * containment ≈ 1 on the short side — and subset pruning is its own
    * standard dedup stage (Broder 1997's "containment", the quote/excerpt
    * tier of near-dup). Same plan shape as the Jaccard verify: candidate
    * pairs only (never all-pairs), one shingle equi-join, fixed-point
    * outputs. `near_subset` fires when either side is ≥ `tauNum/tauDen`
    * contained. */
  def containmentPairs(shingled: DataFrame, pairs: DataFrame,
                       tauNum: Long = 9L, tauDen: Long = 10L): DataFrame = {
    require(tauNum >= 0 && tauDen >= 1 && tauNum <= tauDen,
      s"need 0 <= tauNum/tauDen <= 1 (got $tauNum/$tauDen)")
    val sizes = shingled.groupBy(col("doc_id")).agg(count(lit(1)).as("set_size"))
    val inter = pairs
      .join(shingled.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(shingled.select(col("doc_id").as("doc_b"), col("shingle")), Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("set_size").as("size_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("set_size").as("size_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"),
        expr("(n_inter * 1000000L) div size_a").as("cont_a_fp"),
        expr("(n_inter * 1000000L) div size_b").as("cont_b_fp"))
      .withColumn("near_subset",
        greatest(col("cont_a_fp"), col("cont_b_fp")) * tauDen >= lit(1000000L) * tauNum)
  }

  /** Single-pass SUBSET PRUNING on top of [[containmentPairs]]: for every
    * near-subset pair, the MORE-CONTAINED side (the doc that mostly lives
    * inside the other; ties to the higher doc_id) is the loser, and a doc
    * survives iff it loses no pair. One pass by design — the standard
    * excerpt-removal stage; iterated pruning (a keeper itself contained in
    * a third doc) converges via rerun, like every fixed-point here.
    *
    * Returns (doc_id, kept); unordered. Plan: the loser projection is
    * row-local over the (bounded) verified-pair set; the verdict is one
    * left-anti join of the corpus against the distinct losers. */
  def subsetPrune(docs: DataFrame, textCol: String, idCol: String,
                  k: Int, bands: Int,
                  tauNum: Long = 9L, tauDen: Long = 10L): DataFrame = {
    val shingled = docShingles(docs, textCol, idCol)
    val pairs = lshCandidatePairs(minhashSignatures(shingled, k), bands, k / bands)
    val cont = containmentPairs(shingled, pairs, tauNum, tauDen)
    val losers = cont.where(col("near_subset"))
      .select(when(col("cont_a_fp") > col("cont_b_fp"), col("doc_a"))
        .when(col("cont_b_fp") > col("cont_a_fp"), col("doc_b"))
        .otherwise(greatest(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
    graft.io.Tables.widen(docs).select(col(idCol).as("doc_id"))
      .join(losers.withColumn("__lost", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("__lost"), lit(false)).as("lost"))
      .select(col("doc_id"), (!col("lost")).as("kept"))
  }
}
