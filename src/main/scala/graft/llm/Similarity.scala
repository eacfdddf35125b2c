package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is the correctness baseline and is
  * only ever (queries × corpus) — the query side must be small and is
  * broadcast, so the corpus is scanned exactly once with no shuffle. The
  * scale paths prune the corpus first:
  *
  *  - IVF-style: restrict the search to a coarse partition (here the
  *    `label` column stands in for a centroid assignment) — a bucket
  *    equi-join, never a cross join;
  *  - sign-LSH: bucket vectors by the sign pattern of leading components
  *    (axis-aligned random-hyperplane LSH); candidates share a bucket.
  *
  * All arithmetic is elementwise-in-order double folds so the DuckDB oracle
  * reproduces results bit-for-bit.
  */
object Similarity {

  /** Elementwise dot product — the native [[DotProduct]] expression (one
    * tight loop, O(1) plan size; see its scaladoc for why both the unrolled
    * flat sum and the `aggregate(zip_with(…))` fold lose in pair-scoring
    * contexts). Accumulation is a left-to-right fold from 0.0 over
    * double-cast elements, bit-identical to the unrolled sum
    * `((x1+x2)+x3)…` and to the DuckDB oracle's `list_reduce`.
    *
    * `dim` is retained at call sites as documentation of the fixed width;
    * the native loop handles any width, so it no longer changes the plan. */
  def dot(a: Column, b: Column, dim: Int = -1): Column =
    DotProduct.dotNative(a, b)

  def norm(a: Column, dim: Int = -1): Column = sqrt(dot(a, a, dim))

  /** Cosine similarity, written as dot/(norm*norm) with the exact same
    * operation order on both engines. */
  def cosine(a: Column, b: Column, dim: Int = -1): Column =
    dot(a, b, dim) / (norm(a, dim) * norm(b, dim))

  /** Cosine from per-SIDE precomputed norms: `dot/(na*nb)` is the exact
    * expression [[cosine]] builds — same values, same operation order, same
    * oracle — but each vector's norm is computed once per ROW instead of
    * once per PAIR, cutting the per-pair work from 3 dot products to 1.
    * Every pairing operator below stages norms this way. */
  private def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column,
                              dim: Int): Column =
    dot(a, b, dim) / (na * nb)

  /** Brute-force top-k: broadcast the (small) query set against the corpus,
    * score every pair, rank per query. The corpus side never shuffles;
    * ranking shuffles only (queries × corpus) scored rows. */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     dim: Int = -1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"),
      norm(col(vecCol), dim).as("__qn"))
    val c = graft.io.Tables.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"),
        norm(col(vecCol), dim).as("__cn"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("qvec"), col("cvec"), col("__qn"), col("__cn"), dim).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** IVF-style pruned top-k: search only within the query's coarse bucket
    * (equi-join on the bucket column). At 100 TB the bucket column is a
    * k-means centroid id; here the testdata's `label` plays that role. */
  def bucketTopK(queries: DataFrame, corpus: DataFrame, k: Int, bucketCol: String,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 dim: Int = -1): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec"), col(bucketCol),
      norm(col(vecCol), dim).as("__qn"))
    val c = graft.io.Tables.widen(corpus)
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"), col(bucketCol),
        norm(col(vecCol), dim).as("__cn"))
    val scored = c.join(broadcast(q), Seq(bucketCol))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosineWithNorms(col("qvec"), col("cvec"), col("__qn"), col("__cn"), dim).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos_sim"))
  }

  /** Axis-aligned sign-LSH bucket id: bit b set iff component b > 0.
    * With roughly isotropic embeddings this is random-hyperplane LSH with
    * coordinate hyperplanes; `nBits` controls bucket granularity. */
  def signBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map { b =>
      when(element_at(vec, b + 1) > 0f, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Embedding-cosine near-duplicate pairs within sign-LSH buckets:
    * vectors only meet if they share the full sign pattern of their leading
    * `nBits` components — a bucket self-join, never all-pairs. */
  def embeddingNearDupPairs(corpus: DataFrame, threshold: Double, nBits: Int = 8,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            dim: Int = -1): DataFrame = {
    val bucketed = corpus.select(col(idCol), col(vecCol),
      signBucket(col(vecCol), nBits).as("bucket"),
      norm(col(vecCol), dim).as("__n"))
    val left = bucketed.select(col("bucket"), col(idCol).as("id_a"),
      col(vecCol).as("vec_a"), col("__n").as("__na"))
    val right = bucketed.select(col("bucket"), col(idCol).as("id_b"),
      col(vecCol).as("vec_b"), col("__n").as("__nb"))
    left.join(right, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("vec_a"), col("vec_b"), col("__na"), col("__nb"), dim).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Multi-probe (Hamming-ball radius-1) sign-LSH near-dup pairs — the
    * embedding-space counterpart of
    * [[Dedup.simhashMultiProbePairs]]: band the `nBits` sign signature,
    * probe each band key and its 1-bit flips against the exact-key index
    * — candidate-complete for sign-Hamming ≤ 2·nBands−1, so it catches
    * near-dup vectors that straddle up to that many coordinate
    * hyperplanes, which [[embeddingNearDupPairs]]' full-signature
    * equality misses entirely — then verify candidates with the EXACT
    * cosine. Pair ids travel alone through the probe join (no vector
    * duplication across the probe fan-out); vectors re-join only for the
    * bounded verify stage. */
  def embeddingNearDupPairsMultiProbe(corpus: DataFrame, threshold: Double,
      nBits: Int = 8, bandBits: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = -1, maxBucket: Int = 1000): DataFrame = {
    require(nBits % bandBits == 0, "bandBits must divide nBits")
    val nBands = nBits / bandBits
    val sig = corpus.select(col(idCol).as("__id"),
        signBucket(col(vecCol), nBits).as("__sig"))
      .localCheckpoint(true)
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("__sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bkey"))
    }
    val exact = sig.select(col("__id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // degenerate-corpus guard sized on the index, as in the SimHash form
    val index = exact
      .withColumn("__bsz", count(lit(1)).over(
        Window.partitionBy(col("band"), col("bkey"))))
      .where(col("__bsz") <= maxBucket)
      .drop("__bsz")
      .select(col("band"), col("bkey"), col("__id").as("id_b"))
    val flips = lit(0L) +: (0 until bandBits).map(i => lit(1L << i))
    val probes = exact.select(col("__id").as("id_a"), col("band"),
      explode(array(flips.map(col("bkey").bitwiseXOR): _*)).as("bkey"))
    val pairs = probes.join(index, Seq("band", "bkey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    val vecs = corpus.select(col(idCol), col(vecCol),
      norm(col(vecCol), dim).as("__n"))
    pairs
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"),
        col("__n").as("__na")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"),
        col("__n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        cosineWithNorms(col("vec_a"), col("vec_b"),
          col("__na"), col("__nb"), dim).as("cos_sim"))
      .where(col("cos_sim") >= threshold)
  }

  /** Maximal-Marginal-Relevance diverse top-k (Carbonell/Goldstein '98):
    * greedily pick k of the `candidates` nearest neighbors, each round
    * maximizing 0.5·sim(query, c) − 0.5·max_{s∈selected} sim(c, s) — the
    * standard diverse-retrieval re-rank (RAG context selection, exemplar
    * picking). Ties break to the smaller neighbor id.
    *
    * Shape: the candidate pool is BOUNDED (`candidates` per query — the
    * whole point of re-ranking a shortlist), so each of the k driver
    * rounds is one join + one argmax aggregate over |queries|·candidates
    * rows, with the argmax as a max(struct(score, −id, …)) — never a
    * per-query window over unbounded data. All cosines go through the
    * same dot/(na·nb) expression as [[bruteForceTopK]], so scores are
    * bit-identical to the oracle's unrolled-round SQL.
    *
    * Returns (query_id, rank, neighbor_id, score), unordered.
    */
  def mmrTopK(queries: DataFrame, corpus: DataFrame, candidates: Int, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              dim: Int = -1): DataFrame = {
    require(k >= 1 && candidates >= k,
      s"need candidates >= k >= 1 (got candidates=$candidates, k=$k)")
    val cvecs = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("nvec"),
      norm(col(vecCol), dim).as("__nn"))
    val cand = bruteForceTopK(queries, corpus, candidates, idCol, vecCol, dim)
      .join(cvecs, Seq("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("nvec"), col("__nn"),
        col("cos_sim").as("simq"))
      .localCheckpoint(true) // bounded: |queries| × candidates rows
    var selected = cand.where(lit(false))
      .select(col("query_id"), col("neighbor_id").as("sel_id"),
        col("nvec").as("svec"), col("__nn").as("__sn"),
        lit(0L).as("rank"), lit(0.0).as("score"))
    for (r <- 1 to k) {
      val rem = cand.join(
        selected.select(col("query_id"), col("sel_id").as("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_anti")
      val pen = rem
        .join(selected.select(col("query_id"), col("svec"), col("__sn")), Seq("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          cosineWithNorms(col("nvec"), col("svec"), col("__nn"), col("__sn"), dim).as("p"))
        .groupBy(col("query_id"), col("neighbor_id")).agg(max(col("p")).as("pen"))
      val scored = rem.join(pen, Seq("query_id", "neighbor_id"), "left")
        .withColumn("score",
          lit(0.5) * col("simq") - lit(0.5) * coalesce(col("pen"), lit(0.0)))
      val pick = scored.groupBy(col("query_id"))
        .agg(max(struct(col("score"), (-col("neighbor_id")).as("negid"),
          col("neighbor_id"), col("nvec"), col("__nn"))).as("w"))
        .select(col("query_id"), col("w.neighbor_id").as("sel_id"),
          col("w.nvec").as("svec"), col("w.__nn").as("__sn"),
          lit(r.toLong).as("rank"), col("w.score").as("score"))
      selected = selected.union(pick).localCheckpoint(true)
    }
    selected.select(col("query_id"), col("rank"),
      col("sel_id").as("neighbor_id"), col("score"))
  }

  /** Per-dimension corpus statistics — the feature-standardization table
    * (mean/std per embedding component) a normalization or whitening pass
    * needs before indexing.
    *
    * Scale shape: ONE global aggregate of 2·dim decimal partials (sum and
    * sum-of-squares per component, in the same single `agg` — no
    * posexplode, which would push corpus×dim rows through the aggregation
    * machinery, and no shuffle at all beyond the map-side-combined
    * single-row reduce; the [[Ivf.fit]] centroid-mean license). The
    * one-row→dim-rows unpivot at the end is driver-negligible.
    *
    * Exactness: components are FIXED-POINT quantized — `round(v·10¹²)`,
    * one IEEE multiply + one round-half-away-from-zero, identical on both
    * engines — and accumulate as integers in DECIMAL(38,0) (128-bit —
    * order-independent adds that can absorb 10²⁵ rows before overflow; a
    * double sum would depend on partial-aggregation order, and a
    * double→DECIMAL(·,12) cast rounds ties differently across engines —
    * measured 2 ULP divergence on this corpus). Mean divides the count as
    * a double; std = sqrt(m2 − mean²), all correctly-rounded IEEE ops the
    * oracle mirrors exactly.
    *
    * Returns (dim, n_vecs, mean, std); unordered.
    */
  def dimStats(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim >= 1, s"dim must be >= 1 (got $dim)")
    val sums = (0 until dim).flatMap { j =>
      val v = element_at(col(vecCol), j + 1).cast("double")
      Seq(sum(round(v * lit(1e12)).cast("decimal(38,0)")).as(s"__s$j"),
        sum(round(v * v * lit(1e12)).cast("decimal(38,0)")).as(s"__q$j"))
    }
    val agged = emb.agg(sums.head, sums.tail :+ count(lit(1)).as("__n"): _*)
    agged.select(col("__n"), explode(array((0 until dim).map { j =>
        struct(lit(j.toLong).as("dim"),
          (col(s"__s$j").cast("double") / lit(1e12) / col("__n")).as("mean"),
          (col(s"__q$j").cast("double") / lit(1e12) / col("__n")).as("m2"))
      }: _*)).as("st"))
      .select(col("st.dim").as("dim"), col("__n").as("n_vecs"),
        col("st.mean").as("mean"),
        sqrt(col("st.m2") - col("st.mean") * col("st.mean")).as("std"))
  }

  /** Apply a [[dimStats]] table to a vector column: z = (v − mean) / std
    * per component (feature standardization / z-normalization).
    *
    * The stats table is BOUNDED by the embedding width by contract, so it
    * packs into one broadcast row of (means, stds) arrays — the corpus
    * never shuffles and gains one row-local `transform` (the
    * [[Ivf.assign]] packed-broadcast license). The column is replaced in
    * place as `array<double>`.
    */
  def standardize(df: DataFrame, stats: DataFrame, vecCol: String): DataFrame = {
    val packed = stats
      .agg(sort_array(collect_list(struct(col("dim"), col("mean"), col("std"))))
        .as("__st"))
      .select(transform(col("__st"), x => x.getField("mean")).as("__means"),
        transform(col("__st"), x => x.getField("std")).as("__stds"))
    df.crossJoin(broadcast(packed))
      .withColumn(vecCol,
        transform(sequence(lit(1), size(col(vecCol))), j =>
          (element_at(col(vecCol), j).cast("double") -
            element_at(col("__means"), j)) / element_at(col("__stds"), j)))
      .drop("__means", "__stds")
  }

  /** Pairwise cosine between per-group embedding CENTROIDS — the "source
    * similarity matrix" a mixture designer reads before setting sampling
    * weights (near-identical sources are dedup candidates; orthogonal ones
    * are diversity anchors).
    *
    * Exactness: cos(Σa/n_a, Σb/n_b) = cos(Σa, Σb) — the 1/n factors cancel
    * — so the centroid never has to exist as a float vector. Components
    * quantize to `round(v·10⁶)` and accumulate as decimal(38,0) integers
    * (order-independent, the [[dimStats]] license), the pairwise dot is an
    * integer sum of integer products, and the single double divide+sqrt at
    * the end is IEEE-identical on any engine.
    *
    * Scale shape: ONE corpus pass → (group, dim) integer sums, bounded by
    * #groups × dim (not corpus size); the pair join is over that bounded
    * table (self-join on dim, group_a < group_b) — at 100 TB with
    * thousands of sources this is a few-MB broadcast-sized frame.
    * Integer range: |round(v·10⁶)| ≤ ~10⁷ per component; a 10¹²-row group
    * sums to ≤ 10¹⁹, products ≤ 10³⁸ — right at decimal(38)'s edge, so the
    * quantization scale is 10⁶ (not dimStats' 10¹²) to keep 100 TB-sized
    * groups inside exact range. */
  def centroidSimilarity(emb: DataFrame, groupCol: String,
                         vecCol: String = "embedding", dim: Int = -1): DataFrame = {
    val long = graft.io.Tables.widen(emb)
      .select(col(groupCol).as("grp"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .select(col("grp"), col("dim").cast("long").as("dim"),
        round(col("v") * lit(1e6)).cast("decimal(38,0)").as("qv"))
    val sums = long.groupBy(col("grp"), col("dim"))
      .agg(sum(col("qv")).as("s"))
    val pairs = sums.as("a").join(sums.as("b"),
        col("a.dim") === col("b.dim") && col("a.grp") < col("b.grp"))
      .groupBy(col("a.grp").as("group_a"), col("b.grp").as("group_b"))
      .agg(sum(col("a.s") * col("b.s")).as("dot_ab"),
        sum(col("a.s") * col("a.s")).as("dot_aa"),
        sum(col("b.s") * col("b.s")).as("dot_bb"))
    pairs.select(col("group_a"), col("group_b"),
      (col("dot_ab").cast("double") /
        (sqrt(col("dot_aa").cast("double")) * sqrt(col("dot_bb").cast("double"))))
        .as("cos_centroid"))
  }

  /** Intra-group embedding diversity: the MEAN PAIRWISE COSINE of a
    * group's vectors in ONE pass, via the unit-vector identity
    *
    *   Σ_{i≠j} ûᵢ·ûⱼ = ‖Σᵢ ûᵢ‖² − n   ⟹   mean = (‖Σû‖² − n) / (n(n−1))
    *
    * — the all-pairs sum collapses to the squared norm of the group's
    * unit-vector RESULTANT, so a statistic that naively costs O(n²)
    * comparisons per group is one aggregate (the SemDeDup-style "how
    * self-similar is this source" pre-flight, exact instead of sampled).
    *
    * Exactness: components are normalized (v/‖v‖, in-order double fold
    * for the norm), quantized to `round(û·10⁶)` and accumulated as
    * decimal(38,0); the identity is then evaluated once in IEEE doubles
    * from the exact integer ‖Σq‖². Quantization error is O(10⁻⁶) on the
    * statistic and both engines compute the identical quantized value —
    * hash-exact. Singleton groups yield NULL (no pairs).
    *
    * Scale shape: one corpus pass → (group, dim) integer sums (bounded),
    * one bounded rollup. Nothing pairwise ever materializes. */
  def groupDiversity(emb: DataFrame, groupCol: String,
                     vecCol: String = "embedding", dim: Int = -1): DataFrame = {
    val nrm = norm(col(vecCol), dim)
    val q = graft.io.Tables.widen(emb)
      .select(col(groupCol).as("grp"), col(vecCol), nrm.as("__nrm"))
      .select(col("grp"), posexplode(
        transform(col(vecCol).cast("array<double>"),
          x => round(x / col("__nrm") * lit(1e6)).cast("decimal(38,0)")))
        .as(Seq("dim", "qv")))
    val sums = q.groupBy(col("grp"), col("dim"))
      .agg(sum(col("qv")).as("s"))
    val s2 = sums.groupBy(col("grp"))
      .agg(sum(col("s") * col("s")).as("__s2"))
    val n = graft.io.Tables.widen(emb).groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n_vecs"))
    n.join(s2, Seq("grp"))
      .select(col("grp"), col("n_vecs"),
        when(col("n_vecs") >= 2,
          (col("__s2").cast("double") / lit(1e12) - col("n_vecs").cast("double")) /
            (col("n_vecs").cast("double") * (col("n_vecs").cast("double") - 1.0)))
          .otherwise(lit(null).cast("double")).as("mean_pairwise_cos"))
  }

  /** Mutual-kNN graph within coarse cells — the neighborhood graph that
    * graph-based curation (semantic clustering, density scoring, SemDeDup-
    * style pruning) is built on. An UNDIRECTED edge (a,b) survives iff a is
    * one of b's k nearest AND b is one of a's k nearest; the mutuality
    * filter is what strips hub vectors' one-sided edges.
    *
    * Scale shape: vectors only meet inside their `bucketCol` cell (an IVF
    * centroid id at 100 TB; the testdata's `label` here), so candidate
    * generation is O(Σ cell²), never O(n²) — the same contract as
    * [[bucketTopK]]/[[embeddingNearDupPairs]]. The per-node top-k Window
    * partitions on node id (max cell-size rows per task, no global sort),
    * and the mutuality check is an equi-join of the directed edge list
    * (≤ k·n rows) with itself on the reversed key — no second corpus scan.
    * Ties break by neighbor id ascending, so ranks are deterministic. */
  def mutualKnnGraph(corpus: DataFrame, k: Int, bucketCol: String,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     dim: Int = -1): DataFrame = {
    val c = graft.io.Tables.widen(corpus)
      .select(col(idCol).as("__id"), col(vecCol).as("__vec"), col(bucketCol).as("__cell"),
        norm(col(vecCol), dim).as("__n"))
    val scored = c.as("s").join(c.as("t"), col("s.__cell") === col("t.__cell") &&
        col("s.__id") =!= col("t.__id"))
      .select(col("s.__id").as("src"), col("t.__id").as("dst"),
        cosineWithNorms(col("s.__vec"), col("t.__vec"),
          col("s.__n"), col("t.__n"), dim).as("cos_sim"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_sim").desc, col("dst"))
    val directed = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
    directed.as("f").join(
        directed.select(col("src").as("dst"), col("dst").as("src"),
          col("rank").as("rank_back")).as("r"),
        Seq("src", "dst"))
      .where(col("src") < col("dst"))
      .select(col("src").as("id_a"), col("dst").as("id_b"),
        col("cos_sim"), col("rank").as("rank_ab"), col("rank_back").as("rank_ba"))
  }

  /** kNN density / outlier profile per vector: the mean cosine to its (up
    * to) k nearest within its coarse cell, plus how many of those edges are
    * MUTUAL — low mean-cos + low mutuality is the classic embedding-space
    * outlier signature (mislabeled, off-domain, or corrupt rows), scored
    * before such rows poison semantic-dedup cell statistics.
    *
    * Per-neighbor cosines are quantized to round(cos·10⁶) and summed as
    * integers, so the per-node mean is order-independent and hash-exact
    * cross-engine. Same O(Σ cell²) candidate contract as
    * [[mutualKnnGraph]]; singleton-cell vectors emit 0 neighbors.
    * Output: (vec_id, n_neighbors, mean_cos_fp, mutual_degree). */
  def knnDensity(corpus: DataFrame, k: Int, bucketCol: String,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 dim: Int = -1): DataFrame = {
    val c = graft.io.Tables.widen(corpus)
      .select(col(idCol).as("__id"), col(vecCol).as("__vec"), col(bucketCol).as("__cell"),
        norm(col(vecCol), dim).as("__n"))
    val scored = c.as("s").join(c.as("t"), col("s.__cell") === col("t.__cell") &&
        col("s.__id") =!= col("t.__id"))
      .select(col("s.__id").as("src"), col("t.__id").as("dst"),
        cosineWithNorms(col("s.__vec"), col("t.__vec"),
          col("s.__n"), col("t.__n"), dim).as("cos_sim"))
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos_sim").desc, col("dst"))
    val directed = scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("src"), col("dst"),
        round(col("cos_sim") * lit(1e6)).cast("long").as("__q"))
    val back = directed.select(col("dst").as("src"), col("src").as("dst"))
      .withColumn("__mutual", lit(1L))
    val perNode = directed.join(back, Seq("src", "dst"), "left")
      .groupBy(col("src").as("vec_id"))
      .agg(count(lit(1)).as("n_neighbors"),
        sum(col("__q")).as("__sum"),
        sum(coalesce(col("__mutual"), lit(0L))).as("mutual_degree"))
      .select(col("vec_id"), col("n_neighbors"),
        expr("__sum div n_neighbors").as("mean_cos_fp"), col("mutual_degree"))
    c.select(col("__id").as("vec_id")).join(perNode, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_neighbors"), lit(0L)).as("n_neighbors"),
        coalesce(col("mean_cos_fp"), lit(0L)).as("mean_cos_fp"),
        coalesce(col("mutual_degree"), lit(0L)).as("mutual_degree"))
  }
}
