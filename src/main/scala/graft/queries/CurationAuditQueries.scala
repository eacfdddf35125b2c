package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.{Curation, Dedup, Sampling, Similarity, TextAnalysis}
import graft.queries.LlmQueries._

/** Corpus AUDIT queries — the release-gate / drift / overlap / outlier
  * family, split from [[CurationQueries]] (round-10 registry-size rule:
  * no non-test file over 2000 lines). [[CurationQueries]] keeps the
  * sampling/mixing primitives and the v1–v12 pipeline compositions; this
  * registry carries the read-only audits a curation run reports on. Same
  * contract as every registry: each `defs` entry has a DuckDB `oracles`
  * twin with identical column names and deterministic ordering. */
object CurationAuditQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Intra-source embedding diversity — [[Similarity.groupDiversity]]'s
    * one-pass mean-pairwise-cosine identity (‖Σû‖² − n) / n(n−1): the
    * O(n²) statistic as ONE aggregate. Per label over the embeddings
    * table; quantized-unit-vector arithmetic hash-matches the oracle. */
  val q181_source_diversity: Q = (s, d) =>
    Similarity.groupDiversity(Tables.embeddings(s, d), "label",
        dim = graft.io.Stats.embeddingDim(s, d))
      .select(col("grp").cast("long").as("grp"), col("n_vecs"),
        col("mean_pairwise_cos"))
      .orderBy(col("grp"))

  val q181_sql: String =
    s"""WITH x AS (SELECT label, embedding,
       |       sqrt(${sqlDot("embedding", "embedding")}) AS nrm FROM embeddings),
       |u AS (SELECT label, unnest(embedding) AS v,
       |        unnest(range(1, len(embedding) + 1)) AS j, nrm FROM x),
       |qs AS (SELECT label, j,
       |         sum(CAST(round(v::DOUBLE / nrm * 1e6) AS HUGEINT)) AS s
       |       FROM u GROUP BY 1, 2),
       |s2 AS (SELECT label, sum(s * s) AS s2 FROM qs GROUP BY 1),
       |n AS (SELECT label, count(*)::BIGINT AS n_vecs FROM embeddings GROUP BY 1)
       |SELECT CAST(n.label AS BIGINT) AS grp, n.n_vecs,
       |       CASE WHEN n.n_vecs >= 2
       |            THEN (CAST(s2.s2 AS DOUBLE) / 1e12 - CAST(n.n_vecs AS DOUBLE)) /
       |                 (CAST(n.n_vecs AS DOUBLE) * (CAST(n.n_vecs AS DOUBLE) - 1.0))
       |            ELSE NULL END AS mean_pairwise_cos
       |FROM n JOIN s2 ON n.label = s2.label ORDER BY grp""".stripMargin


  /** Subset pruning — [[Dedup.subsetPrune]]: the excerpt-removal stage on
    * top of q179's containment scores (the more-contained side of every
    * near-subset pair loses; survivors = docs losing no pair). Per-doc
    * verdicts hash-certified against the oracle's replay. */
  val q182_subset_prune: Q = (s, d) =>
    Dedup.subsetPrune(Tables.documents(s, d), "text", "doc_id", LshK, LshBands,
        tauNum = 7L, tauDen = 10L)
      .orderBy(col("doc_id"))

  val q182_sql: String =
    s"""WITH ${lshCtes(LshK, LshBands)},
       |sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT p.doc_a, p.doc_b, count(*)::BIGINT AS n_inter
       |          FROM pairs p
       |          JOIN sh a ON a.doc_id = p.doc_a
       |          JOIN sh b ON b.doc_id = p.doc_b AND a.shingle = b.shingle
       |          GROUP BY p.doc_a, p.doc_b),
       |c AS (SELECT i.doc_a, i.doc_b,
       |        (i.n_inter * 1000000) // sa.n AS ca,
       |        (i.n_inter * 1000000) // sb.n AS cb
       |      FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
       |                   JOIN sizes sb ON sb.doc_id = i.doc_b),
       |losers AS (SELECT DISTINCT
       |        CASE WHEN ca > cb THEN doc_a WHEN cb > ca THEN doc_b
       |             ELSE greatest(doc_a, doc_b) END AS doc_id
       |      FROM c WHERE greatest(ca, cb) * 10 >= 1000000 * 7)
       |SELECT d.doc_id, l.doc_id IS NULL AS kept
       |FROM documents d LEFT JOIN losers l USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin


  /** Snapshot drift audit — [[graft.llm.Drift.histogramDrift]] over the
    * `source` and `lang` compositions of the even-id vs odd-id halves of
    * the corpus (standing in for yesterday's vs today's crawl). Rational
    * fixed-point proportions: no libm, hash-exact; the corpus shuffles
    * only as pre-aggregated (value, count) cells. */
  val q184_drift: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val ref = doc.where(col("doc_id") % 2 === 0)
    val cur = doc.where(col("doc_id") % 2 =!= 0)
    def feat(kc: String) =
      graft.llm.Drift.histogramDrift(ref, cur, kc)
        .select(lit(kc).as("feature"), col("value"), col("n_ref"), col("n_cur"),
          col("p_ref_fp"), col("p_cur_fp"), col("delta_fp"))
    feat("source").unionAll(feat("lang"))
      .orderBy(col("feature"), col("value"))
  }

  val q184_sql: String =
    """WITH b AS (
      |  SELECT feature, value,
      |         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
      |         sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_cur
      |  FROM (SELECT doc_id, 'source' AS feature, source AS value FROM documents
      |        UNION ALL
      |        SELECT doc_id, 'lang', lang FROM documents)
      |  GROUP BY 1, 2),
      |t AS (SELECT feature, sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc
      |      FROM b GROUP BY 1)
      |SELECT b.feature, b.value, b.n_ref, b.n_cur,
      |       CASE WHEN tr > 0 THEN (n_ref * 1000000) // tr ELSE 0 END::BIGINT AS p_ref_fp,
      |       CASE WHEN tc > 0 THEN (n_cur * 1000000) // tc ELSE 0 END::BIGINT AS p_cur_fp,
      |       abs(CASE WHEN tr > 0 THEN (n_ref * 1000000) // tr ELSE 0 END
      |         - CASE WHEN tc > 0 THEN (n_cur * 1000000) // tc ELSE 0 END)::BIGINT AS delta_fp
      |FROM b JOIN t USING (feature)
      |ORDER BY feature, value""".stripMargin


  /** Per-source dataset card — [[Curation.datasetCard]]: volume, exact-dup
    * load (global content-hash copies, the q19 shape, joined back), and
    * language composition with a window-free plurality election. The
    * release-gate rollup every snapshot ships with. */
  val q185_dataset_card: Q = (s, d) =>
    Curation.datasetCard(Tables.documents(s, d), "text", "doc_id",
        "source", "lang")
      .orderBy(col("source"))

  val q185_sql: String =
    """WITH base AS (SELECT doc_id, source, lang, md5(text) AS h,
      |                     length(text)::BIGINT AS chars FROM documents),
      |cp AS (SELECT h, count(*)::BIGINT AS copies FROM base GROUP BY 1),
      |fl AS (SELECT base.*, CASE WHEN copies > 1 THEN 1 ELSE 0 END AS dup
      |       FROM base JOIN cp USING (h)),
      |vol AS (SELECT source, count(*)::BIGINT AS n_docs,
      |               sum(chars)::BIGINT AS total_chars,
      |               sum(dup)::BIGINT AS n_dup_docs FROM fl GROUP BY 1),
      |lg AS (SELECT source, lang, count(*)::BIGINT AS n FROM base GROUP BY 1, 2),
      |rk AS (SELECT source, lang, row_number() OVER (PARTITION BY source
      |         ORDER BY n DESC, lang) AS rn FROM lg),
      |nl AS (SELECT source, count(*)::BIGINT AS n_langs FROM lg GROUP BY 1)
      |SELECT v.source, v.n_docs, v.total_chars,
      |       (v.total_chars // v.n_docs)::BIGINT AS mean_chars,
      |       v.n_dup_docs,
      |       ((v.n_dup_docs * 1000000) // v.n_docs)::BIGINT AS dup_rate_fp,
      |       nl.n_langs, rk.lang AS top_lang
      |FROM vol v JOIN nl USING (source)
      |JOIN rk ON rk.source = v.source AND rk.rn = 1
      |ORDER BY source""".stripMargin


  /** Pairwise source-vocabulary overlap — [[TextAnalysis.vocabOverlap]]:
    * Jaccard of distinct-token sets for every source pair via a postings
    * self-join whose fan-out is bounded by |sources|² regardless of corpus
    * size. The mix-design "are these crawls the same domain?" diagnostic. */
  val q189_source_overlap: Q = (s, d) =>
    TextAnalysis.vocabOverlap(Tables.documents(s, d), "text", "source")
      .orderBy(col("grp_a"), col("grp_b"))

  val q189_sql: String =
    """WITH p AS (SELECT DISTINCT grp, tok FROM (
      |    SELECT source AS grp, unnest(list_filter(
      |      string_split_regex(lower(text), '\W+'), x -> x <> '')) AS tok
      |    FROM documents)),
      |sz AS (SELECT grp, count(*)::BIGINT AS n FROM p GROUP BY 1),
      |i AS (SELECT a.grp AS grp_a, b.grp AS grp_b, count(*)::BIGINT AS n_inter
      |      FROM p a JOIN p b ON a.tok = b.tok AND a.grp < b.grp
      |      GROUP BY 1, 2)
      |SELECT grp_a, grp_b, n_inter,
      |       (sa.n + sb.n - n_inter)::BIGINT AS n_union,
      |       ((n_inter * 1000000) // (sa.n + sb.n - n_inter))::BIGINT AS jaccard_fp
      |FROM i JOIN sz sa ON sa.grp = i.grp_a JOIN sz sb ON sb.grp = i.grp_b
      |ORDER BY grp_a, grp_b""".stripMargin


  /** Median/MAD robust length outliers per source —
    * [[Curation.robustOutliers]]: exact interpolating percentiles (the q14
    * convention, certifiable cross-engine), bounded per-source stat frames
    * broadcast back; the approx_percentile escape hatch is the 100 TB
    * path (q144 precedent). */
  val q191_robust_outliers: Q = (s, d) =>
    Curation.robustOutliers(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        "n_chars", "source")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("med"), col("mad"), col("is_outlier"))
      .orderBy(col("doc_id"))

  val q191_sql: String =
    """WITH med AS (SELECT source, quantile_cont(n_chars::DOUBLE, 0.5) AS med
      |             FROM documents GROUP BY 1),
      |j AS (SELECT d.doc_id, d.source, d.n_chars, m.med
      |      FROM documents d JOIN med m USING (source)),
      |mad AS (SELECT source, quantile_cont(abs(n_chars::DOUBLE - med), 0.5) AS mad
      |        FROM j GROUP BY source)
      |SELECT j.doc_id, j.source, j.n_chars, j.med, mad.mad,
      |       abs(j.n_chars::DOUBLE - j.med) > 3.0 * mad.mad AS is_outlier
      |FROM j JOIN mad USING (source) ORDER BY doc_id""".stripMargin


  /** Per-source release gate — the round-7 composition: the dataset card's
    * dup load (q185), the robust-outlier share (q191's median/MAD screen),
    * and the snapshot drift of each source's share (q184's fixed-point
    * delta) meet in ONE bounded per-source verdict row; a source is
    * admitted when dup rate < 10%, outlier rate < 10%, and drift < 5pp.
    * Every stage keeps its locked shape (hash agg + join-back; two
    * broadcast percentile passes; histogram cells); the joins are on the
    * bounded source key. */
  val q192_release_gate: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val card = Curation.datasetCard(doc, "text", "doc_id", "source", "lang")
      .select(col("source"), col("n_docs"), col("dup_rate_fp"))
    val outliers = Curation.robustOutliers(
        doc.select(col("doc_id"), col("source"), col("n_chars")),
        "n_chars", "source")
      .groupBy(col("source"))
      .agg(sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"))
    val drift = graft.llm.Drift.histogramDrift(
        doc.where(col("doc_id") % 2 === 0), doc.where(col("doc_id") % 2 =!= 0),
        "source")
      .select(col("value").as("source"), col("delta_fp"))
    card.join(outliers, Seq("source")).join(drift, Seq("source"))
      .select(col("source"), col("n_docs"), col("dup_rate_fp"),
        col("n_outliers"),
        expr("(n_outliers * 1000000L) div n_docs").as("outlier_rate_fp"),
        col("delta_fp"))
      .withColumn("admit",
        col("dup_rate_fp") < 100000L &&
          expr("(n_outliers * 1000000L) div n_docs") < 100000L &&
          col("delta_fp") < 50000L)
      .orderBy(col("source"))
  }

  val q192_sql: String =
    """WITH base AS (SELECT doc_id, source, md5(text) AS h FROM documents),
      |cp AS (SELECT h, count(*)::BIGINT AS copies FROM base GROUP BY 1),
      |card AS (SELECT source, count(*)::BIGINT AS n_docs,
      |           sum(CASE WHEN copies > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup
      |         FROM base JOIN cp USING (h) GROUP BY 1),
      |med AS (SELECT source, quantile_cont(n_chars::DOUBLE, 0.5) AS med
      |        FROM documents GROUP BY 1),
      |j AS (SELECT d.doc_id, d.source, d.n_chars, m.med
      |      FROM documents d JOIN med m USING (source)),
      |mad AS (SELECT source, quantile_cont(abs(n_chars::DOUBLE - med), 0.5) AS mad
      |        FROM j GROUP BY source),
      |outl AS (SELECT j.source,
      |           sum(CASE WHEN abs(j.n_chars::DOUBLE - j.med) > 3.0 * mad.mad
      |                    THEN 1 ELSE 0 END)::BIGINT AS n_outliers
      |         FROM j JOIN mad USING (source) GROUP BY 1),
      |h AS (SELECT source,
      |        sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ref,
      |        sum(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)::BIGINT AS n_cur
      |      FROM documents GROUP BY 1),
      |t AS (SELECT sum(n_ref)::BIGINT AS tr, sum(n_cur)::BIGINT AS tc FROM h),
      |dr AS (SELECT source,
      |         abs(CASE WHEN tr > 0 THEN (n_ref * 1000000) // tr ELSE 0 END
      |           - CASE WHEN tc > 0 THEN (n_cur * 1000000) // tc ELSE 0 END)::BIGINT
      |           AS delta_fp
      |       FROM h CROSS JOIN t)
      |SELECT c.source, c.n_docs,
      |       ((c.n_dup * 1000000) // c.n_docs)::BIGINT AS dup_rate_fp,
      |       o.n_outliers,
      |       ((o.n_outliers * 1000000) // c.n_docs)::BIGINT AS outlier_rate_fp,
      |       dr.delta_fp,
      |       ((c.n_dup * 1000000) // c.n_docs) < 100000
      |         AND ((o.n_outliers * 1000000) // c.n_docs) < 100000
      |         AND dr.delta_fp < 50000 AS admit
      |FROM card c JOIN outl o USING (source) JOIN dr USING (source)
      |ORDER BY source""".stripMargin


  /** Per-source 2-D Pareto frontier — [[graft.operators.Skyline]]: the
    * shortest-yet-vocabulary-richest documents of each source (minimize
    * n_chars, maximize distinct-token count). The O(n²) dominance test
    * collapses into ONE sort on (source, n_chars) with two running-max
    * RANGE windows — no self-join, one shuffle, codegen throughout; the
    * source partition keeps the sort distributed at corpus scale. The
    * oracle replays the identical two-frame formulation (`RANGE …
    * 1 PRECEDING` / `CURRENT ROW`), so strictness at ties is certified on
    * both engines. */
  val q194_pareto: Q = (s, d) => {
    val doc = Tables.documents(s, d).select(col("doc_id"), col("source"),
      col("n_chars"),
      size(array_distinct(TextAnalysis.tokens(col("text")))).cast("long")
        .as("vocab"))
    graft.operators.Skyline.frontier2d(doc, "source", "n_chars", "vocab")
      .orderBy(col("source"), col("n_chars"), col("doc_id"))
  }

  val q194_sql: String =
    """WITH v AS (SELECT doc_id, source, n_chars,
      |    len(list_distinct(list_filter(string_split_regex(lower(text), '\W+'),
      |                                  x -> x <> '')))::BIGINT AS vocab
      |  FROM documents),
      |w AS (SELECT *,
      |    max(vocab) OVER (PARTITION BY source ORDER BY n_chars
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m1,
      |    max(vocab) OVER (PARTITION BY source ORDER BY n_chars
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m2
      |  FROM v)
      |SELECT doc_id, source, n_chars, vocab FROM w
      |WHERE (m1 IS NULL OR m1 < vocab) AND m2 <= vocab
      |ORDER BY source, n_chars, doc_id""".stripMargin


  /** Near-dup split-leakage audit: how many LSH near-dup pairs CROSS the
    * train/val/test boundary under a doc-level hash split versus a
    * GROUP-level (source) hash split — the standard eval-integrity
    * argument for splitting by group: near-dups cluster within sources,
    * so hashing the source keeps both sides of a dup pair in the same
    * split, while doc-hashing scatters them (train/test contamination).
    * Same reproducible md5 bucketing as [[graft.llm.Sampling.assignSplit]];
    * the pair frame is the bounded LSH candidate set, so the audit is two
    * row-local split assignments and one 1-row aggregate. */
  val q211_split_leakage: Q = (s, d) => {
    val pairs = DocLsh.pairs(s, d) // shared staged pipeline
    val doc = Tables.documents(s, d).select(col("doc_id"), col("source"))
    val withSplits = doc
      .withColumn("doc_split", Sampling.assignSplit(col("doc_id")))
      .withColumn("src_split", Sampling.assignSplit(col("source")))
    val a = withSplits.select(col("doc_id").as("doc_a"),
      col("doc_split").as("da"), col("src_split").as("sa"))
    val b = withSplits.select(col("doc_id").as("doc_b"),
      col("doc_split").as("db"), col("src_split").as("sb"))
    pairs.join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("da") =!= col("db"), 1L).otherwise(0L)).as("n_cross_doc"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_cross_src"))
  }

  val q211_sql: String =
    s"""WITH ${lshCtes(LshK, LshBands)},
       |sp AS (SELECT doc_id, source,
       |         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 100 AS hb_doc,
       |         ('0x' || substr(md5(source), 1, 8))::BIGINT % 100 AS hb_src
       |       FROM documents),
       |sp2 AS (SELECT doc_id,
       |          CASE WHEN hb_doc < 80 THEN 'train'
       |               WHEN hb_doc < 90 THEN 'val' ELSE 'test' END AS doc_split,
       |          CASE WHEN hb_src < 80 THEN 'train'
       |               WHEN hb_src < 90 THEN 'val' ELSE 'test' END AS src_split
       |        FROM sp)
       |SELECT count(*)::BIGINT AS n_pairs,
       |       sum(CASE WHEN a.doc_split <> b.doc_split THEN 1 ELSE 0 END)::BIGINT
       |         AS n_cross_doc,
       |       sum(CASE WHEN a.src_split <> b.src_split THEN 1 ELSE 0 END)::BIGINT
       |         AS n_cross_src
       |FROM pairs p
       |JOIN sp2 a ON a.doc_id = p.doc_a
       |JOIN sp2 b ON b.doc_id = p.doc_b""".stripMargin


  /** Per-source equi-depth length histograms —
    * [[graft.operators.EquiDepth]]: 4 equal-frequency buckets per source
    * (exact ntile semantics, (n_chars, doc_id) tie-break). The rank comes
    * from the range-partitioned prefix sum — no per-source single-task
    * window at any source size — and the bucket id is row-local
    * arithmetic against the broadcast |sources|-bounded counts. */
  val q214_equidepth_hist: Q = (s, d) =>
    graft.operators.EquiDepth.histogram(
      Tables.documents(s, d).select(col("source"), col("n_chars"), col("doc_id")),
      "source", "n_chars", "doc_id", b = 4)
      .orderBy(col("source"), col("bucket"))

  val q214_sql: String =
    """WITH r AS (SELECT source, n_chars::BIGINT AS v, doc_id,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS pos,
      |    count(*) OVER (PARTITION BY source) AS cnt
      |  FROM documents)
      |SELECT source, ((pos - 1) * 4) // cnt AS bucket,
      |       count(*)::BIGINT AS n_rows, min(v) AS lo, max(v) AS hi
      |FROM r GROUP BY 1, 2 ORDER BY source, bucket""".stripMargin


  /** EXACT-DEDUP STORAGE-SAVINGS report per source — the capacity-planning
    * number a dedup rollout decision needs BEFORE running it: per source,
    * how many docs and how many characters a keeper-per-hash-group policy
    * removes, as exact counts and integer-ppm shares. ONE hash-groupBy on
    * (source, md5(text)) — identical texts share a length, so the whole
    * report reduces to arithmetic on the (n, len) group frame; map-side
    * combined, no self-join, no text ever shuffled. */
  val q260_dedup_savings: Q = (s, d) => {
    val g = Tables.documents(s, d)
      .select(col("source"), md5(col("text")).as("h"),
        col("n_chars").cast("long").as("len"))
      .groupBy(col("source"), col("h"))
      .agg(count(lit(1)).as("n"), max(col("len")).as("len"))
    g.groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        sum(col("n") - 1).as("n_removable"),
        sum(col("n") * col("len")).as("total_chars"),
        sum((col("n") - 1) * col("len")).as("chars_saved"))
      .select(col("source"), col("n_docs"), col("n_removable"),
        col("total_chars"), col("chars_saved"),
        expr("chars_saved * 1000000 div total_chars").as("savings_ppm"))
      .orderBy(col("source"))
  }

  val q260_sql: String =
    """WITH g AS (SELECT source, md5(text) AS h, count(*)::BIGINT AS n,
      |             max(n_chars)::BIGINT AS len
      |           FROM documents GROUP BY 1, 2),
      |a AS (SELECT source, sum(n)::BIGINT AS n_docs,
      |        sum(n - 1)::BIGINT AS n_removable,
      |        sum(n * len)::BIGINT AS total_chars,
      |        sum((n - 1) * len)::BIGINT AS chars_saved
      |      FROM g GROUP BY 1)
      |SELECT source, n_docs, n_removable, total_chars, chars_saved,
      |       chars_saved * 1000000 // total_chars AS savings_ppm
      |FROM a ORDER BY source""".stripMargin

  val defs: Map[String, Q] = Map(
    "q181_source_diversity" -> q181_source_diversity,
    "q182_subset_prune" -> q182_subset_prune,
    "q184_drift" -> q184_drift,
    "q185_dataset_card" -> q185_dataset_card,
    "q189_source_overlap" -> q189_source_overlap,
    "q191_robust_outliers" -> q191_robust_outliers,
    "q192_release_gate" -> q192_release_gate,
    "q194_pareto" -> q194_pareto,
    "q211_split_leakage" -> q211_split_leakage,
    "q214_equidepth_hist" -> q214_equidepth_hist,
    "q260_dedup_savings" -> q260_dedup_savings)

  val oracles: Map[String, String] = Map(
    "q181_source_diversity" -> q181_sql,
    "q182_subset_prune" -> q182_sql,
    "q184_drift" -> q184_sql,
    "q185_dataset_card" -> q185_sql,
    "q189_source_overlap" -> q189_sql,
    "q191_robust_outliers" -> q191_sql,
    "q192_release_gate" -> q192_sql,
    "q194_pareto" -> q194_sql,
    "q211_split_leakage" -> q211_sql,
    "q214_equidepth_hist" -> q214_sql,
    "q260_dedup_savings" -> q260_sql)
}
