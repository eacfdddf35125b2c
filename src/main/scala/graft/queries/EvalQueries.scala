package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Ilog2, Isqrt}
import graft.io.Tables
import graft.llm.TextAnalysis
import graft.operators.RunningTotal

/** Round-10 evaluation/diagnostics registry: rank-based significance
  * testing, aggregation-bias audits, change-point detection,
  * histogram-based outlier scoring, containment dedup, and a
  * decision-stump feature probe. Same contract as every registry — each
  * `defs` entry has a DuckDB `oracles` twin with identical column names
  * and deterministic ordering; all statistics are exact integer /
  * DECIMAL(38,0) arithmetic (HUGEINT on the DuckDB side), never floats,
  * so the hashes are certifiable. */
object EvalQueries {

  type Q = (SparkSession, String) => DataFrame

  private val dec = "decimal(38,0)"

  /** Guarded c·ilog2(c): the 0·log 0 = 0 convention every entropy sum
    * needs (Ilog2 itself requires x ≥ 1). */
  private def xlx(c: Column): Column =
    when(c > 0L, c * Ilog2.ilog2(c)).otherwise(lit(0L))
  private def xlxSql(c: String): String =
    s"CASE WHEN $c > 0 THEN $c * ${Ilog2.sqlReplay(c)} ELSE 0 END"

  // ---- q316: Mann–Whitney U significance test ---------------------------

  /** Two-sample Mann–Whitney U test — do click and view event values come
    * from the same distribution? The q305 tie-averaged rank-sum fold
    * (2R⁺ carried so mid-ranks stay integral) extended with the TIE-
    * CORRECTED variance: σ² = n₁n₂·(n³−n − Σ(t³−t)) / (12n(n−1)), where
    * t ranges over tied-block sizes — on cent-quantized values ties are
    * the common case and the uncorrected variance overstates σ², hiding
    * real effects. Everything stays integral: the fold carries 2U − 2μ
    * and z² is ONE exact DECIMAL(38,0) division to ppm, compared to the
    * χ²(1) 5% critical value (z² ~ χ²(1) under H₀). Scale shapes: one
    * scan reduces to per-(score) counts — the score domain bounds every
    * later stage; the prefix sum is range-partitioned (no global
    * window); the z² algebra tops out near 10³⁴ at 10⁵ scored rows —
    * past ~10⁶ rows, split the division (both engines replay whichever
    * form verbatim). All-tied input → 0 denominator → NULL z² →
    * significant fail-closed false. */
  val q316_mann_whitney: Q = (s, d) => mannWhitney(Tables.events(s, d)
    .where(col("event_type").isin("click", "view"))
    .select(round(col("value") * 100).cast("long").as("score"),
      when(col("event_type") === "click", 1L).otherwise(0L).as("pos")))

  /** Core over the raw (score, pos ∈ {0,1}) relation — the fuzz spec
    * feeds degenerate series through this entry point. */
  def mannWhitney(ev: DataFrame): DataFrame = {
    val perScore = ev.groupBy(col("score"))
      .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
      .withColumn("g", lit(0))
    val cum = RunningTotal.grouped(perScore, "g", Seq("score"), "n_s", "cum_n",
      groupCountHint = Some(1L))
    cum.groupBy(col("g"))
      .agg(sum(col("p_s") * (col("cum_n") * 2 - col("n_s") + 1)).as("two_r_pos"),
        sum(col("p_s")).as("n1"), sum(col("n_s")).as("n"),
        sum(expr(s"cast(n_s as $dec) * n_s * n_s - n_s")).as("ties"))
      .select(
        col("n1").as("n_click"), (col("n") - col("n1")).as("n_view"),
        // 2U = 2R⁺ − n₁(n₁+1)
        (col("two_r_pos") - col("n1") * (col("n1") + 1)).as("u2"),
        expr(s"""cast(
            (cast(two_r_pos - n1 * (n1 + 1) - n1 * (n - n1) as $dec)
             * (two_r_pos - n1 * (n1 + 1) - n1 * (n - n1))
             * 12 * n * (n - 1) * 1000000)
            div nullif(cast(4 as $dec) * n1 * (n - n1)
             * (cast(n as $dec) * n * n - n - ties), 0)
          as bigint)""").as("z2_ppm"))
      .withColumn("significant", coalesce(col("z2_ppm") >= 3841459L, lit(false)))
  }
  val q316_sql: String =
    """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS score,
      |             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
      |           FROM events WHERE event_type IN ('click', 'view')),
      |g AS (SELECT score, count(*)::BIGINT AS n_s, sum(pos)::BIGINT AS p_s
      |      FROM e GROUP BY 1),
      |cm AS (SELECT score, n_s, p_s,
      |         sum(n_s) OVER (ORDER BY score) AS cum_n FROM g),
      |agg AS (SELECT sum(p_s * (2 * cum_n - n_s + 1))::HUGEINT AS two_r_pos,
      |          sum(p_s)::HUGEINT AS n1, sum(n_s)::HUGEINT AS n,
      |          sum(n_s::HUGEINT * n_s * n_s - n_s)::HUGEINT AS ties
      |        FROM cm)
      |SELECT n1::BIGINT AS n_click, (n - n1)::BIGINT AS n_view,
      |  (two_r_pos - n1 * (n1 + 1))::BIGINT AS u2,
      |  (((two_r_pos - n1 * (n1 + 1) - n1 * (n - n1))
      |    * (two_r_pos - n1 * (n1 + 1) - n1 * (n - n1))
      |    * 12 * n * (n - 1) * 1000000)
      |   // nullif(4 * n1 * (n - n1) * (n * n * n - n - ties), 0))::BIGINT
      |    AS z2_ppm,
      |  coalesce((((two_r_pos - n1 * (n1 + 1) - n1 * (n - n1))
      |    * (two_r_pos - n1 * (n1 + 1) - n1 * (n - n1))
      |    * 12 * n * (n - 1) * 1000000)
      |   // nullif(4 * n1 * (n - n1) * (n * n * n - n - ties), 0))
      |    >= 3841459, false) AS significant
      |FROM agg""".stripMargin

  // ---- q317: Simpson's-paradox slope audit ------------------------------

  /** Aggregation-bias audit: does the n_chars ~ ws_tokens regression
    * slope FLIP SIGN between any source and the pooled corpus (Simpson's
    * paradox — the classic trap of fitting quality models on pooled
    * data)? One partial-aggregated pass collects the five sufficient
    * stats per source in DECIMAL(38,0); the pooled stats are the SUM of
    * the per-source frame (|sources|-bounded — no second scan); slopes
    * are exact integral divisions to ppm and the flip test compares
    * NUMERATOR signs (denominators are Cauchy–Schwarz non-negative), so
    * a degenerate single-point source (0/0 slope) reads NULL, not
    * flipped. */
  val q317_simpson_slopes: Q = (s, d) => {
    val doc = Tables.documents(s, d).select(col("source"),
      TextAnalysis.wsTokenCount(col("text")).as("x"),
      col("n_chars").cast("long").as("y"))
    val bySrc = doc.groupBy(col("source")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
      sum(expr(s"cast(x as $dec) * y")).as("sxy"),
      sum(expr(s"cast(x as $dec) * x")).as("sxx"))
      .localCheckpoint(true) // consumers: per-source rows + pooled fold
    val pooled = bySrc.agg(
      sum(col("n")).as("pn"), sum(col("sx")).as("psx"),
      sum(col("sy")).as("psy"), sum(col("sxy")).as("psxy"),
      sum(col("sxx")).as("psxx"))
      .select(
        expr("pn * psxy - psx * psy").as("pool_num"),
        expr("pn * psxx - psx * psx").as("pool_den"))
    bySrc.crossJoin(broadcast(pooled))
      .select(col("source"), expr("cast(n as bigint)").as("n_docs"),
        expr("cast((n * sxy - sx * sy) * 1000000" +
          " div nullif(n * sxx - sx * sx, 0) as bigint)").as("slope_ppm"),
        expr("cast(pool_num * 1000000 div nullif(pool_den, 0) as bigint)")
          .as("pooled_slope_ppm"),
        ((col("pool_num") > 0 && expr("n * sxy - sx * sy") < 0) ||
          (col("pool_num") < 0 && expr("n * sxy - sx * sy") > 0)).as("sign_flip"))
      .orderBy(col("source"))
  }
  val q317_sql: String =
    """WITH t AS (SELECT source,
      |    len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))::HUGEINT AS x,
      |    n_chars::HUGEINT AS y
      |  FROM documents),
      |g AS (SELECT source, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
      |        sum(y)::HUGEINT AS sy, sum(x * y)::HUGEINT AS sxy,
      |        sum(x * x)::HUGEINT AS sxx
      |      FROM t GROUP BY 1),
      |p AS (SELECT sum(n) AS pn, sum(sx) AS psx, sum(sy) AS psy,
      |        sum(sxy) AS psxy, sum(sxx) AS psxx FROM g),
      |pp AS (SELECT pn * psxy - psx * psy AS pool_num,
      |         pn * psxx - psx * psx AS pool_den FROM p)
      |SELECT source, n::BIGINT AS n_docs,
      |  ((n * sxy - sx * sy) * 1000000
      |   // nullif(n * sxx - sx * sx, 0))::BIGINT AS slope_ppm,
      |  (pool_num * 1000000 // nullif(pool_den, 0))::BIGINT AS pooled_slope_ppm,
      |  ((pool_num > 0 AND (n * sxy - sx * sy) < 0)
      |   OR (pool_num < 0 AND (n * sxy - sx * sy) > 0)) AS sign_flip
      |FROM g CROSS JOIN pp ORDER BY source""".stripMargin

  // ---- q318: single change-point (binary segmentation) ------------------

  /** Per-type single change-point on the daily count series — the first
    * binary-segmentation split every drift investigation starts with:
    * argmax over split positions k of |K·S_k − k·S| (the CUSUM deviation
    * scaled by K so it stays integral — dividing by k·(K−k) would leave
    * the rationals). The window runs over the HORIZON-bounded daily
    * frame (|types| × |days| rows — q311's certificate: constant under
    * user replication), partitioned by type, so no corpus-sized sort
    * exists anywhere; k = K never splits and is excluded. Deterministic
    * tie-break: earliest day. */
  val q318_changepoint: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val g = daily
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("x")).over(w))
      .withColumn("kk", count(lit(1)).over(wAll))
      .withColumn("s", sum(col("x")).over(wAll))
      .where(col("k") < col("kk"))
      .withColumn("dev", abs(col("kk") * col("cum") - col("k") * col("s")))
    g.withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type"))
          .orderBy(col("dev").desc, col("day"))))
      .where(col("rn") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("dev").as("g_stat"), col("kk").as("n_days"),
        expr("cum * 1000000 div k").as("left_mean_ppm"),
        expr("(s - cum) * 1000000 div (kk - k)").as("right_mean_ppm"))
      .orderBy(col("event_type"))
  }
  val q318_sql: String =
    """WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x
      |               FROM events GROUP BY 1, 2),
      |w AS (SELECT event_type, day, x,
      |        row_number() OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS k,
      |        sum(x) OVER (PARTITION BY event_type ORDER BY day)::BIGINT AS cum,
      |        count(*) OVER (PARTITION BY event_type)::BIGINT AS kk,
      |        sum(x) OVER (PARTITION BY event_type)::BIGINT AS s
      |      FROM daily),
      |dv AS (SELECT *, abs(kk * cum - k * s)::BIGINT AS dev FROM w
      |       WHERE k < kk)
      |SELECT event_type, day AS split_day, dev AS g_stat, kk AS n_days,
      |       (cum * 1000000 // k)::BIGINT AS left_mean_ppm,
      |       ((s - cum) * 1000000 // (kk - k))::BIGINT AS right_mean_ppm
      |FROM dv
      |QUALIFY row_number() OVER (PARTITION BY event_type
      |                           ORDER BY dev DESC, day ASC) = 1
      |ORDER BY event_type""".stripMargin

  // ---- q319: histogram-based outlier score (HBOS) -----------------------

  /** HBOS outlier scoring of events on two independent features — value
    * (16 equal-width bins, edges derived from the data) and hour-of-day
    * (24 natural bins): score = Σ_f −log₂ p(bin_f) = 2·ilog2(n) −
    * ilog2(c_vbin) − ilog2(c_hbin) in 16-bit fixed point. The
    * histogram-based score is THE shape that scales: exactly three
    * corpus passes — the bin-edge probe (a bounded 1-row collect, the
    * Stats.embeddingDim license, folded into literals so no consumer
    * re-derives it), ONE grouping-sets aggregate producing both
    * histograms (16 + 24 rows, checkpointed — two separate groupBys
    * would pay a fourth pass), and the scoring scan with both
    * histograms broadcast. No per-point neighborhood search, no joins
    * that grow with n. Top 20 by score (rarest bin combination),
    * event_id tie-break. */
  val q319_hbos_outliers: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("event_id").cast("long").as("event_id"),
      round(col("value") * 100).cast("long").as("cents"),
      expr("(unix_millis(ts) div 3600000) % 24").as("hbin"))
    val mm = ev.agg(min(col("cents")), max(col("cents")), count(lit(1))).head()
    val (lo, hi, n) = (mm.getLong(0), mm.getLong(1), mm.getLong(2))
    val binned = ev.select(col("event_id"),
      expr(s"(cents - $lo) * 16 div ${hi - lo + 1}").as("vbin"),
      col("hbin"))
    val hist = binned
      .groupingSets(Seq(Seq(col("vbin")), Seq(col("hbin"))),
        col("vbin"), col("hbin"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // consumers: the two histogram slices
    val vc = hist.where(col("hbin").isNull).select(col("vbin"), col("c").as("c_v"))
    val hc = hist.where(col("vbin").isNull).select(col("hbin"), col("c").as("c_h"))
    binned.join(broadcast(vc), Seq("vbin")).join(broadcast(hc), Seq("hbin"))
      .select(col("event_id"), col("vbin"), col("hbin"),
        (lit(2L * Ilog2.impl(n)) - Ilog2.ilog2(col("c_v"))
          - Ilog2.ilog2(col("c_h"))).as("score_fp"))
      .orderBy(col("score_fp").desc, col("event_id"))
      .limit(20)
  }
  val q319_sql: String = {
    val il = Ilog2.sqlReplay _
    s"""WITH e AS (SELECT event_id::BIGINT AS event_id,
      |             CAST(round(value * 100) AS BIGINT) AS cents,
      |             (epoch_ms(ts) // 3600000) % 24 AS hbin
      |           FROM events),
      |mm AS (SELECT min(cents) AS lo, max(cents) AS hi, count(*)::BIGINT AS n
      |       FROM e),
      |b AS (SELECT event_id, (cents - lo) * 16 // (hi - lo + 1) AS vbin,
      |        hbin, n
      |      FROM e CROSS JOIN mm),
      |vc AS (SELECT vbin, count(*)::BIGINT AS c_v FROM b GROUP BY 1),
      |hc AS (SELECT hbin, count(*)::BIGINT AS c_h FROM b GROUP BY 1)
      |SELECT event_id, vbin, hbin,
      |  (2 * ${il("n")} - ${il("c_v")} - ${il("c_h")})::BIGINT AS score_fp
      |FROM b JOIN vc USING (vbin) JOIN hc USING (hbin)
      |ORDER BY score_fp DESC, event_id LIMIT 20""".stripMargin
  }

  // ---- q320: containment near-subset dedup ------------------------------

  /** CONTAINMENT dedup — the near-dup class resemblance misses: a short
    * doc quoted whole inside a long one has low Jaccard (the union is
    * big) but high one-sided containment |A∩B| / |A|. Candidates come
    * from the staged LSH pipeline ([[DocLsh]] — bucket-bounded, never
    * all-pairs); the exact shingle-intersection verify joins only
    * candidate pairs; per-doc shingle sizes come from the SAME staged
    * shingle frame. Emitted: pairs where either side is ≥ 80% contained,
    * with both containments and the Jaccard for contrast. */
  val q320_containment: Q = (s, d) => {
    val sh = DocLsh.shingles(s, d)
    val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val inter = DocLsh.pairs(s, d)
      .join(sh.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sz.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sz.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sz_a"), col("sz_b"), col("n_inter"),
        expr("n_inter * 1000000 div sz_a").as("cont_a_ppm"),
        expr("n_inter * 1000000 div sz_b").as("cont_b_ppm"),
        expr("n_inter * 1000000 div (sz_a + sz_b - n_inter)").as("jaccard_ppm"))
      .where(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= 800000L)
      .orderBy(col("doc_a"), col("doc_b"))
  }
  val q320_sql: String =
    s"""WITH ${LlmQueries.lshCtes(LlmQueries.LshK, LlmQueries.LshBands)},
      |sz AS (SELECT doc_id, count(*)::BIGINT AS sz FROM sh GROUP BY 1),
      |iv AS (SELECT p.doc_a, p.doc_b, count(*)::BIGINT AS n_inter
      |       FROM pairs p
      |       JOIN sh a ON a.doc_id = p.doc_a
      |       JOIN sh b ON b.doc_id = p.doc_b AND b.shingle = a.shingle
      |       GROUP BY 1, 2),
      |c AS (SELECT iv.doc_a, iv.doc_b, sa.sz AS sz_a, sb.sz AS sz_b, n_inter,
      |        (n_inter * 1000000 // sa.sz)::BIGINT AS cont_a_ppm,
      |        (n_inter * 1000000 // sb.sz)::BIGINT AS cont_b_ppm,
      |        (n_inter * 1000000 // (sa.sz + sb.sz - n_inter))::BIGINT AS jaccard_ppm
      |      FROM iv JOIN sz sa ON sa.doc_id = iv.doc_a
      |              JOIN sz sb ON sb.doc_id = iv.doc_b)
      |SELECT * FROM c WHERE greatest(cont_a_ppm, cont_b_ppm) >= 800000
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- q321: decision-stump information gain ----------------------------

  /** Decision-stump probe: which n_chars threshold best predicts
    * lang = 'en', by information gain in certified fixed point? Docs are
    * binned once (16 equal-width bins, data-derived edges); the 15
    * candidate splits then live entirely on the DENSIFIED 16-row bin
    * frame (missing bins joined in as zeros — a split boundary is valid
    * whether or not its bin is populated), so the scan cost is one pass
    * regardless of the threshold count. IG is scaled by n·2¹⁶ to stay
    * integral: n·H(S) = n·ilog2(n) − Σ_c c·ilog2(c), and IG_fp =
    * n·H(S) − Σ_side n_side·H(side) with the 0·log 0 = 0 guard. The
    * argmax row is flagged rather than returned alone, so the oracle
    * certifies the whole gain curve — deliberately: the fixed-point IG
    * is deterministic and cross-engine exact at any one scale, but NOT
    * scale-equivariant at the ulp level (ilog2(kc) ≠ ilog2(k) +
    * ilog2(c) exactly), so a near-ulp tie between thresholds can
    * reorder `is_best` across corpus scales while the full curve stays
    * certified. SCALESTRESS_r10b pins the two properties that ARE
    * exact: ×k duplication scales every bin count exactly ×k, and the
    * true (real-log) argmax is duplication-invariant. */
  val q321_stump_gain: Q = (s, d) => {
    val doc = Tables.documents(s, d).select(
      col("n_chars").cast("long").as("nc"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
    // bounded 1-row bin-edge probe (Stats.embeddingDim license), folded
    // into literals — a broadcast mm frame would re-derive this scan in
    // every consumer's plan
    val mm = doc.agg(min(col("nc")), max(col("nc"))).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val perBin = doc
      .withColumn("bin", expr(s"(nc - $lo) * 16 div ${hi - lo + 1}"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("c_n"), sum(col("pos")).as("c_p"))
    val dense = s.range(16).select(col("id").as("bin"))
      .join(perBin, Seq("bin"), "left")
      .na.fill(0L, Seq("c_n", "c_p"))
      .localCheckpoint(true) // consumers: prefix frame + totals fold
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = dense // 16 rows: the single-partition window is bounded
      .withColumn("nl", sum(col("c_n")).over(w))
      .withColumn("pl", sum(col("c_p")).over(w))
      .crossJoin(broadcast(dense.agg(
        sum(col("c_n")).as("n"), sum(col("c_p")).as("p"))))
      .where(col("bin") < 15)
    val ig = cum.select(
      (col("bin") + 1).as("threshold_bin"),
      col("nl").as("n_left"), col("pl").as("pos_left"),
      (xlx(col("n")) - xlx(col("p")) - xlx(col("n") - col("p"))
        - (xlx(col("nl")) - xlx(col("pl")) - xlx(col("nl") - col("pl")))
        - (xlx(col("n") - col("nl")) - xlx(col("p") - col("pl"))
          - xlx(col("n") - col("nl") - (col("p") - col("pl")))))
        .as("ig_fp"))
    val igm = ig.select(col("threshold_bin"),
      expr(s"$lo + ${hi - lo + 1} * threshold_bin div 16").as("cut_value"),
      col("n_left"), col("pos_left"), col("ig_fp"))
    igm.withColumn("is_best", row_number().over(
        Window.orderBy(col("ig_fp").desc, col("threshold_bin"))) === 1)
      .orderBy(col("threshold_bin"))
  }
  val q321_sql: String =
    s"""WITH d0 AS (SELECT n_chars::BIGINT AS nc,
      |              CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      |            FROM documents),
      |mm AS (SELECT min(nc) AS lo, max(nc) AS hi FROM d0),
      |pb AS (SELECT (nc - lo) * 16 // (hi - lo + 1) AS bin,
      |         count(*)::BIGINT AS c_n, sum(pos)::BIGINT AS c_p
      |       FROM d0 CROSS JOIN mm GROUP BY 1),
      |dense AS (SELECT i AS bin, coalesce(c_n, 0) AS c_n,
      |            coalesce(c_p, 0) AS c_p
      |          FROM range(16) t(i) LEFT JOIN pb ON pb.bin = t.i),
      |tot AS (SELECT sum(c_n)::BIGINT AS n, sum(c_p)::BIGINT AS p FROM dense),
      |cm AS (SELECT bin, sum(c_n) OVER (ORDER BY bin)::BIGINT AS nl,
      |         sum(c_p) OVER (ORDER BY bin)::BIGINT AS pl
      |       FROM dense),
      |ig AS (SELECT bin + 1 AS threshold_bin, nl AS n_left, pl AS pos_left,
      |    (${xlxSql("n")} - ${xlxSql("p")} - ${xlxSql("(n - p)")}
      |     - (${xlxSql("nl")} - ${xlxSql("pl")} - ${xlxSql("(nl - pl)")})
      |     - (${xlxSql("(n - nl)")} - ${xlxSql("(p - pl)")}
      |        - ${xlxSql("(n - nl - (p - pl))")}))::BIGINT AS ig_fp
      |  FROM cm CROSS JOIN tot WHERE bin < 15)
      |SELECT threshold_bin,
      |  (lo + (hi - lo + 1) * threshold_bin // 16)::BIGINT AS cut_value,
      |  n_left, pos_left, ig_fp,
      |  row_number() OVER (ORDER BY ig_fp DESC, threshold_bin) = 1 AS is_best
      |FROM ig CROSS JOIN mm ORDER BY threshold_bin""".stripMargin

  // ---- q324: dispersion + z-band outlier days (native isqrt) ------------

  /** Per-type dispersion of the daily count series in CERTIFIED integers
    * — the first consumer of the native [[graft.functions.Isqrt]]
    * expression (⌊√x⌋, exact contract r² ≤ x < (r+1)², replayed
    * bit-for-bit by DuckDB): n·σ = isqrt(n·Σx² − S²) needs no floats,
    * so sd, the coefficient of variation, and the 2σ outlier-day band
    * all hash across engines — the same certifiability [[Ilog2]] gives
    * entropy, extended to second moments. Scale shapes: the daily frame
    * is horizon-bounded (q311's certificate), the moment aggregate is
    * map-side combined, and the 2σ day flags come from one broadcast of
    * the |types|-row moment frame back onto it — |x − μ| > 2σ tested as
    * the overflow-safe integer inequality |n·x − S| > 2·isqrt(n·Σx²−S²). */
  val q324_dispersion: Q = (s, d) => {

    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true) // consumers: moment aggregate + z-band scan
    val mom = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .withColumn("nsd", Isqrt.isqrt(col("n") * col("sxx") - col("sx") * col("sx")))
    daily.join(broadcast(mom), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n_days"), first(col("sx")).as("total"),
        first(expr("sx * 1000000 div n")).as("mean_ppm"),
        first(expr("nsd * 1000000 div n")).as("sd_ppm"),
        first(expr("nsd * 1000000 div sx")).as("cv_ppm"),
        sum(when(abs(col("n") * col("x") - col("sx")) > lit(2L) * col("nsd"), 1L)
          .otherwise(0L)).as("n_outlier_days"))
      .orderBy(col("event_type"))
  }
  val q324_sql: String = {
    val nsd = graft.functions.Isqrt.sqlReplay("n * sx2 - sx * sx")
    s"""WITH daily AS (SELECT event_type, epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x
      |               FROM events GROUP BY 1, 2),
      |mom AS (SELECT event_type, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
      |          sum(x * x)::BIGINT AS sx2
      |        FROM daily GROUP BY 1),
      |ms AS (SELECT event_type, n, sx, $nsd AS nsd FROM mom)
      |SELECT d.event_type, n AS n_days, sx AS total,
      |  (sx * 1000000 // n)::BIGINT AS mean_ppm,
      |  (nsd * 1000000 // n)::BIGINT AS sd_ppm,
      |  (nsd * 1000000 // sx)::BIGINT AS cv_ppm,
      |  sum(CASE WHEN abs(n * d.x - sx) > 2 * nsd THEN 1 ELSE 0 END)::BIGINT
      |    AS n_outlier_days
      |FROM daily d JOIN ms USING (event_type)
      |GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY event_type""".stripMargin
  }

  // ---- q325: Wilson lower-bound rate ranking ----------------------------

  /** Rank event types by their high-value rate (value ≥ 100) using the
    * WILSON LOWER BOUND — the small-sample-safe ranking (a 3/3 type must
    * not outrank a 900/1000 one; the raw rate says it does, the lower
    * confidence bound says otherwise). Certified-integer form with
    * z² = 3.841459 (the same 5% constant as q312/q316) and the native
    * [[graft.functions.Isqrt]]:
    * L_ppm = (10⁶(2k·10⁶+Z) − 2·10⁹·isqrt(Z·(k(n−k) div n) + Z² div 4·10⁶))
    *         div (2(n·10⁶+Z)) — one |types|-row frame after a map-side-
    * combined aggregate, every operation BIGINT on both engines (the
    * k(n−k) product bounds the formula at n ≈ 6·10⁹ rows per group;
    * past that, widen the radicand to DECIMAL and seed isqrt from it). */
  val q325_wilson_rank: Q = (s, d) => {

    val Z = 3841459L
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("value") >= 100.0, 1L).otherwise(0L)).as("k"))
      .withColumn("rad",
        expr(s"$Z * ((k * (n - k)) div n) + ${Z * Z / 4000000L}"))
      .withColumn("isq", Isqrt.isqrt(col("rad")))
      .select(col("event_type"), col("n"), col("k"),
        expr("k * 1000000 div n").as("raw_ppm"),
        expr(s"(1000000 * (2 * k * 1000000 + $Z) - 2000000000 * isq)" +
          s" div (2 * (n * 1000000 + $Z))").as("wilson_lb_ppm"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("wilson_lb_ppm").desc, col("event_type"))).cast("long"))
      .orderBy(col("event_type"))
  }
  val q325_sql: String = {
    val Z = 3841459L
    val rad = s"$Z * ((k * (n - k)) // n) + ${Z * Z / 4000000L}"
    s"""WITH a AS (SELECT event_type, count(*)::BIGINT AS n,
      |    sum(CASE WHEN value >= 100 THEN 1 ELSE 0 END)::BIGINT AS k
      |  FROM events GROUP BY 1),
      |w AS (SELECT event_type, n, k, (k * 1000000 // n)::BIGINT AS raw_ppm,
      |    ((1000000 * (2 * k * 1000000 + $Z)
      |      - 2000000000 * ${Isqrt.sqlReplay(rad)})
      |     // (2 * (n * 1000000 + $Z)))::BIGINT AS wilson_lb_ppm
      |  FROM a)
      |SELECT event_type, n, k, raw_ppm, wilson_lb_ppm,
      |  row_number() OVER (ORDER BY wilson_lb_ppm DESC, event_type)::BIGINT
      |    AS rank
      |FROM w ORDER BY event_type""".stripMargin
  }

  // ---- q326: Spearman rank correlation (tie-averaged, exact) ------------

  /** Spearman rank correlation between quantity and extended price per
    * ship month — "does the quantity/price association drift month over
    * month?", the rank-based (outlier-robust) cousin of q317's Pearson
    * slopes. Ranks are TIE-AVERAGED and carried 2-SCALED (2·avg-rank =
    * 2·rank + t − 1 is always integral), so ρ = Pearson-on-ranks reduces
    * to five exact DECIMAL(38,0) sufficient moments and ONE final
    * integral division: ρ²·10⁴ = num²·10⁴ div (denx·deny), sign carried
    * separately (num = n·Σxy − ΣxΣy). Scale shapes: both rank windows
    * are range-partitioned per (ym) group — no global sort; the moments
    * are map-side combinable the instant ranks exist; the readout
    * algebra tops out at 16n⁸·10⁴ per group, safe in DECIMAL(38,0)/
    * HUGEINT to n ≈ 3·10⁴ rows per group (basis points, not ppm, buys
    * the 100× headroom over sf0.1's ~7·10³) — past that, split the
    * division; both engines replay whichever form verbatim. Internal
    * invariant: Σ(2·avg-rank) = n(n+1) exactly, ties or not. */
  /** ρ readout from a (ym, qv, pv) pair frame — factored from q326 so the
    * tie-degenerate property fuzzing (round 11) can drive it with
    * arbitrary frames; q326 is this over the lineitem projection. */
  def spearmanFromPairs(li: DataFrame): DataFrame = {
    val ranked = li
      .withColumn("x", rank().over(
          Window.partitionBy(col("ym")).orderBy(col("qv"))).cast("long") * 2
        + count(lit(1)).over(Window.partitionBy(col("ym"), col("qv"))) - 1)
      .withColumn("y", rank().over(
          Window.partitionBy(col("ym")).orderBy(col("pv"))).cast("long") * 2
        + count(lit(1)).over(Window.partitionBy(col("ym"), col("pv"))) - 1)
    ranked.groupBy(col("ym")).agg(
        count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
        sum(expr(s"cast(x as $dec) * y")).as("sxy"),
        sum(expr(s"cast(x as $dec) * x")).as("sxx"),
        sum(expr(s"cast(y as $dec) * y")).as("syy"))
      .select(col("ym"), expr("cast(n as bigint)").as("n_rows"),
        expr("""cast(
            (case when n * sxy - sx * sy < 0 then -1 else 1 end)
            * ((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
               div nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0))
          as bigint)""").as("rho2_bp_signed"),
        expr("""coalesce(
            (n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
              div nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
            >= 2500, false)""").as("strong"))
      .orderBy(col("ym"))
  }
  val q326_spearman: Q = (s, d) => spearmanFromPairs(
    Tables.lineitem(s, d).select(
      expr("year(l_shipdate) * 100 + month(l_shipdate)").cast("long").as("ym"),
      col("l_quantity").cast("long").as("qv"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("pv")))
  val q326_sql: String =
    """WITH t AS (SELECT (year(l_shipdate) * 100 + month(l_shipdate))::BIGINT AS ym,
      |    l_quantity::BIGINT AS qv,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pv
      |  FROM lineitem),
      |r AS (SELECT ym,
      |    2 * rank() OVER (PARTITION BY ym ORDER BY qv)
      |      + count(*) OVER (PARTITION BY ym, qv) - 1 AS x,
      |    2 * rank() OVER (PARTITION BY ym ORDER BY pv)
      |      + count(*) OVER (PARTITION BY ym, pv) - 1 AS y
      |  FROM t),
      |g AS (SELECT ym, count(*)::HUGEINT AS n,
      |    sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
      |    sum(x::HUGEINT * y)::HUGEINT AS sxy,
      |    sum(x::HUGEINT * x)::HUGEINT AS sxx,
      |    sum(y::HUGEINT * y)::HUGEINT AS syy
      |  FROM r GROUP BY 1)
      |SELECT ym, n::BIGINT AS n_rows,
      |  ((CASE WHEN n * sxy - sx * sy < 0 THEN -1 ELSE 1 END)
      |   * ((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
      |      // nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0)))::BIGINT
      |    AS rho2_bp_signed,
      |  coalesce((n * sxy - sx * sy) * (n * sxy - sx * sy) * 10000
      |      // nullif((n * sxx - sx * sx) * (n * syy - sy * sy), 0)
      |    >= 2500, false) AS strong
      |FROM g ORDER BY ym""".stripMargin

  // ---- q327: Kendall tau-b from a contingency grid ----------------------

  /** Kendall τ-b between quantity and discount per return flag, computed
    * ENTIRELY from the (qty, discount-cent) contingency grid — the shape
    * that makes rank concordance feasible at corpus scale: the naive
    * statistic is all-pairs O(n²), but on DISCRETE ordinals one
    * map-side-combinable pass reduces the corpus to ≤ 50×11 cells per
    * group and concordant/discordant counts become a cell-pair join
    * whose cost depends on the DOMAIN, not the data (550² cell pairs —
    * constant whether n is 10⁵ or 10¹²). C = Σ c₁c₂ over cell pairs
    * strictly increasing in both coordinates, D over strictly opposed;
    * tie terms n₁/n₂ come off the grid margins; τ-b² to ppm is one
    * exact division (numerator (C−D)²·10⁶ ≤ n⁴/4·10⁶ — DECIMAL(38,0)
    * holds to n ≈ 10⁷ per group, then split). The grid is checkpointed
    * once and serves all four consumers (pair join twice + two
    * margins). */
  /** τ-b readout from a (rf, a, b, c) contingency grid — shared by q327
    * (batch grid) and the q333 streaming certification (state-store
    * grid): the grid IS the sufficient statistic, so where it came from
    * cannot change the answer. */
  def kendallFromGrid(grid0: DataFrame): DataFrame = {
    val grid = grid0
      .localCheckpoint(true) // consumers: pair join (both sides) + margins
    val g2 = grid.select(col("rf").as("rf2"), col("a").as("a2"),
      col("b").as("b2"), col("c").as("c2"))
    val cd = grid.join(broadcast(g2),
        col("rf") === col("rf2") && col("a") < col("a2"))
      .groupBy(col("rf")).agg(
        sum(when(col("b") < col("b2"), col("c") * col("c2"))
          .otherwise(0L)).as("concordant"),
        sum(when(col("b") > col("b2"), col("c") * col("c2"))
          .otherwise(0L)).as("discordant"))
    val tot = grid.groupBy(col("rf")).agg(sum(col("c")).as("n"),
      count(lit(1)).as("n_cells"))
    val ta = grid.groupBy(col("rf"), col("a"))
      .agg(sum(col("c")).as("t"))
      .groupBy(col("rf")).agg(sum(expr("t * (t - 1) div 2")).as("tie_a"))
    val tb = grid.groupBy(col("rf"), col("b"))
      .agg(sum(col("c")).as("t"))
      .groupBy(col("rf")).agg(sum(expr("t * (t - 1) div 2")).as("tie_b"))
    // LEFT join: a degenerate group (single distinct `a` — no a<a2 cell
    // pairs, hence no cd row) surfaces with NULL C/D and a NULL τ-b²
    // instead of vanishing — the fail-closed convention q316/q329 use.
    tot.join(cd, Seq("rf"), "left").join(ta, Seq("rf")).join(tb, Seq("rf"))
      .withColumn("n0", expr("n * (n - 1) div 2"))
      .select(col("rf"), col("n"), col("n_cells"), col("concordant"),
        col("discordant"), col("n0"), col("tie_a"), col("tie_b"),
        expr(s"""cast(
            (case when concordant - discordant < 0 then -1 else 1 end)
            * (cast(concordant - discordant as $dec)
               * (concordant - discordant) * 1000000
               div nullif(cast(n0 - tie_a as $dec) * (n0 - tie_b), 0))
          as bigint)""").as("taub2_ppm_signed"))
      .orderBy(col("rf"))
  }
  val q327_kendall_grid: Q = (s, d) => kendallFromGrid(
    Tables.lineitem(s, d).select(
        col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").as("a"),
        expr("cast(round(l_discount * 100) as bigint)").as("b"))
      .groupBy(col("rf"), col("a"), col("b"))
      .agg(count(lit(1)).as("c")))
  val q327_sql: String =
    """WITH grid AS (SELECT l_returnflag AS rf, l_quantity::BIGINT AS a,
      |    CAST(round(l_discount * 100) AS BIGINT) AS b, count(*)::BIGINT AS c
      |  FROM lineitem GROUP BY 1, 2, 3),
      |cd AS (SELECT g1.rf,
      |    sum(CASE WHEN g1.b < g2.b THEN g1.c * g2.c ELSE 0 END)::BIGINT
      |      AS concordant,
      |    sum(CASE WHEN g1.b > g2.b THEN g1.c * g2.c ELSE 0 END)::BIGINT
      |      AS discordant
      |  FROM grid g1 JOIN grid g2 ON g1.rf = g2.rf AND g1.a < g2.a
      |  GROUP BY 1),
      |tot AS (SELECT rf, sum(c)::BIGINT AS n, count(*)::BIGINT AS n_cells
      |        FROM grid GROUP BY 1),
      |ta AS (SELECT rf, sum(t * (t - 1) // 2)::BIGINT AS tie_a
      |       FROM (SELECT rf, a, sum(c)::BIGINT AS t FROM grid GROUP BY 1, 2)
      |       GROUP BY 1),
      |tb AS (SELECT rf, sum(t * (t - 1) // 2)::BIGINT AS tie_b
      |       FROM (SELECT rf, b, sum(c)::BIGINT AS t FROM grid GROUP BY 1, 2)
      |       GROUP BY 1),
      |j AS (SELECT tot.rf, n, n_cells, concordant, discordant,
      |        n * (n - 1) // 2 AS n0, tie_a, tie_b
      |      FROM tot LEFT JOIN cd USING (rf) JOIN ta USING (rf) JOIN tb USING (rf))
      |SELECT rf, n, n_cells, concordant, discordant, n0, tie_a, tie_b,
      |  ((CASE WHEN concordant - discordant < 0 THEN -1 ELSE 1 END)
      |   * ((concordant - discordant)::HUGEINT
      |      * (concordant - discordant) * 1000000
      |      // nullif((n0 - tie_a)::HUGEINT * (n0 - tie_b), 0)))::BIGINT
      |    AS taub2_ppm_signed
      |FROM j ORDER BY rf""".stripMargin

  // ---- q338: Mann–Kendall trend test + Sen's slope -----------------------

  /** Mann–Kendall monotonic-trend test with Sen's slope per event type —
    * the question q318's change-point doesn't answer (is the series
    * DRIFTING, not just split?), asked the nonparametric way: S =
    * Σ_{i<j} sign(x_j − x_i) over the HORIZON-bounded daily frame
    * (|types| × |days| rows — q311's certificate — so the O(d²) pair
    * join is calendar-bounded, never corpus-bounded), tie-corrected
    * variance 18·Var(S) = n(n−1)(2n+5) − Σt(t−1)(2t+5), and the
    * continuity-corrected z² as ONE exact division to ppm against the
    * χ²(1) 5 % gate. Sen's slope is the LOWER MEDIAN of the pairwise
    * slopes (x_j − x_i)·10⁶ div (d_j − d_i) — selection by VALUE at
    * position ⌊(cnt+1)/2⌋, well-defined across engines even under tied
    * slopes; the robust trend magnitude a mean-based fit can't give.
    * All arithmetic ≤ d³·10⁶ per type — BIGINT-safe to d ≈ 10⁴ days
    * (27 years of dailies), DECIMAL(38,0) far beyond. */
  /** Trend readout from a (g, day, x) daily frame — factored from q338
    * for the round-11 tie-degenerate property fuzzing; q338 is this over
    * the events daily rollup. */
  def mannKendall(daily0: DataFrame): DataFrame = {
    val daily = daily0
      .localCheckpoint(true) // consumers: pair join (both sides), ties, n
    val rhs = daily.select(col("g").as("g2"), col("day").as("d2"),
      col("x").as("x2"))
    val pairs = daily.join(broadcast(rhs),
        col("g") === col("g2") && col("day") < col("d2"))
      .select(col("g"),
        when(col("x2") > col("x"), 1L).when(col("x2") < col("x"), -1L)
          .otherwise(0L).as("sgn"),
        expr("(x2 - x) * 1000000 div (d2 - day)").as("slope_ppm"))
      .localCheckpoint(true) // consumers: S fold + median selection
    val sAgg = pairs.groupBy(col("g")).agg(sum(col("sgn")).as("s_stat"),
      count(lit(1)).as("n_pairs"))
    val nAgg = daily.groupBy(col("g")).agg(count(lit(1)).as("n_days"))
    val ties = daily.groupBy(col("g"), col("x")).agg(count(lit(1)).as("t"))
      .groupBy(col("g"))
      .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
    // Sen selection WITHOUT a per-group window: the value at ascending
    // position ⌊(cnt+1)/2⌋ is exactly the smallest slope whose cumulative
    // count reaches half the pair total (2·cum ≥ cnt ⟺ cum ≥ ⌈cnt/2⌉ =
    // (cnt+1) div 2 — cum is integral), i.e. the LOWER WEIGHTED MEDIAN of
    // the per-slope count frame. That frame is |distinct slopes| rows —
    // already corpus-reduced by a map-side-combinable groupBy — and
    // [[graft.operators.WeightedMedian.lower]] ranks it with
    // RunningTotal's range-partitioned prefix sum, so no group's pairs
    // ever funnel through one task (the q338 hardening the round-10
    // verdict asked for; same hash, selection-by-value is unchanged).
    val slopeCounts = pairs.groupBy(col("g"), col("slope_ppm"))
      .agg(count(lit(1)).as("c_s"))
    val sen = graft.operators.WeightedMedian.lower(
        slopeCounts, "g", "slope_ppm", "slope_ppm", "c_s")
      .select(col("g"), col("median").as("sen_slope_ppm"))
    // Start from nAgg (every group has days) and LEFT-join the pair-derived
    // frames: a degenerate single-day group surfaces with NULL S/z²/slope
    // and direction 'none' instead of vanishing (fail-closed, q316/q329
    // convention; ties has nAgg's exact group set, so it stays inner).
    nAgg.join(sAgg, Seq("g"), "left").join(ties, Seq("g"))
      .join(sen, Seq("g"), "left")
      .select(col("g").as("event_type"), col("n_days"), col("s_stat"),
        expr("n_days * (n_days - 1) * (2 * n_days + 5) - tie_term")
          .as("var18"),
        expr(s"""cast(
            cast(greatest(abs(s_stat) - 1, 0) as $dec)
            * greatest(abs(s_stat) - 1, 0) * 18000000
            div nullif(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term,
                       0) as bigint)""").as("z2_ppm"),
        col("sen_slope_ppm"))
      .withColumn("significant",
        coalesce(col("z2_ppm") >= 3841459L, lit(false)))
      .withColumn("direction",
        when(!col("significant"), "none")
          .when(col("s_stat") > 0, "increasing").otherwise("decreasing"))
      .orderBy(col("event_type"))
  }
  val q338_mann_kendall: Q = (s, d) => mannKendall(
    Tables.events(s, d)
      .groupBy(col("event_type").as("g"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x")))
  val q338_sql: String =
    """WITH daily AS (SELECT event_type AS g, epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x
      |               FROM events GROUP BY 1, 2),
      |pairs AS (SELECT a.g,
      |    CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1
      |         ELSE 0 END::BIGINT AS sgn,
      |    ((b.x - a.x) * 1000000 // (b.day - a.day))::BIGINT AS slope_ppm
      |  FROM daily a JOIN daily b ON a.g = b.g AND a.day < b.day),
      |sa AS (SELECT g, sum(sgn)::BIGINT AS s_stat, count(*)::BIGINT
      |         AS n_pairs FROM pairs GROUP BY 1),
      |na AS (SELECT g, count(*)::BIGINT AS n_days FROM daily GROUP BY 1),
      |ts AS (SELECT g, sum(t * (t - 1) * (2 * t + 5))::BIGINT AS tie_term
      |       FROM (SELECT g, x, count(*)::BIGINT AS t FROM daily
      |             GROUP BY 1, 2) GROUP BY 1),
      |sen AS (SELECT g, slope_ppm AS sen_slope_ppm
      |        FROM (SELECT g, slope_ppm,
      |                row_number() OVER (PARTITION BY g
      |                                   ORDER BY slope_ppm) AS rn,
      |                count(*) OVER (PARTITION BY g) AS cnt
      |              FROM pairs)
      |        WHERE rn = (cnt + 1) // 2),
      |j AS (SELECT na.g, n_days, s_stat,
      |        n_days * (n_days - 1) * (2 * n_days + 5) - tie_term AS var18,
      |        (greatest(abs(s_stat) - 1, 0)::HUGEINT
      |         * greatest(abs(s_stat) - 1, 0) * 18000000
      |         // nullif(n_days * (n_days - 1) * (2 * n_days + 5) - tie_term,
      |                   0))::BIGINT AS z2_ppm,
      |        sen_slope_ppm
      |      FROM na LEFT JOIN sa USING (g) JOIN ts USING (g)
      |           LEFT JOIN sen USING (g))
      |SELECT g AS event_type, n_days, s_stat, var18, z2_ppm, sen_slope_ppm,
      |  coalesce(z2_ppm >= 3841459, false) AS significant,
      |  CASE WHEN NOT coalesce(z2_ppm >= 3841459, false) THEN 'none'
      |       WHEN s_stat > 0 THEN 'increasing' ELSE 'decreasing' END
      |    AS direction
      |FROM j ORDER BY event_type""".stripMargin

  // ---- q336: exact 1-D Wasserstein distance ------------------------------

  /** 1-D Wasserstein-1 (earth mover) distance between the click and
    * view value distributions — the drift metric PSI/JSD/KL (q188, the
    * info registry) miss: those compare bin masses pointwise, W₁ also
    * charges for HOW FAR mass moved. On a quantized domain it is EXACT:
    * W₁ = Σ_s |F_A(s) − F_B(s)|·gap(s), cross-multiplied to
    * |cumA·nB − cumB·nA| so no fraction exists until the ONE final
    * division to micro-cents. Scale shapes (q316's architecture): the
    * corpus reduces to the per-score frame in one map-side-combinable
    * pass; the prefix sum is range-partitioned; the gap lookup is a
    * lead() on the SCORE-DOMAIN-bounded frame (the q318/q330 bounded-
    * window license — the window's input is |distinct scores| rows
    * regardless of corpus size). Σ|…|·gap ≤ nA·nB·range needs
    * DECIMAL(38,0)/HUGEINT only for the 10⁶ scaling. */
  val q336_wasserstein: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("click", "view"))
      .select(round(col("value") * 100).cast("long").as("score"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("pos"))
    val perScore = ev.groupBy(col("score"))
      .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
      .withColumn("g", lit(0))
    val cum = RunningTotal.grouped(
        RunningTotal.grouped(perScore, "g", Seq("score"), "n_s", "cum_n",
          groupCountHint = Some(1L)),
        "g", Seq("score"), "p_s", "cum_a", groupCountHint = Some(1L))
      .withColumn("gap", coalesce(lead(col("score"), 1).over(
        Window.partitionBy(col("g")).orderBy(col("score"))) - col("score"),
        lit(0L)))
      .localCheckpoint(true) // consumers: totals probe + weighted fold
    val tot = cum.agg(max(col("cum_n")).as("n"), max(col("cum_a")).as("n_a"))
    cum.crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_click"),
        (first(col("n")) - first(col("n_a"))).as("n_view"),
        sum(expr(s"""cast(abs(cum_a * (n - n_a) - (cum_n - cum_a) * n_a)
            as $dec) * gap""")).as("wsum"))
      .select(col("n_click"), col("n_view"),
        expr(s"""cast((wsum * 1000000)
            div nullif(cast(n_click as $dec) * n_view, 0)
          as bigint)""").as("w1_cents_ppm"))
  }
  val q336_sql: String =
    """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS score,
      |             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
      |           FROM events WHERE event_type IN ('click', 'view')),
      |g AS (SELECT score, count(*)::BIGINT AS n_s, sum(pos)::BIGINT AS p_s
      |      FROM e GROUP BY 1),
      |cm AS (SELECT score, n_s, p_s,
      |         sum(n_s) OVER (ORDER BY score)::BIGINT AS cum_n,
      |         sum(p_s) OVER (ORDER BY score)::BIGINT AS cum_a,
      |         coalesce(lead(score, 1) OVER (ORDER BY score) - score, 0)
      |           AS gap
      |       FROM g),
      |t AS (SELECT max(cum_n) AS n, max(cum_a) AS n_a FROM cm),
      |agg AS (SELECT n_a::BIGINT AS n_click, (n - n_a)::BIGINT AS n_view,
      |          sum(abs(cum_a * (n - n_a) - (cum_n - cum_a) * n_a)::HUGEINT
      |              * gap)::HUGEINT AS wsum
      |        FROM cm CROSS JOIN t GROUP BY 1, 2)
      |SELECT n_click, n_view,
      |  ((wsum * 1000000) // nullif(n_click::HUGEINT * n_view, 0))::BIGINT
      |    AS w1_cents_ppm
      |FROM agg""".stripMargin

  // ---- q337: Bhattacharyya / Hellinger via native Isqrt ------------------

  /** Bhattacharyya coefficient and Hellinger distance between the click
    * and view HOUR-OF-DAY profiles — the bounded-geometry drift metric
    * (BC = Σ√(p_h·q_h), H² = 1 − BC), made cross-engine exact by the
    * native [[graft.functions.Isqrt]] codegen expression: per bin,
    * √(p·q)·10⁶ = isqrt((cA·cB·10¹²) div (nA·nB)) — the radicand is one
    * exact integral division (DECIMAL(38,0)/HUGEINT, ≤ 10¹² by
    * construction since cA ≤ nA, cB ≤ nB), the root replays bit-for-bit
    * in DuckDB via [[graft.functions.Isqrt.sqlReplay]]. Scale shapes:
    * ONE map-side-combinable pass to the 24-bin × 2 profile, then pure
    * bin algebra — the per-bin floors cost < 24 ppm total and are the
    * same floors in both engines. */
  val q337_hellinger: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .where(col("event_type").isin("click", "view"))
      .select(expr("(unix_millis(ts) div 3600000) % 24").as("hbin"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("pos"))
    val bins = ev.groupBy(col("hbin")).agg(
        sum(col("pos")).as("c_a"),
        (count(lit(1)) - sum(col("pos"))).as("c_b"))
      .localCheckpoint(true) // consumers: totals probe + the isqrt fold
    val tot = bins.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    bins.crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_click"), first(col("n_b")).as("n_view"),
        count(lit(1)).as("n_bins"),
        sum(Isqrt.isqrt(expr(s"""cast(
            (cast(c_a as $dec) * c_b * 1000000000000)
            div (cast(n_a as $dec) * n_b) as bigint)"""))).as("bc_ppm"))
      .select(col("n_click"), col("n_view"), col("n_bins"), col("bc_ppm"),
        (lit(1000000L) - col("bc_ppm")).as("h2_ppm"))
  }
  val q337_sql: String = {
    val rad = "((c_a::HUGEINT * c_b * 1000000000000) " +
      "// (n_a::HUGEINT * n_b))::BIGINT"
    s"""WITH e AS (SELECT (epoch_ms(ts) // 3600000) % 24 AS hbin,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE event_type IN ('click', 'view')),
      |b AS (SELECT hbin, sum(pos)::BIGINT AS c_a,
      |        (count(*) - sum(pos))::BIGINT AS c_b
      |      FROM e GROUP BY 1),
      |t AS (SELECT sum(c_a)::BIGINT AS n_a, sum(c_b)::BIGINT AS n_b FROM b),
      |agg AS (SELECT n_a AS n_click, n_b AS n_view,
      |          count(*)::BIGINT AS n_bins,
      |          sum(${graft.functions.Isqrt.sqlReplay(rad)})::BIGINT AS bc_ppm
      |        FROM b CROSS JOIN t GROUP BY 1, 2)
      |SELECT n_click, n_view, n_bins, bc_ppm,
      |  (1000000 - bc_ppm)::BIGINT AS h2_ppm
      |FROM agg""".stripMargin
  }

  // ---- q334: Goodman–Kruskal gamma + Somers' D ---------------------------

  /** The rest of the ordinal-association family, off the SAME grid
    * readout as q327: Goodman–Kruskal γ = (C−D)/(C+D) (ignores ties —
    * the right measure when tied pairs are uninformative) and BOTH
    * Somers' D asymmetries, (C−D)/(n0−n1) predicting discount from
    * quantity and (C−D)/(n0−n2) the reverse — the directional variant
    * an eval pipeline wants when one variable is the model score and
    * the other the label (D_yx is then exactly 2·AUC−1). None needs a
    * square root (unlike τ-b), so each is ONE signed exact division to
    * ppm. Costs nothing beyond q327's domain-bounded grid algebra and
    * inherits its duplication certificate: C, D, n0−n1, n0−n2 all
    * scale exactly k², so every readout is bit-identical at 100×. */
  val q334_ordinal_assoc: Q = (s, d) => kendallFromGrid(
    Tables.lineitem(s, d).select(
        col("l_returnflag").as("rf"),
        col("l_quantity").cast("long").as("a"),
        expr("cast(round(l_discount * 100) as bigint)").as("b"))
      .groupBy(col("rf"), col("a"), col("b"))
      .agg(count(lit(1)).as("c")))
    .select(col("rf"), col("n"), col("concordant"), col("discordant"),
      expr(s"""cast(cast(concordant - discordant as $dec) * 1000000
          div nullif(concordant + discordant, 0) as bigint)""")
        .as("gamma_ppm"),
      expr(s"""cast(cast(concordant - discordant as $dec) * 1000000
          div nullif(n0 - tie_a, 0) as bigint)""").as("somers_yx_ppm"),
      expr(s"""cast(cast(concordant - discordant as $dec) * 1000000
          div nullif(n0 - tie_b, 0) as bigint)""").as("somers_xy_ppm"))
    .orderBy(col("rf"))
  val q334_sql: String =
    """WITH grid AS (SELECT l_returnflag AS rf, l_quantity::BIGINT AS a,
      |    CAST(round(l_discount * 100) AS BIGINT) AS b, count(*)::BIGINT AS c
      |  FROM lineitem GROUP BY 1, 2, 3),
      |cd AS (SELECT g1.rf,
      |    sum(CASE WHEN g1.b < g2.b THEN g1.c * g2.c ELSE 0 END)::BIGINT
      |      AS concordant,
      |    sum(CASE WHEN g1.b > g2.b THEN g1.c * g2.c ELSE 0 END)::BIGINT
      |      AS discordant
      |  FROM grid g1 JOIN grid g2 ON g1.rf = g2.rf AND g1.a < g2.a
      |  GROUP BY 1),
      |tot AS (SELECT rf, sum(c)::BIGINT AS n FROM grid GROUP BY 1),
      |ta AS (SELECT rf, sum(t * (t - 1) // 2)::BIGINT AS tie_a
      |       FROM (SELECT rf, a, sum(c)::BIGINT AS t FROM grid GROUP BY 1, 2)
      |       GROUP BY 1),
      |tb AS (SELECT rf, sum(t * (t - 1) // 2)::BIGINT AS tie_b
      |       FROM (SELECT rf, b, sum(c)::BIGINT AS t FROM grid GROUP BY 1, 2)
      |       GROUP BY 1),
      |j AS (SELECT tot.rf, n, concordant, discordant,
      |        n * (n - 1) // 2 AS n0, tie_a, tie_b
      |      FROM tot LEFT JOIN cd USING (rf) JOIN ta USING (rf) JOIN tb USING (rf))
      |SELECT rf, n, concordant, discordant,
      |  ((concordant - discordant)::HUGEINT * 1000000
      |   // nullif(concordant + discordant, 0))::BIGINT AS gamma_ppm,
      |  ((concordant - discordant)::HUGEINT * 1000000
      |   // nullif(n0 - tie_a, 0))::BIGINT AS somers_yx_ppm,
      |  ((concordant - discordant)::HUGEINT * 1000000
      |   // nullif(n0 - tie_b, 0))::BIGINT AS somers_xy_ppm
      |FROM j ORDER BY rf""".stripMargin


  // ---- q332: Kruskal–Wallis rank ANOVA -----------------------------------

  /** Kruskal–Wallis H across ALL event types at once — q316's two-sample
    * Mann–Whitney generalized to m groups ("do the five types share a
    * value distribution?"), still exact: the corpus reduces to per-
    * (score, type) counts in one map-side-combinable pass; the per-score
    * totals drive the range-partitioned prefix sum (no global rank
    * window anywhere — rank of a score is its cumulative predecessor
    * count, so 2R_j = Σ c_{s,j}·(2·cum_n − n_s + 1) stays integral
    * with tie-averaging built in); H then lives on m rows of grid
    * algebra. Fixed point: R_j²/n_j = (2R_j)²/(4n_j), so H·10⁶ =
    * (12·10⁶·Σ_j term_j) div (N(N+1)) − 3(N+1)·10⁶ with term_j =
    * (2R_j)² div (4n_j) (per-group floor, the q271 fixed-point
    * convention; the 10⁶ multiplies AFTER the per-group division — the
    * premultiplied form's quotient exceeds 2⁶³ at N ≈ 10⁵, caught by
    * the SCALESTRESS_r10c ×100 duplication run; the dropped sub-integer
    * remainder costs < 10⁻² ppm), then the tie correction is ONE more
    * division by (N³−N−Σ(t³−t)) scaled back by (N³−N). Gates on the
    * χ²(4) 5 % critical value 9.487729·10⁶. The readout runs in exact
    * BigInt on the COLLECTED per-group frame — |event types| rows, the
    * q319 bounded-collect license — so no Spark-side quotient ever
    * outgrows a long; the corpus-scaling stages (cell counts, prefix
    * sum) stay distributed and long-safe to N ≈ 10⁹ (two_r ≤ N(N+1),
    * squared in BigInt/HUGEINT only). */
  /** H readout from a (score, g) observation frame — factored from q332
    * for the round-11 tie-degenerate property fuzzing; q332 is this over
    * the events projection. The frame must be non-empty (H is undefined
    * on zero observations and the readout fails fast on the 0/0). */
  def kruskalWallis(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    val sg = ev.groupBy(col("score"), col("g"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // consumers: per-score totals + group fold
    val ps = sg.groupBy(col("score")).agg(sum(col("c")).as("n_s"))
      .withColumn("g0", lit(0))
    val cum = RunningTotal.grouped(ps, "g0", Seq("score"), "n_s", "cum_n",
      groupCountHint = Some(1L))
    val perGroup = graft.io.Bounded.collect(sg
      .join(cum.select(col("score"), col("n_s"), col("cum_n")), Seq("score"))
      .groupBy(col("g"))
      .agg(sum(col("c") * (col("cum_n") * 2 - col("n_s") + 1)).as("two_r"),
        sum(col("c")).as("n_j")),
      maxRows = 64, why = "groups are the event-type domain")
    val tieSum = BigInt(cum.agg(
      sum(expr(s"cast(n_s as $dec) * n_s * n_s - n_s")).as("tie_sum"))
      .head().getDecimal(0).toBigInteger)
    val n = perGroup.map(r => BigInt(r.getAs[Long]("n_j"))).sum
    val rsum = perGroup.map { r =>
      val tr = BigInt(r.getAs[Long]("two_r"))
      tr * tr / (4 * BigInt(r.getAs[Long]("n_j")))
    }.sum
    val h = BigInt(12000000) * rsum / (n * (n + 1)) - 3 * (n + 1) * 1000000
    val n3 = n * n * n - n
    // all-tied input -> 0 denominator -> NULL H' -> fail-closed false
    val hc: Option[Long] =
      if (n3 == tieSum) None else Some((h * n3 / (n3 - tieSum)).toLong)
    import s.implicits._
    Seq((n.toLong, perGroup.length.toLong, tieSum.toLong, h.toLong,
        hc, hc.exists(_ >= 9487729L)))
      .toDF("n", "n_groups", "tie_sum", "h_ppm", "hc_ppm", "significant")
  }
  val q332_kruskal_wallis: Q = (s, d) => kruskalWallis(
    Tables.events(s, d).select(
      expr("cast(round(value * 100) as bigint)").as("score"),
      col("event_type").as("g")))
  val q332_sql: String =
    """WITH e AS (SELECT CAST(round(value * 100) AS BIGINT) AS score,
      |             event_type AS g FROM events),
      |sg AS (SELECT score, g, count(*)::BIGINT AS c FROM e GROUP BY 1, 2),
      |ps AS (SELECT score, sum(c)::BIGINT AS n_s FROM sg GROUP BY 1),
      |cm AS (SELECT score, n_s,
      |         sum(n_s) OVER (ORDER BY score)::BIGINT AS cum_n FROM ps),
      |pg AS (SELECT g,
      |         sum(c * (2 * cum_n - n_s + 1))::HUGEINT AS two_r,
      |         sum(c)::HUGEINT AS n_j
      |       FROM sg JOIN cm USING (score) GROUP BY 1),
      |ts AS (SELECT sum(n_s::HUGEINT * n_s * n_s - n_s)::HUGEINT AS tie_sum
      |       FROM cm),
      |agg AS (SELECT count(*)::BIGINT AS n_groups, sum(n_j)::HUGEINT AS n,
      |          sum(two_r * two_r // (4 * n_j))::HUGEINT AS rsum
      |        FROM pg),
      |h AS (SELECT n::BIGINT AS n, n_groups, ts.tie_sum::BIGINT AS tie_sum,
      |        ((12000000::HUGEINT * rsum) // (n * (n + 1))
      |         - 3 * (n + 1) * 1000000)::BIGINT AS h_ppm
      |      FROM agg CROSS JOIN ts)
      |SELECT n, n_groups, tie_sum,  h_ppm,
      |  ((h_ppm::HUGEINT * (n::HUGEINT * n * n - n))
      |   // nullif(n::HUGEINT * n * n - n - tie_sum, 0))::BIGINT AS hc_ppm,
      |  coalesce(((h_ppm::HUGEINT * (n::HUGEINT * n * n - n))
      |   // nullif(n::HUGEINT * n * n - n - tie_sum, 0)) >= 9487729, false)
      |    AS significant
      |FROM h""".stripMargin

  // ---- q389: robust-z outlier days (median/MAD) --------------------------

  /** Median/MAD robust outlier census per event type — the
    * Iglewicz–Hoaglin modified-z complement to q324's mean/sd z-band:
    * one celebrity day inflates the mean AND the sd, so the moment
    * band can hide the very day that moved it; the median/MAD pair has
    * a 50% breakdown point. Lower medians via the cum-count scan on
    * value-counts frames (the q359 convention, both scans inside
    * calendar-bounded frames), MAD = lower median of |x − med|, flag =
    * 6745·|x − med| > 35000·MAD (modified z > 3.5 with the 0.6745
    * consistency constant, exact integers — flags safe to ~10¹⁵
    * events/day). MAD = 0 (a majority-constant series) fails closed to
    * a NULL outlier count: every deviation is 0 or infinitely many
    * MADs, and the statistic is undefined. */
  def robustZ(daily: DataFrame): DataFrame = {
    def lowerMedian(vals: DataFrame, out: String): DataFrame = vals
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("g")).orderBy(col("x"))))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
      .where(col("cum") >= expr("(n + 1) div 2"))
      .groupBy(col("g")).agg(min(col("x")).as(out))
    val d0 = daily.localCheckpoint(true) // consumers: 2 median scans + flags
    val med = lowerMedian(d0.select(col("g"), col("x")), "med")
    val dev = d0.join(broadcast(med), Seq("g"))
      .withColumn("ad", abs(col("x") - col("med")))
      .localCheckpoint(true) // consumers: MAD scan + flag census
    val mad = lowerMedian(dev.select(col("g"), col("ad").as("x")), "mad")
    dev.join(broadcast(mad), Seq("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_days"), max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum(when(col("ad") * 6745 > col("mad") * 35000, 1L).otherwise(0L))
          .as("flagged"))
      .select(col("g").as("event_type"), col("n_days"), col("med"),
        col("mad"),
        when(col("mad") > 0, col("flagged")).otherwise(lit(null).cast("long"))
          .as("n_outlier_days"))
      .orderBy(col("event_type"))
  }
  val q389_robust_z: Q = (s, d) => robustZ(Tables.events(s, d)
    .groupBy(col("event_type").as("g"),
      expr("unix_millis(ts) div 86400000").as("day"))
    .agg(count(lit(1)).as("x")))
  val q389_sql: String =
    """WITH daily AS (SELECT event_type AS g, epoch_ms(ts) // 86400000 AS day,
      |                 count(*)::BIGINT AS x
      |               FROM events GROUP BY 1, 2),
      |mc AS (SELECT g, x, count(*)::BIGINT AS c FROM daily GROUP BY 1, 2),
      |cum AS (SELECT g, x, sum(c) OVER (PARTITION BY g ORDER BY x)::BIGINT
      |          AS cum, sum(c) OVER (PARTITION BY g)::BIGINT AS n FROM mc),
      |med AS (SELECT g, min(x)::BIGINT AS med FROM cum
      |        WHERE cum >= (n + 1) // 2 GROUP BY 1),
      |dev AS (SELECT daily.g, abs(x - med)::BIGINT AS ad
      |        FROM daily JOIN med ON med.g = daily.g),
      |dc AS (SELECT g, ad, count(*)::BIGINT AS c FROM dev GROUP BY 1, 2),
      |dcum AS (SELECT g, ad, sum(c) OVER (PARTITION BY g ORDER BY ad)
      |           ::BIGINT AS cum, sum(c) OVER (PARTITION BY g)::BIGINT AS n
      |         FROM dc),
      |mad AS (SELECT g, min(ad)::BIGINT AS mad FROM dcum
      |        WHERE cum >= (n + 1) // 2 GROUP BY 1)
      |SELECT dev.g AS event_type, count(*)::BIGINT AS n_days,
      |  max(med)::BIGINT AS med, max(mad)::BIGINT AS mad,
      |  CASE WHEN max(mad) > 0 THEN
      |    sum(CASE WHEN ad * 6745 > mad * 35000 THEN 1 ELSE 0 END)
      |  END::BIGINT AS n_outlier_days
      |FROM dev JOIN med ON med.g = dev.g JOIN mad ON mad.g = dev.g
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  val defs: Map[String, Q] = Map(
    "q389_robust_z" -> q389_robust_z,
    "q338_mann_kendall" -> q338_mann_kendall,
    "q336_wasserstein" -> q336_wasserstein,
    "q337_hellinger" -> q337_hellinger,
    "q334_ordinal_assoc" -> q334_ordinal_assoc,
    "q332_kruskal_wallis" -> q332_kruskal_wallis,
    "q326_spearman" -> q326_spearman,
    "q327_kendall_grid" -> q327_kendall_grid,
    "q325_wilson_rank" -> q325_wilson_rank,
    "q324_dispersion" -> q324_dispersion,
    "q316_mann_whitney" -> q316_mann_whitney,
    "q317_simpson_slopes" -> q317_simpson_slopes,
    "q318_changepoint" -> q318_changepoint,
    "q319_hbos_outliers" -> q319_hbos_outliers,
    "q320_containment" -> q320_containment,
    "q321_stump_gain" -> q321_stump_gain)

  val oracles: Map[String, String] = Map(
    "q389_robust_z" -> q389_sql,
    "q338_mann_kendall" -> q338_sql,
    "q336_wasserstein" -> q336_sql,
    "q337_hellinger" -> q337_sql,
    "q334_ordinal_assoc" -> q334_sql,
    "q332_kruskal_wallis" -> q332_sql,
    "q326_spearman" -> q326_sql,
    "q327_kendall_grid" -> q327_sql,
    "q325_wilson_rank" -> q325_sql,
    "q324_dispersion" -> q324_sql,
    "q316_mann_whitney" -> q316_sql,
    "q317_simpson_slopes" -> q317_sql,
    "q318_changepoint" -> q318_sql,
    "q319_hbos_outliers" -> q319_sql,
    "q320_containment" -> q320_sql,
    "q321_stump_gain" -> q321_sql)
}
