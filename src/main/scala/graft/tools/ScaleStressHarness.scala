package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.{AllPairs, Dedup, NaiveBayes, RandomProjection, SetJoin, TextAnalysis}

/** THE scale-stress tool — one parameterized harness for every 100×
  * disjoint-replica certification, replacing the nine one-off
  * `ScaleStress*` mains that each carried their own copy of the session
  * builder, the stage timer, the replica/stride construction, and the
  * growth-band summary (the round-9 verdict traced a stride fix that had
  * to be applied twice to exactly that duplication).
  *
  * Usage: `runMain graft.tools.ScaleStress <family...> [--sf <dir>]`.
  * Families: `similarity` (SCALESTRESS_r6 — LSH / SimHash / multiprobe /
  * all-pairs / ppjoin candidate growth + graph ops at 100×), `graph`
  * (r8 — common-neighbor shortlist, oriented wedges, dangling PageRank),
  * `text` (r8b — winnowing, weighted MinHash, NB throughput, Ilog2
  * entropy), `info` (r9 — χ² contingency grid, Holt–Winters keys),
  * `ks-textrank` (r9b), `auc-snm` (r9c), `km-ab` (r9d), `vector-curation`
  (r10), `eval` (r10b), `agreement` (r10c), `resampling` (r11),
  * `privacy` (r11b).
  *
  * Methodology (shared by every family): replicas must be DISJOINT —
  * numeric ids shifted by a stride DERIVED FROM THE DATA (`max(id) + 1`;
  * a fixed stride collides once ids reach it and silently merges
  * replicas), text vocabularies suffixed per replica so document
  * frequencies keep their per-replica shape instead of inflating 100×.
  * Exact structural quantities assert the tight [95, 105] band;
  * LSH-family candidate counts are hash-variance-dominated (which docs
  * collide into which band buckets is a per-replica draw, and
  * near-maxBucket buckets contribute O(cap²) pairs or zero depending on
  * which side of the cap the draw lands) and get the [50, 200] band — a
  * broken guard (all-pairs fallback) lands at ~10 000×, far outside
  * either. Each family emits one JSON line per stage and one summary
  * line, byte-compatible with its committed `SCALESTRESS_*.json`
  * artifact.
  */
object ScaleStress {

  private val Reps = 100

  // ------------------------------------------------------ shared harness

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private final class Emitter {
    val out = new StringBuilder
    def line(l: String): Unit = { println(l); out.append(l).append('\n') }
    def stage(name: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val n = f
      line(s"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9},"rows":$n}""")
      n
    }
  }

  /** Disjoint numeric-id replication: `id + r * stride` with the stride
    * derived from the data so replicas stay disjoint at ANY scale factor.
    * `cols` are carried through unchanged. */
  private def strideReplica(spark: SparkSession, df: DataFrame, idCol: String,
                            reps: Int, cols: Seq[String]): DataFrame = {
    val stride = df.agg(max(col(idCol))).collect()(0).getLong(0) + 1L
    df.crossJoin(broadcast(spark.range(reps).select(col("id").as("__r"))))
      .select((col(idCol) + col("__r") * stride).as(idCol) +: cols.map(col): _*)
      .localCheckpoint(true)
  }

  /** Disjoint-vocabulary text replication: ids strided by the base count,
    * every token suffixed `r<replica>` (per-replica document frequencies
    * keep their original values — the shape of a real 100× corpus), and
    * any extra string key columns suffixed the same way. `df` must carry
    * a `rep` column (lit(0) for the baseline). */
  private def tokenReplica(df: DataFrame, baseN: Long,
                           suffixCols: Seq[String]): DataFrame = df.select(
    (col("rep") * baseN + col("doc_id")).as("doc_id") +:
      regexp_replace(col("text"), lit("(\\w+)"),
        concat(lit("$1r"), col("rep"))).as("text") +:
      suffixCols.map(c => concat(col(c), lit("r"), col("rep")).as(c)): _*)

  private def ratio3(x1: Long, x100: Long): Double =
    math.round(1000.0 * x100 / x1) / 1000.0

  // ---------------------------------------------------------- families

  private type Family = (SparkSession, String, Emitter) => Unit

  /** SCALESTRESS_r6: candidate-count growth of the similarity family at
    * 100× disjoint-vocabulary corpus, plus graph/vector ops with no
    * baseline (throughput-shape stages). */
  private val similarity: Family = (spark, sfDir, em) => {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val baseN = base.count()
    val rep0 = tokenReplica(base.withColumn("rep", lit(0L)), baseN, Nil)
      .localCheckpoint(true)
    var big: DataFrame = null
    em.stage("build corpus x100") {
      big = tokenReplica(base.crossJoin(broadcast(
          spark.range(Reps).toDF("rep"))), baseN, Nil)
        .repartition(64).localCheckpoint(true)
      big.count()
    }

    val lsh1 = em.stage("lsh candidates x1")(
      Dedup.dedupNearMinhash(rep0, "text", "doc_id", 8, 4).count())
    val lsh100 = em.stage("lsh candidates x100")(
      Dedup.dedupNearMinhash(big, "text", "doc_id", 8, 4).count())
    // 16-bit bands: 8-bit bands have only 256 keys/band, which saturates
    // every bucket past maxBucket at ~256k docs — 500k docs need ≥ 16
    val sh1 = em.stage("simhash64 pairs x1")(
      Dedup.simhashNearDupPairs(rep0, "text", "doc_id", 64, 16, 3).count())
    val sh100 = em.stage("simhash64 pairs x100")(
      Dedup.simhashNearDupPairs(big, "text", "doc_id", 64, 16, 3).count())
    val mp1 = em.stage("simhash64 multiprobe x1")(
      Dedup.simhashMultiProbePairs(rep0, "text", "doc_id", 64, 16, 7).count())
    val mp100 = em.stage("simhash64 multiprobe x100")(
      Dedup.simhashMultiProbePairs(big, "text", "doc_id", 64, 16, 7).count())
    val ap1 = em.stage("allpairs cosine x1")(
      AllPairs.cosinePairs(rep0, "doc_id", "text", maxDf = 25,
        minCos2Fp = 640000L).count())
    val ap100 = em.stage("allpairs cosine x100")(
      AllPairs.cosinePairs(big, "doc_id", "text", maxDf = 25,
        minCos2Fp = 640000L).count())
    // prefix-filtered exact Jaccard: token remap is a per-replica
    // bijection, so x100 is EXACTLY 100x when candidate gen is linear
    val jp1 = em.stage("jaccard ppjoin x1")(
      SetJoin.jaccardPairs(rep0, "doc_id", "text", 7L, 10L).count())
    val jp100 = em.stage("jaccard ppjoin x100")(
      SetJoin.jaccardPairs(big, "doc_id", "text", 7L, 10L).count())

    em.stage("random projection x100 (500k x 64->16)") {
      val vecs = spark.range(500000L).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id"), j), lit(1000)) - 500).cast("double") / 100.0)
          .as("embedding"))
      RandomProjection.project(vecs, "embedding", "proj", 16, 64)
        .queryExecution.toRdd.count()
    }
    em.stage("pagerank 10M edges, 3 rounds") {
      val edges = spark.range(10000000L)
        .select((col("id") % 500000L).as("src"),
          ((col("id") * 31L + 7L) % 500000L).as("dst"))
      graft.operators.PageRank.ranksFp(edges, "src", "dst", iters = 3)
        .queryExecution.toRdd.count()
    }
    em.stage("kcore peel 10M edges, k=3") {
      val edges = spark.range(10000000L)
        .select((col("id") % 500000L).as("src"),
          ((col("id") * 31L + 7L) % 500000L).as("dst"))
      graft.operators.KCore.peel(edges, "src", "dst", 3, maxRounds = 3)
        .queryExecution.toRdd.count()
    }
    em.stage("knn density 500k vecs, 5k cells") {
      val vecs = spark.range(500000L).select(col("id").as("vec_id"),
        (col("id") % 5000L).as("label"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id"), j), lit(1000)) - 500).cast("float") / 100.0f)
          .as("embedding"))
      graft.llm.Similarity.knnDensity(vecs, 5, "label", dim = 64)
        .queryExecution.toRdd.count()
    }
    em.stage("cc large-star 1M-node chain") {
      val chain = spark.range(999999L)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      graft.operators.ConnectedComponents.componentsStar(chain, "a", "b")
        .queryExecution.toRdd.count()
    }

    def ratio(x100: Long, x1: Long): Double =
      if (x1 == 0) -1.0 else x100.toDouble / x1
    val ratios = Map(
      "lsh" -> ratio(lsh100, lsh1), "simhash64" -> ratio(sh100, sh1),
      "multiprobe" -> ratio(mp100, mp1), "allpairs" -> ratio(ap100, ap1),
      "jaccard" -> ratio(jp100, jp1))
    val pass = ratios.values.forall(r => r >= 50.0 && r <= 200.0)
    em.line(ratios.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }
      .mkString(s"""{"summary":"candidate-count growth at ${Reps}x",""", ",",
        s""","band":[50.0,200.0],"linear":$pass}"""))
  }

  /** SCALESTRESS_r8: graph-family growth — q253's shortlist candidates,
    * q230's oriented wedges, dangling-redistributing PageRank. */
  private val graph: Family = (spark, sfDir, em) => {
    import org.apache.spark.sql.expressions.Window
    val op = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val base = op.as("a").join(op.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").cast("long").as("u"), col("b.p").cast("long").as("v"))
      .distinct()
      .localCheckpoint(true)
    // deterministic 1-in-10 thinning for the deg²-bounded stages
    val thin = base.where((col("u") * 31 + col("v")) % 10 === 0)
      .localCheckpoint(true)
    // one stride for u AND v so edges stay within their replica
    val stride =
      base.agg(greatest(max(col("u")), max(col("v")))).collect()(0).getLong(0) + 1L
    def x100(e: DataFrame): DataFrame = e
      .crossJoin(broadcast(spark.range(Reps).toDF("rep")))
      .select((col("u") + col("rep") * stride).as("u"),
        (col("v") + col("rep") * stride).as("v"))
      .repartition(64).localCheckpoint(true)

    def cnCandidates(e: DataFrame): Long = {
      val adj = e.select(col("u").as("n"), col("v").as("nb"))
        .unionAll(e.select(col("v").as("n"), col("u").as("nb")))
      val deg = adj.groupBy(col("n")).agg(count(lit(1)).as("deg"))
      val pivots = adj.join(
        deg.where(col("deg") <= 500).select(col("n")), Seq("n"), "left_semi")
      val short = pivots.withColumn("rk",
          row_number().over(Window.partitionBy(col("n")).orderBy(col("nb"))))
        .where(col("rk") <= 32).drop("rk")
      short.as("x").join(short.as("y"),
          col("x.n") === col("y.n") && col("x.nb") < col("y.nb"))
        .count()
    }
    def wedges(e: DataFrame): Long =
      graft.operators.Triangles.stats(e, "u", "v")
        .select(col("n_wedges")).head().getLong(0)
    def pagerank(e: DataFrame): Long =
      graft.operators.PageRank.ranksFp(e, "u", "v", iters = 3,
        danglingRedistribute = true).count()

    em.stage("graph build thin x1")(thin.count())
    val thinBig = x100(thin)
    em.stage("graph build thin x100")(thinBig.count())
    val cn1 = em.stage("cn candidates x1")(cnCandidates(thin))
    val cn100 = em.stage("cn candidates x100")(cnCandidates(thinBig))
    val w1 = em.stage("oriented wedges x1")(wedges(thin))
    val w100 = em.stage("oriented wedges x100")(wedges(thinBig))
    val full1 = em.stage("graph build full x1")(base.count())
    val big = x100(base)
    em.stage("graph build full x100")(big.count())
    val pr1 = em.stage("pagerank-dangling x1 (3 iters)")(pagerank(base))
    val pr100 = em.stage(
      s"pagerank-dangling x100 (${full1 * Reps} edges, 3 iters)")(pagerank(big))

    val rs = Map("cn" -> ratio3(cn1, cn100), "wedges" -> ratio3(w1, w100),
      "pagerank_nodes" -> ratio3(pr1, pr100))
    val linear = rs.values.forall(r => r >= 95.0 && r <= 105.0)
    em.line(s"""{"summary":"graph candidate/edge growth at 100x disjoint replicas","cn":${rs("cn")},"wedges":${rs("wedges")},"pagerank_nodes":${rs("pagerank_nodes")},"band":[95.0,105.0],"linear":$linear}""")
  }

  /** SCALESTRESS_r8b: text families — winnowing fingerprints/matches,
    * weighted MinHash candidates, NB classify throughput, Ilog2 entropy. */
  private val text: Family = (spark, sfDir, em) => {
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"))
    val baseN = base.count()
    val rep0 = tokenReplica(base.withColumn("rep", lit(0L)), baseN,
      Seq("source")).localCheckpoint(true)
    var big: DataFrame = null
    em.stage("build corpus x100") {
      big = tokenReplica(base.crossJoin(broadcast(
          spark.range(Reps).toDF("rep"))), baseN, Seq("source"))
        .repartition(64).localCheckpoint(true)
      big.count()
    }

    def winnowFp(df: DataFrame) =
      Dedup.winnowingFingerprints(df, "text", "doc_id", k = 3, w = 4)
        .localCheckpoint(true)
    def matchPairs(fp: DataFrame): Long = {
      val keep = fp.join(
        fp.groupBy(col("h")).agg(count(lit(1)).as("df"))
          .where(col("df") <= 50).select(col("h")), Seq("h"), "left_semi")
      keep.as("a").join(keep.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .where(col("n_shared") >= 2)
        .count()
    }
    val fp1d = winnowFp(rep0)
    val fp1 = em.stage("winnow fingerprints x1")(fp1d.count())
    val fp100d = winnowFp(big)
    val fp100 = em.stage("winnow fingerprints x100")(fp100d.count())
    val wm1 = em.stage("winnow match pairs x1")(matchPairs(fp1d))
    val wm100 = em.stage("winnow match pairs x100")(matchPairs(fp100d))

    def wmhPairs(df: DataFrame): Long = {
      val el = Dedup.weightedShingles(df, "text", "doc_id")
      Dedup.lshCandidatePairs(Dedup.minhashSignatures(el, 8), 4, 2).count()
    }
    val mh1 = em.stage("weighted minhash pairs x1")(wmhPairs(rep0))
    val mh100 = em.stage("weighted minhash pairs x100")(wmhPairs(big))

    em.stage("nb classify x100 (row-local)") {
      val vocab = rep0.select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .groupBy(col("t")).count().orderBy(col("count").desc, col("t")).limit(40)
        .collect().map(_.getString(0)).toSeq
      val labels = Seq("a", "b", "c", "d", "e")
      val weights = vocab.zipWithIndex.map { case (t, i) =>
        t -> labels.indices.map(j => -(((i + j) % 7) + 1).toLong)
      }.toMap
      NaiveBayes.classifyLiteral(big, "text", "doc_id", labels,
          priors = Seq(-1L, -2L, -3L, -4L, -5L), weights = weights)
        .queryExecution.toRdd.count()
    }
    em.stage("ilog2 entropy x100 (2000 sources)") {
      val c = big.select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      c.groupBy(col("source"))
        .agg(sum(col("c")).as("n_tok"),
          sum(col("c") * graft.functions.Ilog2.ilog2(col("c"))).as("s_fp"))
        .count()
    }

    val rs = Map("winnow_fp" -> ratio3(fp1, fp100),
      "winnow_pairs" -> ratio3(wm1, wm100),
      "wminhash" -> ratio3(mh1, mh100))
    val linear = rs("winnow_fp") >= 95.0 && rs("winnow_fp") <= 105.0 &&
      rs("winnow_pairs") >= 95.0 && rs("winnow_pairs") <= 105.0 &&
      rs("wminhash") >= 50.0 && rs("wminhash") <= 200.0
    em.line(s"""{"summary":"round-8 text-family growth at 100x disjoint replicas","winnow_fp":${rs("winnow_fp")},"winnow_pairs":${rs("winnow_pairs")},"winnow_band":[95.0,105.0],"wminhash":${rs("wminhash")},"wminhash_band":[50.0,200.0],"linear":$linear}""")
  }

  /** SCALESTRESS_r9: χ² contingency grid is vocabulary-bounded (disjoint
    * vocab replicas → grid grows exactly 100×) and Holt–Winters scales in
    * the KEY count with O(m + 2) state per key. */
  private val info: Family = (spark, sfDir, em) => {
    val base = Tables.documents(spark, sfDir)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("lang"))
    val baseN = base.count()
    // disjoint vocab per replica; the LABEL space (lang) stays fixed —
    // labels are bounded in reality, vocabulary is not
    def replica(df: DataFrame) = df.select(
      (col("rep") * baseN + col("doc_id")).as("doc_id"),
      regexp_replace(col("text"), lit("(\\w+)"),
        concat(lit("$1r"), col("rep"))).as("text"),
      col("lang"))
    val doc1 = replica(base.withColumn("rep", lit(0L))).localCheckpoint(true)
    var doc100: DataFrame = null
    em.stage("build corpus x100") {
      doc100 = replica(base.crossJoin(broadcast(spark.range(Reps).toDF("rep"))))
        .repartition(64).localCheckpoint(true)
      doc100.count()
    }

    def grid(docs: DataFrame): Long = {
      val dp = docs.select(col("lang"), col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .distinct()
        .localCheckpoint(true)
      val n = docs.agg(count(lit(1)).as("n"))
      val dl = docs.groupBy(col("lang")).agg(count(lit(1)).as("d_l"))
      val cand = dp.groupBy(col("tok")).agg(count(lit(1)).as("d_t"))
        .join(broadcast(n), expr("d_t >= 5") && col("d_t") < col("n"))
      val a = dp.groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("a"))
      broadcast(dl).crossJoin(broadcast(cand))
        .join(a, Seq("lang", "tok"), "left").na.fill(0L, Seq("a"))
        .count()
    }
    val g1 = em.stage("chi2 contingency grid x1")(grid(doc1))
    val g100 = em.stage("chi2 contingency grid x100")(grid(doc100))

    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
      .localCheckpoint(true)
    def hw(keyed: DataFrame): Long =
      graft.operators.Ewma.holtWinters(keyed, "k", "day", "x", m = 7)
        .queryExecution.toRdd.count()
    val k1 = em.stage("holt-winters x1 keys")(
      hw(daily.select(col("event_type").as("k"), col("day"), col("x"))))
    val k100 = em.stage("holt-winters x100 keys") {
      val big = daily.crossJoin(broadcast(spark.range(Reps).toDF("rep")))
        .select(concat(col("event_type"), lit("r"), col("rep")).as("k"),
          col("day"), col("x"))
        .repartition(64).localCheckpoint(true)
      hw(big)
    }

    val gGrowth = g100.toDouble / g1
    val kGrowth = k100.toDouble / k1
    val linear = gGrowth >= 95.0 && gGrowth <= 105.0 &&
      kGrowth >= 95.0 && kGrowth <= 105.0
    em.line(s"""{"summary":"round-9 info-theory/holt-winters growth at 100x disjoint replicas","chi2_grid":${f"$gGrowth%.3f"},"hw_rows":${f"$kGrowth%.3f"},"band":[95.0,105.0],"linear":$linear}""")
  }

  /** SCALESTRESS_r9b: q298's KS statistic scales in the VALUE DOMAIN
    * (disjoint per-replica value ranges → distinct-value frame exactly
    * 100×); q300's TextRank graph is CONTENT-bounded (same token space →
    * vocab and edge set exactly constant under corpus replication). */
  private val ksTextrank: Family = (spark, sfDir, em) => {
    val ev = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "view"))
      .select(col("value"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("ia"),
        when(col("event_type") === "view", 1L).otherwise(0L).as("ib"))
      .localCheckpoint(true)
    def ksRows(e: DataFrame): Long = {
      val pv = e.groupBy(col("value"))
        .agg(sum(col("ia")).as("na"), sum(col("ib")).as("nb"))
        .withColumn("g", lit(0))
      val ca = graft.operators.RunningTotal.grouped(pv, "g", Seq("value"),
        "na", "cum_a", groupCountHint = Some(1L))
      val cb = graft.operators.RunningTotal.grouped(ca, "g", Seq("value"),
        "nb", "cum_b", groupCountHint = Some(1L))
      cb.queryExecution.toRdd.count()
    }
    val v1 = em.stage("ks value frame x1")(ksRows(ev))
    // base values live in [0, 560.21] — the +1000·replica shift keeps
    // per-replica value ranges disjoint
    val big = ev.crossJoin(
        spark.range(Reps).select(col("id").cast("double").as("r")))
      .select((col("value") + col("r") * 1000.0).as("value"),
        col("ia"), col("ib"))
      .localCheckpoint(true)
    val v100 = em.stage(s"ks value frame x$Reps")(ksRows(big))

    val doc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def graphSize(docs: DataFrame): (Long, Long) = {
      val byPos = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("pos"))
      val tk = docs.select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "u")))
      val bg = tk.withColumn("v", lead(col("u"), 1).over(byPos))
        .where(col("v").isNotNull && col("u") =!= col("v"))
        .select(col("u"), col("v"))
        .localCheckpoint(true)
      val vocab = bg.select(col("u").as("tok"))
        .union(bg.select(col("v").as("tok")))
        .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
        .where(col("freq") >= 20L)
        .localCheckpoint(true)
      val nv = vocab.count()
      val ne = bg
        .join(vocab.select(col("tok").as("u")), Seq("u"), "left_semi")
        .join(vocab.select(col("tok").as("v")), Seq("v"), "left_semi")
        .distinct().count()
      (nv, ne)
    }
    var g1: (Long, Long) = (0L, 0L)
    em.stage("textrank graph x1") { g1 = graphSize(doc); g1._1 }
    val docBig = strideReplica(spark, doc, "doc_id", Reps, Seq("text"))
    var g100: (Long, Long) = (0L, 0L)
    em.stage(s"textrank graph x$Reps") { g100 = graphSize(docBig); g100._1 }

    val ksGrowth = v100.toDouble / v1 / Reps * 100.0
    val vocabRatio = g100._1.toDouble / g1._1
    val edgeRatio = g100._2.toDouble / g1._2
    val ok = ksGrowth >= 95.0 && ksGrowth <= 105.0 &&
      vocabRatio == 1.0 && edgeRatio == 1.0
    em.line(s"""{"summary":"round-9b KS value-domain growth + TextRank content-bounded graph at ${Reps}x","ks_values":$ksGrowth,"vocab_ratio":$vocabRatio,"edge_ratio":$edgeRatio,"band":[95.0,105.0],"linear":$ok}""")
  }

  /** SCALESTRESS_r9c: q305's tie-averaged AUC is exactly invariant under
    * k-fold row duplication (the mid-rank +1 terms cancel) and its
    * reduced frame is score-domain-bounded; q309's SNM candidates are
    * positional-(w−1)-linear even with colliding sort keys. */
  private val aucSnm: Family = (spark, sfDir, em) => {
    val doc = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), col("lang"), col("n_chars"))
      .localCheckpoint(true)
    val docBig = strideReplica(spark, doc, "doc_id", Reps,
      Seq("text", "lang", "n_chars"))

    val enPat = TextAnalysis.langProfiles.head._2
    def auc(docs: DataFrame): (Long, Long) = {
      val chars = docs.select(lit("chars_vs_tokens").as("scorer"),
        col("n_chars").as("score"),
        when(TextAnalysis.bpeTokenCount(col("text")) > 56L, 1L)
          .otherwise(0L).as("pos"))
      val stops = docs.select(
          when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
          size(regexp_extract_all(lower(col("text")), lit(enPat), lit(0)))
            .cast("long").as("s_en"),
          TextAnalysis.wsTokenCount(col("text")).as("n_tok"))
        .where(col("n_tok") > 0)
        .select(lit("stopwords_vs_lang").as("scorer"),
          expr("1000000 * s_en div n_tok").as("score"), col("pos"))
      val perScore = chars.unionAll(stops)
        .groupBy(col("scorer"), col("score"))
        .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
        .localCheckpoint(true)
      val cum = graft.operators.RunningTotal.grouped(perScore, "scorer",
        Seq("score"), "n_s", "cum_n", groupCountHint = Some(2L))
      val out = cum.groupBy(col("scorer"))
        .agg(sum(col("p_s") * (col("cum_n") * 2 - col("n_s") + 1))
            .as("two_r_pos"),
          sum(col("p_s")).as("pos"), sum(col("n_s")).as("n_all"))
        .withColumn("auc_ppm", expr(
          "(two_r_pos - pos * (pos + 1)) * 1000000" +
            " div (2 * pos * (n_all - pos))"))
        .orderBy(col("scorer"))
        .select(col("auc_ppm")).collect().map(_.getLong(0))
      (perScore.count(), out(0) * 10000000L + out(1)) // packed pair
    }
    var a1: (Long, Long) = (0L, 0L)
    em.stage("auc reduced frame x1") { a1 = auc(doc); a1._1 }
    var a100: (Long, Long) = (0L, 0L)
    em.stage(s"auc reduced frame x$Reps") { a100 = auc(docBig); a100._1 }

    def snmCands(docs: DataFrame): Long = {
      val keyed = docs.select(col("doc_id"),
        array_join(slice(TextAnalysis.tokens(col("text")), 1, 4), " ")
          .as("sk"))
      graft.operators.SortedNeighborhood.pairs(keyed, "doc_id", col("sk"),
        w = 5).queryExecution.toRdd.count()
    }
    val c1 = em.stage("snm candidates x1")(snmCands(doc))
    val c100 = em.stage(s"snm candidates x$Reps")(snmCands(docBig))

    val frameRatio = a100._1.toDouble / a1._1
    val aucEqual = a1._2 == a100._2
    val candGrowth = c100.toDouble / c1 / Reps * 100.0
    val ok = frameRatio == 1.0 && aucEqual &&
      candGrowth >= 95.0 && candGrowth <= 105.0
    em.line(s"""{"summary":"round-9d AUC scale-invariance + SNM candidate linearity at ${Reps}x","auc_frame_ratio":$frameRatio,"auc_ppm_equal":$aucEqual,"snm_candidates":$candGrowth,"band":[95.0,105.0],"linear":$ok}""")
  }

  /** SCALESTRESS_r9d: q311's Kaplan–Meier day frame is HORIZON-bounded
    * (constant under user replication while risk sets scale exactly);
    * q312's A/B χ² reduces to a constant-size 2×2 with preserved rates. */
  private val kmAb: Family = (spark, sfDir, em) => {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        unix_millis(col("ts")).as("tsm"))
      .localCheckpoint(true)
    val evBig = strideReplica(spark, ev, "user_id", Reps,
      Seq("event_type", "tsm"))

    def kmDayFrame(e: DataFrame): (Long, Long) = {
      val t0 = e.groupBy(col("user_id")).agg(min(col("tsm")).as("t0"))
      val tp = e.where(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("tsm")).as("tp"))
      val horizon = e.agg(max(col("tsm")).as("tmax"))
      val users = t0.join(tp, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .select(
          when(col("tp").isNotNull, lit(1L)).otherwise(0L).as("event"),
          when(col("tp").isNotNull, expr("(tp - t0) div 86400000"))
            .otherwise(expr("(tmax - t0) div 86400000")).as("day"))
      val perDay = users.groupBy(col("day"))
        .agg(count(lit(1)).as("leave_n"), sum(col("event")).as("d"))
        .localCheckpoint(true)
      (perDay.count(),
        perDay.agg(sum(col("leave_n"))).collect()(0).getLong(0))
    }
    var k1: (Long, Long) = (0L, 0L)
    em.stage("km day frame x1") { k1 = kmDayFrame(ev); k1._1 }
    var k100: (Long, Long) = (0L, 0L)
    em.stage(s"km day frame x$Reps") { k100 = kmDayFrame(evBig); k100._1 }

    def abTable(e: DataFrame): (Long, Long, Long) = {
      val conv = e.groupBy(col("user_id"))
        .agg(min(col("tsm")).as("t0"),
          min(when(col("event_type") === "purchase", col("tsm"))).as("tp"))
        .select(col("user_id"),
          when(col("tp").isNotNull && col("tp") - col("t0") < 86400000L, 1L)
            .otherwise(0L).as("conv"))
        .withColumn("in_a",
          expr("substr(md5(cast(user_id as string)), 1, 1) < '8'"))
      val row = conv.agg(count(lit(1)).as("n"),
        sum(col("conv")).as("k"),
        sum(when(col("in_a"), 1L).otherwise(0L)).as("n_a")).collect()(0)
      (row.getLong(0), row.getLong(1), row.getLong(2))
    }
    var a1: (Long, Long, Long) = (0L, 0L, 0L)
    em.stage("ab table x1") { a1 = abTable(ev); a1._1 }
    var a100: (Long, Long, Long) = (0L, 0L, 0L)
    em.stage(s"ab table x$Reps") { a100 = abTable(evBig); a100._1 }

    val dayRatio = k100._1.toDouble / k1._1
    val riskGrowth = k100._2.toDouble / k1._2 / Reps * 100.0
    val usersGrowth = a100._1.toDouble / a1._1 / Reps * 100.0
    // identical replicas -> the population conversion rate is EXACTLY
    // preserved (same numerator/denominator scale factor)
    val rateExact = a100._2 == a1._2 * Reps
    val ok = dayRatio == 1.0 && riskGrowth == 100.0 &&
      usersGrowth == 100.0 && rateExact
    em.line(s"""{"summary":"round-9d KM horizon-bounded day frame + A/B constant 2x2 at ${Reps}x","km_day_frame_ratio":$dayRatio,"km_population":$riskGrowth,"ab_users":$usersGrowth,"ab_rate_exact":$rateExact,"band":[95.0,105.0],"linear":$ok}""")
  }

  /** The original dev throughput probe (no committed artifact): dedup +
    * curation operators over a 20× disjoint-vocabulary corpus, and the
    * vector path (IVF fit/assign/topK, PQ encode/decode) over 50×
    * replicated embeddings — every stage must stay a narrow map or a
    * bucket-bounded join, wall-clock ~linear in corpus size. */
  private val vectorCuration: Family = (spark, sfDir, em) => {
    import graft.llm.Curation
    import graft.operators.RunningTotal
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"),
        col("source"))
    val baseN = base.count()
    val doc = tokenReplica(base.crossJoin(broadcast(
        spark.range(20).toDF("rep"))), baseN, Seq("source"))
      .repartition(64).localCheckpoint(true)
    em.stage("docs x20")(doc.count())
    em.stage("exact dedup")(Dedup.dedupExact(doc, "text", "doc_id").count())
    em.stage("lsh candidates")(
      Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4).count())
    em.stage("simhash neardup")(
      Dedup.simhashNearDupPairs(doc, "text", "doc_id", 32, 8, 3).count())
    em.stage("tfidf top3")(TextAnalysis.tfIdfTopK(doc, 3)
      .queryExecution.toRdd.count())
    em.stage("editdist verify") {
      // q91's shape: levenshtein ONLY over bucket-colocated candidates on
      // bounded prefixes — must stay linear-ish as the corpus grows
      val pairs = Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4)
      val pref = doc.select(col("doc_id"), substring(col("text"), 1, 200).as("p"))
      pairs
        .join(pref.select(col("doc_id").as("doc_a"), col("p").as("pa")), Seq("doc_a"))
        .join(pref.select(col("doc_id").as("doc_b"), col("p").as("pb")), Seq("doc_b"))
        .where(levenshtein(col("pa"), col("pb")) <= 100).count()
    }
    em.stage("repetition stats")(Curation.repetitionStats(doc, "text", "doc_id")
      .queryExecution.toRdd.count())
    em.stage("span dedup")(Curation.dedupSpans(doc, "text", "doc_id", 10)
      .queryExecution.toRdd.count())
    em.stage("contamination")(Curation.contamination(doc, "text", "doc_id",
      col("doc_id") % 997 === 0, 4).queryExecution.toRdd.count())
    em.stage("sequence packing")(
      Curation.packStats(doc, "text", "doc_id", "source", 512)
        .queryExecution.toRdd.count())
    em.stage("runningTotal 1M/1k-groups") {
      val df = spark.range(1000000L)
        .select((col("id") % 1000).as("g"), col("id").as("ord"), lit(1L).as("v"))
      RunningTotal.grouped(df, "g", "ord", "v", "cum")
        .queryExecution.toRdd.count()
    }

    // vector path at 50×: IVF assignment (broadcast packed centroids +
    // native NearestCell) and PQ encode must stay narrow maps.
    val embBase = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dim = embBase.selectExpr("size(embedding)").head().getInt(0)
    val embN = embBase.count()
    // id = rep*baseN + vec_id keeps the first baseN ids DISTINCT vectors,
    // so k-means' smallest-id seeding picks k different centroids
    val big = embBase.crossJoin(broadcast(spark.range(50).toDF("rep")))
      .select((col("rep") * embN + col("vec_id")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    em.stage("vectors x50")(big.count())
    val cents = graft.llm.Ivf.fit(big, 32, 0, dim).localCheckpoint(true)
    em.stage("ivf assign")(graft.llm.Ivf.assign(big, cents, dim)
      .queryExecution.toRdd.count())
    em.stage("ivf fit (k=32, 2 Lloyd)")(graft.llm.Ivf.fit(big, 32, 2, dim).count())
    em.stage("ivf topk (5 queries)")(graft.llm.Ivf.topK(
      big.where(col("vec_id") < 5), big, cents, 10, 2, dim).count())
    val cb = graft.llm.Pq.codebooks(big, 4, 16, dim).localCheckpoint(true)
    em.stage("pq encode")(graft.llm.Pq.encode(big, cb, 4, dim)
      .queryExecution.toRdd.count())
    em.stage("pq decode")(graft.llm.Pq.decode(
      graft.llm.Pq.encode(big, cb, 4, dim), cb, 4, dim)
      .queryExecution.toRdd.count())
    em.stage("cooccurrence x20 docs")(graft.llm.Cooccurrence.pairs(
      doc, "text", "doc_id", window = 3, minCount = 5L)
      .queryExecution.toRdd.count())
    em.stage("shardAssign 1M rows") {
      val ids = spark.range(1000000L).select(col("id"))
      graft.llm.Sampling.shardAssign(ids, "id", 1024)
        .queryExecution.toRdd.count()
    }
    em.line(s"""{"summary":"dev throughput probe (x20 corpus / x50 vectors) — no growth assertion, stage timings only"}""")
  }

  /** SCALESTRESS_r10b: the round-10 eval registry's scale invariances
    * under 100× exact row DUPLICATION (not disjoint replicas — these
    * statistics must be duplication-stable to mean anything at 100 TB):
    * q316's per-score frame is score-domain-bounded and 2U scales
    * EXACTLY k² (every concordant pair replicates k×k ways); q318's
    * daily frame is horizon-bounded, the chosen split day is identical
    * and the CUSUM deviation scales exactly k (counts scale, positions
    * don't); q321's best threshold is duplication-stable with IG_fp
    * scaling ~k (exact up to ilog2 truncation ulps, band-checked). */
  private val evalStats: Family = (spark, sfDir, em) => {
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)

    // ---- q316 Mann-Whitney: score-domain frame + exact k^2 U ----------
    val mwBase = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "view"))
      .select(round(col("value") * 100).cast("long").as("score"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("pos"))
      .localCheckpoint(true)
    def mw(e: DataFrame): (Long, Long) = {
      val perScore = e.groupBy(col("score"))
        .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
        .withColumn("g", lit(0))
      val cum = graft.operators.RunningTotal.grouped(perScore, "g",
        Seq("score"), "n_s", "cum_n", groupCountHint = Some(1L))
        .localCheckpoint(true)
      val r = cum.agg(
        sum(col("p_s") * (col("cum_n") * 2 - col("n_s") + 1)).as("two_r_pos"),
        sum(col("p_s")).as("n1")).head()
      (cum.count(), r.getLong(0) - r.getLong(1) * (r.getLong(1) + 1))
    }
    var m1: (Long, Long) = (0L, 0L)
    em.stage("mw score frame x1") { m1 = mw(mwBase); m1._1 }
    var m100: (Long, Long) = (0L, 0L)
    em.stage(s"mw score frame x$Reps") { m100 = mw(dup(mwBase)); m100._1 }

    // ---- q318 change-point: horizon-bounded frame + stable split ------
    val evTs = Tables.events(spark, sfDir)
      .select(col("event_type"), expr("unix_millis(ts) div 86400000").as("day"))
      .localCheckpoint(true)
    def cp(e: DataFrame): (Long, Map[String, (Long, Long)]) = {
      import org.apache.spark.sql.expressions.Window
      val daily = e.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x")).localCheckpoint(true)
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wAll = Window.partitionBy(col("event_type"))
      val best = daily
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("cum", sum(col("x")).over(w))
        .withColumn("kk", count(lit(1)).over(wAll))
        .withColumn("s", sum(col("x")).over(wAll))
        .where(col("k") < col("kk"))
        .withColumn("dev", abs(col("kk") * col("cum") - col("k") * col("s")))
        .withColumn("rn", row_number().over(Window
          .partitionBy(col("event_type")).orderBy(col("dev").desc, col("day"))))
        .where(col("rn") === 1)
        .select(col("event_type"), col("day"), col("dev"))
        .collect() // |types| rows — bounded
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      (daily.count(), best)
    }
    var c1: (Long, Map[String, (Long, Long)]) = (0L, Map.empty)
    em.stage("changepoint day frame x1") { c1 = cp(evTs); c1._1 }
    var c100: (Long, Map[String, (Long, Long)]) = (0L, Map.empty)
    em.stage(s"changepoint day frame x$Reps") { c100 = cp(dup(evTs)); c100._1 }

    // ---- q321 stump: exact x100 bin counts + stable true argmax -------
    // The 16-bit fixed-point IG is deterministic and cross-engine exact
    // (what q321 certifies) but NOT scale-equivariant at the ulp level:
    // ilog2(100c) != ilog2(100) + ilog2(c) exactly, so a near-ulp tie
    // between thresholds can reorder under duplication. The scale
    // certificate therefore checks the two things that ARE exact: the
    // bin frame (the only corpus-scaling stage) duplicates to exactly
    // 100x per-bin counts, and the TRUE (real-log) gain argmax — which
    // is duplication-invariant by IG(kc) = k*IG(c) — is identical.
    val docBase = Tables.documents(spark, sfDir).select(
      col("n_chars").cast("long").as("nc"),
      when(col("lang") === "en", 1L).otherwise(0L).as("pos"))
      .localCheckpoint(true)
    def stump(docs: DataFrame): (Seq[(Long, Long)], Int) = {
      val mm = docs.agg(min(col("nc")), max(col("nc"))).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val bins = docs
        .withColumn("bin", expr(s"(nc - $lo) * 16 div ${hi - lo + 1}"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("c_n"), sum(col("pos")).as("c_p"))
        .orderBy(col("bin"))
        .collect() // 16 rows — bounded
        .map(r => (r.getLong(1), r.getLong(2))).toSeq
      def h(p: Long, n: Long): Double =
        if (p <= 0 || p >= n) 0.0
        else { val q = p.toDouble / n
          -(q * math.log(q) + (1 - q) * math.log(1 - q)) }
      val (tn, tp) = (bins.map(_._1).sum, bins.map(_._2).sum)
      val igs = (1 until bins.size).map { i =>
        val (nl, pl) = (bins.take(i).map(_._1).sum, bins.take(i).map(_._2).sum)
        tn * h(tp, tn) - nl * h(pl, math.max(nl, 1)) -
          (tn - nl) * h(tp - pl, math.max(tn - nl, 1))
      }
      (bins, igs.zipWithIndex.maxBy { case (g, i) => (g, -i) }._2 + 1)
    }
    var s1: (Seq[(Long, Long)], Int) = (Nil, 0)
    em.stage("stump bin frame x1") { s1 = stump(docBase); s1._1.size.toLong }
    var s100: (Seq[(Long, Long)], Int) = (Nil, 0)
    em.stage(s"stump bin frame x$Reps") { s100 = stump(dup(docBase)); s100._1.size.toLong }

    val mwFrameRatio = m100._1.toDouble / m1._1
    val mwU2Exact = m100._2 == m1._2 * Reps.toLong * Reps
    val cpFrameRatio = c100._1.toDouble / c1._1
    val cpSplitEqual = c1._2.keySet == c100._2.keySet &&
      c1._2.forall { case (t, (day, _)) => c100._2(t)._1 == day }
    val cpDevExact = c1._2.forall { case (t, (_, dev)) =>
      c100._2(t)._2 == dev * Reps }
    val stumpCountsExact = s1._1.size == s100._1.size &&
      s1._1.zip(s100._1).forall { case ((n1, p1), (n2, p2)) =>
        n2 == n1 * Reps && p2 == p1 * Reps }
    val stumpBestEqual = s1._2 == s100._2
    val ok = mwFrameRatio == 1.0 && mwU2Exact && cpFrameRatio == 1.0 &&
      cpSplitEqual && cpDevExact && stumpCountsExact && stumpBestEqual
    em.line(s"""{"summary":"round-10 eval-stat invariances at ${Reps}x duplication","mw_frame_ratio":$mwFrameRatio,"mw_u2_k2_exact":$mwU2Exact,"cp_frame_ratio":$cpFrameRatio,"cp_split_equal":$cpSplitEqual,"cp_dev_k_exact":$cpDevExact,"stump_counts_k_exact":$stumpCountsExact,"stump_true_argmax_equal":$stumpBestEqual,"band":[95.0,105.0],"linear":$ok}""")
  }

  /** SCALESTRESS_r10c: the q326–q333 rank-correlation / agreement batch
    * under 100× exact row DUPLICATION. The strong claims are BIT-
    * IDENTITY, provable because each statistic is an exact RATIONAL of
    * its counts and every count scales k or k² under duplication:
    * Spearman's ρ² (tie-averaged ranks transform affinely, 2r′ = 2kr −
    * (k−1), and Pearson is affine-invariant in exact rationals — checked
    * as a BigInt cross-multiplied identity on the collected moments, so
    * no DECIMAL(38,0) ceiling applies at ANY n), Kendall's τ-b ((C, D,
    * n0−n1, n0−n2) all scale exactly k²), Cohen's κ/κ_w and both
    * McNemar accuracies (k²/k² and k/k). The test STATISTICS that
    * should grow with evidence — McNemar's χ², Kruskal–Wallis H′ —
    * are band-checked at k× (a significance test that did NOT scale
    * with n would be broken); the q330 observed statistic scales
    * exactly k². The ×100 Spearman stage ranks 60 M rows through both
    * per-group windows — the real corpus-scaling cost of rank
    * statistics (range-partitioned by month, never a global sort). */
  private val agreement: Family = (spark, sfDir, em) => {
    val dec = "decimal(38,0)"
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    def big(r: org.apache.spark.sql.Row, i: Int): BigInt =
      BigInt(r.getDecimal(i).toBigInteger)

    // ---- q326 Spearman: rho^2 rational identity at full sf0.1 ---------
    val liBase = Tables.lineitem(spark, sfDir).select(
      expr("year(l_shipdate) * 100 + month(l_shipdate)").cast("long").as("ym"),
      col("l_quantity").cast("long").as("qv"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("pv"))
      .localCheckpoint(true)
    def spearman(li: DataFrame): Map[Long, (Int, BigInt, BigInt)] = {
      import org.apache.spark.sql.expressions.Window
      li.withColumn("x", rank().over(
            Window.partitionBy(col("ym")).orderBy(col("qv"))).cast("long") * 2
          + count(lit(1)).over(Window.partitionBy(col("ym"), col("qv"))) - 1)
        .withColumn("y", rank().over(
            Window.partitionBy(col("ym")).orderBy(col("pv"))).cast("long") * 2
          + count(lit(1)).over(Window.partitionBy(col("ym"), col("pv"))) - 1)
        .groupBy(col("ym")).agg(
          count(lit(1)).cast(dec).as("n"),
          sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
          sum(expr(s"cast(x as $dec) * y")).as("sxy"),
          sum(expr(s"cast(x as $dec) * x")).as("sxx"),
          sum(expr(s"cast(y as $dec) * y")).as("syy"))
        .collect() // |months| rows — bounded
        .map { r =>
          val Seq(n, sx, sy, sxy, sxx, syy) = (1 to 6).map(big(r, _))
          val num = n * sxy - sx * sy
          (r.getLong(0), (num.signum, num * num,
            (n * sxx - sx * sx) * (n * syy - sy * sy)))
        }.toMap
    }
    var sp1: Map[Long, (Int, BigInt, BigInt)] = Map.empty
    em.stage("spearman rank moments x1") { sp1 = spearman(liBase); sp1.size.toLong }
    var sp100: Map[Long, (Int, BigInt, BigInt)] = Map.empty
    em.stage(s"spearman rank moments x$Reps") {
      sp100 = spearman(dup(liBase)); sp100.size.toLong }
    // rho^2 rational identity: num1^2 * den100 == num100^2 * den1
    val spExact = sp1.keySet == sp100.keySet && sp1.forall { case (ym, (s1, n1, d1)) =>
      val (s2, n2, d2) = sp100(ym); s1 == s2 && n1 * d2 == n2 * d1 }

    // ---- q327 Kendall: grid cells exact k, tau-b^2 div bit-identical ---
    val kenBase = Tables.lineitem(spark, sfDir).select(
      col("l_returnflag").as("rf"), col("l_quantity").cast("long").as("a"),
      expr("cast(round(l_discount * 100) as bigint)").as("b"))
      .localCheckpoint(true)
    def kgrid(li: DataFrame): Map[(String, Long, Long), Long] =
      li.groupBy(col("rf"), col("a"), col("b")).agg(count(lit(1)).as("c"))
        .collect() // domain-bounded cells
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
        .toMap
    def taub2(grid: Map[(String, Long, Long), Long]): Map[String, (Int, BigInt)] =
      grid.keys.map(_._1).toSeq.distinct.map { rf =>
        val cells = grid.collect { case ((f, a, b), c) if f == rf => (a, b, BigInt(c)) }.toSeq
        var (cc, dd) = (BigInt(0), BigInt(0))
        for ((a1, b1, c1) <- cells; (a2, b2, c2) <- cells if a1 < a2) {
          if (b1 < b2) cc += c1 * c2 else if (b1 > b2) dd += c1 * c2 }
        val n = cells.map(_._3).sum
        val n0 = n * (n - 1) / 2
        val ta = cells.groupBy(_._1).values.map(_.map(_._3).sum)
          .map(t => t * (t - 1) / 2).sum
        val tb = cells.groupBy(_._2).values.map(_.map(_._3).sum)
          .map(t => t * (t - 1) / 2).sum
        rf -> (((cc - dd).signum,
          (cc - dd) * (cc - dd) * 1000000 / ((n0 - ta) * (n0 - tb))))
      }.toMap
    var kg1: Map[(String, Long, Long), Long] = Map.empty
    em.stage("kendall grid x1") { kg1 = kgrid(kenBase); kg1.size.toLong }
    var kg100: Map[(String, Long, Long), Long] = Map.empty
    em.stage(s"kendall grid x$Reps") { kg100 = kgrid(dup(kenBase)); kg100.size.toLong }
    val kenCellsExact = kg1.keySet == kg100.keySet &&
      kg1.forall { case (k, c) => kg100(k) == c * Reps }
    val t1 = taub2(kg1); val t100 = taub2(kg100)
    val kenTaubIdentical = t1 == t100

    // ---- q328/q329 kappa + McNemar: ppm bit-identity / k-scaling ------
    val docBase = Tables.documents(spark, sfDir).select(
      when(col("n_chars") < 200, 0L).when(col("n_chars") < 350, 1L)
        .otherwise(2L).as("ann_a"),
      when(TextAnalysis.wsTokenCount(col("text")) < 40, 0L)
        .when(TextAnalysis.wsTokenCount(col("text")) < 70, 1L)
        .otherwise(2L).as("ann_b"),
      (col("lang") === "en").as("truth"),
      col("text").contains(" the ").as("pred_a"),
      (!(col("text").contains(" de ") || col("text").contains(" la ") ||
         col("text").contains(" und ") || col("text").contains(" el ") ||
         col("text").contains(" et "))).as("pred_b"))
      .localCheckpoint(true)
    def kappaPpms(docs: DataFrame): (BigInt, BigInt, BigInt, BigInt) = {
      val conf = docs.groupBy(col("ann_a"), col("ann_b")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> BigInt(r.getLong(2))).toMap
      val n = conf.values.sum
      val agree = conf.collect { case ((a, b), c) if a == b => c }.sum
      val rk = conf.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val ck = conf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val chance = rk.keys.map(k => rk(k) * ck.getOrElse(k, BigInt(0))).sum
      val wObs = conf.map { case ((a, b), c) => BigInt((a - b).abs) * c }.sum
      val wCh = (for ((a, r) <- rk; (b, c) <- ck)
        yield BigInt((a - b).abs) * r * c).sum
      (agree * 1000000 / n, chance * 1000000 / (n * n),
        (n * agree - chance) * 1000000 / (n * n - chance),
        (wCh - n * wObs) * 1000000 / wCh)
    }
    def mcnemar(docs: DataFrame): (Long, Long) = {
      val r = docs.agg(
        sum(when(col("pred_a") === col("truth") &&
          col("pred_b") =!= col("truth"), 1L).otherwise(0L)).as("b"),
        sum(when(col("pred_a") =!= col("truth") &&
          col("pred_b") === col("truth"), 1L).otherwise(0L)).as("c")).head()
      (r.getLong(0), r.getLong(1))
    }
    var kp1: (BigInt, BigInt, BigInt, BigInt) = null
    em.stage("kappa confusion x1") { kp1 = kappaPpms(docBase); 9L }
    var kp100: (BigInt, BigInt, BigInt, BigInt) = null
    em.stage(s"kappa confusion x$Reps") { kp100 = kappaPpms(dup(docBase)); 9L }
    val kappaIdentical = kp1 == kp100
    var mc1: (Long, Long) = (0L, 0L)
    em.stage("mcnemar counts x1") { mc1 = mcnemar(docBase); 2L }
    var mc100: (Long, Long) = (0L, 0L)
    em.stage(s"mcnemar counts x$Reps") { mc100 = mcnemar(dup(docBase)); 2L }
    val mcCountsExact = mc100._1 == mc1._1 * Reps && mc100._2 == mc1._2 * Reps
    def mcStat(b: Long, c: Long): BigInt = {
      val d = BigInt(((b - c).abs - 1L).max(0L)); d * d * 1000000 / (b + c) }
    val mcStatRatio = if (mc1._1 + mc1._2 == 0) -1.0
      else (BigDecimal(mcStat(mc100._1, mc100._2)) /
        BigDecimal(mcStat(mc1._1, mc1._2) * Reps)).toDouble

    // ---- q331 Cramér's V: v2 stable, chi2 scales k ---------------------
    val ordBase = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority").as("pr"), col("o_orderstatus").as("st"))
      .localCheckpoint(true)
    def cramers(o: DataFrame): (BigInt, BigInt) = {
      val grid = o.groupBy(col("pr"), col("st")).count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> BigInt(r.getLong(2))).toMap
      val rk = grid.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
      val ck = grid.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val n = grid.values.sum
      val chi2 = (for ((pr, r) <- rk; (st, c) <- ck) yield {
        val o0 = grid.getOrElse((pr, st), BigInt(0))
        (n * o0 - r * c) * (n * o0 - r * c) * 1000000 / (n * r * c)
      }).sum
      (chi2, chi2 / (n * (BigInt(rk.size.min(ck.size)) - 1)))
    }
    var cr1: (BigInt, BigInt) = null
    em.stage("cramers grid x1") { cr1 = cramers(ordBase); 15L }
    var cr100: (BigInt, BigInt) = null
    em.stage(s"cramers grid x$Reps") { cr100 = cramers(dup(ordBase)); 15L }
    val crV2Delta = (cr100._2 - cr1._2).abs.toLong
    val crChi2Ratio = (BigDecimal(cr100._1) / BigDecimal(cr1._1 * Reps)).toDouble

    // ---- q332 Kruskal-Wallis: H' scales ~k (evidence grows) ------------
    val evBase = Tables.events(spark, sfDir).select(
      expr("cast(round(value * 100) as bigint)").as("score"),
      col("event_type").as("g")).localCheckpoint(true)
    def kruskal(e: DataFrame): Long = {
      val sg = e.groupBy(col("score"), col("g")).agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val ps = sg.groupBy(col("score")).agg(sum(col("c")).as("n_s"))
        .withColumn("g0", lit(0))
      val cum = graft.operators.RunningTotal.grouped(ps, "g0", Seq("score"),
        "n_s", "cum_n", groupCountHint = Some(1L)).localCheckpoint(true)
      val pg = sg.join(cum.select(col("score"), col("n_s"), col("cum_n")),
          Seq("score"))
        .groupBy(col("g"))
        .agg(sum(col("c") * (col("cum_n") * 2 - col("n_s") + 1)).as("two_r"),
          sum(col("c")).as("n_j"))
        .collect() // |event types| rows — bounded
      val ties = big(cum.agg(
        sum(expr(s"cast(n_s as $dec) * n_s * n_s - n_s"))).head(), 0)
      val n = pg.map(r => BigInt(r.getAs[Long]("n_j"))).sum
      val rsum = pg.map { r =>
        val tr = BigInt(r.getAs[Long]("two_r"))
        tr * tr / (4 * BigInt(r.getAs[Long]("n_j")))
      }.sum
      val h = BigInt(12000000) * rsum / (n * (n + 1)) - 3 * (n + 1) * 1000000
      (h * (n * n * n - n) / (n * n * n - n - ties)).toLong
    }
    var kw1 = 0L
    em.stage("kruskal x1") { kw1 = kruskal(evBase); 1L }
    var kw100 = 0L
    em.stage(s"kruskal x$Reps") { kw100 = kruskal(dup(evBase)); 1L }
    val kwRatio = kw100.toDouble / (kw1.toDouble * Reps)

    // ---- q330 observed statistic: exact k^2 ----------------------------
    val permBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("v"),
      expr("cast(case when ((unix_millis(ts) div 86400000) + 4) % 7" +
        " in (0, 6) then 1 else 0 end as bigint)").as("lab"))
      .localCheckpoint(true)
    def tObs(e: DataFrame): Map[String, BigInt] =
      e.groupBy(col("g")).agg(
          sum(when(col("lab") === 1L, col("v")).otherwise(0L)).as("sa"),
          sum(when(col("lab") === 0L, col("v")).otherwise(0L)).as("sb"),
          sum(col("lab")).as("na"), count(lit(1)).as("n"))
        .collect().map { r =>
          val (sa, sb, na, n) = (BigInt(r.getLong(1)), BigInt(r.getLong(2)),
            BigInt(r.getLong(3)), BigInt(r.getLong(4)))
          r.getString(0) -> (sa * (n - na) - sb * na).abs
        }.toMap
    var to1: Map[String, BigInt] = Map.empty
    em.stage("perm t_obs x1") { to1 = tObs(permBase); to1.size.toLong }
    var to100: Map[String, BigInt] = Map.empty
    em.stage(s"perm t_obs x$Reps") { to100 = tObs(dup(permBase)); to100.size.toLong }
    val tObsK2Exact = to1.keySet == to100.keySet &&
      to1.forall { case (g, t) => to100(g) == t * Reps * Reps }

    // ---- q336/q337 distances: rational/isqrt bit-identity ---------------
    // W1: every cross-multiplied CDF term scales exactly k², as does
    // nA·nB, so the final floored division is the SAME rational. BC: the
    // per-bin radicand (k·cA·k·cB·10¹²) div (k·nA·k·nB) is the same
    // integer, so isqrt is bit-identical.
    val distBase = Tables.events(spark, sfDir)
      .where(col("event_type").isin("click", "view"))
      .select(round(col("value") * 100).cast("long").as("score"),
        expr("(unix_millis(ts) div 3600000) % 24").as("hbin"),
        when(col("event_type") === "click", 1L).otherwise(0L).as("pos"))
      .localCheckpoint(true)
    def distances(e: DataFrame): (Long, Long) = {
      val perScore = e.groupBy(col("score"))
        .agg(count(lit(1)).as("n_s"), sum(col("pos")).as("p_s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1) // score-domain-bounded
      val n = perScore.map(_._2).sum; val na = perScore.map(_._3).sum
      var (cn, ca, wsum) = (BigInt(0), BigInt(0), BigInt(0))
      for (i <- perScore.indices.dropRight(1)) {
        cn += perScore(i)._2; ca += perScore(i)._3
        val gap = perScore(i + 1)._1 - perScore(i)._1
        wsum += (ca * (n - na) - (cn - ca) * na).abs * gap
      }
      val w1 = (wsum * 1000000 / (BigInt(na) * (n - na))).toLong
      val byH = e.groupBy(col("hbin")).agg(sum(col("pos")).as("ca"),
          (count(lit(1)) - sum(col("pos"))).as("cb"))
        .collect().map(r => (r.getLong(1), r.getLong(2)))
      val bc = byH.map { case (caH, cbH) =>
        val rad = (BigInt(caH) * cbH * BigInt("1000000000000") /
          (BigInt(na) * (n - na))).toLong
        math.sqrt(rad.toDouble).toLong match { case r0 =>
          // exact floor correction (Isqrt contract)
          var r1 = r0
          while (r1 * r1 > rad) r1 -= 1
          while ((r1 + 1) * (r1 + 1) <= rad) r1 += 1
          r1 }
      }.sum
      (w1, bc)
    }
    var di1: (Long, Long) = (0L, 0L)
    em.stage("w1+bc x1") { di1 = distances(distBase); 2L }
    var di100: (Long, Long) = (0L, 0L)
    em.stage(s"w1+bc x$Reps") { di100 = distances(dup(distBase)); 2L }
    val distIdentical = di1 == di100

    // ---- q338 Mann–Kendall: S/var18 IDENTICAL, Sen scales ~k -------------
    // Duplicating rows scales daily counts by k: sign(k·xj − k·xi) =
    // sign(xj − xi) so S and the tie structure are INVARIANT; Sen's
    // slope numerators scale k, so the median slope sits in [95,105]%·k.
    val dayBase = Tables.events(spark, sfDir)
      .select(col("event_type").as("g"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .localCheckpoint(true)
    def mk(e: DataFrame): Map[String, (Long, Long, Long)] = {
      val daily = e.groupBy(col("g"), col("day")).agg(count(lit(1)).as("x"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      daily.groupBy(_._1).map { case (g, rows) =>
        val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
        val ps = for (i <- pts.indices; j <- (i + 1) until pts.size)
          yield (pts(i), pts(j))
        val sStat = ps.map { case ((_, xi), (_, xj)) =>
          java.lang.Long.signum(xj - xi).toLong }.sum
        val n = pts.size.toLong
        val tie = pts.groupBy(_._2).values
          .map { gr => val t = gr.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
        val slopes = ps.map { case ((di, xi), (dj, xj)) =>
          (xj - xi) * 1000000L / (dj - di) }.sorted
        g -> ((sStat, n * (n - 1) * (2 * n + 5) - tie,
          slopes((slopes.size + 1) / 2 - 1)))
      }
    }
    var mk1: Map[String, (Long, Long, Long)] = Map.empty
    em.stage("mann-kendall x1") { mk1 = mk(dayBase); mk1.size.toLong }
    var mk100: Map[String, (Long, Long, Long)] = Map.empty
    em.stage(s"mann-kendall x$Reps") { mk100 = mk(dup(dayBase)); mk100.size.toLong }
    val mkSVarIdentical = mk1.keySet == mk100.keySet && mk1.forall {
      case (g, (s1v, v1, _)) =>
        val (s2, v2, _) = mk100(g); s1v == s2 && v1 == v2 }
    val mkSenRatioOk = mk1.forall { case (g, (_, _, sl1)) =>
      val sl2 = mk100(g)._3
      if (sl1 == 0L) sl2.abs <= Reps
      else { val r = sl2.toDouble / (sl1.toDouble * Reps); r > 0.95 && r < 1.05 }
    }

    val ok = spExact && kenCellsExact && kenTaubIdentical && kappaIdentical &&
      mcCountsExact && (mcStatRatio == -1.0 || (mcStatRatio > 0.95 && mcStatRatio < 1.05)) &&
      crV2Delta <= 2L && crChi2Ratio > 0.95 && crChi2Ratio < 1.05 &&
      kwRatio > 0.95 && kwRatio < 1.05 && tObsK2Exact &&
      distIdentical && mkSVarIdentical && mkSenRatioOk
    em.line(s"""{"summary":"round-10c rank/agreement invariances at ${Reps}x duplication","spearman_rho2_rational_identical":$spExact,"kendall_cells_k_exact":$kenCellsExact,"kendall_taub2_identical":$kenTaubIdentical,"kappa_ppms_identical":$kappaIdentical,"mcnemar_counts_k_exact":$mcCountsExact,"mcnemar_stat_k_ratio":${f"$mcStatRatio%.4f"},"cramers_v2_ppm_delta":$crV2Delta,"cramers_chi2_k_ratio":${f"$crChi2Ratio%.4f"},"kruskal_h_k_ratio":${f"$kwRatio%.4f"},"perm_tobs_k2_exact":$tObsK2Exact,"w1_bc_identical":$distIdentical,"mk_s_var_identical":$mkSVarIdentical,"mk_sen_k_ratio_ok":$mkSenRatioOk,"band":[95.0,105.0],"linear":$ok}""")
  }

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
  private val resampling: Family = (spark, sfDir, em) => {
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val evBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"), col("event_id").cast("long").as("eid"),
      expr("cast(round(value * 100) as bigint)").as("v"))
      .localCheckpoint(true)
    def boot(ev: DataFrame): Map[String, (Long, Long, Long, Long, Long)] =
      graft.queries.EvalQueries.bootstrapSe(ev, 32).collect().map { r =>
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
      graft.queries.EvalQueries.jackknifeBlocks(docs).collect().map { r =>
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
  private val privacy: Family = (spark, sfDir, em) => {
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
      get_json_object(col("props"), "$.k").cast("long").as("x"),
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
  private val experiment: Family = (spark, sfDir, em) => {
    import graft.queries.ExperimentQueries
    def dup(df: DataFrame): DataFrame = df
      .crossJoin(broadcast(spark.range(Reps).toDF("__rep"))).drop("__rep")
      .repartition(64).localCheckpoint(true)
    val relBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"),
      when(dayofmonth(col("ts")) <= 15, lit("a")).otherwise(lit("b"))
        .as("half"),
      expr("cast(get_json_object(props, '$.k') as long) div 10").as("b"))
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
    em.line(s"""{"summary":"round-11b experimentation invariances at ${Reps}x duplication","psi_fp_max_delta":$psiMaxDelta,"psi_band_ok":${psiMaxDelta <= 64},"neyman_bit_identical":$neymanExact,"cuped_theta_identical_scaling_banded":$cupedOk,"linear":${psiMaxDelta <= 64 && neymanExact && cupedOk}}""")
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
  private val hypothesis: Family = (spark, sfDir, em) => {
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
        expr("cast(get_json_object(props, '$.k') as long)").as("v"))
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
        expr("cast(get_json_object(props, '$.k') as long)").as("k"))
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

  private val families: Map[String, (Family, String)] = Map(
    "hypothesis" -> ((hypothesis, "/root/testdata/sf0.1")),
    "experiment" -> ((experiment, "/root/testdata/sf0.1")),
    "privacy" -> ((privacy, "/root/testdata/sf0.1")),
    "resampling" -> ((resampling, "/root/testdata/sf0.1")),
    "agreement" -> ((agreement, "/root/testdata/sf0.1")),
    "eval" -> ((evalStats, "/root/testdata/sf0.1")),
    "vector-curation" -> ((vectorCuration, "/root/testdata/sf0.1")),
    "similarity" -> ((similarity, "/root/testdata/sf0.1")),
    "graph" -> ((graph, "/root/testdata/sf0.01")),
    "text" -> ((text, "/root/testdata/sf0.1")),
    "info" -> ((info, "/root/testdata/sf0.1")),
    "ks-textrank" -> ((ksTextrank, "/root/testdata/sf0.1")),
    "auc-snm" -> ((aucSnm, "/root/testdata/sf0.1")),
    "km-ab" -> ((kmAb, "/root/testdata/sf0.1")))

  def main(args: Array[String]): Unit = {
    val (flags, names) = args.partition(_.startsWith("--"))
    val sfOverride = flags.collectFirst {
      case f if f.startsWith("--sf=") => f.stripPrefix("--sf=") }
    val picked = if (names.isEmpty) families.keys.toSeq.sorted else names.toSeq
    val unknown = picked.filterNot(families.contains)
    require(unknown.isEmpty,
      s"unknown families: ${unknown.mkString(", ")} — " +
        s"known: ${families.keys.toSeq.sorted.mkString(", ")}")
    val spark = session()
    val em = new Emitter
    picked.foreach { name =>
      val (fam, defaultSf) = families(name)
      em.line(s"""{"family":"$name"}""")
      fam(spark, sfOverride.getOrElse(defaultSf), em)
    }
    spark.stop()
  }
}
