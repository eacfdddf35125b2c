package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.{AllPairs, Dedup, NaiveBayes, RandomProjection, SetJoin, TextAnalysis}
import graft.tools.ScaleStress.{Emitter, Family, Reps, ratio3, strideReplica, tokenReplica}

/** Scale-stress families (rounds 6-8: similarity/LSH candidate growth, graph shortlists, text fingerprints, info-theory grids), split out of
  * [[ScaleStress]] (round-11 verdict: no non-test source file over
  * ~1500 lines). The harness contract, replica methodology, and JSON
  * line format are documented on [[ScaleStress]]; each family here is
  * exactly the code previously inlined there. */
private[tools] object StressCoreFamilies {
  /** SCALESTRESS_r6: candidate-count growth of the similarity family at
    * 100× disjoint-vocabulary corpus, plus graph/vector ops with no
    * baseline (throughput-shape stages). */
  val similarity: Family = (spark, sfDir, em) => {
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
  val graph: Family = (spark, sfDir, em) => {
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
  val text: Family = (spark, sfDir, em) => {
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
  val info: Family = (spark, sfDir, em) => {
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
}
