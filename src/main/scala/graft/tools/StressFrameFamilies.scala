package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.llm.{AllPairs, Dedup, NaiveBayes, RandomProjection, SetJoin, TextAnalysis}
import graft.tools.ScaleStress.{Emitter, Family, Reps, ratio3, strideReplica, tokenReplica}

/** Scale-stress families (round 9: the reduced-frame invariance families (KS/TextRank, AUC/SNM, KM/AB, vector + curation timing)), split out of
  * [[ScaleStress]] (round-11 verdict: no non-test source file over
  * ~1500 lines). The harness contract, replica methodology, and JSON
  * line format are documented on [[ScaleStress]]; each family here is
  * exactly the code previously inlined there. */
private[tools] object StressFrameFamilies {
  /** SCALESTRESS_r9b: q298's KS statistic scales in the VALUE DOMAIN
    * (disjoint per-replica value ranges → distinct-value frame exactly
    * 100×); q300's TextRank graph is CONTENT-bounded (same token space →
    * vocab and edge set exactly constant under corpus replication). */
  val ksTextrank: Family = (spark, sfDir, em) => {
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
  val aucSnm: Family = (spark, sfDir, em) => {
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
  val kmAb: Family = (spark, sfDir, em) => {
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
  val vectorCuration: Family = (spark, sfDir, em) => {
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

  /** SCALESTRESS_r13: the cluster-quality audits (q396/q397) and the
    * Theil-Sen robust trend (q398) under duplication. The silhouette and
    * Davies-Bouldin per-cell readouts are EXACTLY invariant at xK vector
    * duplication with member counts scaling xK (same vectors, same fixed
    * first-8 centroids -- replicas take strided higher ids; mean floors
    * commute: floor(K*S / (K*n)) = floor(S/n)); the Theil-Sen median at
    * xK event duplication is the BigInt recount of the same median pair
    * (daily sums scale xK, slope order is monotone under the common
    * factor). A violation means the narrow-map / bounded-frame shapes
    * quietly became data-dependent. */
  val clusterQuality: Family = (spark, sfDir, em) => {
    import graft.queries.{ClusterQualityQueries, ForecastQueries}
    val K = 20 // vector side: x20 keeps the run seconds-scale at sf0.1

    val embBase = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val embN = embBase.agg(max(col("vec_id"))).collect()(0).getLong(0) + 1L
    val stagedDir = graft.io.Scratch.dir("stress_cq_") 
    def stage(df: DataFrame, sub: String): String = {
      val d = s"$stagedDir/$sub"
      df.write.mode("overwrite").parquet(s"$d/embeddings.parquet")
      d
    }
    val d1 = stage(embBase, "x1")
    val dK = stage(embBase.crossJoin(broadcast(spark.range(1, K).toDF("rep")))
      .select((col("rep") * embN + col("vec_id")).as("vec_id"),
        col("embedding"))
      .unionByName(embBase), "xK")

    def runSil(d: String): Map[Long, (Long, Long, Long, Long, Long)] =
      ClusterQualityQueries.q396_silhouette(spark, d).collect().map { r =>
        r.getAs[Long]("cell") -> ((r.getAs[Long]("n_members"),
          r.getAs[Long]("n_scored"), r.getAs[Long]("mean_sil_ppm"),
          r.getAs[Long]("min_sil_ppm"), r.getAs[Long]("max_sil_ppm")))
      }.toMap
    var s1: Map[Long, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage("silhouette x1") { s1 = runSil(d1); s1.size.toLong }
    var sK: Map[Long, (Long, Long, Long, Long, Long)] = Map.empty
    em.stage(s"silhouette x$K") { sK = runSil(dK); sK.size.toLong }
    val silExact = s1.nonEmpty && s1.forall { case (c, (n, ns, m, lo, hi)) =>
      sK.get(c).contains((n * K, ns * K, m, lo, hi)) }

    def runDb(d: String): Map[Long, (Long, Long, Long, Long)] =
      ClusterQualityQueries.q397_davies_bouldin(spark, d).collect().map { r =>
        r.getAs[Long]("cell") -> ((r.getAs[Long]("n_members"),
          r.getAs[Long]("s_ppm"), r.getAs[Long]("d_i_ppm"),
          r.getAs[Long]("db_index_ppm")))
      }.toMap
    var db1: Map[Long, (Long, Long, Long, Long)] = Map.empty
    em.stage("davies-bouldin x1") { db1 = runDb(d1); db1.size.toLong }
    var dbK: Map[Long, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"davies-bouldin x$K") { dbK = runDb(dK); dbK.size.toLong }
    val dbExact = db1.nonEmpty && db1.forall { case (c, (n, sp, di, dbi)) =>
      dbK.get(c).contains((n * K, sp, di, dbi)) }

    val tsBase = Tables.events(spark, sfDir).select(
      col("event_type").as("g"),
      expr("unix_millis(ts) div 86400000").as("day"),
      expr("cast(round(value * 100) as bigint)").as("v"))
      .localCheckpoint(true)
    def runTs(rel: DataFrame): Map[String, (Long, Long, Option[Long])] =
      ForecastQueries.theilSen(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
          r.getAs[Long]("n_pairs"),
          if (r.isNullAt(r.fieldIndex("ts_slope_ppm"))) None
          else Some(r.getAs[Long]("ts_slope_ppm"))))
      }.toMap
    var t1: Map[String, (Long, Long, Option[Long])] = Map.empty
    em.stage("theil-sen x1") { t1 = runTs(tsBase); t1.size.toLong }
    var tK: Map[String, (Long, Long, Option[Long])] = Map.empty
    em.stage(s"theil-sen x$Reps") {
      tK = runTs(tsBase.crossJoin(broadcast(
        spark.range(Reps).toDF("__rep"))).drop("__rep")
        .repartition(64).localCheckpoint(true))
      tK.size.toLong
    }
    // xK daily sums scale the slope NUMERATOR by K with the same pair
    // order, so the expected median is the BigInt recount from the x1
    // daily frame (bounded: <= 31 days x |types|)
    val daily1 = tsBase.groupBy(col("g"), col("day"))
      .agg(sum(col("v")).as("y")).collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("day"),
        r.getAs[Long]("y")))
    val tsExact = t1.nonEmpty && t1.forall { case (g, (nd, np, _)) =>
      val pts = daily1.filter(_._1 == g).map(p => (p._2, p._3)).sortBy(_._1)
      val slopes = (for {
        (d1v, y1) <- pts; (d2v, y2) <- pts if d1v < d2v
      } yield (BigInt(y2 - y1) * Reps * 1000000 / (d2v - d1v)).toLong).sorted
      val expMed = if (slopes.isEmpty) None
        else Some(slopes((slopes.length + 1) / 2 - 1))
      tK.get(g).contains((nd, np, expMed))
    }
    em.line(s"""{"summary":"round-13 cluster-quality + robust-trend invariances","silhouette_exact_x$K":$silExact,"davies_bouldin_exact_x$K":$dbExact,"theil_sen_recount_exact_x$Reps":$tsExact,"linear":${silExact && dbExact && tsExact}}""")
  }

}
