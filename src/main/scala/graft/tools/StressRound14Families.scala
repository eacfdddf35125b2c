package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.queries.{ForecastQueries, GraphQueries, LexicalQueries, MultimodalQueries}
import graft.tools.ScaleStress.{Emitter, Family, Reps}

/** Scale-stress family for the round-14 audits (q403–q406), each gate an
  * EXACT expectation derived from the ×1 state (the [[ScaleStress]]
  * methodology):
  *
  * - η² (q403) under plain ×100 event duplication: every daily count
  *   scales ×K with the day set unchanged, so N·SST scales exactly K²
  *   and the per-group floored SSB terms are recomputed in BigInt from
  *   the ×1 daily frame — the engine's ×K readout must equal that
  *   recount verbatim (floor interactions make ssb NOT simply K²·ssb,
  *   which is exactly why the expectation is recomputed, not scaled).
  * - assortativity (q404) under ×20 DISJOINT graph replicas (both
  *   endpoint id spaces strided): every Pearson moment scales by K so
  *   the signed r² ratio's K⁴ cancels before its single floor — the
  *   statistic must be BIT-identical while n_edges scales ×K.
  * - vocabulary growth (q405) under ×20 disjoint-vocab replicas with
  *   strided doc ids: thresholds, doc/occurrence counts, and the
  *   first-seen vocabulary at each quarter are all recomputed exactly
  *   from the collected ×1 token frame.
  * - payload entropy (q406) under plain ×20 duplication: byte counts
  *   scale ×K but ilog2(K·c) ≠ ilog2(c) + const in fp-16 floor units,
  *   so the expected census is re-derived with the JVM Ilog2 fold on
  *   the K-scaled ×1 histogram — again exact, not scaled.
  */
object StressRound14Families {

  val round14: Family = (spark, sfDir, em) => {

    // ---- q403: day-of-week eta^2 under x100 duplication ----
    val evBase = Tables.events(spark, sfDir).select(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .localCheckpoint(true)
    def etaOf(rel: DataFrame): Map[String, (Long, Long, Long, Option[Long])] =
      ForecastQueries.dowEta2(rel).collect().map { r =>
        r.getAs[String]("event_type") -> ((r.getAs[Long]("n_days"),
          r.getAs[Long]("sst_n"), r.getAs[Long]("ssb_n"),
          if (r.isNullAt(r.fieldIndex("eta2_ppm"))) None
          else Some(r.getAs[Long]("eta2_ppm"))))
      }.toMap
    var e1: Map[String, (Long, Long, Long, Option[Long])] = Map.empty
    em.stage("eta2 x1") { e1 = etaOf(evBase); e1.size.toLong }
    var eK: Map[String, (Long, Long, Long, Option[Long])] = Map.empty
    em.stage(s"eta2 x$Reps") {
      eK = etaOf(evBase.crossJoin(broadcast(
        spark.range(Reps).toDF("__rep"))).drop("__rep")
        .repartition(64).localCheckpoint(true))
      eK.size.toLong
    }
    // exact expectation from the x1 daily frame with counts xK
    val daily1 = evBase.groupBy(col("event_type"), col("day")).count()
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val etaExact = e1.nonEmpty && e1.forall { case (g, _) =>
      val rows = daily1.filter(_._1 == g)
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3) * Reps).sum
      val q = rows.map(r => BigInt(r._3) * Reps * (BigInt(r._3) * Reps)).sum
      val sst = n * q - s * s
      val t = rows.groupBy(r => (r._2 + 4) % 7).values.map { grp =>
        val sg = grp.map(r => BigInt(r._3) * Reps).sum
        (n * sg * sg) / grp.length
      }.sum
      val ssb = (t - s * s).max(BigInt(0)) // engine clamps the floor dip
      val eta = if (sst == 0) None else Some(((ssb * 1000000) / sst).toLong)
      eK.get(g).contains((n.toLong, sst.toLong, ssb.toLong, eta))
    }

    // ---- q404: assortativity under x20 disjoint graph replicas ----
    val Kg = 20
    val edges = graft.queries.CoPurchase.purchaseEdges(spark, sfDir)
      .select(col("c"), col("p")).localCheckpoint(true)
    def assortOf(e: DataFrame): (Long, Option[Long]) = {
      val r = GraphQueries.assortativity(e).collect()(0)
      (r.getAs[Long]("n_edges"),
        if (r.isNullAt(r.fieldIndex("assort_bp_signed"))) None
        else Some(r.getAs[Long]("assort_bp_signed")))
    }
    var a1: (Long, Option[Long]) = (0L, None)
    em.stage("assortativity x1") { a1 = assortOf(edges); a1._1 }
    val (strideC, strideP) = {
      val r = edges.agg(max(col("c")), max(col("p"))).collect()(0)
      (r.getLong(0) + 1L, r.getLong(1) + 1L)
    }
    var aK: (Long, Option[Long]) = (0L, None)
    em.stage(s"assortativity x$Kg") {
      aK = assortOf(edges.crossJoin(broadcast(
          spark.range(Kg).select(col("id").as("__r"))))
        .select((col("c") + col("__r") * strideC).as("c"),
          (col("p") + col("__r") * strideP).as("p"))
        .localCheckpoint(true))
      aK._1
    }
    val assortExact = a1._1 > 0 && aK._1 == a1._1 * Kg && aK._2 == a1._2

    // ---- q405: vocab growth under x20 disjoint-vocab replicas ----
    val Kd = 20
    val docsBase = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val baseN = docsBase.agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    def growthOf(d: DataFrame): Seq[(Long, Long, Long, Long, Long, Long, Long)] =
      LexicalQueries.vocabGrowth(d).collect().map { r =>
        (r.getAs[Long]("quarter"), r.getAs[Long]("doc_id_max"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("vocab"), r.getAs[Long]("new_vocab"),
          r.getAs[Long]("type_token_ppm"))
      }.toSeq.sortBy(_._1)
    var g1: Seq[(Long, Long, Long, Long, Long, Long, Long)] = Seq.empty
    em.stage("vocab growth x1") { g1 = growthOf(docsBase); g1.size.toLong }
    var gK: Seq[(Long, Long, Long, Long, Long, Long, Long)] = Seq.empty
    em.stage(s"vocab growth x$Kd") {
      val rep = docsBase.crossJoin(broadcast(
          spark.range(Kd).select(col("id").as("rep"))))
        .select((col("rep") * baseN + col("doc_id")).as("doc_id"),
          regexp_replace(col("text"), lit("(\\w+)"),
            concat(lit("$1r"), col("rep"))).as("text"))
        .localCheckpoint(true)
      gK = growthOf(rep); gK.size.toLong
    }
    // exact expectation from the collected x1 frame
    val collected = docsBase.collect().map(r => (r.getLong(0), r.getString(1)))
    val vocabExact = g1.nonEmpty && {
      val ids = collected.map(_._1)
      val toks = collected.flatMap { case (id, t) =>
        t.toLowerCase.split("\\W+").filter(_.nonEmpty).map(id -> _) }
      val firstSeen = toks.groupBy(_._2).view.mapValues(_.map(_._1).min)
        .values.toSeq
      val (lo, hi) = (ids.min, (Kd - 1) * baseN + ids.max)
      (1 to 4).forall { qq =>
        val t = lo + ((hi - lo + 1) * qq) / 4 - 1
        val nd = (0 until Kd).map(r => ids.count(r * baseN + _ <= t)).sum
        val occ = (0 until Kd).map(r =>
          toks.count { case (id, _) => r * baseN + id <= t }).sum
        // replica r's vocabulary is disjoint (suffixed): first seen at
        // r*baseN + firstSeen
        val voc = (0 until Kd).map(r =>
          firstSeen.count(r * baseN + _ <= t)).sum
        gK.lift(qq - 1).exists { row =>
          row._2 == t && row._3 == nd.toLong && row._4 == occ.toLong &&
            row._5 == voc.toLong &&
            row._7 == (BigInt(voc) * 1000000 / occ).toLong
        }
      }
    }

    // ---- q406: payload entropy under x20 duplication ----
    def entropyOf(d: DataFrame): Map[Long, (Long, Long, Long, Long)] =
      MultimodalQueries.payloadEntropy(d).collect().map { r =>
        r.getAs[Long]("cls") -> ((r.getAs[Long]("n_bytes"),
          r.getAs[Long]("n_values"), r.getAs[Long]("h_xlx"),
          r.getAs[Long]("bits_per_byte_fp16")))
      }.toMap
    var h1: Map[Long, (Long, Long, Long, Long)] = Map.empty
    em.stage("payload entropy x1") { h1 = entropyOf(docsBase); h1.size.toLong }
    var hK: Map[Long, (Long, Long, Long, Long)] = Map.empty
    em.stage(s"payload entropy x$Kd") {
      hK = entropyOf(docsBase.crossJoin(broadcast(
          spark.range(Kd).select(col("id").as("__r"))))
        .select((col("__r") * baseN + col("doc_id")).as("doc_id"),
          col("text"))
        .localCheckpoint(true))
      hK.size.toLong
    }
    // exact expectation: JVM Ilog2 fold over the K-scaled x1 histogram
    val hist1 = collected.flatMap { case (_, t) =>
      t.getBytes("UTF-8").take(64).map(b => (b & 0xff).toLong) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val entropyExact = h1.nonEmpty && {
      val byCls = hist1.toSeq.groupBy(_._1 / 16)
      byCls.forall { case (cls, vs) =>
        val t = vs.map(_._2).sum * Kd
        val sx = vs.map { case (_, c) =>
          BigInt(c * Kd) * graft.functions.Ilog2.impl(c * Kd) }.sum
        val h = BigInt(t) * graft.functions.Ilog2.impl(t) - sx
        hK.get(cls).contains((t, vs.length.toLong, h.toLong, (h / t).toLong))
      }
    }

    em.line(s"""{"summary":"round-14 audit invariances","eta2_exact":$etaExact,"assortativity_exact":$assortExact,"vocab_growth_exact":$vocabExact,"entropy_exact":$entropyExact,"linear":${etaExact && assortExact && vocabExact && entropyExact}}""")
  }
}
