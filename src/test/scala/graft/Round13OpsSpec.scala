package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{ClusterQualityQueries, ForecastQueries}

/** Round-13 cluster-quality + robust-trend tests: the simplified
  * silhouette and Davies–Bouldin audits recomputed on sf0.001 by an
  * independent driver-side implementation (plain Scala folds over the
  * collected corpus — the same in-order double arithmetic, but sorts
  * and loops instead of the engine's array expressions and bounded
  * joins), Theil–Sen fuzzed against a brute-force pairwise-slope median
  * with exact BigInt quantization (signed truncation included), and the
  * plan locks the scaladocs promise: the silhouette's score pass is a
  * narrow map (NO join anywhere in its plan — the k centroids are
  * literals), and neither audit plans a window over the corpus. */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(1313L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  // in-order left folds, bit-identical to DotProduct / DuckDB list_reduce
  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
  private def norm(a: Seq[Double]): Double = math.sqrt(dot(a, a))

  /** Driver replay of the per-point assignment + silhouette terms. */
  private def pointReplay(): Seq[(Long, Int, Double, Option[Long])] = {
    val all = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1)
    val cents = all.take(8).map(_._2)
    val cnorms = cents.map(norm)
    all.toSeq.map { case (id, v) =>
      val n = norm(v)
      val scores = cents.indices.map(j => dot(v, cents(j)) / (n * cnorms(j)))
      val sorted = scores.sorted
      val aSim = sorted(7); val bSim = sorted(6)
      val cell = scores.indexOf(aSim)
      val aD = 1.0 - aSim; val bD = 1.0 - bSim
      val sil = if (bD > 0.0) Some(math.floor((bD - aD) / bD * 1000000).toLong)
                else None
      (id, cell, aD, sil)
    }
  }

  test("q396: per-cell silhouette matches a plain driver recount") {
    val pts = pointReplay()
    val out = ClusterQualityQueries.q396_silhouette(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    val byCell = pts.groupBy(_._2)
    assert(out.keySet == byCell.keySet.map(_.toLong), "cell universe")
    byCell.foreach { case (cell, ms) =>
      val r = out(cell.toLong)
      val sils = ms.flatMap(_._4)
      assert(r.getAs[Long]("n_members") == ms.size.toLong, s"$cell n")
      assert(r.getAs[Long]("n_scored") == sils.size.toLong, s"$cell scored")
      assert(r.getAs[Long]("mean_sil_ppm") ==
        (sils.map(BigInt(_)).sum / sils.size).toLong, s"$cell mean")
      assert(r.getAs[Long]("min_sil_ppm") == sils.min &&
        r.getAs[Long]("max_sil_ppm") == sils.max, s"$cell extremes")
    }
    // the quantizer sanity the audit exists for: silhouettes live in
    // [-1e6, 1e6] and SOME cell separates (mean > 0)
    assert(out.values.forall { r =>
      val m = r.getAs[Long]("mean_sil_ppm"); m >= -1000000L && m <= 1000000L })
    assert(out.values.exists(_.getAs[Long]("mean_sil_ppm") > 0L))
  }

  test("q397: Davies-Bouldin matches a plain driver recount") {
    val pts = pointReplay()
    val all = graft.io.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toSeq))
      .sortBy(_._1)
    val cents = all.take(8).map(_._2)
    val s = pts.groupBy(_._2).view.mapValues { ms =>
      val aPpm = ms.map(m => BigInt(math.floor(m._3 * 1000000).toLong))
      (ms.size.toLong, (aPpm.sum / ms.size).toLong)
    }.toMap
    val di = (0 until 8).map { i =>
      val ratios = (0 until 8).filter(_ != i).flatMap { j =>
        val m = math.floor(
          (1.0 - dot(cents(i), cents(j)) / (norm(cents(i)) * norm(cents(j))))
            * 1000000).toLong
        if (m == 0) None
        else Some((BigInt(s(i)._2) + s(j)._2) * 1000000 / m)
      }
      i -> (if (ratios.isEmpty) None else Some(ratios.max.toLong))
    }.toMap
    val db = if (di.values.forall(_.isDefined))
      Some((di.values.flatten.map(BigInt(_)).sum / 8).toLong) else None
    val out = ClusterQualityQueries.q397_davies_bouldin(spark, sf).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    (0 until 8).foreach { i =>
      val r = out(i.toLong)
      assert(r.getAs[Long]("n_members") == s(i)._1 &&
        r.getAs[Long]("s_ppm") == s(i)._2, s"cell $i scatter")
      assert(Option(r.getAs[Any]("d_i_ppm")).map(_.asInstanceOf[Long]) ==
        di(i), s"cell $i D_i")
      assert(Option(r.getAs[Any]("db_index_ppm")).map(_.asInstanceOf[Long]) ==
        db, s"cell $i DB")
    }
  }

  /** Write a toy embeddings corpus (float vectors, power-of-two
    * coordinates so the cosine folds are EXACT) as an sf-dir layout the
    * (s, d)-shaped queries can read. */
  private def toyCorpus(name: String, vecs: Seq[Seq[Float]]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$name").toString
    vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q396/q397 degenerate corpora fail closed: exact-tie silhouettes NULL, all-degenerate DB NULL") {
    // corpus A: 8 identical centroids (all points assign to cell 0 by the
    // ties-to-lowest convention), plus two more collinear points — every
    // score ties, so b_dist = 0 EXACTLY (power-of-two folds) and every
    // silhouette is NULL; every centroid separation is 0, so no ratio
    // exists, D_i is NULL, and the DB index is NULL. Before the
    // member-cell LEFT join this corpus returned an EMPTY frame (cells
    // silently dropped by the inner di join) — and a PARTIALLY
    // degenerate corpus would have averaged a finite index over only
    // the non-degenerate subset, the fail-open the scaladoc forbids.
    val e1 = Seq.fill(8)(Seq(2f, 0f, 0f, 0f)) ++
      Seq(Seq(4f, 0f, 0f, 0f), Seq(8f, 0f, 0f, 0f))
    val dA = toyCorpus("cqA", e1)
    val sil = ClusterQualityQueries.q396_silhouette(spark, dA).collect()
    assert(sil.length == 1 && sil(0).getAs[Long]("cell") == 0L)
    assert(sil(0).getAs[Long]("n_members") == 10L &&
      sil(0).getAs[Long]("n_scored") == 0L)
    assert(sil(0).isNullAt(sil(0).fieldIndex("mean_sil_ppm")), "mean NULL")
    val db = ClusterQualityQueries.q397_davies_bouldin(spark, dA).collect()
    assert(db.length == 1 && db(0).getAs[Long]("s_ppm") == 0L)
    assert(db(0).isNullAt(db(0).fieldIndex("d_i_ppm")), "D_i NULL")
    assert(db(0).isNullAt(db(0).fieldIndex("db_index_ppm")), "DB NULL")

    // corpus B: coincident centroid PAIR (cells 0/1) among distinct
    // others — the collinear extra point ties its top-2 scores at
    // exactly 1, so ITS silhouette is NULL while well-separated points
    // keep finite ones; the memberless twin cell (ties lose to cell 0)
    // simply has no row, and the populated cells' D_i/DB stay finite
    val e2 = Seq(
      Seq(2f, 0f, 0f, 0f), Seq(2f, 0f, 0f, 0f), // coincident pair
      Seq(0f, 2f, 0f, 0f), Seq(0f, 0f, 2f, 0f), Seq(0f, 0f, 0f, 2f),
      Seq(2f, 2f, 0f, 0f), Seq(2f, 0f, 2f, 0f), Seq(0f, 2f, 2f, 0f),
      Seq(4f, 0f, 0f, 0f), // collinear with BOTH coincident centroids
      Seq(0f, 4f, 4f, 0f)) // collinear with centroid 7 only
    val dB = toyCorpus("cqB", e2)
    val sil2 = ClusterQualityQueries.q396_silhouette(spark, dB).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    assert(!sil2.contains(1L), "memberless twin cell must have no row")
    // cell 0 holds the pair + the collinear point: all three tie at
    // b_dist = 0 -> scored 0 of 3
    assert(sil2(0L).getAs[Long]("n_members") == 3L &&
      sil2(0L).getAs[Long]("n_scored") == 0L)
    // cell 7 holds its centroid + the aligned point; both silhouettes
    // finite and positive (well separated from every other centroid)
    assert(sil2(7L).getAs[Long]("n_scored") == 2L &&
      sil2(7L).getAs[Long]("mean_sil_ppm") > 0L)
    val db2 = ClusterQualityQueries.q397_davies_bouldin(spark, dB).collect()
      .map(r => r.getAs[Long]("cell") -> r).toMap
    assert(db2.values.forall(r =>
      !r.isNullAt(r.fieldIndex("d_i_ppm")) &&
      !r.isNullAt(r.fieldIndex("db_index_ppm"))),
      "populated distinct cells keep a finite DB index")
  }

  test("q398: fuzzed series match a brute-force slope median; single-day and constant series exact") {
    val gen: Gen[Seq[(String, Long, Long)]] = for {
      nG <- Gen.choose(1, 3)
      n <- Gen.choose(1, 30)
      constant <- Gen.oneOf(true, false)
      declining <- Gen.oneOf(true, false) // negative slopes: signed div
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, nG - 1)
        day <- Gen.choose(0L, 9L)
        v <- if (constant) Gen.const(40L)
             else if (declining) Gen.choose(-90L, -1L)
             else Gen.choose(-50L, 50L)
      } yield (s"g$g", day, v))
    } yield rows
    cases(gen, 10) { rows =>
      val out = ForecastQueries.theilSen(rows.toDF("g", "day", "v"))
        .collect().map(r => r.getAs[String]("event_type") -> r).toMap
      rows.groupBy(_._1).foreach { case (g, rs) =>
        val daily = rs.groupBy(_._2).view
          .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
        val slopes = (for {
          (d1, y1) <- daily; (d2, y2) <- daily if d1 < d2
        } yield {
          // BigInt `/` truncates toward zero — the div/`//` contract
          (BigInt(y2 - y1) * 1000000 / (d2 - d1)).toLong
        }).sorted
        val r = out.getOrElse(g, fail(s"$g vanished"))
        assert(r.getAs[Long]("n_days") == daily.size.toLong, s"$g days")
        assert(r.getAs[Long]("n_pairs") == slopes.size.toLong, s"$g pairs")
        if (slopes.isEmpty)
          assert(r.isNullAt(r.fieldIndex("ts_slope_ppm")), s"$g NULL slope")
        else {
          assert(r.getAs[Long]("ts_slope_ppm") ==
            slopes((slopes.size + 1) / 2 - 1), s"$g median")
          // a constant series has an exactly-zero robust slope
          if (daily.map(_._2).distinct.size == 1)
            assert(r.getAs[Long]("ts_slope_ppm") == 0L, s"$g constant")
        }
      }
    }
  }

  // Plan locks: the silhouette corpus pass must stay a narrow map — the
  // centroids are LITERALS, so any join in the plan means someone
  // reintroduced the corpus×k expansion (the round-2 IVF scale-killer).
  // Neither audit may plan a window; q397's joins are all broadcast/BNLJ
  // over k- and k²-bounded frames (no SortMergeJoin of the corpus).
  test("plan shapes: q396 joins nothing; q397 windows nothing, never sort-merges") {
    val p396 = ClusterQualityQueries.q396_silhouette(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p396.contains("Join"), s"q396 grew a join:\n$p396")
    assert(!p396.contains("Window"), s"q396 grew a window:\n$p396")
    val p397 = ClusterQualityQueries.q397_davies_bouldin(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p397.contains("Window"), s"q397 grew a window:\n$p397")
    assert(!p397.contains("SortMergeJoin"),
      s"q397 sort-merges a bounded frame:\n$p397")
    // column pruning reaches the scan: the readout needs only the vector
    // column, so vec_id must be pruned away (the silhouette never ships
    // an id — a scan reading extra columns is the q79 lesson)
    assert(p396.contains("ReadSchema: struct<embedding:array<float>>"),
      s"q396 scan reads more than the embedding column:\n$p396")
  }
}
