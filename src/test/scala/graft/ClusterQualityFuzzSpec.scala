package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.ClusterQualityQueries

/** Independent-reference certification of the cluster-quality pair
  * (round-13 verdict ask #4): the driver recounts in Round13OpsSpec share
  * the engine's derivation, so this spec pins q396 (simplified
  * silhouette) and q397 (Davies–Bouldin) two independent ways:
  *
  *  1. HAND-COMPUTED fixtures on ≤11 points whose geometry makes every
  *     expected value an exact integer worked out in the comments —
  *     orthonormal basis centroids (all separations exactly 1.0) plus
  *     3-4-5 right-triangle members whose cosines are 0.6/0.8, the
  *     textbook worked-example style the verdict asked for; plus the
  *     degenerate coincident-centroid corpus that must fail CLOSED
  *     (NULL silhouettes at b = 0, NULL DB index when every separation
  *     is degenerate — cb5b797's contract).
  *  2. A TEXTBOOK driver replay over random small corpora: per-point
  *     score loops with plain sorts (not the engine's array_sort /
  *     array_position formulation), BigInt integer division, explicit
  *     max scans — certifying the distributed formulation, not a shared
  *     formula. Doubles follow the engine's bit-parity contract
  *     (left-to-right dot folds from 0.0 — DotProduct.impl's documented
  *     semantics), so expected values are exact, not approximate.
  */
class ClusterQualityFuzzSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  private val K = 8

  private val fixtureDirs = scala.collection.mutable.ArrayBuffer.empty[String]

  private def writeEmb(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cq_fuzz").toString
    fixtureDirs += dir
    rows.toDF("vec_id", "embedding")
      .repartition(1).write.parquet(s"$dir/embeddings.parquet")
    dir
  }

  override def afterAll(): Unit = {
    fixtureDirs.foreach { d =>
      val root = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(root)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(root).iterator().asScala.toSeq
          .sortBy(-_.getNameCount)
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    super.afterAll()
  }

  private def optLong(r: org.apache.spark.sql.Row, f: String): Option[Long] =
    if (r.isNullAt(r.fieldIndex(f))) None else Some(r.getAs[Long](f))

  // ---- the hand-computed basis fixture -----------------------------------
  //
  // dim = 8. vec 0..7 = e_0..e_7 (the K fixed centroids; pairwise cosine 0,
  // so every centroid separation M_ij = floor((1-0)·10⁶) = 1000000 exactly).
  // vec 8 = (3,4,0,…): |v| = 5 exactly, cos to e_1 = 4/5, to e_0 = 3/5 →
  // cell 1. vec 9 = (4,3,0,…): the mirror → cell 0. vec 10 = 2·e_2: cos to
  // e_2 = 1 exactly → cell 2, a_dist = 0.
  //
  // IEEE doubles: 0.8 rounds UP (0.8000000000000000444), so a_dist =
  // 1−0.8d = 0.1999999999999999556 and floor(a_dist·10⁶) = 199999 (NOT
  // 200000); 0.6 rounds DOWN, so b_dist = 1−0.6d = double(0.4) exactly.
  // The silhouette ratio (b−a)/b = 3602879701896398/7205759403792794 =
  // 0.5·(1+2⁻⁵²·…) rounds to 0.5+1ulp, ·10⁶ = 500000.00000000011 →
  // floor = 500000. Basis points score a = 0, b = 1 → sil = 1000000.
  private val basisRows: Seq[(Long, Seq[Float])] =
    (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == i) 1f else 0f))
    } ++ Seq(
      (8L, Seq(3f, 4f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (9L, Seq(4f, 3f, 0f, 0f, 0f, 0f, 0f, 0f)),
      (10L, Seq(0f, 0f, 2f, 0f, 0f, 0f, 0f, 0f)))

  test("q396 silhouette matches the hand-computed basis fixture") {
    val d = writeEmb(basisRows)
    val out = ClusterQualityQueries.defs("q396_silhouette")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // cell 0: {e_0: 10⁶, vec9: 500000} → mean (1500000 div 2) = 750000;
    // cell 1 mirrors; cell 2: {e_2, 2·e_2} both 10⁶; cells 3..7: {e_i} 10⁶.
    val expected = Array(
      (0L, 2L, 2L, 750000L, 500000L, 1000000L),
      (1L, 2L, 2L, 750000L, 500000L, 1000000L),
      (2L, 2L, 2L, 1000000L, 1000000L, 1000000L)) ++
      (3 to 7).map(c => (c.toLong, 1L, 1L, 1000000L, 1000000L, 1000000L))
    assert(out.toSeq == expected.toSeq)
  }

  test("q397 Davies-Bouldin matches the hand-computed basis fixture") {
    val d = writeEmb(basisRows)
    val out = ClusterQualityQueries.defs("q397_davies_bouldin")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        optLong(r, "d_i_ppm"), optLong(r, "db_index_ppm")))
    // Scatters: S_0 = S_1 = (0+199999) div 2 = 99999; S_2..S_7 = 0.
    // All M = 10⁶ → ratio(i,j) = S_i + S_j exactly. D_0 = D_1 =
    // 99999+99999 = 199998; D_2..D_7 = 0+99999 = 99999. DB index =
    // (2·199998 + 6·99999) div 8 = 999990 div 8 = 124998.
    val db = Some(124998L)
    val expected = Seq(
      (0L, 2L, 99999L, Some(199998L), db),
      (1L, 2L, 99999L, Some(199998L), db),
      (2L, 2L, 0L, Some(99999L), db)) ++
      (3 to 7).map(c => (c.toLong, 1L, 0L, Some(99999L), db))
    assert(out.toSeq == expected)
  }

  test("coincident centroids fail closed: NULL silhouettes at b=0, NULL DB index") {
    // All 8 "centroids" are e_0 → every separation M = floor((1−1)·10⁶) = 0.
    // Every point lands in cell 0 (first-max tie rule). The 8 on-centroid
    // points have a = b = 0 → NULL silhouette (never a fabricated score);
    // vec 8 = (3,4,…) has a = b = 1−0.6d > 0 → silhouette exactly 0.
    // q397: scatter = {cell 0}; every m-pair needs BOTH cells populated →
    // di is empty → D_0 NULL → the index poisons to NULL.
    val rows = (0 until 8).map { i =>
      (i.toLong, Seq.tabulate(8)(j => if (j == 0) 1f else 0f))
    } :+ ((8L, Seq(3f, 4f, 0f, 0f, 0f, 0f, 0f, 0f): Seq[Float]))
    val d = writeEmb(rows)
    val sil = ClusterQualityQueries.defs("q396_silhouette")(spark, d).collect()
    assert(sil.length == 1)
    val s0 = sil(0)
    assert((s0.getLong(0), s0.getLong(1), s0.getLong(2)) == ((0L, 9L, 1L)))
    assert((optLong(s0, "mean_sil_ppm"), optLong(s0, "min_sil_ppm"),
      optLong(s0, "max_sil_ppm")) == ((Some(0L), Some(0L), Some(0L))))
    val db = ClusterQualityQueries.defs("q397_davies_bouldin")(spark, d).collect()
    assert(db.length == 1)
    // S_0 = (8·0 + floor((1−0.6d)·10⁶)) div 9 = 400000 div 9 = 44444
    assert((db(0).getLong(0), db(0).getLong(1), db(0).getLong(2)) ==
      ((0L, 9L, 44444L)))
    assert(optLong(db(0), "d_i_ppm").isEmpty && optLong(db(0), "db_index_ppm").isEmpty)
  }

  // ---- textbook driver replay over random corpora -------------------------

  /** The engine's documented double ops, replayed with plain loops. */
  private def dot(a: Seq[Float], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i); i += 1 }
    s
  }
  private def dotD(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** (cell, a_dist, b_dist) per point: explicit max scans, first-max tie
    * rule — not the engine's array_sort/array_position path. */
  private def pointReplay(rows: Seq[(Long, Seq[Float])])
      : Seq[(Long, Int, Double, Double)] = {
    val cents = rows.sortBy(_._1).take(K).map(_._2.map(_.toDouble))
    val cn = cents.map(c => math.sqrt(dotD(c, c)))
    rows.map { case (id, v) =>
      val n = math.sqrt(dot(v, v.map(_.toDouble)))
      val scores = cents.indices.map(c => dot(v, cents(c)) / (n * cn(c)))
      var best = 0
      scores.indices.foreach(i => if (scores(i) > scores(best)) best = i)
      var second = Double.NegativeInfinity
      scores.indices.foreach(i => if (i != best && scores(i) > second) second = scores(i))
      // engine's b_sim is sorted(K-1): under a tie at the max it equals
      // a_sim; the explicit scan above already yields that (some other
      // index holds the tied max).
      (id, best, 1.0 - scores(best), 1.0 - second)
    }
  }

  private def floorPpm(x: Double): Long = math.floor(x * 1000000).toLong

  private def silReplay(rows: Seq[(Long, Seq[Float])])
      : Seq[(Long, Long, Long, Option[Long], Option[Long], Option[Long])] = {
    val pts = pointReplay(rows)
    pts.groupBy(_._2).toSeq.sortBy(_._1).map { case (cell, ms) =>
      val sils = ms.flatMap { case (_, _, a, b) =>
        if (b > 0.0) Some(floorPpm((b - a) / b)) else None
      }
      val mean = if (sils.isEmpty) None
        else Some((sils.map(BigInt(_)).sum / sils.size).toLong)
      (cell.toLong, ms.size.toLong, sils.size.toLong, mean,
        if (sils.isEmpty) None else Some(sils.min),
        if (sils.isEmpty) None else Some(sils.max))
    }
  }

  private def dbReplay(rows: Seq[(Long, Seq[Float])])
      : (Seq[(Long, Long, Long, Option[Long])], Option[Long]) = {
    val cents = rows.sortBy(_._1).take(K).map(_._2.map(_.toDouble))
    val cn = cents.map(c => math.sqrt(dotD(c, c)))
    val pts = pointReplay(rows)
    val scatter = pts.groupBy(_._2).toSeq.sortBy(_._1).map { case (cell, ms) =>
      val sa = ms.map(m => BigInt(floorPpm(m._3))).sum
      (cell, ms.size.toLong, (sa / ms.size).toLong)
    }
    // engine: NULL-producing pairs drop from max(ratio_ppm) — a D_i is
    // NULL only when EVERY pair is degenerate (or no partner exists)
    val di2 = scatter.map { case (i, _, si) =>
      val defined = scatter.collect { case (j, _, sj) if j != i =>
        val m = floorPpm(1.0 - dotD(cents(i), cents(j)) / (cn(i) * cn(j)))
        if (m == 0L) None else Some((BigInt(si + sj) * 1000000 / m).toLong)
      }.flatten
      i -> (if (defined.nonEmpty) Some(defined.max) else None)
    }.toMap
    val db = if (scatter.nonEmpty && scatter.forall(s => di2(s._1).isDefined))
      Some((scatter.map(s => BigInt(di2(s._1).get)).sum / scatter.size).toLong)
    else None
    (scatter.map { case (c, n, s) => (c.toLong, n, s, di2(c)) }, db)
  }

  private def cases[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(396397L)
    var attempts = 0
    while (run < n && attempts < n * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run == n, s"generator too restrictive: only $run of $n cases")
  }

  private val corpusGen: Gen[Seq[(Long, Seq[Float])]] = for {
    dim <- Gen.choose(4, 6)
    n <- Gen.choose(K + 1, K + 8)
    vecs <- Gen.listOfN(n, Gen.listOfN(dim,
      Gen.choose(-3, 3).map(_.toFloat)).suchThat(_.exists(_ != 0f)))
  } yield vecs.zipWithIndex.map { case (v, i) => (i.toLong, v: Seq[Float]) }

  test("q396/q397 match the textbook driver replay on random corpora") {
    cases(corpusGen, 5) { rows =>
      val d = writeEmb(rows)
      val silOut = ClusterQualityQueries.defs("q396_silhouette")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          optLong(r, "mean_sil_ppm"), optLong(r, "min_sil_ppm"),
          optLong(r, "max_sil_ppm"))).toSeq
      assert(silOut == silReplay(rows), s"q396 divergence on $rows")
      val (expScatter, expDb) = dbReplay(rows)
      val dbOut = ClusterQualityQueries.defs("q397_davies_bouldin")(spark, d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          optLong(r, "d_i_ppm"))).toSeq
      val dbIdx = ClusterQualityQueries.defs("q397_davies_bouldin")(spark, d)
        .collect().map(r => optLong(r, "db_index_ppm")).distinct.toSeq
      assert(dbOut == expScatter, s"q397 per-cell divergence on $rows")
      assert(dbIdx == Seq(expDb), s"q397 index divergence on $rows")
    }
  }
}
