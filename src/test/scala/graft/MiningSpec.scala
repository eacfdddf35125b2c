package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Unit coverage for the mining round: Apriori-style support counting on
  * crafted baskets, degree assortativity's closed-form on a star graph,
  * and the streaming CMS counter state across micro-batches.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  test("itemset supports: pair support counted per basket, subset-closed") {
    // baskets: {a,b,c}, {a,b}, {a,c} -> supp(a)=3, (a,b)=2, (a,c)=2,
    // (b,c)=1, (a,b,c)=1 <= min(pair supports) (Apriori monotonicity)
    val b = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "c")).toDF("bid", "item")
    val pairs = b.as("x").join(b.as("y"),
        col("x.bid") === col("y.bid") && col("x.item") < col("y.item"))
      .groupBy(col("x.item").as("ia"), col("y.item").as("ib"))
      .agg(count(lit(1)).as("supp"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pairs == Map(("a", "b") -> 2L, ("a", "c") -> 2L, ("b", "c") -> 1L))
    val triple = b.as("x").join(b.as("y"),
        col("x.bid") === col("y.bid") && col("x.item") < col("y.item"))
      .join(b.as("z"),
        col("x.bid") === col("z.bid") && col("y.item") < col("z.item"))
      .count()
    assert(triple == 1L)
    assert(pairs.values.forall(_ >= 1L)) // every triple subset is frequent
  }

  test("assortativity: star graph is maximally disassortative (r -> -1)") {
    // star K1,4: hub deg 4, leaves deg 1. Symmetrized moments:
    // n=8, sx=8*... pairs (4,1)x4 and (1,4)x4 -> sx=20, sxx=68, sxy=32
    // r = (8*32-400)/(8*68-400) = -144/144 = -1
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("u", "v")
    val deg = e.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("deg"))
    val st = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(count(lit(1)).as("ne"), sum(col("du") + col("dv")).as("sx"),
        sum(col("du") * col("du") + col("dv") * col("dv")).as("sxx"),
        sum(col("du") * col("dv") * 2).as("sxy"))
      .head()
    val (ne, sx, sxx, sxy) =
      (st.getLong(0) * 2, st.getLong(1), st.getLong(2), st.getLong(3))
    val r = (ne * sxy - sx * sx).toDouble / (ne * sxx - sx * sx).toDouble
    assert(r == -1.0)
  }

  test("common neighbors: diamond graph scores the missing edge, skips true edges") {
    // edges 12,13,14,23,24 (diamond, missing 34): non-edge (3,4) has
    // common {1,2} -> common=2, d3=d4=2, jaccard = 2/(2+2-2) = 1e6 ppm
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("u", "v")
    val adj = e.select(col("u").as("n"), col("v").as("nb"))
      .unionAll(e.select(col("v").as("n"), col("u").as("nb")))
    val deg = adj.groupBy("n").agg(count(lit(1)).as("deg"))
    val pairs = adj.as("x").join(adj.as("y"),
        col("x.n") === col("y.n") && col("x.nb") < col("y.nb"))
      .groupBy(col("x.nb").as("a"), col("y.nb").as("b"))
      .agg(count(lit(1)).as("common"))
      .join(e.select(col("u").as("a"), col("v").as("b")), Seq("a", "b"),
        "left_anti")
      .join(deg.select(col("n").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("deg").as("db")), Seq("b"))
      .withColumn("j", expr("common * 1000000 div (da + db - common)"))
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"),
        r.getAs[Long]("common"), r.getAs[Long]("j")))
    assert(pairs.toSeq == Seq((3L, 4L, 2L, 1000000L)))
  }

  test("pareto share: top-k integer thresholds select exactly the biggest") {
    // revenues 100,50,30,20 (n=4): top-25% (rnk*4<=n) = {100};
    // top-50% = {100,50}; shares 500000 and 750000 ppm of 200
    val rev = Seq((1L, 100L), (2L, 50L), (3L, 30L), (4L, 20L))
      .toDF("k", "rev")
    val ranked = rev.withColumn("rnk",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("rev").desc, col("k"))))
    val r = ranked.agg(
      sum(when(col("rnk") * 4 <= 4, col("rev")).otherwise(0L)),
      sum(when(col("rnk") * 2 <= 4, col("rev")).otherwise(0L))).head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 150L)
  }

  test("dHash: gradient bits, zero-padding, popcount") {
    // bytes [5,3,3,7] resized to 5 -> padded [5,3,3,7,0]
    // bits: 5>3 -> b0; 3>3 no; 3<7 no; 7>0 -> b3  => hash 0b1001 = 9, pop 2
    val df = Seq((1L, Array[Byte](5, 3, 3, 7))).toDF("doc_id", "payload")
    val got = graft.llm.Multimodal.dHash(df, "doc_id", "payload", resizeTo = 5)
      .head()
    assert(got.getLong(1) == 9L)
    assert(got.getLong(2) == 2L)
  }

  test("hll intersection: inclusion-exclusion over merged registers is consistent") {
    val m = 64
    def regs(keys: Seq[String]): Map[Long, Int] =
      keys.toDF("k")
        .select(graft.llm.Hll.jCol(col("k"), m).as("j"),
          graft.llm.Hll.rhoCol(col("k"), m).as("rho"))
        .groupBy("j").agg(max("rho").as("rho"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val bits = graft.llm.Hll.rhoBits(m)
    def est(r: Map[Long, Int]): Double = {
      val s = (0 until m).map(j => 1L << (bits + 1 - r.getOrElse(j.toLong, 0))).sum
      graft.llm.Hll.numerator(m) / s
    }
    val a = (1 to 60).map(i => s"u$i")
    val b = (31 to 90).map(i => s"u$i") // true intersection 30
    val union = (regs(a).toSeq ++ regs(b).toSeq)
      .groupBy(_._1).map { case (j, vs) => j -> vs.map(_._2).max }
    val (ea, eb, eu) = (est(regs(a)), est(regs(b)), est(union))
    // exact structural properties (estimates carry sketch variance, so no
    // tight numeric bound): register-max union dominates both sides, and
    // inclusion-exclusion stays inside (0, min side) + sketch slack
    assert(eu >= ea && eu >= eb) // su <= sa, sb register-wise
    val inter = ea + eb - eu
    assert(inter > 0.0 && inter < math.min(ea, eb))
    // disjoint sets: union registers = elementwise max of independents,
    // intersection estimate collapses toward 0 vs the overlapping case
    val c = (1000 to 1060).map(i => s"v$i")
    val unionAC = (regs(a).toSeq ++ regs(c).toSeq)
      .groupBy(_._1).map { case (j, vs) => j -> vs.map(_._2).max }
    val interAC = est(regs(a)) + est(regs(c)) - est(unionAC)
    assert(interAC < inter, s"disjoint estimate $interAC >= overlap $inter")
  }

  test("negative sampling: hash candidates never include true edges or self") {
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v") // triangle 1-2-3
    val nodes = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node"))).distinct()
    val probes = nodes
      .select(col("node"), explode(expr("sequence(0, 5)")).as("j"))
      .withColumn("cand",
        expr("1 + cast(conv(substr(md5(cast(node as string) || '|' " +
          "|| cast(j as string)), 1, 8), 16, 10) as long) % 3"))
      .where(col("cand") =!= col("node"))
      .withColumn("cu", least(col("node"), col("cand")))
      .withColumn("cv", greatest(col("node"), col("cand")))
    val negs = probes.join(e.select(col("u").as("cu"), col("v").as("cv")),
      Seq("cu", "cv"), "left_anti")
    assert(negs.count() == 0) // K3 on {1,2,3}: every non-self pair IS an edge
    val eSparse = Seq((1L, 2L)).toDF("u", "v")
    val negs2 = probes.join(
      eSparse.select(col("u").as("cu"), col("v").as("cv")),
      Seq("cu", "cv"), "left_anti")
      .select(col("node"), col("cand")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(negs2.forall { case (n, c) => n != c && Set(n, c) != Set(1L, 2L) })
  }

  test("posting gaps: adjacent deltas, varint bits from binary length") {
    val posts = Seq((10L, "t"), (17L, "t"), (42L, "t")).toDF("doc_id", "term")
    val row = posts.groupBy("term")
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"),
        count(lit(1)).as("df"))
      .withColumn("gaps", expr(
        "zip_with(slice(docs, 2, cast(df as int) - 1), " +
          "slice(docs, 1, cast(df as int) - 1), (a, b) -> a - b)"))
      .select(expr("array_max(gaps)"), expr("aggregate(gaps, 0L, (a,x) -> a+x)"),
        length(bin(expr("array_max(gaps)"))))
      .head()
    assert(row.getLong(0) == 25L)      // gaps [7, 25]
    assert(row.getLong(1) == 32L)      // 42 - 10
    assert(row.getInt(2) == 5)         // bin(25) = '11001'
  }

  test("concurrency sweep: close sorts before open at the same instant") {
    // intervals [0,10), [10,20): at t=10 the first closes BEFORE the
    // second opens -> peak 1, not 2; overlapping [0,10),[5,15) -> peak 2 at 5
    def peak(iv: Seq[(Long, Long)]): (Long, Long) = {
      val deltas = iv.zipWithIndex.flatMap { case ((s, e), i) =>
        Seq((s, 1L, i.toLong), (e, -1L, i.toLong)) }
        .sortBy { case (t, d, id) => (t, d, id) }
      var cur = 0L; var pk = Long.MinValue; var tp = 0L
      deltas.foreach { case (t, d, _) =>
        cur += d; if (cur > pk) { pk = cur; tp = t } }
      (pk, tp)
    }
    assert(peak(Seq((0L, 10L), (10L, 20L))) == (1L, 0L))
    assert(peak(Seq((0L, 10L), (5L, 15L))) == (2L, 5L))
    assert(peak(Seq((0L, 30L), (5L, 15L), (20L, 25L))) == (2L, 5L)) // FIRST peak
  }

  test("streaming concurrencyPeak: peak and first instant carry across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.KeyedObs]
    val q = Streaming.concurrencyPeak(mem.toDS())
      .writeStream.format("memory").queryName("conc_test")
      .outputMode("append").start()
    try {
      // batch 1: open@0, open@5 -> cur 2, peak 2 @5
      mem.addData(Streaming.KeyedObs(1L, 0L, 1L, 1L),
        Streaming.KeyedObs(1L, 5L, 2L, 1L))
      q.processAllAvailable()
      // batch 2: close@10, open@12, open@13 -> cur 3, peak 3 @13;
      // then a later equal peak must NOT move the instant
      mem.addData(Streaming.KeyedObs(1L, 10L, 3L, -1L),
        Streaming.KeyedObs(1L, 12L, 4L, 1L),
        Streaming.KeyedObs(1L, 13L, 5L, 1L))
      q.processAllAvailable()
      mem.addData(Streaming.KeyedObs(1L, 20L, 6L, -1L),
        Streaming.KeyedObs(1L, 21L, 7L, 1L)) // back to 3: tie, keep @13
      q.processAllAvailable()
      val last = spark.table("conc_test").where(col("seen") === 7L)
        .collect().map(r => (r.getAs[Long]("cur"), r.getAs[Long]("peak"),
          r.getAs[Long]("t_at_peak")))
      assert(last.toSeq == Seq((3L, 3L, 13L)))
    } finally q.stop()
  }

  test("windowedEnergy: partial tail window, zero-byte energy, maxWindows cap") {
    // payload "AB" + 0x80: bytes 65,66,128 -> win=2: [65,66] then [128]
    // energies: (65-128)^2+(66-128)^2 = 3969+3844 = 7813; (128-128)^2 = 0
    val df = Seq((1L, Array[Byte](65, 66, -128)),
      (2L, Array.fill[Byte](10)(70))) // 5 full windows, cap at 3
      .toDF("doc_id", "payload")
    val got = graft.llm.Multimodal
      .windowedEnergy(df, "doc_id", "payload", win = 2, maxWindows = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((1L, 0L)) == (2L, 7813L))
    assert(got((1L, 1L)) == (1L, 0L))
    assert(got.keys.count(_._1 == 2L) == 3) // capped at maxWindows
    assert(got((2L, 0L)) == (2L, 2 * 58L * 58L))
  }

  test("bitmap retention: AND of week bitmaps counts exactly the returning users") {
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 64L), (2L, 2L), (2L, 64L),
      (2L, 65L)).toDF("week", "id") // week2 keeps {2, 64}, adds 65
    val words = rows
      .select(col("week"), expr("id div 64").as("word"),
        expr("shiftleft(1L, cast(id % 64 as int))").as("bit"))
      .groupBy(col("week"), col("word")).agg(expr("bit_or(bit)").as("bits"))
    val retained = words.as("a").join(words.as("b"),
        col("a.word") === col("b.word") && col("b.week") === col("a.week") + 1)
      .select(col("a.bits").bitwiseAND(col("b.bits")).as("band"))
      .agg(sum(expr("bit_count(band)"))).head().getLong(0)
    assert(retained == 2L) // users 2 and 64 returned; 1 churned, 65 is new
  }

  test("streaming cmsRowSquares: counters persist across batches; sum of squares grows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.CmsObs]
    val q = Streaming.cmsRowSquares(mem.toDS(), width = 8)
      .writeStream.format("memory").queryName("cms_test")
      .outputMode("append").start()
    try {
      // batch 1, row 0: buckets 1,1,2 -> counters [0,2,1,...] -> e = 5
      mem.addData(Streaming.CmsObs(0L, 1L), Streaming.CmsObs(0L, 1L),
        Streaming.CmsObs(0L, 2L))
      q.processAllAvailable()
      // batch 2, row 0: bucket 1 again -> [0,3,1] -> e = 10
      mem.addData(Streaming.CmsObs(0L, 1L))
      q.processAllAvailable()
      val got = spark.table("cms_test").collect()
        .map(r => (r.getAs[Long]("seen"), r.getAs[Long]("e"))).toSet
      assert(got == Set((3L, 5L), (4L, 10L)))
    } finally q.stop()
  }
}
