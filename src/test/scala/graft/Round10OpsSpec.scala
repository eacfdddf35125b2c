package graft

import org.apache.spark.sql.functions._

import graft.queries.{AgreementTestQueries, EvalQueries}

/** Round-10 evaluation-statistics tests: each new statistic is cross-
  * checked against an INDEPENDENT computation (naive all-pairs, float
  * reference, or hand algebra) on sf0.001 — the DuckDB oracle certifies
  * cross-engine exactness; these certify the statistics themselves. */
class Round10OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("q326: signed rho^2 matches float Pearson-on-average-ranks") {
    val out = EvalQueries.q326_spearman(spark, sf).collect()
    assert(out.nonEmpty)
    // independent float reference: tie-averaged ranks via a different
    // formulation (avg of row_numbers over the tie block), then corr()
    val li = graft.io.Tables.lineitem(spark, sf).select(
      expr("year(l_shipdate) * 100 + month(l_shipdate)").cast("long").as("ym"),
      col("l_quantity").cast("long").as("qv"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("pv"))
    val ranked = li
      .withColumn("rx", expr(
        "avg(cast(row_number() over (partition by ym order by qv, pv, monotonically_increasing_id()) as double))" +
          " over (partition by ym, qv)"))
      .withColumn("ry", expr(
        "avg(cast(row_number() over (partition by ym order by pv, qv, monotonically_increasing_id()) as double))" +
          " over (partition by ym, pv)"))
    val ref = ranked.groupBy(col("ym")).agg(corr(col("rx"), col("ry")).as("rho"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    out.foreach { r =>
      val ym = r.getAs[Long]("ym")
      val got = r.getAs[Long]("rho2_bp_signed").toDouble / 10000.0
      val want = { val x = ref(ym); math.signum(x) * x * x }
      assert(math.abs(got - want) < 2e-4, s"ym=$ym got=$got want=$want")
    }
  }

  test("q327: grid C/D/ties match a naive all-pairs count") {
    val rows = graft.io.Tables.lineitem(spark, sf).select(
        col("l_returnflag"), col("l_quantity").cast("long"),
        expr("cast(round(l_discount * 100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = EvalQueries.q327_kendall_grid(spark, sf).collect()
      .map(r => r.getAs[String]("rf") ->
        (r.getAs[Long]("concordant"), r.getAs[Long]("discordant"),
          r.getAs[Long]("n0"), r.getAs[Long]("tie_a"), r.getAs[Long]("tie_b")))
      .toMap
    rows.groupBy(_._1).foreach { case (rf, g) =>
      var (cc, dd, ta, tb) = (0L, 0L, 0L, 0L)
      for (i <- g.indices; j <- (i + 1) until g.size) {
        val (_, a1, b1) = g(i); val (_, a2, b2) = g(j)
        if (a1 != a2 && b1 != b2) {
          if ((a1 < a2) == (b1 < b2)) cc += 1 else dd += 1
        }
        if (a1 == a2) ta += 1
        if (b1 == b2) tb += 1
      }
      val n0 = g.size.toLong * (g.size - 1) / 2
      assert(out(rf) == ((cc, dd, n0, ta, tb)), s"rf=$rf")
    }
  }

  test("q328: kappa algebra matches a driver-side confusion recount") {
    val out = AgreementTestQueries.q328_cohens_kappa(spark, sf).head()
    val conf = graft.io.Tables.documents(spark, sf).select(
        when(col("n_chars") < 200, 0L).when(col("n_chars") < 350, 1L)
          .otherwise(2L).as("a"),
        when(graft.llm.TextAnalysis.wsTokenCount(col("text")) < 40, 0L)
          .when(graft.llm.TextAnalysis.wsTokenCount(col("text")) < 70, 1L)
          .otherwise(2L).as("b"))
      .groupBy("a", "b").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val n = conf.values.sum
    val agree = conf.collect { case ((a, b), c) if a == b => c }.sum
    val rk = conf.groupBy(_._1._1).view.mapValues(_.values.sum)
    val ck = conf.groupBy(_._1._2).view.mapValues(_.values.sum)
    val chance = (for (k <- 0L to 2L)
      yield rk.getOrElse(k, 0L) * ck.getOrElse(k, 0L)).sum
    assert(out.getAs[Long]("n") == n)
    assert(out.getAs[Long]("agree") == agree)
    assert(out.getAs[Long]("chance") == chance)
    assert(out.getAs[Long]("kappa_ppm") ==
      BigInt(n * agree - chance) * 1000000 / BigInt(n * n - chance))
    // kappa is bounded and, on correlated length tiers, should be positive
    assert(out.getAs[Long]("kappa_ppm") > 0L &&
      out.getAs[Long]("kappa_ppm") <= 1000000L)
  }

  test("q329: discordant counts match a driver-side recount") {
    val out = AgreementTestQueries.q329_mcnemar(spark, sf).head()
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map { r =>
        val truth = r.getString(0) == "en"
        val t = r.getString(1)
        val pa = t.contains(" the ")
        val pb = !(t.contains(" de ") || t.contains(" la ") ||
          t.contains(" und ") || t.contains(" el ") || t.contains(" et "))
        (truth, pa, pb)
      }
    val b = docs.count { case (t, pa, pb) => pa == t && pb != t }.toLong
    val c = docs.count { case (t, pa, pb) => pa != t && pb == t }.toLong
    assert(out.getAs[Long]("b") == b)
    assert(out.getAs[Long]("c") == c)
    val num = math.max(math.abs(b - c) - 1, 0L)
    assert(out.getAs[Long]("mcnemar_ppm") == num * num * 1000000L / (b + c))
  }

  test("q330: observed statistic matches a driver-side recount; p in range") {
    val out = AgreementTestQueries.q330_perm_fdr(spark, sf).collect()
    assert(out.nonEmpty)
    val ev = graft.io.Tables.events(spark, sf).select(
        col("event_type"),
        expr("cast(round(value * 100) as bigint)"),
        expr("case when ((unix_millis(ts) div 86400000) + 4) % 7 in (0, 6)" +
          " then 1 else 0 end"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    out.foreach { r =>
      val g = r.getAs[String]("event_type")
      val rows = ev.filter(_._1 == g)
      val na = rows.count(_._3 == 1).toLong
      val nb = rows.size - na
      val sa = rows.filter(_._3 == 1).map(_._2).sum
      val sb = rows.filter(_._3 == 0).map(_._2).sum
      assert(r.getAs[Long]("n") == rows.size.toLong)
      assert(r.getAs[Long]("n_a") == na)
      assert(r.getAs[Long]("t_obs") == math.abs(sa * nb - sb * na))
      val p = r.getAs[Long]("p_num")
      assert(p >= 1L && p <= 100L, s"g=$g p_num=$p")
    }
  }

  test("q338: S, tie variance, and Sen median match a naive pair recount") {
    val daily = graft.io.Tables.events(spark, sf)
      .groupBy(col("event_type"), expr("unix_millis(ts) div 86400000"))
      .count().collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = EvalQueries.q338_mann_kendall(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    daily.groupBy(_._1).foreach { case (g, rows) =>
      val pts = rows.map(t => (t._2, t._3)).sortBy(_._1)
      val ps = for (i <- pts.indices; j <- (i + 1) until pts.size)
        yield (pts(i), pts(j))
      val sStat = ps.map { case ((_, xi), (_, xj)) =>
        java.lang.Long.signum(xj - xi).toLong }.sum
      val n = pts.size.toLong
      val tie = pts.groupBy(_._2).values
        .map { grp => val t = grp.size.toLong; t * (t - 1) * (2 * t + 5) }.sum
      // JVM / truncates toward zero, same as Spark div and DuckDB //
      val slopes = ps.map { case ((di, xi), (dj, xj)) =>
        (xj - xi) * 1000000L / (dj - di) }.sorted
      val sen = slopes((slopes.size + 1) / 2 - 1)
      val r = out(g)
      assert(r.getAs[Long]("s_stat") == sStat, s"$g S")
      assert(r.getAs[Long]("var18") == n * (n - 1) * (2 * n + 5) - tie, s"$g var")
      assert(r.getAs[Long]("sen_slope_ppm") == sen, s"$g sen")
    }
  }

  // Round-11 hardening lock: Sen's median no longer rides a
  // Window.partitionBy(g) over the PAIR frame (which concentrates every
  // pair of a group in one task at scale) — it is the lower weighted
  // median of the per-slope count frame through WeightedMedian/
  // RunningTotal's range-partitioned prefix sum. The ranking happens in
  // checkpointed passes outside this plan, so the executed plan of q338
  // must contain NO Window operator at all and never funnel through a
  // single partition.
  test("q338 plan shape: no window, no single-partition funnel") {
    val df = EvalQueries.q338_mann_kendall(spark, sf)
    val p = df.queryExecution.executedPlan.toString()
    assert(!p.contains("Window"), s"q338 reintroduced a window:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"q338 funnels through a single partition:\n$p")
  }

  test("q336/q337: distances track float references") {
    val ev = graft.io.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "view"))
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)"),
        expr("(unix_millis(ts) div 3600000) % 24"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val a = ev.filter(_._1 == "click"); val b = ev.filter(_._1 == "view")
    // W1 float reference: integrate |F_A - F_B| over the score grid
    val scores = ev.map(_._2).distinct.sorted
    var (w1, ca, cb) = (0.0, 0L, 0L)
    scores.zip(scores.tail).foreach { case (s0, s1) =>
      ca += a.count(_._2 == s0); cb += b.count(_._2 == s0)
      w1 += math.abs(ca.toDouble / a.size - cb.toDouble / b.size) * (s1 - s0)
    }
    val out = EvalQueries.q336_wasserstein(spark, sf).head()
    assert(math.abs(out.getAs[Long]("w1_cents_ppm").toDouble / 1e6 - w1) < 1e-3)
    // Hellinger float reference over the 24 hour bins
    val bc = (0L until 24L).map { h =>
      math.sqrt((a.count(_._3 == h).toDouble / a.size) *
        (b.count(_._3 == h).toDouble / b.size))
    }.sum
    val out2 = EvalQueries.q337_hellinger(spark, sf).head()
    assert(math.abs(out2.getAs[Long]("bc_ppm").toDouble / 1e6 - bc) < 1e-4)
  }

  // Plan locks for the rank-statistics batch. q326: all four rank/count
  // windows share ONE hashpartitioning(ym) exchange (exchange reuse) —
  // a SinglePartition exchange appearing here means a window lost its
  // partition spec and the whole corpus funnels through one task. q327:
  // the cell-pair join must stay a broadcast join keyed on rf with the
  // a < a2 inequality as a residual condition — domain-bounded build
  // side, corpus never re-shuffled for pair counting.
  test("q326/q327 plan shapes: partitioned windows, broadcast grid join") {
    val p326 = EvalQueries.q326_spearman(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p326.contains("Exchange SinglePartition"),
      s"q326 funnels through a single partition:\n$p326")
    assert(p326.contains("hashpartitioning(ym"),
      s"q326 rank windows no longer partition by ym:\n$p326")
    val p327 = EvalQueries.q327_kendall_grid(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p327.contains("Exchange SinglePartition"),
      s"q327 funnels through a single partition:\n$p327")
    assert(p327.contains("BroadcastHashJoin") ||
      p327.contains("BroadcastNestedLoopJoin"),
      s"q327 cell-pair join is no longer broadcast:\n$p327")
  }

  test("q332: fixed-point H tracks the float Kruskal-Wallis reference") {
    val out = EvalQueries.q332_kruskal_wallis(spark, sf).head()
    val ev = graft.io.Tables.events(spark, sf).select(
        expr("cast(round(value * 100) as bigint)"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val n = ev.length
    // float reference: tie-averaged ranks by sorting
    val ranks = ev.map(_._1).sorted.zipWithIndex
      .groupBy(_._1).view.mapValues(g => g.map(_._2 + 1.0).sum / g.size).toMap
    val byG = ev.groupBy(_._2).view.mapValues(_.map(x => ranks(x._1)))
    val h = 12.0 / (n.toDouble * (n + 1)) *
      byG.values.map(rs => math.pow(rs.sum, 2) / rs.size).sum - 3.0 * (n + 1)
    val tie = ev.map(_._1).groupBy(identity).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val hc = h / (1.0 - tie / (math.pow(n, 3) - n))
    val got = out.getAs[Long]("hc_ppm").toDouble / 1e6
    assert(math.abs(got - hc) < 1e-3, s"got=$got want=$hc")
    assert(out.getAs[Long]("n") == n.toLong)
  }
}
