package graft

import org.apache.spark.sql.functions._

import graft.functions.Ilog2
import graft.queries.ExperimentQueries

/** Round-11 experimentation-statistics tests: PSI, Neyman allocation,
  * and CUPED recomputed on sf0.001 by independent driver-side BigInt
  * implementations, plus the fail-closed degenerate paths (zero
  * pre-period variance, constant stratum) and plan locks. */
class ExperimentSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def isqrt(x: BigInt): Long = {
    require(x >= 0); if (x == 0) 0L else {
      var r = BigInt(math.sqrt(x.toDouble).toLong).max(1) - 1
      while ((r + 1) * (r + 1) <= x) r += 1
      r.toLong
    }
  }

  test("q351: smoothed PSI matches an Ilog2 recount") {
    val ev = graft.io.Tables.events(spark, sf).select(
        col("event_type"), dayofmonth(col("ts")),
        expr("cast(get_json_object(props, '$.k') as long) div 10"))
      .collect().map(r => (r.getString(0), r.getInt(1) <= 15, r.getLong(2)))
    val out = ExperimentQueries.q351_psi(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    val buckets = ev.map(_._3).distinct.sorted
    for ((g, rows) <- ev.groupBy(_._1)) {
      val a = rows.filter(_._2); val b = rows.filterNot(_._2)
      val na1 = a.size.toLong + buckets.size
      val nb1 = b.size.toLong + buckets.size
      val num = buckets.map { bk =>
        val ca1 = a.count(_._3 == bk).toLong + 1
        val cb1 = b.count(_._3 == bk).toLong + 1
        val dlog = Ilog2.impl(ca1) - Ilog2.impl(na1) -
          Ilog2.impl(cb1) + Ilog2.impl(nb1)
        (BigInt(ca1) * nb1 - BigInt(cb1) * na1) * dlog
      }.sum
      val psi = num / (BigInt(na1) * nb1)
      val r = out(g)
      assert(r.getAs[Long]("na1") == na1 && r.getAs[Long]("nb1") == nb1,
        s"$g totals")
      assert(r.getAs[Long]("psi_fp") == psi.toLong, s"$g psi")
      assert(r.getAs[Boolean]("drifted") == (psi >= Ilog2.One / 4), s"$g gate")
    }
  }

  test("q352: Neyman allocation matches an Isqrt recount and spends the budget") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val out = ExperimentQueries.q352_neyman(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val per = docs.groupBy(_._1).view.mapValues { g =>
      val n = BigInt(g.size); val sv = BigInt(g.map(_._2).sum)
      val svv = g.map(v => BigInt(v._2) * v._2).sum
      val sd = isqrt((n * svv - sv * sv) * 10000 / (n * n))
      (g.size.toLong, sd, g.size.toLong * sd)
    }.toMap
    val wTot = BigInt(per.values.map(_._3).sum)
    val nTot = BigInt(docs.size)
    per.foreach { case (src, (nH, sd, wH)) =>
      val r = out(src)
      assert(r.getAs[Long]("n_h") == nH && r.getAs[Long]("sd_centi") == sd,
        s"$src moments")
      assert(r.getAs[Long]("alloc_neyman") ==
        (BigInt(10000) * wH / wTot).toLong, s"$src neyman")
      assert(r.getAs[Long]("alloc_prop") ==
        (BigInt(10000) * nH / nTot).toLong, s"$src prop")
    }
    // floored allocations must not overspend, and can undershoot by at
    // most one unit per stratum
    val spent = out.values.map(_.getAs[Long]("alloc_neyman")).sum
    assert(spent <= 10000L && spent >= 10000L - per.size, "budget")
  }

  test("q352: a constant stratum draws a zero Neyman allocation") {
    import spark.implicits._
    val docs = (Seq.fill(50)(("flat", 100L)) ++
      (1 to 50).map(i => ("vary", 50L + i * 7)))
      .toDF("source", "v")
    val out = {
      // same moment pipeline as q352, applied to a toy frame
      val df = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_h"), sum(col("v")).cast("decimal(38,0)").as("sv"),
          sum(expr("cast(v as decimal(38,0)) * v")).as("svv"))
        .withColumn("sd_centi", graft.functions.Isqrt.isqrt(expr(
          """cast((n_h * svv - sv * sv) * 10000
               div (cast(n_h as decimal(38,0)) * n_h) as bigint)""")))
      df.collect().map(r => r.getAs[String]("source") ->
        r.getAs[Long]("sd_centi")).toMap
    }
    assert(out("flat") == 0L && out("vary") > 0L)
  }

  test("q353: theta, adjusted means, and variance ratio match a recount") {
    val ev = graft.io.Tables.events(spark, sf).select(
        col("user_id"), dayofmonth(col("ts")),
        expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getLong(0), r.getInt(1) <= 15, r.getLong(2)))
    val out = ExperimentQueries.q353_cuped(spark, sf).collect()
      .map(r => r.getAs[Long]("arm") -> r).toMap
    val users = ev.groupBy(_._1).toSeq.map { case (u, rs) =>
      (u, rs.filter(_._2).map(_._3).sum, rs.filterNot(_._2).map(_._3).sum,
        rs.count(!_._2))
    }.filter(_._4 > 0)
    val n = BigInt(users.size)
    val sx = BigInt(users.map(_._2).sum); val sy = BigInt(users.map(_._3).sum)
    val sxx = users.map(u => BigInt(u._2) * u._2).sum
    val sxy = users.map(u => BigInt(u._2) * u._3).sum
    val theta = (n * sxy - sx * sy) * 1000000 / (n * sxx - sx * sx)
    val meanX = sx * 1000000 / n
    val adj = users.map { case (u, x, y, _) =>
      (u, BigInt(y) * 1000000 - theta * (BigInt(x) * 1000000 - meanX) / 1000000)
    }
    for (arm <- Seq(0L, 1L)) {
      val au = users.filter(u => u._1 % 2 == arm)
      val aa = adj.filter(a => a._1 % 2 == arm).map(_._2)
      val nA = BigInt(au.size)
      val syA = BigInt(au.map(_._3).sum)
      val syyA = au.map(u => BigInt(u._3) * u._3).sum
      val saA = aa.sum; val saaA = aa.map(a => a * a).sum
      val varY = (nA * syyA - syA * syA) / (nA * nA)
      val varAdj = (nA * saaA - saA * saA) / (nA * nA * BigInt("1000000000000"))
      val r = out(arm)
      assert(r.getAs[Long]("n_users") == au.size.toLong, s"arm $arm n")
      assert(r.getAs[Long]("theta_ppm") == theta.toLong, s"arm $arm theta")
      assert(r.getAs[Long]("mean_y_ppm") == (syA * 1000000 / nA).toLong)
      assert(r.getAs[Long]("mean_adj_ppm") == (saA / nA).toLong, s"arm $arm adj")
      assert(r.getAs[Long]("var_y_cents2") == varY.toLong, s"arm $arm var_y")
      assert(r.getAs[Long]("var_adj_cents2") == varAdj.toLong, s"arm $arm var_a")
      assert(r.getAs[Long]("var_ratio_ppm") ==
        (varAdj * 1000000 / varY).toLong, s"arm $arm ratio")
    }
    // the method's contract: adjustment must not inflate variance much —
    // and on correlated pre/post spend it should genuinely reduce it
    assert(out.values.forall(_.getAs[Long]("var_ratio_ppm") < 1100000L),
      "CUPED inflated variance")
  }

  test("q353: zero pre-period variance fails closed to NULL theta") {
    import spark.implicits._
    // every user has identical pre-period total -> var(x) = 0
    val ev = (1 to 8).flatMap { u =>
      Seq((u.toLong, 1, 500L), (u.toLong, 0, 100L + u))
    }.toDF("user_id", "pre", "cents")
    val users = ev.groupBy(col("user_id"))
      .agg(sum(when(col("pre") === 1, col("cents")).otherwise(0L)).as("x"),
        sum(when(col("pre") === 0, col("cents")).otherwise(0L)).as("y"))
      .withColumn("arm", pmod(col("user_id"), lit(2)))
    val mom = users.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("decimal(38,0)").as("sx"),
      sum(col("y")).cast("decimal(38,0)").as("sy"),
      sum(expr("cast(x as decimal(38,0)) * x")).as("sxx"),
      sum(expr("cast(x as decimal(38,0)) * y")).as("sxy"))
    val t = users.crossJoin(broadcast(mom))
      .withColumn("theta_ppm", expr(
        """cast((n * sxy - sx * sy) * 1000000
             div nullif(n * sxx - sx * sx, 0) as bigint)"""))
      .select(col("theta_ppm")).distinct().collect()
    assert(t.length == 1 && t(0).isNullAt(0))
  }

  test("q355: segment SRM chi-square matches a recount; collapse is exact") {
    val ev = graft.io.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = ExperimentQueries.q355_srm(spark, sf).collect()
      .map(r => r.getAs[String]("segment") -> r).toMap
    val segs = ev.groupBy(_._1).view
      .mapValues(_.map(_._2).distinct.toSeq).toMap +
      ("overall" -> ev.map(_._2).distinct.toSeq)
    assert(out.size == segs.size)
    for ((seg, us) <- segs) {
      val n0 = us.count(_ % 2 == 0).toLong; val n1 = us.size - n0
      val chi2 = BigInt(n0 - n1) * (n0 - n1) * 1000000 / (n0 + n1)
      val r = out(seg)
      assert(r.getAs[Long]("n0") == n0 && r.getAs[Long]("n1") == n1,
        s"$seg counts")
      assert(r.getAs[Long]("chi2_ppm") == chi2.toLong, s"$seg chi2")
      assert(r.getAs[Boolean]("srm") == (chi2 > 3841459L), s"$seg gate")
      // the two-equal-cell collapse: (n0-n1)^2/n == sum (O-E)^2/E
      val e = (n0 + n1) / 2.0
      val full = (math.pow(n0 - e, 2) + math.pow(n1 - e, 2)) / e
      assert(math.abs(full * 1e6 - chi2.toDouble) <= 1e6,
        s"$seg collapse drifted: $full vs $chi2")
    }
  }

  // Plan locks: q351/q352 are single-pass aggregates over corpus rows with
  // bounded-frame joins after — no window anywhere, broadcast-only joins;
  // q353 is two grouped passes with a one-row broadcast — no window, and
  // the per-user frame must not funnel before its broadcast join.
  test("plan shapes: no windows; experiment joins broadcast only") {
    for ((q, name) <- Seq(
        (ExperimentQueries.q351_psi, "q351"),
        (ExperimentQueries.q352_neyman, "q352"),
        (ExperimentQueries.q353_cuped, "q353"),
        (ExperimentQueries.q355_srm, "q355"))) {
      val p = q(spark, sf).queryExecution.executedPlan.toString()
      assert(!p.contains("Window"), s"$name grew a window:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
        s"$name lost a broadcast:\n$p")
    }
  }
}
