package graft

import org.apache.spark.sql.functions._

import graft.queries.{CalibrationQueries, EvalQueries, ResamplingQueries}

/** Round-11 resampling-statistics tests: the deterministic Poisson
  * bootstrap and the delete-one-block jackknife are recomputed on
  * sf0.001 by an INDEPENDENT driver-side implementation (JVM md5 draws,
  * BigInt arithmetic) — the DuckDB oracle certifies cross-engine
  * exactness; these certify the statistics and lock the plan shapes. */
class Round11OpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def hash32(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 8), 16)

  private def isqrt(x: Long): Long = {
    require(x >= 0)
    var r = math.max(math.floor(math.sqrt(x.toDouble)).toLong - 1, 0L)
    while ((r + 1) * (r + 1) <= x) r += 1
    r
  }

  test("q342: bootstrap reps, SE, and CI match a JVM md5 recount") {
    val ev = graft.io.Tables.events(spark, sf).select(
        col("event_type"), col("event_id").cast("long"),
        expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = ResamplingQueries.q342_bootstrap_se(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    ev.groupBy(_._1).foreach { case (g, rows) =>
      // per-rep Poisson draws, exactly the engine's hash recipe
      val ms = (1 to 32).flatMap { j =>
        var sv = BigInt(0); var nc = 0L
        rows.foreach { case (_, eid, v) =>
          val u = hash32(s"$eid:$j") % 10000
          val c = if (u < 3679) 0L else if (u < 7358) 1L
            else if (u < 9197) 2L else if (u < 9810) 3L else 4L
          sv += BigInt(c) * v; nc += c
        }
        if (nc > 0) Some(sv * 1000000 / nc) else None
      }
      val b = BigInt(ms.size)
      val se2 = (b * ms.map(m => m * m).sum - ms.sum * ms.sum) /
        (b * (b - 1))
      val se = isqrt(se2.toLong)
      val meanPpm = (BigInt(rows.map(_._3).sum) * 1000000 / rows.size).toLong
      val r = out(g)
      assert(r.getAs[Long]("b_eff") == ms.size.toLong, s"$g b_eff")
      assert(r.getAs[Long]("mean_ppm") == meanPpm, s"$g mean")
      assert(r.getAs[Long]("se_ppm") == se, s"$g se")
      assert(r.getAs[Long]("ci_lo_ppm") == meanPpm - 2 * se &&
        r.getAs[Long]("ci_hi_ppm") == meanPpm + 2 * se, s"$g ci")
      // sanity: the bootstrap SE should be in the ballpark of σ/√n —
      // within a factor of 3 (B=32 reps is noisy, but not 10× noisy)
      val n = rows.size
      val mean = rows.map(_._3).sum.toDouble / n
      val sd = math.sqrt(rows.map(v => math.pow(v._3 - mean, 2)).sum / n)
      val classic = sd / math.sqrt(n) * 1e6
      if (classic > 0)
        assert(se > classic / 3 && se < classic * 3, s"$g se=$se vs $classic")
    }
  }

  test("q343: jackknife influence and variance match a driver recount") {
    val docs = graft.io.Tables.documents(spark, sf)
      .select(col("source"), length(col("text")).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val out = ResamplingQueries.q343_jackknife_sources(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val n = BigInt(docs.size)
    val t = BigInt(docs.map(_._2).sum)
    val per = docs.groupBy(_._1).view
      .mapValues(g => (BigInt(g.size), BigInt(g.map(_._2).sum))).toMap
    val loos = per.map { case (src, (ns, ts)) =>
      src -> (t - ts) * 1000000 / (n - ns) }
    per.foreach { case (src, (ns, ts)) =>
      val r = out.getOrElse(src, fail(s"source $src missing"))
      val meanAll = (t * 1000000 / n).toLong
      assert(r.getAs[Long]("n_s") == ns.toLong &&
        r.getAs[Long]("t_s") == ts.toLong, s"$src sums")
      assert(r.getAs[Long]("mean_all_ppm") == meanAll, s"$src mean")
      assert(r.getAs[Long]("loo_ppm") == loos(src).toLong, s"$src loo")
      assert(r.getAs[Long]("influence_ppm") == loos(src).toLong - meanAll)
      val s = BigInt(per.size)
      val sl = loos.values.sum
      val sll = loos.values.map(x => x * x).sum
      val varJack = ((s - 1) * (s * sll - sl * sl) / (s * s * s)).toLong
      assert(r.getAs[Long]("var_jack_ppm2") == varJack, s"$src var")
    }
  }

  test("q345: conformal quantile and coverage match a driver recount") {
    val ev = graft.io.Tables.events(spark, sf).select(
        col("event_type"), col("event_id").cast("long"),
        expr("cast(round(value * 100) as bigint)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val out = CalibrationQueries.q345_conformal_gate(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    ev.groupBy(_._1).foreach { case (g, rows) =>
      val cal = rows.filter(_._2 % 2 == 0).map(_._3).sorted
      val test = rows.filter(_._2 % 2 != 0).map(_._3)
      val k = (90 * (cal.size + 1) + 99) / 100
      val r = out(g)
      assert(r.getAs[Long]("n_cal") == cal.size.toLong &&
        r.getAs[Long]("n_test") == test.size.toLong &&
        r.getAs[Long]("k") == k.toLong, s"$g counts")
      if (k > cal.size) {
        assert(r.isNullAt(r.fieldIndex("q_hat")) &&
          r.isNullAt(r.fieldIndex("coverage_ppm")) &&
          !r.getAs[Boolean]("meets_nominal"), s"$g degenerate")
      } else {
        val qh = cal(k - 1)
        assert(r.getAs[Long]("q_hat") == qh, s"$g q_hat")
        val covered = test.count(_ <= qh).toLong
        assert(r.getAs[Long]("n_covered") == covered, s"$g covered")
        assert(r.getAs[Long]("coverage_ppm") ==
          covered * 1000000L / test.size, s"$g coverage")
      }
    }
  }

  test("q345: tiny calibration sets and empty test halves fail closed") {
    import spark.implicits._
    // g=a: 4 cal rows (k = ceil(0.9*5) = 5 > 4) -> NULL q_hat/coverage;
    // g=b: 10 cal rows, k = ceil(0.9*11) = 10 -> q_hat = max cal score;
    //      no test rows -> NULL coverage, meets_nominal false
    val rows =
      (0 until 4).map(i => ("a", i.toLong * 2, 10L + i)) ++
      (0 until 3).map(i => ("a", i.toLong * 2 + 1, 100L)) ++
      (0 until 10).map(i => ("b", i.toLong * 2, i.toLong))
    val out = CalibrationQueries.conformalGate(
        rows.toDF("g", "eid", "score"))
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val a = out("a")
    assert(a.isNullAt(a.fieldIndex("q_hat")) &&
      a.isNullAt(a.fieldIndex("coverage_ppm")) &&
      !a.getAs[Boolean]("meets_nominal"))
    val b = out("b")
    assert(b.getAs[Long]("q_hat") == 9L && b.getAs[Long]("n_test") == 0L)
    assert(b.isNullAt(b.fieldIndex("coverage_ppm")) &&
      !b.getAs[Boolean]("meets_nominal"))
  }

  // Plan locks: the bootstrap is pure groupBy algebra — the ×B replica
  // explosion must reach the aggregate with NO window and no
  // single-partition funnel (the q330 replica shape). The jackknife's
  // only single-partition stage is the one-row totals broadcast (a
  // bounded build side), so its lock is window-absence only.
  test("q342/q343 plan shapes: no windows, bootstrap never funnels") {
    val p342 = ResamplingQueries.q342_bootstrap_se(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p342.contains("Window"), s"q342 grew a window:\n$p342")
    val streamed = p342.substring(0,
      math.max(p342.indexOf("BroadcastExchange"), 0) match {
        case 0 => p342.length; case i => i })
    assert(!streamed.contains("Exchange SinglePartition"),
      s"q342 funnels through a single partition:\n$p342")
    val p343 = ResamplingQueries.q343_jackknife_sources(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(!p343.contains("Window"), s"q343 grew a window:\n$p343")
  }
}
