package graft

import org.apache.spark.sql.functions._

import graft.operators.RunningTotal

/** Unit coverage for the audit-statistics round: the winsorize threshold
  * rule (lower percentile = min value with 100·rank ≥ q·n), the Gini
  * coefficient formula over a ranked count distribution, and the
  * chi-square cell algebra — all on crafted inputs with hand-computed
  * expectations, independent of the sf0.01 oracle corpus.
  */
class AuditStatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize thresholds: 100*rank >= q*n picks ceil(q*n)-th value") {
    // 10 values 10..100: p05 -> ceil(0.5)=1st value (10); p95 -> ceil(9.5)=10th (100)
    // 20 values: p05 -> 1st; p95 -> 19th
    val df = (1 to 20).map(i => (i.toLong * 10, i.toLong)).toDF("price", "id")
      .withColumn("g", lit("a")).withColumn("one", lit(1L))
    val ranked = RunningTotal.grouped(df, "g", Seq("price", "id"), "one", "rnk",
      groupCountHint = Some(1L))
    val n = 20L
    def thr(pct: Int): Long = ranked.where(col("rnk") * 100 >= lit(n) * pct)
      .agg(min(col("price"))).head().getLong(0)
    assert(thr(5) == 10)   // ceil(1.0) = 1st
    assert(thr(95) == 190) // ceil(19.0) = 19th
    assert(thr(50) == 100) // ceil(10.0) = 10th
  }

  test("gini of a uniform count distribution is 0; of a concentrated one is high") {
    // uniform: x = [5,5,5,5] -> S = (1+2+3+4)*5 = 50, T=20, n=4
    // gini = (2*50 - 5*20) / (4*20) = 0
    def gini(xs: Seq[Long]): Double = {
      val sorted = xs.sorted
      val n = sorted.size.toLong
      val s = sorted.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val t = sorted.sum
      (2.0 * s - (n + 1) * t) / (n.toDouble * t)
    }
    assert(gini(Seq(5, 5, 5, 5)) == 0.0)
    // one key holds everything: x = [0-free: [1,1,1,97]] -> near (n-1)/n * skewed
    assert(gini(Seq(1, 1, 1, 97)) > 0.7)
    assert(gini(Seq(1, 2, 3, 4)) == (2.0 * (1 + 4 + 9 + 16) - 5 * 10) / 40.0)
  }

  test("chi-square cells: independent margins give zero deviation") {
    // 2 langs x 2 buckets, counts proportional to margins -> dev = 0
    val cells = Seq(("en", 0L, 20L), ("en", 1L, 20L),
      ("de", 0L, 10L), ("de", 1L, 10L)).toDF("lang", "bucket", "n_ij")
    val rowM = cells.groupBy(col("lang")).agg(sum(col("n_ij")).as("n_i"))
    val colM = cells.groupBy(col("bucket")).agg(sum(col("n_ij")).as("n_j"))
    val tot = cells.agg(sum(col("n_ij")).as("n"))
    val dev = cells.join(rowM, Seq("lang")).join(colM, Seq("bucket"))
      .crossJoin(tot)
      .select((col("n") * col("n_ij") - col("n_i") * col("n_j")).as("dev"))
      .collect().map(_.getLong(0))
    assert(dev.forall(_ == 0L))
  }

  test("chi-square cells: a dependent table yields the textbook statistic") {
    // [[30,10],[10,30]]: n=80, margins all 40; dev = 80*30-40*40 = 800 or
    // 80*10-40*40 = -800; chi2 cell = 800^2 / (80*40*40) = 5.0 each; sum 20
    val cells = Seq(("a", 0L, 30L), ("a", 1L, 10L),
      ("b", 0L, 10L), ("b", 1L, 30L)).toDF("lang", "bucket", "n_ij")
    val rowM = cells.groupBy(col("lang")).agg(sum(col("n_ij")).as("n_i"))
    val colM = cells.groupBy(col("bucket")).agg(sum(col("n_ij")).as("n_j"))
    val tot = cells.agg(sum(col("n_ij")).as("n"))
    val chi = cells.join(rowM, Seq("lang")).join(colM, Seq("bucket"))
      .crossJoin(tot)
      .withColumn("dev", col("n") * col("n_ij") - col("n_i") * col("n_j"))
      .select(((col("dev") * col("dev")).cast("double")
        / (col("n") * col("n_i") * col("n_j")).cast("double")).as("c"))
      .collect().map(_.getDouble(0))
    assert(chi.forall(_ == 5.0))
    assert(chi.sum == 20.0)
  }
}
