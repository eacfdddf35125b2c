package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values) distinct-cardinality sketches with SET-OPERATION
  * estimates — the sketch HyperLogLog can't be: two KMV sketches merge
  * into a sketch of the UNION, and the overlap of their k-sets estimates
  * Jaccard/intersection (Beyer et al. 2007). That turns an all-pairs
  * exact-vocabulary join (q189's |vocab|-sized work per pair) into
  * arithmetic over k·|groups| retained hash values.
  *
  * Determinism contract: the "random" order is the md5-derived 32-bit
  * value of the element — content-defined, order-independent, identical
  * on any engine — and the estimators are integral fixed point
  * (`(k−1)·2³² div t`), so estimates hash-match a SQL replay exactly.
  *
  * Scale shape: the sketch is [[TopKAgg]] with negated score — ONE
  * map-side-combined aggregate whose shuffle carries k-entry buffers per
  * group, never element rows. Pair estimation works entirely on the
  * |groups|·k sketch frame (windows partition on (group_a, group_b) over
  * ≤2k rows — bounded, never corpus-sized).
  */
object Kmv {

  /** 32-bit content hash in [0, 2³²) from md5 — the value order KMV ranks
    * by; matches the SQL replay `('0x' || substr(md5(e),1,8))::BIGINT`. */
  def hash32(e: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(e.cast("string")), 1, 8), 16, 10).cast("long")

  /** The k smallest DISTINCT element hashes per group: (group, rank 1..k,
    * h). Input rows are (group, element); duplicates collapse first. */
  def sketch(df: DataFrame, groupCol: String, elemCol: String,
             k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2 (got $k)")
    val hashed = df.select(col(groupCol), hash32(col(elemCol)).as("__h"))
      .distinct()
    TopK.topKByGroup(hashed.withColumn("__neg", -col("__h")),
        groupCol, "__neg", "__h", k)
      .select(col(groupCol), col("rank"), col("__h").as("h"))
  }

  /** Union-cardinality and Jaccard estimates for every group pair from
    * their sketches: (group_a, group_b, n_union_est, jaccard_est_fp).
    * When the merged sketch holds fewer than k values the union estimate
    * is exact (the sketches saw everything). */
  def pairEstimates(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sk.select(col(groupCol).as("ga"), col("h"))
    val b = sk.select(col(groupCol).as("gb"), col("h"))
    // tag each hash with which side(s) hold it; pair frame is
    // |groups|²·2k rows — bounded by construction
    val merged = a.join(b.select(col("gb")).distinct(), col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionByName(
        b.join(a.select(col("ga")).distinct(), col("ga") < col("gb"))
          .select(col("ga"), col("gb"), col("h"), lit(0L).as("in_a"), lit(1L).as("in_b")))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val ranked = merged.withColumn("r", row_number().over(w))
      .where(col("r") <= k)
    ranked.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("m"), max(col("h")).as("t"),
        sum(col("in_a") * col("in_b")).as("both"))
      .select(col("ga"), col("gb"),
        when(col("m") < k, col("m"))
          .otherwise(expr(s"((${k - 1}) * 4294967296) div greatest(t, 1)"))
          .as("n_union_est"),
        expr("(both * 1000000) div m").as("jaccard_est_fp"))
  }

  /** Directional SET-DIFFERENCE estimates per group pair — the third
    * estimator the merged k-set supports and HLL fundamentally cannot
    * give without inclusion-exclusion error stacking: among the k
    * smallest union hashes, the a-only/b-only fractions are unbiased
    * samples of |A∖B|/|A∪B| and |B∖A|/|A∪B|, so
    * `diff_ab_est = n_union_est · only_a div m` (integral, replayable).
    * Same bounded plan as [[pairEstimates]]: all work on the |groups|·k
    * sketch frame. Output: (ga, gb, n_union_est, diff_ab_est,
    * diff_ba_est). */
  def differenceEstimates(sk: DataFrame, groupCol: String, k: Int): DataFrame = {
    val a = sk.select(col(groupCol).as("ga"), col("h"))
    val b = sk.select(col(groupCol).as("gb"), col("h"))
    val merged = a.join(b.select(col("gb")).distinct(), col("ga") < col("gb"))
      .select(col("ga"), col("gb"), col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionByName(
        b.join(a.select(col("ga")).distinct(), col("ga") < col("gb"))
          .select(col("ga"), col("gb"), col("h"), lit(0L).as("in_a"), lit(1L).as("in_b")))
      .groupBy(col("ga"), col("gb"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("ga"), col("gb")).orderBy(col("h"))
    val ranked = merged.withColumn("r", row_number().over(w))
      .where(col("r") <= k)
    ranked.groupBy(col("ga"), col("gb"))
      .agg(count(lit(1)).as("m"), max(col("h")).as("t"),
        sum(col("in_a") * (lit(1L) - col("in_b"))).as("only_a"),
        sum(col("in_b") * (lit(1L) - col("in_a"))).as("only_b"))
      .withColumn("n_union_est",
        when(col("m") < k, col("m"))
          .otherwise(expr(s"((${k - 1}) * 4294967296) div greatest(t, 1)")))
      .select(col("ga"), col("gb"), col("n_union_est"),
        expr("(n_union_est * only_a) div m").as("diff_ab_est"),
        expr("(n_union_est * only_b) div m").as("diff_ba_est"))
  }
}
