package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for 100 TB joins/aggregations.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense — it splits oversized partitions at
  * runtime. Salting is the explicit fallback for the cases AQE can't fix:
  * a single hot key inside one partition (AQE can split partitions, not
  * keys), or skewed aggregation state.
  */
object Skew {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic salt
    * in [0, buckets); the small side is replicated `buckets`× so every
    * (key, salt) combination finds its match. One hot key now spreads over
    * `buckets` reducers. Replication multiplies the small side — keep
    * `buckets` modest (8-32) and the small side bounded.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int = 16): DataFrame = {
    require(buckets > 0)
    val saltedBig = big.withColumn("__salt",
      pmod(hash(keys.map(k => col(s"`$k`")) :+ monotonically_increasing_id(): _*),
        lit(buckets)))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedBig.join(saltedSmall, keys :+ "__salt", "inner").drop("__salt")
  }

  /** Two-phase (partial → final) aggregation with a salt key, for skewed
    * group-bys whose per-key state is large. For algebraic aggregates
    * (sum/count/min/max) Spark's map-side partial aggregation already does
    * this; use the salted variant when one group dominates a reducer.
    *
    * `partial` aggregates (keys + salt), `merge` combines the partials per
    * key. Caller supplies both sides of the decomposition, e.g.
    * partial=sum(x)→s, merge=sum(s).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    val keyCols = keys.map(k => col(s"`$k`"))
    df.withColumn("__salt", pmod(hash(keyCols :+ monotonically_increasing_id(): _*), lit(buckets)))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keyCols: _*)
      .agg(merge.head, merge.tail: _*)
  }
}
