package graft

import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Unit coverage for the map-side-combinable top-k aggregate: tie-break
  * determinism, cross-partition merge, short groups, and agreement with
  * the window formulation on random data. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("topKByGroup: rank order, tie-break by id, short groups") {
    val df = Seq(
      ("g1", 10L, 3L), ("g1", 10L, 1L), ("g1", 9L, 2L), ("g1", 11L, 9L),
      ("g2", 5L, 7L)) // g2 has fewer rows than k
      .toDF("g", "score", "id")
      .repartition(4) // force partial buffers + merge
    val got = TopK.topKByGroup(df, "g", "score", "id", 3)
      .orderBy(col("g"), col("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      ("g1", 1L, 9L, 11L), // highest score
      ("g1", 2L, 1L, 10L), // tie on 10 -> smaller id first
      ("g1", 3L, 3L, 10L),
      ("g2", 1L, 7L, 5L)))
  }

  test("topKByGroup agrees with the window formulation on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 500).map(i => (s"g${rnd.nextInt(5)}", rnd.nextInt(40).toLong, i.toLong))
    val df = rows.toDF("g", "score", "id").repartition(7)
    val viaAgg = TopK.topKByGroup(df, "g", "score", "id", 4)
      .select("g", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 4)
      .select("g", "rank", "id", "score")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("plan: aggregate form carries no Window and combines partially") {
    val df = Seq(("a", 1L, 1L)).toDF("g", "score", "id")
    val plan = TopK.topKByGroup(df, "g", "score", "id", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate"), s"expected object hash agg:\n$plan")
  }
}
