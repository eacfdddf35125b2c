package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.Triangles
import graft.streaming.Streaming

/** Unit coverage for the graph/CDC round: per-node triangle counts on a
  * hand-checkable graph, the max(struct) CDC snapshot rule, and the
  * streaming last-touch attribution state machine across micro-batch
  * boundaries.
  */
class GraphCdcSpec extends SparkSpec {
  import spark.implicits._

  test("Triangles.perNode: diamond graph (K4 minus one edge)") {
    // nodes 1-4, edges 12,13,14,23,24 (missing 34): triangles 123 and 124.
    // node 1 is in both; 2 in both; 3 and 4 in one each.
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    val got = Triangles.perNode(e, "a", "b")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> (3L, 2L), 2L -> (3L, 2L),
      3L -> (2L, 1L), 4L -> (2L, 1L)))
  }

  test("Triangles.perNode: duplicate and reversed edges dedupe; no-triangle node gets 0") {
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("a", "b")
    val got = Triangles.perNode(e, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("CDC snapshot: max(struct) picks latest (tsm, event_id); tombstone wins") {
    val log = Seq(
      (1L, "a", 10L, 1L, 5L),   // upsert 5
      (1L, "a", 20L, 2L, -1L),  // tombstone at t=20
      (2L, "a", 10L, 3L, 7L),
      (2L, "a", 10L, 4L, 9L))   // same tsm, higher event_id wins
      .toDF("user_id", "event_type", "tsm", "event_id", "v")
    val snap = log.groupBy(col("user_id"), col("event_type"))
      .agg(max(struct(col("tsm"), col("event_id"), col("v"))).as("m"))
      .select(col("user_id"), col("m.v").as("v"))
      .where(col("v") >= 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap == Map(2L -> 9L)) // user 1 deleted; user 2 took event 4
  }

  test("lastTouchAttribution: state carries the last view across batches; lookback gates") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.KeyedObs]
    val q = Streaming.lastTouchAttribution(mem.toDS(), lookbackMs = 100L)
      .writeStream.format("memory").queryName("attr_test")
      .outputMode("append").start()
    try {
      // batch 1: view@10 then purchase@50 (in lookback) -> attributed to 1
      mem.addData(Streaming.KeyedObs(7L, 10L, 1L, 1L),
        Streaming.KeyedObs(7L, 50L, 2L, 2L))
      q.processAllAvailable()
      // batch 2: purchase@105 still within 100 of view@10? 10 >= 105-100=5 yes;
      // purchase@300 outside -> unattributed; then view@310, purchase@320 -> 5
      mem.addData(Streaming.KeyedObs(7L, 105L, 3L, 2L),
        Streaming.KeyedObs(7L, 300L, 4L, 2L),
        Streaming.KeyedObs(7L, 310L, 5L, 1L),
        Streaming.KeyedObs(7L, 320L, 6L, 2L))
      q.processAllAvailable()
      val rows = spark.table("attr_test").collect()
        .map(r => (r.getAs[Long]("event_id"),
          Option(r.getAs[java.lang.Long]("view_id")).map(_.toLong),
          r.getAs[Boolean]("attributed"))).toSet
      assert(rows == Set((2L, Some(1L), true), (3L, Some(1L), true),
        (4L, None, false), (6L, Some(5L), true)))
    } finally q.stop()
  }

  test("covisitPairs: ring pairs across batches, evicts beyond k, gates on time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.KeyedObs]
    val q = Streaming.covisitPairs(mem.toDS(), lookbackMs = 100L, k = 2)
      .writeStream.format("memory").queryName("covisit_test")
      .outputMode("append").start()
    try {
      // batch 1: codes 1@0, 2@10 -> pair (1,2)
      mem.addData(Streaming.KeyedObs(5L, 0L, 1L, 1L),
        Streaming.KeyedObs(5L, 10L, 2L, 2L))
      q.processAllAvailable()
      // batch 2: 3@20 pairs with ring {1@0, 2@10}: (1,3), (2,3);
      // 4@130 pairs only with 3@20 in time (ring {2@10,3@20}: 10+100<130 out,
      // 20+100<130 out -> NO pairs for 4)
      mem.addData(Streaming.KeyedObs(5L, 20L, 3L, 3L),
        Streaming.KeyedObs(5L, 130L, 4L, 4L))
      q.processAllAvailable()
      // batch 3: 5@140 pairs with ring {3@20, 4@130}: 3 too old, 4 in -> (4,5)
      mem.addData(Streaming.KeyedObs(5L, 140L, 5L, 5L))
      q.processAllAvailable()
      val got = spark.table("covisit_test").collect()
        .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
        .groupBy(identity).view.mapValues(_.size).toMap
      assert(got == Map((1L, 2L) -> 1, (1L, 3L) -> 1, (2L, 3L) -> 1,
        (4L, 5L) -> 1))
    } finally q.stop()
  }
}
