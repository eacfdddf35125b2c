package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming

/** Round-9 operator tests. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  private def obs(user: Long, tsm: Long, id: Long, week: Long) =
    Streaming.KeyedObs(user, tsm, id, week)

  // NOTE: the genuine multi-micro-batch (cross-boundary state) property is
  // certified by q295_stream_retention's staged maxFilesPerTrigger=1 replay
  // against the batch oracle; this unit test pins the per-user fold logic.
  test("cohortRetention: first-seen week is the cohort, emits each cell once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.KeyedObs]
    // micro-batch 1: user 1 starts week 10; user 2 starts week 11
    mem.addData(obs(1, 100, 1, 10), obs(1, 101, 2, 10), obs(2, 102, 3, 11))
    // later arrivals: user 1 returns weeks 11 and 13 (+ a repeat of 10 ->
    // no emit); user 2 returns week 11 again (no emit) and week 12
    mem.addData(obs(1, 200, 4, 11), obs(1, 201, 5, 13), obs(1, 202, 6, 10),
      obs(2, 203, 7, 11), obs(2, 204, 8, 12))
    val name = "ret_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.cohortRetention(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val cells = spark.table(name).collect()
      .map(r => (r.getAs[Long]("cohort_week"), r.getAs[Long]("offset_weeks")))
      .sorted.toSeq
    assert(cells == Seq((10L, 0L), (10L, 1L), (10L, 3L), (11L, 0L), (11L, 1L)))
  }

  // NOTE: cross-boundary statefulness at corpus scale is certified by
  // q303_stream_funnel's staged maxFilesPerTrigger=1 replay against the
  // batch q111 oracle; this unit test pins the greedy fold's edge cases.
  test("funnelDepth: strict-time greedy advance carries across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.KeyedObs]
    // x is the stage index: 0=view, 1=click, 2=purchase
    // batch 1: user 1 views at t=100; a click at the SAME instant must NOT
    // advance (strict ts > prev); user 2 clicks without ever viewing
    mem.addData(obs(1, 100, 1, 0), obs(1, 100, 2, 1), obs(2, 100, 3, 1))
    // batch 2: user 1 clicks at 200 and purchases at 300 -> depth 3,
    // with the click->purchase advance spanning the batch boundary state
    mem.addData(obs(1, 200, 4, 1), obs(1, 300, 5, 2), obs(2, 301, 6, 1))
    val name = "fun_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.funnelDepth(mem.toDS(), 3)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val depths = spark.table(name).groupBy("user_id")
      .agg(max("funnel_depth").as("d")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("d"))).sorted.toSeq
    assert(depths == Seq((1L, 3L), (2L, 0L)))
  }

  // NOTE: micro-batch mergeability at corpus scale is certified by
  // q307_stream_moments vs the direct batch aggregate; this unit test pins
  // the power-sum fold and the cross-boundary state carry.
  test("momentsSketch: power sums carry across micro-batch boundaries") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.MomObs]
    mem.addData(Streaming.MomObs("a", 2L), Streaming.MomObs("a", 3L),
      Streaming.MomObs("b", 10L))
    mem.addData(Streaming.MomObs("a", -1L)) // signed values are legal
    val name = "mom_out_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.momentsSketch(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val fin = spark.table(name).groupBy("event_type")
      .agg(max(struct(col("seen"), col("s1"), col("s2"), col("s3"))).as("f"))
      .select(col("event_type"), col("f.seen"), col("f.s1"), col("f.s2"),
        col("f.s3"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted.toSeq
    // a: n=3, s1=2+3-1=4, s2=4+9+1=14, s3=8+27-1=34; b: single obs
    assert(fin == Seq(("a", 3L, 4L, 14L, 34L), ("b", 1L, 10L, 100L, 1000L)))
  }

  test("momentsSketch: a value scale that would wrap s3 fails fast") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.MomObs]
    mem.addData(Streaming.MomObs("a", 3000000L)) // v^3 = 2.7e19 > Long.Max
    val name = "mom_bad_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.momentsSketch(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def overflowy(m: String) = m != null && m.contains("overflow")
    assert(overflowy(e.getMessage) ||
      Iterator.iterate(e.getCause)(_.getCause).takeWhile(_ != null).take(8)
        .exists(c => overflowy(c.getMessage)))
  }

  test("cohortRetention: rejects offsets outside the 64-week mask") {
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Streaming.KeyedObs]
    mem.addData(obs(1, 100, 1, 10), obs(1, 101, 2, 80)) // offset 70 >= 64
    val name = "ret_bad_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = Streaming.cohortRetention(mem.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    assert(e.getMessage.contains("cohortRetention") ||
      Option(e.getCause).exists(_.getMessage.contains("cohortRetention")))
  }
}
