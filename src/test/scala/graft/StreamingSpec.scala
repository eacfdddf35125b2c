package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Streaming
import graft.streaming.Streaming.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  test("windowedEventCounts aggregates a streaming source into tumbling windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 2.0),
      Event(3, ts(12), 2, "view", 3.0),
      Event(4, ts(59), 2, "click", 4.0))
    val q = Streaming.windowedEventCounts(mem.toDF(), "10 minutes", "30 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("win_counts").collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString, r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toMap
    assert(rows(("2024-01-01 10:00:00.0", "click")) == (2L, 3.0))
    assert(rows(("2024-01-01 10:10:00.0", "view")) == (1L, 3.0))
    assert(rows(("2024-01-01 10:50:00.0", "click")) == (1L, 4.0))
  }

  test("sessionize (batch mode) splits per-user events on the gap") {
    val events = Seq(
      Event(1, ts(0), 1, "a", 1.0),
      Event(2, ts(2), 1, "a", 2.0),   // same session (gap 2 min)
      Event(3, ts(30), 1, "a", 3.0),  // new session (gap 28 min > 10)
      Event(4, ts(1), 2, "b", 5.0)).toDS()
    val sessions = Streaming.sessionize(events, gapMs = 10 * 60 * 1000).collect()
    assert(sessions.length == 3)
    val u1 = sessions.filter(_.user_id == 1).sortBy(_.start.getTime)
    assert(u1(0).n_events == 2 && u1(0).total_value == 3.0)
    assert(u1(0).end == ts(2) && u1(1).start == ts(30))
    val u2 = sessions.find(_.user_id == 2).get
    assert(u2.n_events == 1 && u2.total_value == 5.0)
  }

  test("stream-stream join pairs events on key within the time bound") {
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    views.addData(Event(1, ts(0), 100, "view", 1.0), Event(2, ts(10), 200, "view", 1.0))
    clicks.addData(
      Event(3, ts(2), 100, "click", 1.0),   // within 5 min of view 1 → joins
      Event(4, ts(30), 200, "click", 1.0))  // 20 min after view 2 → outside bound
    val q = Streaming.streamStreamJoin(
        views.toDF().select($"user_id", $"ts", $"event_id".as("view_id")),
        clicks.toDF().select($"user_id", $"ts", $"event_id".as("click_id")),
        "user_id", boundSeconds = 300)
      .select($"view_id", $"click_id")
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val rows = spark.table("ss_join").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.toSeq == Seq((1L, 3L)))
  }

  test("sessionize (streaming) closes a session when the watermark passes the gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = Streaming.sessionize(mem.toDS(), gapMs = 5 * 60 * 1000, watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(Event(1, ts(0), 1, "a", 1.0), Event(2, ts(1), 1, "a", 2.0))
      q.processAllAvailable()
      // advance event time far past gap+watermark → session times out
      mem.addData(Event(3, ts(30), 2, "b", 9.0))
      q.processAllAvailable()
      mem.addData(Event(4, ts(45), 2, "b", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions").collect()
      val u1 = out.find(_.getAs[Long]("user_id") == 1L)
      assert(u1.isDefined, "user 1's session should have timed out and closed")
      assert(u1.get.getAs[Long]("n_events") == 2L)
      assert(u1.get.getAs[Double]("total_value") == 3.0)
    } finally q.stop()
  }

  test("admitFirstK: cap accumulates across micro-batches; within-batch order is doc_id") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.SourceDoc]
    val q = Streaming.admitFirstK(mem.toDS(), 3L)
      .writeStream.format("memory").queryName("admit_cap")
      .outputMode("append").start()
    try {
      // batch 1: 'a' arrives out of id order — admitted sorted (1 then 2)
      mem.addData(Streaming.SourceDoc("a", 2), Streaming.SourceDoc("a", 1),
        Streaming.SourceDoc("b", 10))
      q.processAllAvailable()
      // batch 2: 'a' already holds 2 admissions — only one slot left
      mem.addData(Streaming.SourceDoc("a", 3), Streaming.SourceDoc("a", 4),
        Streaming.SourceDoc("b", 11))
      q.processAllAvailable()
      val rows = spark.table("admit_cap").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("admit_rank"))).toSet
      assert(rows == Set(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L),
        ("b", 10L, 1L), ("b", 11L, 2L)))
    } finally q.stop()
  }

  test("admitTokenBudget: overflow closes a source FOR GOOD across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Streaming.SourceTokDoc]
    val q = Streaming.admitTokenBudget(mem.toDS(), 50L)
      .writeStream.format("memory").queryName("admit_budget")
      .outputMode("append").start()
    try {
      // batch 1: a admits 1 (cum 30) then doc 2 (40 tokens) would reach 70
      // -> overflow closes 'a'; b admits within budget
      mem.addData(Streaming.SourceTokDoc("a", 1, 30L),
        Streaming.SourceTokDoc("a", 2, 40L), Streaming.SourceTokDoc("b", 9, 50L))
      q.processAllAvailable()
      // batch 2: 'a' stays closed even for a 1-token doc (prefix rule:
      // nothing re-opens after the overflow); b is exactly at budget ->
      // any further b doc overflows and closes it too
      mem.addData(Streaming.SourceTokDoc("a", 3, 1L),
        Streaming.SourceTokDoc("b", 10, 1L))
      q.processAllAvailable()
      // batch 3: both closed
      mem.addData(Streaming.SourceTokDoc("a", 4, 1L),
        Streaming.SourceTokDoc("b", 11, 1L))
      q.processAllAvailable()
      val rows = spark.table("admit_budget").collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("cum_tokens"))).toSet
      assert(rows == Set(("a", 1L, 30L), ("b", 9L, 50L)))
    } finally q.stop()
  }
}
