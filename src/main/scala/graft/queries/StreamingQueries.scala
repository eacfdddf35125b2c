package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.Streaming

/** End-to-end certification of the Structured-Streaming path with the same
  * oracle rigor as the batch queries: [[q65_stream_sessions]] replays the
  * events table through a REAL streaming run — file source → watermark →
  * `flatMapGroupsWithState` sessionization with event-time timeouts →
  * memory sink — across multiple micro-batches, and its final output must
  * hash-match the batch sessionization oracle (q32's recursive
  * gap-split SQL, minus the float-accumulated total).
  *
  * This is a certification harness, not a production deployment shape: the
  * staging copy + memory sink exist so a bounded replay can be compared
  * bit-for-bit against SQL. A production stream is the same operator chain
  * with `readStream` on the live source and a real sink
  * ([[graft.streaming.Streaming.microBatch]]).
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Session gap — must match q32's 30 minutes for oracle parity. */
  val GapMs: Long = 30 * 60 * 1000L

  /** Stage a batch frame into `parts` TIME-RANGE parquet files under a fresh
    * temp dir, so a file-source replay (`maxFilesPerTrigger=1`, oldest file
    * first) delivers micro-batches in event-time order — no rows ever arrive
    * behind the watermark and get dropped. Returns (srcDir, loMs, hiMs,
    * ckptDir). `dupEachFile` writes every range file TWICE (as two separate
    * files → two separate micro-batches), giving a dedup stream genuine
    * cross-batch re-deliveries of every row. */
  private def stageTimeOrdered(ev: DataFrame, parts: Int,
                               dupEachFile: Boolean): (String, Long, Long, String) = {
    val tmp = Files.createTempDirectory("graft_stream_").toString
    val srcDir = s"$tmp/src"
    // bounded 1-row probe (same license as Stats.embeddingDim)
    val bounds = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val lo = bounds.getTimestamp(0).getTime
    val hi = bounds.getTimestamp(1).getTime
    val span = math.max(hi - lo, 1L)
    // sequential writes → strictly increasing file mtimes → replay order
    (0 until parts).foreach { i =>
      val from = lo + span * i / parts
      val to = lo + span * (i + 1) / parts
      // hi/lo are millisecond-truncated (getTime); the last file must be
      // unbounded above or the max event's sub-millisecond tail is lost
      val upper =
        if (i == parts - 1) lit(true)
        else col("ts") < timestamp_millis(lit(to))
      val slice = ev.where(col("ts") >= timestamp_millis(lit(from)) && upper)
      slice.coalesce(1).write.mode("append").parquet(srcDir)
      if (dupEachFile) slice.coalesce(1).write.mode("append").parquet(srcDir)
    }
    (srcDir, lo, hi, s"$tmp/ckpt")
  }

  /** Run a streaming certification with a small state-partition count: the
    * stateful operators' partitioning is fixed at CHECKPOINT CREATION from
    * `spark.sql.shuffle.partitions`, and every micro-batch writes one
    * state-store delta file per partition per stateful op — at 32
    * partitions the bounded replay spends more time on state-store I/O
    * than on data. 8 suits the certification corpus; production sizes its
    * own. The session conf is restored afterwards (queries run
    * sequentially under both Verify and Bench). */
  private def withCertStatePartitions[T](s: SparkSession)(f: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, "8")
    try f finally s.conf.set(key, old)
  }

  /** Streaming sessionization, oracle-checked.
    *
    * Mechanics: the events table is staged into four TIME-RANGE parquet
    * files (so micro-batches replay history in event-time order — no rows
    * ever arrive behind the watermark and get dropped) plus two "sentinel"
    * files far past the real data. The sentinels advance the watermark past
    * every real session's close (`end + gap`), which makes the event-time
    * timeouts fire and flush the per-user trailing sessions — the streaming
    * equivalent of "end of input". `maxFilesPerTrigger=1` forces one file
    * per micro-batch, so state genuinely accumulates ACROSS batches (a
    * single-batch run would never exercise the state store between
    * triggers).
    *
    * The emitted sessions are then shaped to q32's output: session_id is
    * the per-user ordinal by start time, and total_value is omitted — the
    * streaming state accumulates doubles in arrival order, which is not
    * bit-identical to the oracle's decimal-exact sum (structure, counts,
    * and timestamps are, so those are what the hash covers).
    */
  val q65_stream_sessions: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

    val (srcDir, _, hi, ckpt) = stageTimeOrdered(ev, 4, dupEachFile = false)
    def sentinel(tsMs: Long): Unit =
      Seq((-1L, new java.sql.Timestamp(tsMs), -1L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    sentinel(hi + 2 * 60 * 60 * 1000L) // watermark → hi+1h > every end+gap
    sentinel(hi + 4 * 60 * 60 * 1000L) // one more batch so the timeouts fire

    val name = "q65_sessions_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
      .as[Streaming.Event]
    withCertStatePartitions(s) {
      val query = Streaming.sessionize(stream, GapMs)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }

    val w = Window.partitionBy(col("user_id")).orderBy(col("start"))
    s.table(name)
      .where(col("user_id") >= 0) // drop the sentinel user
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy(col("user_id"), col("session_id"))
  }

  /** q32's oracle minus the decimal-summed total (see [[q65_stream_sessions]]). */
  val q65_sql: String =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                   OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
      |              THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged)
      |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
      |       count(*) AS n_events,
      |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
      |FROM sessions GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** Streaming watermarked tumbling-window aggregation, oracle-checked
    * against q17's batch SQL: replay the events table through
    * [[Streaming.windowedEventCounts]] in four time-ordered micro-batches.
    * Append mode only emits a window once the watermark passes its end, so
    * a sentinel event 4 h past the real data finalizes every real window
    * ("end of input"); the sentinel's own window never finalizes and is
    * never emitted. The decimal(18,4)-accumulated `sum_value` is
    * order-independent, so unlike q65 the full aggregate hash-matches. */
  val q74_stream_windows: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

    val (srcDir, _, hi, ckpt) = stageTimeOrdered(ev, 4, dupEachFile = false)
    // two sentinels: the watermark a batch uses comes from the PREVIOUS
    // batch's data, so the first sentinel advances it past every real
    // window and the second provides the batch in which they flush
    Seq(hi + 4 * 60 * 60 * 1000L, hi + 6 * 60 * 60 * 1000L).foreach { tsMs =>
      Seq((-1L, new java.sql.Timestamp(tsMs), -1L, "sentinel", 0.0))
        .toDF("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(srcDir)
    }

    val name = "q74_windows_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = Streaming.windowedEventCounts(stream, "1 hour", "2 hours")
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }

    s.table(name)
      .where(col("event_type") =!= "sentinel")
      .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour"), col("event_type"))
  }

  /** q17's oracle verbatim — the streaming replay must reproduce the batch
    * hourly aggregation exactly (1-hour tumbling windows align with
    * date_trunc('hour')). */
  val q74_sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |       count(*) AS n,
      |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** Streaming exact dedup under re-delivery, oracle-checked: every staged
    * range file is written TWICE (two separate micro-batches), so the
    * stream delivers each event two times across batch boundaries —
    * [[Streaming.dedupStream]]'s watermark-bounded state must emit each
    * `event_id` exactly once, reproducing the events table itself. The
    * watermark delay is sized to the staged slice span plus slack so the
    * re-deliveries land inside the dedup state's lifetime (the point being
    * certified); production uses a delay sized to the real re-delivery
    * window, keeping state bounded. */
  val q75_stream_dedup: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))

    val (srcDir, lo, hi, ckpt) = stageTimeOrdered(ev, 4, dupEachFile = true)
    val sliceHours = ((hi - lo) / 4) / (60 * 60 * 1000L) + 2

    val name = "q75_dedup_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = Streaming.dedupStream(stream, Seq("event_id"), s"$sliceHours hours")
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }

    s.table(name)
      .select(col("event_id"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id"))
  }

  /** The doubled stream deduped on event_id must equal the events table. */
  val q75_sql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |       user_id, event_type, value
      |FROM events ORDER BY event_id""".stripMargin

  /** Stream-stream inner join, oracle-checked: views and clicks replay as
    * TWO file-source streams (each in four time-ordered micro-batches; the
    * file sources advance in lockstep, one file per trigger each), joined
    * on user within a 60-minute bound — the canonical impressions⋈clicks
    * shape. Both sides carry watermarks and the condition bounds both
    * event times, so Spark evicts join state as the watermark advances;
    * an inner join emits on match, so no sentinel flush is needed. The
    * output must hash-match the batch self-join over the events table.
    *
    * Completeness under eviction: a view can only be evicted once the
    * watermark (which lags the max seen event time by the 1 h delay)
    * passes view_ts + 60 min — by then any matching click (≤ 60 min after
    * the view, files time-ordered) has already arrived and matched. */
  val q80_stream_stream_join: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
    val views = ev.where(col("event_type") === "view")
    val clicks = ev.where(col("event_type") === "click")
    val (vDir, _, _, ckpt) = stageTimeOrdered(views, 4, dupEachFile = false)
    val (cDir, _, _, _) = stageTimeOrdered(clicks, 4, dupEachFile = false)

    def src(dir: String): DataFrame =
      s.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(dir)
    val joined = Streaming.streamStreamJoin(
        src(vDir).select(col("event_id").as("view_id"), col("ts"), col("user_id")),
        src(cDir).select(col("event_id").as("click_id"), col("ts"), col("user_id")),
        "user_id", boundSeconds = 3600)
      .select(col("l.user_id").as("user_id"),
        col("view_id"), col("click_id"),
        col("l.ts").as("vts"), col("r.ts").as("cts"))

    val name = "q80_join_" + java.util.UUID.randomUUID().toString.replace("-", "")
    withCertStatePartitions(s) {
      val query = joined.writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }

    s.table(name)
      .select(col("user_id"), col("view_id"), col("click_id"),
        date_format(col("vts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
      .orderBy(col("view_id"), col("click_id"))
  }

  /** The equivalent batch self-join over the events table. */
  val q80_sql: String =
    """SELECT a.user_id, a.event_id AS view_id, b.event_id AS click_id,
      |       strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
      |       strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS click_ts
      |FROM events a JOIN events b
      |  ON a.user_id = b.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
      |WHERE a.event_type = 'view' AND b.event_type = 'click'
      |ORDER BY view_id, click_id""".stripMargin

  val defs: Map[String, Q] = Map(
    "q65_stream_sessions" -> q65_stream_sessions,
    "q74_stream_windows" -> q74_stream_windows,
    "q75_stream_dedup" -> q75_stream_dedup,
    "q80_stream_stream_join" -> q80_stream_stream_join)

  val oracles: Map[String, String] = Map(
    "q65_stream_sessions" -> q65_sql,
    "q74_stream_windows" -> q74_sql,
    "q75_stream_dedup" -> q75_sql,
    "q80_stream_stream_join" -> q80_sql)
}
