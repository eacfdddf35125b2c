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

    val tmp = Files.createTempDirectory("graft_q65_").toString
    val srcDir = s"$tmp/src"
    // bounded 1-row probe (same license as Stats.embeddingDim)
    val bounds = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).head()
    val lo = bounds.getTimestamp(0).getTime
    val hi = bounds.getTimestamp(1).getTime
    val span = math.max(hi - lo, 1L)
    // four sequential writes → strictly increasing file mtimes → the file
    // source (oldest-first) replays them in event-time order
    (0 until 4).foreach { i =>
      val from = lo + span * i / 4
      val to = lo + span * (i + 1) / 4
      // hi/lo are millisecond-truncated (getTime); the last file must be
      // unbounded above or the max event's sub-millisecond tail is lost
      val upper =
        if (i == 3) lit(true)
        else col("ts") < timestamp_millis(lit(to))
      ev.where(col("ts") >= timestamp_millis(lit(from)) && upper)
        .coalesce(1).write.mode("append").parquet(srcDir)
    }
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
    val query = Streaming.sessionize(stream, GapMs)
      .writeStream
      .queryName(name)
      .format("memory")
      .option("checkpointLocation", s"$tmp/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

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

  val defs: Map[String, Q] = Map(
    "q65_stream_sessions" -> q65_stream_sessions)

  val oracles: Map[String, String] = Map(
    "q65_stream_sessions" -> q65_sql)
}
