package graft

import org.apache.spark.sql.functions._

import graft.operators.{Ewma, Impute}

/** Unit coverage for keyed gap-fill (forward/backward carry, leading and
  * trailing gaps, key isolation) and the integer EWMA sorted-run fold
  * (recurrence values, key-change reset, cross-partition determinism). */
class ImputeEwmaSpec extends SparkSpec {
  import spark.implicits._

  test("Impute.fill: forward and backward carry with edge gaps") {
    // user 1 timeline: null, 10, null, 20, null
    val df = Seq(
      (1L, 1L, None: Option[Double]), (1L, 2L, Some(10.0)),
      (1L, 3L, None), (1L, 4L, Some(20.0)), (1L, 5L, None),
      (2L, 1L, Some(7.0))) // other key must not leak
      .toDF("user_id", "seq", "v")
    val got = Impute.fill(df, "user_id", Seq(col("seq")), "v")
      .orderBy(col("user_id"), col("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))
    assert(got.toSeq == Seq(
      (1L, 1L, None, Some(10.0)),       // leading gap: no ffill
      (1L, 2L, Some(10.0), Some(10.0)),
      (1L, 3L, Some(10.0), Some(20.0)), // carried both directions
      (1L, 4L, Some(20.0), Some(20.0)),
      (1L, 5L, Some(20.0), None),       // trailing gap: no bfill
      (2L, 1L, Some(7.0), Some(7.0))))
  }

  test("Ewma.halfLife: recurrence, key reset, and partition-count invariance") {
    // key 1: x = 8, 4, 10 -> s = 8, (8+4)/2=6, (6+10)/2=8
    // key 2: x = 5       -> s = 5 (reset, not carried from key 1)
    val rows = Seq((1L, 10L, 101L, 8L), (1L, 20L, 102L, 4L), (1L, 30L, 103L, 10L),
      (2L, 10L, 201L, 5L))
    for (parts <- Seq(1, 3)) {
      val df = rows.toDF("user_id", "tsm", "event_id", "x").repartition(parts)
      val got = Ewma.halfLife(df, "user_id", "tsm", "event_id", "x")
        .orderBy(col("event_id"))
        .collect().map(r => (r.getLong(1), r.getLong(3)))
      assert(got.toSeq == Seq((101L, 8L), (102L, 6L), (103L, 8L), (201L, 5L)),
        s"at $parts partitions")
    }
  }

  test("Ewma.halfLife rejects negative inputs (div semantics guard)") {
    val df = Seq((1L, 1L, 1L, -3L)).toDF("user_id", "tsm", "event_id", "x")
    val e = intercept[org.apache.spark.SparkException] {
      Ewma.halfLife(df, "user_id", "tsm", "event_id", "x").collect()
    }
    assert(e.getMessage.contains("non-negative") ||
      Option(e.getCause).exists(_.getMessage.contains("non-negative")))
  }
}
