package graft

import org.apache.spark.sql.functions._

/** Byte-fidelity of the interchange sinks beyond what the corpus oracle
  * exercises: JSON escaping of quotes/newlines/tabs/unicode, ORC timestamp
  * and double exactness. The registered q93/q94 round-trips certify the
  * same pairs against DuckDB on the real tables; these specs pin the
  * hostile-input corners the synthetic corpus doesn't contain. */
class RoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val tricky = Seq(
    (1L, "plain ascii"),
    (2L, "quotes \" and \\ backslash"),
    (3L, "newline\nand\ttab"),
    (4L, "unicode: café 中文 😀"),
    (5L, ""),
    (6L, "{\"looks\":\"like json\"}"))

  test("JSON sink → scan round-trips hostile strings byte-exactly") {
    val df = tricky.toDF("id", "s")
    val out = graft.io.Scratch.dir("json_spec_")
    df.write.mode("overwrite").json(out)
    val back = spark.read.schema(df.schema).json(out)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    tricky.foreach { case (id, s) => assert(back(id) == s, s"id=$id") }
  }

  test("ORC sink → scan round-trips timestamps and doubles exactly") {
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("1997-06-30 23:59:59.123"), 3.141592653589793),
      (2L, java.sql.Timestamp.valueOf("2026-01-01 00:00:00.001"), -0.1 + 0.2),
      (3L, java.sql.Timestamp.valueOf("1970-01-01 00:00:00.0"), Double.MinPositiveValue))
      .toDF("id", "ts", "x")
    val out = graft.io.Scratch.dir("orc_spec_")
    df.write.mode("overwrite").orc(out)
    val back = spark.read.orc(out).collect()
      .map(r => r.getLong(0) -> ((r.getTimestamp(1), r.getDouble(2)))).toMap
    df.collect().foreach { r =>
      val (ts, x) = back(r.getLong(0))
      assert(ts == r.getTimestamp(1) && x == r.getDouble(2))
    }
  }
}
