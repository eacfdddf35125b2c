package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.ThresholdedLevenshtein

/** [[graft.plans.ThresholdedLevenshtein]] — the optimizer rule is applied
  * BY HAND to analyzed plans here (the shared test session has no
  * extensions config; the config-wired path is certified end-to-end by
  * the forked-JVM [[ExtensionsProbe]]). */
class PlansSpec extends SparkSpec {
  import spark.implicits._

  private def rows: DataFrame =
    Seq(("kitten", "sitting"), ("abcdef", "sitting"), ("same", "same"),
      (null.asInstanceOf[String], "x"))
      .toDF("a", "b")

  private def runRule(df: DataFrame): DataFrame =
    ColumnBridge.dataset(spark,
      ThresholdedLevenshtein(df.queryExecution.analyzed))

  private def planOf(df: DataFrame): String =
    ThresholdedLevenshtein(df.queryExecution.analyzed).toString

  test("rewrites <= k, < k, and flipped forms to the banded call") {
    for (pred <- Seq("levenshtein(a, b) <= 3", "levenshtein(a, b) < 4",
      "3 >= levenshtein(a, b)", "4 > levenshtein(a, b)")) {
      val df = rows.where(expr(pred))
      val p = planOf(df)
      assert("levenshtein\\([^)]*, Some\\(3\\)\\)".r.findFirstIn(p).isDefined,
        s"$pred did not rewrite to the banded form:\n$p")
      // kitten→sitting (3) and same→same (0) survive <= 3; abcdef (6) and
      // the null row must drop — identical to the naive predicate
      assert(runRule(df).collect().map(_.getString(0)).toSet ==
        Set("kitten", "same"))
    }
  }

  test("k = 0 (exact equality) and projection contexts stay semantics-exact") {
    val eq = rows.where(expr("levenshtein(a, b) <= 0"))
    assert(runRule(eq).collect().map(_.getString(0)).toSeq == Seq("same"))
    // boolean in a PROJECTION: the rewritten comparison is value-identical
    // (including NULL propagation), not just filter-equivalent
    val proj = rows.select(col("a"), expr("levenshtein(a, b) <= 3").as("hit"))
    val got = runRule(proj).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getBoolean(1)))
      .toMap
    assert(got == Map("kitten" -> true, "abcdef" -> false, "same" -> true,
      (null: String) -> null))
  }

  test("fires through Long bounds, explicit casts, and foldable arithmetic") {
    // generated-SQL shapes: a BIGINT bound makes the analyzer wrap the
    // Levenshtein side in Cast(..., LongType); the rule must see through it
    for (pred <- Seq("levenshtein(a, b) <= 3L", "4L > levenshtein(a, b)",
      "cast(levenshtein(a, b) as bigint) <= 3", "levenshtein(a, b) <= 1 + 2",
      "cast(levenshtein(a, b) as int) < cast(4 as tinyint)")) {
      val df = rows.where(expr(pred))
      val p = planOf(df)
      assert("levenshtein\\([^)]*, Some\\(3\\)\\)".r.findFirstIn(p).isDefined,
        s"$pred did not rewrite to the banded form:\n$p")
      assert(runRule(df).collect().map(_.getString(0)).toSet ==
        Set("kitten", "same"), s"$pred changed the result set")
    }
  }

  test("does not fire on already-thresholded calls or unprofitable shapes") {
    val keep = Seq("levenshtein(a, b, 5) <= 3", "levenshtein(a, b) >= 3",
      "levenshtein(a, b) <= -1",
      // narrowing cast could ANSI-throw on overflow — must stay untouched
      "cast(levenshtein(a, b) as smallint) <= 3")
    for (pred <- keep) {
      val df = rows.where(expr(pred))
      assert(planOf(df) == df.queryExecution.analyzed.toString,
        s"$pred should be left untouched")
    }
  }
}
