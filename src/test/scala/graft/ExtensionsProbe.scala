package graft

import org.apache.spark.sql.SparkSession

/** Forked-JVM probe for the `spark.sql.extensions` config path.
  *
  * [[ExtensionsSpec]] launches this main in a FRESH JVM because the config
  * is static: a SparkContext that already exists (the shared test session)
  * can never pick up a new extensions class, so an in-process test could
  * only exercise the injection lambdas, not the config wiring a SQL-only
  * user actually deploys (`--conf spark.sql.extensions=
  * graft.functions.GraftExtensions`). Builds a session with ONLY that
  * config, runs each native function through `spark.sql`, and prints
  * `PROBE_OK` iff every value matches.
  */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-extensions-probe")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    try {
      def one(sql: String): Any = s.sql(sql).collect().head.get(0)
      val checks = Seq[(String, Any)](
        ("SELECT fix_mojibake('Â£9.99')", "£9.99"),
        ("SELECT ilog2(8L)", 3L * graft.functions.Ilog2.One),
        ("SELECT isqrt(99L)", 9L),
        // interleave(x=3: bits 0,1 -> pos 0,2; y=5: bits 0,2 -> pos 1,5) = 39
        ("SELECT zorder(3, 5, 4)", 39L),
        ("SELECT rolling_hash('ab')", 97L * 257 + 98),
        // decomposed e + COMBINING ACUTE (U+0301) -> precomposed U+00E9
        // U+0301 via its UTF-8 bytes (char() wraps at 256, so unhex instead)
        ("SELECT nfc_normalize(concat('e', decode(unhex('CC81'), 'UTF-8')))", "\u00e9"),
        ("SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D))", 11.0),
        // 2 packed centroids (1,0)/(0,1), norms (1,1): cosine argmax = 0
        ("SELECT nearest_cell(array(1.0D,0.0D), array(1.0D,0.0D,0.0D,1.0D), array(1.0D,1.0D))", 0),
        // 2 packed codes (9,9)/(1,2), window [0,2): L2 argmin = code 1
        ("SELECT nearest_code(array(1.0D,2.0D), array(9.0D,9.0D,1.0D,2.0D), 0, 2)", 1))
      // optimizer rule wiring: a naive bounded-edit-distance predicate over
      // a TABLE column (literals would constant-fold the whole test away)
      // must plan as the banded three-argument form and keep its semantics
      s.range(2).selectExpr(
          "CASE WHEN id = 0 THEN 'kitten' ELSE 'abcdef' END AS a")
        .createOrReplaceTempView("probe_lev")
      val lev = s.sql("SELECT a FROM probe_lev WHERE levenshtein(a, 'sitting') <= 3")
      val levPlan = lev.queryExecution.optimizedPlan.toString
      val levOk = levPlan.contains("levenshtein(") &&
        levPlan.contains("Some(3)") &&
        lev.collect().map(_.getString(0)).toSeq == Seq("kitten")
      // the foldable-literal contract: a COLUMN where a plan-shape constant
      // is required must fail analysis with a named error, not an opaque
      // eval ClassCastException (round-11 advice)
      val foldGuardOk = try {
        s.sql("SELECT zorder(id, id, id) FROM range(3)").collect()
        false // should have thrown
      } catch {
        case e: org.apache.spark.sql.AnalysisException =>
          e.getMessage.contains("zorder") && e.getMessage.contains("foldable")
      }
      val bad = checks.filterNot { case (q, want) => one(q) == want }
      if (bad.isEmpty && levOk && foldGuardOk) println("PROBE_OK")
      else if (bad.isEmpty && levOk) {
        println("PROBE_MISMATCH: zorder foldable guard did not raise the named analysis error")
        sys.exit(1)
      }
      else if (bad.isEmpty) {
        println(s"PROBE_MISMATCH: thresholded-levenshtein rule: $levPlan")
        sys.exit(1)
      } else {
        bad.foreach { case (q, want) =>
          println(s"PROBE_MISMATCH: $q -> ${one(q)} (want $want)")
        }
        sys.exit(1)
      }
    } finally s.stop()
  }
}
