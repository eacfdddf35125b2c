package graft

import org.apache.spark.sql.functions._

import graft.llm.SetJoin

/** [[graft.llm.SetJoin.jaccardPairs]] against an exhaustive brute-force
  * replay on a crafted near-dup corpus: the prefix filter must find EXACTLY
  * the pairs an O(n²) scan finds — completeness (pigeonhole on the
  * df-ordered prefixes) and precision (the verify step), independent of the
  * sf0.01 oracle corpus. */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  // 1/2 near-identical (one tail word differs), 3 a strict-subset short doc
  // (exercises the length filter), 4 disjoint, 5 disjoint, 6 identical to 1
  private lazy val docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
    (3L, "alpha beta gamma delta epsilon"),
    (4L, "one two three four five six seven eight nine ten"),
    (5L, "completely different words sharing no trigram with any other doc"),
    (6L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"))
    .toDF("doc_id", "text")

  private def bruteForce(tauNum: Long, tauDen: Long): Set[(Long, Long, Long)] = {
    val sets = docs.select(col("doc_id"),
        graft.llm.TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), array_distinct(
        graft.llm.Curation.ngramsFromTokens(col("toks"), 3)).as("terms"))
    sets.as("a").crossJoin(sets.as("b"))
      .where(col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("a.terms"), col("b.terms"))).cast("long"))
      .withColumn("uni", size(col("a.terms")).cast("long") +
        size(col("b.terms")).cast("long") - col("inter"))
      .where(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("a.doc_id"), col("b.doc_id"),
        expr("(inter * 1000000L) div uni"))
      .as[(Long, Long, Long)].collect().toSet
  }

  test("jaccardPairs equals the brute-force all-pairs scan at several thresholds") {
    for ((tn, td) <- Seq((1L, 2L), (7L, 10L), (9L, 10L), (1L, 1L))) {
      val got = SetJoin.jaccardPairs(docs, "doc_id", "text", tn, td)
        .select(col("doc_a"), col("doc_b"), col("jac_fp"))
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteForce(tn, td), s"tau=$tn/$td")
    }
  }

  test("jaccardPairs: identical docs score exactly 1000000 with exact inter/uni") {
    val rows = SetJoin.jaccardPairs(docs, "doc_id", "text", 99L, 100L).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) == ((1L, 6L)))
    assert(r.getAs[Long]("inter") == 10L && r.getAs[Long]("uni") == 10L)
    assert(r.getAs[Long]("jac_fp") == 1000000L)
  }

  test("jaccardPairs: near-dup pair found at 0.7 with the exact fixed-point score") {
    val got = SetJoin.jaccardPairs(docs, "doc_id", "text", 7L, 10L)
      .where(col("doc_a") === 1L && col("doc_b") === 2L).collect()
    assert(got.length == 1)
    // 10 trigrams each, 9 shared -> J = 9/11
    assert(got.head.getAs[Long]("inter") == 9L)
    assert(got.head.getAs[Long]("uni") == 11L)
    assert(got.head.getAs[Long]("jac_fp") == 9L * 1000000L / 11L)
  }

  test("jaccardPairs rejects an invalid threshold") {
    intercept[IllegalArgumentException] {
      SetJoin.jaccardPairs(docs, "doc_id", "text", 3L, 2L)
    }
  }
}
