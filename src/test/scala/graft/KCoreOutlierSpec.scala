package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, TextAnalysis}
import graft.operators.KCore

/** Unit coverage for the k-core peel, vocabulary overlap, and median/MAD
  * outlier operators on crafted graphs/corpora: multi-round peeling with
  * convergence, the round budget, overlap-pair emission rules, and exact
  * interpolating percentile arithmetic. */
class KCoreOutlierSpec extends SparkSpec {
  import spark.implicits._

  test("KCore.peel: pendant chain peels over two rounds, triangle survives") {
    // triangle 1-2-3 plus chain 3-4-5: round 1 drops 5 (deg 1), round 2
    // drops the now-pendant 4, round 3 is the converged no-op
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = KCore.peel(edges, "a", "b", 2).orderBy(col("node"))
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("KCore.peel: a path has no 2-core") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(KCore.peel(edges, "a", "b", 2).count() == 0L)
  }

  test("KCore.peel: maxRounds budget stops mid-peel deterministically") {
    // path 1-2-3-4 with k=2: round 1 strips the endpoints; a second round
    // would empty it, but the budget of 1 leaves edge (2,3)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val got = KCore.peel(edges, "a", "b", 2, maxRounds = 1)
      .orderBy(col("node")).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((2L, 1L), (3L, 1L)))
  }

  test("KCore.peel: duplicate and reversed input pairs canonicalize once") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L))
      .toDF("a", "b")
    val got = KCore.peel(edges, "a", "b", 2).orderBy(col("node"))
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("vocabOverlap: intersection/union counts; disjoint pairs not emitted") {
    val docs = Seq(
      ("s1", "a b c"), ("s2", "b c d"), ("s3", "x y"))
      .toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(docs, "text", "source")
      .orderBy(col("grp_a"), col("grp_b"))
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("s1", "s2", 2L, 4L, 500000L)))
  }

  test("vocabOverlap: token multiplicity within a doc counts once") {
    val docs = Seq(("s1", "a a a b"), ("s2", "a")).toDF("source", "text")
    val got = TextAnalysis.vocabOverlap(docs, "text", "source")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(("s1", "s2", 1L, 2L, 500000L)))
  }

  test("robustOutliers: odd-count group, MAD flags only the extreme row") {
    val df = Seq((1L, "g", 1L), (2L, "g", 2L), (3L, "g", 3L),
      (4L, "g", 4L), (5L, "g", 100L)).toDF("id", "grp", "x")
    val got = Curation.robustOutliers(df, "x", "grp")
      .select(col("id"), col("med"), col("mad"), col("is_outlier"))
      .orderBy(col("id")).as[(Long, Double, Double, Boolean)].collect()
    assert(got.forall(r => r._2 == 3.0 && r._3 == 1.0))
    assert(got.map(r => r._1 -> r._4).toMap ==
      Map(1L -> false, 2L -> false, 3L -> false, 4L -> false, 5L -> true))
  }

  test("robustOutliers: even-count group interpolates both percentile passes") {
    val df = Seq((1L, "g", 1L), (2L, "g", 2L), (3L, "g", 3L), (4L, "g", 4L))
      .toDF("id", "grp", "x")
    val got = Curation.robustOutliers(df, "x", "grp")
      .select(col("med"), col("mad")).distinct()
      .as[(Double, Double)].collect()
    assert(got.toSeq == Seq((2.5, 1.0)))
  }

  test("robustOutliers: groups are independent; approx path keeps the schema") {
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "b", 99L))
      .toDF("id", "grp", "x")
    val exact = Curation.robustOutliers(df, "x", "grp")
    val med = exact.select(col("grp"), col("med")).distinct()
      .as[(String, Double)].collect().toMap
    assert(med == Map("a" -> 10.0, "b" -> 99.0))
    val approx = Curation.robustOutliers(df, "x", "grp", exact = false)
    assert(approx.columns.toSeq == exact.columns.toSeq)
    assert(approx.count() == 3L)
  }
}
