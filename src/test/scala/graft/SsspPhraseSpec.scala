package graft

import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis
import graft.operators.Bfs

/** Unit coverage for the weighted-SSSP relaxation ([[Bfs.sssp]]) and the
  * positional phrase search ([[TextAnalysis.phraseSearch]]) — crafted
  * inputs so correctness is pinned independently of the sf0.01 oracle
  * corpus. */
class SsspPhraseSpec extends SparkSpec {
  import spark.implicits._

  test("Bfs.sssp: takes the cheaper multi-edge path, not the fewer-hop one") {
    // 1 -10-> 2 -10-> 3, and a direct 1 -100-> 3: shortest to 3 is 20 via 2.
    val e = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 100L))
      .toDF("u", "v", "w")
    val got = Bfs.sssp(e, "u", "v", "w", Seq(1L).toDF("node"), rounds = 3)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 0L), (2L, 10L), (3L, 20L)))
  }

  test("Bfs.sssp: round budget bounds edge depth; edges relax both ways") {
    val e = Seq((1L, 2L, 5L), (2L, 3L, 5L), (3L, 4L, 5L)).toDF("u", "v", "w")
    // seed at 4: with 1 round only 3 is reached (undirected), 1 needs 3 rounds
    val r1 = Bfs.sssp(e, "u", "v", "w", Seq(4L).toDF("node"), rounds = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r1 == Map(4L -> 0L, 3L -> 5L))
    val r3 = Bfs.sssp(e, "u", "v", "w", Seq(4L).toDF("node"), rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r3 == Map(4L -> 0L, 3L -> 5L, 2L -> 10L, 1L -> 15L))
  }

  test("Bfs.sssp: multi-source takes the nearest seed; isolated seed kept") {
    val e = Seq((1L, 2L, 7L), (2L, 3L, 7L)).toDF("u", "v", "w")
    val got = Bfs.sssp(e, "u", "v", "w", Seq(1L, 3L, 99L).toDF("node"), 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 0L, 3L -> 0L, 2L -> 7L, 99L -> 0L))
  }

  test("phraseSearch: counts overlapping + repeated matches, 0-based first") {
    val docs = Seq(
      (1L, "a b c a b"),      // "a b" at 0 and 3
      (2L, "b a b a"),        // "a b" at 1
      (3L, "a a a"),          // repeated-term phrase support checked below
      (4L, "c c c")           // no match
    ).toDF("doc_id", "text")
    val ab = TextAnalysis.phraseSearch(docs, "text", "doc_id", Seq("a", "b"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(ab == Seq((1L, 2L, 0L), (2L, 1L, 1L)))
    // repeated term: "a a" occurs twice in doc 3 (positions 0,1 — overlap ok)
    val aa = TextAnalysis.phraseSearch(docs, "text", "doc_id", Seq("a", "a"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(aa == Seq((3L, 2L, 0L)))
  }

  test("phraseSearch: 3-term phrase is the 3-way postings join") {
    val docs = Seq((1L, "x y z x y z"), (2L, "x y x z")).toDF("doc_id", "text")
    val got = TextAnalysis
      .phraseSearch(docs, "text", "doc_id", Seq("x", "y", "z"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 2L, 0L)))
  }
}
