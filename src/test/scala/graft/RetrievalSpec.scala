package graft

import org.apache.spark.sql.functions._

import graft.llm.TextAnalysis
import graft.operators.Funnel

/** BM25 retrieval and funnel-analysis semantics on hand-built corpora where
  * the expected answers are computable by hand. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("bm25TopK ranks the term-dense short doc first and scores match the formula") {
    val docs = Seq(
      (1L, "hash hash hash join"),            // dense in query terms, short
      (2L, "hash scan scan scan scan scan scan scan scan scan"), // one hit, long
      (3L, "scan merge filter sort")          // no query terms
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("hash", "join"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // doc 3 absent: no terms
    // manual recompute for doc 2 / term hash: N=3, T=18, dl=10, tf=1, df=2
    val idfFp = (3L * 1000000L) / 2L
    val num = (idfFp * (22L * 18L * 1L)).toDouble
    val den = (10L * 18L * 1L + 3L * 18L + 9L * 10L * 3L).toDouble
    val expected = num / den
    assert(out(1).getDouble(1) == expected)
  }

  test("bm25TopK: with equal doc lengths, higher tf scores strictly higher") {
    val docs = Seq(
      (1L, "join join join scan"),
      (2L, "join scan scan scan")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(docs, Seq("join"), 10).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
    assert(out(0).getDouble(1) > out(1).getDouble(1))
  }

  test("funnel depth: ordered stages advance, out-of-order and ties do not") {
    val ts = (ms: Long) => new java.sql.Timestamp(ms)
    val events = Seq(
      // u1: full funnel in order
      ("u1", "view", ts(1000)), ("u1", "click", ts(2000)), ("u1", "purchase", ts(3000)),
      // u2: click before view — only view counts
      ("u2", "click", ts(1000)), ("u2", "view", ts(2000)),
      // u3: click ties the view timestamp — strictly-increasing rule blocks it
      ("u3", "view", ts(5000)), ("u3", "click", ts(5000)),
      // u4: noise event types only along the way
      ("u4", "error", ts(1000)), ("u4", "view", ts(2000)), ("u4", "signup", ts(2500)),
      ("u4", "click", ts(3000)),
      // u5: second view later must not consume the click slot
      ("u5", "view", ts(1000)), ("u5", "view", ts(9000)), ("u5", "click", ts(9500)),
      ("u5", "purchase", ts(9200)) // purchase BEFORE the click → depth stays 2
    ).toDF("user_id", "event_type", "ts")
    val out = Funnel.depth(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("u1" -> 3L, "u2" -> 1L, "u3" -> 1L, "u4" -> 2L, "u5" -> 2L))
  }

  test("funnel depth: user with no stage events is absent") {
    val events = Seq(("u9", "error", new java.sql.Timestamp(1L)))
      .toDF("user_id", "event_type", "ts")
    assert(Funnel.depth(events, "user_id", "event_type", "ts",
      Seq("view", "click")).count() == 0)
  }

  test("allPairs cosine: hand corpus — shingle terms, pruning, dot, fixed-point cos², threshold") {
    import graft.llm.AllPairs
    // 3-gram vocabulary: "a b c" df=4 (d1,d2,d3,d5), "b c d" df=2 (d1,d2),
    //   "b c x" df=1, "b c a" df=1, "c a b" df=1 → pruned at df<2;
    // with maxDf=4 both "a b c" and "b c d" survive
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b c d"),
      (3L, "a b c x"),
      (5L, "a b c a b c a b"), // "a b c" tf=2 (plus df-1 grams)
      (6L, "z z")              // <3 tokens: no shingles, no row
    ).toDF("doc_id", "text")
    val out = AllPairs.cosinePairs(docs, "doc_id", "text", maxDf = 4, minCos2Fp = 0L)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // kept vectors: d1 = d2 = {abc:1, bcd:1} n2=2; d3 = {abc:1} n2=1;
    //               d5 = {abc:2} n2=4
    // (1,2): dot=2 → cos² = 4/4 = 1.0 → 1000000;  (3,5): dot=2 → 4/4 → 1000000
    // (1,3)/(2,3): dot=1 → 1/2 → 500000;  (1,5)/(2,5): dot=2 → 4/8 → 500000
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 1000000L),
      (1L, 3L, 1L, 500000L),
      (1L, 5L, 2L, 500000L),
      (2L, 3L, 1L, 500000L),
      (2L, 5L, 2L, 500000L),
      (3L, 5L, 2L, 1000000L)))
    // threshold keeps only the two exact-over-kept-terms pairs
    val thr = AllPairs.cosinePairs(docs, "doc_id", "text", maxDf = 4, minCos2Fp = 750000L)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(thr.toSeq == Seq((1L, 2L), (3L, 5L)))
  }
}
