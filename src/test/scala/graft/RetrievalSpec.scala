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

  test("allPairs cosine: hand corpus — pruning, dot, fixed-point cos², threshold") {
    import graft.llm.AllPairs
    // vocabulary after pruning (df in [2,3] with maxDf=3):
    //   "alpha" df=2 (d1,d2), "beta" df=2 (d1,d2), "gamma" df=2 (d2,d3);
    //   "the" df=4 > maxDf → pruned; "zeta" df=1 → pruned
    val docs = Seq(
      (1L, "the alpha beta beta zeta"),
      (2L, "the alpha beta gamma"),
      (3L, "the gamma gamma"),
      (4L, "the")
    ).toDF("doc_id", "text")
    val out = AllPairs.cosinePairs(docs, "doc_id", "text", maxDf = 3, minCos2Fp = 0L)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // kept vectors: d1 = {alpha:1, beta:2} n2=5; d2 = {alpha:1, beta:1, gamma:1} n2=3;
    //               d3 = {gamma:2} n2=4; d4 = {} (all pruned — no row, no pair)
    // d1·d2 = 1+2 = 3 → cos² = 9/15 = 0.6 → 600000
    // d2·d3 = 2 → cos² = 4/12 → 333333 (floor)
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 600000L),
      (2L, 3L, 2L, 333333L)))
    // threshold keeps only the d1-d2 pair
    val thr = AllPairs.cosinePairs(docs, "doc_id", "text", maxDf = 3, minCos2Fp = 400000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(thr.toSeq == Seq((1L, 2L)))
  }
}
