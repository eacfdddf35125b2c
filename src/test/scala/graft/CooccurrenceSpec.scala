package graft

import graft.llm.Cooccurrence

class CooccurrenceSpec extends SparkSpec {
  import spark.implicits._

  test("hand corpus: windowed pairs, totals, fixed-point PMI ratio") {
    // doc1 tokens [a,b,a,c]: d=1 → (a,b),(a,b),(a,c); d=2 → (a,a),(b,c)
    // doc2 tokens [b,c]:     d=1 → (b,c)
    // doc3 tokens [z]:       no pairs (shorter than any gap)
    // T = 7 token instances, P = 6 pair instances
    // uni: a=2, b=2, c=2, z=1
    val docs = Seq(
      (1L, "a b a c"),
      (2L, "b c"),
      (3L, "z")
    ).toDF("doc_id", "text")
    val out = Cooccurrence.pairs(docs, "text", "doc_id", window = 2, minCount = 1L)
      .orderBy("term_a", "term_b")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // ratio_fp = (c_xy * 49 * 10^6) div (6 * c_x * c_y)
    //   c_xy=1, c_x=c_y=2 → 49e6 div 24 = 2041666
    //   c_xy=2, c_x=c_y=2 → 98e6 div 24 = 4083333
    assert(out.toSeq == Seq(
      ("a", "a", 1L, 2L, 2L, 2041666L),
      ("a", "b", 2L, 2L, 2L, 4083333L),
      ("a", "c", 1L, 2L, 2L, 2041666L),
      ("b", "c", 2L, 2L, 2L, 4083333L)))
  }

  test("minCount floors the pair table; window=1 is adjacency only") {
    val docs = Seq((1L, "a b a b"), (2L, "c d")).toDF("doc_id", "text")
    // window=1: doc1 → (a,b)×3; doc2 → (c,d)×1
    val out = Cooccurrence.pairs(docs, "text", "doc_id", window = 1, minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq(("a", "b", 3L)))
    intercept[IllegalArgumentException] {
      Cooccurrence.pairs(docs, "text", "doc_id", window = 0)
    }
  }
}
