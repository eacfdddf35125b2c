package graft

import org.apache.spark.sql.functions._

import graft.llm.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Reference merge: plain-Scala left-to-right non-overlapping scan. */
  private def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    syms.foreach { x =>
      if (out.nonEmpty && out.last == a && x == b) out(out.length - 1) = a + b
      else out += x
    }
    out.toSeq
  }

  test("applyMerge matches the reference scan, including same-symbol runs") {
    val words = Seq("aaa", "aaaa", "banana", "abab", "x").toDF("word")
      .withColumn("syms", Bpe.charSymbols(col("word")))
    def run(a: String, b: String): Map[String, Seq[String]] =
      words.select(col("word"), Bpe.applyMerge(col("syms"), a, b).as("m"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val aa = run("a", "a")
    assert(aa("aaa") == Seq("aa", "a"))      // greedy LTR, no overlap
    assert(aa("aaaa") == Seq("aa", "aa"))
    val an = run("a", "n")
    assert(an("banana") == Seq("b", "an", "an", "a"))
    val ab = run("a", "b")
    assert(ab("abab") == Seq("ab", "ab"))
    // exhaustive agreement with the reference on all tested words/pairs
    for (p <- Seq(("a", "a"), ("a", "n"), ("a", "b"), ("n", "a"));
         w <- Seq("aaa", "aaaa", "banana", "abab", "x")) {
      val got = words.where(col("word") === w)
        .select(Bpe.applyMerge(col("syms"), p._1, p._2))
        .head().getSeq[String](0)
      assert(got == refMerge(w.map(_.toString), p._1, p._2),
        s"mismatch for $w under merge $p")
    }
  }

  test("pairCounts weights by vocab count; electMerge breaks ties to the smallest pair") {
    val vocab = Seq(("ab", 3L), ("cb", 3L), ("abc", 1L)).toDF("word", "n")
      .withColumn("syms", Bpe.charSymbols(col("word")))
    val counts = Bpe.pairCounts(vocab, "syms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a b") == 4)   // 3 from "ab" + 1 from "abc"
    assert(counts("c b") == 3)
    assert(counts("b c") == 1)
    // tie: make "c b" also 4 -> election must pick "a b" (lexicographic)
    val vocab2 = Seq(("ab", 3L), ("cb", 4L), ("abc", 1L)).toDF("word", "n")
      .withColumn("syms", Bpe.charSymbols(col("word")))
    val e = Bpe.electMerge(Bpe.pairCounts(vocab2, "syms")).head()
    assert(e.getString(0) == "a b" && e.getLong(1) == 4)
  }

  test("one full round: elect, apply over vocab, recount") {
    val docs = Seq((1L, "banana bandana"), (2L, "banana")).toDF("doc_id", "text")
    val v = Bpe.vocab(docs, "text")
      .withColumn("syms", Bpe.charSymbols(col("word")))
    val e = Bpe.electMerge(Bpe.pairCounts(v, "syms")).head()
    // banana x2 (4 'an') + bandana (2 'an') -> 'a n' wins with 6
    assert(e.getString(0) == "a n" && e.getLong(1) == 6)
    val merged = v.withColumn("syms", Bpe.applyMerge(col("syms"), "a", "n"))
    val c2 = Bpe.pairCounts(merged, "syms")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(c2("an an") == 2)     // banana -> [b, an, an, a]
    assert(c2("b an") == 3)
    assert(!c2.contains("a n"))  // fully merged away
  }

  test("trainRounds: three elections with merged symbols feeding later rounds") {
    val docs = Seq((1L, "banana bandana banana")).toDF("doc_id", "text")
    // vocab: banana n=2, bandana n=1
    // r1 pairs: 'a n' = 2*2+2 = 6 wins
    // r2 over [b,an,an,a] n=2 and [b,an,d,an,a] n=1:
    //   'b an' 3, 'an an' 2, 'an a' 3, 'an d' 1, 'd an' 1
    //   -> tie at 3 between 'an a' and 'b an' -> 'an a' (lexicographic)
    // r3 over [b,an,ana] n=2 and [b,an,d,ana] n=1:
    //   'b an' 3, 'an ana' 2, 'an d' 1, 'd ana' 1 -> 'b an' wins with 3
    val got = Bpe.trainRounds(docs, "text", 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set((1L, "a n", 6L), (2L, "an a", 3L), (3L, "b an", 3L)))
  }

  test("trainRounds stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val got = Bpe.trainRounds(docs, "text", 5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // round 1 merges 'a b' (the only pair); afterwards every word is one
    // symbol -> rounds 2..5 elect nothing
    assert(got == Set((1L, "a b", 2L)))
  }

  test("encodeStats: per-doc symbol counts after the trained merges") {
    val docs = Seq((1L, "banana bandana banana"), (2L, "banana"), (3L, ""))
      .toDF("doc_id", "text")
    // merges (from the trainRounds trace on this corpus): a+n, an+a, b+an.
    // After all three: banana = [ban, ana] (2 syms), bandana = [ban, d, ana]
    // (3 syms)
    val got = Bpe.encodeStats(docs, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(1L) == ((3L, 19L, 7L, 368421L)))  // 2+3+2 syms over 6+7+6 chars
    assert(got(2L) == ((1L, 6L, 2L, 333333L)))
    assert(got(3L) == ((0L, 0L, 0L, 0L)))        // token-less doc surfaces
  }
}
