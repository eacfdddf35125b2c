package graft

import org.apache.spark.sql.functions._

import graft.llm.Sampling

/** Unit coverage for the round-6 mixture operators, independent of the
  * sf0.01 oracle corpus: [[graft.llm.Sampling.tokenBudgetPerSource]]'s
  * prefix-admission rule and [[graft.llm.Sampling.temperatureQuotas]]'s
  * largest-remainder arithmetic and tie-breaks. */
class SamplingBudgetSpec extends SparkSpec {
  import spark.implicits._

  test("Bounded.collect: under budget returns all rows, over budget fails") {
    val df = (1L to 10L).toDF("x")
    val got = graft.io.Bounded.collect(df, maxRows = 10, why = "test frame")
    assert(got.map(_.getLong(0)).sorted.toSeq == (1L to 10L))
    val e = intercept[IllegalArgumentException] {
      graft.io.Bounded.collect(df, maxRows = 9, why = "nine-row license")
    }
    assert(e.getMessage.contains("nine-row license"))
    assert(e.getMessage.contains("more than 9"))
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("tokenBudgetPerSource: admitted set is the exact md5-order prefix") {
    // source a: 5 docs of 10 tokens, budget 25 -> exactly the first 2 in
    // md5(id) order fit (cum 10, 20; the third would reach 30)
    val docs = (1L to 5L).map(i => (i, "a", 10L)).toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetPerSource(docs, "doc_id", "source", "n_tokens", 25L)
      .select(col("doc_id"), col("cum_tokens"), col("kept"))
      .as[(Long, Long, Boolean)].collect().map { case (k, v, w) => k -> ((v, w)) }.toMap
    val hashOrder = (1L to 5L).sortBy(i => md5hex(i.toString))
    hashOrder.zipWithIndex.foreach { case (id, pos) =>
      assert(out(id)._1 == (pos + 1) * 10L, s"cum of doc $id")
      assert(out(id)._2 == (pos < 2), s"kept of doc $id")
    }
  }

  test("tokenBudgetPerSource: a doc alone over budget blocks its source; sources independent") {
    val docs = Seq((1L, "big", 100L), (2L, "big", 1L), (3L, "ok", 7L))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.tokenBudgetPerSource(docs, "doc_id", "source", "n_tokens", 50L)
      .select(col("doc_id"), col("kept")).as[(Long, Boolean)].collect().toMap
    // whichever of docs 1/2 hashes first: doc 1 (100 tokens) pushes cum past
    // 50 at its position, so at most doc 2 can be kept — and only if it
    // hashes BEFORE doc 1 (monotone cum: after 101 nothing re-opens)
    assert(!out(1L))
    val twoFirst = md5hex("2") < md5hex("1")
    assert(out(2L) == twoFirst)
    assert(out(3L)) // the other source is unaffected
  }

  test("temperatureQuotas: sqrt weights, largest-remainder rounding, quotas sum to total") {
    // counts 16/15/1 -> integer sqrt weights 4/3/1, W=8, total=10:
    // base 5/3/1 (rem 0/6/2), leftover 1 goes to the largest remainder (b)
    val docs = (Seq.fill(16)("a") ++ Seq.fill(15)("b") ++ Seq("c"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = Sampling.temperatureQuotas(docs, "source", 10L)
      .select(col("source"), col("w"), col("base"), col("rem"), col("quota"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 4L, 5L, 0L, 5L)))
    assert(out("b") == (("b", 3L, 3L, 6L, 4L)))
    assert(out("c") == (("c", 1L, 1L, 2L, 1L)))
    assert(out.values.map(_._5).sum == 10L)
  }

  test("temperatureQuotas: remainder ties break by source name ascending") {
    // two equal sources (w=2 each, W=4), total=3: base 1 rem 2 for both;
    // the single leftover unit goes to the lexicographically first source
    val docs = (Seq.fill(4)("a") ++ Seq.fill(4)("b"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = Sampling.temperatureQuotas(docs, "source", 3L)
      .select(col("source"), col("quota")).as[(String, Long)].collect().toMap
    assert(out("a") == 2L && out("b") == 1L)
  }

  test("temperatureQuotas: integer sqrt is exact at boundaries") {
    // 15 -> 3 (not 4), 16 -> 4, 17 -> 4: the float-estimate ±1 correction
    val docs = (Seq.fill(15)("p") ++ Seq.fill(16)("q") ++ Seq.fill(17)("r"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "source")
    val out = Sampling.temperatureQuotas(docs, "source", 0L)
      .select(col("source"), col("w")).as[(String, Long)].collect().toMap
    assert(out == Map("p" -> 3L, "q" -> 4L, "r" -> 4L))
  }
}
