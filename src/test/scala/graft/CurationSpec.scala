package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Sampling}
import graft.operators.RunningTotal

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a", "one two three four five six seven eight nine ten eleven twelve"),
    (2L, "a", "one two three four five six seven eight nine ten different tail"),
    (3L, "b", "spam spam spam spam spam spam unique words here now"),
    (4L, "b", "x"),
    (5L, "b", "")).toDF("doc_id", "source", "text")

  test("ngramsFromTokens: n-grams count and short-doc empties") {
    val g = docs.select(col("doc_id"),
      Curation.ngramsFromTokens(graft.llm.TextAnalysis.tokens(col("text")), 4).as("g"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(g(1L).length == 9) // 12 tokens -> 9 4-grams
    assert(g(1L).head == "one two three four")
    assert(g(4L).isEmpty && g(5L).isEmpty)
  }

  test("repetitionStats: spam doc flagged, normal doc kept, empty doc vacuous") {
    val out = Curation.repetitionStats(docs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 3: 'spam spam' 2-gram appears 5x of 9 2-grams -> top2=5 > 9/5
    assert(out(3L).getAs[Long]("top2_count") == 5)
    assert(!out(3L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Long]("total_2grams") == 0 && out(5L).getAs[Boolean]("keep"))
    // doc 3 has 'spam spam spam spam spam' x2 among its 5-grams
    assert(out(3L).getAs[Long]("dup5_count") == 2)
  }

  test("dedupSpans: first occurrence kept, duplicate span dropped, reassembly ordered") {
    val out = Curation.dedupSpans(docs, "text", "doc_id", spanWords = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 1 and 2 share their first 10-word span; doc 1 wins
    assert(out(1L).getAs[Long]("n_spans_kept") == 2)
    assert(out(2L).getAs[Long]("n_spans_kept") == 1)
    assert(out(2L).getAs[String]("kept_text") == "different tail")
    assert(out(1L).getAs[String]("kept_text") ==
      "one two three four five six seven eight nine ten eleven twelve")
    assert(out(4L).getAs[Long]("n_spans_total") == 1)
    assert(!out.contains(5L)) // zero tokens -> excluded
  }

  test("contamination: overlap against the benchmark subset, bench docs excluded") {
    // bench = doc 1; doc 2 shares 4-grams with it, doc 3 shares none
    val out = Curation.contamination(docs, "text", "doc_id",
        col("doc_id") === 1L, n = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(!out.contains(1L))
    assert(out(2L).getAs[Boolean]("contaminated"))
    assert(out(2L).getAs[Long]("n_overlap") == 7) // 4-grams within the shared 10-word prefix
    assert(!out(3L).getAs[Boolean]("contaminated"))
    assert(out(4L).getAs[Long]("n_grams") == 0 && !out(4L).getAs[Boolean]("contaminated"))
  }

  test("RunningTotal.grouped matches a window cumsum on multi-partition input") {
    val df = (1 to 100).map(i => (s"g${i % 7}", i.toLong, (i % 13).toLong))
      .toDF("g", "ord", "v").repartition(5)
    val got = RunningTotal.grouped(df, "g", "ord", "v", "cum")
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
    val want = df.select(col("g"), col("ord"),
        sum(col("v")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("ord")).as("cum"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("RunningTotal.grouped: window fallback over driver budget gives identical results") {
    val df = (1 to 100).map(i => (s"g${i % 7}", i.toLong, (i % 13).toLong))
      .toDF("g", "ord", "v").repartition(5)
    // budget of 1 forces the high-cardinality fallback (7 groups > 1 slice)
    val got = RunningTotal.grouped(df, "g", Seq("ord"), "v", "cum", maxDriverSlices = 1L)
      .select("g", "ord", "cum").as[(String, Long, Long)].collect().toSet
    val want = df.select(col("g"), col("ord"),
        sum(col("v")).over(org.apache.spark.sql.expressions.Window
          .partitionBy("g").orderBy("ord")).as("cum"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("RunningTotal.grouped: window fallback preserves fail-fast on null values") {
    val df = Seq(("a", 1L, java.lang.Long.valueOf(1L)), ("a", 2L, null: java.lang.Long))
      .toDF("g", "ord", "v")
    val ex = intercept[Exception] {
      RunningTotal.grouped(df, "g", Seq("ord"), "v", "cum", maxDriverSlices = 0L)
        .collect()
    }
    assert(ex.getMessage.contains("null value") ||
      Option(ex.getCause).exists(_.getMessage.contains("null value")))
  }

  test("benchGramSet: rejects gram sets over the driver budget") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "unrelated words entirely here")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Curation.benchGramSet(docs, "text", col("doc_id") === 1L, n = 2, maxGrams = 3)
    }
    assert(ex.getMessage.contains("over budget") &&
      ex.getMessage.contains("Curation.contamination"))
    // within budget: sorted distinct grams come back
    val ok = Curation.benchGramSet(docs, "text", col("doc_id") === 2L, n = 2, maxGrams = 10)
    assert(ok == ok.sorted && ok.nonEmpty)
  }

  test("linearScore: partial-coverage weight table counts ALL tokens in n_tokens") {
    val docs = Seq((1L, "aa bb cc dd")).toDF("doc_id", "text")
    // weights covering only SOME buckets: n_tokens must still be 4, and
    // the two documented-equivalent forms must agree
    val buckets = 64
    val bucketOf = Seq("aa", "bb", "cc", "dd").toDF("t")
      .select(col("t"), Sampling.hashBucket(col("t"), buckets).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val covered = Seq(bucketOf("aa"), bucketOf("bb")).distinct
    val weights = covered.map(b => (b, 5L)).toDF("bucket", "w_fp")
    val viaJoin = Curation.linearScore(docs, "text", "doc_id", weights, buckets)
      .select("doc_id", "n_tokens", "score_fp", "keep").collect().head
    val viaLit = Curation.linearScoreLiteral(docs, "text", "doc_id",
        covered.map(b => b -> 5L).toMap, buckets)
      .select("doc_id", "n_tokens", "score_fp", "keep").collect().head
    assert(viaJoin.getAs[Long]("n_tokens") == 4L)
    assert(viaJoin.toSeq == viaLit.toSeq)
  }

  test("lmScore: predictable transitions outscore scrambled ones; fixed-point exact") {
    import spark.implicits._
    // corpus bigram LM: c(a b)=6, c(b a)=4, c(a a)=1, c(b b)=1
    // -> p(a b)=6/7, p(b a)=4/5, p(a a)=1/7, p(b b)=1/5
    val corpus = Seq(
      (1L, "a b a b a b a b"), // only high-probability transitions
      (2L, "a a b b a b"),     // same vocab, scrambled transitions
      (3L, "x")).toDF("doc_id", "text")
    val out = Curation.lmScore(corpus, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(3L).getAs[Long]("n_bigrams") == 0 && out(3L).getAs[Long]("avg_fp") == 0)
    assert(out(1L).getAs[Long]("avg_fp") > out(2L).getAs[Long]("avg_fp"))
    // hand-computed: doc1 = (4·(6e12 div 7) + 3·(4e12 div 5)) div 7
    val p_ab = 6000000000000L / 7; val p_ba = 4000000000000L / 5
    assert(out(1L).getAs[Long]("score_fp") == 4 * p_ab + 3 * p_ba)
    assert(out(1L).getAs[Long]("avg_fp") == (4 * p_ab + 3 * p_ba) / 7)
  }

  test("lmScore addOne: Laplace smoothing penalizes hapax transitions, exact arithmetic") {
    import spark.implicits._
    // bigrams: c(a b)=2 (docs 1,2), c(c d)=1 (doc 3); c1: a=2, c=1; V=4
    val corpus = Seq(
      (1L, "a b"), (2L, "a b"), (3L, "c d")).toDF("doc_id", "text")
    val out = Curation.lmScore(corpus, "text", "doc_id", addOne = true)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_fp")).toMap
    // p(a b) = (2+1)e12 div (2+4) = 5e11;  p(c d) = (1+1)e12 div (1+4) = 4e11
    assert(out(1L) == 500000000000L && out(2L) == 500000000000L)
    assert(out(3L) == 400000000000L)
    // unsmoothed scores both transitions at p = 1 — smoothing is what
    // separates the repeated transition from the hapax one
    val raw = Curation.lmScore(corpus, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("score_fp")).toMap
    assert(raw(1L) == raw(3L))
  }

  test("linearScoreLiteral (stateless form) matches linearScore (broadcast-join form)") {
    import spark.implicits._
    val weights: Map[Long, Long] = (0 until 16)
      .map(i => i.toLong -> ((i * 2654435761L) % 2001L - 1000L)).toMap
    val wDf = weights.toSeq.toDF("bucket", "w_fp")
    val viaJoin = Curation.linearScore(docs, "text", "doc_id", wDf, buckets = 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaLiteral = Curation.linearScoreLiteral(docs, "text", "doc_id", weights, buckets = 16)
      .orderBy("doc_id").collect().map(_.toSeq)
    assert(viaJoin.toSeq == viaLiteral.toSeq)
  }

  test("calibrateBySource: per-source percentile, id tiebreak, singleton source") {
    import spark.implicits._
    val rows = Seq(
      (1L, "A", 10L), (2L, "A", 10L), (3L, "A", 30L), // tie 1-2 → id order
      (4L, "B", 99L)                                  // singleton → pct 0
    ).toDF("doc_id", "source", "q")
    val out = Curation.calibrateBySource(rows, "q", "doc_id", "source")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("pct_fp"), r.getAs[String]("tercile"))).toMap
    assert(out(1L) == ((0L, "low")))
    assert(out(2L) == ((500000L, "mid")))
    assert(out(3L) == ((1000000L, "high")))
    assert(out(4L) == ((0L, "low")))
  }

  test("linearScore: hashed-slot lookup, per-doc integer sum, keep sign") {
    import spark.implicits._
    def bucket(tok: String, b: Int): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(h, 16) % b
    }
    val weights = Seq((0L, 10L), (1L, -5L), (2L, 7L), (3L, -1L))
      .toDF("bucket", "w_fp")
    val wMap = Map(0L -> 10L, 1L -> -5L, 2L -> 7L, 3L -> -1L)
    val docs = Seq((1L, "a b"), (2L, ""), (3L, "a a a")).toDF("doc_id", "text")
    val out = Curation.linearScore(docs, "text", "doc_id", weights, buckets = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    val sA = wMap(bucket("a", 4)); val sB = wMap(bucket("b", 4))
    assert(out(1L) == ((2L, sA + sB, sA + sB > 0)))
    assert(out(2L) == ((0L, 0L, false)))
    assert(out(3L) == ((3L, 3 * sA, 3 * sA > 0)))
  }

  test("dupSubstrings: island merging, coverage, same-doc repeats count") {
    import spark.implicits._
    // k=4. d1 and d2 are exact copies: every gram (pos 1..5) is duplicated
    // → one island covering all 8 chars. d3 shares only "abcd" (pos 3).
    // d4 repeats "qqqq" within itself (pos 1,2,3 all hash-equal → global
    // count 3) — same-doc repeats are duplicates, as in exact-substring
    // dedup. d5 has no duplicated gram; d6 is shorter than k.
    val docs = Seq(
      (1L, "abcdefgh"),
      (2L, "abcdefgh"),
      (3L, "xxabcdyy"),
      (4L, "qqqqqq"),
      (5L, "mnopwrst"),
      (6L, "zz")
    ).toDF("doc_id", "text")
    val out = Curation.dupSubstrings(docs, "text", "doc_id", k = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      // d1/d2: 5 dup positions, fold: cov = 4+1+1+1+1 = 8, one island
      (1L, 8L, 5L, 1L, 8L, 1000000L),
      (2L, 8L, 5L, 1L, 8L, 1000000L),
      // d3: single dup position → one island of k chars over 8 → 50%
      (3L, 8L, 1L, 1L, 4L, 500000L),
      // d4: positions 1,2,3 merge into one island: 4+1+1 = 6 of 6 chars
      (4L, 6L, 3L, 1L, 6L, 1000000L),
      (5L, 8L, 0L, 0L, 0L, 0L),
      (6L, 2L, 0L, 0L, 0L, 0L)))
  }

  test("dupSubstrings: disjoint islands stay separate") {
    import spark.implicits._
    // k=3; "abc" at pos 1 and "xyz" at pos 7 duplicated via d2/d3; the
    // gap (7 - 1 >= 3) keeps them separate islands: cov = 3 + 3
    val docs = Seq(
      (1L, "abc___xyz"),
      (2L, "abc......"),
      (3L, "......xyz")
    ).toDF("doc_id", "text")
    val out = Curation.dupSubstrings(docs, "text", "doc_id", k = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4)))
    assert(out.head == ((1L, 2L, 6L)))
  }

  test("contaminationFilter (literal gram set) matches contamination (broadcast join form)") {
    val benchGrams = docs.where(col("doc_id") === 1L)
      .select(explode(array_distinct(
        Curation.ngramsFromTokens(graft.llm.TextAnalysis.tokens(col("text")), 4))).as("g"))
      .distinct().collect().map(_.getString(0)).toSeq
    val viaFilter = Curation.contaminationFilter(
        docs.where(col("doc_id") =!= 1L), "text", "doc_id", benchGrams, n = 4)
      .orderBy("doc_id").collect().map(_.toSeq)
    val viaJoin = Curation.contamination(docs, "text", "doc_id",
        col("doc_id") === 1L, n = 4)
      .collect().map(_.toSeq)
    assert(viaFilter.toSeq == viaJoin.toSeq)
  }

  test("mixtureKeep: rate-1 keeps everything, rate-0 keeps nothing, deterministic") {
    import graft.llm.Sampling
    val ids = (1L to 200L).toDF("id")
    // one stratum, w=1, sumW=1, n=200: T=200 -> rate 1; T=0 -> rate 0
    val all = ids.where(Sampling.mixtureKeep(col("id"), lit(200L), lit(1L), lit(1L), lit(200L))).count()
    val none = ids.where(Sampling.mixtureKeep(col("id"), lit(200L), lit(1L), lit(1L), lit(0L))).count()
    assert(all == 200 && none == 0)
    // half-rate: deterministic (same set twice) and near 100
    val half = ids.where(Sampling.mixtureKeep(col("id"), lit(200L), lit(1L), lit(1L), lit(100L)))
      .as[Long].collect().toSet
    val half2 = ids.where(Sampling.mixtureKeep(col("id"), lit(200L), lit(1L), lit(1L), lit(100L)))
      .as[Long].collect().toSet
    assert(half == half2)
    assert(math.abs(half.size - 100) < 30)
  }

  test("packStats: budget boundaries, crossing docs, per-source reset") {
    // source a: docs of 12 tokens each, budget 10 -> doc1 starts seq 0 and
    // crosses into seq 1; doc2 starts seq 1 (offset 12) and crosses into seq 2
    val out = Curation.packStats(docs, "text", "doc_id", "source", budget = 10)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("seq_id")) -> r).toMap
    assert(out(("a", 0L)).getAs[Long]("n_docs") == 1)
    assert(out(("a", 0L)).getAs[Long]("n_crossing") == 1)
    assert(out(("a", 1L)).getAs[Long]("n_docs") == 1)
    assert(out(("a", 1L)).getAs[Long]("n_crossing") == 1)
    // source b restarts at offset 0: spam doc (10 tokens) fills seq 0 exactly
    assert(out(("b", 0L)).getAs[Long]("n_docs") == 1)
    assert(out(("b", 0L)).getAs[Long]("n_crossing") == 0)
    // doc 4 (1 token) starts seq 1 at offset 10
    assert(out(("b", 1L)).getAs[Long]("n_docs") == 1)
  }

  test("gopherRules: each rule trips independently; integer thresholds exact") {
    val gdocs = Seq(
      // 50 words, mean length 3-10, alpha, stopwords -> keep
      (1L, (1 to 50).map(i => s"the word$i").mkString(" ").split(" ").take(50).mkString(" ")),
      (2L, "short doc"),                               // < 50 words
      (3L, (1 to 50).map(_ => "12345").mkString(" ")), // no alpha words, no stopwords
      (4L, "- bullet\n- bullet\nthe " + (1 to 47).map(i => s"w$i").mkString(" ")), // 2/3 bullet lines > 90%? no: 2*10 <= 3*9 -> pass bullets
      (5L, "the end is near...\nthe end is near…\nok the " +
        (1 to 46).map(i => s"w$i").mkString(" "))      // 2/3 ellipsis lines > 30%
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(gdocs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[Long]("n_stop_hits") == 25)
    assert(!out(2L).getAs[Boolean]("keep"))           // word count
    assert(!out(3L).getAs[Boolean]("keep"))           // alpha + stopwords
    assert(out(3L).getAs[Long]("n_alpha_words") == 0)
    assert(out(4L).getAs[Long]("n_bullet_lines") == 2)
    assert(out(5L).getAs[Long]("n_ellipsis_lines") == 2)
    assert(!out(5L).getAs[Boolean]("keep"))           // 2*10 > 3*3
    // mean-word-length boundary: exactly 3.0 passes (cross-multiplied >=)
    val b = Seq((9L, (1 to 50).map(_ => "the").mkString(" ")))
      .toDF("doc_id", "text")
    val ob = Curation.gopherRules(b, "text", "doc_id").collect().head
    assert(ob.getAs[Long]("sum_word_chars") == 150 && ob.getAs[Boolean]("keep"))
  }

  test("c4Clean: line predicate, order-preserving reassembly, empty survivors") {
    val cdocs = Seq(
      (1L, "Good first line here.\nno punctuation line\nAnother good line!\nhas javascript inside.\ntiny.\nQuoted line stays \""),
      (2L, "all lines fail\nno punct here"),
      (3L, "Braces {bad} line.\nLorem ipsum dolor sit.\nThe only good line?")
    ).toDF("doc_id", "text")
    val out = Curation.c4Clean(cdocs, "text", "doc_id")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_lines") == 6)
    assert(out(1L).getAs[Long]("n_kept") == 3)
    assert(out(1L).getAs[String]("clean_text") ==
      "Good first line here.\nAnother good line!\nQuoted line stays \"")
    assert(!out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[String]("clean_text") == "")
    assert(out(2L).getAs[Long]("kept_chars") == 0)
    assert(out(3L).getAs[Long]("n_kept") == 1)
    assert(out(3L).getAs[String]("clean_text") == "The only good line?")
  }

  test("capPerSource: exact k kept per source, rank deterministic by (md5, id)") {
    val df = (1L to 30L).map(i => (i, if (i <= 20) "a" else "b"))
      .toDF("doc_id", "source")
    val out = Sampling.capPerSource(df, "doc_id", "source", 5L)
    val kept = out.where(col("kept")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("doc_id"))
    assert(kept.count(_._1 == "a") == 5)
    assert(kept.count(_._1 == "b") == 5)
    // rank order matches a driver-side md5 sort of the same ids
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long) = md.digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expectA = (1L to 20L).sortBy(i => (h(i), i)).take(5).toSet
    assert(kept.filter(_._1 == "a").map(_._2).toSet == expectA)
    // under-cap source keeps everything
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("doc_id", "source")
    assert(Sampling.capPerSource(tiny, "doc_id", "source", 5L)
      .where(col("kept")).count() == 2)
  }
}
