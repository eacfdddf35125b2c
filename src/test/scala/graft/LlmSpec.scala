package graft

import org.apache.spark.sql.functions._

import graft.llm.{Dedup, Ivf, Multimodal, Sampling, Similarity, TextAnalysis}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup of 1
    (4L, "completely different content about spark engines")).toDF("doc_id", "text")

  test("dedupExact groups identical texts, keeps the smallest id") {
    val out = Dedup.dedupExact(docs, "text", "doc_id").collect()
    assert(out.length == 3)
    val dupGroup = out.find(_.getAs[Long]("n_copies") == 2).get
    assert(dupGroup.getAs[Long]("keeper_id") == 1L)
  }

  test("identical docs get identical minhash signatures") {
    val sig = Dedup.minhashSignatures(Dedup.docShingles(docs, "text", "doc_id"), 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.toSeq.tail).toMap
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(4L))
  }

  test("LSH candidates contain the exact-dup pair and not the unrelated doc") {
    val pairs = Dedup.dedupNearMinhash(docs, "text", "doc_id", 8, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngramJaccard: identical docs → 1.0, near-dups in (0,1)") {
    val shingled = Dedup.docShingles(docs, "text", "doc_id")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val j = Dedup.ngramJaccard(shingled, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((1L, 2L)) == 1.0)
    assert(j((1L, 3L)) > 0.0 && j((1L, 3L)) < 1.0)
  }

  test("typed MinHashAgg matches the Column-aggregate signatures") {
    import graft.llm.MinHashAgg
    val shingled = Dedup.docShingles(docs, "text", "doc_id")
    val viaColumns = Dedup.minhashSignatures(shingled, 4).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (1 to 4).map(i => java.lang.Long.parseUnsignedLong(r.getString(i), 16)).toSeq)
      .toMap
    val viaAgg = shingled.as[(Long, String)].groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAgg(4).toColumn.name("sig"))
      .collect().map { case (id, sig) => id -> sig.toSeq }.toMap
    assert(viaAgg == viaColumns)
  }

  test("simhashMultiProbePairs: complete to Hamming 2*nBands-1, superset of exact banding") {
    val corpus = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val fp = Dedup.simhash(corpus, "text", "doc_id", 64).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    // brute-force ground truth at maxHamming 10 (≤ 2·8−1 = 15, so the
    // probe expansion must find EVERY such pair)
    val ids = fp.keys.toSeq.sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = ids(i); b = ids(j)
      h = java.lang.Long.bitCount(fp(a) ^ fp(b)) if h <= 10
    } yield (a, b, h.toLong)).toSet
    val got = Dedup.simhashMultiProbePairs(corpus, "text", "doc_id", 64, 8, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    // and it can only ADD candidates relative to exact banding at ITS radius
    val exact = Dedup.simhashNearDupPairs(corpus, "text", "doc_id", 64, 8, 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(exact.subsetOf(got))
    // radius bound respected
    assert(intercept[IllegalArgumentException] {
      Dedup.simhashMultiProbePairs(corpus, "text", "doc_id", 64, 8, 16)
    }.getMessage.contains("candidate-complete"))
  }

  test("embedding multi-probe sign-LSH: superset of full-signature bucketing") {
    val emb = graft.io.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dim = graft.io.Stats.embeddingDim(spark, "/root/testdata/sf0.001")
    val full = Similarity.embeddingNearDupPairs(emb, 0.15, 8, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mp = Similarity.embeddingNearDupPairsMultiProbe(emb, 0.15,
        nBits = 8, bandBits = 4, dim = dim)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // full-signature equality = every band equal = the flip-0 probes, so
    // multi-probe can only ADD candidates
    assert(full.subsetOf(mp))
  }

  test("simhash near-dup banding finds the exact-dup pair at hamming 0") {
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id", 16, 4, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L)
  }

  test("simhash: identical docs equal, near-dups Hamming-close") {
    val fp = Dedup.simhash(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    val hamming13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val hamming14 = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(hamming13 <= hamming14)
  }

  test("simhash-64: identical docs equal, full width exercised, bounds enforced") {
    val fp = Dedup.simhash(docs, "text", "doc_id", 64).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    // the 4 docs' votes should exercise the upper half of the word: at
    // least one fingerprint sets a bit ≥ 32 (p(all-zero-high-halves) ≈ 0
    // for md5-driven votes; deterministic for this fixture)
    assert(fp.values.exists(v => (v >>> 32) != 0L))
    // 32-bit and 64-bit fingerprints use different vote prefixes by design
    val fp32 = Dedup.simhash(docs, "text", "doc_id", 32).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp32(1L) == fp32(2L))
    intercept[IllegalArgumentException] {
      Dedup.simhash(docs, "text", "doc_id", 65)
    }
  }

  test("crossCorpusCandidates: corpus↔bench only — corpus near-dups never pair with each other") {
    // bench doc 100 ≡ corpus doc 1 (identical text → identical signature →
    // every band matches). Corpus docs 2 and 3 are identical to each OTHER
    // but unrelated to the bench — a self-join leak would emit (2,3).
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "one two three four five six"),
      (4L, "zz")).toDF("doc_id", "text") // <3 tokens: no shingles, dropped
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    val out = Dedup.crossCorpusCandidates(corpus, bench, "text", "doc_id",
        k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)))
    intercept[IllegalArgumentException] {
      Dedup.crossCorpusCandidates(corpus, bench, "text", "doc_id", k = 8, bands = 3)
    }
  }

  test("stratifiedKeep: rate-100 stratum kept whole, rate-0 dropped, default applies") {
    import graft.llm.Sampling
    val rows = (0L until 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "lang")
    val kept = rows.select(col("lang"),
        Sampling.stratifiedKeep(col("id"), col("lang"), Map("a" -> 100, "b" -> 0)).as("k"))
      .groupBy("lang").agg(sum(when(col("k"), 1).otherwise(0)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("a") == 100L && kept("b") == 0L)
    // unlisted stratum falls back to defaultPct=100
    val all = rows.select(Sampling.stratifiedKeep(col("id"), lit("zz"), Map("a" -> 0)).as("k"))
      .where(col("k")).count()
    assert(all == 200L)
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f), 0),
    (1L, Array(0.9f, 0f, 0.1f, 0f), 0),
    (2L, Array(0f, 1f, 0f, 0f), 0),
    (3L, Array(-1f, 0f, 0f, 0f), 1)).toDF("vec_id", "embedding", "label")

  test("cosine: orthogonal → 0, identical-direction → 1, opposite → -1") {
    val df = Seq((Array(1f, 0f), Array(0f, 1f)), (Array(1f, 0f), Array(2f, 0f)),
      (Array(1f, 0f), Array(-3f, 0f))).toDF("a", "b")
    val out = df.select(Similarity.cosine($"a", $"b")).collect().map(_.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 1.0 && out(2) == -1.0)
  }

  test("bruteForceTopK ranks the closest vector first, excludes self") {
    val out = Similarity.bruteForceTopK(vecs.where($"vec_id" === 0), vecs, 3)
      .orderBy($"rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 2L, 3L))
    assert(out.head.getAs[Double]("cos_sim") > 0.99)
  }

  test("bucketTopK only searches the query's bucket") {
    val out = Similarity.bucketTopK(vecs.where($"vec_id" === 0), vecs, 10, "label")
    assert(!out.collect().map(_.getAs[Long]("neighbor_id")).contains(3L))
  }

  test("embeddingNearDupPairs finds the near-identical pair within a bucket") {
    val pairs = Similarity.embeddingNearDupPairs(vecs, 0.9, nBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L))) // 2 is orthogonal; 3 is in another sign bucket
  }

  test("dimStats: per-dimension mean/std match a driver-side recompute") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, -2.0f)),
      (2L, Seq(3.0f, 0.5f)),
      (3L, Seq(5.0f, 0.25f))).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.dimStats(emb, "embedding", 2)
      .collect().map(r => r.getAs[Long]("dim") ->
        (r.getAs[Long]("n_vecs"), r.getAs[Double]("mean"), r.getAs[Double]("std"))).toMap
    assert(out(0L)._1 == 3)
    // exact values: fixed-point round(v*1e12) is lossless for these inputs
    assert(out(0L)._2 == 3.0)
    assert(out(0L)._3 == math.sqrt((1.0 + 9.0 + 25.0) / 3.0 - 9.0))
    assert(out(1L)._2 == (-2.0 + 0.5 + 0.25) / 3.0)
  }

  test("standardize: z-vectors have mean 0 / unit std against their own stats") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1.0f, 10.0f)),
      (2L, Seq(3.0f, 20.0f)),
      (3L, Seq(5.0f, 60.0f))).toDF("vec_id", "embedding")
    val stats = graft.llm.Similarity.dimStats(emb, "embedding", 2)
    val z = graft.llm.Similarity.standardize(emb, stats, "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1)).toMap
    // dim 0: mean 3, std sqrt(8/3)
    val s0 = math.sqrt((1.0 + 9.0 + 25.0) / 3.0 - 9.0)
    assert(z(1L)(0) == (1.0 - 3.0) / s0)
    assert(z(3L)(0) == (5.0 - 3.0) / s0)
    // standardized columns re-standardize to ~N(0,1): mean 0, std 1
    val zd = z.values.map(_.head)
    assert(math.abs(zd.sum) < 1e-12)
    assert(math.abs(zd.map(x => x * x).sum / 3.0 - 1.0) < 1e-12)
  }
}

class MmrSpec extends SparkSpec {
  import spark.implicits._

  test("mmr picks diversity over raw similarity; ranks and scores match hand math") {
    // query 0 = [1,1]; corpus: 1=[1,0], 2=[0.9,0.1], 3=[0,1]
    // sims to q: c2 ≈ 0.781 (top), c1 = c3 ≈ 0.707
    // round 1 → c2. round 2: c1 is nearly parallel to c2 (cos ≈ 0.994) so
    // its MMR score goes negative; c3 is nearly orthogonal to c2 → picked.
    val emb = Seq(
      (0L, Seq(1f, 1f)),
      (1L, Seq(1f, 0f)),
      (2L, Seq(0.9f, 0.1f)),
      (3L, Seq(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = graft.llm.Similarity.mmrTopK(
        emb.where(col("vec_id") === 0L), emb, candidates = 3, k = 3, dim = 2)
      .orderBy("rank").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(x => (x._1, x._2)).toSeq == Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    // hand math (float inputs promoted to double, same op order as engine)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val q = Seq(1f, 1f); val c1 = Seq(1f, 0f); val c2 = Seq(0.9f, 0.1f); val c3 = Seq(0f, 1f)
    assert(math.abs(out(0)._3 - 0.5 * cos(q, c2)) < 1e-12)
    assert(math.abs(out(1)._3 - (0.5 * cos(q, c3) - 0.5 * cos(c3, c2))) < 1e-12)
    // round 3 takes the last candidate; penalty is the max over {c2, c3}
    val pen1 = math.max(cos(c1, c2), cos(c1, c3))
    assert(math.abs(out(2)._3 - (0.5 * cos(q, c1) - 0.5 * pen1)) < 1e-12)
  }
}

class IvfSpec extends SparkSpec {
  import spark.implicits._

  // two clean clusters around the x and y axes
  private lazy val vecs = Seq(
    (0L, Array(1f, 0.1f, 0f, 0f)), (1L, Array(0.9f, 0f, 0.1f, 0f)),
    (2L, Array(1f, 0f, 0.05f, 0f)), (3L, Array(0.1f, 1f, 0f, 0f)),
    (4L, Array(0f, 0.9f, 0.1f, 0f)), (5L, Array(0.05f, 1f, 0f, 0.1f)))
    .toDF("vec_id", "embedding")

  private lazy val centroids = Ivf.fit(vecs, 2, 2, 4)

  test("k-means converges to the two planted clusters") {
    val cells = Ivf.assign(vecs, centroids, 4).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cell")).toMap
    assert(Set(cells(0L), cells(1L), cells(2L)).size == 1)
    assert(Set(cells(3L), cells(4L), cells(5L)).size == 1)
    assert(cells(0L) != cells(3L))
  }

  test("assignment puts every vector in its max-cosine cell") {
    val cent = centroids.collect().map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    Ivf.assign(vecs, centroids, 4).collect().foreach { r =>
      val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
      val best = cent.minBy { case (_, c) => -cos(v, c) }._1
      assert(r.getAs[Int]("cell") == best)
    }
  }

  test("IVF top-k with nProbe = #cells equals brute force") {
    val q = vecs.where($"vec_id" === 0)
    val ivf = Ivf.topK(q, vecs, centroids, 3, nProbe = 2, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = graft.llm.Similarity.bruteForceTopK(q, vecs, 3, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("IVF top-k with nProbe=1 searches only the query's own cluster") {
    val q = vecs.where($"vec_id" === 0)
    val out = Ivf.topK(q, vecs, centroids, 5, nProbe = 1, dim = 4)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    assert(out == Set(1L, 2L)) // same-cluster only, self excluded
  }

  test("cellRepresentatives: one best-centered exemplar per cell, full populations") {
    val reps = Ivf.cellRepresentatives(vecs, centroids, 4).collect()
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Long]("rep_id"), r.getAs[Double]("rep_score"), r.getAs[Long]("n_members"))).toMap
    assert(reps.size == 2)
    assert(reps.values.map(_._3).sum == 6) // every vector counted once
    // the rep really is its cell's max-cosine member
    val cent = centroids.collect().map(r => r.getAs[Int]("cell") -> r.getSeq[Double](1)).toMap
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val byCell = Ivf.assign(vecs, centroids, 4).collect()
      .groupBy(_.getAs[Int]("cell"))
    byCell.foreach { case (cell, rows) =>
      val best = rows.map { r =>
        val v = r.getSeq[Float](r.fieldIndex("embedding")).map(_.toDouble)
        (r.getAs[Long]("vec_id"), cos(v, cent(cell)))
      }.minBy { case (id, s) => (-s, id) }
      assert(reps(cell)._1 == best._1)
      assert(reps(cell)._3 == rows.length)
    }
  }
}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercased \\W+ split, empties dropped") {
    val out = Seq("Hello, World! foo_bar 42").toDF("t")
      .select(TextAnalysis.tokens($"t")).collect().head.getSeq[String](0)
    assert(out == Seq("hello", "world", "foo_bar", "42"))
  }

  test("shingles3: n-2 shingles, none for docs under 3 tokens") {
    val df = Seq("a b c d", "a b").toDF("t")
    val out = df.select(TextAnalysis.shingles3($"t")).collect().map(_.getSeq[String](0))
    assert(out(0) == Seq("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("token counts: whitespace vs BPE-ish") {
    val row = Seq("Hello world, it's 2024!").toDF("t")
      .select(TextAnalysis.wsTokenCount($"t").as("ws"), TextAnalysis.bpeTokenCount($"t").as("bpe"))
      .collect().head
    assert(row.getLong(0) == 4)
    // Hello|world|,|it|'|s|2024|! = 8
    assert(row.getLong(1) == 8)
  }

  test("langId picks the dominant stopword profile, und for gibberish") {
    val df = Seq("the cat and the dog is in the house",
      "el perro y la casa de los gatos", "zzz qqq xxx").toDF("t")
    val out = df.select(TextAnalysis.langId($"t")).collect().map(_.getString(0))
    assert(out.toSeq == Seq("en", "es", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val df = Seq("Hello   World", "hello world").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint($"t")).collect().map(_.getString(0))
    assert(fps(0) == fps(1))
  }

  test("rollingHash: deterministic, spread, stays in [0, 2^61)") {
    val h1 = TextAnalysis.rollingHashImpl("hello world")
    assert(h1 == TextAnalysis.rollingHashImpl("hello world"))
    assert(h1 != TextAnalysis.rollingHashImpl("hello worle"))
    assert(TextAnalysis.rollingHashImpl(null) == 0L)
    val mod = (1L << 61) - 1
    Seq("", "a", "ab", "long string " * 50).foreach { s =>
      val h = TextAnalysis.rollingHashImpl(s)
      assert(h >= 0 && h < mod)
    }
  }

  test("native RollingHash expression equals the UDF and impl on a DataFrame") {
    import spark.implicits._
    val df = Seq("hello world", "", "ü unicode ≠ ascii").toDF("t")
    val both = df.select(
        graft.llm.RollingHash.rollingHashNative(org.apache.spark.sql.functions.col("t")).as("native"),
        TextAnalysis.rollingHash(org.apache.spark.sql.functions.col("t")).as("viaUdf"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // null input → 0, and SQL registration works
    graft.llm.RollingHash.register(spark)
    val viaSql = spark.sql("SELECT rolling_hash(CAST(NULL AS STRING))").collect().head.getLong(0)
    assert(viaSql == 0L)
  }

  test("rollingHash matches a BigInt reference implementation") {
    val mod = BigInt((1L << 61) - 1)
    def ref(s: String): Long =
      s.foldLeft(BigInt(0))((h, c) => (h * 257 + c.toInt) % mod).toLong
    Seq("a", "hello world", "Zebra-42!", "ü unicode ≠ ascii").foreach { s =>
      assert(TextAnalysis.rollingHashImpl(s) == ref(s), s"mismatch for '$s'")
    }
  }

  test("q30 golden: rolling-hash fingerprints of the sf0.001 corpus are pinned") {
    // q30 has no SQL oracle (UDF), so the driver's check is rows-only;
    // this golden pins the full query path (normalize → Karp-Rabin) against
    // values independently recomputed outside the JVM. If the corpus or the
    // hash ever drifts, this is the test that says so.
    val out = graft.queries.LlmQueries.q30_rolling_fingerprint(spark, "/root/testdata/sf0.001")
      .limit(5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val golden = Map(
      0L -> 1077692939377088207L,
      1L -> 398827300041533204L,
      2L -> 1945751135419747022L,
      3L -> 2120039884786677517L,
      4L -> 546835982237914036L)
    assert(out == golden)
  }
}

class TrainingDataOpsSpec extends SparkSpec {
  import graft.llm.{Quantize, TextAnalysis}
  import spark.implicits._

  test("redact replaces emails, URLs, and digit runs with placeholders") {
    val out = Seq("mail me at a.b+c@test.org or see https://x.io/p?q=1 room 42")
      .toDF("t").select(TextAnalysis.redact($"t")).collect().head.getString(0)
    assert(out == "mail me at <EMAIL> or see <URL> room <NUM>")
  }

  test("chunk covers every token with the configured overlap") {
    // 250 tokens, chunkSize 100, overlap 20 → starts 1, 81, 161 (stride 80)
    val doc = Seq((1L, (1 to 250).map(i => s"w$i").mkString(" "))).toDF("doc_id", "text")
    val chunks = TextAnalysis.chunk(doc, "text", "doc_id", 100, 20)
      .orderBy($"chunk_id").collect()
    assert(chunks.map(_.getAs[Long]("chunk_id")).toSeq == Seq(1L, 2L, 3L))
    assert(chunks.map(_.getAs[Long]("n_chunk_tokens")).toSeq == Seq(100L, 100L, 90L))
    // short docs yield one chunk; empty docs none
    val short = Seq((2L, "a b c"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(short, "text", "doc_id", 100, 20).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_chunk_tokens") == 3L)
  }

  test("int8 quantization bounds codes to [-127,127] and dequantizes within one step") {
    val df = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0f)), (2L, Array(0f, 0f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val q = Quantize.withQuantized(df).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getSeq[Int](r.fieldIndex("qvec")), r.getAs[Double]("qscale"))).toMap
    val (codes, scale) = q(1L)
    assert(codes.forall(c => c >= -127 && c <= 127))
    assert(codes(1) == -127) // the max-magnitude component hits the rail
    // dequantization error is bounded by one quantization step
    val orig = Seq(0.5, -1.0, 0.25, 0.0)
    codes.zip(orig).foreach { case (c, o) =>
      assert(math.abs(c * scale - o) <= scale + 1e-12)
    }
    assert(q(2L)._1.forall(_ == 0)) // zero vector → zero codes, no div-by-zero
  }

  test("priorityFp matches the manual w*1e6 div (bucket+1) recompute, stays integral") {
    import graft.llm.Sampling
    val rows = Seq((1L, 500L), (2L, 500L), (3L, 123456L)).toDF("k", "w")
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(k: Long): Long = {
      val hx = md.digest(k.toString.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hx, 16) % 1000000L
    }
    Seq((1L, 500L), (2L, 500L), (3L, 123456L)).foreach { case (k, w) =>
      val r = rows.where($"k" === k).select(Sampling.priorityFp($"k", $"w"))
        .collect().head
      assert(r.getLong(0) == w * 1000000L / (bucket(k) + 1L))
    }
    // equal weights: ordering is decided by the key hash alone (u smaller →
    // priority larger), so the sampler is deterministic under re-runs
    val p1 = 500L * 1000000L / (bucket(1L) + 1L)
    val p2 = 500L * 1000000L / (bucket(2L) + 1L)
    assert(p1 != p2)
  }

  test("shardAssign: md5-order round-robin dealing, balanced, independent recompute") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ids = (1L to 10L)
    val out = Sampling.shardAssign(ids.toDF("doc_id"), "doc_id", nShards = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // independent plain-Scala recompute of the permutation
    val expected = ids.sortBy(i => md5hex(i.toString)).zipWithIndex
      .map { case (id, rk) => id -> (rk.toLong % 3, rk.toLong / 3) }.toMap
    assert(out == expected)
    // balanced: 10 rows over 3 shards → sizes {4, 3, 3}
    val sizes = out.values.groupBy(_._1).view.mapValues(_.size).toMap
    assert(sizes.values.toSeq.sorted == Seq(3, 3, 4))
    intercept[IllegalArgumentException] {
      Sampling.shardAssign(ids.toDF("doc_id"), "doc_id", nShards = 0)
    }
  }

  test("interleaveBySource: round-robin across sources, per-source md5 shuffle") {
    import spark.implicits._
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // source A: ids 1..3, source B: ids 4..5
    val rows = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"))
    val out = Sampling.interleaveBySource(rows.toDF("doc_id", "source"),
        "doc_id", "source")
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("src_pos"), r.getAs[Long]("interleave_pos"))).toMap
    // independent recompute: rank within source by md5, then (src_pos, source)
    val srcPos = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.map(_._1).sortBy(i => md5hex(i.toString)).zipWithIndex
    }.toMap
    val expected = rows.map { case (id, src) => (id, srcPos(id).toLong, src) }
      .sortBy { case (_, p, src) => (p, src) }.zipWithIndex
      .map { case ((id, p, _), gp) => id -> (p, gp.toLong) }.toMap
    assert(out == expected)
    // structural: position p of EVERY source precedes position p+1 of ANY
    val byGlobal = out.values.toSeq.sortBy(_._2).map(_._1)
    assert(byGlobal == byGlobal.sorted)
  }
}

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two planted clusters seeded by vecs 0 (x-ish) and 1 (y-ish);
  // 2 duplicates 0, 4 near-duplicates 1, 3 and 5 share cells but sit
  // below any sane threshold
  private lazy val vecs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)), (1L, Array(0f, 1f, 0f, 0f)),
    (2L, Array(1f, 0f, 0f, 0f)), (3L, Array(0.6f, 0f, 0.8f, 0f)),
    (4L, Array(0f, 0.98f, 0f, 0.05f)),
    (5L, Array(0f, 0.04f, 0f, 1f))).toDF("vec_id", "embedding")

  test("semdedup drops exactly the higher-id member of each near-dup pair") {
    import graft.llm.{Ivf, SemDedup}
    val out = SemDedup.verdicts(vecs, Ivf.fit(vecs, 2, 2, 4), 4, 0.95)
      .collect()
      .map(r => r.getAs[Long]("vec_id") ->
        ((r.getAs[Long]("n_dups_prior"), r.getAs[Boolean]("kept")))).toMap
    assert(out(0L) == ((0L, true)))
    assert(out(2L) == ((1L, false))) // exact dup of 0
    assert(out(3L) == ((0L, true))) // same cell as 0/2, cos 0.6 < 0.95
    assert(out(1L) == ((0L, true)))
    assert(out(4L) == ((1L, false))) // near dup of 1 (cos ~0.9987)
    assert(out(5L) == ((0L, true))) // y-cell but near-orthogonal to 1
  }

  test("threshold 1.0-ish keeps everything except exact duplicates") {
    import graft.llm.{Ivf, SemDedup}
    val kept = SemDedup.verdicts(vecs, Ivf.fit(vecs, 2, 2, 4), 4, 0.999999)
      .where($"kept").collect().map(_.getAs[Long]("vec_id")).toSet
    assert(kept == Set(0L, 1L, 3L, 4L, 5L))
  }
}

class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "en", "spark shuffle spark shuffle"),
    (2L, "en", "spark shuffle join"),
    (3L, "de", "der schnelle zug"),
    (4L, "de", "spark shuffle der zug"),
    (5L, "en", "one")).toDF("doc_id", "lang", "text")

  test("hashedNgramScores matches a plain-Scala recompute of the ratio table") {
    import graft.llm.Importance
    val buckets = 64
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(gram: String): Long = {
      val d = md.digest(gram.getBytes("UTF-8"))
      (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % buckets
    }
    val corpus = Seq(
      (1L, true, "spark shuffle spark shuffle"),
      (2L, true, "spark shuffle join"),
      (3L, false, "der schnelle zug"),
      (4L, false, "spark shuffle der zug"),
      (5L, true, "one"))
    def grams(t: String): Seq[String] =
      t.split("\\W+").filter(_.nonEmpty).sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSeq
    val raw = corpus.flatMap(c => grams(c._3)).groupBy(bucket).view.mapValues(_.size)
    val tgt = corpus.filter(_._2).flatMap(c => grams(c._3))
      .groupBy(bucket).view.mapValues(_.size)
    def score(t: String): (Long, Long) = {
      val gs = grams(t)
      (gs.size.toLong, gs.map { g =>
        val b = bucket(g)
        (tgt.getOrElse(b, 0) + 1L) * 1000000L / (raw(b) + 1L)
      }.sum)
    }
    val out = Importance.hashedNgramScores(docs, "text", "doc_id",
        $"lang" === "en", buckets)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    corpus.foreach { case (id, _, t) => assert(out(id) == score(t), s"doc $id") }
    assert(out(5L) == ((0L, 0L))) // single-token doc: no bigrams
  }

  test("a target-only phrase outscores a non-target-only phrase per gram") {
    import graft.llm.Importance
    val out = Importance.hashedNgramScores(docs, "text", "doc_id",
        $"lang" === "en", 4096)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 1 is pure target-corpus bigrams; doc 3 pure non-target
    assert(out(1L) / 3 > out(3L) / 2)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withPayload wraps text as binary + typed metadata struct") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.withPayload(df, "text", "doc_id").collect().head
    assert(out.getAs[Array[Byte]]("payload").toSeq == "abc".getBytes("UTF-8").toSeq)
    val meta = out.getAs[org.apache.spark.sql.Row]("meta")
    assert(meta.getAs[String]("mime") == "text/plain")
    assert(meta.getAs[Long]("n_bytes") == 3L)
    assert(meta.getAs[Long]("source_id") == 1L)
  }

  test("extractFeatures: batched stub decode produces (id, 4-float vector)") {
    val df = Seq((7L, "ab"), (8L, "")).toDF("doc_id", "text")
    val out = Multimodal.extractFeatures(
      Multimodal.withPayload(df, "text", "doc_id"), "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(out(7L) == Seq(2f, 97f, 98f, (97f + 98f) % 997))
    assert(out(8L) == Seq(0f, 0f, 0f, 0f)) // empty payload → zero vector
  }

  test("frameFeatures: resize + frame slicing + per-frame decode, executor-side fan-out") {
    // 6-byte payload, resize to 6 (no-op), k=3 → frames of exactly 2 bytes
    val df = Seq((1L, "abcdef"), (2L, "")).toDF("doc_id", "text")
    val out = Multimodal.frameFeatures(
        Multimodal.withPayload(df, "text", "doc_id"), "doc_id", "payload",
        k = 3, resizeTo = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Float](2)).toMap
    assert(out.size == 6) // one row per (doc, frame)
    assert(out((1L, 0L)) == Seq(2f, 'a'.toFloat, 'b'.toFloat, ('a' + 'b').toFloat % 997))
    assert(out((1L, 2L)) == Seq(2f, 'e'.toFloat, 'f'.toFloat, ('e' + 'f').toFloat % 997))
    // empty text → 6 zero-pad bytes → frames exist, all-zero features except length
    assert(out((2L, 0L)) == Seq(2f, 0f, 0f, 0f))
    // truncation + padding: 4-byte payload resized to 6 → last frame is 'd' + 0-pad
    val pad = Multimodal.frameFeatures(
        Multimodal.withPayload(Seq((3L, "abcd")).toDF("doc_id", "text"), "text", "doc_id"),
        "doc_id", "payload", k = 3, resizeTo = 6)
      .collect().map(r => r.getLong(1) -> r.getSeq[Float](2)).toMap
    assert(pad(2L) == Seq(2f, 0f, 0f, 0f)) // frame [4,6) is pure padding
    assert(pad(1L) == Seq(2f, 'c'.toFloat, 'd'.toFloat, ('c' + 'd').toFloat % 997))
  }
}
