package graft.tools

import org.apache.spark.sql.SparkSession

import graft.llm.Dedup

/** Dev-only stress run: the MinHash-LSH dedup pipeline over a 20×-exploded
  * documents table (100k docs), to confirm the per-stage scaling is linear
  * in corpus size — i.e. candidate generation stays bucket-bounded and no
  * stage degenerates to all-pairs. */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse("/tmp/documents_x20.parquet")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val doc = spark.read.parquet(path)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("docs")(doc.count())
    time("exact dedup")(Dedup.dedupExact(doc, "text", "doc_id").count())
    time("lsh candidates")(Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4).count())
    time("simhash neardup")(Dedup.simhashNearDupPairs(doc, "text", "doc_id", 32, 8, 3).count())
    time("simhash-64 fp")(Dedup.simhash(doc, "text", "doc_id", 64).count())
    time("tfidf top3")(graft.llm.TextAnalysis.tfIdfTopK(doc, 3)
      .queryExecution.toRdd.count())
    time("editdist verify") {
      // q91's shape: levenshtein ONLY over bucket-colocated candidates on
      // bounded prefixes — must stay linear-ish as the corpus grows
      import org.apache.spark.sql.functions.{col, substring, levenshtein}
      val pairs = Dedup.dedupNearMinhash(doc, "text", "doc_id", 8, 4)
      val pref = doc.select(col("doc_id"), substring(col("text"), 1, 200).as("p"))
      pairs
        .join(pref.select(col("doc_id").as("doc_a"), col("p").as("pa")), Seq("doc_a"))
        .join(pref.select(col("doc_id").as("doc_b"), col("p").as("pb")), Seq("doc_b"))
        .where(levenshtein(col("pa"), col("pb")) <= 100).count()
    }

    // ---- curation operators at 20× (100k docs): repetition stats must
    // stay a narrow map (zero shuffles), span dedup bucket-bounded,
    // contamination a broadcast filter, packing's prefix sum two passes
    // with bounded driver state (grouped by source — 20 groups here; the
    // 1M-row synthetic below stresses 1000 groups straddling partitions)
    import graft.llm.Curation
    import graft.operators.RunningTotal
    time("repetition stats")(Curation.repetitionStats(doc, "text", "doc_id")
      .queryExecution.toRdd.count())
    time("span dedup")(Curation.dedupSpans(doc, "text", "doc_id", 10)
      .queryExecution.toRdd.count())
    time("contamination")(Curation.contamination(doc, "text", "doc_id",
      org.apache.spark.sql.functions.col("doc_id") % 997 === 0, 4)
      .queryExecution.toRdd.count())
    time("sequence packing")(Curation.packStats(doc, "text", "doc_id", "source", 512)
      .queryExecution.toRdd.count())
    time("runningTotal 1M/1k-groups") {
      import org.apache.spark.sql.functions._
      val df = spark.range(1000000L)
        .select((col("id") % 1000).as("g"), col("id").as("ord"), lit(1L).as("v"))
      RunningTotal.grouped(df, "g", "ord", "v", "cum")
        .queryExecution.toRdd.count()
    }

    // ---- vector path at 50× (100k vectors, dim 64): validates that IVF
    // assignment (broadcast packed centroids + native NearestCell) stays a
    // narrow map — wall-clock must scale ~linearly in corpus size. The
    // corpus is the testdata embeddings replicated with remapped ids
    // (timing is value-independent), materialized first so the stress
    // times the operators, not the replication.
    import org.apache.spark.sql.functions._
    val embBase = if (args.length > 1) args(1) else "/root/testdata/sf0.1/embeddings.parquet"
    val base = spark.read.parquet(embBase)
    val dim = base.selectExpr("size(embedding)").head().getInt(0)
    val baseN = base.count()
    // id = rep*baseN + vec_id keeps the first baseN ids DISTINCT vectors, so
    // k-means' smallest-id seeding picks k different centroids (the
    // vec_id*50+rep remap would seed k copies of vector 0 → 1 cell)
    val big = base.crossJoin(broadcast(spark.range(50).toDF("rep")))
      .select((col("rep") * baseN + col("vec_id")).as("vec_id"), col("embedding"))
      .localCheckpoint(true)
    time("vectors")(big.count())
    val cents = graft.llm.Ivf.fit(big, 32, 0, dim).localCheckpoint(true)
    time("ivf assign 100k")(graft.llm.Ivf.assign(big, cents, dim)
      .queryExecution.toRdd.count())
    time("ivf fit (k=32, 2 Lloyd)")(graft.llm.Ivf.fit(big, 32, 2, dim).count())
    time("ivf topk (5 queries)")(graft.llm.Ivf.topK(
      big.where(col("vec_id") < 5), big, cents, 10, 2, dim).count())
    // PQ encode over the same replicated corpus: like Ivf.assign this must
    // stay a narrow map (broadcast packed codebooks + m native argmin
    // loops per row) — wall-clock ~linear in corpus size, no shuffle.
    val cb = graft.llm.Pq.codebooks(big, 4, 16, dim).localCheckpoint(true)
    time("pq encode 100k")(graft.llm.Pq.encode(big, cb, 4, dim)
      .queryExecution.toRdd.count())
    time("pq decode 100k")(graft.llm.Pq.decode(
      graft.llm.Pq.encode(big, cb, 4, dim), cb, 4, dim)
      .queryExecution.toRdd.count())

    // ---- round-5 additions: graph + distributional + permutation ops.
    // PageRank on a 1M-edge synthetic graph (100k nodes, pseudo-random
    // wiring): per-round cost must stay two bounded shuffles — wall-clock
    // ~linear in edges × rounds.
    time("pagerank 1M edges, 3 rounds") {
      val edges = spark.range(1000000L)
        .select((col("id") % 100000L).as("src"),
          ((col("id") * 31L + 7L) % 100000L).as("dst"))
      graft.operators.PageRank.ranksFp(edges, "src", "dst", iters = 3)
        .queryExecution.toRdd.count()
    }
    // Co-occurrence over the 100k-doc corpus: pair generation is row-local
    // (n·window fan-out), so this is ONE pair-keyed aggregate over ~3n
    // rows — linear in corpus tokens.
    time("cooccurrence 100k docs")(graft.llm.Cooccurrence.pairs(
      doc, "text", "doc_id", window = 3, minCount = 5L)
      .queryExecution.toRdd.count())
    // Exact all-pairs cosine: the df cap is the scale dial — every copy
    // group here has df ≥ 20, so maxDf=25 bounds per-term fan-out at 625
    // pairs while still emitting the replicated-duplicate pairs.
    time("allpairs cosine 100k")(graft.llm.AllPairs.cosinePairs(
      doc, "doc_id", "text", maxDf = 25, minCos2Fp = 640000L)
      .queryExecution.toRdd.count())
    // Training-order shuffle of 1M rows into 1024 shards: two passes over
    // the range-partitioned layout, bounded driver offsets.
    time("shardAssign 1M rows") {
      val ids = spark.range(1000000L).select(col("id"))
      graft.llm.Sampling.shardAssign(ids, "id", 1024)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
