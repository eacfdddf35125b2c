package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{AllPairs, Dedup, RandomProjection, SetJoin}

/** Dev-only 100× scale stress for the similarity/graph family — the
  * round-6 evidence run: LSH, SimHash-64 banding + multi-probe, exact
  * all-pairs cosine, PageRank, and large-star connected components at
  * 100× the sf0.1 corpus (500k docs / 10M edges / 1M-node chain).
  *
  * Scale-honest corpus construction: the sf0.1 documents table is
  * replicated 100× with EVERY TOKEN suffixed by the replica index
  * (`regexp_replace(text, '(\w+)', '$1rN')`), so replicas share no
  * vocabulary. That keeps each term's document frequency at its original
  * value — the shape of a real 100× corpus — instead of inflating every
  * df by 100×, which would just measure the degenerate-corpus guards
  * (maxBucket / maxDf caps), not scaling. Within each replica the
  * original near-dup structure is intact, so every candidate-generation
  * stage must produce ≈ 100 × its single-replica count: the LINEARITY
  * assertion (tolerance band covers per-replica hash variance).
  *
  * Emits one JSON line per stage `{"stage":…,"sec":…,"rows":…}` and a
  * final summary line with the count ratios and pass/fail — the committed
  * `SCALESTRESS_r6.json` artifact.
  */
object ScaleStress100 {
  def main(args: Array[String]): Unit = {
    val docPath = args.headOption.getOrElse("/root/testdata/sf0.1/documents.parquet")
    val reps = 100
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder
    def time[T](name: String)(f: => (Long, T)): T = {
      val t0 = System.nanoTime()
      val (n, r) = f
      val line = s"""{"stage":"$name","sec":${(System.nanoTime() - t0) / 1e9},"rows":$n}"""
      println(line); out.append(line).append('\n')
      r
    }
    def count(name: String)(f: => Long): Long = time(name) { val n = f; (n, n) }

    val base = spark.read.parquet(docPath)
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val baseN = base.count()

    // replica r: ids shifted by r*baseN, every token suffixed "r<r>"
    def replica(df: org.apache.spark.sql.DataFrame) = df.select(
      (col("rep") * baseN + col("doc_id")).as("doc_id"),
      regexp_replace(col("text"), lit("(\\w+)"),
        concat(lit("$1r"), col("rep"))).as("text"))

    val rep0 = replica(base.withColumn("rep", lit(0L))).localCheckpoint(true)
    val big = time("build corpus x100") {
      val b = replica(base.crossJoin(broadcast(
          spark.range(reps).toDF("rep"))))
        .repartition(64)
        .localCheckpoint(true)
      (b.count(), b)
    }

    // --- candidate generation: single-replica baseline, then 100× ---
    val lsh1 = count("lsh candidates x1")(
      Dedup.dedupNearMinhash(rep0, "text", "doc_id", 8, 4).count())
    val lsh100 = count("lsh candidates x100")(
      Dedup.dedupNearMinhash(big, "text", "doc_id", 8, 4).count())

    // 16-bit bands: 8-bit bands have only 256 keys/band, which saturates
    // every bucket past maxBucket at ~256k docs (see Dedup.scaladoc
    // capacity bound — measured here first); 500k docs need bandBits ≥ 16
    val sh1 = count("simhash64 pairs x1")(
      Dedup.simhashNearDupPairs(rep0, "text", "doc_id", 64, 16, 3).count())
    val sh100 = count("simhash64 pairs x100")(
      Dedup.simhashNearDupPairs(big, "text", "doc_id", 64, 16, 3).count())

    val mp1 = count("simhash64 multiprobe x1")(
      Dedup.simhashMultiProbePairs(rep0, "text", "doc_id", 64, 16, 7).count())
    val mp100 = count("simhash64 multiprobe x100")(
      Dedup.simhashMultiProbePairs(big, "text", "doc_id", 64, 16, 7).count())

    val ap1 = count("allpairs cosine x1")(
      AllPairs.cosinePairs(rep0, "doc_id", "text", maxDf = 25,
        minCos2Fp = 640000L).count())
    val ap100 = count("allpairs cosine x100")(
      AllPairs.cosinePairs(big, "doc_id", "text", maxDf = 25,
        minCos2Fp = 640000L).count())

    // prefix-filtered exact Jaccard (q159's operator): replicas share no
    // vocabulary, and within a replica the token remap is a bijection, so
    // the x100 pair count is EXACTLY 100x the x1 count when candidate
    // generation is linear; a broken prefix filter (all-pairs fallback)
    // would land at ~10000x
    val jp1 = count("jaccard ppjoin x1")(
      SetJoin.jaccardPairs(rep0, "doc_id", "text", 7L, 10L).count())
    val jp100 = count("jaccard ppjoin x100")(
      SetJoin.jaccardPairs(big, "doc_id", "text", 7L, 10L).count())

    // sign-matrix projection throughput (row-local by construction): 500k
    // 64-d embeddings synthesized from doc hashes, projected to 16-d
    count("random projection x100 (500k x 64->16)") {
      val vecs = spark.range(500000L).select(col("id").as("vec_id"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id"), j), lit(1000)) - 500).cast("double") / 100.0)
          .as("embedding"))
      RandomProjection.project(vecs, "embedding", "proj", 16, 64)
        .queryExecution.toRdd.count()
    }

    // --- graph family at 100× ---
    count("pagerank 10M edges, 3 rounds") {
      val edges = spark.range(10000000L)
        .select((col("id") % 500000L).as("src"),
          ((col("id") * 31L + 7L) % 500000L).as("dst"))
      graft.operators.PageRank.ranksFp(edges, "src", "dst", iters = 3)
        .queryExecution.toRdd.count()
    }
    count("kcore peel 10M edges, k=3") {
      // same synthetic 500k-node / 10M-edge graph as the PageRank stage;
      // 3 budgeted peel rounds — per round one degree agg + two anti joins
      val edges = spark.range(10000000L)
        .select((col("id") % 500000L).as("src"),
          ((col("id") * 31L + 7L) % 500000L).as("dst"))
      graft.operators.KCore.peel(edges, "src", "dst", 3, maxRounds = 3)
        .queryExecution.toRdd.count()
    }
    count("knn density 500k vecs, 5k cells") {
      // the q187 cell contract at scale: 100 vectors/cell -> ~50M scored
      // pairs TOTAL (cell-bounded), never the 250G all-pairs
      val vecs = spark.range(500000L).select(col("id").as("vec_id"),
        (col("id") % 5000L).as("label"),
        transform(sequence(lit(1), lit(64)),
          j => (pmod(hash(col("id"), j), lit(1000)) - 500).cast("float") / 100.0f)
          .as("embedding"))
      graft.llm.Similarity.knnDensity(vecs, 5, "label", dim = 64)
        .queryExecution.toRdd.count()
    }
    count("cc large-star 1M-node chain") {
      // worst-case diameter: one chain of 1M nodes — label-prop would need
      // 1M rounds; large-star/small-star must close it in O(log n)
      val chain = spark.range(999999L)
        .select(col("id").as("a"), (col("id") + 1L).as("b"))
      graft.operators.ConnectedComponents.componentsStar(chain, "a", "b")
        .queryExecution.toRdd.count()
    }

    // --- linearity assertions on candidate-count growth ---
    def ratio(x100: Long, x1: Long): Double =
      if (x1 == 0) -1.0 else x100.toDouble / x1
    val ratios = Map(
      "lsh" -> ratio(lsh100, lsh1), "simhash64" -> ratio(sh100, sh1),
      "multiprobe" -> ratio(mp100, mp1), "allpairs" -> ratio(ap100, ap1),
      "jaccard" -> ratio(jp100, jp1))
    // per-replica hash variance makes each replica's count an iid-ish draw;
    // the 100-replica sum concentrates near 100× the mean, but the x1
    // baseline is a single draw — hence the wide band. A quadratic
    // (all-pairs-degenerate) stage would land at ~10000×, far outside it.
    val band = (50.0, 200.0)
    val pass = ratios.values.forall(r => r >= band._1 && r <= band._2)
    val summary = ratios.map { case (k, v) => s""""$k":${f"$v%.1f"}""" }
      .mkString(s"""{"summary":"candidate-count growth at ${reps}x",""", ",",
        s""","band":[${band._1},${band._2}],"linear":$pass}""")
    println(summary); out.append(summary).append('\n')
    args.drop(1).headOption.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), out.toString)
    }
    assert(pass, s"candidate growth outside linear band: $ratios")
    spark.stop()
  }
}
