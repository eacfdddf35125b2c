package graft

import org.apache.spark.sql.functions._

import graft.llm.{Curation, Drift, Similarity, TextAnalysis}

/** Unit coverage for the drift monitor, mutual-kNN graph, dataset card,
  * and lexical-diversity operators, independent of the sf0.01 oracle
  * corpus: crafted inputs with hand-computed expectations, plus the
  * degenerate shapes (one-sided values, empty snapshot, hub vectors,
  * all-dup sources) the corpus doesn't exercise. */
class DriftCardSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- Drift

  test("histogramDrift: hand-computed proportions, one-sided values count 0") {
    val ref = Seq("a", "a", "a", "b").toDF("src")
    val cur = Seq("a", "c").toDF("src")
    val got = Drift.histogramDrift(ref, cur, "src")
      .orderBy(col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq == Seq(
      ("a", 3L, 1L, 750000L, 500000L, 250000L),
      ("b", 1L, 0L, 250000L, 0L, 250000L),
      ("c", 0L, 1L, 0L, 500000L, 500000L)))
  }

  test("histogramDrift: empty current snapshot yields p_cur_fp 0, no division") {
    val ref = Seq("a", "b").toDF("src")
    val cur = Seq.empty[String].toDF("src")
    val got = Drift.histogramDrift(ref, cur, "src").orderBy(col("value"))
      .select(col("p_cur_fp"), col("delta_fp")).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 500000L), (0L, 500000L)))
  }

  test("summary: TVD is half the delta sum; identical snapshots score 0") {
    val ref = Seq("a", "a", "a", "b").toDF("src")
    val cur = Seq("a", "c").toDF("src")
    val Array((n, tvd, chi2)) = Drift.summary(Drift.histogramDrift(ref, cur, "src"))
      .as[(Long, Long, Long)].collect()
    assert(n == 3L)
    assert(tvd == 500000L) // (250000+250000+500000)/2
    // chi2 terms: 250000^2*1e6/(2*1250000)=25e9, same for b ->
    //   250000^2*1e6/(2*250000)=125e9, c: 500000^2*1e6/(2*500000)=250e9
    assert(chi2 == 25000000000L + 125000000000L + 250000000000L)
    val Array((_, tvd0, chi0)) = Drift.summary(Drift.histogramDrift(ref, ref, "src"))
      .as[(Long, Long, Long)].collect()
    assert(tvd0 == 0L && chi0 == 0L)
  }

  test("perTickDrift: absent reference values contribute |0 - pr|") {
    // ref: a->3/4, b->1/4. tick 0 is all-a (delta |1e6*3/4 div ... |):
    //   p_a=1e6, pr_a=750000 -> 250000; absent b contributes pr_b=250000
    //   tvd = (250000 + 250000)/2 = 250000
    // tick 1 matches ref exactly -> p_a=750000, p_b=250000 -> tvd 0
    val hist = Seq((0L, "a", 2L), (1L, "a", 3L), (1L, "b", 1L))
      .toDF("tick", "value", "n")
    val ref = Seq(("a", 3L), ("b", 1L)).toDF("value", "n_ref")
    val got = Drift.perTickDrift(hist, ref).orderBy(col("tick"))
      .as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 250000L), (1L, 0L)))
  }

  test("perTickDrift: histogram values outside the reference domain widen tot only") {
    // tick has a (2) and unknown x (2); ref is 100% a.
    // tot=4 -> p_a=500000, pr_a=1000000 -> delta 500000; x ignored in the
    // delta sum; no absent-ref mass -> tvd = 250000
    val hist = Seq((0L, "a", 2L), (0L, "x", 2L)).toDF("tick", "value", "n")
    val ref = Seq(("a", 5L)).toDF("value", "n_ref")
    val got = Drift.perTickDrift(hist, ref).as[(Long, Long)].collect()
    assert(got.toSeq == Seq((0L, 250000L)))
  }

  // ------------------------------------------------------- mutual kNN

  test("mutualKnnGraph: hub's one-sided edges are stripped; ranks kept") {
    // one cell; k=1. a and b are near-identical (mutual nearest); hub h is
    // everyone's 2nd choice but its own nearest (a) ranks h below b -> with
    // k=1 only (a,b) survives.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),       // a
      (2L, Array(0.999f, 0.01f), 0),    // b ~ a
      (3L, Array(0.7f, 0.7f), 0))       // h (hub, diagonal)
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.mutualKnnGraph(emb, 1, "label", dim = 2)
      .select(col("id_a"), col("id_b"), col("rank_ab"), col("rank_ba"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L, 1L, 1L)))
  }

  test("mutualKnnGraph: vectors never meet across cells") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(1.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.mutualKnnGraph(emb, 3, "label", dim = 2).count() == 0L)
  }

  test("mutualKnnGraph: k >= cell size gives the full undirected cell graph") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.3f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.mutualKnnGraph(emb, 5, "label", dim = 2)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L), (1L, 3L), (2L, 3L)))
  }

  test("knnDensity: quantized mean, mutual degree, and singleton-cell zeros") {
    // cell 0: a=(1,0), b=(.999,.01), h=(.7,.7); k=1 -> a picks b (mutual),
    // b picks a (mutual), h picks a (one-sided). cell 1: lone vector.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.999f, 0.01f), 0),
      (3L, Array(0.7f, 0.7f), 0), (9L, Array(1.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = graft.llm.Similarity.knnDensity(emb, 1, "label", dim = 2)
      .orderBy(col("vec_id"))
      .as[(Long, Long, Long, Long)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 1L && byId(1L)._4 == 1L) // a: 1 neighbor, mutual
    assert(byId(2L)._2 == 1L && byId(2L)._4 == 1L) // b: mutual
    assert(byId(3L)._2 == 1L && byId(3L)._4 == 0L) // hub: one-sided
    assert(byId(9L) == ((9L, 0L, 0L, 0L)))         // singleton cell
    // a's mean = quantized cos(a,b); verify the integer quantization
    val cos = (1.0 * 0.999f + 0.0 * 0.01f) /
      (1.0 * math.sqrt(0.999f * 0.999f.toDouble + 0.01f * 0.01f.toDouble))
    assert(byId(1L)._3 == math.round(cos * 1e6))
  }

  // ------------------------------------------------------ dataset card

  test("datasetCard: cross-source copies count against both sources") {
    val docs = Seq(
      (1L, "same text", "s1", "en"),
      (2L, "same text", "s2", "en"),   // dup of doc 1, other source
      (3L, "unique a", "s1", "en"),
      (4L, "unique b", "s2", "fr"),
      (5L, "unique c", "s2", "fr"))
      .toDF("doc_id", "text", "source", "lang")
    val got = Curation.datasetCard(docs, "text", "doc_id", "source", "lang")
      .orderBy(col("source"))
      .select(col("source"), col("n_docs"), col("n_dup_docs"),
        col("dup_rate_fp"), col("n_langs"), col("top_lang"))
      .as[(String, Long, Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      ("s1", 2L, 1L, 500000L, 1L, "en"),
      ("s2", 3L, 1L, 333333L, 2L, "fr")))
  }

  test("datasetCard: plurality-language tie breaks to the first alphabetically") {
    val docs = Seq(
      (1L, "t1", "s", "fr"), (2L, "t2", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val top = Curation.datasetCard(docs, "text", "doc_id", "source", "lang")
      .select(col("top_lang")).as[String].head()
    assert(top == "en")
  }

  test("datasetCard: mean_chars is the integer mean of text lengths") {
    val docs = Seq(
      (1L, "abc", "s", "en"), (2L, "abcdefgh", "s", "en"))
      .toDF("doc_id", "text", "source", "lang")
    val mean = Curation.datasetCard(docs, "text", "doc_id", "source", "lang")
      .select(col("mean_chars")).as[Long].head()
    assert(mean == 5L) // (3+8) div 2
  }

  // -------------------------------------------------------- TTR / hapax

  test("typeTokenStats: counts, hapax, and fixed-point ratios by hand") {
    val docs = Seq(
      ("s1", "the cat the dog"),       // tokens 4, types 3, hapax 2
      ("s2", "one two three"))         // tokens 3, types 3, hapax 3
      .toDF("source", "text")
    val got = TextAnalysis.typeTokenStats(docs, "text", "source")
      .orderBy(col("grp"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq(
      ("s1", 4L, 3L, 2L, 750000L, 666666L),
      ("s2", 3L, 3L, 3L, 1000000L, 1000000L)))
  }

  test("typeTokenStats: tokenization is lowercased \\W+ (case folds types)") {
    val docs = Seq(("s", "The THE the")).toDF("source", "text")
    val got = TextAnalysis.typeTokenStats(docs, "text", "source")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(got == (("s", 3L, 1L, 0L, 333333L, 0L)))
  }
}
