package graft

import org.apache.spark.sql.functions._

import graft.operators.{Correlate, EquiDepth, Kmv}

/** Unit coverage for the profiling/sketch additions: correlation
  * sufficient statistics (perfect/anti/zero correlation, zero-variance
  * null), equi-depth bucketing (exact ntile arithmetic, skewed values),
  * and KMV sketches (k-min completeness, exact-regime union, identical
  * and disjoint sets). */
class ProfilingSketchSpec extends SparkSpec {
  import spark.implicits._

  test("Correlate.matrix: perfect, anti, and zero-variance pairs") {
    // y = 2x (r2=1, sign +), z = -x (r2=1, sign -), c constant (null r2)
    val df = Seq((1L, 2L, -1L, 7L), (2L, 4L, -2L, 7L), (3L, 6L, -3L, 7L))
      .toDF("x", "y", "z", "c")
    val got = Correlate.matrix(df, Seq("x", "y", "z", "c"))
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(got(("x", "y")) == (1L, Some(1.0)))
    assert(got(("x", "z")) == (-1L, Some(1.0)))
    assert(got(("y", "z")) == (-1L, Some(1.0)))
    assert(got(("x", "c")) == (0L, None))
  }

  test("EquiDepth.histogram: exact ntile buckets on skewed input") {
    // 8 rows, 4 buckets -> 2 per bucket; values skewed
    val df = (1L to 8L).map(i => ("g", if (i <= 6) i else 100 + i, i))
      .toDF("g", "v", "id")
    val got = EquiDepth.histogram(df, "g", "v", "id", 4)
      .orderBy(col("bucket"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((0L, 2L, 1L, 2L), (1L, 2L, 3L, 4L),
      (2L, 2L, 5L, 6L), (3L, 2L, 107L, 108L)))
  }

  test("Kmv sketch and pair estimates: exact regime and identical sets") {
    // two groups with identical 10-element sets, one disjoint group
    val elems = (1 to 10).map(i => s"tok$i")
    val rows = elems.map(("a", _)) ++ elems.map(("b", _)) ++
      (11 to 15).map(i => ("c", s"tok$i"))
    val df = rows.toDF("g", "e")
    val sk = Kmv.sketch(df, "g", "e", k = 8)
    // sketch holds at most k distinct hashes per group
    val sizes = sk.groupBy("g").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(sizes == Map("a" -> 8L, "b" -> 8L, "c" -> 5L))
    val est = Kmv.pairEstimates(sk, "g", k = 8)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    // a/b: identical sketches -> jaccard 1.0; union saturates at k=8
    // so the estimate is the threshold formula, not the exact count
    assert(est(("a", "b"))._2 == 1000000L)
    // a/c and b/c: disjoint -> jaccard 0, union of sketches < 2k but
    // >= k? 8+5=13 distinct -> saturated; both estimators defined
    assert(est(("a", "c"))._2 == 0L)
    assert(est(("b", "c"))._2 == 0L)
    assert(est(("a", "c"))._1 >= 1L)
  }

  test("WeightedMedian.lower: weight-majority element and tie-break") {
    // group g: values 1(w=1), 2(w=1), 3(w=10) -> median 3 (cumw 12/2=6 at v=3)
    // group h: values 5(w=2), 6(w=2) -> lower median 5 (cumw 2 >= 2)
    val df = Seq(("g", 1L, 1L, 1L), ("g", 2L, 2L, 1L), ("g", 3L, 3L, 10L),
      ("h", 5L, 4L, 2L), ("h", 6L, 5L, 2L)).toDF("g", "v", "id", "w")
    val got = graft.operators.WeightedMedian.lower(df, "g", "v", "id", "w")
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("g", 12L, 3L), ("h", 4L, 5L)))
  }

  test("PatternDfa: greedy disjoint completions and stage tracking") {
    // codes: v c p v v c x p p -> completions after each:
    // 1,2,10,11,11,12,12,20,20
    val xs = Seq(1L, 2L, 3L, 1L, 1L, 2L, 0L, 3L, 3L)
    val df = xs.zipWithIndex.map { case (x, i) => (1L, i.toLong, i.toLong, x) }
      .toDF("k", "tsm", "id", "x")
    val got = graft.operators.PatternDfa.fold(df, "k", "tsm", "id", "x")
      .orderBy(col("id")).collect().map(_.getLong(3))
    assert(got.toSeq == Seq(1L, 2L, 10L, 11L, 11L, 12L, 12L, 20L, 20L))
  }

  test("Streaming.patternDfa batch-mode matches the batch fold") {
    val obs = Seq(
      graft.streaming.Streaming.KeyedObs(1L, 1L, 101L, 1L),
      graft.streaming.Streaming.KeyedObs(1L, 2L, 102L, 2L),
      graft.streaming.Streaming.KeyedObs(1L, 3L, 103L, 3L),
      graft.streaming.Streaming.KeyedObs(2L, 1L, 201L, 3L)).toDS()
    val got = graft.streaming.Streaming.patternDfa(obs)
      .collect().sortBy(_.event_id).map(o => (o.event_id, o.dfa))
    assert(got.toSeq == Seq((101L, 1L), (102L, 2L), (103L, 10L), (201L, 0L)))
  }

  test("Kmv.pairEstimates exact regime: union below k is exact") {
    val df = (Seq(("a", "x"), ("a", "y"), ("b", "y"), ("b", "z")))
      .toDF("g", "e")
    val est = Kmv.pairEstimates(Kmv.sketch(df, "g", "e", k = 8), "g", k = 8)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // union {x,y,z} = 3 exactly; jaccard 1/3 in fixed point = 333333
    assert(est.toSeq == Seq((3L, 333333L)))
  }
}
