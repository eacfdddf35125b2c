package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bfs, Cusum, Resample}
import graft.streaming.Streaming

/** Unit coverage for the round-7 time-series/graph additions: grid
  * resampling (empty ticks, budget guard), BFS hop distances (minimality,
  * seed isolation, radius budget), CUSUM (recurrence, reset-to-zero,
  * alarm), and the streaming EWMA fold's single-batch semantics. */
class ResampleBfsCusumSpec extends SparkSpec {
  import spark.implicits._

  test("Resample.toGrid densifies the span and leaves empty ticks null") {
    // key 1 observes at ticks 0 and 30 (step 10) -> grid 0,10,20,30
    val df = Seq((1L, 0L, 5L), (1L, 2L, 7L), (1L, 30L, 1L), (2L, 15L, 9L))
      .toDF("k", "tsm", "x")
    val got = Resample.toGrid(df, "k", col("tsm"), 10L,
      Seq("n" -> count(lit(1)), "sx" -> sum(col("x"))))
      .orderBy(col("k"), col("tick_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long])))
    assert(got.toSeq == Seq(
      (1L, 0L, Some(2L), Some(12L)),
      (1L, 10L, None, None),
      (1L, 20L, None, None),
      (1L, 30L, Some(1L), Some(1L)),
      (2L, 10L, Some(1L), Some(9L))))
  }

  test("Resample.toGrid budget guard raises on runaway spans") {
    val df = Seq((1L, 0L, 1L), (1L, 1000000L, 1L)).toDF("k", "tsm", "x")
    val e = intercept[Exception] {
      Resample.toGrid(df, "k", col("tsm"), 1L,
        Seq("n" -> count(lit(1))), maxTicks = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("budget")))
  }

  test("Bfs.hops: minimality, multi-seed, and radius budget") {
    // path 1-2-3-4-5 plus seed 10 isolated on edge 10-11
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a", "b")
    val seeds = Seq(1L, 10L).toDF("node")
    val got = Bfs.hops(edges, "a", "b", seeds, rounds = 2)
      .orderBy(col("node"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // radius 2: node 4 (3 hops) and 5 unreached; 11 is 1 hop from seed 10
    assert(got.toSeq == Seq((1L, 0L), (2L, 1L), (3L, 2L), (10L, 0L), (11L, 1L)))
  }

  test("Cusum.drift: accumulation, reset to zero, and alarm threshold") {
    // k=10: x=25 -> s=15; x=5 -> max(0,15+5-10)=10; x=2 -> 2; x=3 -> 0; x=50 -> 40 alarm(h=30)
    val df = Seq((1L, 1L, 101L, 25L), (1L, 2L, 102L, 5L), (1L, 3L, 103L, 2L),
      (1L, 4L, 104L, 3L), (1L, 5L, 105L, 50L))
      .toDF("k", "tsm", "id", "x")
    val got = Cusum.drift(df, "k", "tsm", "id", "x", k = 10L, h = 30L)
      .orderBy(col("id"))
      .collect().map(r => (r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq((15L, false), (10L, false), (2L, false),
      (0L, false), (40L, true)))
  }

  test("SortedNeighborhood.pairs: window completeness and linear count") {
    // sort keys order docs as 10,30,20,40 (keys a,b,c,d); w=3 pairs:
    // (10,30),(10,20),(30,20),(30,40),(20,40)
    val df = Seq((10L, "a"), (20L, "c"), (30L, "b"), (40L, "d"))
      .toDF("doc_id", "sk")
    val got = graft.operators.SortedNeighborhood
      .pairs(df, "doc_id", col("sk"), w = 3)
      .select(col("doc_a"), col("doc_b"), col("gap"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((10L, 30L, 1L), (10L, 20L, 2L), (20L, 30L, 1L),
      (30L, 40L, 2L), (20L, 40L, 1L)))
  }

  test("Streaming.cusumDrift batch-mode fold matches Cusum.drift") {
    val obs = Seq(
      Streaming.KeyedObs(1L, 1L, 101L, 25L),
      Streaming.KeyedObs(1L, 2L, 102L, 5L),
      Streaming.KeyedObs(1L, 3L, 103L, 50L)).toDS()
    val got = Streaming.cusumDrift(obs, k = 10L, h = 30L)
      .collect().sortBy(_.event_id).map(o => (o.cusum, o.alarm))
    assert(got.toSeq == Seq((15L, false), (10L, false), (50L, true)))
  }

  test("Streaming.ewmaHalfLife batch-mode fold matches the recurrence") {
    // flatMapGroupsWithState on a batch Dataset = single-batch stream
    val obs = Seq(
      Streaming.KeyedObs(1L, 10L, 101L, 8L),
      Streaming.KeyedObs(1L, 20L, 102L, 4L),
      Streaming.KeyedObs(1L, 30L, 103L, 10L),
      Streaming.KeyedObs(2L, 10L, 201L, 5L)).toDS()
    val got = Streaming.ewmaHalfLife(obs)
      .collect().sortBy(_.event_id).map(o => (o.event_id, o.ewma))
    assert(got.toSeq == Seq((101L, 8L), (102L, 6L), (103L, 8L), (201L, 5L)))
  }
}
