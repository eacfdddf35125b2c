package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, Lpa, Skyline}

/** Unit coverage for the incremental-view-maintenance merge (insert +
  * retraction arithmetic, group disappearance), the 2-D skyline dominance
  * rules (strict/tie cases), and the synchronous LPA plurality election —
  * all on crafted inputs, independent of the oracle corpus. */
class IncrementalSkylineLpaSpec extends SparkSpec {
  import spark.implicits._

  test("Incremental: partial+merge equals a full recompute, with retractions") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L), ("b", 7L), ("c", 1L))
      .toDF("k", "v")
    val state = Incremental.partial(base, Seq("k"), lit(1L), Seq("tot" -> col("v")))
    // delta: insert (a,30), retract (b,5), retract BOTH c rows -> c vanishes
    val changes = Seq(("a", 30L, 1L), ("b", 5L, -1L), ("c", 1L, -1L))
      .toDF("k", "v", "w")
    val deltaP = Incremental.partial(changes, Seq("k"), col("w"), Seq("tot" -> col("v")))
    val got = Incremental.merge(Seq(state, deltaP), Seq("k"))
      .orderBy(col("k"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq(("a", 3L, 60L), ("b", 1L, 7L)))
  }

  test("Incremental: merge of many partials is order-independent") {
    val parts = Seq(
      Seq(("x", 1L)), Seq(("x", 2L), ("y", 3L)), Seq(("y", 4L))).map(rows =>
      Incremental.partial(rows.toDF("k", "v"), Seq("k"), lit(1L),
        Seq("tot" -> col("v"))))
    val a = Incremental.merge(parts, Seq("k")).orderBy(col("k")).collect()
    val b = Incremental.merge(parts.reverse, Seq("k")).orderBy(col("k")).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("x", 2L, 3L), ("y", 2L, 7L)))
  }

  test("Skyline.frontier2d: dominance strictness and tie handling") {
    // partition p: (len, score) rows
    //  (1, 5) frontier; (2, 5) dominated (longer, same score);
    //  (2, 7) frontier; (2, 7) duplicate -> BOTH kept (mutually non-dom);
    //  (3, 7) dominated by (2,7); (3, 9) frontier; (4, 1) dominated
    val df = Seq((1L, 5L, "a"), (2L, 5L, "b"), (2L, 7L, "c"), (2L, 7L, "c2"),
      (3L, 7L, "d"), (3L, 9L, "e"), (4L, 1L, "f"))
      .toDF("len", "score", "id").withColumn("p", lit("p"))
    val kept = Skyline.frontier2d(df, "p", "len", "score")
      .select(col("id")).as[String].collect().toSet
    assert(kept == Set("a", "c", "c2", "e"))
  }

  test("Skyline.frontier2d partitions independently") {
    val df = Seq(("p1", 1L, 1L, "k1"), ("p1", 2L, 2L, "k2"),
      ("p2", 2L, 2L, "k3"), ("p2", 1L, 3L, "k4"))
      .toDF("p", "len", "score", "id")
    val kept = Skyline.frontier2d(df, "p", "len", "score")
      .select(col("id")).as[String].collect().toSet
    // p1: (1,1) kept, (2,2) kept (better score); p2: (1,3) dominates (2,2)
    assert(kept == Set("k1", "k2", "k4"))
  }

  test("Lpa: plurality vote with min-label tie-break, synchronous rounds") {
    // triangle {1,2,3} + pendant 4-3: round 1 from self-labels ->
    // node1 nbrs {2,3} -> 2; node2 nbrs {1,3} -> 1; node3 nbrs {1,2,4} -> 1;
    // node4 nbr {3} -> 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
    val r1 = Lpa.communities(edges, "a", "b", rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L))
    // round 2 from r1: node1 nbrs labels {1,1} -> 1; node2 {2,1} tie -> 1;
    // node3 {2,1,3} three-way tie -> 1; node4 {1} -> 1 : consensus
    val r2 = Lpa.communities(edges, "a", "b", rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("Lpa: two dense cliques joined by one bridge stay separate communities") {
    val clique = (ns: Seq[Long]) =>
      for (i <- ns.indices; j <- i + 1 until ns.size) yield (ns(i), ns(j))
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++
      Seq((4L, 10L))).toDF("a", "b")
    val labels = Lpa.communities(edges, "a", "b", rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Seq(1L, 2L, 3L, 4L).map(labels)
    val right = Seq(10L, 11L, 12L, 13L).map(labels)
    assert(left.distinct.size == 1, s"left clique split: $left")
    assert(right.distinct.size == 1, s"right clique split: $right")
    assert(left.head != right.head, "bridge merged the cliques")
  }
}
