package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // scale 10^6 keeps the hand arithmetic readable; the operator contract
  // (init = scale div n, base = (init*15) div 100, damped integer sums) is
  // identical at the default 10^12
  test("hand graph: hub, spokes, and a source node — one and two rounds") {
    // 1→{2,3}, 2→1, 3→1, 4→1 (node 4 has no in-edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    // n=4: init = 250000, base = 37500
    // round 1: s(1) = 250000+250000+250000 = 750000; s(2)=s(3) = 125000
    //   r1(1) = 37500 + 85*750000 div 100 = 675000
    //   r1(2) = r1(3) = 37500 + 85*125000 div 100 = 143750
    //   r1(4) = 37500 (no in-edges → teleport floor only)
    val r1 = PageRank.ranksFp(edges, "src", "dst", iters = 1, scale = 1000000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r1.toSeq == Seq((1L, 675000L), (2L, 143750L), (3L, 143750L), (4L, 37500L)))
    // round 2: s(1) = 143750+143750+37500 = 325000; s(2)=s(3) = 675000 div 2
    //   r2(1) = 37500 + 85*325000 div 100 = 313750
    //   r2(2) = r2(3) = 37500 + 85*337500 div 100 = 324375
    val r2 = PageRank.ranksFp(edges, "src", "dst", iters = 2, scale = 1000000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(r2.toSeq == Seq((1L, 313750L), (2L, 324375L), (3L, 324375L), (4L, 37500L)))
  }

  test("dangling redistribution conserves total mass; default drops it") {
    // 1→2, 1→3: nodes 2 and 3 are dangling sinks
    val edges = Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")
    // hand check at scale 10^12, n=3, 1 round with redistribution:
    //   init = 333333333333, base = 49999999999
    //   dangling pool = r(2)+r(3) = 666666666666 → share = 222222222222
    //   r1(1) = base + 85·share div 100                        = 238888888887
    //   r1(2) = r1(3) = base + 85·(166666666666 + share) div 100 = 380555555553
    val redist = PageRank.ranksFp(edges, "src", "dst", iters = 1,
        danglingRedistribute = true)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(redist.toSeq == Seq((1L, 238888888887L),
      (2L, 380555555553L), (3L, 380555555553L)))
    // total stays ≈ scale (integer-truncation loss only)…
    assert(math.abs(redist.map(_._2).sum - 1000000000000L) < 100L)
    // …whereas the default drops the sinks' damped mass entirely
    val dropped = PageRank.ranksFp(edges, "src", "dst", iters = 1)
      .collect().map(_.getLong(1)).sum
    assert(dropped < 700000000000L)
  }

  test("3-cycle: symmetric ranks, floor drift only") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    // n=3: init = 333333, base = 49999; every round r' = 49999 + 85r div 100
    val r2 = PageRank.ranksFp(edges, "src", "dst", iters = 2, scale = 1000000L)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    // r1 = 49999 + 283333 = 333332; r2 = 49999 + 283332 = 333331
    assert(r2.toSeq == Seq((1L, 333331L), (2L, 333331L), (3L, 333331L)))
  }

  test("guards: empty graph and bad iters fail fast") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      PageRank.ranksFp(edges, "src", "dst", iters = 0)
    }
    intercept[IllegalArgumentException] {
      PageRank.ranksFp(edges.where(lit(false)), "src", "dst", iters = 1)
    }
  }
}
