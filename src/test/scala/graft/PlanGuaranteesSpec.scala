package graft

/** Scale guarantees, enforced as regression tests over EVERY registered
  * query: plans must never contain an unpruned all-pairs operator. A
  * `CartesianProduct` appearing in any future edit of the dedup/similarity
  * pipelines is exactly the failure mode that works at sf0.01 and dies at
  * 100 TB — so it fails CI here instead. (Broadcast nested-loop joins of a
  * deliberately-broadcast small side — query vectors, qcut cut points — are
  * fine and expected.)
  */
class PlanGuaranteesSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  // A join side that is a SCALAR aggregate (global agg, no grouping — one
  // row by construction) must carry an explicit broadcast() hint: the plan
  // happens to broadcast it today via AQE, but the repo's convention is
  // that 1-row sides are hinted so the plan shape never depends on runtime
  // statistics. This makes the convention mechanical instead of
  // review-enforced.
  private def unhintedScalarAggJoinSides(
      analyzed: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    @annotation.tailrec
    def strip(p: LogicalPlan): LogicalPlan = p match {
      case SubqueryAlias(_, c) => strip(c)
      case Project(_, c)       => strip(c)
      case _                   => p
    }
    def isScalarAgg(p: LogicalPlan): Boolean = strip(p) match {
      case a: Aggregate => a.groupingExpressions.isEmpty
      case _            => false
    }
    // A hint anywhere between the join and the side's root (through
    // column-pruning Projects/aliases) guarantees the broadcast.
    def hasTopHint(p: LogicalPlan): Boolean = p match {
      case _: ResolvedHint     => true
      case SubqueryAlias(_, c) => hasTopHint(c)
      case Project(_, c)       => hasTopHint(c)
      case _                   => false
    }
    analyzed.collect {
      case j: Join if !hasTopHint(j.left) && !hasTopHint(j.right) &&
          (isScalarAgg(j.left) || isScalarAgg(j.right)) =>
        s"${j.joinType} join with a scalar-aggregate side has no broadcast hint on either side"
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plans without CartesianProduct or unhinted scalar-agg join") {
      val qe = fn(spark, sfDir).queryExecution
      val plan = qe.executedPlan.toString()
      assert(!plan.contains("CartesianProduct"),
        s"$name contains an all-pairs operator:\n$plan")
      val unhinted = unhintedScalarAggJoinSides(qe.analyzed)
      assert(unhinted.isEmpty,
        s"$name joins a scalar aggregate without an explicit broadcast() hint " +
          s"(${unhinted.mkString("; ")}):\n${qe.analyzed}")
    }
  }

  // The q241/q253/q304 per-pivot candidate shortlist relies on Spark
  // pushing the row_number <= c filter into a WindowGroupLimit
  // (per-partition top-c heaps). Losing the pushdown silently reverts the
  // rank pass to a full per-pivot sort — fine at sf0.01, a straggler
  // factory on a billion-edge adjacency. The rank pass now lives in the
  // shared staged build (CoPurchase.shortlist), so the guarantee is
  // asserted on the build plan the memo executes.
  test("common-neighbor shortlist plans with WindowGroupLimit (rank filter pushed down)") {
    val plan = graft.queries.CoPurchase.buildShortlist(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"shortlist build lost the group-limit pushdown (full per-pivot sort at scale):\n$plan")
  }

  test("flagship entry returns rows at sf0.001 (driver smoke contract)") {
    assert(SparkEntry.entry(spark).limit(1).count() == 1)
  }

  // Locks in the round-3 headline fix: IVF assignment must stay a narrow
  // map over the corpus (broadcast packed centroids + native NearestCell
  // argmax). Reintroducing the corpus×k crossJoin + window formulation —
  // which shuffles k× the corpus per Lloyd round — fails here, the same way
  // no-CartesianProduct is locked in above. The bounded centroid side is
  // materialized first (localCheckpoint) so any shuffle Exchange left in
  // the plan could only come from the corpus path.
  test("Ivf.assign: no shuffle Exchange between corpus scan and NearestCell") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val dim = graft.io.Stats.embeddingDim(spark, sfDir)
    val centroids = graft.llm.Ivf.fit(emb, 8, 0, dim).localCheckpoint(true)
    val plan = graft.llm.Ivf.assign(emb, centroids, dim)
      .queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("nearestcell"),
      s"assignment no longer uses the native NearestCell expression:\n$plan")
    // The corpus is the STREAMED side of the broadcast join, printed before
    // the `BroadcastExchange` subtree (the build side packs the k centroid
    // rows into one row and legitimately holds a k-row SinglePartition
    // Exchange). ShuffleExchangeExec prints as bare "Exchange"; the word
    // boundary excludes "BroadcastExchange" itself.
    val streamedSide = plan.substring(0, plan.indexOf("BroadcastExchange").max(0))
    assert(streamedSide.nonEmpty, s"no BroadcastExchange in plan:\n$plan")
    val shuffle = "(?<!\\w)Exchange(?!\\w)".r
    assert(shuffle.findFirstIn(streamedSide).isEmpty,
      s"Ivf.assign corpus path contains a shuffle Exchange:\n$plan")
  }

  // Same lock for PQ encoding: the corpus side must stay a narrow map
  // (broadcast packed codebooks + m native NearestCodeL2 argmins) —
  // an encode that explodes corpus×(m·ksub) rows would recreate the
  // round-2 IVF scale-killer under a new name.
  test("Pq.encode: no shuffle Exchange between corpus scan and NearestCodeL2") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val dim = graft.io.Stats.embeddingDim(spark, sfDir)
    val cb = graft.llm.Pq.codebooks(emb, 4, 16, dim).localCheckpoint(true)
    val plan = graft.llm.Pq.encode(emb, cb, 4, dim)
      .queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("nearestcodel2"),
      s"encode no longer uses the native NearestCodeL2 expression:\n$plan")
    val streamedSide = plan.substring(0, plan.indexOf("BroadcastExchange").max(0))
    assert(streamedSide.nonEmpty, s"no BroadcastExchange in plan:\n$plan")
    val shuffle = "(?<!\\w)Exchange(?!\\w)".r
    assert(shuffle.findFirstIn(streamedSide).isEmpty,
      s"Pq.encode corpus path contains a shuffle Exchange:\n$plan")
  }

  // Locks in the round-5 curation scale claims the same way.

  // repetitionStats is advertised as the cheapest possible quality gate:
  // entirely row-local. The only exchanges its plan may contain are the
  // widen round-robin and the output range sort — a hash-partitioned
  // Exchange means someone reintroduced the per-gram groupBy formulation,
  // which shuffles every gram instance of every document.
  test("Curation.repetitionStats: zero data shuffles (no hashpartitioning Exchange)") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val plan = graft.llm.Curation.repetitionStats(docs, "text", "doc_id")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("hashpartitioning"),
      s"repetitionStats plan gained a hash shuffle:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"repetitionStats plan gained an aggregate (should be row-local folds):\n$plan")
  }

  // contamination's corpus path must stay a broadcast filter: the corpus
  // is the streamed side of ONE BroadcastNestedLoopJoin against the packed
  // benchmark gram row. A hash Exchange before the first BroadcastExchange
  // means the corpus started shuffling (e.g. someone rewrote the overlap
  // as an explode + gram join on the corpus side).
  test("Curation.contamination: corpus path shuffle-free up to the broadcast") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sfDir)
    val plan = graft.llm.Curation.contamination(docs, "text", "doc_id",
        col("doc_id") % 97 === 0, 4)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"contamination no longer broadcasts the packed gram set:\n$plan")
    val streamedSide = plan.substring(0, plan.indexOf("BroadcastExchange").max(0))
    assert(streamedSide.nonEmpty, s"no BroadcastExchange in plan:\n$plan")
    assert(!streamedSide.contains("hashpartitioning"),
      s"contamination corpus path contains a hash shuffle:\n$plan")
  }

  // AllPairs is the one operator whose naive formulation IS the quadratic
  // blow-up. Its license to exist at scale is the df-pruned posting-list
  // equi-join: pairs may only be produced per TERM (join on term), never by
  // enumerating documents, and no global window may rank the pairs.
  test("AllPairs.cosinePairs: per-term equi-join, no window, no global sort before agg") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val plan = graft.llm.AllPairs.cosinePairs(docs, "doc_id", "text", 50, 40000L)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), s"AllPairs plan gained a window:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"AllPairs degenerated to all-pairs enumeration:\n$plan")
  }

  // q125's exact-size-per-group guarantee relies on Spark pushing the
  // rank <= k filter below the sort (WindowGroupLimit → per-partition k-row
  // heaps). Losing the pushdown silently turns the sampler into a full
  // per-group sort — fine at sf0.01, a straggler factory on a billion-row
  // group.
  test("priority sampling plans with WindowGroupLimit (rank filter pushed down)") {
    val plan = graft.queries.CurationQueries.defs("q125_priority_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"q125 lost the group-limit pushdown (full per-group sort at scale):\n$plan")
  }

  // SemDedup's corpus path must keep the narrow NearestCell assignment; the
  // quadratic search must stay confined to within-cell equi-joins.
  test("SemDedup.verdicts: narrow assignment + cell-keyed equi-join only") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val dim = graft.io.Stats.embeddingDim(spark, sfDir)
    val cents = graft.llm.Ivf.fit(emb, 8, 0, dim).localCheckpoint(true)
    val plan = graft.llm.SemDedup.verdicts(emb, cents, dim, 0.4)
      .queryExecution.executedPlan.toString()
    assert(plan.toLowerCase.contains("nearestcell"),
      s"SemDedup lost the shuffle-free assignment:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"SemDedup pair search degenerated to a cross join:\n$plan")
  }

  // Importance's ratio table is bounded by `buckets` and must come back to
  // the per-doc counts as a BROADCAST join — a shuffle join here drags the
  // corpus-sized counts frame through an extra exchange for a <=256-row
  // table.
  test("Importance.hashedNgramScores: bucket table joins back via broadcast") {
    import org.apache.spark.sql.functions.col
    val docs = graft.io.Tables.documents(spark, sfDir)
    val plan = graft.llm.Importance.hashedNgramScores(docs, "text", "doc_id",
        col("lang") === "en", 256)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"Importance ratio-table join is no longer broadcast:\n$plan")
  }

  // Cooccurrence pair generation must stay ROW-LOCAL (zip-with-shifted-self
  // inside a Generate): a posexplode + positional self-join would put an
  // O(n²)-per-document join in the plan. The global totals may only arrive
  // via the broadcast of a 1-row aggregate, and no window may rank pairs.
  test("Cooccurrence.pairs: row-local generation, broadcast totals, no window") {
    val docs = graft.io.Tables.documents(spark, sfDir)
    val plan = graft.llm.Cooccurrence.pairs(docs, "text", "doc_id", 3, 5L)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Generate"),
      s"Cooccurrence lost the row-local pair explode:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"Cooccurrence totals are no longer a 1-row broadcast:\n$plan")
    assert(!plan.contains("Window"), s"Cooccurrence plan gained a window:\n$plan")
  }

  // shardAssign's license is the scalable global rank: a Window operator
  // here means the permutation collapsed to a single-task global
  // row_number — the exact thing RunningTotal exists to avoid.
  test("Sampling.shardAssign: range-partitioned prefix sum, not a global window") {
    val docs = graft.io.Tables.documents(spark, sfDir).select("doc_id")
    val plan = graft.llm.Sampling.shardAssign(docs, "doc_id", 8)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"),
      s"shardAssign uses a global window (single-task rank at scale):\n$plan")
  }

  // cellRepresentatives must aggregate per cell with a map-side partial on
  // the bounded cell key — NOT a row_number window per cell, whose
  // partitions grow with the corpus. A Window operator in this plan is the
  // regression.
  test("Ivf.cellRepresentatives: bounded-key aggregate, not a per-cell window") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val dim = graft.io.Stats.embeddingDim(spark, sfDir)
    val cents = graft.llm.Ivf.fit(emb, 8, 0, dim).localCheckpoint(true)
    val plan = graft.llm.Ivf.cellRepresentatives(emb, cents, dim)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"),
      s"cellRepresentatives uses a per-cell window (corpus/k rows in one task at scale):\n$plan")
    assert(plan.toLowerCase.contains("nearestcell"),
      s"cellRepresentatives lost the shuffle-free assignment:\n$plan")
  }

  // dimStats must stay ONE global aggregate of 2·dim partials: a
  // hashpartitioning Exchange means someone reintroduced the posexplode +
  // per-(row,dim) groupBy formulation, which shuffles corpus×dim rows.
  test("Similarity.dimStats: single global aggregate, no corpus×dim shuffle") {
    val emb = graft.io.Tables.embeddings(spark, sfDir)
    val dim = graft.io.Stats.embeddingDim(spark, sfDir)
    val plan = graft.llm.Similarity.dimStats(emb, "embedding", dim)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("hashpartitioning"),
      s"dimStats plan gained a hash shuffle (posexplode formulation?):\n$plan")
    assert(!plan.contains("Generate [posexplode"),
      s"dimStats plan explodes the corpus:\n$plan")
  }

  // The bucketed fact⋈fact join must be shuffle-free on the join key: a
  // hashpartitioning exchange on the orderkey means the bucketed layout
  // stopped being picked up. (A LOCAL per-bucket Sort under the SMJ is
  // expected — Spark ≥3 ignores bucket-sort metadata at scan time; see
  // q157's scaladoc.) Broadcast is disabled so the small sf0.001 side
  // can't turn the test vacuous.
  test("q157 bucketed join: no exchange on the join key, bucketed scans") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = graft.queries.RelationalQueries
        .q157_bucketed_join(spark, sfDir)
        .queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"),
        s"bucketed join no longer plans as SMJ:\n$plan")
      assert(!plan.contains("hashpartitioning(l_orderkey") &&
        !plan.contains("hashpartitioning(o_orderkey"),
        s"bucketed join shuffles a side (bucketing not picked up):\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan is not bucketed:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }
}
