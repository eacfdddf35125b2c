package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.io.Tables
import graft.streaming.Streaming
import graft.queries.StreamingQueries._

/** Streaming certifications, continued — the later half of the streaming
  * registry (attribution, covisitation, sketch maintenance, concurrency,
  * KMV, Holt / Holt-Winters, priority sampling, the NB gate), split out of
  * [[StreamingQueries]] (round-9 maintainability: no non-test source file
  * over 2000 lines). The staging/checkpoint harness (`Stage`,
  * `stageOrderedBy`, `withCertStatePartitions`) stays in
  * [[StreamingQueries]] with package-private visibility, so staged replay
  * corpora remain memoized ACROSS both registries. Contract unchanged:
  * each certification is a real multi-micro-batch run whose final output
  * hash-matches a batch DuckDB oracle.
  */
object StreamingCertQueries {

  type Q = (SparkSession, String) => DataFrame


  /** Stateful streaming last-touch attribution — the twentieth streaming
    * cert: [[Streaming.lastTouchAttribution]] carries each user's latest
    * view (two longs of state) across micro-batch boundaries and credits
    * purchases within the 30-minute lookback. Replays the staged
    * (tsm, event_id)-ordered files (its own memo — the type code differs
    * from q218's DFA alphabet), and the emitted purchases must hash-match
    * q220's batch IGNORE-NULLS-window oracle — certifying that the
    * unbounded attribution window really does collapse to |users|-bounded
    * carried state with no history rescan. */
  val q229_stream_attribution: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      when(col("event_type") === "view", 1L)
        .when(col("event_type") === "purchase", 2L)
        .otherwise(0L).as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsAttrOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q229_attr_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.KeyedObs]
    withCertStatePartitions(s) {
      val query = Streaming.lastTouchAttribution(arrivals, lookbackMs = 1800000L)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .select(col("user_id"), col("event_id"), col("view_id"),
        col("attributed"))
      .orderBy(col("event_id"))
  }
  /** Same oracle as the batch window query. */
  val q229_sql: String = AnalyticsQueries.q220_sql

  /** Stateful streaming co-visitation — the twenty-first streaming cert:
    * [[Streaming.covisitPairs]] carries a ring of each user's last 3
    * events and pairs every arrival against it (the batch lead-window's
    * lookahead read from the other end). The pair STREAM is what the
    * state machine emits; the final count is a batch aggregate over the
    * emitted pairs, and the whole thing must hash-match q228's batch
    * lead-window oracle — certifying that bounded O(k) per-user state
    * reproduces the window semantics with no history rescan. Event-type
    * codes ride KeyedObs.x (alphabetical: click=1 … view=5) and are
    * decoded back to names for oracle parity. */
  val q232_stream_covisit: Q = (s, d) => {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val code = types.zipWithIndex.foldLeft(lit(0L)) { case (acc, (t, i)) =>
      when(col("event_type") === t, lit(i + 1L)).otherwise(acc) }
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      code.as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsCovisitOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q232_cov_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.KeyedObs]
    withCertStatePartitions(s) {
      val query = Streaming.covisitPairs(arrivals, lookbackMs = 1800000L, k = 3)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    def decode(c: org.apache.spark.sql.Column) =
      types.zipWithIndex.foldLeft(lit("?")) { case (acc, (t, i)) =>
        when(c === (i + 1L), lit(t)).otherwise(acc) }
    s.table(name)
      .select(decode(col("a")).as("a"), decode(col("b")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("a"), col("b"))
  }
  /** Same oracle as the batch lead-window query. */
  val q232_sql: String = GraphQueries.q228_sql

  /** Stateful streaming HyperLogLog — the twenty-second streaming cert:
    * [[Streaming.hllSketch]] keeps ONE m-byte register array per week in
    * the state store and folds pre-hashed (j, rho) arrivals in by
    * register max; the replay's final per-week row must reproduce the
    * estimate the batch rollup (q227) computes from the same registers —
    * certifying the live-dashboard distinct-count shape: constant state
    * per key, order-insensitive updates (micro-batch boundaries can't
    * change the answer), estimates hash-exact against the SQL replay. */
  val q234_stream_hll: Q = (s, d) => {
    import s.implicits._
    val m = 256
    val bits = graft.llm.Hll.rhoBits(m)
    val ev = Tables.events(s, d).select(
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      expr("unix_millis(ts) div 86400000 div 7").as("week"),
      graft.llm.Hll.jCol(col("user_id"), m).as("j"),
      graft.llm.Hll.rhoCol(col("user_id"), m).cast("long").as("rho"))
    val srcDir = stageOrderedBy(ev, d, "eventsHllOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q234_hll_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.HllObs]
    withCertStatePartitions(s) {
      val query = Streaming.hllSketch(arrivals, m, bits)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .groupBy(col("week"))
      .agg(max(struct(col("seen"), col("s"), col("zero_registers"))).as("f"))
      .select(col("week"), col("f.seen").as("n_events"),
        (lit(graft.llm.Hll.numerator(m)) / col("f.s")).as("hll_estimate"),
        col("f.zero_registers"))
      .orderBy(col("week"))
  }
  val q234_sql: String = {
    val m = 256
    val bits = graft.llm.Hll.rhoBits(m)
    s"""WITH e AS (SELECT epoch_ms(ts) // 86400000 // 7 AS week, user_id,
       |             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
       |           FROM events),
       |jr AS (SELECT week, hv % $m AS j,
       |          CASE WHEN instr(lpad(bin(hv // $m), $bits, '0'), '1') = 0 THEN ${bits + 1}
       |               ELSE instr(lpad(bin(hv // $m), $bits, '0'), '1') END AS rho
       |       FROM e),
       |wr AS (SELECT week, j, max(rho) AS mx FROM jr GROUP BY 1, 2),
       |grid AS (SELECT w.week, sp.j
       |         FROM (SELECT DISTINCT week FROM wr) w,
       |              (SELECT unnest(range($m)) AS j) sp),
       |regs AS (SELECT grid.week, CAST(coalesce(wr.mx, 0) AS INTEGER) AS m
       |         FROM grid LEFT JOIN wr ON grid.week = wr.week AND grid.j = wr.j),
       |agg AS (SELECT week,
       |          CAST(sum(1::BIGINT << (${bits + 1} - m)) AS BIGINT) AS s,
       |          CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_registers
       |        FROM regs GROUP BY 1),
       |ne AS (SELECT week, count(*)::BIGINT AS n_events FROM e GROUP BY 1)
       |SELECT ne.week, n_events,
       |       CAST(${graft.llm.Hll.numerator(m)} AS DOUBLE) / s AS hll_estimate,
       |       zero_registers
       |FROM ne JOIN agg USING (week) ORDER BY week""".stripMargin
  }

  /** Stateful streaming CMS join-size — the twenty-third streaming cert:
    * [[Streaming.cmsRowSquares]] keeps the d×w Count-Min counters in the
    * state store (keyed by hash row) while lineitem part keys stream
    * through pre-bucketed, and the final min-over-rows Σcounter² must
    * hash-match q235's batch sketch estimate — certifying that the
    * join-size readout a streaming optimizer consults is EXACTLY the
    * batch sketch at every point in the stream (increments commute, so
    * batch boundaries are invisible). The exact Σc² comparison side is
    * computed in batch from the same table, as in q235. */
  val q239_stream_cms: Q = (s, d) => {
    import s.implicits._
    val depth = 3
    val width = 512
    val keys = Tables.lineitem(s, d).select(col("l_partkey").as("k"),
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("lid"))
    val ib = (0 until depth).map { i =>
      struct(lit(i.toLong).as("i"),
        graft.llm.Sketch.cmsBucket(i, col("k"), width).as("b"))
    }
    val obs = keys.select(col("k"), col("lid"), explode(array(ib: _*)).as("ib"))
      .select(col("ib.i").as("i"), col("ib.b").as("b"), col("k"), col("lid"))
    val srcDir = stageOrderedBy(obs, d, "lineitemCmsOrdered4", 4,
      Seq(col("k"), col("lid"), col("i")))
    val ckpt = Stage.ckpt()
    val name = "q239_cms_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(obs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.CmsObs]
    withCertStatePartitions(s) {
      val query = Streaming.cmsRowSquares(arrivals, width)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    val est = s.table(name)
      .groupBy(col("i"))
      .agg(max(struct(col("seen"), col("e"))).as("f"))
      .agg(min(col("f.e")).as("cms_join_size"))
    val exact = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_join_size"))
    exact.crossJoin(broadcast(est)) // 1 row x 1 row
      .withColumn("ratio_ppm",
        expr("cms_join_size * 1000000 div exact_join_size"))
  }
  /** Same oracle as the batch sketch estimate. */
  val q239_sql: String = SketchQueries.q235_sql

  /** Stateful streaming max-concurrency — the twenty-fourth streaming
    * cert: [[Streaming.concurrencyPeak]] sweeps the same +1/−1 interval
    * deltas as q245's batch prefix sum with three longs of state per
    * event type, and the final per-key row must hash-match the batch
    * peak/first-instant oracle — certifying the live session-gauge
    * shape. Event types ride the key as codes (alphabetical, as q232)
    * and decode for oracle parity; the staged order is the sweep order
    * (t, delta, event_id) so closes replay before opens per instant. */
  val q246_stream_concurrency: Q = (s, d) => {
    import s.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val code = types.zipWithIndex.foldLeft(lit(0L)) { case (acc, (t, i)) =>
      when(col("event_type") === t, lit(i + 1L)).otherwise(acc) }
    val ev = Tables.events(s, d).select(code.as("k"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"))
    val deltas = ev.select(col("k").as("user_id"), col("tsm"),
        lit(1L).as("x"), col("event_id"))
      .unionAll(ev.select(col("k").as("user_id"),
        (col("tsm") + 1800000L).as("tsm"), lit(-1L).as("x"),
        col("event_id")))
    val srcDir = stageOrderedBy(deltas, d, "eventsConcOrdered4", 4,
      Seq(col("tsm"), col("x"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q246_conc_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(deltas.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.KeyedObs]
    withCertStatePartitions(s) {
      val query = Streaming.concurrencyPeak(arrivals)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    def decode(c: org.apache.spark.sql.Column) =
      types.zipWithIndex.foldLeft(lit("?")) { case (acc, (t, i)) =>
        when(c === (i + 1L), lit(t)).otherwise(acc) }
    s.table(name)
      .groupBy(col("key"))
      .agg(max(struct(col("seen"), col("peak"), col("t_at_peak"))).as("f"))
      .select(decode(col("key")).as("event_type"),
        col("f.peak").as("peak"), col("f.t_at_peak").as("t_at_peak"))
      .orderBy(col("event_type"))
  }
  /** Same oracle as the batch sweep. */
  val q246_sql: String = AnalyticsQueries.q245_sql

  /** The twenty-fifth streaming certification — a LIVE per-source KMV
    * distinct-token sketch ([[Streaming.kmvSketch]]): ≤ 64 longs of state
    * per source maintained across micro-batches by a commutative,
    * idempotent k-min-set merge, so the final (m, t) registers — and the
    * integral estimate `(k−1)·2³² div t` — must equal the batch KMV
    * ([[graft.operators.Kmv]], q215/q259's sketch) exactly, which is what
    * the oracle replays. The streaming form of the sketch algebra family:
    * union-mergeable state, live cardinality readout per batch. */
  val q264_stream_kmv: Q = (s, d) => {
    import s.implicits._
    val k = 64
    val toks = Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        graft.operators.Kmv.hash32(col("tok")).as("h"))
    val srcDir = stageOrderedBy(toks, d, "docsKmvOrdered4", 4,
      Seq(col("doc_id"), col("h")))
    val ckpt = Stage.ckpt()
    val name = "q264_kmv_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(toks.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.KmvObs]
    withCertStatePartitions(s) {
      val query = Streaming.kmvSketch(arrivals, k)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .groupBy(col("source"))
      .agg(max(struct(col("seen"), col("m"), col("t"))).as("f"))
      .select(col("source"), col("f.seen").as("n_obs"),
        when(col("f.m") < k, col("f.m"))
          .otherwise(expr(s"((${k - 1}) * 4294967296) div greatest(f.t, 1)"))
          .as("n_distinct_est"))
      .orderBy(col("source"))
  }
  val q264_sql: String =
    """WITH toks AS (SELECT source,
      |    unnest(list_filter(string_split_regex(lower(text), '\W+'),
      |           x -> x <> '')) AS tok
      |  FROM documents),
      |cnt AS (SELECT source, count(*)::BIGINT AS n_obs FROM toks GROUP BY 1),
      |hs AS (SELECT DISTINCT source,
      |         ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
      |r AS (SELECT source, h,
      |        row_number() OVER (PARTITION BY source ORDER BY h) AS r FROM hs),
      |sk AS (SELECT source, count(*)::BIGINT AS m, max(h) AS t
      |       FROM r WHERE r <= 64 GROUP BY 1)
      |SELECT source, n_obs,
      |  (CASE WHEN m < 64 THEN m
      |        ELSE (63 * 4294967296) // greatest(t, 1) END)::BIGINT
      |    AS n_distinct_est
      |FROM cnt JOIN sk USING (source) ORDER BY source""".stripMargin

  /** The twenty-sixth streaming certification — LIVE Holt trend-adjusted
    * smoothing ([[Streaming.holtTrend]]): q257's coupled (level, trend)
    * integer recurrence carried across micro-batch boundaries with two
    * longs of state per key, certified row-for-row against the same
    * list-of-lists `list_reduce` oracle as the batch fold. The
    * always-on forecasting sentinel: no history rescan, |keys|-bounded
    * state, signed inputs under verified truncating division. */
  val q265_stream_holt: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      round(col("value") * 10000).cast("long").as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsTsSignedOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q265_holt_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.KeyedObs]
    withCertStatePartitions(s) {
      val query = Streaming.holtTrend(arrivals)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .select(col("user_id"), col("event_id"), col("x"), col("level"),
        col("trend"))
      .orderBy(col("event_id"))
  }
  /** Identical recurrence, identical staged order → q257's batch oracle. */
  val q265_sql: String = ForecastQueries.q257_sql

  /** The twenty-seventh streaming certification — LIVE weighted-priority
    * top-3 sampling per nation ([[Streaming.priorityTopK]]): q125's A-ES
    * weighted-without-replacement sample maintained across micro-batches
    * with 2k longs of state per key (the winners, never the population).
    * The top-k-by-total-order merge is commutative and idempotent, so
    * the final sample equals the batch window's under any batch split —
    * certified against q125's own oracle. */
  val q268_stream_priority_sample: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).where(col("c_acctbal") > 0)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("w_fp"))
      .withColumn("priority_fp",
        graft.llm.Sampling.priorityFp(col("c_custkey"), col("w_fp")))
      .select(col("c_nationkey"), col("c_custkey"), col("priority_fp"))
    val srcDir = stageOrderedBy(c, d, "customerPriOrdered4", 4,
      Seq(col("c_custkey")))
    val ckpt = Stage.ckpt()
    val name = "q268_pri_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(c.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.PriObs]
    withCertStatePartitions(s) {
      val query = Streaming.priorityTopK(arrivals, 3)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    // last batch per nation via ONE window over the (bounded: k rows per
    // nation per batch) memory table — a self-join would conflict on the
    // memory sink's attributes
    s.table(name)
      .withColumn("mx",
        max(col("seen")).over(Window.partitionBy(col("c_nationkey"))))
      .where(col("seen") === col("mx"))
      .select(col("c_nationkey"), col("rk"), col("c_custkey"),
        col("priority_fp"))
      .orderBy(col("c_nationkey"), col("rk"))
  }
  /** Same winners, same total order → q125's batch oracle verbatim. */
  val q268_sql: String = CurationQueries.q125_sql

  /** The twenty-eighth streaming certification — the trained Naive Bayes
    * language classifier DEPLOYED on the document ingest stream
    * ([[graft.llm.NaiveBayes.classifyLiteral]]): the model (q273's
    * chi-square-selected vocabulary + Laplace fixed-point weights) is fit
    * batch-side, collected under the bounded gate-config budget
    * (|V'| x |langs| rows), inlined as literal map/array columns, and
    * every arriving document is scored ROW-LOCALLY — no aggregate, no
    * state, no shuffle (the q173 stateless-gate shape). Streamed
    * per-document predictions must hash-match the batch scoring chain's
    * argmax (q274's `sc`/`best` CTEs) including the −score/label
    * tie-break. */
  val q278_stream_nb: Q = (s, d) => {
    val docs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"), col("text"))
    val (langs, priors, weights) = InfoQueries.nbModelLiteral(s, d)
    val (srcDir, _, _) = Stage.memo(d, "docslang4") { dir =>
      docs.repartitionByRange(4, col("doc_id"))
        .write.mode("append").parquet(dir)
      (0L, 0L)
    }
    val ckpt = Stage.ckpt()
    val name = "q278_nb_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = graft.llm.NaiveBayes
        .classifyLiteral(stream, "text", "doc_id", langs, priors, weights,
          passCols = Seq("lang"))
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .select(col("doc_id"), col("lang"), col("pred_lang"), col("score_fp"))
      .orderBy(col("doc_id"))
  }

  val q278_sql: String =
    s"""WITH ${InfoQueries.nbCtes},
      |pri AS (SELECT DISTINCT lang AS pred_lang, prior_fp FROM model),
      |dtc AS (SELECT doc_id, tok, count(*)::BIGINT AS n_t
      |        FROM tk JOIN sel USING (tok) GROUP BY 1, 2),
      |contrib AS (SELECT dtc.doc_id, m.lang AS pred_lang,
      |              sum(dtc.n_t * m.w_fp)::BIGINT AS tok_fp
      |            FROM dtc JOIN model m USING (tok) GROUP BY 1, 2),
      |sc AS (SELECT d.doc_id, d.lang, pri.pred_lang,
      |         (pri.prior_fp + coalesce(contrib.tok_fp, 0))::BIGINT AS score
      |       FROM documents d CROSS JOIN pri
      |       LEFT JOIN contrib ON contrib.doc_id = d.doc_id
      |                        AND contrib.pred_lang = pri.pred_lang)
      |SELECT doc_id, lang, pred_lang, score AS score_fp FROM sc
      |QUALIFY row_number() OVER (PARTITION BY doc_id
      |                           ORDER BY score DESC, pred_lang ASC) = 1
      |ORDER BY doc_id""".stripMargin

  /** The twenty-ninth streaming certification — LIVE Holt–Winters
    * ([[Streaming.holtWintersStream]]): q279's weekly-seasonal triple
    * recurrence maintained across micro-batch boundaries with m + 3
    * longs of state per series (level, trend, step counter, 7-slot
    * seasonal ring). The daily series is staged in day order
    * (repartitionByRange + mtime sequencing), so the streamed fold
    * replays the batch fold exactly — certified against q279's own
    * list_reduce oracle verbatim. */
  val q284_stream_hw: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val srcDir = stageOrderedBy(daily, d, "dailyTypeCounts4", 4,
      Seq(col("day"), col("event_type")))
    val ckpt = Stage.ckpt()
    val name = "q284_hw_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(daily.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    val arrivals = stream.as[Streaming.HwObs]
    withCertStatePartitions(s) {
      val query = Streaming.holtWintersStream(arrivals, m = 7)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .select(col("event_type"), col("day"), col("x"), col("level"),
        col("trend"), col("seas"))
      .orderBy(col("event_type"), col("day"))
  }
  /** Identical recurrence, identical staged order → q279's batch oracle. */
  val q284_sql: String = ForecastQueries.q279_sql
  /** Stateful streaming cohort retention — the thirtieth streaming cert:
    * [[Streaming.cohortRetention]] carries TWO longs per user (cohort
    * week + 64-bit seen-offset bitmask) across micro-batch boundaries
    * and emits each (cohort, offset) cell exactly once per user; the
    * final batch count over the emitted cells must hash-match q292's
    * batch `min(week)` + distinct-count oracle — certifying that the
    * retention triangle, which in batch needs a corpus-wide distinct and
    * a user-keyed min, collapses to bounded per-user state under
    * event-time-ordered replay. The epoch week rides KeyedObs.x. */
  val q295_stream_retention: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      expr("unix_millis(ts) div 604800000").as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsRetentionOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q295_ret_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = Streaming.cohortRetention(stream.as[Streaming.KeyedObs])
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    // cells are unique per user by construction, so count(*) per cell is
    // the distinct-user count the batch oracle computes
    s.table(name)
      .groupBy(col("cohort_week"), col("offset_weeks"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("offset_weeks"))
  }
  /** Same oracle as the batch retention triangle. */
  val q295_sql: String = ForecastQueries.q292_sql

  /** Stateful streaming FUNNEL certification — the thirty-first streaming
    * cert: [[Streaming.funnelDepth]] carries each user's greedy funnel
    * state (depth + last-advance micros, two longs) across four
    * (tsm, x, event_id)-ordered micro-batches — the SAME (t, stage)
    * order the batch [[graft.operators.Funnel.depth]] `sort_array` fold
    * walks, so the cross-batch replay extends the within-batch order and
    * the greedy matching is the identical function. Timestamps ride
    * MICROS (the batch fold's `unix_micros` resolution — millis would
    * merge distinct instants and break the strict `ts > prev` rule).
    * Depth is monotone, so `max` over the per-batch emissions is the
    * final depth; must hash-match q111's stage-chained batch oracle. */
  val q303_stream_funnel: Q = (s, d) => {
    import s.implicits._
    val stages = Seq("view", "click", "purchase")
    val ev = Tables.events(s, d)
      .where(col("event_type").isin(stages: _*))
      .select(
        col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("tsm"),
        col("event_id").cast("long").as("event_id"),
        when(col("event_type") === "view", 0L)
          .when(col("event_type") === "click", 1L)
          .otherwise(2L).as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsFunnelOrdered4", 4,
      Seq(col("tsm"), col("x"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q303_fun_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = Streaming.funnelDepth(stream.as[Streaming.KeyedObs], stages.size)
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .groupBy(col("user_id"))
      .agg(max(col("funnel_depth")).as("funnel_depth"))
      .orderBy(col("user_id"))
  }
  /** Same oracle as the batch funnel. */
  val q303_sql: String = AnalyticsQueries.q111_sql

  /** The thirty-second streaming certification — a LIVE per-type MOMENTS
    * sketch ([[Streaming.momentsSketch]]): four longs of state per event
    * type (n, Σv, Σv², Σv³) maintained across micro-batch boundaries by
    * the +-monoid merge, certified against a direct batch aggregate over
    * the same rows — the streaming half of q306's mergeability story
    * (q306 proves day-partials → week ≡ direct; this proves
    * micro-batches → total ≡ direct). Values in WHOLE units (cents
    * would put Σv³ within 10³ of BIGINT overflow at sf0.1 row counts;
    * the fold's Math.multiplyExact guard makes that a fail-fast, not a
    * wrap). Final readout per key = max(seen) batch; the derived
    * mean/variance ppm divisions replay exactly in HUGEINT. */
  val q307_stream_moments: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("event_type"),
      round(col("value")).cast("long").as("v"),
      col("event_id").cast("long").as("event_id"))
    val srcDir = stageOrderedBy(ev, d, "eventsMomOrdered4", 4,
      Seq(col("event_type"), col("v"), col("event_id")))
    val ckpt = Stage.ckpt()
    val name = "q307_mom_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = Streaming.momentsSketch(stream.as[Streaming.MomObs])
        .writeStream
        .queryName(name)
        .format("memory")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    s.table(name)
      .groupBy(col("event_type"))
      .agg(max(struct(col("seen"), col("s1"), col("s2"), col("s3"))).as("f"))
      .select(col("event_type"), col("f.seen").as("n_obs"),
        col("f.s1").as("s1"), col("f.s2").as("s2"), col("f.s3").as("s3"))
      // derived algebra in DECIMAL(38,0) like q306 — (n·s2 − s1²)·10⁶
      // passes 2⁶³ around n ≈ 2·10⁵ per key even though the state longs
      // themselves are nowhere near overflow (the oracle is HUGEINT)
      .withColumn("nd", expr("cast(n_obs as decimal(38,0))"))
      .withColumn("s1d", expr("cast(s1 as decimal(38,0))"))
      .withColumn("mean_ppm",
        expr("cast((s1d * 1000000) div nd as bigint)"))
      .withColumn("var_ppm",
        expr("cast(((nd * s2 - s1d * s1d) * 1000000) div (nd * nd)" +
          " as bigint)"))
      .drop("nd", "s1d")
      .orderBy(col("event_type"))
  }
  val q307_sql: String =
    """WITH e AS (SELECT event_type, CAST(round(value) AS BIGINT) AS v
      |           FROM events),
      |a AS (SELECT event_type, count(*)::HUGEINT AS n,
      |        sum(v)::HUGEINT AS s1, sum(v * v)::HUGEINT AS s2,
      |        sum(v * v * v)::HUGEINT AS s3
      |      FROM e GROUP BY 1)
      |SELECT event_type, n::BIGINT AS n_obs, s1::BIGINT AS s1,
      |       s2::BIGINT AS s2, s3::BIGINT AS s3,
      |       ((s1 * 1000000) // n)::BIGINT AS mean_ppm,
      |       (((n * s2 - s1 * s1) * 1000000) // (n * n))::BIGINT AS var_ppm
      |FROM a ORDER BY event_type""".stripMargin

  // ---------------------------------- round 10: checkpoint RECOVERY certs

  /** Run a streaming cert as TWO query incarnations over one source dir —
    * the checkpoint-RECOVERY certification the 32 continuous certs don't
    * exercise. The staged replay files are copied into a fresh per-
    * invocation run dir in two halves: incarnation 1 sees only the first
    * `firstN` files and runs to completion (`AvailableNow` commits every
    * processed batch), is stopped, the remaining files are copied in, and
    * a NEW query object starts from the SAME `checkpointLocation`. The
    * restart recovers the stateful operators' keyed state from the state
    * store and the file-source offset log guarantees incarnation 2 reads
    * only the unseen files — no reprocessing, no gap. Both incarnations
    * write the SAME parquet file sink (the memory sink used by the
    * continuous certs deliberately refuses checkpoint recovery — the file
    * sink's `_spark_metadata` commit log is the fault-tolerant,
    * exactly-once production shape, and reading the dir back goes through
    * that log, so only committed batches count). The certified property:
    * the recovered run's cumulative output hash-matches the batch oracle,
    * i.e. a mid-stream worker death + restart is output-invisible (the
    * analog of the reference DAG's survive-by-rerun, `airflow.py:31`,
    * done the durable-state way). A fresh run dir per invocation (rather
    * than the memoized staged dir) keeps the staged corpus immutable and
    * makes the mid-stream restart real on every run, including Bench
    * reps.
    *
    * The copies preserve the staged mtime sequence (the file source
    * replays oldest-first), so the cross-batch arrival order is exactly
    * the continuous cert's.
    */
  /** One recovery-cert SOURCE: a memoized staged dir, how many of its
    * files incarnation 1 may see, and the read schema. */
  private case class RecSrc(srcDir: String, firstN: Int,
                            schema: org.apache.spark.sql.types.StructType)

  /** Multi-source form of the recovery run (a stream-stream join has TWO
    * file sources, each with its own offset log in the one checkpoint). */
  private def recoveringTableMulti(s: SparkSession, tag: String,
                                   srcs: Seq[RecSrc])
                                  (plan: Seq[DataFrame] => DataFrame): DataFrame = {
    import java.nio.file.{Files => F, Paths}
    def partFiles(dir: String): Seq[java.nio.file.Path] = {
      val it = F.list(Paths.get(dir)).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
          buf += p
      }
      buf.sortBy(p => (F.getLastModifiedTime(p).toMillis, p.getFileName.toString))
        .toSeq
    }
    val prepared = srcs.zipWithIndex.map { case (src, i) =>
      val runDir = graft.io.Scratch.dir(s"${tag}_run${i}_") + "/src"
      F.createDirectories(Paths.get(runDir))
      val files = partFiles(src.srcDir)
      require(src.firstN > 0 && src.firstN < files.size,
        s"recovery split must leave batches on both sides: " +
          s"${src.firstN} of ${files.size}")
      (src, runDir, files)
    }
    def copyIn(runDir: String, ps: Seq[java.nio.file.Path]): Unit =
      ps.foreach { p =>
        val tgt = Paths.get(runDir).resolve(p.getFileName)
        F.copy(p, tgt)
        F.setLastModifiedTime(tgt, F.getLastModifiedTime(p))
      }
    val ckpt = Stage.ckpt()
    val outDir = graft.io.Scratch.dir(s"${tag}_out_") + "/out"
    def incarnation(): Unit = {
      val streams = prepared.map { case (src, runDir, _) =>
        s.readStream.schema(src.schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(runDir)
      }
      withCertStatePartitions(s) {
        val query = plan(streams)
          .writeStream
          .format("parquet")
          .option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        query.awaitTermination()
        query.stop() // fully released before the next incarnation opens ckpt
      }
    }
    prepared.foreach { case (src, runDir, files) =>
      copyIn(runDir, files.take(src.firstN)) }
    incarnation()
    prepared.foreach { case (src, runDir, files) =>
      copyIn(runDir, files.drop(src.firstN)) }
    incarnation()
    // the read goes through the sink's _spark_metadata commit log — only
    // batches committed by either incarnation are visible
    s.read.parquet(outDir)
  }

  private def recoveringTable(s: SparkSession, srcDir: String, firstN: Int,
                              tag: String)
                             (plan: DataFrame => DataFrame,
                              schema: org.apache.spark.sql.types.StructType): DataFrame =
    recoveringTableMulti(s, tag, Seq(RecSrc(srcDir, firstN, schema)))(
      streams => plan(streams.head))

  /** q208's EWMA cert under CHECKPOINT RECOVERY — the thirty-third
    * streaming cert: two of the four (tsm, event_id)-ordered micro-batches
    * run, the query is stopped, and a new incarnation resumes from the
    * checkpoint with every per-user state long restored. Append-mode
    * emission is exactly-once per observation, so the union of the two
    * incarnations must hash-match the SAME batch `list_reduce` oracle as
    * the continuous run — any state lost or recomputed differently across
    * the restart shifts some post-restart ewma and breaks the hash. */
  val q313_recovery_ewma: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      round(abs(col("value")) * 10000).cast("long").as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsTsOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q313_rec_ewma")(
      st => Streaming.ewmaHalfLife(st.as[Streaming.KeyedObs]).toDF(), ev.schema)
      .select(col("user_id"), col("event_id"), col("x"), col("ewma"))
      .orderBy(col("event_id"))
  }
  /** Identical recurrence + replay order → q208's oracle verbatim. */
  val q313_sql: String = StreamingQueries.q208_sql

  /** q284's Holt–Winters cert under CHECKPOINT RECOVERY — the thirty-
    * fourth streaming cert: the m + 3 longs per series (level, trend,
    * step counter, 7-slot seasonal ring) must survive the restart
    * bit-for-bit; the seasonal ring makes this the strictest recovery
    * probe, since a post-restart step reads the slot written m steps
    * before the crash. Union of incarnations vs q279's batch fold. */
  val q314_recovery_hw: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        expr("unix_millis(ts) div 86400000").as("day"))
      .agg(count(lit(1)).as("x"))
    val srcDir = stageOrderedBy(daily, d, "dailyTypeCounts4", 4,
      Seq(col("day"), col("event_type")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q314_rec_hw")(
      st => Streaming.holtWintersStream(st.as[Streaming.HwObs], m = 7).toDF(),
      daily.schema)
      .select(col("event_type"), col("day"), col("x"), col("level"),
        col("trend"), col("seas"))
      .orderBy(col("event_type"), col("day"))
  }
  /** Same oracle as the continuous Holt–Winters cert (q279's). */
  val q314_sql: String = ForecastQueries.q279_sql

  /** q307's moments sketch under CHECKPOINT RECOVERY — the thirty-fifth
    * streaming cert: the per-type (n, Σv, Σv², Σv³) monoid state resumes
    * from the store and keeps accumulating; the final readout is the max
    * cumulative emission ACROSS incarnations (monotone in seen), so a
    * restart that dropped or double-counted any pre-crash batch would
    * shift the final sums and break the hash against the direct batch
    * aggregate. */
  val q315_recovery_moments: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("event_type"),
      round(col("value")).cast("long").as("v"),
      col("event_id").cast("long").as("event_id"))
    val srcDir = stageOrderedBy(ev, d, "eventsMomOrdered4", 4,
      Seq(col("event_type"), col("v"), col("event_id")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q315_rec_mom")(
      st => Streaming.momentsSketch(st.as[Streaming.MomObs]).toDF(), ev.schema)
      .groupBy(col("event_type"))
      .agg(max(struct(col("seen"), col("s1"), col("s2"), col("s3"))).as("f"))
      .select(col("event_type"), col("f.seen").as("n_obs"),
        col("f.s1").as("s1"), col("f.s2").as("s2"), col("f.s3").as("s3"))
      .withColumn("nd", expr("cast(n_obs as decimal(38,0))"))
      .withColumn("s1d", expr("cast(s1 as decimal(38,0))"))
      .withColumn("mean_ppm",
        expr("cast((s1d * 1000000) div nd as bigint)"))
      .withColumn("var_ppm",
        expr("cast(((nd * s2 - s1d * s1d) * 1000000) div (nd * nd)" +
          " as bigint)"))
      .drop("nd", "s1d")
      .orderBy(col("event_type"))
  }
  /** Same oracle as the continuous moments cert. */
  val q315_sql: String = q307_sql

  /** q65's SESSIONIZATION under CHECKPOINT RECOVERY — the thirty-sixth
    * streaming cert and the operationally hardest one: event-time
    * timeouts. The restart must restore BOTH the per-user open-session
    * state and the WATERMARK (persisted in the checkpoint's commit
    * metadata) — a watermark reset to zero would re-admit late data and
    * defer every timeout; a lost open session would drop or split its
    * user's trailing session. Three of the six staged files (4 time
    * slices + 2 sentinels) process before the restart, so real sessions
    * are open mid-crash; the sentinels fire the timeouts in incarnation
    * 2. Output must hash-match the batch gap-split oracle exactly as the
    * continuous q65 does. */
  val q322_recovery_sessions: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val (srcDir, _, _) = stageTimeOrdered(ev, d, "events4s", 4,
      dupEachFile = false,
      sentinelOffsetsMs = Seq(4 * 60 * 60 * 1000L, 6 * 60 * 60 * 1000L))
    val out = recoveringTable(s, srcDir, firstN = 3, tag = "q322_rec_sess")(
      st => Streaming.sessionize(st.as[Streaming.Event], GapMs).toDF(),
      ev.schema)
    val w = Window.partitionBy(col("user_id")).orderBy(col("start"))
    out
      .where(col("user_id") >= 0) // drop the sentinel user
      .withColumn("session_id", row_number().over(w).cast("long"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        date_format(col("start"), "yyyy-MM-dd HH:mm:ss").as("session_start"))
      .orderBy(col("user_id"), col("session_id"))
  }
  /** Same oracle as the continuous sessionization cert. */
  val q322_sql: String = StreamingQueries.q65_sql

  /** q80's STREAM-STREAM JOIN under CHECKPOINT RECOVERY — the thirty-
    * seventh streaming cert: both sides' buffered join state (unmatched
    * views and clicks within the 60-minute bound) lives in the state
    * store and must survive the restart, or a view arriving before the
    * crash loses its post-restart clicks. Each side is its own file
    * source with its own offset log inside the one checkpoint; two of
    * each side's four files process in incarnation 1. The recovered
    * run's matches must hash-match the batch interval self-join oracle
    * — every cross-restart pair included exactly once. */
  val q323_recovery_join: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
    val views = ev.where(col("event_type") === "view")
    val clicks = ev.where(col("event_type") === "click")
    val (vDir, _, _) = stageTimeOrdered(views, d, "views", 4, dupEachFile = false)
    val (cDir, _, _) = stageTimeOrdered(clicks, d, "clicks", 4, dupEachFile = false)
    recoveringTableMulti(s, "q323_rec_join",
      Seq(RecSrc(vDir, 2, ev.schema), RecSrc(cDir, 2, ev.schema))) { streams =>
      Streaming.streamStreamJoin(
          streams(0).select(col("event_id").as("view_id"), col("ts"), col("user_id")),
          streams(1).select(col("event_id").as("click_id"), col("ts"), col("user_id")),
          "user_id", boundSeconds = 3600)
        .select(col("l.user_id").as("user_id"), col("view_id"), col("click_id"),
          col("l.ts").as("vts"), col("r.ts").as("cts"))
    }
      .select(col("user_id"), col("view_id"), col("click_id"),
        date_format(col("vts"), "yyyy-MM-dd HH:mm:ss").as("view_ts"),
        date_format(col("cts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"))
      .orderBy(col("view_id"), col("click_id"))
  }
  /** Same oracle as the continuous stream-stream join cert. */
  val q323_sql: String = StreamingQueries.q80_sql

  /** The thirty-eighth streaming certification — a LIVE Kendall τ-b: the
    * (rf, qty, discount) contingency grid is a +-monoid (per-cell counts),
    * so the state store maintains it as a built-in streaming aggregate in
    * Complete mode across micro-batch boundaries, and q327's
    * [[EvalQueries.kendallFromGrid]] readout runs UNCHANGED on the final
    * state — certifying the operator's core scale claim: the grid is the
    * whole sufficient statistic for rank concordance, so batch scan,
    * micro-batched arrival, or shard merge order cannot change τ. Must
    * hash-match q327's batch oracle exactly. */
  val q333_stream_kendall: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("rf"),
      col("l_quantity").cast("long").as("a"),
      expr("cast(round(l_discount * 100) as bigint)").as("b"),
      col("l_orderkey").cast("long").as("ok"),
      col("l_linenumber").cast("long").as("ln"))
    val srcDir = stageOrderedBy(li, d, "liKendallOrdered4", 4,
      Seq(col("ok"), col("ln")))
    val ckpt = Stage.ckpt()
    val name = "q333_ken_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val stream = s.readStream.schema(li.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir)
    withCertStatePartitions(s) {
      val query = stream
        .groupBy(col("rf"), col("a"), col("b"))
        .agg(count(lit(1)).as("c"))
        .writeStream
        .queryName(name)
        .format("memory")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
    }
    EvalQueries.kendallFromGrid(
      s.table(name).select(col("rf"), col("a"), col("b"), col("c")))
  }
  /** Same oracle as the batch grid τ-b. */
  val q333_sql: String = EvalQueries.q327_sql

  /** The thirty-ninth streaming cert — the Kendall grid under CHECKPOINT
    * RECOVERY, the sixth recovery shape (per-cell monoid counters): two
    * of the four staged files run through [[Streaming.gridCount]], the
    * query stops, and a new incarnation resumes every cell's (seen, c)
    * state from the store. Counts are monotone, so the readout is each
    * cell's max-`seen` emission across BOTH incarnations; a restart that
    * dropped or double-counted any pre-crash batch shifts some cell
    * count, which τ-b's C/D pair sums amplify — and the hash against
    * q327's batch oracle breaks. Complete-mode streaming (q333) proves
    * arrival order can't change τ; this proves a mid-stream death
    * can't either. */
  val q335_recovery_kendall: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag").as("rf"),
      col("l_quantity").cast("long").as("a"),
      expr("cast(round(l_discount * 100) as bigint)").as("b"),
      col("l_orderkey").cast("long").as("ok"),
      col("l_linenumber").cast("long").as("ln"))
    val srcDir = stageOrderedBy(li, d, "liKendallOrdered4", 4,
      Seq(col("ok"), col("ln")))
    val grid = recoveringTable(s, srcDir, firstN = 2, tag = "q335_rec_ken")(
      st => Streaming.gridCount(
        st.select(col("rf"), col("a"), col("b")).as[Streaming.CellObs]).toDF(),
      li.schema)
      .groupBy(col("rf"), col("a"), col("b"))
      .agg(max(struct(col("seen"), col("c"))).as("f"))
      .select(col("rf"), col("a"), col("b"), col("f.c").as("c"))
    EvalQueries.kendallFromGrid(grid)
  }
  /** Same oracle as the batch grid τ-b and the Complete-mode cert. */
  val q335_sql: String = EvalQueries.q327_sql

  /** q234's HyperLogLog under CHECKPOINT RECOVERY — the fortieth
    * streaming cert and the seventh recovery shape: the per-week m-byte
    * REGISTER ARRAY (the distinct-count sketch itself) must survive the
    * restart bit-for-bit. Register max is idempotent and commutative, so
    * a correctly recovered run is indistinguishable from the continuous
    * one — but a register array lost to the crash resets some week's
    * maxima and inflates its denominator sum, which the estimate
    * `numerator/s` amplifies and the hash against q227's batch rollup
    * catches. Two of the four (tsm, event_id)-ordered files process
    * before the kill; the readout is each week's max-`seen` emission
    * across BOTH incarnations (Append mode through the fault-tolerant
    * parquet sink, per the [[Streaming.gridCount]] precedent — Complete
    * mode cannot recover through the file sink). This is the durable
    * form a 100 TB ingest needs: sketch registers that outlive any one
    * executor or driver. */
  val q339_recovery_hll: Q = (s, d) => {
    import s.implicits._
    val m = 256
    val bits = graft.llm.Hll.rhoBits(m)
    val ev = Tables.events(s, d).select(
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      expr("unix_millis(ts) div 86400000 div 7").as("week"),
      graft.llm.Hll.jCol(col("user_id"), m).as("j"),
      graft.llm.Hll.rhoCol(col("user_id"), m).cast("long").as("rho"))
    val srcDir = stageOrderedBy(ev, d, "eventsHllOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q339_rec_hll")(
      st => Streaming.hllSketch(st.as[Streaming.HllObs], m, bits).toDF(),
      ev.schema)
      .groupBy(col("week"))
      .agg(max(struct(col("seen"), col("s"), col("zero_registers"))).as("f"))
      .select(col("week"), col("f.seen").as("n_events"),
        (lit(graft.llm.Hll.numerator(m)) / col("f.s")).as("hll_estimate"),
        col("f.zero_registers"))
      .orderBy(col("week"))
  }
  /** Same oracle as the continuous streaming HLL cert. */
  val q339_sql: String = q234_sql

  /** q239's Count-Min row registers under CHECKPOINT RECOVERY — the
    * forty-first streaming cert, eighth recovery shape: each hash row's
    * w-counter array resumes from the state store and keeps absorbing
    * increments; counter adds are a +-monoid, so the recovered Σc² per
    * row — and the min-over-rows join-size estimate — must hash-match
    * q235's batch sketch exactly. A dropped or replayed pre-crash batch
    * shifts some counters, the squares amplify it, and the ratio against
    * the batch-exact self-join size breaks the hash. Two of the four
    * (k, lid, i)-ordered files process before the kill; Append-mode
    * emissions flow through the parquet sink's commit log, so only
    * batches committed by either incarnation count. */
  val q340_recovery_cms: Q = (s, d) => {
    import s.implicits._
    val depth = 3
    val width = 512
    val keys = Tables.lineitem(s, d).select(col("l_partkey").as("k"),
      (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("lid"))
    val ib = (0 until depth).map { i =>
      struct(lit(i.toLong).as("i"),
        graft.llm.Sketch.cmsBucket(i, col("k"), width).as("b"))
    }
    val obs = keys.select(col("k"), col("lid"), explode(array(ib: _*)).as("ib"))
      .select(col("ib.i").as("i"), col("ib.b").as("b"), col("k"), col("lid"))
    val srcDir = stageOrderedBy(obs, d, "lineitemCmsOrdered4", 4,
      Seq(col("k"), col("lid"), col("i")))
    val est = recoveringTable(s, srcDir, firstN = 2, tag = "q340_rec_cms")(
      st => Streaming.cmsRowSquares(st.as[Streaming.CmsObs], width).toDF(),
      obs.schema)
      .groupBy(col("i"))
      .agg(max(struct(col("seen"), col("e"))).as("f"))
      .agg(min(col("f.e")).as("cms_join_size"))
    val exact = Tables.lineitem(s, d).groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c")).as("exact_join_size"))
    exact.crossJoin(broadcast(est)) // 1 row x 1 row
      .withColumn("ratio_ppm",
        expr("cms_join_size * 1000000 div exact_join_size"))
  }
  /** Same oracle as the batch sketch estimate and the continuous cert. */
  val q340_sql: String = q239_sql

  /** q264's KMV distinct-cardinality sketch under CHECKPOINT RECOVERY —
    * the forty-second streaming cert, ninth recovery shape: the k-min
    * hash SET per source (≤ 64 longs) resumes from the store; the k-min
    * merge is commutative AND idempotent, so even a replayed arrival
    * cannot change the registers — but a LOST register set re-admits
    * hashes the pre-crash run had already evicted, shifts the k-th
    * minimum t, and breaks the integral estimate `(k−1)·2³² div t`
    * against the batch KMV oracle. Two of the four (doc_id, h)-ordered
    * token files process before the kill; the readout takes each
    * source's max-`seen` Append emission across both incarnations. */
  val q341_recovery_kmv: Q = (s, d) => {
    import s.implicits._
    val k = 64
    val toks = Tables.documents(s, d)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        explode(graft.llm.TextAnalysis.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), col("source"),
        graft.operators.Kmv.hash32(col("tok")).as("h"))
    val srcDir = stageOrderedBy(toks, d, "docsKmvOrdered4", 4,
      Seq(col("doc_id"), col("h")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q341_rec_kmv")(
      st => Streaming.kmvSketch(st.as[Streaming.KmvObs], k).toDF(),
      toks.schema)
      .groupBy(col("source"))
      .agg(max(struct(col("seen"), col("m"), col("t"))).as("f"))
      .select(col("source"), col("f.seen").as("n_obs"),
        when(col("f.m") < k, col("f.m"))
          .otherwise(expr(s"((${k - 1}) * 4294967296) div greatest(f.t, 1)"))
          .as("n_distinct_est"))
      .orderBy(col("source"))
  }
  /** Same oracle as the continuous streaming KMV cert. */
  val q341_sql: String = q264_sql

  /** q268's weighted priority SAMPLE under CHECKPOINT RECOVERY — the
    * forty-third streaming cert, TENTH recovery shape, and the first for
    * ORDER-STATISTICS state: the per-nation top-k (priority, id) winners
    * (the A-ES weighted-without-replacement sample) must survive the
    * restart. The top-k-by-total-order merge is commutative and
    * idempotent, so a correctly recovered run is indistinguishable — but
    * a winner list lost to the crash lets an inferior post-restart
    * candidate displace a pre-crash winner, and the final sample breaks
    * the hash against q125's batch sampler. Two of the four
    * (c_custkey)-ordered files process before the kill; the readout
    * takes each nation's max-`seen` emission (k bounded rows per nation
    * per batch) across both incarnations. A fair sample that outlives
    * any one executor is what makes always-on corpus sampling
    * operationally real. */
  val q344_recovery_priority: Q = (s, d) => {
    import s.implicits._
    val c = Tables.customer(s, d).where(col("c_acctbal") > 0)
      .select(col("c_custkey").cast("long").as("c_custkey"),
        col("c_nationkey").cast("long").as("c_nationkey"),
        round(col("c_acctbal") * 100, 0).cast("long").as("w_fp"))
      .withColumn("priority_fp",
        graft.llm.Sampling.priorityFp(col("c_custkey"), col("w_fp")))
      .select(col("c_nationkey"), col("c_custkey"), col("priority_fp"))
    val srcDir = stageOrderedBy(c, d, "customerPriOrdered4", 4,
      Seq(col("c_custkey")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q344_rec_pri")(
      st => Streaming.priorityTopK(st.as[Streaming.PriObs], 3).toDF(),
      c.schema)
      // last batch per nation via ONE window over the (bounded: k rows
      // per nation per emission) sink frame
      .withColumn("mx",
        max(col("seen")).over(Window.partitionBy(col("c_nationkey"))))
      .where(col("seen") === col("mx"))
      .select(col("c_nationkey"), col("rk"), col("c_custkey"),
        col("priority_fp"))
      .orderBy(col("c_nationkey"), col("rk"))
  }
  /** Same winners, same total order → q125's batch oracle verbatim. */
  val q344_sql: String = q268_sql

  /** The k-anonymity gate under CHECKPOINT RECOVERY — the forty-fourth
    * streaming cert and the ELEVENTH recovery shape, extending the
    * durable-state family to the privacy audits: the live class census
    * (one (seen, count) pair per (event_type, day) equivalence class —
    * calendar-bounded state, the [[Streaming.gridCount]] monoid with the
    * sensitive axis pinned to 0) is killed after two of the four staged
    * files and resumed by a new incarnation from the same checkpoint.
    * Counts are a +-monoid, so the readout (each class's max-`seen`
    * emission across both incarnations) must equal the batch census —
    * and the k-anonymity verdict is EXACTLY the place where recovery
    * bugs surface loudest: a class count reset by a lost checkpoint
    * looks like a small, suppressible class, flipping viol_classes /
    * suppress_ppm against q346's batch oracle. The verdict half is
    * [[PrivacyQueries.kAnonymityFromClasses]], shared with the batch
    * query — only the census provenance differs. */
  val q354_recovery_kanon: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("event_type").as("rf"),
      expr("datediff(cast(ts as date), date'1970-01-01')").cast("long")
        .as("a"),
      lit(0L).as("b"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"))
    val srcDir = stageOrderedBy(ev, d, "eventsKanonOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val cls = recoveringTable(s, srcDir, firstN = 2, tag = "q354_rec_kanon")(
      st => Streaming.gridCount(
        st.select(col("rf"), col("a"), col("b")).as[Streaming.CellObs]).toDF(),
      ev.schema)
      .groupBy(col("rf"), col("a"))
      .agg(max(struct(col("seen"), col("c"))).as("f"))
      .select(col("rf").as("g"),
        date_format(date_add(to_date(lit("1970-01-01")),
          col("a").cast("int")), "yyyy-MM-dd").as("day"),
        col("f.c").as("c"))
    PrivacyQueries.kAnonymityFromClasses(cls)
  }
  /** Same verdict, same census → q346's batch oracle verbatim. */
  val q354_sql: String = PrivacyQueries.q346_sql

  /** q356's HDR quantile registers under CHECKPOINT RECOVERY — the
    * forty-fifth streaming cert and the TWELFTH recovery shape: the
    * (count, min, max) register per (event_type, log-bucket) resumes
    * from the state store and keeps absorbing observations. All three
    * components are monoids, so the recovered registers — and every
    * percentile bracket the readout derives from them — must
    * hash-match q356's batch sketch exactly. This is the failure mode
    * that matters for a live percentile gauge: a register count reset
    * by a lost checkpoint shifts some bucket's cumulative rank and
    * silently moves a p99 into the wrong bucket, which the bracket
    * columns (lo/hi are registers too) make hash-visible. Two of the
    * four (g, b, v, event_id)-ordered files process before the kill;
    * the readout is each cell's max-`seen` emission across both
    * incarnations, fed to the SAME
    * [[HypothesisQueries.hdrQuantiles]] readout the batch query uses —
    * only the register provenance differs. */
  val q357_recovery_hdr: Q = (s, d) => {
    import s.implicits._
    // the fold is a pure monoid — insensitive to intra-file order — so
    // the staged split only has to be REPRODUCIBLE, which range-staging
    // on (g, b, v) makes it (duplicates land together; which file a
    // duplicate run straddles is fixed by the memoized staging).
    val staged = HypothesisQueries.hdrInput(s, d)
      .withColumn("lfp", graft.functions.Ilog2.ilog2(col("v")))
      .withColumn("b", expr("lfp div 8192"))
      .select(col("g"), col("b"), col("v"))
    val srcDir = stageOrderedBy(staged, d, "eventsHdrOrdered4", 4,
      Seq(col("g"), col("b"), col("v")))
    val reg = recoveringTable(s, srcDir, firstN = 2, tag = "q357_rec_hdr")(
      st => Streaming.hdrSketch(st.as[Streaming.HdrObs]).toDF(),
      staged.schema)
      .groupBy(col("g"), col("b"))
      .agg(max(struct(col("seen"), col("c"), col("lo"), col("hi"))).as("f"))
      .select(col("g"), col("b"), col("f.c").as("c"), col("f.lo").as("lo"),
        col("f.hi").as("hi"))
    HypothesisQueries.hdrQuantiles(s, reg)
  }
  /** Same registers, same readout → q356's batch oracle verbatim. */
  val q357_sql: String = HypothesisQueries.q356_sql

  /** The daily revenue register under CHECKPOINT RECOVERY, read out
    * through the Ljung–Box gate — the forty-sixth streaming cert and
    * THIRTEENTH recovery shape: [[Streaming.cellSum]] keeps one
    * (seen, Σcents) pair per (event_type, day) cell (calendar-bounded
    * state, the value-carrying sibling of the q354 census), killed
    * after two of the four staged files and resumed by a new
    * incarnation. Sums are a +-monoid, so the recovered daily frame —
    * and every autocorrelation and the Q statistic q362 derives from
    * it — must hash-match the batch oracle. This is the sharpest probe
    * of the register family: a single day's total shifted by a lost or
    * replayed batch perturbs EVERY lag's r_k through the shared mean
    * and denominator, so the whiteness verdict amplifies recovery bugs
    * the way the k-anonymity verdict amplifies census bugs. The readout
    * half is [[HypothesisQueries.ljungBox]], shared with the batch
    * query — only the daily-frame provenance differs. */
  val q369_recovery_dailysum: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("event_type").as("rf"),
      expr("unix_millis(ts) div 86400000").as("a"),
      expr("cast(round(value * 100) as bigint)").as("v"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"))
    val srcDir = stageOrderedBy(ev, d, "eventsDailySumOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val daily = recoveringTable(s, srcDir, firstN = 2,
      tag = "q369_rec_dailysum")(
      st => Streaming.cellSum(st.select(col("rf"), col("a"), col("v"))
        .as[Streaming.CellSumObs]).toDF(),
      ev.schema)
      .groupBy(col("rf"), col("a"))
      .agg(max(struct(col("seen"), col("s"))).as("f"))
      .select(col("rf").as("g"), col("a").as("day"), col("f.s").as("c"))
    HypothesisQueries.ljungBox(daily)
  }
  /** Same series, same readout → q362's batch oracle verbatim. */
  val q369_sql: String = HypothesisQueries.q362_sql

  /** q375's SPRT census under CHECKPOINT RECOVERY — the forty-seventh
    * streaming cert and FOURTEENTH recovery shape: the sequential
    * test's sufficient statistic is the (type, day, x) census — one
    * count per cell, [[Streaming.gridCount]] with the binary
    * k < 50 indicator as the grid's b axis — and it must survive the
    * restart exactly, because the SPRT's WHOLE point is the first
    * crossing day: a single day's count shifted by a lost or replayed
    * batch moves the cumulative log-likelihood walk and can move (or
    * erase) the crossing — the decision the monitor acted on. Two of
    * the four (tsm, event_id)-ordered files process before the kill;
    * the readout is each cell's max-`seen` census fed to the SAME
    * [[HypothesisQueries.sprtFromDailyCounts]] walk with the same
    * Ilog2-derived constants; oracle verbatim q375's. */
  val q376_recovery_sprt: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
        col("event_type").as("rf"),
        expr("unix_millis(ts) div 86400000").as("a"),
        expr("""case when cast(get_json_object(props, '$.k') as long) < 50
          then 1L else 0L end""").as("b"),
        unix_millis(col("ts")).as("tsm"),
        col("event_id").cast("long").as("event_id"))
      // Filter on the CASTED long, matching q375's sprtCells exactly: a
      // props.k present but non-castable must be DROPPED here too, or
      // this cert would count it as n0 while q375 never sees it.
      .where(expr("cast(get_json_object(props, '$.k') as long)").isNotNull)
    val srcDir = stageOrderedBy(ev, d, "eventsSprtOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    val cells = recoveringTable(s, srcDir, firstN = 2, tag = "q376_rec_sprt")(
      st => Streaming.gridCount(
        st.select(col("rf"), col("a"), col("b")).as[Streaming.CellObs]).toDF(),
      ev.schema)
      .groupBy(col("rf"), col("a"), col("b"))
      .agg(max(struct(col("seen"), col("c"))).as("f"))
      .groupBy(col("rf").as("g"), col("a").as("day"))
      .agg(sum(when(col("b") === 1L, col("f.c")).otherwise(0L)).as("n1"),
        sum(when(col("b") === 0L, col("f.c")).otherwise(0L)).as("n0"))
    HypothesisQueries.sprtFromDailyCounts(cells,
      HypothesisQueries.SprtInc1, HypothesisQueries.SprtInc0,
      HypothesisQueries.SprtThr)
  }
  /** Same census, same walk, same constants → q375's oracle verbatim. */
  val q376_sql: String = HypothesisQueries.q375_sql

  /** q212's CUSUM sentinel under CHECKPOINT RECOVERY — the forty-eighth
    * streaming cert and FIFTEENTH recovery shape, the first of the
    * round-11 verdict's change-DETECTION trio: the alerting state a
    * production ingest most needs durable is precisely the monitor that
    * fires pages. One long of state per user (the running max(0, ·)
    * statistic); a restart that reset it to zero would silently swallow
    * an in-progress drift accumulation — the alarm would fire late or
    * never, and nothing downstream could tell. Two of the four
    * (tsm, event_id)-ordered files process before the kill; the resumed
    * incarnation must continue every user's statistic exactly, so the
    * union of emissions hash-matches q207's batch `list_reduce` oracle
    * row-for-row (Append mode: exactly-once per observation). */
  val q377_recovery_cusum: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      round(abs(col("value")) * 10000).cast("long").as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsTsOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q377_rec_cusum")(
      st => Streaming.cusumDrift(st.as[Streaming.KeyedObs],
        k = 5000L, h = 30000L).toDF(), ev.schema)
      .select(col("user_id"), col("event_id"), col("x"), col("cusum"),
        col("alarm"))
      .orderBy(col("event_id"))
  }
  /** Identical recurrence + replay order → q212's oracle verbatim. */
  val q377_sql: String = StreamingQueries.q212_sql

  /** q218's pattern DFA under CHECKPOINT RECOVERY — the forty-ninth
    * streaming cert and SIXTEENTH recovery shape: the one recovery probe
    * whose state is an AUTOMATON position, not a numeric register. The
    * packed long (completions·10 + stage) must resume exactly — a state
    * machine restarted at zero forgets a half-completed
    * view→click→purchase funnel, so every post-crash completion count
    * for that user shifts; unlike a numeric drift the error never decays.
    * Two of the four staged files process before the kill; union of
    * emissions must hash-match q210's batch fold oracle. */
  val q378_recovery_dfa: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select(
      col("user_id").cast("long").as("user_id"),
      unix_millis(col("ts")).as("tsm"),
      col("event_id").cast("long").as("event_id"),
      when(col("event_type") === "view", 1L)
        .when(col("event_type") === "click", 2L)
        .when(col("event_type") === "purchase", 3L)
        .otherwise(0L).as("x"))
    val srcDir = stageOrderedBy(ev, d, "eventsTsCodeOrdered4", 4,
      Seq(col("tsm"), col("event_id")))
    recoveringTable(s, srcDir, firstN = 2, tag = "q378_rec_dfa")(
      st => Streaming.patternDfa(st.as[Streaming.KeyedObs]).toDF(), ev.schema)
      .select(col("user_id"), col("event_id"), col("x"), col("dfa"))
      .withColumn("completions", expr("dfa div 10"))
      .withColumn("stage", col("dfa") % 10)
      .orderBy(col("event_id"))
  }
  /** Same automaton, same replay order → q218's (= q210's) oracle. */
  val q378_sql: String = StreamingQueries.q218_sql

  /** q188's composition-drift scoreboard under CHECKPOINT RECOVERY — the
    * fiftieth streaming cert and SEVENTEENTH recovery shape. q188's
    * continuous cert maintains the (tick, source) histogram as a
    * Complete-mode built-in aggregate, which the fault-tolerant file
    * sink refuses — so, per the q339-q341 register precedent, the
    * recovery form restructures the SAME histogram as an Append-mode
    * [[Streaming.gridCount]] register fold ((source, tick) cells, count
    * monoid) whose per-cell max-`seen` emission survives the restart.
    * Two of the four doc_id-ranged files process before the kill; the
    * recovered histogram feeds the SAME
    * [[graft.llm.Drift.perTickDrift]] readout against the batch-fit
    * reference, and must hash-match q188's all-batch oracle — a lost or
    * replayed batch shifts a tick's composition and its TVD. */
  val q379_recovery_drift: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("source"))
    val (srcDir, _, _) = Stage.memo(d, "docsrc4") { dir =>
      docs.repartitionByRange(4, col("doc_id"))
        .write.mode("append").parquet(dir)
      (0L, 0L)
    }
    val hist = recoveringTable(s, srcDir, firstN = 2, tag = "q379_rec_drift")(
      st => Streaming.gridCount(st.select(
          col("source").as("rf"),
          expr("doc_id div 125").as("a"),
          lit(0L).as("b")).as[Streaming.CellObs]).toDF(),
      docs.schema)
      .groupBy(col("rf"), col("a"))
      .agg(max(struct(col("seen"), col("c"))).as("f"))
      .select(col("a").as("tick"), col("rf").as("value"),
        col("f.c").as("n"))
    val ref = Tables.documents(s, d)
      .groupBy(col("source").as("value"))
      .agg(count(lit(1)).as("n_ref"))
    graft.llm.Drift.perTickDrift(hist, ref)
      .orderBy(col("tick"))
  }
  /** Same histogram, same readout → q188's oracle verbatim. */
  val q379_sql: String = StreamingQueries.q188_sql

  /** q385's mixture weights under CHECKPOINT RECOVERY — the fifty-first
    * streaming cert and EIGHTEENTH recovery shape: the live form of
    * mixture planning keeps ONE durable register per source (cumulative
    * token count, a +-monoid via [[Streaming.cellSum]]) and derives the
    * √-temperature weights from the registers on demand. The restart
    * must not lose or replay a batch: the weights are a RATIO of
    * registers, so a single shifted count moves every source's weight
    * and boost — the readout feeds the SAME
    * [[LexicalQueries.sqrtMixtureFromCounts]] the batch query uses and
    * must hash-match q385's oracle verbatim. Two of the four
    * doc_id-ranged files process before the kill. */
  val q387_recovery_mixture: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("source"),
        graft.llm.TextAnalysis.wsTokenCount(col("text")).as("tk"))
    val (srcDir, _, _) = Stage.memo(d, "doctok4") { dir =>
      docs.repartitionByRange(4, col("doc_id"))
        .write.mode("append").parquet(dir)
      (0L, 0L)
    }
    val counts = recoveringTable(s, srcDir, firstN = 2,
      tag = "q387_rec_mixture")(
      st => Streaming.cellSum(st.select(
          col("source").as("rf"), lit(0L).as("a"), col("tk").as("v"))
        .as[Streaming.CellSumObs]).toDF(),
      docs.schema)
      .groupBy(col("rf"))
      .agg(max(struct(col("seen"), col("s"))).as("f"))
      .select(col("rf").as("source"), col("f.s").as("n_tok"))
    LexicalQueries.sqrtMixtureFromCounts(counts)
  }
  /** Same registers, same readout → q385's oracle verbatim. */
  val q387_sql: String = LexicalQueries.q385_sql

  /** q383's Benford digit census under CHECKPOINT RECOVERY — the
    * fifty-second streaming cert and NINETEENTH recovery shape: the
    * forensic gate as an always-on monitor keeps one durable
    * (type, first-digit) count register ([[Streaming.gridCount]],
    * ≤ 9·|types| cells) and derives the χ² verdict on demand. The χ²
    * is quadratic in the cell counts, so a batch lost or replayed
    * across the restart moves the statistic quadratically — and a type
    * whose every value is below 1 must STILL surface its fail-closed
    * NULL row, which here crosses the batch/stream boundary: the
    * universe comes from the batch relation, the census from the
    * recovered registers. Oracle verbatim q383's. */
  val q390_recovery_benford: Q = (s, d) => {
    import s.implicits._
    val rel = Tables.events(s, d).select(col("event_type").as("g"),
      expr("cast(round(value * 100) as bigint)").as("v"),
      col("event_id").cast("long").as("event_id"))
    val srcDir = stageOrderedBy(rel, d, "eventsBenfordOrdered4", 4,
      Seq(col("event_id")))
    val digits = recoveringTable(s, srcDir, firstN = 2,
      tag = "q390_rec_benford")(
      st => Streaming.gridCount(st
          .where(col("v") >= 1L)
          .select(col("g").as("rf"),
            substring(col("v").cast("string"), 1, 1).cast("long").as("a"),
            lit(0L).as("b"))
        .as[Streaming.CellObs]).toDF(),
      rel.schema)
      .groupBy(col("rf"), col("a"))
      .agg(max(struct(col("seen"), col("c"))).as("f"))
      .select(col("rf").as("g"), col("a").as("dg"), col("f.c").as("o"))
    LexicalQueries.benfordFromDigits(rel.select(col("g")).distinct(), digits)
  }
  /** Same census, same readout → q383's oracle verbatim. */
  val q390_sql: String = LexicalQueries.q383_sql

  val defs: Map[String, Q] = Map(
    "q390_recovery_benford" -> q390_recovery_benford,
    "q387_recovery_mixture" -> q387_recovery_mixture,
    "q379_recovery_drift" -> q379_recovery_drift,
    "q378_recovery_dfa" -> q378_recovery_dfa,
    "q377_recovery_cusum" -> q377_recovery_cusum,
    "q376_recovery_sprt" -> q376_recovery_sprt,
    "q369_recovery_dailysum" -> q369_recovery_dailysum,
    "q357_recovery_hdr" -> q357_recovery_hdr,
    "q354_recovery_kanon" -> q354_recovery_kanon,
    "q344_recovery_priority" -> q344_recovery_priority,
    "q341_recovery_kmv" -> q341_recovery_kmv,
    "q340_recovery_cms" -> q340_recovery_cms,
    "q339_recovery_hll" -> q339_recovery_hll,
    "q335_recovery_kendall" -> q335_recovery_kendall,
    "q333_stream_kendall" -> q333_stream_kendall,
    "q323_recovery_join" -> q323_recovery_join,
    "q322_recovery_sessions" -> q322_recovery_sessions,
    "q315_recovery_moments" -> q315_recovery_moments,
    "q314_recovery_hw" -> q314_recovery_hw,
    "q313_recovery_ewma" -> q313_recovery_ewma,
    "q307_stream_moments" -> q307_stream_moments,
    "q303_stream_funnel" -> q303_stream_funnel,
    "q295_stream_retention" -> q295_stream_retention,
    "q229_stream_attribution" -> q229_stream_attribution,
    "q232_stream_covisit" -> q232_stream_covisit,
    "q234_stream_hll" -> q234_stream_hll,
    "q239_stream_cms" -> q239_stream_cms,
    "q246_stream_concurrency" -> q246_stream_concurrency,
    "q264_stream_kmv" -> q264_stream_kmv,
    "q265_stream_holt" -> q265_stream_holt,
    "q268_stream_priority_sample" -> q268_stream_priority_sample,
    "q278_stream_nb" -> q278_stream_nb,
    "q284_stream_hw" -> q284_stream_hw)

  val oracles: Map[String, String] = Map(
    "q390_recovery_benford" -> q390_sql,
    "q387_recovery_mixture" -> q387_sql,
    "q379_recovery_drift" -> q379_sql,
    "q378_recovery_dfa" -> q378_sql,
    "q377_recovery_cusum" -> q377_sql,
    "q376_recovery_sprt" -> q376_sql,
    "q369_recovery_dailysum" -> q369_sql,
    "q357_recovery_hdr" -> q357_sql,
    "q354_recovery_kanon" -> q354_sql,
    "q344_recovery_priority" -> q344_sql,
    "q341_recovery_kmv" -> q341_sql,
    "q340_recovery_cms" -> q340_sql,
    "q339_recovery_hll" -> q339_sql,
    "q335_recovery_kendall" -> q335_sql,
    "q333_stream_kendall" -> q333_sql,
    "q323_recovery_join" -> q323_sql,
    "q322_recovery_sessions" -> q322_sql,
    "q315_recovery_moments" -> q315_sql,
    "q314_recovery_hw" -> q314_sql,
    "q313_recovery_ewma" -> q313_sql,
    "q307_stream_moments" -> q307_sql,
    "q303_stream_funnel" -> q303_sql,
    "q295_stream_retention" -> q295_sql,
    "q229_stream_attribution" -> q229_sql,
    "q232_stream_covisit" -> q232_sql,
    "q234_stream_hll" -> q234_sql,
    "q239_stream_cms" -> q239_sql,
    "q246_stream_concurrency" -> q246_sql,
    "q264_stream_kmv" -> q264_sql,
    "q265_stream_holt" -> q265_sql,
    "q268_stream_priority_sample" -> q268_sql,
    "q278_stream_nb" -> q278_sql,
    "q284_stream_hw" -> q284_sql)
}
