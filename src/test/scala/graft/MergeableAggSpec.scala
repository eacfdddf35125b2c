package graft

import org.apache.spark.sql.functions._

import graft.llm.Hll

/** Unit coverage for the mergeable-aggregate round: 64-bit-word bitmap
  * distinct (word-boundary ids, cross-period dedup), HLL register-merge
  * associativity (merge-of-sketches == sketch-of-union), and the
  * co-visitation lookahead gate — all on crafted inputs.
  */
class MergeableAggSpec extends SparkSpec {
  import spark.implicits._

  private def bitmapDistinct(rows: Seq[(Long, Long)]): Map[Long, Long] = {
    // (period, id) -> per-period distinct via word bitmaps
    val words = rows.toDF("p", "id")
      .select(col("p"), expr("id div 64").as("word"),
        expr("shiftleft(1L, cast(id % 64 as int))").as("bit"))
      .groupBy(col("p"), col("word")).agg(expr("bit_or(bit)").as("bits"))
    words.groupBy(col("p")).agg(sum(expr("bit_count(bits)")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bitmap distinct: word-boundary ids and duplicates count exactly") {
    // ids 0, 63 (word 0), 64, 127 (word 1), 64 repeated -> 4 distinct
    val got = bitmapDistinct(Seq((1L, 0L), (1L, 63L), (1L, 64L),
      (1L, 127L), (1L, 64L)))
    assert(got(1L) == 4L)
  }

  test("bitmap rollup: bit_or of period words dedups across periods") {
    val rows = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)).toDF("p", "id")
    val words = rows
      .select(col("p"), expr("id div 64").as("word"),
        expr("shiftleft(1L, cast(id % 64 as int))").as("bit"))
      .groupBy(col("p"), col("word")).agg(expr("bit_or(bit)").as("bits"))
    // roll both periods up from the word frame, never the raw rows
    val total = words.groupBy(col("word")).agg(expr("bit_or(bits)").as("bits"))
      .agg(sum(expr("bit_count(bits)"))).head().getLong(0)
    assert(total == 3L) // {1,2,3}, id 2 deduped across periods
  }

  test("hll merge: register-wise max of day sketches == sketch of the union") {
    val m = 64
    def regs(keys: Seq[String]): Map[Long, Int] =
      keys.toDF("k")
        .select(Hll.jCol(col("k"), m).as("j"), Hll.rhoCol(col("k"), m).as("rho"))
        .groupBy("j").agg(max("rho").as("rho"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val day1 = (1 to 40).map(i => s"u$i")
    val day2 = (30 to 70).map(i => s"u$i") // overlaps day1
    val merged = (regs(day1).toSeq ++ regs(day2).toSeq)
      .groupBy(_._1).map { case (j, vs) => j -> vs.map(_._2).max }
    assert(merged == regs(day1 ++ day2))
  }

  test("streaming hllSketch: registers accumulate across batches, order-free") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val m = 16
    val bits = 32 - Integer.numberOfTrailingZeros(m)
    val mem = MemoryStream[graft.streaming.Streaming.HllObs]
    val q = graft.streaming.Streaming.hllSketch(mem.toDS(), m, bits)
      .writeStream.format("memory").queryName("hll_test")
      .outputMode("append").start()
    try {
      mem.addData(graft.streaming.Streaming.HllObs(1L, 3L, 5L),
        graft.streaming.Streaming.HllObs(1L, 7L, 2L))
      q.processAllAvailable()
      // batch 2: same register j=3 with smaller rho (ignored) + new j=9
      mem.addData(graft.streaming.Streaming.HllObs(1L, 3L, 4L),
        graft.streaming.Streaming.HllObs(1L, 9L, 1L))
      q.processAllAvailable()
      val last = spark.table("hll_test").where(col("seen") === 4L)
        .collect().map(r => (r.getAs[Long]("s"), r.getAs[Long]("zero_registers")))
      // registers: j3=5, j7=2, j9=1, 13 zeros
      val expS = (1L << (bits + 1 - 5)) + (1L << (bits + 1 - 2)) +
        (1L << (bits + 1 - 1)) + 13L * (1L << (bits + 1))
      assert(last.toSeq == Seq((expS, 13L)))
    } finally q.stop()
  }

  test("cms self-join size: exact on collision-free keys, never underestimates") {
    val keys = (1 to 20).flatMap(k => Seq.fill(k % 3 + 1)(k.toLong))
      .toDF("k") // counts 1..3 per key
    val width = 64
    val depth = 3
    val ib = (0 until depth).map { i =>
      struct(lit(i).as("i"),
        graft.llm.Sketch.cmsBucket(i, col("k"), width).as("b"))
    }
    val est = keys.select(explode(array(ib: _*)).as("ib"))
      .select(col("ib.i").as("i"), col("ib.b").as("b"))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))
      .groupBy("i").agg(sum(col("c") * col("c")).as("e"))
      .agg(min("e")).head().getLong(0)
    val exact = keys.groupBy("k").agg(count(lit(1)).as("c"))
      .agg(sum(col("c") * col("c"))).head().getLong(0)
    assert(est >= exact) // row sums only collide upward
    assert(est <= exact * 3) // sane at this density
  }

  test("covisitation gate: pairs beyond the lookahead window are dropped") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("tsm"), col("id"))
    // user 1: a@0 -> b@10 (in), c@2_000_000 (beyond 30 min from a AND b)
    val ev = Seq((1L, 0L, 1L, "a"), (1L, 10L, 2L, "b"),
      (1L, 2000000L, 3L, "c")).toDF("u", "tsm", "id", "t")
    val pairs = (1 to 3).map { k =>
      ev.withColumn("b", lead(col("t"), k).over(w))
        .withColumn("bt", lead(col("tsm"), k).over(w))
        .where(col("b").isNotNull && col("bt") <= col("tsm") + 1800000L)
        .select(col("t").as("a"), col("b"))
    }.reduce(_ unionAll _)
    val got = pairs.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "b"))) // c arrives too late for both a and b
  }
}
