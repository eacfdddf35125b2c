package graft

import org.apache.spark.sql.functions._

import graft.llm.{CmsAgg, Hll, HllAgg, Sketch}

/** Sketch operators: the typed-Aggregator builders must agree exactly with
  * the Column/groupBy forms (same md5 hash family), and the estimates must
  * honor their theoretical contracts (CMS never underestimates; HLL raw
  * estimate within a generous error band at this m). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("CmsAgg buckets equal the Column-form groupBy counters") {
    val depth = 3; val width = 64
    val keys = (1 to 500).map(i => s"k${i % 37}")
    val ds = keys.toDS()
    val sketch = ds.select(new CmsAgg(depth, width).toColumn).head()

    // Column form: every (row i, bucket) counter as a groupBy over d copies.
    val expected = new Array[Long](depth * width)
    (0 until depth).foreach { i =>
      ds.toDF("k").groupBy(Sketch.cmsBucket(i, col("k"), width).as("b"))
        .count().collect()
        .foreach(r => expected(i * width + r.getLong(0).toInt) = r.getLong(1))
    }
    assert(sketch.toSeq == expected.toSeq)
  }

  test("CMS estimate never underestimates and is exact sans collisions") {
    val depth = 4; val width = 2048
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val sketch = df.select(col("l_partkey").cast("string")).as[String]
      .select(new CmsAgg(depth, width).toColumn).head()
    val rows = df.groupBy(col("l_partkey").as("key")).agg(count(lit(1)).as("exact"))
      .withColumn("est", Sketch.cmsEstimate(sketch, depth, width, col("key")))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) >= r.getLong(1),
      s"CMS underestimated key ${r.get(0)}: est ${r.getLong(2)} < exact ${r.getLong(1)}"))
    // total mass per hash row is conserved: sum of any row's counters == n
    val n = df.count()
    (0 until depth).foreach { i =>
      assert(sketch.slice(i * width, (i + 1) * width).sum == n)
    }
  }

  test("HllAgg registers equal the Column-form groupBy registers") {
    val m = 64
    val keys = (1 to 1000).map(i => s"id-${i % 333}")
    val ds = keys.toDS()
    val agg = ds.select(new HllAgg(m).toColumn).head()

    val colForm = new Array[Byte](m)
    ds.toDF("k")
      .groupBy(Hll.jCol(col("k"), m).as("j"))
      .agg(max(Hll.rhoCol(col("k"), m)).as("r"))
      .collect()
      .foreach(r => colForm(r.getLong(0).toInt) = r.getInt(1).toByte)
    assert(agg.toSeq == colForm.toSeq)
  }

  test("HLL raw estimate lands within the expected error band") {
    val m = 256
    val trueN = 5000
    val ds = (1 to trueN).map(i => s"user-$i").toDS()
    val regs = ds.select(new HllAgg(m).toColumn).head()
    val S = regs.map(r => 1L << (Hll.rhoBits(m) + 1 - r)).sum
    val est = Hll.numerator(m) / S
    // standard error 1.04/sqrt(256) = 6.5%; assert within 4 sigma
    assert(math.abs(est - trueN) < trueN * 0.26, s"estimate $est vs $trueN")
  }

  test("HLL merge of disjoint sketches equals sketch of the union") {
    val m = 64
    val a = (1 to 400).map(i => s"a$i").toDS().select(new HllAgg(m).toColumn).head()
    val b = (1 to 400).map(i => s"b$i").toDS().select(new HllAgg(m).toColumn).head()
    val union = ((1 to 400).map(i => s"a$i") ++ (1 to 400).map(i => s"b$i"))
      .toDS().select(new HllAgg(m).toColumn).head()
    val merged = new HllAgg(m).merge(a, b)
    assert(merged.toSeq == union.toSeq)
  }

  test("bloom prefilter semi join is value-identical to the plain semi join") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .filter(col("s_nationkey") === 3).select("s_suppkey")
    val viaBloom = graft.operators.BloomPrefilter
      .semiJoinWithBloom(li, "l_suppkey", supp, "s_suppkey", 1000L, 0.03)
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().toSeq
    val plain = li.join(supp, col("l_suppkey") === col("s_suppkey"), "left_semi")
      .agg(count(lit(1)), sum(col("l_orderkey"))).collect().toSeq
    assert(viaBloom == plain)
    assert(plain.head.getLong(0) > 0, "empty semi join — test data assumption broken")
  }

  test("bloom prefilter with an empty dim yields an empty result, not an NPE") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val none = spark.read.parquet(s"$sf/supplier.parquet")
      .filter(col("s_suppkey") < 0).select("s_suppkey")
    val out = graft.operators.BloomPrefilter
      .semiJoinWithBloom(li, "l_suppkey", none, "s_suppkey", 1000L)
    assert(out.count() == 0)
    assert(out.schema == li.schema)
  }
}
