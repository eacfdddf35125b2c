package graft

import graft.llm.{NearestCodeL2, Pq}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

class PqSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 2
  private val ksub = 2

  // 4 vectors; the 2 smallest-id ones become the codebook entries
  private def corpus = Seq(
    (0L, Array(0f, 0f, 0f, 0f, 10f, 10f, 10f, 10f)),
    (1L, Array(5f, 5f, 5f, 5f, -3f, -3f, -3f, -3f)),
    (2L, Array(0.4f, 0.1f, -0.2f, 0f, 9f, 11f, 10f, 10f)), // near v0 in both halves
    (3L, Array(4.8f, 5.1f, 5f, 5f, 9.9f, 10f, 10.1f, 10f)) // near v1 / near v0
  ).toDF("vec_id", "embedding")

  test("codebooks are the subvector slices of the smallest-id vectors") {
    val cb = Pq.codebooks(corpus, m, ksub, dim).orderBy("subspace", "code")
      .as[(Int, Int, Array[Double])].collect()
    assert(cb.length == m * ksub)
    assert(cb(0)._3.toSeq == Seq(0d, 0d, 0d, 0d))      // subspace 0, code 0 = v0 head
    assert(cb(1)._3.toSeq == Seq(5d, 5d, 5d, 5d))      // subspace 0, code 1 = v1 head
    assert(cb(2)._3.toSeq == Seq(10d, 10d, 10d, 10d))  // subspace 1, code 0 = v0 tail
    assert(cb(3)._3.toSeq == Seq(-3d, -3d, -3d, -3d))  // subspace 1, code 1 = v1 tail
  }

  test("encode assigns each subspace to its nearest codebook entry") {
    val cb = Pq.codebooks(corpus, m, ksub, dim)
    val codes = Pq.encode(corpus, cb, m, dim)
      .select($"vec_id", $"codes").as[(Long, Array[Int])]
      .collect().sortBy(_._1).map(_._2.toSeq)
    assert(codes(0) == Seq(0, 0)) // v0 is a codebook row — exact match
    assert(codes(1) == Seq(1, 1))
    assert(codes(2) == Seq(0, 0)) // near v0 in both halves
    assert(codes(3) == Seq(1, 0)) // head near v1, tail near v0
  }

  test("decode reconstructs the selected codebook slices, full width") {
    val cb = Pq.codebooks(corpus, m, ksub, dim)
    val dec = Pq.decode(Pq.encode(corpus, cb, m, dim), cb, m, dim)
      .select($"vec_id", $"approx").as[(Long, Array[Double])]
      .collect().sortBy(_._1).map(_._2.toSeq)
    assert(dec.forall(_.length == dim))
    assert(dec(2) == Seq(0d, 0d, 0d, 0d, 10d, 10d, 10d, 10d))
    assert(dec(3) == Seq(5d, 5d, 5d, 5d, 10d, 10d, 10d, 10d))
  }

  test("encode is stable under repartitioning (no partition-order dependence)") {
    val cb = Pq.codebooks(corpus, m, ksub, dim)
    val a = Pq.encode(corpus, cb, m, dim)
      .select($"vec_id", $"codes").as[(Long, Array[Int])].collect()
      .sortBy(_._1).map(_._2.toSeq).toSeq
    val b = Pq.encode(corpus.repartition(7), cb, m, dim)
      .select($"vec_id", $"codes").as[(Long, Array[Int])].collect()
      .sortBy(_._1).map(_._2.toSeq).toSeq
    assert(a == b)
  }

  test("packCodes/unpackCodes round-trip the code vector (16-bit storage form)") {
    val cb = Pq.codebooks(corpus, m, ksub, dim)
    val enc = Pq.encode(corpus, cb, m, dim)
    val rt = enc.select($"vec_id", $"codes",
        Pq.unpackCodes(Pq.packCodes($"codes", m, ksub), m, ksub).as("rt"))
      .as[(Long, Array[Int], Array[Int])].collect()
    rt.foreach { case (id, codes, back) =>
      assert(back.toSeq == codes.toSeq, s"vec $id") }
    // packed form is compact: fits in m * ceil(log2 ksub) bits
    val maxPacked = enc.select(Pq.packCodes($"codes", m, ksub).as("p"))
      .agg(max($"p")).as[Int].head()
    assert(maxPacked < (1 << 2))  // m=2, ksub=2 -> 2 bits total
  }

  test("packCodes/unpackCodes round-trip for non-power-of-two ksub (b-bit mask, not ksub-1)") {
    // ksub=10 -> b=4; code 6 (0b0110) would be corrupted by a ksub-1 mask (0b1001)
    val codes = Seq((1L, Array(6, 9, 0))).toDF("id", "codes")
    val back = codes.select(
        Pq.unpackCodes(Pq.packCodes($"codes", 3, 10), 3, 10).as("rt"))
      .as[Array[Int]].head()
    assert(back.toSeq == Seq(6, 9, 0))
  }

  test("NearestCodeL2 ties keep the lowest code; guards name the contract") {
    val vec = new GenericArrayData(Array[Double](1, 1))
    val flatTie = new GenericArrayData(Array[Double](2, 2, 2, 2)) // identical entries
    assert(NearestCodeL2.impl(vec, flatTie, 0, 2) == 0)
    val short = new GenericArrayData(Array[Double](1))
    val eEmpty = intercept[IllegalArgumentException] {
      NearestCodeL2.impl(vec, new GenericArrayData(Array.empty[Double]), 0, 2)
    }
    assert(eEmpty.getMessage.contains("empty codebook"))
    val eShort = intercept[IllegalArgumentException] {
      NearestCodeL2.impl(short, flatTie, 0, 2)
    }
    assert(eShort.getMessage.contains("fixed-width"))
  }
}
