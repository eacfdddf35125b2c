package graft

import graft.operators.Scd2
import graft.functions.ZOrder
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def dim = Seq(
    // key 1: one closed + one open row
    (1L, "a-v1", java.sql.Date.valueOf("1992-01-01"), java.sql.Date.valueOf("1994-01-01")),
    (1L, "a-v2", java.sql.Date.valueOf("1994-01-01"), null.asInstanceOf[java.sql.Date]),
    // key 2: open only, untouched by changes
    (2L, "b-v1", java.sql.Date.valueOf("1992-01-01"), null.asInstanceOf[java.sql.Date])
  ).toDF("k", "attr", "valid_from", "valid_to")

  private def changes = Seq(
    (1L, "a-v3", java.sql.Date.valueOf("1995-06-17")), // update: closes a-v2
    (9L, "new", java.sql.Date.valueOf("1995-06-17"))   // insert: no row to close
  ).toDF("k", "attr", "effective")

  test("merge closes only the affected open rows and appends new versions") {
    val got = Scd2.merge(dim, changes, "k")
      .select($"k", $"attr", $"valid_from".cast("string"), $"valid_to".cast("string"))
      .as[(Long, String, String, String)].collect().toSet
    assert(got == Set(
      (1L, "a-v1", "1992-01-01", "1994-01-01"), // closed history untouched
      (1L, "a-v2", "1994-01-01", "1995-06-17"), // open row closed at effective
      (1L, "a-v3", "1995-06-17", null),         // new version open
      (2L, "b-v1", "1992-01-01", null),         // unaffected open row
      (9L, "new", "1995-06-17", null)))         // insert
  }

  test("merge rejects a change batch whose columns don't match the contract") {
    val bad = Seq((1L, java.sql.Date.valueOf("1995-06-17"))).toDF("k", "effective")
    val e = intercept[IllegalArgumentException] { Scd2.merge(dim, bad, "k") }
    assert(e.getMessage.contains("changes must carry exactly"))
  }

  test("zValue interleaves bits (x even positions, y odd) and stays in codegen range") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("x", "y")
      .select(ZOrder.zValue($"x", $"y", 10).as("z"))
      .as[Long].collect().toSeq
    // interleave(3=0b011, 5=0b101) = x bits at 0,2 + y bits at 1,5 = 0b100111 = 39
    assert(got == Seq(0L, 1L, 2L, 39L, (1L << 20) - 1))
  }

  test("zValue round-trips: deinterleaving recovers (x, y) for 200 pseudorandom points") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until bits).foreach { i =>
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
      }
      (x, y)
    }
    val pts = (0 until 200).map { i =>
      // deterministic pseudorandom 10-bit coords
      (((i * 2654435761L) >>> 7) & 1023L, ((i * 40503L) >>> 3) & 1023L)
    }
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", 10).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(deinterleave(z, 10) == ((x, y)), s"z=$z for ($x,$y)")
      assert(z >= 0 && z < (1L << 20))
    }
  }

  test("zValue rejects widths that would overflow a positive long") {
    val e = intercept[IllegalArgumentException] { ZOrder.zValue(lit(1), lit(1), 32) }
    assert(e.getMessage.contains("bits"))
  }
}
