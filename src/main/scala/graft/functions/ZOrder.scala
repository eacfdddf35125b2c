package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve key: interleave the low `bits` bits of two
  * non-negative dimension values so that points close in BOTH dimensions
  * get close keys. Sorting / range-partitioning a table by this key makes
  * every file's min/max footer stats TIGHT in both dimensions at once —
  * the multi-dimensional data-skipping layout (a one-dimensional sort
  * gives tight stats only in the leading column; any predicate on the
  * other column scans everything).
  *
  * Built from plain bitwise Column arithmetic (shift/and/or), so the whole
  * key stays inside whole-stage codegen and — at write time — feeds
  * `repartitionByRange(zkey)` directly: layout is a property of the write,
  * not a new operator. `bits ≤ 31` keeps the interleaved key in a positive
  * long.
  */
object ZOrder {

  /** The Morton key of `(x, y)`: bit i of x lands at position 2i, bit i of
    * y at 2i+1. Inputs must already be non-negative ints of ≤ `bits` bits
    * (bin or mod first — binning choice is the caller's resolution dial). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1,31] (got $bits)")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftrightunsigned(xs, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftrightunsigned(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }
}
