package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-code argmin (squared L2) over a packed codebook — the encode
  * kernel of product quantization ([[Pq]]).
  *
  * Like [[NearestCell]] but (a) the metric is squared Euclidean distance
  * (the standard PQ sub-quantizer objective; cosine is meaningless on
  * subvectors, whose norms carry reconstruction information) and (b) the
  * expression reads a WINDOW of the input vector (`offset until
  * offset+subDim`) so per-subspace encoding needs no `slice` — m encodes
  * of one row touch the row's array in place, zero per-row allocation.
  *
  * Arguments: `left` array<double> (the row's full vector), `right`
  * array<double> (the subspace's ksub centroids concatenated, length
  * ksub·subDim); `offset`/`subDim` are plan-time constants baked into the
  * generated call. Returns the 0-based code of the argmin centroid.
  *
  * Bit-parity contract (mirrors the DuckDB oracle): the distance is a
  * left-to-right fold from 0.0 of `diff*diff` terms (`0.0 + t1 == t1`, so
  * it equals DuckDB's `list_reduce` over the diff-squared list);
  * comparisons use `java.lang.Double.compare` (Spark SQL double ordering)
  * and STRICT improvement keeps the lowest code on exact ties.
  */
case class NearestCodeL2(left: Expression, right: Expression, offset: Int, subDim: Int)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(vec: Any, flat: Any): Any =
    NearestCodeL2.impl(vec.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      offset, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, flat) =>
      s"${ev.value} = graft.llm.NearestCodeL2.impl($vec, $flat, $offset, $subDim);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCodeL2 =
    copy(left = newLeft, right = newRight)
}

object NearestCodeL2 {

  /** Called directly from generated code — one JIT-friendly loop. Fails
    * fast with errors that name the contract violation (an out-of-range
    * read inside generated code would surface as a baffling
    * ArrayIndexOutOfBounds with no operator context). */
  def impl(vec: ArrayData, flat: ArrayData, offset: Int, subDim: Int): Int = {
    if (subDim <= 0)
      throw new IllegalArgumentException(
        s"NearestCodeL2: subDim must be positive (got $subDim)")
    val ksub = flat.numElements() / subDim
    if (ksub == 0)
      throw new IllegalArgumentException(
        "NearestCodeL2: empty codebook; Pq.codebooks needs a non-empty corpus")
    if (vec.numElements() < offset + subDim)
      throw new IllegalArgumentException(
        s"NearestCodeL2: vector has ${vec.numElements()} elements but subspace " +
          s"window is [$offset, ${offset + subDim}); embedding columns must be fixed-width")
    var bestCode = 0
    var best = 0.0d
    var c = 0
    while (c < ksub) {
      var d = 0.0d
      val off = c * subDim
      var i = 0
      while (i < subDim) {
        val t = vec.getDouble(offset + i) - flat.getDouble(off + i)
        d += t * t
        i += 1
      }
      // Double.compare == Spark SQL double ordering; strict < keeps the
      // lowest code on exact ties (matches the oracle's `dist ASC, code ASC`)
      if (c == 0 || java.lang.Double.compare(d, best) < 0) {
        best = d; bestCode = c
      }
      c += 1
    }
    bestCode
  }

  /** Column-API form. */
  def nearestCode(vec: Column, flat: Column, offset: Int, subDim: Int): Column =
    ColumnBridge.column(NearestCodeL2(
      ColumnBridge.expression(vec),
      ColumnBridge.expression(flat),
      offset, subDim))
}
