package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Vector dot product as a native codegen Catalyst expression — the hot
  * kernel of every similarity operator ([[Similarity]], [[Ivf]]).
  *
  * Why not composition (measured on 125k candidate pairs, dim=64):
  *  - unrolling `e1*f1 + e2*f2 + …` into a flat expression is fast ONLY
  *    while it stays inside whole-stage codegen; in join conditions and
  *    post-join projections the ~320-node tree falls back to interpreted
  *    `eval` and costs ~40 µs/pair (5 s for the batch);
  *  - the `aggregate(zip_with(…))` higher-order fold is ~1.7 s — linear,
  *    but still per-element interpreted dispatch;
  *  - this expression is one static call into a tight JIT'd loop: O(1)
  *    tree size, fast under codegen AND under interpreted eval, usable in
  *    join conditions where WSCG doesn't reach.
  *
  * Bit-parity contract (same as [[Similarity.dot]]'s docs): left-to-right
  * accumulation from 0.0 over double-cast elements — identical to the
  * unrolled sum, the HOF fold, and the DuckDB oracle's `list_reduce`.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.impl(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.llm.DotProduct.impl($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {

  /** Called directly from generated code — one JIT-friendly loop.
    * Length-mismatched inputs FAIL FAST: silently truncating to the shorter
    * vector would produce a plausible-but-wrong dot product on malformed
    * rows (the zip_with form surfaced such rows as NULL; an expression that
    * hides them would be a silent-corruption regression). */
  def impl(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"DotProduct: vector length mismatch ($n vs ${b.numElements()}); " +
          "embedding columns must be fixed-width")
    var s = 0.0d
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Column-API form; inputs are cast to array<double> (a no-op when they
    * already are). */
  def dotNative(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a.cast("array<double>")),
      ColumnBridge.expression(b.cast("array<double>"))))
}
