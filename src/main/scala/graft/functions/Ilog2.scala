package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Fixed-point base-2 logarithm of a positive BIGINT, libm-free — the
  * primitive that makes information-theoretic scoring (entropy, Naive
  * Bayes log-likelihoods, cross-entropy / perplexity) CERTIFIABLE
  * across engines. `log(double)` answers differ between libm builds in
  * the last ulp, and those ulps flip a floor/hash; this expression is
  * pure 64-bit integer arithmetic, so every engine that can shift and
  * multiply replays it exactly (the DuckDB rendering is
  * [[Ilog2.sqlReplay]]).
  *
  * Algorithm (classic shift-and-square): the integer part is
  * `bitLength(x) − 1`; for the fraction, normalize the mantissa to
  * [1, 2) in 20-bit fixed point and square it 16 times — each squaring
  * doubles the remaining exponent, so "did it reach 2" yields the next
  * fractional bit. Output is log2(x) in **16-bit fixed point**
  * (`result / 65536.0 ≈ log2(x)`, absolute error < 1e-4 — truncation
  * only, deterministic). Max output fits comfortably in an int:
  * 63 · 65536.
  *
  * Input must be ≥ 1 (counts + smoothing in every call site); zero or
  * negative throws, mirroring the sssp non-negative-weight guard style.
  * Null propagates.
  */
case class Ilog2(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Ilog2.impl(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.Ilog2.impl($c);".toString)

  override protected def withNewChildInternal(newChild: Expression): Ilog2 =
    copy(child = newChild)
}

object Ilog2 {
  /** Fractional bits in the output fixed point. */
  val FracBits = 16
  /** Scale factor: one unit of log2 = 2^16 = 65536. */
  val One: Long = 1L << FracBits

  /** Called directly from generated code. ~16 multiply/shift pairs. */
  def impl(x: Long): Long = {
    require(x >= 1, s"ilog2 requires x >= 1 (got $x)")
    val bl = 64 - java.lang.Long.numberOfLeadingZeros(x)
    var m = if (bl <= 21) x << (21 - bl) else x >> (bl - 21)
    var a = 0L
    var i = 0
    while (i < FracBits) {
      val t = (m * m) >> 20
      if (t >= (1L << 21)) { a = a * 2 + 1; m = t >> 1 }
      else { a = a * 2; m = t }
      i += 1
    }
    ((bl - 1).toLong << FracBits) + a
  }

  /** Column-API form of the native expression. */
  def ilog2(c: Column): Column =
    ColumnBridge.column(Ilog2(ColumnBridge.expression(c)))

  /** The DuckDB rendering of the SAME shift-and-square fold, for oracle
    * SQL generation: state is one BIGINT packing (mantissa << 16 | acc)
    * folded over a 16-element dummy list. `x` is spliced verbatim (use a
    * CTE-bound column name, not a subquery). Verified value-exact
    * against [[impl]] on 1..300 plus 2^40, 2^62, 2^63−1. */
  def sqlReplay(x: String): String =
    s"""((length(bin($x)) - 1)::BIGINT * 65536 + (list_reduce(
       |  list_prepend((CASE WHEN length(bin($x)) <= 21
       |    THEN $x << (21 - length(bin($x)))
       |    ELSE $x >> (length(bin($x)) - 21) END) * 65536,
       |  list_transform(range(16), i -> 0::BIGINT)),
       |  (s, e) -> CASE WHEN ((s // 65536) * (s // 65536)) // 1048576 >= 2097152
       |    THEN ((((s // 65536) * (s // 65536)) // 1048576) // 2) * 65536 + (s % 65536) * 2 + 1
       |    ELSE (((s // 65536) * (s // 65536)) // 1048576) * 65536 + (s % 65536) * 2 END
       |) % 65536))""".stripMargin
}
