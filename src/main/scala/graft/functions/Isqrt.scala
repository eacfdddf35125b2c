package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Exact integer square root ⌊√x⌋ of a non-negative BIGINT, libm-free —
  * the primitive that makes dispersion statistics (standard deviation,
  * coefficient of variation, z-score bands, Wilson bounds) CERTIFIABLE
  * across engines, the same role [[Ilog2]] plays for entropy:
  * `sqrt(double)` is correctly rounded per IEEE but the surrounding
  * casts and floors differ between engines once the radicand exceeds
  * 2⁵³; this expression is pure 64-bit integer arithmetic with an exact
  * contract — `r² ≤ x < (r+1)²` — so every engine replays it bit-for-bit
  * (the DuckDB rendering is [[Isqrt.sqlReplay]]).
  *
  * Algorithm: seed from `Math.sqrt` (within 1 of the truth for every
  * representable long, since the root is < 2³² and the double error is
  * sub-ulp at that magnitude), then clamp with at most two integer
  * corrections — branch-predictable, no loop. Negative input throws
  * (mirroring [[Ilog2]]'s domain guard); null propagates.
  */
case class Isqrt(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(input: Any): Any =
    Isqrt.impl(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.Isqrt.impl($c);".toString)

  override protected def withNewChildInternal(newChild: Expression): Isqrt =
    copy(child = newChild)
}

object Isqrt {
  /** Called directly from generated code. */
  /** ⌊√(2⁶³ − 1)⌋ — the largest possible result; capping the seed here
    * keeps every r² and (r+1)² below overflow. */
  private val MaxRoot = 3037000499L

  def impl(x: Long): Long = {
    require(x >= 0, s"isqrt requires x >= 0 (got $x)")
    var r = Math.min(Math.sqrt(x.toDouble).toLong, MaxRoot)
    // seed can overshoot by 1 (double rounding of the radicand above
    // 2^53) or undershoot by 1 — clamp both ways
    if (r > 0 && r * r > x) r -= 1
    if (r < MaxRoot && (r + 1) * (r + 1) <= x) r += 1
    r
  }

  /** Column-API form of the native expression. */
  def isqrt(c: Column): Column =
    ColumnBridge.column(Isqrt(ColumnBridge.expression(c)))

  /** The DuckDB rendering: same double-sqrt seed, then the same two
    * corrections — `x` is spliced verbatim (use a CTE-bound column name,
    * not a subquery). The seed is widened to ±2 tolerance by starting
    * from greatest(seed − 1, 0) and applying two increment checks, so a
    * worst-case cast difference still lands exactly. DuckDB checks
    * BIGINT overflow, so keep oracle radicands ≤ ~4.6e18 (every call
    * site is a scaled variance, orders of magnitude below that). */
  def sqlReplay(x: String): String = {
    val s0 = s"greatest(CAST(floor(sqrt(($x)::DOUBLE)) AS BIGINT) - 1, 0)"
    val s1 = s"($s0 + CASE WHEN ($s0 + 1) * ($s0 + 1) <= ($x) THEN 1 ELSE 0 END)"
    s"($s1 + CASE WHEN ($s1 + 1) * ($s1 + 1) <= ($x) THEN 1 ELSE 0 END)"
  }
}
