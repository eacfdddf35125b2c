package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** O16 as a native Catalyst expression (the zero-UDF-purity variant of
  * [[Functions.fixMojibake]]): cp1252-encode / utf8-decode round trip with
  * IGNORE on both sides, `" ...more"` suffix stripped, null → "".
  *
  * Unlike a Scala UDF this participates in whole-stage codegen (the
  * generated code calls the static impl directly — no
  * encoder/serializer boundary, no closure dispatch), and registering it in
  * the session's function registry makes it visible to SQL:
  * `SELECT fix_mojibake(description) FROM books`.
  *
  * Reference semantics: `/root/reference/transformation_pipeline.py:14-25`.
  */
case class FixMojibake(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = false

  /** null → "" (the reference's NaN → "" default), so eval must run even on
    * null input — no nullSafeEval shortcut. */
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    val s = if (v == null) null else v.asInstanceOf[UTF8String].toString
    UTF8String.fromString(Functions.fixMojibakeImpl(s))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val newCode =
      code"""
        ${childGen.code}
        UTF8String ${ev.value} = UTF8String.fromString(
          graft.functions.Functions.fixMojibakeImpl(
            ${childGen.isNull} ? null : ${childGen.value}.toString()));
      """
    ev.copy(code = newCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): FixMojibake =
    copy(child = newChild)
}

/** `SparkSessionExtensions` injector — wire the engine's native SQL
  * functions into any session via config, no code changes:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Registers every native codegen expression the engine defines, so a
  * SQL-only user gets the same surface the Column API exposes. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (children: Seq[Expression]) => FixMojibake(children.head)))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[graft.llm.RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => graft.llm.RollingHash(children.head)))
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[graft.llm.DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => graft.llm.DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("nearest_cell"),
      new ExpressionInfo(classOf[graft.llm.NearestCell].getName, "nearest_cell"),
      (children: Seq[Expression]) =>
        graft.llm.NearestCell(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => NfcNormalize(children.head)))
    ext.injectFunction((
      FunctionIdentifier("ilog2"),
      new ExpressionInfo(classOf[Ilog2].getName, "ilog2"),
      (children: Seq[Expression]) => Ilog2(children.head)))
    ext.injectFunction((
      FunctionIdentifier("zorder"),
      new ExpressionInfo(ZOrder.getClass.getName, "zorder"),
      // bits is a plan-shape constant (it fixes the fold depth), so the
      // SQL form requires a foldable int literal for argument 3. Built
      // from raw Catalyst nodes (not via the Column API) because a
      // Column→Expression bridge inside a function builder leaves an
      // unevaluable ColumnNodeExpression in the plan.
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{BitwiseAnd, BitwiseOr, Cast, Literal, ShiftLeft, ShiftRightUnsigned}
        import org.apache.spark.sql.types.LongType
        val bits = children(2).eval().asInstanceOf[Number].intValue
        require(bits > 0 && bits <= 31, s"zorder bits must be in [1,31] (got $bits)")
        val xs = Cast(children(0), LongType)
        val ys = Cast(children(1), LongType)
        (0 until bits).foldLeft[Expression](Literal(0L)) { (acc, i) =>
          BitwiseOr(BitwiseOr(acc,
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(xs, Literal(i)), Literal(1L)),
              Literal(2 * i))),
            ShiftLeft(BitwiseAnd(ShiftRightUnsigned(ys, Literal(i)), Literal(1L)),
              Literal(2 * i + 1)))
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("nearest_code"),
      new ExpressionInfo(classOf[graft.llm.NearestCodeL2].getName, "nearest_code"),
      // offset/subDim are plan-time constants baked into codegen, so the
      // SQL form requires foldable int literals for arguments 3 and 4
      (children: Seq[Expression]) =>
        graft.llm.NearestCodeL2(children(0), children(1),
          children(2).eval().asInstanceOf[Number].intValue,
          children(3).eval().asInstanceOf[Number].intValue)))
    // optimizer rule: naive bounded-edit-distance predicates plan as the
    // O(len·k) banded Levenshtein (see [[graft.plans.ThresholdedLevenshtein]])
    ext.injectOptimizerRule(_ => graft.plans.ThresholdedLevenshtein)
  }
}

object FixMojibake {
  /** Column-API form of the native expression. */
  def fixMojibakeNative(c: Column): Column =
    ColumnBridge.column(FixMojibake(ColumnBridge.expression(c)))

  /** Register `fix_mojibake` in the session's function registry for SQL use. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("fix_mojibake"),
      new ExpressionInfo(classOf[FixMojibake].getName, "fix_mojibake"),
      (children: Seq[Expression]) => FixMojibake(children.head))
  }
}
