package graft.llm

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** [[TextAnalysis.rollingHashImpl]] (Karp–Rabin, base 257 mod 2^61−1) as a
  * native Catalyst expression — replaces the Scala UDF in q30's hot path.
  *
  * Same motivation as [[NearestCell]] and
  * [[graft.functions.FixMojibake]]: a UDF sits behind an
  * encoder/serializer boundary and a closure dispatch per row, and blocks
  * expression-level optimizations; this stays inside whole-stage codegen
  * (the generated code is one static call into the tight mod-arithmetic
  * loop). The hash itself is unchanged — the unit/property suites pin it
  * against a BigInt reference.
  *
  * null → 0 (the impl's contract), so the output is non-nullable LONG and
  * eval must run even on null input — no nullSafeEval shortcut.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    TextAnalysis.rollingHashImpl(
      if (v == null) null else v.asInstanceOf[UTF8String].toString)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val newCode =
      code"""
        ${childGen.code}
        long ${ev.value} = graft.llm.TextAnalysis.rollingHashImpl(
          ${childGen.isNull} ? null : ${childGen.value}.toString());
      """
    ev.copy(code = newCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Column-API form of the native expression. */
  def rollingHashNative(c: Column): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c)))

  /** Register `rolling_hash` in the session's function registry for SQL use
    * (`SELECT rolling_hash(text) FROM docs`). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.registerFunction(
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (children: Seq[Expression]) => RollingHash(children.head))
  }
}
