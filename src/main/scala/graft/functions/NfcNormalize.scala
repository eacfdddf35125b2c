package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen expression — the
  * canonicalization step that precedes any text dedup/fingerprint pipeline
  * ("é" composed vs "e"+COMBINING ACUTE must hash identically or near-dup
  * detection silently misses).
  *
  * `java.text.Normalizer` implements Unicode canonical composition; DuckDB's
  * `nfc_normalize` implements the same algorithm, giving cross-engine
  * oracle parity (identical on any corpus whose code points both engines'
  * Unicode tables know — everything in practice). Fast path: NFC-normalized
  * input (the overwhelmingly common case — ASCII is always NFC) is detected
  * with `Normalizer.isNormalized`, which is a scan with no allocation, so
  * the expression costs ~a memchr on clean corpora and only pays the
  * compose/allocate on rows that actually need it.
  *
  * Null propagates (unlike [[FixMojibake]]'s null→"" reference semantics,
  * normalization has no defaulting story) — nullSafeEval/nullSafeCodeGen
  * give the standard null-in/null-out contract.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.impl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      code"${ev.value} = graft.functions.NfcNormalize.impl($c);".toString)

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  import java.text.Normalizer

  /** Called directly from generated code. isNormalized short-circuits the
    * (dominant) already-NFC case without allocating a String. */
  def impl(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API form of the native expression. */
  def nfcNative(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
