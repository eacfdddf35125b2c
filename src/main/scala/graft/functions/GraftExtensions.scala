package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Config-only integration point for the whole engine: registers every
  * native function and optimizer rule via
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Registered SQL functions (all native codegen expressions, no UDFs):
  *   - `fix_mojibake(s)`      — [[FixMojibake]] cp1252/utf8 repair
  *   - `rolling_hash(s)`      — [[graft.llm.RollingHash]] doc fingerprint
  *   - `dot_product(a, b)`    — [[graft.llm.DotProduct]] float-array dot
  *   - `nearest_cell(v, cs, n)` — [[graft.llm.NearestCell]] IVF assign
  *   - `nfc_normalize(s)`     — [[NfcNormalize]] Unicode NFC
  *   - `ilog2(x)`             — [[Ilog2]] fixed-point log2
  *   - `isqrt(x)`             — [[Isqrt]] exact integer square root
  *   - `zorder(x, y, bits)`   — [[ZOrder]] Morton interleave (bits foldable)
  *   - `nearest_code(v, cb, off, sub)` — [[graft.llm.NearestCodeL2]] PQ assign
  * Injected optimizer rules:
  *   - [[graft.plans.ThresholdedLevenshtein]] — bounded edit-distance
  *     predicates re-plan as the O(len·k) banded form.
  *
  * Certified end-to-end by the forked-JVM `ExtensionsProbe` (a fresh
  * session with ONLY the config flag must resolve every name above and
  * fire the rule).
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {

  /** Evaluate a plan-shape argument that the contract requires to be a
    * foldable int literal — a non-foldable argument (a column, a
    * subquery) gets a clear analysis-time error naming the function and
    * the contract instead of an opaque eval/ClassCast failure. */
  private def foldableInt(fn: String, pos: Int, e: Expression): Int = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "USER_RAISED_EXCEPTION",
        messageParameters = Map("errorMessage" ->
          (s"$fn: argument $pos is a plan-shape constant and must be a " +
            s"foldable int literal, got non-foldable ${e.sql}")))
    e.eval() match {
      case n: Number => n.intValue
      case other =>
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "USER_RAISED_EXCEPTION",
          messageParameters = Map("errorMessage" ->
            (s"$fn: argument $pos must fold to an integer, got $other")))
    }
  }

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
      FunctionIdentifier("isqrt"),
      new ExpressionInfo(classOf[Isqrt].getName, "isqrt"),
      (children: Seq[Expression]) => Isqrt(children.head)))
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
        val bits = foldableInt("zorder", 3, children(2))
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
          foldableInt("nearest_code", 3, children(2)),
          foldableInt("nearest_code", 4, children(3)))))
    // optimizer rule: naive bounded-edit-distance predicates plan as the
    // O(len·k) banded Levenshtein (see [[graft.plans.ThresholdedLevenshtein]])
    ext.injectOptimizerRule(_ => graft.plans.ThresholdedLevenshtein)
  }
}
