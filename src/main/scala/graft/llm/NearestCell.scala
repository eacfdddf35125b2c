package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType}

/** Nearest-centroid argmax as a native codegen Catalyst expression — the
  * kernel of IVF assignment ([[Ivf.assign]]).
  *
  * Why an expression and not composition: the argmax over k centroids has
  * three composable formulations and all of them break at one end or the
  * other —
  *  - crossJoin(centroids) + window argmax: k× row explosion and a full
  *    corpus×k shuffle per call (the 100 TB killer);
  *  - `aggregate` higher-order fold: zero shuffle but interpreted per
  *    element (measured ~3× slower than codegen at k=8, dim=64);
  *  - unrolled per-cell score expressions: zero shuffle and codegen'd, but
  *    the expression TREE is O(k²·dim) after CollapseProject inlines the
  *    staged score columns into every CASE arm — 10 MiB task binaries and
  *    optimizer OOM at k=8, dim=64.
  * A native expression is O(1) tree size, O(k·dim) generated work, and
  * stays inside whole-stage codegen: the generated code is one static call
  * into [[NearestCell.impl]]'s tight flat-array loop.
  *
  * Arguments: `vec` array<double> (the row's vector), `flat` array<double>
  * (k centroids concatenated, length k·dim), `norms` array<double> (the k
  * precomputed centroid L2 norms). Returns the INDEX (0-based position in
  * the packed order, not the cell id) of the argmax-cosine centroid.
  *
  * Bit-parity contract (matches [[Similarity.cosine]] and the DuckDB
  * oracle): dot products accumulate left-to-right from 0.0; the score is
  * `dot / (|v| * |c|)`; comparisons use `java.lang.Double.compare`, which
  * is exactly Spark SQL's double ordering (NaN greatest, NaN == NaN), and
  * STRICT improvement keeps the first (lowest-index) centroid on ties.
  */
case class NearestCell(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(vec: Any, flat: Any, norms: Any): Any =
    NearestCell.impl(vec.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      norms.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (vec, flat, norms) =>
      s"${ev.value} = graft.llm.NearestCell.impl($vec, $flat, $norms);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCell =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object NearestCell {

  /** The generated code calls this directly — one JIT-friendly loop, no
    * per-element dispatch. Public because the codegen'd class lives outside
    * this package. */
  def impl(vec: ArrayData, flat: ArrayData, norms: ArrayData): Int = {
    val k = norms.numElements()
    // fail fast with errors that name the contract violation: a -1 here
    // would surface later as a baffling "SQL array indices start at 1"
    // from element_at, and a short vec would read out of bounds inside
    // generated code
    if (k == 0)
      throw new IllegalArgumentException(
        "NearestCell: empty centroid set (k == 0); Ivf.fit must produce at least one cell")
    val dim = flat.numElements() / k
    if (vec.numElements() < dim)
      throw new IllegalArgumentException(
        s"NearestCell: vector has ${vec.numElements()} elements but centroids have dim $dim; " +
          "embedding columns must be fixed-width")
    var vs = 0.0d
    var j = 0
    while (j < dim) { val x = vec.getDouble(j); vs += x * x; j += 1 }
    val vnorm = math.sqrt(vs)
    var bestIdx = 0
    var best = 0.0d
    var c = 0
    while (c < k) {
      var dot = 0.0d
      val off = c * dim
      var i = 0
      while (i < dim) { dot += vec.getDouble(i) * flat.getDouble(off + i); i += 1 }
      val score = dot / (vnorm * norms.getDouble(c))
      // Double.compare == Spark SQL double ordering (NaN greatest, NaN==NaN);
      // strict > keeps the lowest index on exact ties
      if (c == 0 || java.lang.Double.compare(score, best) > 0) {
        best = score; bestIdx = c
      }
      c += 1
    }
    bestIdx
  }

  /** Column-API form. */
  def nearestCell(vec: Column, flat: Column, norms: Column): Column =
    ColumnBridge.column(NearestCell(
      ColumnBridge.expression(vec),
      ColumnBridge.expression(flat),
      ColumnBridge.expression(norms)))
}
