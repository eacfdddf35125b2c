package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `Column` engine-agnostic
  * (ColumnNode) and scoped the classic converters `private[sql]`, so
  * third-party native expressions need this one-file shim inside the `sql`
  * package scope — the standard packaging for Spark extension libraries.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap an already-built logical plan as a DataFrame — `Dataset.ofRows`
    * is `private[sql]` in Spark 4; tests use this to run a plan after
    * applying an optimizer rule by hand. */
  def dataset(s: org.apache.spark.sql.SparkSession,
              plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
