package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column ↔ Expression converters,
  * needed to expose custom Catalyst expressions
  * (graft.plans.VectorExpressions) as user-facing `Column`s. Lives in
  * the org.apache.spark.sql namespace purely for access — the usual
  * pattern for Spark extension libraries; no Spark internals are
  * modified.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
