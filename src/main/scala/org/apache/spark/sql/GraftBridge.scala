package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Expression ⇄ Column converters. Custom
  * Catalyst expressions (graft.functions) need a public way to surface as
  * Columns; Spark 4 moved the constructors behind ColumnNode, so this is the
  * one sanctioned-by-necessity reach into the spark.sql namespace. No Spark
  * behavior is modified — conversion only.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
