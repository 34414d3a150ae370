package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge to the `private[sql]` Column <-> Expression converters
  * (Spark 4 moved Column onto ColumnNode; `classic.ExpressionUtils` holds
  * the classic-session conversion). Standard technique for extension
  * libraries shipping native Catalyst expressions.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
