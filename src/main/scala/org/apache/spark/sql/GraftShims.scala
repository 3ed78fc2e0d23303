package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to `private[sql]` Column↔Expression converters so graft's
  * custom Catalyst expressions can be exposed as Columns. Standard
  * extension-library shim pattern (same trick frameworks built on
  * Spark use to register native expressions).
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
