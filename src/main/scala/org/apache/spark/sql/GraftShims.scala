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

  /** register a function on a LIVE session (the extensions path only
    * applies at builder time; sessionState is private[sql])
    */
  def registerFunction(
      spark: SparkSession,
      ident: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(ident, info, builder)

  /** lift a custom LogicalPlan into a DataFrame (Dataset.ofRows is
    * private[sql]) — the entry point for graft's custom operators
    */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** convert a Column to a fully-built catalyst Expression (the 4.x
    * ColumnNode tree recursively converted, not lazily wrapped) and
    * resolve its attributes against `plan`'s output — for splicing
    * user columns into custom logical operators.
    */
  def resolvedExpression(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      c: Column): Expression = {
    val resolver = spark.sessionState.analyzer.resolver
    classic.ColumnNodeToExpressionConverter(c.node).transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        plan.resolve(u.nameParts, resolver).getOrElse(
          throw new IllegalArgumentException(
            s"cannot resolve ${u.name} against ${plan.output.map(_.name).mkString(", ")}"))
    }
  }
}
