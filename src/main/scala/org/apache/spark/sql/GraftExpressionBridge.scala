package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `ExpressionUtils` and the
  * `Column(expr)` constructor `private[sql]`; a one-object shim inside the
  * sql package is the standard way for an extension library to register
  * custom Catalyst expressions without a SparkSessionExtensions round-trip.
  * Only used by graft.core.DotProduct (and future native expressions). */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-BUILT session
    * (`SparkSession.sessionState` is private[sql] in Spark 4; config-time
    * injection goes through graft.core.GraftExtensions instead). */
  def registerFunction(
      spark: SparkSession,
      name: org.apache.spark.sql.catalyst.FunctionIdentifier,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.registerFunction(name, info, builder)
}
