package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for the engine's native Catalyst
  * expressions (graft.functions). Spark 4 made `Column` carry an opaque
  * ColumnNode and gated the Expression conversions `private[sql]`, so
  * libraries adding custom expressions host this two-line shim inside the
  * sql package — the standard extension pattern (the public alternative,
  * registering SQL-named functions through SparkSessionExtensions, is in
  * graft.functions.GraftFunctions). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
