package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark 4's Column ↔ Expression conversion, which lives behind
  * `private[sql]` visibility in `org.apache.spark.sql.classic`. This is the
  * standard extension-library pattern for exposing custom Catalyst
  * expressions as user-facing Columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
