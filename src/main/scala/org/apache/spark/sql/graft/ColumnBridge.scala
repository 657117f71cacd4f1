package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public `Column` and Catalyst `Expression` — Spark 4 made
  * the constructor-side conversion `private[sql]`, so custom Expressions need
  * this one-file shim inside the spark.sql package tree (a standard pattern
  * for Catalyst extensions).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
