package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Column ↔ Expression converters —
  * the standard hook point for Spark-native extension libraries that
  * define custom Catalyst expressions (Spark 4 moved classic Column
  * internals behind org.apache.spark.sql.classic).
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column =
    classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
