package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column wraps ColumnNodes and the Expression bridge
  * (classic.ExpressionUtils) is private[sql]; this shim lives inside
  * the org.apache.spark.sql package tree to expose it to graft — the
  * standard pattern for third-party Catalyst extensions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
