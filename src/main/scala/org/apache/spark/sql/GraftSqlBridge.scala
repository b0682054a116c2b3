package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compile-time bridge into the `private[sql]` Column ⇄ Expression
  * converters that Spark 4 moved behind the ColumnNode API
  * (org.apache.spark.sql.classic.ExpressionUtils). Standard extension-library
  * idiom: a single object inside the `org.apache.spark.sql` package tree so
  * graft's custom Catalyst expressions can surface as user-facing Columns.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
