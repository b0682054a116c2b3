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

  /** Wrap an already-built logical plan as a DataFrame (the `private[sql]`
    * `Dataset.ofRows`). Used to PIN a plan: re-wrapping a fully optimized
    * plan lets a caller freeze the outcome of a state-dependent optimizer
    * rule (e.g. an MV rewrite) and then release the state, so later
    * queries in the same process plan independently.
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
