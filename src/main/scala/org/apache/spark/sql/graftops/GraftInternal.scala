package org.apache.spark.sql.graftops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into Spark's `private[sql]` internals, so graft's custom logical
  * operators (AsOfJoinNode) can surface as ordinary DataFrames. Same
  * pattern the built-in DSL uses internally.
  */
object GraftInternal {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Catalyst Expression behind a user-facing Column (Spark 4 wraps
    * columns in ColumnNodes; this runs the standard converter).
    */
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
}
