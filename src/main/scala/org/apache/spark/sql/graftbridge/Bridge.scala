package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Minimal `private[sql]` access bridge for the graft engine's custom
  * logical plans (the standard pattern for Spark-external plan
  * libraries): constructing a `DataFrame` from a hand-built
  * `LogicalPlan` and unwrapping a public `Column` to its Catalyst
  * `Expression` have no public API in Spark 4, so this one object lives
  * under `org.apache.spark.sql` to reach them. Nothing else of Spark's
  * internals is touched here.
  */
object Bridge {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expr(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
}
