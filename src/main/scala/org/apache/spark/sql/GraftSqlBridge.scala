package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the two `private[sql]` seams a custom whole-operator
  * needs (graft.plans.TopKPerGroup): Column→Expression extraction and
  * Dataset construction from a LogicalPlan. Original code — placed in this
  * package purely for access, the standard Spark-extension technique. */
object GraftSqlBridge {
  def expr(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
