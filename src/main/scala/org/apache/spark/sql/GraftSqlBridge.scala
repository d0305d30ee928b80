package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` Dataset factory so graft can hand a
  * custom LogicalPlan (AsOfJoinPlan) to the session — the standard
  * technique Spark extension libraries use to surface injected
  * operators as DataFrames. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
