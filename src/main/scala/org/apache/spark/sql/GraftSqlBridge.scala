package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the package-private DataFrame-from-LogicalPlan
  * constructor, for graft's custom operator nodes (see
  * graft.plans.AsOfJoin). This is the standard pattern Spark extension
  * libraries use to materialize a custom logical node as a DataFrame —
  * no Spark internals are modified. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
