package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Narrow bridge to the `private[sql]` `Dataset.ofRows` constructor, the
  * standard way extension libraries lift a hand-built [[LogicalPlan]]
  * (here [[graft.plans.TopKPerKey]]) into a public DataFrame. This file
  * deliberately lives in `org.apache.spark.sql` and contains nothing but
  * the one forwarding call — all graft logic stays in the graft packages.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
