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

  /** Forwarders to the `private[sql]` Column ⇄ Expression converters —
    * for hand-built catalyst expressions with no public function (e.g.
    * the BloomFilterAggregate that folds a segment's term bloom into
    * its stats aggregation). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
  def expression(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
