package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bucketed

/** The bucketed co-located join must plan WITHOUT a shuffle on either
  * side — that is its entire reason to exist. */
class BucketingSpec extends AnyFunSuite {
  import SparkTest._

  test("co-located join on bucketed tables plans with no Exchange under the join") {
    // force the sort-merge path: a broadcast join would also be
    // shuffle-free and mask what bucketing provides
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketed.coLocatedJoin(spark, Sf)
      df.collect() // finalize any adaptive plan
      val plan = df.queryExecution.executedPlan
      val finalPlan = (plan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString()
      // bucketing on the join key which is also the grouping key ⇒ the
      // whole join+agg pipeline runs without ANY exchange
      assert(finalPlan.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$finalPlan")
      assert(!finalPlan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$finalPlan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("co-located join result matches the plain parquet join") {
    import org.apache.spark.sql.functions._
    val viaBuckets = Bucketed.coLocatedJoin(spark, Sf)
      .orderBy("c_custkey").collect().toSeq
    val plain = spark.read.parquet(s"$Sf/customer.parquet")
      .join(spark.read.parquet(s"$Sf/orders.parquet"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .orderBy("c_custkey").collect().toSeq
    assert(viaBuckets === plain)
    assert(viaBuckets.nonEmpty)
  }
}
