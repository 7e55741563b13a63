package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReplicaSink

/** The partitioned replica sink (K2'): layout, pruning, and content. */
class SinkSpec extends AnyFunSuite {
  import SparkTest._

  test("partitioned replica: nation filter becomes a PartitionFilter (pruned scan, not a data filter)") {
    val out = ReplicaSink.readNation(spark, Sf, 7)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*c_nationkey[^\\]]*\\].*"),
      s"expected the nation filter in PartitionFilters, plan:\n$plan")
    // and the data-filter list must NOT need the partition key
    assert(!plan.matches("(?s).*PushedFilters: \\[[^\\]]*c_nationkey[^\\]]*\\].*"),
      s"nation filter leaked into PushedFilters (full scan), plan:\n$plan")
  }

  test("partitioned replica: read-back equals the direct apply for that nation") {
    import spark.implicits._
    val direct = graft.operators.ChangelogApply.customerSnapshot(spark, Sf)
      .where($"c_nationkey" === 7)
      .orderBy("c_custkey")
      .collect().toSeq
    val readBack = ReplicaSink.readNation(spark, Sf, 7)
      .orderBy("c_custkey")
      .collect().toSeq
    assert(readBack === direct)
    assert(readBack.nonEmpty)
  }
}
