package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for product-quantization ANN (`ann_pq_adc`): the
  * scale claim is that the per-(query, vector) stage runs in CODE space
  * — per-query distance TABLES broadcast and the corpus codes stream
  * through broadcast hash joins; full-width vector math happens only in
  * codebook training and table building (corpus × 4-row centroid sets),
  * never per candidate pair. */
class PqPlanSpec extends AnyFunSuite {
  import SparkTest._

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString()
  }

  test("text_retrieval_hybrid_served: both tiers serve from artifacts — no training in the plan") {
    val df = graft.SparkEntry.queries("text_retrieval_hybrid_served")(spark, Sf)
    val optimized = df.queryExecution.optimizedPlan.toString
    // the k-means update aggregate's structural signature (posexplode →
    // per-dim mean → collect_list reassembly): present in every
    // training plan, must be ABSENT from the serving composition
    assert(!optimized.contains("posexplode") && !optimized.contains("collect_list"),
      "serving plan must not contain k-means training stages")
    // the ANN tier's codes scan stays partition-pruned to routed cells
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning"),
      "served hybrid must keep the cell-level dynamic partition pruning")
    spark.catalog.clearCache()
  }

  test("ann_pq_adc: distance tables broadcast; candidate stage is code-space") {
    val df = graft.SparkEntry.queries("ann_pq_adc")(spark, Sf)
    val plan = finalPlan(df)
    // both ADC table joins must be broadcast hash joins on the code ids
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2,
      s"both distance-table joins must broadcast (saw $bhj):\n$plan")
    // the only nested-loop/cartesian shapes allowed are the broadcast
    // builds against the 4-row centroid tables (training + dt build)
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product allowed:\n$plan")
    // the ADC sum is a projection over code-join output — the full-width
    // strict-fold distance (zip_with over 16-dim slices) must appear in
    // the plan only against centroid tables (broadcast nested loop
    // stages), never on the output side of the code joins. Pin the
    // projection: adist comes from the two table lookups.
    assert(plan.contains("(d0") && plan.contains("d1"),
      s"adist must be the d0 + d1 table-lookup sum:\n$plan")
    spark.catalog.clearCache()
  }
}
