package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join strategy hints — the per-query override lane when the planner's
  * size heuristics are wrong at 100 TB (a filtered dim whose file size
  * lies, a fact small enough to hash but sorted on disk): BROADCAST,
  * MERGE, SHUFFLE_HASH each force their physical join, and the choice is
  * observable in the executed plan. Results are strategy-invariant —
  * pinned by comparing all three.
  */
class JoinHintSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTest._

  private def executedPlanOf(df: org.apache.spark.sql.DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
  }

  test("BROADCAST / MERGE / SHUFFLE_HASH hints force their physical joins") {
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val cust = spark.read.parquet(s"$Sf/customer.parquet")

    def joined(hint: String) =
      orders.join(cust.hint(hint), orders("o_custkey") === cust("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))

    val bcast = executedPlanOf(joined("broadcast"))
    assert(collect(bcast) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"broadcast hint ignored:\n$bcast")
    assert(collect(bcast) { case b: BroadcastExchangeExec => b }.nonEmpty)

    val merge = executedPlanOf(joined("merge"))
    assert(collect(merge) { case j: SortMergeJoinExec => j }.nonEmpty,
      s"merge hint ignored:\n$merge")

    val shash = executedPlanOf(joined("shuffle_hash"))
    assert(collect(shash) { case j: ShuffledHashJoinExec => j }.nonEmpty,
      s"shuffle_hash hint ignored:\n$shash")

    // strategy choice must never change the answer
    val rows = Seq("broadcast", "merge", "shuffle_hash").map(h =>
      joined(h).orderBy("c_mktsegment").collect().toSeq)
    assert(rows.distinct.size === 1)
  }
}
