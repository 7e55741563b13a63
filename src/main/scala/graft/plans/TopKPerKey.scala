package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Grouped top-k as a first-class plan operator (SURVEY.md §2.6 "sorts/
  * limits/top-k", the per-key variant) — the tier-(c) extension path:
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered
  * through [[graft.GraftExtensions]].
  *
  * Why the built-ins aren't enough: Spark expresses "top k rows per key"
  * as `row_number() OVER (PARTITION BY key ORDER BY ord) <= k`, which
  * hash-shuffles EVERY input row to its key's reducer and sorts whole
  * partitions before the filter drops all but k per key. The reference's
  * engine keeps per-key bounded state instead (the same shape as its
  * last-record probe, cdc-mysql/src/consumer/mysql_manager.rs's
  * per-table latest-image map). At 100 TB the difference is the shuffle:
  * window-rank moves the full table across the wire; this operator's
  * partial phase keeps a k-bounded heap per key per map partition and
  * ships AT MOST k·(distinct keys in that partition) rows — for top-3-
  * per-customer over billions of orders, a ~n/3k reduction in shuffle
  * bytes, the same partial/final split Spark itself uses for aggregates.
  *
  * Memory bound: each phase holds ≤ k rows × (distinct keys per
  * partition) — the final phase's working set is exactly the result's
  * own size for its key range, strictly smaller than the sort buffer the
  * window plan needs for the same partition.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k per key requires k > 0; got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial (map-side, any distribution) → final
  * (clustered on `keys`); `EnsureRequirements` inserts the hash exchange
  * between them, so AQE still owns the shuffle. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, ordering, k, child) =>
      val partial = TopKPerKeyExec(keys, ordering, k, isFinal = false, planLater(child))
      TopKPerKeyExec(keys, ordering, k, isFinal = true, partial) :: Nil
    case _ => Nil
  }
}

/** One phase of grouped top-k: a hash map of k-bounded binary heaps keyed
  * by the grouping projection. The heap is a max-heap under `ordering`
  * (head = worst retained row), so admission is an O(1) peek and
  * replacement O(log k). Both phases run the identical fold; only the
  * required child distribution differs.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    isFinal: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  // The partial phase's numOutputRows IS the shuffle row count — the
  // operator's whole reason to exist; TopKPlanSpec pins it < input rows.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "output rows"))

  override def requiredChildDistribution: Seq[Distribution] =
    if (isFinal) ClusteredDistribution(keys) :: Nil
    else UnspecifiedDistribution :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyExprs = keys
    val sortOrders = ordering
    val childOutput = child.output
    val numOutputRows = longMetric("numOutputRows")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(sortOrders, childOutput)
      // head of each queue is the WORST row kept (max under rowOrd)
      val worstFirst = rowOrd.reverse
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kLocal) {
          heap.offer(row.copy())
        } else if (rowOrd.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.iterator.asScala.flatMap(_.iterator.asScala)
        .map { r => numOutputRows += 1; r }
    }
  }
}
