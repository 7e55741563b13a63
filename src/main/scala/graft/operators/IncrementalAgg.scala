package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table (materialized-view
  * maintenance): a keyed table of MERGEABLE partials — count, decimal
  * sums, min/max — updated per append batch by folding the batch's
  * partials into the stored ones.
  *
  * Each `update` costs O(delta + groups): the batch is aggregated
  * map-side to one partial row per group, unioned with the stored
  * table (O(groups), small by construction), and re-merged with the
  * same monoid operations — sum-of-counts, sum-of-sums, min-of-mins.
  * The 100 TB log is never rescanned; that is the entire point. Every
  * partial is algebraic (commutative + associative), so N incremental
  * updates in any batch order produce bit-identical state to one
  * aggregation of the full log — SinkSpec pins exactly that, and
  * `q_incremental_agg` proves it against the DuckDB oracle over the
  * whole table.
  *
  * The VIEW is a parameter ([[MvSpec]]): the original events MV
  * ([[EventsMv]]) and the delta-rule JOIN view ([[RevenueByNationMv]] —
  * for an insert-only fact stream, Δ(fact ⋈ dims) = Δfact ⋈ dims, so a
  * joined view maintains by enriching each delta batch map-side with
  * broadcast dims and folding the SAME algebraic partials) are two
  * instances of one fold protocol.
  *
  * Sums ride decimals (value quantized at 2dp per row, summed exactly)
  * so merge order cannot perturb a float accumulation. Each update
  * writes an immutable versioned snapshot dir and publishes it with a
  * [[SnapshotManifest]] pointer swap — the object-store-safe commit:
  * a crash between snapshot write and swap leaves the previous state
  * fully readable, and the orphan dir is collected by the next
  * successful commit.
  */
object IncrementalAgg {

  /** Algebraic MV description: a group key plus MERGEABLE measures.
    * `partialAggs` reduce raw delta rows to one partial row per group;
    * `mergeAggs` re-merge partial rows (monoid ops, aliased
    * column-for-column with the partials); `cols` is the canonical
    * column set (group key first) a snapshot read-back projects — a
    * hash-bucketed snapshot dir carries an extra `bucket` partition
    * column the merge must never see. */
  final case class MvSpec(groupCol: String,
      partialAggs: Seq[Column], mergeAggs: Seq[Column], cols: Seq[String])

  /** The events MV — the original concrete instance. */
  val EventsMv: MvSpec = MvSpec("event_type",
    partialAggs = Seq(count(lit(1)).as("n"),
      sum(col("user_id")).as("sum_users"),
      sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
        .as("sum_value"),
      min(col("value")).as("min_value"),
      max(col("value")).as("max_value")),
    mergeAggs = Seq(sum(col("n")).cast("long").as("n"),
      sum(col("sum_users")).cast("long").as("sum_users"),
      sum(col("sum_value")).cast("decimal(38,2)").as("sum_value"),
      min(col("min_value")).as("min_value"),
      max(col("max_value")).as("max_value")),
    cols = Seq("event_type", "n", "sum_users", "sum_value",
      "min_value", "max_value"))

  /** Revenue-by-nation JOIN view over enriched order deltas
    * (o_totalprice + the dim-joined n_name): the delta-rule instance.
    * Revenue partials are exact decimals, so N incremental folds in any
    * batch order are bit-identical to one join+agg over the full log. */
  val RevenueByNationMv: MvSpec = MvSpec("n_name",
    partialAggs = Seq(count(lit(1)).as("n_orders"),
      sum(col("o_totalprice").cast("decimal(18,2)")).cast("decimal(38,2)")
        .as("sum_revenue")),
    mergeAggs = Seq(sum(col("n_orders")).cast("long").as("n_orders"),
      sum(col("sum_revenue")).cast("decimal(38,2)").as("sum_revenue")),
    cols = Seq("n_name", "n_orders", "sum_revenue"))

  /** Counting-algorithm instance for CDC-MAINTAINED join views — the
    * full generalization of the insert-only delta rule: delta rows
    * carry a SIGNED multiplicity (`mult` = ±1) and a signed 2dp value
    * contribution (`val_2dp`), so a keyed changelog fold maintains the
    * view exactly under update/delete (an update is −old +new; the
    * contributions cancel exactly because every row is quantized to
    * the same decimal scale before summing — the reason the value
    * column arrives pre-cast). min/max are deliberately absent: they
    * are not incrementally maintainable under deletes without
    * per-group history, the classic IVM limitation. */
  val OrderDeltaByNationMv: MvSpec = MvSpec("n_name",
    partialAggs = Seq(sum(col("mult")).cast("long").as("n_orders"),
      sum(col("val_2dp")).cast("decimal(38,2)").as("sum_revenue")),
    mergeAggs = RevenueByNationMv.mergeAggs,
    cols = RevenueByNationMv.cols)

  /** One batch reduced to mergeable partials, one row per group. */
  def partials(delta: DataFrame, spec: MvSpec = EventsMv): DataFrame =
    delta.groupBy(col(spec.groupCol))
      .agg(spec.partialAggs.head, spec.partialAggs.tail: _*)

  /** Merge rows carrying the partials schema down to one row per group
    * (used both for delta-into-state and state-compaction). */
  private def merge(rows: DataFrame, spec: MvSpec): DataFrame =
    rows.groupBy(col(spec.groupCol))
      .agg(spec.mergeAggs.head, spec.mergeAggs.tail: _*)

  private def readPartials(spark: SparkSession, path: String,
      spec: MvSpec): DataFrame =
    spark.read.parquet(path).select(spec.cols.map(col): _*)

  /** Group-count dispatch bound for the state write: at or below, one
    * file (the state read stays O(1) tasks); above, the snapshot is
    * written hash-BUCKETED on the group key so no single writer task
    * ever materializes the whole table — the same measured-bound
    * dispatch idiom as Graph.triangleCountAuto, deciding the physical
    * shape from a cheap O(groups) count rather than hoping the
    * few-groups contract holds forever. An MV keyed on a
    * high-cardinality column crosses the bound and transparently gets
    * the multi-file layout. */
  val OneFileGroups = 1024L

  /** Fold one append batch into the stored aggregate table (events MV —
    * see [[updateMv]] for the general form). */
  def update(spark: SparkSession, stateDir: String, delta: DataFrame,
      batchId: Long = -1L, oneFileGroups: Long = OneFileGroups): Unit =
    updateMv(spark, stateDir, delta, EventsMv, batchId, oneFileGroups)

  /** Fold one append batch into the stored aggregate table. Pass the
    * micro-batch's `batchId` when driving this from a stream
    * (foreachBatch): an update is a MERGE, not an overwrite, so a
    * replay of an already-folded batch would double-count its delta —
    * with a batchId the committed manifest records the last folded
    * batch and the replay becomes a detected no-op, the same
    * exactly-once contract as [[ReplicaSink.upsertBatch]]. */
  def updateMv(spark: SparkSession, stateDir: String, delta: DataFrame,
      spec: MvSpec, batchId: Long = -1L,
      oneFileGroups: Long = OneFileGroups): Unit = {
    val root = new java.io.File(stateDir)
    val m = SnapshotManifest.read(root)
    // <= not ==: a checkpoint reset against a kept state dir replays the
    // stream from batch 0, and every batch at or below the recorded
    // watermark is already folded (Delta's txnVersion contract)
    if (batchId >= 0L &&
        m.entries.get("lastBatch").exists(_.toLong >= batchId))
      return
    val p = partials(delta, spec)
    val merged = (m.entries.get("cur") match {
      case Some(rel) =>
        merge(readPartials(spark, new java.io.File(root, rel).toString, spec)
          .unionByName(p), spec)
      case None => merge(p, spec)
    }).persist()
    val next = s"v${m.version + 1}"
    val out = new java.io.File(root, next).toString
    try {
      val nGroups = merged.count() // O(groups): the dispatch measurement
      if (nGroups <= oneFileGroups)
        merged.coalesce(1).write.mode("overwrite").parquet(out)
      else {
        val buckets = math.min(64L,
          (nGroups + oneFileGroups - 1) / oneFileGroups).toInt
        // one writer task per bucket dir (the ReplicaSink idiom): file
        // count stays O(buckets), and readers prune by bucket
        merged
          .withColumn("bucket", pmod(hash(col(spec.groupCol)), lit(buckets)))
          .repartition(buckets, col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(out)
      }
    } finally {
      merged.unpersist(blocking = false)
      ()
    }
    // a manual (batchId-less) update must CARRY the committed lastBatch
    // watermark forward — rebuilding entries from scratch would silently
    // erase replay protection on a stream-maintained state dir and let a
    // checkpoint replay double-count
    val entries = m.entries.view.filterKeys(_ == "lastBatch").toMap ++
      Map("cur" -> next) ++
      (if (batchId >= 0L) Map("lastBatch" -> batchId.toString) else Map.empty)
    val ns = SnapshotManifest.State(m.version + 1, entries, m.retain)
    SnapshotManifest.commit(root, ns) // the commit point
    SnapshotManifest.gc(root, ns, "v")
  }

  /** The maintained events table, presentation form (decimal sum →
    * double), resolved through the manifest pointer. */
  def read(spark: SparkSession, stateDir: String): DataFrame =
    readMv(spark, stateDir, EventsMv)
      .select(col("event_type"), col("n"), col("sum_users"),
        col("sum_value").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))

  /** The maintained table in its stored partials form, resolved through
    * the manifest pointer (callers own the presentation casts). */
  def readMv(spark: SparkSession, stateDir: String, spec: MvSpec): DataFrame = {
    val root = new java.io.File(stateDir)
    val m = SnapshotManifest.read(root)
    spark.read.parquet(new java.io.File(root, m.entries("cur")).toString)
      .select(spec.cols.map(col): _*)
  }
}
