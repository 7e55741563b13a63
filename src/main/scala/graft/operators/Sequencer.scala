package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T8 — monotonic sequence stamping (fluvio_manager.rs:42-52).
  *
  * The reference stamps a u64 on a single serial stream. A naive Spark port
  * is `row_number().over(Window.orderBy(...))` — a single-partition sort
  * that dies at 100 TB. Instead we do the scalable two-pass global
  * numbering:
  *
  *   1. range-repartition by the order key (total order across partitions,
  *      Spark's RangePartitioner samples — same machinery as a global sort),
  *   2. sort within partitions,
  *   3. number within each partition and add the exclusive prefix sum of
  *      partition counts (one tiny driver-side array, size = #partitions).
  *
  * Cost: one shuffle + one count pass — no single-reducer bottleneck.
  */
object Sequencer {

  // The ranged DataFrame from the previous stampSequence call; kept cached
  // so the caller's eventual action reuses the range shuffle, and released
  // on the next call so repeated invocations (Bench runs each query 4×)
  // hold at most ONE cache entry instead of accumulating until LRU
  // eviction (round-1 advice).
  private var lastRanged: Option[DataFrame] = None

  /** Stamp `seqCol` = 1-based global rank of rows ordered by `orderBy`
    * (which must be a total order — ties would make the stamp
    * nondeterministic). */
  def stampSequence(df: DataFrame, seqName: String, orderBy: Seq[Column]): DataFrame = synchronized {
    val spark = df.sparkSession
    import spark.implicits._
    lastRanged.foreach(_.unpersist(blocking = false))
    val ranged = df
      .repartitionByRange(orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
      .withColumn("__pid", spark_partition_id())
      .persist() // both passes read the ranged shuffle once
    lastRanged = Some(ranged)
    // Pass 1: per-partition counts → exclusive prefix offsets. Tiny
    // aggregate (rows = #partitions), safe to collect.
    val counts = ranged.groupBy(col("__pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1).zip(counts.scanLeft(0L)(_ + _._2).init)
    val offsetDf = offsets.toSeq.toDF("__pid", "__offset")
    // Pass 2: number within partition (window over __pid keeps rows where
    // they already are; the broadcast join adds the offset without moving
    // data). The persist stays live for the consumer's action; the next
    // stampSequence call (or cleanup()) releases it.
    val w = Window.partitionBy(col("__pid")).orderBy(orderBy: _*)
    ranged
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(seqName, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Release the cache held for the most recent stampSequence caller. */
  def cleanup(): Unit = synchronized {
    lastRanged.foreach(_.unpersist(blocking = false))
    lastRanged = None
  }

  /** S5 — last-record probe (fluvio_manager.rs:56-77): tail of the stream
    * by sequence. orderBy+limit(1) compiles to TakeOrderedAndProject —
    * a per-partition top-1 then driver merge, no global sort. */
  def lastRecord(events: DataFrame, seqCol: String = "sequence"): DataFrame =
    events.orderBy(col(seqCol).desc).limit(1)
}
