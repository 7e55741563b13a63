package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** T8 — monotonic sequence stamping (fluvio_manager.rs:42-52).
  *
  * The reference stamps a u64 on a single serial stream. A naive Spark port
  * is `row_number().over(Window.orderBy(...))` — a single-partition sort
  * that dies at 100 TB. Instead: scalable global numbering —
  *
  *   1. range-repartition by the order key (total order across partitions;
  *      Spark's RangePartitioner samples — same machinery as a global sort),
  *   2. sort within partitions,
  *   3. `zipWithIndex` on the ONE ranged RDD: a lightweight per-partition
  *      count job over the already-materialized shuffle output (the map
  *      stage is reused — "skipped stage" — because both jobs share the
  *      same RDD lineage), then each partition adds its exclusive prefix
  *      offset as a narrow map.
  *
  * Cost: one shuffle + one count-read of its output — no single-reducer
  * bottleneck, no persist, no cross-call mutable state (round 1's cache
  * leak and round 2's stale-eviction hazard are both structurally gone).
  */
object Sequencer {

  /** Stamp `seqName` = 1-based global rank of rows ordered by `orderBy`
    * (which must be a total order — ties would make the stamp
    * nondeterministic). */
  def stampSequence(df: DataFrame, seqName: String, orderBy: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    val ranged = df
      .repartitionByRange(orderBy: _*)
      .sortWithinPartitions(orderBy: _*)
    val schema = ranged.schema.add(seqName, LongType, nullable = false)
    // Both zipWithIndex's size job and the consumer's job hang off this
    // exact RDD object, so the range shuffle runs once and the second job
    // reads shuffle files.
    val stamped = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(stamped, schema)
  }

  /** S5 — last-record probe (fluvio_manager.rs:56-77): tail of the stream
    * by sequence. orderBy+limit(1) compiles to TakeOrderedAndProject —
    * a per-partition top-1 then driver merge, no global sort. */
  def lastRecord(events: DataFrame, seqCol: String = "sequence"): DataFrame =
    events.orderBy(col(seqCol).desc).limit(1)
}
