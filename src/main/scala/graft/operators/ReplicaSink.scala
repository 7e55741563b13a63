package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** K2' — replica materialization to a PARTITIONED parquet layout
  * (reference: the consumer's apply sink materializes the replica into
  * MySQL, cdc-mysql/src/consumer/mysql_manager.rs:214-281; a 100 TB Spark
  * replica materializes to object-store parquet instead).
  *
  * `partitionBy` on the dimension key gives downstream readers partition
  * pruning: a filter on the key turns into `PartitionFilters` on the scan
  * and only that directory is listed/read — the difference between an
  * O(partition) and O(table) read at 100 TB. SinkSpec pins the pruning in
  * the executed plan.
  */
object ReplicaSink {

  /** Write the applied customer replica partitioned by nation, once per
    * (sfDir, filesystem) — the committed write (_SUCCESS) is reused by
    * later calls in the session, mirroring how a real replica is
    * maintained incrementally rather than rewritten per query. */
  def partitionedReplica(spark: SparkSession, sfDir: String): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val dir = new java.io.File(s"/tmp/graft_replica/$key")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      dir.getParentFile.mkdirs()
      ChangelogApply.customerSnapshot(spark, sfDir)
        .write.mode("overwrite")
        .partitionBy("c_nationkey")
        .parquet(dir.toString)
    }
    dir.toString
  }

  /** Read the partitioned replica back with a nation filter — the filter
    * must reach the scan as a partition filter (pruned listing), not a
    * data filter. Partition-column read-back puts the key last and
    * re-infers its type, so the select restores the canonical order. */
  def readNation(spark: SparkSession, sfDir: String, nation: Int): DataFrame =
    spark.read.parquet(partitionedReplica(spark, sfDir))
      .where(col("c_nationkey") === nation)
      .select(col("c_custkey"), col("c_name"),
        col("c_nationkey").cast("int").as("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
}
