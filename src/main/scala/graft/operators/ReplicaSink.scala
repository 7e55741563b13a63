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

  // ---------- streaming K2: per-micro-batch bucketed upsert ----------

  /** Replica key-hash buckets. Each micro-batch rewrites ONLY the buckets
    * its keys hash into — at 100 TB this is thousands of buckets and a
    * batch touches a handful, so upsert cost is O(touched buckets), not
    * O(replica). (A lakehouse table format's MERGE does the same
    * copy-on-write at file granularity; plain parquet makes the mechanism
    * explicit: write merged buckets to a temp dir, then atomic-rename.) */
  val ReplicaBuckets = 16

  /** Upsert invocations of the current/most recent streaming sink query —
    * introspection for SinkSpec's incremental-path assertion only. */
  @volatile var lastUpsertBatches: Int = 0

  /** foreachBatch body: merge one micro-batch of keyed deltas
    * (uri, key, image, deleted) into the bucketed replica at `dir`.
    * Within a batch the FMGWS fold already collapsed each key to its
    * post-batch state, so the merge is: drop every touched key from its
    * bucket, re-insert the keys that are live. Buckets the batch does not
    * touch are never read or written. The temp-dir + rename keeps readers
    * consistent and avoids Spark's (correct) refusal to overwrite a path
    * it is reading from. */
  def upsertBatch(dir: String)(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta = batch
      .withColumn("bucket", pmod(hash(col("uri"), col("key")), lit(ReplicaBuckets)))
      .persist()
    try {
      val affected = delta.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted
      if (affected.nonEmpty) {
        lastUpsertBatches += 1
        val existingDirs = affected
          .map(b => new java.io.File(dir, s"bucket=$b"))
          .filter(d => new java.io.File(d, "_keep").exists())
        val live = delta.where(!col("deleted"))
          .select(col("uri"), col("key"), col("image"), col("bucket"))
        val merged = if (existingDirs.isEmpty) live else {
          val existing = spark.read
            .option("basePath", dir)
            .parquet(existingDirs.map(_.toString): _*)
            .select(col("uri"), col("key"), col("image"), col("bucket"))
          existing.join(delta.select(col("uri"), col("key")).distinct(),
              Seq("uri", "key"), "left_anti")
            .unionByName(live)
        }
        val tmp = new java.io.File(s"${dir}_tmp_$batchId")
        // Cluster by bucket BEFORE the partitioned write: without it every
        // shuffle partition writes into every touched bucket dir —
        // tasks × buckets small files per batch (measured 32×16 here).
        // One task per touched bucket is also the 100 TB shape: file
        // count stays O(buckets), not O(tasks × buckets).
        merged.repartition(affected.length.max(1), col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(tmp.toString)
        affected.foreach { b =>
          val dst = new java.io.File(dir, s"bucket=$b")
          val src = new java.io.File(tmp, s"bucket=$b")
          graft.Fs.deleteRecursively(dst)
          if (src.exists()) {
            java.nio.file.Files.move(src.toPath, dst.toPath)
            // marker: partition dirs need a non-hidden co-file so an empty
            // rewrite is distinguishable from never-written; also lets the
            // existence check above skip parquet listing
            new java.io.File(dst, "_keep").createNewFile()
          }
        }
        graft.Fs.deleteRecursively(tmp)
      }
    } finally {
      delta.unpersist(blocking = false)
      ()
    }
  }

  /** Read the streaming replica back as memory-sink-shaped images. */
  def readReplicaImages(spark: SparkSession, dir: String): DataFrame =
    spark.read
      .schema("uri STRING, key STRING, image ARRAY<STRING>")
      .option("basePath", dir)
      .parquet(dir)
      .select(col("image"))
}
