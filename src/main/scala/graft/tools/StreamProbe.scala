package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch (round-12, verdict item 4): run one streaming query and
  * dump the LAST drained stream's per-micro-batch progress — the
  * engine's own durationMs decomposition (addBatch = the foreachBatch /
  * sink work, queryPlanning, walCommit = offset-log write, commitOffsets
  * = commit-log write, getBatch, latestOffset, triggerExecution = the
  * whole trigger) — so the "fixed per-batch floor" claim decomposes into
  * commit-log fsync share vs planning share vs actual work. Reads
  * [[graft.streaming.CdcStream.lastRunProgress]], which every drain
  * already captures; a query that drains several streams reports its
  * LAST drain (the probe is for decomposition, not accounting).
  * Usage: tools/run.sh graft.tools.StreamProbe <queryName> [sfDir] [reps]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${graft.Fs.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "1024"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_BENCH_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })
    val fn = graft.SparkEntry.queries(name)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[streamprobe] $name run $i: $dt%.2fs ($n rows)")
      if (i == reps) {
        val keys = Seq("triggerExecution", "queryPlanning", "getBatch",
          "latestOffset", "addBatch", "walCommit", "commitOffsets")
        val sums = scala.collection.mutable.Map.empty[String, Long]
          .withDefaultValue(0L)
        graft.streaming.CdcStream.lastRunProgress.foreach { j =>
          val node = mapper.readTree(j)
          val bid = Option(node.get("batchId")).map(_.asLong()).getOrElse(-1L)
          val d = node.get("durationMs")
          val parts = keys.map { k =>
            val v = Option(d).flatMap(x => Option(x.get(k)))
              .map(_.asLong()).getOrElse(0L)
            sums(k) += v
            f"$k=$v%d"
          }.mkString(" ")
          println(s"[batch $bid] $parts")
        }
        println("[streamprobe] totals(ms): " +
          keys.map(k => s"$k=${sums(k)}").mkString(" "))
      }
    }
    spark.stop()
  }
}
