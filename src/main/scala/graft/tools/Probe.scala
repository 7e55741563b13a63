package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: time one query repeatedly + dump its physical plan.
  * Usage: runMain graft.tools.Probe <queryName> [sfDir] [reps]
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    // bench parity: same cores/partitions as Bench so timings transfer
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
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sfDir).explain("formatted")
    (1 to reps).foreach { i =>
      // bench parity: each rep starts with a clean cache, like Bench's
      // per-query lifecycle — otherwise reps 2+ of cache-using queries
      // measure the warm path the bench never takes
      spark.catalog.clearCache()
      graft.streaming.CdcStream.lastRunProgress = Nil
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[probe] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2fs ($n rows)")
      graft.streaming.CdcStream.lastRunProgress.foreach(p => println(s"[progress-$i] $p"))
    }
    if (sys.env.contains("SPARK_GRAFT_FINAL_PLAN")) {
      // AQE finalizes reuse decisions at runtime: the pre-execution
      // explain shows duplicated exchange subtrees even when execution
      // reuses them, so dump the EXECUTED plan after one action
      val df = fn(spark, sfDir)
      df.count()
      println("[final-plan]\n" + df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
