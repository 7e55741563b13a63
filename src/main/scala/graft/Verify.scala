package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional dev-only filter: extra args restrict to those query names
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      // per-process warehouse — see Bench (round-3 advice)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${Fs.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold",
        sys.env.getOrElse("SPARK_GRAFT_LIST_PARALLEL_THRESHOLD", "1024"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Same per-query watchdog as Bench: one wedged query (AQE lost-event
    // hang observed under co-tenant load) must fail that query's row, not
    // stall the driver's whole correctness gate.
    val budgetMs = sys.env.getOrElse("SPARK_GRAFT_QUERY_BUDGET_MS", "300000").toLong
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val sc = spark.sparkContext
      val group = s"verify_$name"
      val watchdog = new Thread(() => {
        try {
          Thread.sleep(budgetMs)
          System.err.println(s"[verify] $name exceeded ${budgetMs}ms — cancelling")
          sc.cancelJobGroup(group)
        } catch { case _: InterruptedException => () }
      }, s"verify-watchdog-$name")
      watchdog.setDaemon(true)
      try {
        // per-query cache release — same lifecycle as Bench (round-3
        // verdict #1a): full storage pool per query, no cross-query LRU
        // eviction of an iterative plan's live cache; RDD-level blocks
        // (localCheckpoint, raw persists) released too — the catalog
        // never sees them
        spark.catalog.clearCache()
        sc.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        sc.setJobGroup(group, name, interruptOnCancel = true)
        watchdog.start()
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        System.err.println(
          f"[verify] $name ok in ${(System.nanoTime() - t0) / 1e9}%.1fs")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        watchdog.interrupt()
        sc.clearJobGroup()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
