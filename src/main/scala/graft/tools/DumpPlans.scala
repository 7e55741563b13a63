package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for the named queries into per-query
  * files — the optimization-round evidence format
  * (`plans/r11/<query>_{before,after}.txt`). Usage:
  *   runMain graft.tools.DumpPlans <outDir> <suffix> <query> [query...]
  * Streaming drains return a scan of their drained output, so their
  * plan files carry the inner eager plans too when the query records
  * them ([[graft.operators.SegmentStore.EagerPlans]]).
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val outDir = new java.io.File(args(0))
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    outDir.mkdirs()
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${graft.Fs.pid}")
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.operators.SegmentStore.EagerPlans.enabled = true
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val sb = new StringBuilder
      sb.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      graft.operators.SegmentStore.EagerPlans.drain().toSeq.sortBy(_._1)
        .foreach { case (tag, p) =>
          sb.append(s"\n=== inner plan of $tag (materialized eagerly " +
            "inside the call) ===\n" + p)
        }
      java.nio.file.Files.write(
        new java.io.File(outDir, s"${name}_$suffix.txt").toPath,
        sb.toString.getBytes("UTF-8"))
      println(s"[plans] $name -> ${name}_$suffix.txt")
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
