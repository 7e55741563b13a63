package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev scratch: run one query once and dump every Spark JOB it ran —
  * start offset, duration, description/callsite — so a drain's
  * per-micro-batch cost decomposes into its actual jobs (write, stats
  * aggregate, bloom build, …). Usage:
  *   runMain graft.tools.JobProbe <queryName> [sfDir] [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
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
    final case class Job(id: Int, t0: Long, desc: String,
        var tEnd: Long = 0L, var nTasks: Int = 0)
    val jobs = new ConcurrentLinkedQueue[Job]()
    val byId = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        val j = Job(e.jobId, e.time, desc,
          nTasks = e.stageInfos.map(_.numTasks).sum)
        jobs.add(j); byId.put(e.jobId, j); ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(byId.get(e.jobId)).foreach(_.tEnd = e.time)
      }
    })
    val fn = graft.SparkEntry.queries(name)
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      jobs.clear(); byId.clear()
      val t0 = System.nanoTime()
      val wall0 = System.currentTimeMillis()
      val n = fn(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[jobprobe] $name run $i: $dt%.2fs ($n rows)")
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        var covered = 0L
        jobs.asScala.toSeq.sortBy(_.t0).foreach { j =>
          val d = if (j.tEnd > 0) j.tEnd - j.t0 else -1L
          if (d > 0) covered += d
          println(f"[job] +${(j.t0 - wall0) / 1000.0}%7.2fs ${d / 1000.0}%7.3fs " +
            f"tasks=${j.nTasks}%-4d ${j.desc.take(110)}")
        }
        println(f"[jobprobe] sum of job durations: ${covered / 1000.0}%.2fs " +
          f"of $dt%.2fs wall (gap = driver/planning/commit)")
      }
    }
    spark.stop()
  }
}
