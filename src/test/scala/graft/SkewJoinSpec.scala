package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join splitting — the RUNTIME answer to key skew, beside the
  * manual salting operator (SaltedJoin): a 90%-hot key's shuffle
  * partition is split into multiple reducer tasks after the map stage's
  * size stats arrive, with the build side replicated per split. At
  * 100 TB this is what keeps one hot user/URL from serializing a join on
  * a single reducer when the skew wasn't known at authoring time.
  */
class SkewJoinSpec extends AnyFunSuite {
  import SparkTest._

  test("AQE splits the hot key's partition; result identical to the plain join") {
    val ss = spark.newSession()
    // thresholds scaled to test data: any partition >8KB and 2x the
    // median is skewed; sort-merge join forced (no broadcast escape)
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
    ss.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")

    // fanout matters beyond CPU here: a skewed REDUCE partition is split
    // at map-output granularity, so a single-mapper shuffle (the one-row-
    // group test parquet) cannot be split at all — with one mapper the
    // rule correctly bails
    val ev = graft.sources.Tables.fanout(
      graft.sources.Tables.events(ss, "/root/testdata/sf0.01"))
    // 90% of fact rows land on key 0 — one shuffle partition dwarfs the rest
    val fact = ev.select(
      when(col("event_id") % 10 < 9, 0L)
        .otherwise(col("event_id") % 97).as("k"),
      col("value"))
    val dim = ev.select((col("event_id") % 97).as("k"),
        col("event_type")).distinct()

    val joined = fact.join(dim, "k")
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("rev"))
    val rows = joined.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDecimal(2))).sortBy(_._1).toSeq

    // the executed join must carry the skew=true marker
    val exec = joined.queryExecution.executedPlan
    val adaptive = exec.collectFirst { case a: AdaptiveSparkPlanExec => a }
    val planStr = adaptive.map(_.executedPlan.toString).getOrElse(exec.toString)
    assert(planStr.contains("isSkew=true") || planStr.contains("skew=true"),
      s"no skew-split marker in executed plan:\n$planStr")

    // and the result equals the skew-handling-off twin
    val off = spark.newSession()
    off.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    off.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val ev2 = graft.sources.Tables.events(off, "/root/testdata/sf0.01")
    val fact2 = ev2.select(
      when(col("event_id") % 10 < 9, 0L)
        .otherwise(col("event_id") % 97).as("k"),
      col("value"))
    val dim2 = ev2.select((col("event_id") % 97).as("k"),
        col("event_type")).distinct()
    val expect = fact2.join(dim2, "k")
      .groupBy("event_type").agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("rev"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2))).sortBy(_._1).toSeq
    assert(rows === expect)
  }
}
