package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FilterExec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, LessThan}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CdcWireScan, WireFormats}

/** The DSv2 wire connector's engine contracts, pinned on the PLAN — not
  * just result parity: absorbed filters leave the plan, the scan schema
  * is the projection, the limit reaches the reader, residual predicates
  * stay behind as a post-scan Filter. */
class Dsv2SourceSpec extends AnyFunSuite {
  import SparkTest._

  private def wire: DataFrame =
    spark.read.format("cdc-wire").load(WireFormats.jsonlDir(spark, Sf))

  private def scanOf(df: DataFrame): CdcWireScan = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collectFirst { case b: BatchScanExec => b.scan }
      .get.asInstanceOf[CdcWireScan]
  }

  test("comparison filters are absorbed into the scan and leave the plan") {
    val df = wire
      .where(col("event_type") === "purchase" && col("user_id") < 30)
      .select("event_id", "user_id")
    val scan = scanOf(df)
    assert(scan.pushed.contains(EqualTo("event_type", "purchase")))
    assert(scan.pushed.exists {
      case LessThan("user_id", v: Number) => v.longValue() == 30L
      case _ => false
    })
    // fully-absorbed predicates are REMOVED: no post-scan Filter remains
    val filters = df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }
    assert(filters.isEmpty, s"residual FilterExec left in plan: $filters")
  }

  test("column pruning: the scan reads exactly the projected columns") {
    val df = wire.select("event_id", "value")
    assert(scanOf(df).readSchema().fieldNames.toSeq ===
      Seq("event_id", "value"))
  }

  test("a predicate the reader cannot absorb stays as a post-scan Filter") {
    val df = wire.where(get_json_object(col("props"), "$.k") === "1")
    val scan = scanOf(df)
    assert(!scan.pushed.exists(_.references.contains("props")))
    assert(df.queryExecution.executedPlan.collect {
      case f: FilterExec => f
    }.nonEmpty, "expected the json predicate to remain as a Filter")
  }

  test("limit is pushed to the reader, partially (global limit kept)") {
    val df = wire.limit(3)
    assert(scanOf(df).limit === 3)
    assert(df.count() === 3)
  }

  test("one input partition per staged file") {
    val files = new java.io.File(WireFormats.jsonlDir(spark, Sf))
      .listFiles().count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    assert(scanOf(wire).planInputPartitions().length === files)
    assert(files >= 1)
  }

  test("write path: two-phase commit leaves only visible part files + _SUCCESS") {
    val dir = new java.io.File(s"/tmp/graft_wire/dsv2_spec_${Fs.pid}")
    val ev = graft.sources.Tables.events(spark, Sf)
    ev.write.format("cdc-wire").mode("overwrite").save(dir.toString)
    val names = dir.listFiles().map(_.getName).toSeq
    assert(names.contains("_SUCCESS"))
    assert(!names.exists(_.startsWith("_tmp-")), s"temp files survived: $names")
    assert(names.count(_.startsWith("part-")) === ev.rdd.getNumPartitions)
  }

  test("write path: truncate-overwrite replaces prior content completely") {
    val dir = s"/tmp/graft_wire/dsv2_spec_trunc_${Fs.pid}"
    val ev = graft.sources.Tables.events(spark, Sf)
    ev.write.format("cdc-wire").mode("overwrite").save(dir)
    val subset = ev.where(col("event_type") === "purchase")
    subset.write.format("cdc-wire").mode("overwrite").save(dir)
    assert(spark.read.format("cdc-wire").load(dir).count() === subset.count())
  }

  test("write path: round-trip through the connector is value-exact") {
    val dir = s"/tmp/graft_wire/dsv2_spec_rt_${Fs.pid}"
    val ev = graft.sources.Tables.events(spark, Sf)
    ev.write.format("cdc-wire").mode("overwrite").save(dir)
    val back = spark.read.format("cdc-wire").load(dir)
      .orderBy("event_id").collect().toSeq
    assert(back === ev.orderBy("event_id").collect().toSeq)
    assert(back.nonEmpty)
  }

  test("aggregate pushdown: scan emits pre-aggregated partials, merged by Spark") {
    val df = wire
      .where(col("user_id") < 50)
      .groupBy("event_type")
      .agg(count(col("event_id")).as("n"), min("event_id").as("min_id"),
        max("value").as("max_val"), sum("user_id").as("sum_users"))
    val scan = scanOf(df)
    assert(scan.agg.isDefined, "aggregation was not pushed")
    assert(scan.agg.get.groupCols === Seq("event_type"))
    // scan output is the aggregate schema, not raw rows
    assert(scan.readSchema().length === 5)
    assert(scan.description().contains("PushedAggregation"))
    // partial merge across files is exact: parity with the parquet twin
    val viaParquet = graft.sources.Tables.events(spark, Sf)
      .where(col("user_id") < 50)
      .groupBy("event_type")
      .agg(count(col("event_id")).as("n"), min("event_id").as("min_id"),
        max("value").as("max_val"), sum("user_id").as("sum_users"))
      .orderBy("event_type").collect().toSeq
    assert(df.orderBy("event_type").collect().toSeq === viaParquet)
    assert(viaParquet.nonEmpty)
  }

  test("aggregate pushdown: global aggregate over an empty selection is exact") {
    val agg = wire.where(col("user_id") < -1)
      .agg(count(col("event_id")).as("n"), min("event_id").as("min_id"))
    assert(scanOf(agg).agg.isDefined)
    val row = agg.collect()(0)
    assert(row.getLong(0) === 0L)
    assert(row.isNullAt(1))
  }

  test("aggregate pushdown declines what the reader cannot merge safely") {
    // double SUM is order-dependent: must NOT be absorbed
    val df = wire.groupBy("event_type").agg(sum("value").as("s"))
    assert(scanOf(df).agg.isEmpty)
    // distinct counts are not mergeable partials: must NOT be absorbed
    val dd = wire.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("d"))
    assert(scanOf(dd).agg.isEmpty)
  }

  test("connector scan equals the parquet table row-for-row") {
    val viaWire = wire
      .where(col("event_type") === "purchase" && col("user_id") < 5)
      .select("event_id", "ts", "user_id", "value")
      .orderBy("event_id").collect().toSeq
    val viaParquet = graft.sources.Tables.events(spark, Sf)
      .where(col("event_type") === "purchase" && col("user_id") < 5)
      .select("event_id", "ts", "user_id", "value")
      .orderBy("event_id").collect().toSeq
    assert(viaWire.nonEmpty)
    assert(viaWire === viaParquet)
  }

  test("micro-batch stream: admission control paces batches; restart resumes at the offset") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // private copy of the staged segments — the test appends a file
    val srcDir = Paths.get(WireFormats.jsonlStreamDir(spark, Sf))
    val dir = Files.createTempDirectory("graft_wire_stream")
    Files.list(srcDir).forEach { p =>
      val n = p.getFileName.toString
      if (!n.startsWith("_") && !n.startsWith("."))
        Files.copy(p, dir.resolve(n), StandardCopyOption.REPLACE_EXISTING)
    }
    val nFiles = Files.list(dir).count().toInt
    assert(nFiles >= 4, s"need multi-file staging, got $nFiles")

    val ckpt = Files.createTempDirectory("graft_wire_ckpt")
    val out = Files.createTempDirectory("graft_wire_out")
    def runOnce(): Unit = {
      val q = spark.readStream.format("cdc-wire")
        .schema(WireFormats.EventsSchema)
        .option("maxFilesPerTrigger", "2")
        .load(dir.toString)
        .select(col("event_id"))
        .writeStream.format("parquet").option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val batches = q.recentProgress.toSeq.filter(_.numInputRows > 0)
      assert(batches.size <= math.ceil(nFiles / 2.0).toInt + 1)
      if (Files.list(out).count() > 0) () // parquet sink wrote
    }
    runOnce()
    val afterFirst = spark.read.parquet(out.toString).count()
    val total = wire.count()
    assert(afterFirst === total, "first drain must consume every segment")

    // ROTATION: a new segment appears; the restarted stream must consume
    // ONLY it (offset log resume), never reprocess the old segments
    val extra = spark.range(1).select(
      lit(9999999L).as("event_id"), lit("2024-02-01 00:00:00.000000").as("ts"),
      lit(1L).as("user_id"), lit("click").as("event_type"),
      lit(1.5).as("value"), lit("""{"k": 1}""").as("props"))
    val tmpNew = Files.createTempDirectory("graft_wire_new")
    extra.coalesce(1).write.mode("overwrite").json(tmpNew.toString)
    val newFile = Files.list(tmpNew).filter(_.getFileName.toString.endsWith(".json"))
      .findFirst().get()
    // later-sorting name = appended segment
    Files.copy(newFile, dir.resolve("part-zzzz-rotated.json"))
    runOnce()
    val afterSecond = spark.read.parquet(out.toString).count()
    assert(afterSecond === total + 1,
      s"restart must consume only the rotated-in segment: $afterFirst -> $afterSecond")
    Seq(dir, ckpt, out, tmpNew).foreach(p =>
      graft.Fs.deleteRecursively(p.toFile))
  }

  test("micro-batch offsets carry a file-name watermark; listing drift fails fast") {
    import java.nio.file.Files
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val dir = Files.createTempDirectory("graft_wire_drift")
    Seq("seg-a.json", "seg-b.json", "seg-c.json").foreach { n =>
      Files.write(dir.resolve(n),
        """{"event_id":1,"user_id":1,"event_type":"click","value":1.0}""".getBytes)
    }
    val stream = new graft.sources.CdcWireMicroBatchStream(
      dir.toString, WireFormats.EventsSchema, WireFormats.EventsSchema,
      Array.empty, None)
    val start = stream.initialOffset()
    val end = stream.latestOffset(start, ReadLimit.allAvailable())
    // watermark round-trips through the offset log serde
    val endBack = stream.deserializeOffset(end.json())
    assert(endBack === end)
    assert(end.asInstanceOf[graft.sources.CdcWireOffset].last === "seg-c.json")
    assert(stream.planInputPartitions(start, end).length === 3)

    // an earlier-sorting name appears: committed positions no longer map
    // to the files they named — must throw, not silently remap
    Files.write(dir.resolve("seg-0.json"),
      """{"event_id":2,"user_id":2,"event_type":"view","value":2.0}""".getBytes)
    val e1 = intercept[IllegalArgumentException] {
      stream.planInputPartitions(start, end)
    }
    assert(e1.getMessage.contains("listing drift"))
    Files.delete(dir.resolve("seg-0.json"))

    // a PAIRED delete+insert that preserves both the count and the
    // boundary name: positions remap but n and `last` still match —
    // only the full-prefix listing signature can catch it
    Files.delete(dir.resolve("seg-a.json"))
    Files.write(dir.resolve("seg-0.json"),
      """{"event_id":3,"user_id":3,"event_type":"view","value":3.0}""".getBytes)
    val e2 = intercept[IllegalArgumentException] {
      stream.planInputPartitions(start, end)
    }
    assert(e2.getMessage.contains("listing signature"))
    Files.delete(dir.resolve("seg-0.json"))
    Files.write(dir.resolve("seg-a.json"),
      """{"event_id":1,"user_id":1,"event_type":"click","value":1.0}""".getBytes)

    // a consumed segment vanishes (compaction): same fail-fast
    Files.delete(dir.resolve("seg-b.json"))
    val e3 = intercept[IllegalArgumentException] {
      stream.planInputPartitions(start, end)
    }
    assert(e3.getMessage.contains("listing drift"))
    graft.Fs.deleteRecursively(dir.toFile)
  }

  test("epoch re-commit with fewer partitions removes the first attempt's extra segments") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_wire_epoch")
    // first attempt of epoch 5 committed 4 partitions before the driver died
    (0 until 4).foreach { p =>
      Files.write(dir.resolve(s"part-e5-$p.json"), s"""{"event_id":$p}""".getBytes)
    }
    // unrelated epoch must survive untouched
    Files.write(dir.resolve("part-e4-0.json"), """{"event_id":40}""".getBytes)
    // replay of epoch 5 runs with only 2 partitions
    val msgs: Array[org.apache.spark.sql.connector.write.WriterCommitMessage] =
      (0 until 2).map { p =>
        val tmp = dir.resolve(s"_tmp-e5-$p-99.json")
        Files.write(tmp, s"""{"event_id":${100 + p}}""".getBytes)
        graft.sources.CdcWireCommit(tmp.toString, s"part-e5-$p.json")
          : org.apache.spark.sql.connector.write.WriterCommitMessage
      }.toArray
    val write = new graft.sources.CdcWireWrite(
      dir.toString, WireFormats.EventsSchema, truncate = false)
    write.commit(5L, msgs)
    val names = dir.toFile.listFiles().map(_.getName).toSet
    assert(names === Set("part-e5-0.json", "part-e5-1.json", "part-e4-0.json"),
      s"epoch 5's visible set must be exactly the committed one: $names")
    graft.Fs.deleteRecursively(dir.toFile)
  }

  test("streaming write: one visible segment per (epoch, partition), temps gone") {
    import org.apache.spark.sql.streaming.Trigger
    import java.nio.file.Files
    val in = Files.createTempDirectory("graft_wsink_in")
    graft.sources.Tables.events(spark, Sf).repartition(4)
      .write.mode("overwrite").parquet(in.toString)
    val out = Files.createTempDirectory("graft_wsink_out")
    val ckpt = Files.createTempDirectory("graft_wsink_ck")
    val q = spark.readStream
      .schema(graft.sources.Tables.events(spark, Sf).schema)
      .option("maxFilesPerTrigger", "2").parquet(in.toString)
      .writeStream.format("cdc-wire").option("path", out.toString)
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val names = Option(out.toFile.listFiles()).get.map(_.getName).toSeq
    assert(names.forall(!_.startsWith("_tmp")), s"temps survived: $names")
    val seg = "part-e(\\d+)-(\\d+)\\.json".r
    val epochs = names.collect { case seg(e, _) => e.toLong }.distinct
    assert(epochs.size >= 2, s"expected multi-epoch segments, got $names")
    assert(names.count(seg.matches) === names.count(_.endsWith(".json")))
    // the topic's content equals the input
    val back = spark.read.format("cdc-wire")
      .schema(graft.sources.Tables.events(spark, Sf).schema)
      .load(out.toString)
    assert(back.count() === graft.sources.Tables.events(spark, Sf).count())
    Seq(in, out, ckpt).foreach(p => graft.Fs.deleteRecursively(p.toFile))
  }
}
