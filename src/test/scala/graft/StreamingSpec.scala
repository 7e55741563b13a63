package graft

import org.apache.spark.api.java.Optional
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, TestGroupState, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cdc, CdcEvent, CdcRowImages}
import graft.operators.ChangelogApply
import graft.streaming.CdcStream

class StreamingSpec extends AnyFunSuite {
  import SparkTest._

  test("streaming apply ≡ batch apply on the generated changelog") {
    val stream = CdcStream.customerSnapshotStream(spark, Sf)
    val batch = ChangelogApply.customerSnapshot(spark, Sf)
    assert(stream.count() === batch.count())
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("streaming sessionize ≡ batch sessionization of the capped slice") {
    import org.apache.spark.sql.functions._
    val streamed = CdcStream.streamingSessionize(spark, Sf)
    val events = graft.sources.Tables.events(spark, Sf)
    val maxTs = events.agg(max(col("ts"))).head().getTimestamp(0)
    val bound = new java.sql.Timestamp(maxTs.getTime - 91 * 60 * 1000L)
    val batch = events
      .where(col("ts") <= lit(bound))
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("session_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
    assert(streamed.count() > 0, "drained session set must be non-empty")
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "append-mode drained sessions must equal the batch session set")
  }

  test("D8/D9 — checkpoint resume: restart skips consumed input, restores state") {
    import spark.implicits._
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft_resume_in").toString
    val ckpt = Files.createTempDirectory("graft_resume_ckpt").toString
    val outDir = Files.createTempDirectory("graft_resume_out").toString

    def ev(seq: Long, op: String, img: Seq[String]) =
      CdcEvent(seq, "flv://m/g/t", "f", seq, op, null, Seq("k", "v"),
        Seq(CdcRowImages(null, img)))
    def writeBatch(name: String, evs: CdcEvent*): Unit =
      evs.toSeq.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")

    // memory sink cannot recover from a checkpoint; the file sink is the
    // fault-tolerant (exactly-once) one — the D8/D9 analogue proper.
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(Cdc.EventSchema)
        .parquet(s"$inDir/*")
      val q = CdcStream.applyStream(stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    // run 1: two inserts, consumed and checkpointed
    writeBatch("b1", ev(10, Cdc.OpAdd, Seq("a", "1")), ev(11, Cdc.OpAdd, Seq("b", "1")))
    runOnce()
    assert(spark.read.parquet(outDir).count() === 2)

    // run 2 (fresh query, same checkpoint): an update for a and a STALE
    // (lower-sequence) event for b. Total sink content must be run-1
    // emissions + {a's new image, b's RUN-1 image}: b re-emitting image
    // "1" (not "0") proves key state was restored from the checkpoint,
    // and no duplicate of run-1's rows proves the consumed input was
    // not reprocessed (offsets resumed).
    writeBatch("b2", ev(20, Cdc.OpUpdate, Seq("a", "2")), ev(5, Cdc.OpAdd, Seq("b", "0")))
    runOnce()
    val all = spark.read.parquet(outDir).as[Seq[String]].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(all === Map(
      Seq("a", "1") -> 1, Seq("a", "2") -> 1, Seq("b", "1") -> 2), s"got $all")
  }

  test("S2/S3 — ProcessingTime(500ms) poll + mid-run file rotation ≡ batch apply") {
    import spark.implicits._
    import java.nio.file.Files
    import org.apache.spark.sql.functions._
    // The reference's producer loop polls every >=500ms and discovers
    // rotated-in binlog files via the index scan (manager.rs:22,52-86,
    // 173-187). Spark twin: ProcessingTime("500 milliseconds") trigger
    // over a directory glob that gains a file mid-run.
    val inDir = Files.createTempDirectory("graft_rot_in").toString
    val events = graft.sources.CdcGen.customerEvents(spark, Sf)
    val b1 = events.where(col("sequence") < (1L << 30)) // DDL + inserts
    val b2 = events.where(col("sequence") >= (1L << 30)) // updates + deletes
    b1.coalesce(1).write.mode("overwrite").parquet(s"$inDir/b1")

    val stream = spark.readStream.schema(Cdc.EventSchema).parquet(s"$inDir/*")
    val q = CdcStream.applyStream(stream)
      .writeStream.format("memory").queryName("rot_t")
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    q.processAllAvailable()
    // rotation: a new file appears in the watched tree mid-run
    b2.coalesce(1).write.mode("overwrite").parquet(s"$inDir/b2")
    q.processAllAvailable()
    val nBatches = q.recentProgress.map(_.batchId).distinct.length
    q.stop()
    assert(nBatches >= 2, s"expected >=2 micro-batches, saw $nBatches")

    // Emissions = batch-1 live images (all inserts) + batch-2 live images
    // (the updated rows that were not subsequently deleted; deletions
    // emit nothing under append FMGWS).
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
    val orig = cust.select($"c_custkey", $"c_name", $"c_nationkey",
      $"c_acctbal", $"c_mktsegment")
    val updated = cust.where($"c_custkey" % 5 === 0 && $"c_custkey" % 7 =!= 0)
      .select($"c_custkey", $"c_name", $"c_nationkey",
        ($"c_acctbal" + 100.0).as("c_acctbal"),
        when($"c_custkey" % 25 === 0, lit(null).cast("string"))
          .otherwise($"c_mktsegment").as("c_mktsegment"))
    val expected = orig.unionByName(updated)
    val emitted = graft.sources.CdcGen.decodeCustomer(spark.table("rot_t"))
    assert(emitted.count() === expected.count())
    assert(emitted.except(expected).isEmpty && expected.except(emitted).isEmpty)
  }

  test("schema-aware FMGWS: ALTER widening carries across micro-batches") {
    import spark.implicits._
    import graft.model.Value._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = CdcStream.applySchemaStream(input.toDF())
      .writeStream.format("memory").queryName("sch_t")
      .outputMode("append").start()

    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def ddl(seq: Long, sql: String) = CdcEvent(
      seq, "flv://m/d1", "f", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, op: String, before: Seq[String], after: Seq[String]) =
      CdcEvent(seq, "flv://m/d1/t", "f", seq, op, null, null,
        Seq(CdcRowImages(before, after)))

    // batch 1: create + insert a 2-cell row
    input.addData(
      ddl(1, "CREATE TABLE t (a INT, b INT)"),
      row(2, Cdc.OpAdd, null, cells(VString("x"), VString("1"))))
    q.processAllAvailable()
    // batch 2: ALTER ADD widens the carried state; the 3-cell post-ALTER
    // before-image must match the widened row
    input.addData(
      ddl(3, "ALTER TABLE t ADD COLUMN c DATE"),
      row(4, Cdc.OpUpdate,
        cells(VString("x"), VString("1"), VNull),
        cells(VString("x"), VString("1"), VDate(2020, 1, 2))))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("sch_t")
      .select($"image", $"columns").as[(Seq[String], Seq[String])]
      .collect().toSeq
    // batch-1 emission: the unwidened insert; batch-2: the updated row
    assert(out.contains((cells(VString("x"), VString("1")), Seq("a", "b"))))
    assert(out.contains((
      cells(VString("x"), VString("1"), VDate(2020, 1, 2)),
      Seq("a", "b", "c"))))
  }

  test("schema-aware FMGWS: a later-batch TRUNCATE wipes carried state, keeps columns") {
    import spark.implicits._
    import graft.model.Value._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val q = CdcStream.applySchemaStream(input.toDF())
      .writeStream.format("memory").queryName("trunc_t")
      .outputMode("append").start()

    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def ddl(seq: Long, sql: String) = CdcEvent(
      seq, "flv://m/d3", "f", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, op: String, before: Seq[String], after: Seq[String]) =
      CdcEvent(seq, "flv://m/d3/t", "f", seq, op, null, null,
        Seq(CdcRowImages(before, after)))

    // batch 1: create + two inserts
    input.addData(
      ddl(1, "CREATE TABLE t (a INT, b INT)"),
      row(2, Cdc.OpAdd, null, cells(VSignedInteger(1), VString("x"))),
      row(3, Cdc.OpAdd, null, cells(VSignedInteger(2), VString("y"))))
    q.processAllAvailable()
    // batch 2: TRUNCATE (verbatim passthrough) + one post-wipe insert —
    // state carried from batch 1 must be gone, the column list must not
    input.addData(
      ddl(4, "TRUNCATE TABLE t"),
      row(5, Cdc.OpAdd, null, cells(VSignedInteger(3), VString("z"))))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("trunc_t")
      .select($"image", $"columns").as[(Seq[String], Seq[String])]
      .collect().toSeq
    // append mode emits each batch's live snapshot: pre-TRUNCATE rows
    // appear ONCE (batch 1 only — a failed wipe would re-emit them in
    // batch 2), the post-TRUNCATE row once, with the column list intact
    assert(out.count(_._1 == cells(VSignedInteger(1), VString("x"))) === 1)
    assert(out.count(_._1 == cells(VSignedInteger(2), VString("y"))) === 1)
    assert(out.count(_ == (cells(VSignedInteger(3), VString("z")),
      Seq("a", "b"))) === 1)
    assert(out.size === 3)
  }

  test("keyed schema-aware apply: per-image counts, DDL via the broadcast timeline") {
    import spark.implicits._
    import graft.model.Value._
    implicit val sqlCtx = spark.sqlContext
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def ddl(seq: Long, sql: String) = CdcEvent(
      seq, "flv://m/d2", "f", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, op: String, before: Seq[String], after: Seq[String]) =
      CdcEvent(seq, "flv://m/d2/t", "f", seq, op, null, null,
        Seq(CdcRowImages(before, after)))

    // side-input timeline: CREATE (a,b) @1, ALTER ADD c @4, RENAME a→k @6
    val ddlBatch = Seq(
      ddl(1, "CREATE TABLE t (a INT, b INT)"),
      ddl(4, "ALTER TABLE t ADD COLUMN c INT"),
      ddl(6, "ALTER TABLE t RENAME COLUMN a TO k")).toDS().toDF()

    val input = MemoryStream[CdcEvent]
    val q = CdcStream.applySchemaStreamKeyed(input.toDF(), ddlBatch)
      .writeStream.format("memory").queryName("keyed_t")
      .outputMode("append").start()

    // batch 1: two pre-ALTER inserts (2-cell images)
    input.addData(
      row(2, Cdc.OpAdd, null, cells(VString("x"), VString("1"))),
      row(3, Cdc.OpAdd, null, cells(VString("y"), VString("1"))))
    q.processAllAvailable()
    // batch 2: post-ALTER update of x — its 3-cell widened before-image
    // must land on the same canonical key batch 1's 2-cell insert created
    // — and a delete of y
    input.addData(
      row(5, Cdc.OpUpdate, cells(VString("x"), VString("1"), VNull),
        cells(VString("x"), VString("2"), VNull)),
      row(7, Cdc.OpDelete, null, cells(VString("y"), VString("1"), VNull)))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("keyed_t")
      .select($"image", $"columns").as[(Seq[String], Seq[String])]
      .collect().toSeq
    val finalCols = Seq("k", "b", "c") // post-rename names, widened
    // batch 1: both inserts, canonicalized to final slots
    assert(out.count(_ == ((cells(VString("x"), VString("1"), VNull), finalCols))) === 1)
    assert(out.count(_ == ((cells(VString("y"), VString("1"), VNull), finalCols))) === 1)
    // batch 2: only x's new image is live (old key zeroed, y deleted)
    assert(out.count(_ == ((cells(VString("x"), VString("2"), VNull), finalCols))) === 1)
    assert(out.size === 3, s"got $out")
  }

  test("DDL-slice collect is capped: an over-cap changelog fails cleanly, not OOM") {
    import org.apache.spark.sql.functions._
    // a malformed/adversarial changelog with >MaxDdlEvents Query events
    // must fail with a clear error BEFORE the driver-side timeline collect
    val ddl = spark.range(CdcStream.MaxDdlEvents + 1).select(
      col("id").as("sequence"), lit("flv://m/d9").as("uri"),
      lit(Cdc.OpQuery).as("op"), lit("CREATE TABLE t (a INT)").as("query"))
    val e = intercept[IllegalStateException] {
      CdcStream.applySchemaStreamKeyed(ddl, ddl)
    }
    assert(e.getMessage.contains("DDL slice exceeds"))
  }

  test("tombstone eviction: timed-out state is removed; a re-insert starts fresh") {
    import graft.streaming.CdcStream.{ApplyState, KeyedImageEvent}
    def ev(seq: Long, op: String, img: Seq[String]) =
      KeyedImageEvent(seq, 0, op, img, "u", "k")

    // 1. delete → tombstone kept, reap timeout armed
    val s1 = TestGroupState.create[ApplyState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(),
      hasTimedOut = false)
    assert(CdcStream.applyEvents(reapTombstones = true)(("u", "k"),
      Iterator(ev(10, Cdc.OpDelete, Seq("k", "1"))), s1).isEmpty)
    assert(s1.get.deleted)
    assert(s1.getTimeoutTimestampMs.isPresent, "tombstone must arm a reap timeout")

    // 2. the timeout fires → state removed from the store
    val s2 = TestGroupState.create[ApplyState](Optional.of(s1.get),
      GroupStateTimeout.ProcessingTimeTimeout, 999999L, Optional.empty(),
      hasTimedOut = true)
    assert(CdcStream.applyEvents(reapTombstones = true)(("u", "k"),
      Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved)

    // 3. post-reap, even a LOWER-sequence insert is accepted — fresh state
    // holds no tombstone sequence to reject it (the observable proof the
    // key was reaped; the TTL contract is that such replays are older than
    // the source's max lateness)
    val s3 = TestGroupState.create[ApplyState](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000000L, Optional.empty(),
      hasTimedOut = false)
    val out = CdcStream.applyEvents(reapTombstones = true)(("u", "k"),
      Iterator(ev(3, Cdc.OpAdd, Seq("k", "9"))), s3)
    assert(out.toSeq === Seq(Seq("k", "9")))
  }

  test("keyed fold: zero-count key arms the reap timeout; timeout removes it") {
    import graft.streaming.CdcStream.{ImageCount, ImageDelta}
    val key = ("d", "t", Seq("x"))
    val s1 = TestGroupState.create[ImageCount](Optional.empty(),
      GroupStateTimeout.ProcessingTimeTimeout, 1000L, Optional.empty(),
      hasTimedOut = false)
    assert(CdcStream.foldImageDeltas(reapTombstones = true)(key,
      Iterator(ImageDelta("d", "t", Seq("x"), 5L, 0, 0)), s1).isEmpty)
    assert(s1.get.count === 0L)
    assert(s1.getTimeoutTimestampMs.isPresent)
    val s2 = TestGroupState.create[ImageCount](Optional.of(s1.get),
      GroupStateTimeout.ProcessingTimeTimeout, 999999L, Optional.empty(),
      hasTimedOut = true)
    assert(CdcStream.foldImageDeltas(reapTombstones = true)(key,
      Iterator.empty, s2).isEmpty)
    assert(s2.isRemoved)
  }

  test("state carries across micro-batches (insert batch 1, update+delete batch 2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val snapshot = CdcStream.applyStream(input.toDF())
    val q = snapshot.writeStream.format("memory").queryName("fmgws_t")
      .outputMode("append").start()

    def ev(seq: Long, op: String, img: Seq[String]) =
      CdcEvent(seq, "flv://m/g/t", "f", seq, op, null, Seq("k", "v"),
        Seq(CdcRowImages(null, img)))

    input.addData(ev(1, Cdc.OpAdd, Seq("a", "1")), ev(2, Cdc.OpAdd, Seq("b", "1")))
    q.processAllAvailable()
    input.addData(ev(3, Cdc.OpUpdate, Seq("a", "2")), ev(4, Cdc.OpDelete, Seq("b", "1")))
    q.processAllAvailable()
    q.stop()

    // batch 1 emitted both inserts; batch 2 emitted the updated image for
    // key a only (b deleted → no emission). Latest emission per key wins.
    val emitted = spark.table("fmgws_t").as[Seq[String]].collect().toSeq
    assert(emitted.contains(Seq("a", "2")), s"got $emitted")
    assert(!emitted.contains(Seq("b", "2")))
    assert(emitted.count(_.head == "b") === 1) // only the batch-1 insert
  }

  test("stream-static dedup gate is STATELESS: no state store in any micro-batch") {
    val out = CdcStream.streamingIncrementalDedup(spark, Sf)
    val n = out.count()
    assert(n > 0)
    // a stream-static join must not register state operators — state
    // growth here would mean the join was planned stream-stream
    val progress = CdcStream.lastRunProgress
    assert(progress.nonEmpty)
    progress.foreach { p =>
      assert(p.contains("\"stateOperators\":[]"),
        s"expected no state operators in progress:\n$p")
    }
  }

  test("state CHANGE FEED: per-batch state history replays to the final aggregate") {
    import org.apache.spark.sql.functions._
    val ss = CdcStream.streamSession(spark, flush = false)
    val ev = graft.sources.Tables.events(ss, Sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val src = CdcStream.streamOf(ev, "events_cf", Sf,
      maxFilesPerTrigger = Some(3))
    val agg = src.groupBy("user_id").agg(count(lit(1)).as("n"))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cf_ckpt")
    val q = agg.writeStream.format("memory").queryName("cf_sink")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      // the state AUDIT LOG: every (batch, key, buffer) transition —
      // what a 100 TB operator replays to debug "when did this key's
      // state go wrong" without rerunning the job
      val cf = ss.read.format("statestore")
        .option("readChangeFeed", "true").option("changeStartBatchId", "0")
        .load(ckpt.toString)
        .select(col("batch_id"), col("change_type"),
          col("key.user_id").as("user_id"), col("value.count").as("n"))
      val feed = cf.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      assert(feed.map(_._1).distinct.size >= 2,
        s"expected multi-batch history, got batches ${feed.map(_._1).distinct}")
      assert(feed.forall(_._2 == "update"))
      // latest change per key == the batch aggregate
      val last = feed.groupBy(_._3).view
        .mapValues(ch => ch.maxBy(_._1)._4).toMap
      val want = ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last === want)
      // counts must be non-decreasing per key across batches (an
      // aggregation buffer only accumulates)
      feed.groupBy(_._3).values.foreach { ch =>
        val sorted = ch.sortBy(_._1).map(_._4)
        assert(sorted === sorted.sorted, s"non-monotone history: $ch")
      }
    } finally {
      if (q.isActive) q.stop()
      graft.Fs.deleteRecursively(ckpt.toFile)
    }
  }

  test("streaming observe(): per-micro-batch gate metrics sum to batch totals") {
    import org.apache.spark.sql.functions._
    val ss = CdcStream.streamSession(spark, flush = false)
    val ev = graft.sources.Tables.events(ss, Sf)
      .select(col("event_id"), col("event_type"), col("value"))
    // multi-batch replay so per-batch metric ROWS actually accumulate
    val src = CdcStream.streamOf(ev, "events_obs", Sf,
      maxFilesPerTrigger = Some(3))
    val gated = src.observe("gate",
        count(lit(1)).as("seen"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
      .where(col("event_type") === "click")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_obs_ckpt")
    val q = gated.writeStream.format("memory").queryName("obs_sink")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    try {
      q.awaitTermination()
      val per = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("gate")))
        .map(r => (r.getAs[Long]("seen"), r.getAs[Long]("clicks")))
      assert(per.size >= 2, s"expected multi-batch metrics, got $per")
      val batch = ev.agg(count(lit(1)),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)))
        .head()
      assert(per.map(_._1).sum === batch.getLong(0))
      assert(per.map(_._2).sum === batch.getLong(1))
      // and the sink got exactly the clicks the metric counted
      assert(ss.table("obs_sink").count() === per.map(_._2).sum)
    } finally {
      if (q.isActive) q.stop()
      graft.Fs.deleteRecursively(ckpt.toFile)
    }
  }
}
