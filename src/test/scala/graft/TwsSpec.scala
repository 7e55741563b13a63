package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{CdcStream, TwsOps}

/** transformWithState (arbitrary stateful v2) pins:
  *  - the drained running stats equal the batch aggregate (oracle twin),
  *  - the replay really is multi-micro-batch (cross-batch carry of BOTH
  *    state variables is exercised, not a single-batch fold),
  *  - the RocksDB provider conf is scoped to the dedicated session and
  *    never leaks into the parent or the shared drain sessions.
  */
class TwsSpec extends AnyFunSuite {
  import SparkTest._

  test("tws running stats ≡ batch aggregate; replay is multi-batch") {
    import org.apache.spark.sql.functions._
    val got = TwsOps.runningUserStats(spark, Sf)
    val events = graft.sources.Tables.events(spark, Sf)
    val want = events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("n_clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"),
        (sum((col("value").cast("decimal(18,2)") * 100).cast("long")) / 100.0)
          .as("revenue"),
        max(unix_micros(col("ts"))).as("last_us"))
    assert(got.count() > 0)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      "drained TWS snapshot must equal the batch aggregate")

    val batches = CdcStream.lastRunProgress.count(_.contains("\"numInputRows\""))
    assert(batches >= 2,
      s"TWS replay must span multiple micro-batches, saw $batches")
  }

  test("state v2 restores across query restarts (ValueState + MapState)") {
    import java.nio.file.Files
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.TwsOps.{EventIn, RunningStatsProcessor}
    val ss = TwsOps.twsSession(spark)
    import ss.implicits._
    val inDir = Files.createTempDirectory("graft_tws_in").toString
    val ckpt = Files.createTempDirectory("graft_tws_ckpt").toString
    val outDir = Files.createTempDirectory("graft_tws_out").toString

    def writeBatch(name: String, rows: EventIn*): Unit =
      rows.toSeq.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")
    def runOnce(): Unit = {
      val stream = ss.readStream.schema(Encoders.product[EventIn].schema)
        .parquet(s"$inDir/*").as[EventIn]
      val q = stream.groupByKey(_.user_id)
        .transformWithState(new RunningStatsProcessor,
          TimeMode.None(), OutputMode.Append())
        .toDF().writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    writeBatch("b1", EventIn(1, "click", 100, 20), EventIn(1, "view", 50, 10),
      EventIn(2, "purchase", 500, 30))
    runOnce()
    writeBatch("b2", EventIn(1, "purchase", 25, 40), EventIn(3, "click", 10, 50))
    runOnce()

    // run-2 emissions must CARRY run-1 state from the checkpoint: user
    // 1's totals (ValueState) AND click count (MapState) continue, the
    // consumed b1 is not reprocessed (no duplicate run-1 emissions).
    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = Map(
      (1L, 2L, 1L, 0L, 150L, 20L) -> 1, // run 1: 2 events, 1 click
      (2L, 1L, 0L, 1L, 500L, 30L) -> 1,
      (1L, 3L, 1L, 1L, 175L, 40L) -> 1, // run 2: carried + purchase
      (3L, 1L, 1L, 0L, 10L, 50L) -> 1)
    assert(got === want, s"got $got")
  }

  test("event-time timers + ListState: sessions emit on watermark expiry") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.TwsOps.{Click, Session, SessionTimerProcessor}
    val ss = TwsOps.twsSession(spark)
    import ss.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)

    val in = MemoryStream[Click]
    val out = in.toDS()
      .withWatermark("ts", "10 seconds")
      .as[Click]
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(30000L),
        TimeMode.EventTime(), OutputMode.Append())
    val ckpt = java.nio.file.Files.createTempDirectory("graft_timer_ckpt")
    val q = out.toDF().writeStream.format("memory").queryName("tws_timers")
      .option("checkpointLocation", ckpt.toString)
      .outputMode("append").start()
    def drained(): Set[(Long, Long, Long)] = {
      q.processAllAvailable()
      ss.table("tws_timers").as[(Long, Long, Long)].collect().toSet
    }

    // batch 1: user 1 clicks at 1,2,3s; user 2 at 5s. Timers land at
    // 33s and 35s; watermark after the batch is 5s-10s — nothing fires.
    in.addData(Click(1, ts(1)), Click(1, ts(2)), Click(1, ts(3)),
      Click(2, ts(5)))
    assert(drained() === Set.empty)

    // batch 2: user 1 again at 60s — EXTENDS user 1's session (timer
    // re-registered to 90s). Watermark afterwards: 50s.
    in.addData(Click(1, ts(60)))
    assert(drained() === Set.empty)

    // batch 3: unrelated key at 120s. During this batch the watermark
    // (50s) passes user 2's 35s timer → user 2's session emits; user
    // 1's re-registered 90s timer must NOT fire (the old 33s one was
    // deleted — this is the re-registration pin).
    in.addData(Click(99, ts(120)))
    assert(drained() === Set((2L, 1L, 5000L)))

    // batch 4: advance the watermark past 90s → user 1 emits ONE
    // session of all 4 buffered clicks (ListState carried across three
    // batches), first at 1s.
    in.addData(Click(98, ts(200)))
    assert(drained() === Set((2L, 1L, 5000L), (1L, 4L, 1000L)))
    q.stop()
    graft.Fs.deleteRecursively(ckpt.toFile)
  }

  test("state TTL: short-TTL value expires across a restart, long-TTL survives") {
    import java.nio.file.Files
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.TwsOps.{EventIn, TtlCountsProcessor}
    val ss = TwsOps.twsSession(spark)
    import ss.implicits._
    val inDir = Files.createTempDirectory("graft_ttl_in").toString
    val ckpt = Files.createTempDirectory("graft_ttl_ckpt").toString
    val outDir = Files.createTempDirectory("graft_ttl_out").toString

    def writeBatch(name: String, rows: EventIn*): Unit =
      rows.toSeq.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")
    def runOnce(): Unit = {
      val stream = ss.readStream.schema(Encoders.product[EventIn].schema)
        .parquet(s"$inDir/*").as[EventIn]
      val q = stream.groupByKey(_.user_id)
        .transformWithState(new TtlCountsProcessor(shortTtlMs = 200L),
          TimeMode.ProcessingTime(), OutputMode.Append())
        .toDF().writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    writeBatch("b1", EventIn(1, "click", 1, 1), EventIn(1, "view", 1, 2))
    runOnce()
    Thread.sleep(1000) // >> the 200ms short TTL; << the 1h long TTL
    writeBatch("b2", EventIn(1, "click", 1, 3))
    runOnce()

    val got = spark.read.parquet(outDir)
      .as[(Long, Long, Long)].collect().toSet
    // run 1: both counters 2. run 2: the short-TTL counter restarted
    // from absent (expired), the long-TTL counter carried 2 → 3.
    assert(got === Set((1L, 2L, 2L), (1L, 1L, 3L)), s"got $got")
  }

  test("RocksDB provider is scoped to the TWS session only") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val tws = TwsOps.twsSession(spark)
    assert(tws.conf.get(key).contains("RocksDBStateStoreProvider"))
    assert(!spark.conf.get(key, "default").contains("RocksDB"),
      "parent session must keep its default state-store provider")
    assert(!CdcStream.streamSession(spark, flush = false)
        .conf.get(key, "default").contains("RocksDB"),
      "shared drain sessions must keep their default provider")
  }
}
