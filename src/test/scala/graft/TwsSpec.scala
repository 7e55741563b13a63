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
