package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  ExpiredTimerInfo, ListState, MapState, OutputMode, StatefulProcessor,
  StatefulProcessorWithInitialState, TimeMode, TimerValues, TTLConfig,
  ValueState}

/** Arbitrary stateful processing v2: `transformWithState` with a
  * [[StatefulProcessor]] — the modern replacement for
  * flatMapGroupsWithState (multiple named state variables per key, typed
  * state APIs, TTL, timers) and the API a continuous 100 TB pipeline
  * would use for custom per-key state today.
  *
  * The processor below maintains per-user running engagement stats over
  * the events stream in TWO independent state variables — a
  * [[ValueState]] carrying (n, revenue-cents, last-event-micros) and a
  * [[MapState]] carrying per-event-type counts — and emits a snapshot
  * row per key per micro-batch. The replay is driven in multiple
  * micro-batches (maxFilesPerTrigger), so the cross-batch carry of BOTH
  * variables is what the oracle checks: every emitted column is
  * monotone, so the final per-user row is the column-wise max of the
  * emissions, and it must equal the batch aggregate over all events.
  *
  * Money rides as exact cents (value is DECIMAL(18,2)-clean by data
  * contract; the cast happens in the plan, not the processor), so state
  * is integer-only and the final cents/100.0 double equals DuckDB's
  * decimal-sum→double cast bit-for-bit.
  *
  * transformWithState requires the RocksDB state-store provider — the
  * provider a large deployment runs anyway (incremental checkpointing,
  * state larger than heap). The conf is scoped to a dedicated
  * [[SparkSession.newSession]] (same lifecycle discipline as
  * [[CdcStream.streamSession]]) so HDFS-backed state stores of the other
  * streaming queries are untouched.
  */
object TwsOps {

  case class EventIn(user_id: Long, event_type: String, cents: Long, us: Long)
  case class RunState(n: Long, cents: Long, maxUs: Long)
  case class RunOut(user_id: Long, n_events: Long, n_clicks: Long,
      n_purchases: Long, revenue_cents: Long, last_us: Long)

  /** Per-user running stats over two named state variables. */
  class RunningStatsProcessor
      extends StatefulProcessor[Long, EventIn, RunOut] {
    @transient private var totals: ValueState[RunState] = _
    @transient private var byType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      totals = getHandle.getValueState[RunState](
        "totals", Encoders.product[RunState], TTLConfig.NONE)
      byType = getHandle.getMapState[String, Long](
        "byType", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[RunOut] = {
      var s = if (totals.exists()) totals.get() else RunState(0L, 0L, Long.MinValue)
      rows.foreach { e =>
        s = RunState(s.n + 1, s.cents + e.cents, math.max(s.maxUs, e.us))
        val prev = if (byType.containsKey(e.event_type)) byType.getValue(e.event_type) else 0L
        byType.updateValue(e.event_type, prev + 1L)
      }
      totals.update(s)
      val clicks = if (byType.containsKey("click")) byType.getValue("click") else 0L
      val purchases = if (byType.containsKey("purchase")) byType.getValue("purchase") else 0L
      Iterator.single(RunOut(key, s.n, clicks, purchases, s.cents, s.maxUs))
    }
  }

  case class SnapOut(user_id: Long, n_events: Long, revenue_cents: Long,
      last_us: Long)

  /** Warm-start variant: state bootstraps from a SNAPSHOT (the
    * snapshot-plus-changelog migration shape — exactly how a replica
    * consumer starts from a base dump and applies the tail). Spark
    * feeds every key's initial-state row through [[handleInitialState]]
    * on the first micro-batch, then the stream's events fold on top. */
  class RunningStatsWithInit
      extends StatefulProcessorWithInitialState[Long, EventIn, SnapOut, RunState] {
    @transient private var totals: ValueState[RunState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[RunState](
        "totals", Encoders.product[RunState], TTLConfig.NONE)

    override def handleInitialState(key: Long, initialState: RunState,
        timerValues: TimerValues): Unit =
      totals.update(initialState)

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[SnapOut] = {
      var s = if (totals.exists()) totals.get() else RunState(0L, 0L, Long.MinValue)
      rows.foreach { e =>
        s = RunState(s.n + 1, s.cents + e.cents, math.max(s.maxUs, e.us))
      }
      totals.update(s)
      Iterator.single(SnapOut(key, s.n, s.cents, s.maxUs))
    }
  }

  case class Click(user_id: Long, ts: java.sql.Timestamp)
  case class Session(user_id: Long, n_events: Long, first_ms: Long)

  /** Event-time TIMER sessionization: clicks buffer in a [[ListState]];
    * each input batch re-registers the key's single timer to
    * last-click + `gapMs`; when the WATERMARK passes the timer,
    * [[handleExpiredTimer]] emits the session and clears the buffer.
    * This is session_window's semantics rebuilt on the state-v2
    * primitives — the API shape for custom eviction policies
    * session_window can't express (per-key gaps, cross-field
    * conditions). Emission happens only on watermark progress, so state
    * is bounded by OPEN sessions at any scale. */
  class SessionTimerProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Click, Session] {
    @transient private var buf: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      buf = getHandle.getListState[Long](
        "clicks", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Click],
        timerValues: TimerValues): Iterator[Session] = {
      var maxMs = Long.MinValue
      rows.foreach { c =>
        val ms = c.ts.getTime
        buf.appendValue(ms)
        if (ms > maxMs) maxMs = ms
      }
      // one live timer per key: extending the session supersedes the
      // previous deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t))
      getHandle.registerTimer(maxMs + gapMs)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      val times = buf.get().toArray
      buf.clear()
      if (times.isEmpty) Iterator.empty
      else Iterator.single(Session(key, times.length.toLong, times.min))
    }
  }

  case class TtlOut(user_id: Long, short_n: Long, long_n: Long)

  /** State TTL: two per-key counters over the same input, differing only
    * in their [[TTLConfig]] — the bounded-state answer for keyspaces
    * that churn (abandoned sessions, one-shot users) where neither a
    * watermark bound nor an explicit timer fits: expired values read as
    * absent and their storage is reclaimed by the store's background
    * maintenance, so state is bounded by the ACTIVE keyset however
    * unbounded the total keyset grows. The short/long pair makes
    * expiry observable in both directions in one restart (TwsSpec). */
  class TtlCountsProcessor(shortTtlMs: Long)
      extends StatefulProcessor[Long, EventIn, TtlOut] {
    @transient private var shortN: ValueState[Long] = _
    @transient private var longN: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      shortN = getHandle.getValueState[Long]("short_n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofMillis(shortTtlMs)))
      longN = getHandle.getValueState[Long]("long_n", Encoders.scalaLong,
        TTLConfig(java.time.Duration.ofHours(1)))
    }

    override def handleInputRows(key: Long, rows: Iterator[EventIn],
        timerValues: TimerValues): Iterator[TtlOut] = {
      val n = rows.size.toLong
      val s = (if (shortN.exists()) shortN.get() else 0L) + n
      val l = (if (longN.exists()) longN.get() else 0L) + n
      shortN.update(s); longN.update(l)
      Iterator.single(TtlOut(key, s, l))
    }
  }

  /** Dedicated RocksDB-provider sessions, one per parent (conf isolation
    * — same reason as CdcStream.streamSession). */
  private val twsSessions =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  private[graft] def twsSession(parent: SparkSession): SparkSession =
    twsSessions.computeIfAbsent(parent, { p =>
      val ss = p.newSession()
      ss.conf.set("spark.sql.shuffle.partitions",
        CdcStream.DrainStatePartitions.toString)
      ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
      ss.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      ss
    })

  /** Drained per-user running stats; emissions are per (key, batch), the
    * caller reduces to the final snapshot (column-wise max — every
    * column is monotone in batch order). */
  def runningUserStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = twsSession(spark)
    import ss.implicits._
    val ev = CdcStream.streamOf(
      graft.sources.Tables.events(ss, sfDir)
        .select(col("user_id"),
          col("event_type"),
          (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
          unix_micros(col("ts")).as("us")),
      "tws_events", sfDir,
      // 2 files per micro-batch over the 8-file staging ⇒ 4 micro-batches:
      // the cross-batch state carry is the thing under test
      maxFilesPerTrigger = Some(2))
    val out = ev.as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsProcessor,
        TimeMode.None(), OutputMode.Append())
    CdcStream.runToTable(out.toDF(), OutputMode.Append)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        max(col("n_clicks")).as("n_clicks"),
        max(col("n_purchases")).as("n_purchases"),
        (max(col("revenue_cents")) / 100.0).as("revenue"),
        max(col("last_us")).as("last_us"))
  }

  /** Snapshot-plus-changelog bootstrap: state warm-starts from the batch
    * aggregate of the "historical" slice (event_id % 3 == 0) and the
    * stream replays only the tail (% 3 != 0). The final snapshot over
    * keys that appear in the TAIL must equal the batch aggregate over
    * ALL their events — the invariant a migrating consumer relies on.
    * (Keys live only in the snapshot emit nothing: handleInputRows
    * never fires for them — mirrored by the oracle's key filter.) */
  def snapshotBootstrapStats(spark: SparkSession, sfDir: String): DataFrame = {
    val ss = twsSession(spark)
    import ss.implicits._
    def slim(df: DataFrame) = df.select(col("event_id"), col("user_id"),
      col("event_type"),
      (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"),
      unix_micros(col("ts")).as("us"))
    val all = slim(graft.sources.Tables.events(ss, sfDir))
    val snapshot = all.where(col("event_id") % 3 === 0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents"),
        max(col("us")).as("maxUs"))
      .as[(Long, Long, Long, Long)]
      .map { case (u, n, c, m) => (u, RunState(n, c, m)) }
      .groupByKey(_._1)
      .mapValues(_._2)
    val tail = CdcStream.streamOf(
      all.where(col("event_id") % 3 =!= 0).drop("event_id"),
      "tws_tail_events", sfDir, maxFilesPerTrigger = Some(2))
    val out = tail.as[EventIn]
      .groupByKey(_.user_id)
      .transformWithState(new RunningStatsWithInit,
        TimeMode.None(), OutputMode.Append(), snapshot)
    CdcStream.runToTable(out.toDF(), OutputMode.Append)
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"),
        (max(col("revenue_cents")) / 100.0).as("revenue"),
        max(col("last_us")).as("last_us"))
  }
}
