package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

import graft.model.Cdc
import graft.sources.{CdcGen, Tables}

/** Structured Streaming mode (SURVEY.md §7 phase 3).
  *
  * The reference's streaming loop — poll binlog, forward events, apply
  * serially to the replica (manager.rs:52-86, consumer.rs:34-55) — maps to:
  * file source (poll ≈ directory listing) → the same event schema →
  * `flatMapGroupsWithState` keyed apply (state = current row image per
  * key) → sink. Offset/resume state (D8/D9) is Spark checkpointing.
  *
  * Batch and streaming share CdcGen's event schema and the apply
  * semantics; specs assert stream ≡ batch.
  */
object CdcStream {

  /** Keyed row-level event, the FMGWS input. State is keyed by
    * (uri, key): a changelog spanning multiple tables with colliding key
    * values must not merge their states (same fix as
    * ChangelogApply.latestImage; round-1 advice). */
  case class KeyedImageEvent(
      sequence: Long, op: String, image: Seq[String], uri: String, key: String)

  /** Apply state per row key: newest image wins (latest-image semantics,
    * the scale path of ChangelogApply). */
  case class ApplyState(image: Seq[String], sequence: Long, deleted: Boolean)

  private val nameCounter = new AtomicInteger()

  /** Stage a batch DataFrame as a one-file parquet dir and open it as a
    * stream — a deterministic single micro-batch under AvailableNow.
    * Staging is keyed by (tag, source dir) and reused across executions in
    * a session (the testdata inputs are immutable), so repeated bench runs
    * pay streaming execution, not re-staging. */
  private def streamOf(df: DataFrame, tag: String, sfDir: String): DataFrame = {
    val key = s"${tag}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
    val dir = new java.io.File(s"/tmp/graft_stage/$key")
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      dir.getParentFile.mkdirs()
      df.coalesce(1).write.mode("overwrite").parquet(dir.toString)
    }
    df.sparkSession.readStream.schema(df.schema).parquet(dir.toString)
  }

  private def runToTable(df: DataFrame, mode: OutputMode): DataFrame = {
    val name = s"graft_sink_${nameCounter.incrementAndGet()}"
    val q = df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    df.sparkSession.table(name)
  }

  /** The FMGWS apply function — per key, events of the micro-batch arrive
    * unordered: sort by sequence, fold onto the carried state, emit the
    * live image (append mode; the driver-facing query runs it as a single
    * micro-batch so the emission is exactly the final snapshot). */
  def applyEvents(
      key: (String, String),
      it: Iterator[KeyedImageEvent],
      state: GroupState[ApplyState]): Iterator[Seq[String]] = {
    val sorted = it.toArray.sortBy(_.sequence)
    var cur = state.getOption.getOrElse(ApplyState(null, Long.MinValue, deleted = true))
    sorted.foreach { e =>
      if (e.sequence > cur.sequence) {
        cur = e.op match {
          case Cdc.OpDelete => ApplyState(null, e.sequence, deleted = true)
          case _ => ApplyState(e.image, e.sequence, deleted = false)
        }
      }
    }
    state.update(cur)
    if (cur.deleted) Iterator.empty else Iterator.single(cur.image)
  }

  /** Streaming changelog apply on an event stream (schema Cdc.EventSchema),
    * keyed by cell `keyIdx` of the row image. */
  def applyStream(events: DataFrame, keyIdx: Int = 0): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val keyed = events
      .where(col("op").isin(Cdc.OpAdd, Cdc.OpUpdate, Cdc.OpDelete))
      .select(col("sequence"), col("op"), col("uri"), explode(col("rows")).as("r"))
      .select(col("sequence"), col("op"), col("uri"), col("r.cols").as("image"))
      .withColumn("key", element_at(col("image"), keyIdx + 1))
      .as[KeyedImageEvent]
    val applied: Dataset[Seq[String]] = keyed
      .groupByKey(e => (e.uri, e.key))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(applyEvents)
    applied.toDF("image")
  }

  /** Per-table state of the streaming schema-aware apply: registry column
    * list + full-image multiset (encoder-friendly pairs). State is one
    * TABLE's live rows — the same envelope the batch fold and the
    * reference's single consumer hold. */
  case class TableApplyState(cols: Seq[String], images: Seq[(Seq[String], Long)])

  /** Streaming twin of ChangelogApply.applyWithSchema: FMGWS keyed by
    * (db, table) — the reference's serial apply unit — folding DDL and
    * full-image DML onto carried state. Per batch, a group's events fold
    * in sequence order onto the state and the group emits its live images
    * (append mode; a single-micro-batch run emits exactly the final
    * snapshot). */
  def applySchemaEvents(
      key: (String, String),
      it: Iterator[graft.operators.ChangelogApply.SchemaEv],
      state: GroupState[TableApplyState]): Iterator[(String, String, Seq[String], Seq[String])] = {
    import graft.operators.SchemaRegistry
    import graft.operators.SchemaRegistry._
    val (db, tbl) = key
    val prev = state.getOption.getOrElse(TableApplyState(null, Nil))
    var cols = prev.cols
    val ms = scala.collection.mutable.LinkedHashMap[Seq[String], Long](prev.images: _*)
    val nullCell = graft.model.Value.NullCell
    it.toArray.sortBy(_.sequence).foreach { e =>
      e.op match {
        case Cdc.OpQuery =>
          SchemaRegistry.parseDdl(e.query).filter(_.table == tbl).foreach {
            case CreateTable(_, cs) => if (cols == null) { cols = cs; ms.clear() }
            case AddColumn(_, _) if cols == null => ()
            case AddColumn(_, c) =>
              cols = cols :+ c
              val widened = ms.toSeq.map { case (img, n) => (img :+ nullCell, n) }
              ms.clear(); ms ++= widened
            case RenameColumn(_, from, to) =>
              if (cols != null) cols = cols.map(c => if (c == from) to else c)
            case DropColumn(_, c) =>
              if (cols != null) {
                val i = cols.indexOf(c)
                if (i >= 0) {
                  cols = cols.patch(i, Nil, 1)
                  val narrowed = ms.toSeq
                    .map { case (img, n) => (img.patch(i, Nil, 1), n) }
                  ms.clear()
                  narrowed.foreach { case (img, n) =>
                    ms.updateWith(img)(c0 => Some(c0.getOrElse(0L) + n))
                  }
                }
              }
            case DropTable(_) => cols = null; ms.clear()
          }
        case Cdc.OpAdd =>
          e.rows.foreach(r =>
            ms.updateWith(r.cols)(c => Some(c.getOrElse(0L) + 1L)))
        case Cdc.OpUpdate =>
          e.rows.foreach { r =>
            ms.remove(r.before_cols).foreach { n =>
              ms.updateWith(r.cols)(c => Some(c.getOrElse(0L) + n))
            }
          }
        case Cdc.OpDelete =>
          e.rows.foreach(r => ms.remove(r.cols))
        case _ => ()
      }
    }
    state.update(TableApplyState(cols, ms.toSeq))
    val finalCols = cols
    ms.iterator.flatMap { case (img, n) =>
      Iterator.fill(n.toInt)((db, tbl, img, finalCols))
    }
  }

  /** Streaming schema-aware apply over a typed changelog stream. */
  def applySchemaStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.operators.ChangelogApply.SchemaEv
    val routed = events
      .where(col("op").isin(Cdc.OpQuery, Cdc.OpAdd, Cdc.OpUpdate, Cdc.OpDelete))
      .select(
        try_element_at(split(col("uri"), "/"), lit(4)).as("db"),
        try_element_at(split(col("uri"), "/"), lit(5)).as("tbl"),
        col("sequence"), col("op"), col("query"), col("rows"))
      .as[SchemaEv]
      .flatMap { e =>
        if (e.op == Cdc.OpQuery)
          graft.operators.SchemaRegistry.parseDdl(e.query).map(_.table)
            .distinct.map(t => e.copy(tbl = t))
        else Seq(e)
      }
    routed
      .groupByKey(e => (e.db, e.tbl))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(applySchemaEvents)
      .toDF("db", "tbl", "image", "columns")
  }

  /** End-to-end streaming replica snapshot for the generated customer
    * changelog — the streaming twin of ChangelogApply.customerSnapshot. */
  def customerSnapshotStream(spark: SparkSession, sfDir: String): DataFrame = {
    val events = streamOf(CdcGen.customerEvents(spark, sfDir), "cdc_events", sfDir)
    val snapshot = runToTable(applyStream(events), OutputMode.Append)
    CdcGen.decodeCustomer(snapshot)
  }

  /** Streaming e2e pet replay: the typed 9-statement fixture through the
    * schema-aware FMGWS apply as a single micro-batch — the streaming twin
    * of the cdc_e2e_pet batch query. */
  def petSnapshotStream(spark: SparkSession): DataFrame = {
    val events = streamOf(CdcGen.typedEvents(spark), "typed_events", "fixture")
    runToTable(applySchemaStream(events), OutputMode.Append)
  }

  /** Watermarked tumbling-window aggregation over the events stream
    * (the reference never needs event time — §2.6 — but the engine surface
    * does): 1-day windows, count + exact decimal revenue. */
  def windowedEventAgg(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = streamOf(Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value")),
      "events", sfDir)
    val agg = ev
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("revenue"))
    runToTable(agg, OutputMode.Complete)
      .select(col("window.start").cast("date").as("window_start"),
        col("event_type"), col("n"), col("revenue"))
  }
}
