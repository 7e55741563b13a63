package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.streaming.CdcStream

/** Streaming-mode queries (SURVEY.md §7 phase 3). Each runs a real
  * Structured Streaming query (file source → memory sink, AvailableNow)
  * synchronously and returns the sink table, so the driver's batch-style
  * Verify/DuckDB compare applies unchanged. */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // D10 in streaming form: flatMapGroupsWithState keyed apply.
    "stream_cdc_apply" -> ((s, dir) =>
      CdcStream.customerSnapshotStream(s, dir).orderBy("c_custkey")),

    // Watermark + tumbling window aggregation.
    "stream_window_agg" -> ((s, dir) =>
      CdcStream.windowedEventAgg(s, dir).orderBy("window_start", "event_type")),

    // The typed pet-table e2e through the KEYED streaming schema-aware
    // apply (per-image state, broadcast DDL timeline) — stream ≡ batch.
    "stream_e2e_pet" -> ((s, _) => {
      import org.apache.spark.sql.functions.col
      graft.sources.CdcGen.decodePet(
          CdcStream.petSnapshotStream(s).where(col("tbl") === "pet"))
        .orderBy("name")
    }),

    // The TRUNCATE fixture through the keyed streaming apply: the table
    // wipe is a column-timeline generation bump (zero state-store wipe
    // ops) — stream ≡ batch ≡ the cdc_apply_truncate golden.
    "stream_apply_truncate" -> ((s, _) => {
      graft.sources.CdcGen.decodeTruncate(CdcStream.truncateSnapshotStream(s))
        .orderBy("tbl", "id")
    }),

    // The RENAME TABLE fixture through the keyed streaming apply: the
    // state move is an identity remap (zero state-store move ops) —
    // stream ≡ batch ≡ the cdc_apply_rename golden.
    "stream_apply_rename" -> ((s, _) => {
      graft.sources.CdcGen.decodeDbTables(CdcStream.renameSnapshotStream(s))
        .orderBy("tbl", "id")
    }),

    // The DROP DATABASE fixture through the keyed streaming apply: the
    // db-wide wipe is a per-instance timeline kill (zero state-store
    // wipe ops) — stream ≡ batch ≡ the cdc_apply_dropdb golden.
    "stream_apply_dropdb" -> ((s, _) => {
      graft.sources.CdcGen.decodeDbTables(CdcStream.dropDbSnapshotStream(s))
        .orderBy("db", "tbl", "id")
    }),

    // Streaming MV maintenance: per-micro-batch algebraic-partial folds
    // into the manifest-committed aggregate table; batchId makes replays
    // no-ops. Final state ≡ one aggregation of the whole log.
    "stream_incremental_agg" -> ((s, dir) =>
      CdcStream.streamIncrementalAgg(s, dir).orderBy("event_type")),

    // CDC-maintained JOIN view (the counting algorithm): the orders
    // changelog's update/delete ops emit signed −old/+new delta rows
    // from a keyed fold; decimal-quantized contributions cancel exactly,
    // so the drained view ≡ one join+agg over the post-apply orders.
    "stream_cdc_join_mv" -> ((s, dir) =>
      CdcStream.streamCdcJoinMv(s, dir).orderBy("n_name")),

    // Streaming JOIN-view maintenance (the delta rule): each order
    // micro-batch broadcast-joins the dims map-side and folds algebraic
    // partials into the stored revenue-by-nation view — the fact log is
    // never rescanned. Final state ≡ one join+agg over the full log.
    "stream_join_mv" -> ((s, dir) =>
      CdcStream.streamJoinMv(s, dir).orderBy("n_name")),

    // The keyed schema-aware apply at sf scale: 10k+ generated customer
    // events through per-image FMGWS state — the 100 TB streaming path —
    // checked against the same replica oracle as every other apply.
    "stream_cdc_apply_keyed" -> ((s, dir) =>
      CdcStream.customerSnapshotStreamKeyed(s, dir).orderBy("c_custkey")),

    // Streaming exact dedup: the StreamingDeduplicate stateful operator
    // (dropDuplicates on a stream), keyed by document fingerprint.
    "stream_dedup_exact" -> ((s, dir) =>
      CdcStream.streamingDedupFingerprints(s, dir).orderBy("fingerprint")),

    // Watermarked stream-stream inner join
    // (StreamingSymmetricHashJoin): time-bounded on both sides so state
    // is evicted by the watermark.
    "stream_join_clicks" -> ((s, dir) =>
      CdcStream.clickPurchaseJoinStream(s, dir)
        .orderBy("click_id", "purchase_id")),

    // Sliding windows (1 day / 12 h): every event maintained in two
    // overlapping windows by the stateful agg.
    "stream_window_sliding" -> ((s, dir) =>
      CdcStream.slidingEventAgg(s, dir).orderBy("w_start_s", "event_type")),

    // Bounded-state streaming dedup: dropDuplicatesWithinWatermark (state
    // evicted by event time, not kept forever).
    "stream_dropdup_watermark" -> ((s, dir) =>
      CdcStream.streamingDedupWithinWatermark(s, dir)
        .orderBy("user_id", "event_type")),

    // Watermarked LEFT OUTER stream-stream join: unmatched rows are
    // null-extended at state eviction; click side bounded so the drained
    // result is deterministic (see CdcStream scaladoc).
    "stream_join_left_outer" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      CdcStream.clickPurchaseLeftJoinStream(s, dir)
        .orderBy(col("click_id"), col("purchase_id").asc_nulls_last)
    }),

    // K2 streaming sink: multi-micro-batch replay, each batch's keyed
    // deltas foreachBatch-upserted into the durable bucketed replica —
    // only touched buckets rewritten (SURVEY §2.4; round-3 verdict #4).
    "stream_sink_replica" -> ((s, dir) =>
      graft.sources.CdcGen.decodeCustomer(
          CdcStream.customerReplicaStreamSink(s, dir))
        .orderBy("c_custkey")),

    // Streaming replica → change data feed → reconstruction: the drain
    // commits one manifest version per micro-batch; the CDF between the
    // FIRST batch's commit and the head (ReplicaSink.changesBetween —
    // only changed buckets opened) applied onto that first version's
    // rows must reproduce the head exactly. The micro-batch file split
    // is round-robin (not SQL-derivable), so the oracle checks the
    // reconstruction against the full-replay truth — any wrong or
    // missing feed row diverges the rebuilt head. This is the consumer
    // loop of replication chaining: downstream incrementals read the
    // feed, never rescan the table.
    "stream_sink_cdf" -> ((s, dir) => {
      import graft.operators.{ReplicaSink, SnapshotManifest}
      val replicaDir = CdcStream.customerReplicaStreamDir(s, dir)
      val head = SnapshotManifest.read(new java.io.File(replicaDir)).version
      val fromV = 2L // v1 = the retention stamp; v2 = the first batch
      val feed = ReplicaSink.changesBetween(s, replicaDir, fromV, head,
        "uri STRING, key STRING, image ARRAY<STRING>", Seq("uri", "key"))
      val base = ReplicaSink.readReplicaRowsAt(s, replicaDir, fromV).get
      val reconstructed = base
        .join(feed.select(col("uri"), col("key")), Seq("uri", "key"),
          "left_anti")
        .select(col("image"))
        .unionByName(feed.where(col("change_type") =!= "delete")
          .select(col("after_image").as("image")))
      graft.sources.CdcGen.decodeCustomer(reconstructed)
        .orderBy("c_custkey")
    }),

    // Replica geometry rotation UNDER continued ingest
    // (ReplicaSink.rebucket): after the streaming drain, the replica is
    // re-sharded 16 → 7 buckets in one committed rotation, then a
    // FURTHER upsert (a delete batch) merges — and must land under the
    // NEW geometry, because the merge reads `conf/buckets` from the
    // manifest, never the compile-time default (probing the old count
    // would hash to the wrong buckets and duplicate keys). Output =
    // decoded replica after rotation + delete, with the live geometry
    // as a column.
    "stream_sink_rebucket" -> ((s, dir) => {
      import graft.operators.{ReplicaSink, SnapshotManifest}
      val replicaDir = CdcStream.customerReplicaStreamDir(s, dir)
      ReplicaSink.rebucket(s, replicaDir, 7)
      val root = new java.io.File(replicaDir)
      val head = SnapshotManifest.read(root)
      val delta = ReplicaSink
        .readReplicaRowsAt(s, replicaDir, head.version).get
        .where(org.apache.spark.sql.functions
          .element_at(col("image"), 1).cast("long") % 9 === 0)
        .select(col("uri"), col("key"), col("image"),
          org.apache.spark.sql.functions.lit(true).as("deleted"))
      ReplicaSink.upsertBatch(replicaDir)(delta, 99L)
      val fin = SnapshotManifest.read(root)
      val nBuckets = fin.entries("conf/buckets").toInt
      graft.sources.CdcGen.decodeCustomer(
          ReplicaSink.readReplicaImages(s, replicaDir))
        .withColumn("n_buckets",
          org.apache.spark.sql.functions.lit(nBuckets))
        .orderBy("c_custkey")
    }),

    // Stateless curation gates on a document stream: map-side quality
    // filters, no state store — the shape of filter-on-ingest at 100 TB.
    "stream_quality_gate" -> ((s, dir) =>
      CdcStream.streamingQualityGate(s, dir).orderBy("doc_id")),

    // STREAM-STATIC join: exact-dedup gate for continuous ingest — each
    // micro-batch joins the static corpus fingerprints, stateless.
    "stream_dedup_incremental" -> ((s, dir) =>
      CdcStream.streamingIncrementalDedup(s, dir).orderBy("doc_id")),

    // transformWithState (arbitrary stateful v2, RocksDB provider):
    // per-user running stats across TWO named state variables
    // (ValueState + MapState), carried over a 4-micro-batch replay.
    "stream_tws_running" -> ((s, dir) =>
      graft.streaming.TwsOps.runningUserStats(s, dir).orderBy("user_id")),

    // transformWithState with INITIAL STATE: per-user stats warm-start
    // from a batch snapshot (event_id % 3 == 0), the stream replays the
    // tail — the snapshot-plus-changelog bootstrap a migrating consumer
    // runs. Final snapshot ≡ batch aggregate over ALL events.
    "stream_tws_bootstrap" -> ((s, dir) =>
      graft.streaming.TwsOps.snapshotBootstrapStats(s, dir)
        .orderBy("user_id")),

    // session_window as a stateful STREAMING operator: merging windows,
    // emitted on watermark eviction (append mode, capped slice for a
    // boundary-independent drained set — see CdcStream scaladoc).
    "stream_sessionize" -> ((s, dir) =>
      CdcStream.streamingSessionize(s, dir)
        .orderBy("user_id", "session_start")),

    // State Data Source: the drained aggregation's state store read back
    // offline as a batch DataFrame — decoded state ≡ batch aggregate.
    "stream_state_inspect" -> ((s, dir) =>
      CdcStream.stateStoreInspect(s, dir)),

    // the DSv2 connector as a MICRO-BATCH STREAM source: file-count
    // offsets over the name-sorted topic segments, maxFilesPerTrigger
    // admission control (6 files / 2 per batch → 3 micro-batches),
    // filter+column pushdown applying per batch — the connector-level
    // form of the reference's offset-consuming SPU stream (S4/D9).
    "stream_dsv2_source" -> ((s, dir) => {
      import org.apache.spark.sql.functions.col
      import org.apache.spark.sql.streaming.OutputMode
      import graft.sources.WireFormats
      val ss = CdcStream.streamSession(s, flush = false)
      val src = ss.readStream.format("cdc-wire")
        .schema(WireFormats.EventsSchema)
        .option("maxFilesPerTrigger", "2")
        .load(WireFormats.jsonlStreamDir(ss, dir))
        .where(col("event_type") === "purchase")
        .select("event_id", "user_id", "value")
      CdcStream.runToTable(src, OutputMode.Append).orderBy("event_id")
    }),

    // …and the WRITE direction: the connector as a streaming K1 sink.
    // Each micro-batch commits one visible wire segment per (epoch,
    // partition) — epoch-replay-idempotent (REPLACE move, taskId-free
    // dest names). The drained topic read back through the batch
    // connector must reproduce the full-fidelity aggregate.
    "stream_dsv2_sink" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      import graft.sources.{Tables, WireFormats}
      val ss = CdcStream.streamSession(s, flush = false)
      val src = CdcStream.streamOf(Tables.events(ss, dir), "events_full", dir,
        maxFilesPerTrigger = Some(3))
      val out = graft.Fs.scratch("/tmp/graft_wire",
        s"stream_sink_${dir.replaceAll("[^A-Za-z0-9]", "_")}")
      graft.Fs.deleteRecursively(out) // fresh topic per invocation
      val ckpt = java.nio.file.Files.createTempDirectory("graft_wsink_ckpt")
      val q = src.writeStream.format("cdc-wire")
        .option("path", out.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      try q.awaitTermination()
      finally graft.Fs.deleteRecursively(ckpt.toFile)
      SourceQueries.fidelityAgg(ss.read.format("cdc-wire")
        .schema(WireFormats.EventsSchema).load(out.toString))
    })
  )

  val oracles: Map[String, String] = Map(
    // identical to the batch apply oracle — stream ≡ batch is the claim
    "stream_cdc_apply" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    "stream_window_agg" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start,
         event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "stream_e2e_pet" ->
      """SELECT * FROM (VALUES
           ('Jack', 'Peter', 'dog', 'm', DATE '1989-08-31', CAST(NULL AS DATE)),
           ('Spot', 'Jane', 'dog', 'm', DATE '2010-11-02', DATE '2020-06-10'))
         AS t(name, owner, species, sex, birth, last_vaccine)
         ORDER BY name""",
    "stream_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(user_id) AS BIGINT) AS sum_users,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "stream_cdc_join_mv" ->
      """SELECT n_name, COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(CASE WHEN o_orderkey % 7 = 0
               THEN CAST(o_orderkey % 1000 AS DOUBLE) + 0.25
               ELSE o_totalprice END AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS DOUBLE) AS sum_revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         WHERE o_orderkey % 11 <> 0
         GROUP BY n_name ORDER BY n_name""",
    "stream_join_mv" ->
      """SELECT n_name, COUNT(*) AS n_orders,
         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2))
           AS DOUBLE) AS sum_revenue
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "stream_apply_truncate" ->
      """SELECT * FROM (VALUES
           ('box', CAST(9 AS BIGINT), 'keep', CAST(NULL AS BIGINT)),
           ('crate', CAST(4 AS BIGINT), 'delta', CAST(7 AS BIGINT)))
         AS t(tbl, id, txt, qty)
         ORDER BY tbl, id""",
    "stream_apply_rename" ->
      """SELECT * FROM (VALUES
           ('inv', 'audit', CAST(9 AS BIGINT), 'keep', CAST(NULL AS BIGINT)),
           ('inv', 'stock', CAST(7 AS BIGINT), 'fresh', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(1 AS BIGINT), 'bolt-x', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(3 AS BIGINT), 'washer', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(4 AS BIGINT), 'pin', CAST(5 AS BIGINT)))
         AS t(db, tbl, id, txt, qty)
         ORDER BY tbl, id""",
    "stream_apply_dropdb" ->
      """SELECT * FROM (VALUES
           ('app', 'users', CAST(3 AS BIGINT), 'carol', CAST(NULL AS BIGINT)),
           ('keepdb', 'logs', CAST(5 AS BIGINT), 'hello', CAST(NULL AS BIGINT)))
         AS t(db, tbl, id, txt, qty)
         ORDER BY db, tbl, id""",
    // the replica after the full replay must equal the batch apply — the
    // same claim as stream_cdc_apply, now through the durable sink
    "stream_sink_replica" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    // post-rotation content = full replay minus the delete batch; the
    // geometry column pins that the rotation's count is what later
    // merges ran under
    "stream_sink_rebucket" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment,
         CAST(7 AS INTEGER) AS n_buckets
         FROM customer WHERE c_custkey % 7 <> 0 AND c_custkey % 9 <> 0
         ORDER BY c_custkey""",
    // first-batch state + change feed must rebuild the full-replay head
    "stream_sink_cdf" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    "stream_cdc_apply_keyed" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    "stream_dedup_exact" ->
      s"""WITH ${graft.sources.ExtCorpus.DocCorpusCte}
          SELECT DISTINCT ${ExtensionQueries.SqlFingerprintExpr} AS fingerprint
          FROM corpus ORDER BY fingerprint""",
    "stream_join_clicks" ->
      """SELECT c.user_id, c.event_id AS click_id,
           p.event_id AS purchase_id, p.value AS amount
         FROM events c JOIN events p
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase' AND c.event_type = 'click'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
         ORDER BY click_id, purchase_id""",
    "stream_window_sliding" ->
      """WITH g AS (SELECT event_type, value,
                    CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
            w AS (SELECT event_type, value, es - es % 43200 AS w0 FROM g),
            x AS (SELECT event_type, value, w0 AS ws FROM w
                  UNION ALL
                  SELECT event_type, value, w0 - 43200 FROM w)
         SELECT ws AS w_start_s, event_type, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM x GROUP BY ws, event_type ORDER BY w_start_s, event_type""",
    "stream_dropdup_watermark" ->
      """SELECT DISTINCT user_id, event_type FROM events
         ORDER BY user_id, event_type""",
    "stream_join_left_outer" ->
      """SELECT c.user_id, c.event_id AS click_id,
           p.event_id AS purchase_id, p.value AS amount
         FROM events c LEFT JOIN events p
           ON p.user_id = c.user_id AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
         WHERE c.event_type = 'click'
           AND c.ts <= (SELECT least(
                 (SELECT max(ts) FROM events WHERE event_type = 'click'),
                 (SELECT max(ts) FROM events WHERE event_type = 'purchase'))
               - INTERVAL 121 MINUTE)
         ORDER BY click_id, purchase_id NULLS LAST""",
    "stream_sessionize" ->
      """WITH capped AS (
           SELECT user_id, ts, value FROM events
           WHERE ts <= (SELECT max(ts) FROM events) - INTERVAL 91 MINUTE),
         marked AS (
           SELECT user_id, ts, value,
             CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         + INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM capped),
         sessions AS (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM sessions GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    // joining on (fp, text) ≡ joining on text (fp is a pure function of
    // the text), so the oracle needs only the text join
    "stream_dedup_incremental" -> s"""
       WITH ${graft.sources.ExtCorpus.IncrementalBatchCte},
       m AS (SELECT text, MIN(doc_id) AS dup_of FROM documents GROUP BY text)
       SELECT b.doc_id,
         CASE WHEN m.dup_of IS NOT NULL THEN 'exact' ELSE 'novel' END
           AS verdict,
         m.dup_of
       FROM batch b LEFT JOIN m USING (text)
       ORDER BY b.doc_id""",
    // keys seen in the tail carry snapshot + tail state; snapshot-only
    // keys never enter handleInputRows and emit nothing
    "stream_tws_bootstrap" ->
      """SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           MAX(epoch_us(ts)) AS last_us
         FROM events
         WHERE user_id IN (SELECT DISTINCT user_id FROM events
                           WHERE event_id % 3 <> 0)
         GROUP BY user_id ORDER BY user_id""",
    // the final snapshot of the monotone running stats ≡ batch aggregate
    "stream_tws_running" ->
      """SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_clicks,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           MAX(epoch_us(ts)) AS last_us
         FROM events GROUP BY user_id ORDER BY user_id""",
    // what the state store holds ≡ the batch aggregate over the input
    "stream_state_inspect" ->
      """SELECT user_id, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM events GROUP BY user_id ORDER BY user_id""",
    // the drained multi-batch connector stream ≡ the batch filter
    "stream_dsv2_source" ->
      """SELECT event_id, user_id, value FROM events
         WHERE event_type = 'purchase' ORDER BY event_id""",
    // round-trip through the streaming sink ≡ the source fidelity oracle
    "stream_dsv2_sink" -> SourceQueries.FidelityOracle,
    "stream_quality_gate" ->
      """WITH f AS (
           SELECT doc_id, lang,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
             ROUND(1.0 - CAST(len(list_distinct(string_split(text, ' ')))
               AS DOUBLE) / len(string_split(text, ' ')), 6) AS rep_ratio
           FROM documents)
         SELECT doc_id, lang, n_words, rep_ratio
         FROM f
         WHERE n_words >= 20 AND n_words <= 80 AND rep_ratio <= 0.6
         ORDER BY doc_id"""
  )
}
