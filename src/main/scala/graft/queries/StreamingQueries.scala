package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

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
      CdcStream.windowedEventAgg(s, dir).orderBy("window_start", "event_type"))
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
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""
  )
}
