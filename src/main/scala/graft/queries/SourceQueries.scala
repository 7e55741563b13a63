package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.WireFormats

/** Text wire-format source scans (SURVEY.md §2.1): the same aggregate over
  * the JSONL- and CSV-staged copies of `events` must reproduce the
  * parquet-backed oracle exactly — proving every column type (long,
  * timestamp at micros, double, JSON-bearing string) round-trips the text
  * serde. The aggregate touches all of them. */
object SourceQueries {

  type Q = (SparkSession, String) => DataFrame

  private[queries] def fidelityAgg(df: DataFrame): DataFrame = {
    df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        sum(col("user_id")).as("sum_users"),
        unix_micros(max(col("ts"))).as("max_ts_us"),
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
      .orderBy("event_type")
  }

  val queries: Map[String, Q] = Map(
    "src_jsonl_scan" -> ((s, dir) => fidelityAgg(WireFormats.eventsJsonl(s, dir))),
    "src_csv_scan" -> ((s, dir) => fidelityAgg(WireFormats.eventsCsv(s, dir))),
    "src_orc_scan" -> ((s, dir) => fidelityAgg(WireFormats.eventsOrc(s, dir))),
    "src_xml_scan" -> ((s, dir) => fidelityAgg(WireFormats.eventsXml(s, dir))),

    // schema evolution: a pre-`props` epoch and a full-schema epoch read
    // together via mergeSchema — old rows surface NULL props, and the
    // fidelity aggregate distinguishes them from genuinely-null values
    "src_parquet_evolve" -> ((s, dir) => {
      val merged = WireFormats.eventsParquetEvolved(s, dir)
      merged.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_old_epoch"),
          sum(col("value").cast("decimal(18,2)")).cast("double")
            .as("total_value"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    }),

    // DataSource V2 connector over the same JSONL wire bytes: pushed
    // filters are evaluated inside the reader (they leave the plan
    // entirely), the scan materializes only the projected columns, and
    // row-level parity against the parquet oracle proves the absorbed
    // evaluation is Catalyst-exact
    "src_dsv2_pushdown" -> ((s, dir) => {
      s.read.format("cdc-wire").load(WireFormats.jsonlDir(s, dir))
        .where(col("event_type") === "purchase" && col("user_id") < 30)
        .select("event_id", "ts", "user_id", "value")
        .orderBy("event_id")
    }),

    // DSv2 write path: events written through the connector's two-phase
    // commit (task temp files -> driver rename; truncate-overwrite) and
    // read back through the connector — the full fidelity aggregate over
    // the round-tripped bytes must still equal the parquet oracle
    "src_dsv2_roundtrip" -> ((s, dir) => {
      val out = graft.Fs.scratch("/tmp/graft_wire",
        s"dsv2_out_${dir.replaceAll("[^A-Za-z0-9]", "_")}").toString
      graft.sources.Tables.events(s, dir)
        .write.format("cdc-wire").mode("overwrite").save(out)
      fidelityAgg(s.read.format("cdc-wire").load(out))
    }),

    // aggregate pushdown through the connector: the reader emits one
    // pre-aggregated row per group PER FILE (filters applied first) and
    // Spark's final aggregate merges the partials — the scan never
    // ships a raw row. Sum absorbed for longs only; count/min/max are
    // order-independent, so the result is oracle-exact by construction
    "src_dsv2_agg_pushdown" -> ((s, dir) => {
      s.read.format("cdc-wire").load(WireFormats.jsonlDir(s, dir))
        .where(col("user_id") < 50)
        .groupBy("event_type")
        .agg(count(col("event_id")).as("n"),
          min("event_id").as("min_id"),
          max("event_id").as("max_id"),
          min("value").as("min_val"),
          max("value").as("max_val"),
          sum("user_id").as("sum_users"))
        .orderBy("event_type")
    }),

    // corrupt-record tolerance: PERMISSIVE parse of a dirty JSONL stage
    // — bad lines are quarantined per-row, never fail the scan, and the
    // valid rows' checksum proves none were dropped or misparsed
    "src_jsonl_corrupt" -> ((s, dir) => {
      val parsed = WireFormats.eventsJsonlDirty(s, dir)
      parsed.agg(
        sum(when(col("_corrupt_record").isNull, 1L).otherwise(0L))
          .as("n_valid"),
        sum(when(col("_corrupt_record").isNotNull, 1L).otherwise(0L))
          .as("n_corrupt"),
        sum(when(col("_corrupt_record").isNull, col("event_id"))
          .otherwise(0L)).as("valid_checksum"))
    })
  )

  private[queries] val FidelityOracle =
    """SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(sum(user_id) AS BIGINT) AS sum_users,
       epoch_us(max(ts)) AS max_ts_us,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
       FROM events GROUP BY event_type ORDER BY event_type"""

  val oracles: Map[String, String] = Map(
    "src_jsonl_scan" -> FidelityOracle,
    "src_csv_scan" -> FidelityOracle,
    "src_orc_scan" -> FidelityOracle,
    "src_xml_scan" -> FidelityOracle,
    "src_parquet_evolve" -> """
       SELECT event_type,
         count(*) AS n,
         CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_old_epoch,
         CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
         CAST(sum(CASE WHEN event_id % 2 = 1
           THEN CAST(json_extract_string(props, '$.k') AS BIGINT) END)
           AS BIGINT) AS sum_k
       FROM events GROUP BY event_type ORDER BY event_type""",
    "src_dsv2_roundtrip" -> FidelityOracle,
    "src_dsv2_agg_pushdown" -> """
       SELECT event_type,
         count(event_id) AS n,
         min(event_id) AS min_id,
         max(event_id) AS max_id,
         min(value) AS min_val,
         max(value) AS max_val,
         CAST(sum(user_id) AS BIGINT) AS sum_users
       FROM events WHERE user_id < 50
       GROUP BY event_type ORDER BY event_type""",
    "src_dsv2_pushdown" -> """
       SELECT event_id, ts, user_id, value FROM events
       WHERE event_type = 'purchase' AND user_id < 30
       ORDER BY event_id""",
    "src_jsonl_corrupt" -> s"""
       SELECT
         CAST(SUM(CASE WHEN event_id % ${WireFormats.CorruptEvery} <> 0
           THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
         CAST(SUM(CASE WHEN event_id % ${WireFormats.CorruptEvery} = 0
           THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         CAST(SUM(CASE WHEN event_id % ${WireFormats.CorruptEvery} <> 0
           THEN event_id ELSE 0 END) AS BIGINT) AS valid_checksum
       FROM events"""
  )
}
