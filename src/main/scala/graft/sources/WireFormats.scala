package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Text wire-format sources (SURVEY.md §2.1/§2.5).
  *
  * The reference's topic wire format is JSON text lines (cdc-mysql
  * produce/consume, §2.5 serde); operationally a Spark engine also meets
  * CSV drops. Both readers take an EXPLICIT schema — schema inference on
  * a 100 TB text lake is a full extra scan of the data and is never
  * acceptable; with a provided schema the text scan is single-pass,
  * splittable, and parallel.
  *
  * The staged copies are derived from the parquet `events` table once per
  * (format, sfDir) and reused — the queries over them prove round-trip
  * fidelity of the text serde against the parquet-backed oracle.
  */
object WireFormats {

  /** events schema for text readers (ts already truncated to micros). */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Symmetric writer/reader pattern: the default text timestamp pattern
    * keeps milliseconds only; the events table carries microseconds. */
  private val TsFormat = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def stage(spark: SparkSession, sfDir: String, fmt: String): String =
    synchronized {
      val key = s"${fmt}_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val dir = new java.io.File(s"/tmp/graft_wire/$key")
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        dir.getParentFile.mkdirs()
        val w = Tables.events(spark, sfDir).write.mode("overwrite")
          .option("timestampFormat", TsFormat)
        fmt match {
          case "jsonl" => w.json(dir.toString)
          case "csv" => w.option("header", "true").csv(dir.toString)
          case "orc" => w.orc(dir.toString)
          case "xml" => w.option("rowTag", "event").xml(dir.toString)
        }
      }
      dir.toString
    }

  /** Staged JSONL directory — shared with the [[CdcWireSource]] DSv2
    * connector, which reads the same wire bytes through its own reader. */
  def jsonlDir(spark: SparkSession, sfDir: String): String =
    stage(spark, sfDir, "jsonl")

  /** Multi-file JSONL staging for the connector's MICRO-BATCH stream:
    * six topic-segment files so `maxFilesPerTrigger` produces a real
    * multi-batch replay (the single-file batch staging would collapse
    * to one batch). */
  def jsonlStreamDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val key = s"jsonl_stream_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val dir = new java.io.File(s"/tmp/graft_wire/$key")
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        dir.getParentFile.mkdirs()
        Tables.events(spark, sfDir).repartition(6).write.mode("overwrite")
          .option("timestampFormat", TsFormat).json(dir.toString)
      }
      dir.toString
    }

  /** JSON-lines read with explicit schema (no inference pass). */
  def eventsJsonl(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(EventsSchema).option("timestampFormat", TsFormat)
      .json(stage(spark, sfDir, "jsonl"))

  /** CSV read with explicit schema + header (no inference pass). Quoted
    * fields cover the JSON-bearing `props` column. */
  def eventsCsv(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(EventsSchema).option("timestampFormat", TsFormat)
      .option("header", "true")
      .csv(stage(spark, sfDir, "csv"))

  /** ORC read (binary columnar alternative to parquet — the lake-format
    * matrix's third member). ORC is self-describing, so no schema/
    * timestamp options: fidelity vs the parquet oracle proves the
    * micros-exact timestamp and JSON-bearing string survive the ORC
    * writer/reader pair, and `.explain` shows the same pushdown surface
    * (PushedFilters on the OrcScan) as parquet. */
  def eventsOrc(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.orc(stage(spark, sfDir, "orc"))

  /** XML read (Spark 4's built-in XML source) with explicit schema +
    * rowTag — the enterprise-feed wire format beside JSONL/CSV. The
    * JSON-bearing `props` column exercises entity escaping both ways;
    * the µs timestamp rides the same explicit pattern as the text
    * readers (XML is a text format — inference is likewise a full extra
    * scan and likewise never acceptable). */
  def eventsXml(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.schema(EventsSchema).option("timestampFormat", TsFormat)
      .option("rowTag", "event")
      .xml(stage(spark, sfDir, "xml"))

  /** Every `CorruptEvery`-th event is staged as a BROKEN line in the
    * dirty JSONL copy (deterministic planting, so the oracle knows the
    * corrupt set arithmetically). */
  val CorruptEvery = 13L

  private def stageDirty(spark: SparkSession, sfDir: String): String =
    synchronized {
      import org.apache.spark.sql.functions._
      val key = s"jsonl_dirty_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val dir = new java.io.File(s"/tmp/graft_wire/$key")
      if (!new java.io.File(dir, "_SUCCESS").exists()) {
        dir.getParentFile.mkdirs()
        val ev = Tables.events(spark, sfDir)
        ev.select(
            when(col("event_id") % CorruptEvery === 0,
              lit("""{"event_id": BROKEN"""))
              .otherwise(to_json(struct(ev.columns.map(col): _*),
                Map("timestampFormat" -> TsFormat)))
              .as("value"))
          .write.mode("overwrite").text(dir.toString)
      }
      dir.toString
    }

  /** PERMISSIVE read of the dirty JSONL: malformed lines land whole in
    * `_corrupt_record` with null data columns instead of failing the
    * scan — the tolerance a 100 TB text-lake ingest needs (FAILFAST on
    * petabytes of crawled text means one bad line kills the job; schema
    * inference is equally banned, see [[eventsJsonl]]). Cached before
    * use: Spark disallows queries over the corrupt column on the raw
    * lazy scan (the parser may prune it), and the callers aggregate it.
    */
  def eventsJsonlDirty(spark: SparkSession, sfDir: String): DataFrame =
    spark.read
      .schema(EventsSchema.add("_corrupt_record", StringType))
      .option("timestampFormat", TsFormat)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(stageDirty(spark, sfDir))
      .cache()

  /** Two parquet "epochs" of the events table: epoch 1 (even event_ids)
    * written BEFORE the `props` column existed, epoch 2 (odd ids) with
    * the full schema — the long-lived-lake reality that columns get
    * added over a table's lifetime. */
  private def stageEvolved(spark: SparkSession, sfDir: String): (String, String) =
    synchronized {
      val key = s"parquet_evolve_${sfDir.replaceAll("[^A-Za-z0-9]", "_")}"
      val dir = new java.io.File(s"/tmp/graft_wire/$key")
      val (e1, e2) = (new java.io.File(dir, "e1"), new java.io.File(dir, "e2"))
      if (!new java.io.File(e1, "_SUCCESS").exists() ||
          !new java.io.File(e2, "_SUCCESS").exists()) {
        dir.mkdirs()
        val ev = Tables.events(spark, sfDir)
        ev.where(org.apache.spark.sql.functions.col("event_id") % 2 === 0)
          .drop("props")
          .write.mode("overwrite").parquet(e1.toString)
        ev.where(org.apache.spark.sql.functions.col("event_id") % 2 === 1)
          .write.mode("overwrite").parquet(e2.toString)
      }
      (e1.toString, e2.toString)
    }

  /** Schema-evolution read: `mergeSchema` unions the epochs' footers —
    * epoch-1 rows surface NULL `props`, nothing is rewritten. The merge
    * cost is O(file footers), not O(data); a production lake pins the
    * merged schema in a catalog and skips even that (same scan plan). */
  def eventsParquetEvolved(spark: SparkSession, sfDir: String): DataFrame = {
    val (e1, e2) = stageEvolved(spark, sfDir)
    spark.read.option("mergeSchema", "true").parquet(e1, e2)
  }
}
