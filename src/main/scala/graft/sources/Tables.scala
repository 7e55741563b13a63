package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table readers. */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` carries TIMESTAMP(NANOS) which Spark's parquet reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). Sessions must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Bench/Verify/test builders
    * all set it); we read the nanos long and truncate to micros — exactly
    * what DuckDB does internally, so oracle comparisons on `ts` agree.
    * Config is deliberately NOT mutated here: a conf-set at plan-build time
    * is a global session side effect (round-1 advice). */
  def events(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
}
