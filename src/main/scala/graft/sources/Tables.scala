package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table readers. */
object Tables {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Fan a narrow scan out to the session's parallelism before a heavy
    * per-row kernel (shingle explode, fold_hash, trigram build, k-means
    * distance folds). The sf test tables are ONE parquet row group each,
    * and a row group is the minimum parquet split unit — so locally
    * everything upstream of the first shuffle would otherwise run as ONE
    * task, serializing exactly the CPU-heavy part of every text/embedding
    * pipeline on a 32-core box. At cluster scale the scan already has
    * >= cores splits and this is the identity: no shuffle is added (the
    * same reason a real job repartitions after reading a few large gzip
    * files). Round-robin repartition is safe everywhere it is used —
    * every downstream aggregate in this codebase is order-independent by
    * the decimal-sum/integer-count ground rules. Streaming inputs pass
    * through untouched (micro-batch scans are planned per-batch). */
  /** Spread a narrow scan across the session's cores. The testdata
    * tables are single parquet files with one row group — an
    * unsplittable 1-task scan — and a bare `repartition(p)` is NOT
    * enough for filter-shaped consumers: the optimizer pushes
    * deterministic filters THROUGH a round-robin exchange, so a heavy
    * per-row gate (shingle ratios, char histograms) collapses back into
    * the single-task scan stage and serializes the whole pipeline
    * (measured: pipeline_curate spent 2.4 s of its 3.5 s in that one
    * task). The lazy localCheckpoint is the barrier: the plan truncates
    * at a LogicalRDD, nothing can be pushed below the fanout, and the
    * one materialized scan is shared by every downstream branch (the
    * curation capstones read the corpus 4×). Blocks are freed by the
    * per-query unpersist both Bench and probes already run. At scale
    * the input arrives as many splits and this whole branch is a no-op
    * (partitions >= parallelism), so nothing here tunes FOR local mode
    * — it only repairs the single-file degenerate case. */
  def fanout(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p)
        df.repartition(p).localCheckpoint(false)
      else df
    }

  /** `events.parquet`'s `ts` physical type has varied across testdata
    * generations: TIMESTAMP(NANOS) — which Spark's parquet reader only
    * accepts as a raw long under `spark.sql.legacy.parquet.nanosAsLong=true`
    * (Bench/Verify/test builders all set it) — and plain TIMESTAMP(MICROS),
    * which arrives as TIMESTAMP_NTZ (no UTC-adjust flag). Normalize both to
    * session-zone TIMESTAMP at micro precision: the nanos long truncates
    * (exactly what DuckDB does internally), the NTZ form casts — a wall-
    * clock no-op under the UTC sessions all entry points build. Config is
    * deliberately NOT mutated here: a conf-set at plan-build time is a
    * global session side effect (round-1 advice). */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
