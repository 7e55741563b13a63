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
    * — it only repairs the single-file degenerate case.
    *
    * ==Fault-tolerance caveat (round-11 advice)==
    * localCheckpoint TRUNCATES lineage: the checkpointed blocks are not
    * recomputable, so on a CLUSTER an executor loss (or an external
    * unpersist while a derived frame is still live) fails re-execution
    * instead of recomputing. Two things bound the exposure: (a) the
    * branch only activates when the scan has fewer splits than
    * defaultParallelism — on a cluster that means a near-empty or
    * single-unsplittable-file input, where a retry-from-scratch is
    * cheap; (b) no long-lived/memoized DataFrame in this codebase
    * retains a fanout result across the per-query unpersist boundary
    * (the memoized artifacts cache paths/rows/timestamps, never plans).
    * A deployment that cannot accept either swaps this for a staged
    * write+read-back of the repartitioned scan — same barrier,
    * recomputable. */
  def fanout(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val p = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < p)
        df.repartition(p).localCheckpoint(false)
      else df
    }

  /** The suite's STANDARD text-retrieval probe set — every hundredth
    * document's first three terms, distinct — MEMOIZED per (process,
    * sfDir) as driver-side rows and served as a LocalRelation (the
    * round-3 leftJoinBounds / round-11 codebook-memo idiom: a pure
    * function of the immutable testdata, collected once per process).
    * Before this, every retrieval tail re-derived it — one
    * scan+explode+distinct+take JOB per retrieval call, ~15 batch call
    * sites plus every drain's serving tail. The set is probe-sized by
    * contract (TextIndex.MaxQueryTerms bounds the same snapshot
    * downstream); the take here enforces the same bound loudly. Row SET
    * is identical to the inline expression (distinct is unordered;
    * every consumer treats it as a set), so answers are unchanged. */
  private val textProbeSets = new java.util.concurrent.ConcurrentHashMap[
    String, Array[org.apache.spark.sql.Row]]()

  def textProbeSet(spark: SparkSession, sfDir: String): DataFrame = {
    val rows = textProbeSets.computeIfAbsent(sfDir, _ => {
      val r = table(spark, sfDir, "documents")
        .where(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"),
          explode(slice(split(col("text"), " "), 1, 3)).as("term"))
        .distinct()
        .take(graft.operators.TextIndex.MaxQueryTerms + 1)
      require(r.length <= graft.operators.TextIndex.MaxQueryTerms,
        "standard probe set exceeds MaxQueryTerms — batch the queries")
      r
    })
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType.fromDDL(
        "q_id BIGINT, term STRING"))
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
