package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resample + gap-fill — the metric-rollup shape every
  * monitoring consumer of a changelog eventually needs (the reference's
  * events are wall-clock ordered; see SURVEY.md §1.1 on the ordered-log
  * data model, cdc-mysql/src/messages.rs:20-60 for the event envelope).
  *
  * Semantics: bucket events to the hour per key, then materialize the
  * FULL hour grid between each key's first and last active hour and
  * forward-fill the last observed aggregate into the gap hours —
  * `last_value IGNORE NULLS` over an ever-growing frame, the standard
  * SQL:2011 formulation, which both Spark and DuckDB implement natively.
  *
  * Scale shape (100 TB): one shuffle for the hourly rollup (map-side
  * partial agg first), one tiny agg for per-key spans, a map-side
  * `sequence` explode for the grid (output size = Σ key spans — bounded
  * by keys × retention window, NOT by event count), a key-hash join of
  * grid × rollup, and one window per key. The window frame is
  * running-accumulative (UNBOUNDED PRECEDING → CURRENT ROW) so Spark
  * evaluates it in a single pass per key, no per-row rescan. Nothing
  * touches the driver.
  */
object TimeSeries {

  /** LINEAR interpolation across the hour grid (the gap-fill's smoother
    * sibling): a gap hour's value is prev + (next - prev) · w, where w
    * is the gap position between the surrounding observed hours. Same
    * single-shuffle shape as [[gapFillHourly]] plus one backward window
    * (same partitioning, one extra in-partition sort). The interpolation
    * expression is written ONCE and mirrored textually in the oracle, so
    * both engines run the identical IEEE operation sequence. Trailing
    * gaps (no next observation) hold the last value. */
  def interpolateHourly(events: DataFrame, maxUser: Int): DataFrame = {
    val hourly = events
      .where(col("user_id") < maxUser)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("rev"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val back = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val j = grid.join(hourly, Seq("user_id", "hour"), "left")
      .withColumn("prev_v", last(col("rev"), ignoreNulls = true).over(back))
      .withColumn("prev_h",
        last(when(col("rev").isNotNull, col("hour")), ignoreNulls = true).over(back))
      .withColumn("next_v", first(col("rev"), ignoreNulls = true).over(fwd))
      .withColumn("next_h",
        first(when(col("rev").isNotNull, col("hour")), ignoreNulls = true).over(fwd))
    // the ONE interpolation expression (oracle mirrors it verbatim):
    // prev + (next - prev) * (t - tp) / (tn - tp). Operands are µs to
    // MATCH the oracle's epoch_us exactly — scaling by 1e6 does not
    // commute with double rounding, so the unit must be identical for
    // the op sequence to be bit-identical.
    val interp = col("prev_v") +
      (col("next_v") - col("prev_v")) *
        (unix_micros(col("hour")) - unix_micros(col("prev_h"))).cast("double") /
        (unix_micros(col("next_h")) - unix_micros(col("prev_h"))).cast("double")
    // NO round() on the output: the doubles are bit-identical across
    // engines (same op sequence), while round()'s semantics are NOT
    // (Spark rounds the shortest decimal repr, DuckDB the binary value
    // — they disagree when the repr lands exactly on a 5)
    j.select(col("user_id"), col("hour"),
        when(col("rev").isNotNull, col("rev"))
          .when(col("next_v").isNull, col("prev_v"))
          .otherwise(interp).as("rev_interp"),
        col("rev").isNull.as("is_gap"))
      .orderBy("user_id", "hour")
  }

  /** Gaps-and-islands: merge a user's events into activity islands —
    * consecutive events ≤ `gapMin` minutes apart coalesce; a larger gap
    * starts a new island. The classic lag-flag + running-sum island id
    * (one shuffle, two same-partitioning windows), then one aggregate:
    * per user, island count, total covered seconds, longest island.
    * All integer arithmetic — bit-exact on both engines. */
  def activityIslands(events: DataFrame, gapMin: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val run = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // µs arithmetic throughout: flooring to seconds BEFORE differencing
    // would disagree with the µs-exact oracle at gap boundaries
    val marked = events.select(col("user_id"), col("ts"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_island",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) >
            gapMin * 60L * 1000000L, 1L).otherwise(0L))
      .withColumn("island", sum(col("new_island")).over(run))
    marked.groupBy(col("user_id"), col("island"))
      .agg(expr("(max(unix_micros(ts)) - min(unix_micros(ts))) DIV 1000000")
        .as("span_s"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("span_s")).as("covered_s"),
        max(col("span_s")).as("longest_s"))
      .orderBy("user_id")
  }

  /** Hour-grid forward fill over `events` (schema: user_id, ts, value).
    * `maxUser` caps the key set purely to keep test output reviewable;
    * the plan is key-count independent. */
  def gapFillHourly(events: DataFrame, maxUser: Int): DataFrame = {
    val hourly = events
      .where(col("user_id") < maxUser)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).as("rev"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hour"), "left")
      .select(col("user_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        last(col("rev"), ignoreNulls = true).over(w)
          .cast("double").as("rev_filled"),
        col("n").isNull.as("is_gap"))
      .orderBy("user_id", "hour")
  }
}
