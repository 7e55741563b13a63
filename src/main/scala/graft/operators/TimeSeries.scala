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
