package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * rightTime <= leftTime within the same key.
  *
  * The reference has no as-of operator; we add it for the engine surface
  * (SURVEY.md §2.6/§2.7). Implementation is the scalable union+window
  * pattern rather than a per-key collect or a non-equi join:
  *
  *   1. tag both sides, union by name (right payload columns null on left),
  *   2. one shuffle: window partitionBy(key) orderBy(time, side) with side
  *      ordering right-before-left at equal timestamps (<= semantics),
  *   3. last(payload, ignoreNulls) forward-fills the newest right payload,
  *   4. keep left rows.
  *
  * Cost: a single hash shuffle + in-partition sort — the same plan shape a
  * sort-merge join would use, with no range-explosion. Right side must be
  * unique per (key, time); pre-aggregate it if not (the caller owns that,
  * since "which duplicate wins" is not well-defined otherwise).
  */
object AsOfJoin {

  /** @param left       left rows
    * @param right      right rows, unique per (key, time)
    * @param key        equi-key column name present on both sides
    * @param leftTime   left timestamp column name
    * @param rightTime  right timestamp column name
    * @param payload    right columns to carry (forward-filled as-of)
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    val lWithNulls = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))
    val r = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side")) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    val rAligned = lWithNulls.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lWithNulls.schema(c).dataType))
    }.select(lWithNulls.columns.map(col): _*)

    // right (side=0) sorts before left (side=1) at equal __t → <= semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = payload.foldLeft(lWithNulls.unionByName(rAligned)) { (df, p) =>
      df.withColumn(s"__asof_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w))
    }
    val out = filled.where(col("__side") === 1)
    val renamed = payload.foldLeft(out)((df, p) =>
      df.withColumn(s"asof_$p", col(s"__asof_$p")))
    renamed.drop(
      (Seq("__t", "__side") ++ payload.flatMap(p =>
        Seq(s"__p_$p", s"__asof_$p"))): _*)
  }

  /** NEAREST-direction as-of (pandas `merge_asof(direction='nearest')`):
    * for each left row, the right row minimizing |rightTime - leftTime|
    * within the key; exact-distance ties go BACKWARD (the earlier right
    * row) — equivalently, minimize (distance, rightTime).
    *
    * Same single-shuffle union+window shape as [[asOf]], run in both
    * directions over ONE union: the backward pass forward-fills the
    * latest right ≤ t, the forward pass (same hash partitioning, one
    * extra in-partition sort — Spark plans no second exchange)
    * back-fills the earliest right ≥ t, and a map-side CASE picks the
    * closer. No range join, no per-key collect, no candidate explosion.
    *
    * Output: left columns + `asof_<p>` payloads + `asof_ts` (the chosen
    * right row's time; null when the key has no right rows at all). */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__pt", lit(null).cast(right.schema(rightTime).dataType))
    val lWithNulls = payload.foldLeft(l)((df, p) =>
      df.withColumn(s"__p_$p", lit(null).cast(right.schema(p).dataType)))
    val r = right.select(
      (Seq(col(key), col(rightTime).as("__t"), lit(0).as("__side"),
        col(rightTime).as("__pt")) ++
        payload.map(p => col(p).as(s"__p_$p"))): _*)
    val rAligned = lWithNulls.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lWithNulls.schema(c).dataType))
    }.select(lWithNulls.columns.map(col): _*)
    val u = lWithNulls.unionByName(rAligned)

    // backward: right BEFORE left at equal __t (<= semantics)
    val wB = Window.partitionBy(col(key)).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // forward: right AFTER left at equal __t (>= semantics). Same hash
    // partitioning — only an extra in-partition sort, no new exchange.
    val wF = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val both = payload.foldLeft(
      u.withColumn("__bt", last(col("__pt"), ignoreNulls = true).over(wB))
        .withColumn("__ft", first(col("__pt"), ignoreNulls = true).over(wF))
    ) { (df, p) =>
      df.withColumn(s"__b_$p", last(col(s"__p_$p"), ignoreNulls = true).over(wB))
        .withColumn(s"__f_$p", first(col(s"__p_$p"), ignoreNulls = true).over(wF))
    }

    // forward wins only when present AND strictly closer (ties backward).
    // Casts: sides may mix TIMESTAMP and TIMESTAMP_NTZ (parquet micros);
    // under the UTC sessions every entry point builds, the cast is a
    // wall-clock no-op and unix_micros needs the zoned type.
    def us(c: Column): Column = unix_micros(c.cast("timestamp"))
    val takeBackward = col("__ft").isNull ||
      (col("__bt").isNotNull &&
        us(col("__t")) - us(col("__bt")) <= us(col("__ft")) - us(col("__t")))
    val out = both.where(col("__side") === 1)
      .withColumn("asof_ts",
        when(takeBackward, col("__bt")).otherwise(col("__ft")))
    val withPayload = payload.foldLeft(out)((df, p) =>
      df.withColumn(s"asof_$p",
        when(takeBackward, col(s"__b_$p")).otherwise(col(s"__f_$p"))))
    withPayload.drop(
      (Seq("__t", "__side", "__pt", "__bt", "__ft") ++ payload.flatMap(p =>
        Seq(s"__p_$p", s"__b_$p", s"__f_$p"))): _*)
  }
}
