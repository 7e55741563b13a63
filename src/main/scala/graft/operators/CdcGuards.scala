package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Cdc

/** Malformed-event guards — the consumer's validation layer
  * (cdc-mysql/src/consumer/mysql_manager.rs:302-335): before a row
  * event reaches the apply fold, the reference checks that its URI
  * names a table (`table_name`, :314-323), that it carries a usable
  * column list (`check_valid_cols`, :302-311), and that no row holds
  * more values than there are column names (`check_valid_col_count`,
  * :326-335 — per row, before- and after-image both); the follower
  * MySQL then rejects statements on tables or columns that do not
  * exist. Here the same classification runs as ONE map-side pass over
  * the stream: the envelope checks are pure Catalyst expressions, and
  * the registry checks ride a broadcast interval join against the
  * DDL-derived per-table SCHEMA WINDOWS (what the as-of registry says
  * the table looked like in each sequence range). Instead of aborting
  * the stream (the reference errors out), mismatching events route to
  * a QUARANTINE side-output while clean events flow on untouched —
  * the shape a 100 TB pipeline needs: one corrupt producer must not
  * stall every other table's apply.
  *
  * Contract alignment with the engine's established semantics, so a
  * clean changelog applies BYTE-IDENTICALLY with guards on:
  * null column lists are legal (the typed apply resolves widths from
  * the registry — ChangelogApply's mid-stream width handling), tables
  * with no in-log DDL are ungoverned and never quarantined (the
  * fallback contract), and pre-CREATE events keep route-and-clear.
  */
object CdcGuards {

  /** One as-of schema window of a GOVERNED (db, table) name:
    * in [from, to) the name either carried `cols` (existing) or was
    * DEAD (`cols == null` — dropped/renamed away after having been
    * bound; windows before the first binding are not emitted, keeping
    * pre-CREATE semantics). Driver-side fold of the capped DDL slice
    * (the D7 smallness argument). */
  private[graft] def schemaWindows(
      ddl: Seq[(String, Long, String)]): Seq[(String, String, Long, Long, Seq[String])] = {
    import SchemaRegistry._
    val state = scala.collection.mutable.LinkedHashMap.empty[(String, String), Seq[String]]
    val bound = scala.collection.mutable.LinkedHashSet.empty[(String, String)]
    val openFrom = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
    val out = Seq.newBuilder[(String, String, Long, Long, Seq[String])]
    def transition(k: (String, String), seq: Long, next: Seq[String]): Unit = {
      openFrom.get(k).foreach { from =>
        if (from < seq) out += ((k._1, k._2, from, seq, state.getOrElse(k, null)))
      }
      openFrom(k) = seq
      if (next == null) state.remove(k) else { state(k) = next; bound += k }
      ()
    }
    for ((db, seq, sql) <- ddl.sortBy(_._2);
        op <- parseDdl(sql) ++ parsePassthrough(sql)) {
      val k = (db, op.table)
      op match {
        case CreateTable(t, cs) =>
          if (!state.contains((db, t))) transition((db, t), seq, cs)
        case AddColumn(_, c) if state.contains(k) =>
          transition(k, seq, state(k) :+ c)
        case DropColumn(_, c) if state.contains(k) =>
          val cs = state(k)
          val i = cs.indexOf(c)
          transition(k, seq, if (i >= 0) cs.patch(i, Nil, 1) else cs)
        case RenameColumn(_, from0, to0) if state.contains(k) =>
          transition(k, seq, state(k).map(c => if (c == from0) to0 else c))
        case DropTable(t) if state.contains((db, t)) =>
          transition((db, t), seq, null)
        case RenameTable(from0, to0) =>
          if (state.contains((db, from0)) && !state.contains((db, to0))) {
            val cs = state((db, from0))
            transition((db, from0), seq, null)
            transition((db, to0), seq, cs)
          }
        case DropDatabase(db0) =>
          state.keys.filter(_._1 == db0).toSeq.foreach(transition(_, seq, null))
        case _ => ()
      }
    }
    // close the final window of every name that was ever bound; a name
    // currently dead keeps its dead window open to +inf
    openFrom.foreach { case (k, from) =>
      if (bound.contains(k))
        out += ((k._1, k._2, from, Long.MaxValue, state.getOrElse(k, null)))
    }
    out.result().filter { case (db, t, _, _, cols) =>
      // suppress never-bound-yet windows (pre-CREATE): a window exists
      // only from the first binding on
      cols != null || bound.contains((db, t))
    }
  }

  private def isRowOp(op: Column): Column =
    op.isin(Cdc.OpAdd, Cdc.OpUpdate, Cdc.OpDelete)

  /** Any row with MORE values than `limit` (before- or after-image) —
    * the reference's per-row `check_valid_col_count`. `size` of a null
    * array is -1, so absent images pass. */
  private def overWidth(limit: Column): Column =
    exists(col("rows"), r =>
      size(r.getField("cols")) > limit ||
        size(r.getField("before_cols")) > limit)

  /** Split a typed changelog into (pass, quarantine). `pass` keeps the
    * input schema and order contract untouched; `quarantine` is
    * (sequence, op, reason) with the FIRST failing check:
    * missing_table, arity_mismatch (event's own column list shorter
    * than a row), unknown_table (registry window says dropped),
    * unknown_column (event names a column the as-of registry does not
    * know), width_mismatch (more values than the as-of width). */
  def partition(events: DataFrame): (DataFrame, DataFrame) = {
    val spark = events.sparkSession
    val windows = schemaWindows(ChangelogApply.ddlSlice(events))
    val windowsDf = {
      import spark.implicits._
      windows.toDF("w_db", "w_tbl", "w_from", "w_to", "w_cols")
    }
    val withId = events
      .withColumn("g_db", try_element_at(split(col("uri"), "/"), lit(4)))
      .withColumn("g_tbl", try_element_at(split(col("uri"), "/"), lit(5)))
    // as-of window membership: a broadcast interval join on the tiny
    // DDL-derived table — map-side, O(windows) per partition; events on
    // ungoverned tables (or pre-CREATE) match nothing and pass through
    val joined = withId.join(broadcast(windowsDf),
      col("g_db") === col("w_db") && col("g_tbl") === col("w_tbl") &&
        col("sequence") >= col("w_from") && col("sequence") < col("w_to"),
      "left")
    val governed = col("w_from").isNotNull
    val reason = when(!isRowOp(col("op")), lit(null).cast("string"))
      .when(col("g_tbl").isNull, lit("missing_table"))
      .when(col("columns").isNotNull && overWidth(size(col("columns"))),
        lit("arity_mismatch"))
      .when(governed && col("w_cols").isNull, lit("unknown_table"))
      .when(governed && col("columns").isNotNull &&
          size(array_except(col("columns"), col("w_cols"))) > 0,
        lit("unknown_column"))
      .when(governed && overWidth(size(col("w_cols"))), lit("width_mismatch"))
    val classified = joined.withColumn("g_reason", reason)
    val pass = classified.where(col("g_reason").isNull)
      .select(events.columns.map(col): _*)
    val quarantine = classified.where(col("g_reason").isNotNull)
      .select(col("sequence"), col("op"), col("g_reason").as("reason"))
    (pass, quarantine)
  }
}
