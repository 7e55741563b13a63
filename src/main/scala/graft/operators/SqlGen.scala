package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{Cdc, Value}

/** K2 front half — regeneration of the reference consumer's SQL statements
  * (mysql_manager.rs:208-292):
  *
  *  - Add    → `INSERT INTO t (c1, c2) VALUES (v1, v2)` per row
  *    (build_add_queries, mysql_manager.rs:208-229)
  *  - Update → `UPDATE t SET <changed cols only> WHERE <entire
  *    before-image, null-safe>` (build_update_queries,
  *    mysql_manager.rs:232-267: SET keeps only cells where before != after,
  *    246-251; WHERE renders `col is NULL` for Null cells, 253-256)
  *  - Delete → `DELETE FROM t WHERE <entire image, null-safe>`
  *    (build_delete_queries, mysql_manager.rs:270-292)
  *  - Query  → the DDL text replayed verbatim (mysql_manager.rs:89-95)
  *
  * Two implementations kept bit-identical by SqlGenSpec:
  * [[statements]] — the engine path, pure Catalyst expressions over typed
  * tagged-JSON cells (scales, codegen'd); and the row-level builders below
  * mirroring the reference functions 1:1 for the unit goldens
  * (mysql_manager.rs:449-453, 535-539, 593-597).
  */
object SqlGen {

  // ---------- engine path: statement generation as expressions ----------

  private val NullLit = lit(Value.NullCell)

  /** 1..n index array; empty when n = 0 — Spark's `sequence(1, 0)` steps
    * DOWN to [1, 0], which would make an empty image error in element_at
    * instead of producing an empty clause (round-2 advice). */
  private def idxTo(n: Column): Column =
    when(n > 0, sequence(lit(1), n)).otherwise(array().cast("array<int>"))

  // Clauses iterate over IMAGE positions (like the row-level builders over
  // row.indices) — the resolved column list may legally be wider than the
  // image (check_valid_col_count, mysql_manager.rs:326-335), never
  // narrower (guarded by widthGuard).
  private def whereClause(cols: Column, img: Column): Column = {
    val idx = idxTo(size(img))
    array_join(
      transform(idx, i =>
        when(element_at(img, i) === NullLit,
          concat(element_at(cols, i), lit(" is NULL")))
          .otherwise(concat(element_at(cols, i), lit("="),
            ValueCodec.render(element_at(img, i))))),
      " AND ")
  }

  private def setClause(cols: Column, before: Column, after: Column): Column = {
    val idx = idxTo(least(size(before), size(after)))
    array_join(
      transform(
        // null-safe inequality: a typed log's SQL NULL is the "Null" token
        // string, but a plain null-cell log must not silently drop
        // null<->value transitions from the SET list (round-2 advice)
        filter(idx, i => !(element_at(before, i) <=> element_at(after, i))),
        i => concat(element_at(cols, i), lit("="),
          ValueCodec.render(element_at(after, i)))),
      ", ")
  }

  /** Engine-path twin of check_valid_cols / check_valid_col_count
    * (mysql_manager.rs:302-335): a row event whose image is wider than the
    * resolved column list ERRORS — mirroring the reference — instead of
    * zipping mismatched widths into a wrong statement (round-2 verdict #3).
    * raise_error sits in the otherwise-branch, so valid events never pay
    * for it. */
  private def widthGuard(cols: Column, imgs: Seq[Column], stmt: Column): Column = {
    val nCols = coalesce(size(cols), lit(0))
    val ok = imgs.map(i => nCols >= size(i)).reduce(_ && _)
    val widest =
      if (imgs.size == 1) size(imgs.head) else greatest(imgs.map(size): _*)
    when(ok, stmt).otherwise(raise_error(concat(
      lit("expected at least "), widest.cast("string"),
      lit(" columns, found "), nCols.cast("string"))))
  }

  /** One output row per generated statement: (sequence, stmt_idx, stmt).
    * Input is a typed changelog (Cdc.EventSchema with tagged-JSON cells);
    * the table name comes from the event URI (T9, the consumer's own
    * routing, mysql_manager.rs:341-363) and column names from the event's
    * `columns` field (producer-resolved, check_valid_cols
    * mysql_manager.rs:302-311). Query events pass through verbatim with
    * stmt_idx 0. */
  def statements(events: DataFrame): DataFrame = {
    val tbl = element_at(split(col("uri"), "/"), 5)
    val ddl = events.where(col("op") === Cdc.OpQuery && col("query").isNotNull)
      .select(col("sequence"), lit(0).as("stmt_idx"), col("query").as("stmt"))
    val rowEvents = events
      .where(col("op").isin(Cdc.OpAdd, Cdc.OpUpdate, Cdc.OpDelete))
      .select(col("sequence"), col("op"), col("columns"), tbl.as("tbl"),
        posexplode(col("rows")).as(Seq("stmt_idx", "r")))
    val before = col("r.before_cols")
    val after = col("r.cols")
    val stmt =
      when(col("op") === Cdc.OpAdd, widthGuard(col("columns"), Seq(after),
        concat(lit("INSERT INTO "), col("tbl"), lit(" ("),
          array_join(col("columns"), ", "), lit(") VALUES ("),
          array_join(transform(after, ValueCodec.render _), ", "), lit(")"))))
        .when(col("op") === Cdc.OpUpdate,
          widthGuard(col("columns"), Seq(before, after),
            concat(lit("UPDATE "), col("tbl"), lit(" SET "),
              setClause(col("columns"), before, after), lit(" WHERE "),
              whereClause(col("columns"), before))))
        .when(col("op") === Cdc.OpDelete, widthGuard(col("columns"), Seq(after),
          concat(lit("DELETE FROM "), col("tbl"), lit(" WHERE "),
            whereClause(col("columns"), after))))
    ddl.unionByName(
      rowEvents.select(col("sequence"), col("stmt_idx"), stmt.as("stmt")))
  }

  // ---------- row-level twins for the reference unit goldens ----------

  /** mysql_manager.rs:326-335 — found may not be fewer than expected. */
  private def checkColCount(expected: Int, found: Int): Unit =
    require(found >= expected,
      s"expected at least $expected columns, found $found")

  /** build_add_queries (mysql_manager.rs:208-229). */
  def buildAddQueries(table: String, cols: Seq[String],
      rows: Seq[Seq[Value]]): Seq[String] = {
    val columns = cols.mkString(", ")
    rows.map { row =>
      checkColCount(row.length, cols.length)
      s"INSERT INTO $table ($columns) VALUES (${row.map(_.display).mkString(", ")})"
    }
  }

  /** build_update_queries (mysql_manager.rs:232-267). */
  def buildUpdateQueries(table: String, cols: Seq[String],
      rows: Seq[(Seq[Value], Seq[Value])]): Seq[String] =
    rows.map { case (before, after) =>
      checkColCount(before.length, cols.length)
      checkColCount(after.length, cols.length)
      val sets = before.indices.collect {
        case i if before(i) != after(i) => s"${cols(i)}=${after(i).display}"
      }
      val wheres = before.indices.map { i =>
        before(i) match {
          case Value.VNull => s"${cols(i)} is NULL"
          case v => s"${cols(i)}=${v.display}"
        }
      }
      s"UPDATE $table SET ${sets.mkString(", ")} WHERE ${wheres.mkString(" AND ")}"
    }

  /** build_delete_queries (mysql_manager.rs:270-292). */
  def buildDeleteQueries(table: String, cols: Seq[String],
      rows: Seq[Seq[Value]]): Seq[String] =
    rows.map { row =>
      checkColCount(row.length, cols.length)
      val wheres = row.indices.map { i =>
        row(i) match {
          case Value.VNull => s"${cols(i)} is NULL"
          case v => s"${cols(i)}=${v.display}"
        }
      }
      s"DELETE FROM $table WHERE ${wheres.mkString(" AND ")}"
    }
}
