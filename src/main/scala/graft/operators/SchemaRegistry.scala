package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** D6/D7 — DDL parse → schema registry fold → column lookup.
  *
  * The reference keeps a persistent `LocalStore`
  * (local_store.rs:14-28): ordered column-NAME lists keyed by (db, table),
  * no types, maintained by parsing DDL text (query_parser.rs:59-120) with
  * exactly these statements: CREATE TABLE, ALTER TABLE ADD [COLUMN] /
  * RENAME COLUMN / DROP COLUMN, DROP TABLE. Any query containing
  * "database" is ignored (query_parser.rs:63-66); unknown statements fall
  * through silently (query_parser.rs:103,114).
  *
  * Our registry is the same fold, computed distributively: DDL events are
  * a vanishingly small fraction of a changelog (a few thousand statements
  * against 100 TB of row events), so we shuffle only the DDL slice by db
  * and fold per-db in sequence order. The resulting registry is a small
  * DataFrame that joins BROADCAST against the row-event stream (D7).
  */
object SchemaRegistry {

  sealed trait TableOp { def table: String }
  final case class CreateTable(table: String, cols: Seq[String]) extends TableOp
  final case class AddColumn(table: String, col: String) extends TableOp
  final case class RenameColumn(table: String, from: String, to: String) extends TableOp
  final case class DropColumn(table: String, col: String) extends TableOp
  final case class DropTable(table: String) extends TableOp

  private val CreateRe =
    """(?is)\s*create\s+table\s+(?:if\s+not\s+exists\s+)?[`"]?([\w$]+)[`"]?\s*\((.*)\)\s*;?\s*""".r
  private val AlterAddRe =
    """(?is)\s*alter\s+table\s+[`"]?([\w$]+)[`"]?\s+add\s+(?:column\s+)?[`"]?([\w$]+)[`"]?\s+.*""".r
  private val AlterRenameRe =
    """(?is)\s*alter\s+table\s+[`"]?([\w$]+)[`"]?\s+rename\s+column\s+[`"]?([\w$]+)[`"]?\s+to\s+[`"]?([\w$]+)[`"]?\s*;?\s*""".r
  private val AlterDropRe =
    """(?is)\s*alter\s+table\s+[`"]?([\w$]+)[`"]?\s+drop\s+(?:column\s+)?[`"]?([\w$]+)[`"]?\s*;?\s*""".r
  private val DropTableRe =
    """(?is)\s*drop\s+table\s+(?:if\s+exists\s+)?(.+?)\s*;?\s*""".r

  /** Split a CREATE TABLE column-definition body at top-level commas
    * (parenthesised type args like DECIMAL(10,2) must not split). */
  private def splitTopLevel(body: String): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    body.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.result(); cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.result()
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  private val ConstraintPrefixes =
    Set("primary", "unique", "key", "constraint", "foreign", "index", "check")

  /** Parse one DDL statement into table ops — the semantics of
    * query_parser.rs:59-120 (not its sqlparser dependency). Returns Nil
    * for BEGIN / CREATE DATABASE / unknown statements. */
  def parseDdl(sql: String): Seq[TableOp] = {
    if (sql == null || sql.toLowerCase.contains("database")) return Nil
    sql match {
      case CreateRe(table, body) =>
        val cols = splitTopLevel(body)
          .map(_.split("\\s+")(0).stripPrefix("`").stripSuffix("`"))
          .filterNot(c => ConstraintPrefixes.contains(c.toLowerCase))
        Seq(CreateTable(table, cols))
      case AlterRenameRe(table, from, to) => Seq(RenameColumn(table, from, to))
      case AlterAddRe(table, col) => Seq(AddColumn(table, col))
      case AlterDropRe(table, col) => Seq(DropColumn(table, col))
      case DropTableRe(tables) =>
        tables.split(",").toSeq
          .map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).map(DropTable)
      case _ => Nil
    }
  }

  /** Fold ops into a per-db table store — mirrors local_store.rs:72-169:
    * create appends the full list (duplicate create keeps the first,
    * local_store.rs:103-108 errors — we keep-first to stay total),
    * add appends, rename renames in place, drop retains-filters,
    * drop-table removes. */
  def foldOps(ops: Seq[TableOp]): Map[String, Seq[String]] = {
    val store = mutable.LinkedHashMap.empty[String, Seq[String]]
    ops.foreach {
      case CreateTable(t, cols) => if (!store.contains(t)) store(t) = cols
      case AddColumn(t, c) => store.updateWith(t)(_.map(_ :+ c))
      case RenameColumn(t, from, to) =>
        store.updateWith(t)(_.map(_.map(c => if (c == from) to else c)))
      case DropColumn(t, c) => store.updateWith(t)(_.map(_.filterNot(_ == c)))
      case DropTable(t) => store.remove(t)
    }
    store.toMap
  }

  /** D6 — build the registry from a changelog: filter the Query slice,
    * drop database-DDL (T5), parse, fold per db in sequence order.
    * Input needs (db, sequence, query); output (db, table, columns). */
  def fromEvents(ddlEvents: DataFrame): DataFrame = {
    val spark = ddlEvents.sparkSession
    import spark.implicits._
    ddlEvents
      .where(CdcFilters.isRegistryDdl(col("query")))
      .select(col("db"), col("sequence"), col("query"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (db: String, it: Iterator[(String, Long, String)]) =>
        val ops = it.toArray.sortBy(_._2).flatMap(e => parseDdl(e._3))
        foldOps(ops.toSeq).iterator.map { case (t, cols) => (db, t, cols) }
      }
      .toDF("db", "table", "columns")
  }

  /** Registry TIMELINE: one row per (db, table, sequence) giving the
    * column list in force AFTER that DDL event — the versioned registry
    * that SURVEY.md §7 hard-part #3 requires (mid-stream ALTER means row
    * events must resolve against the latest PRECEDING DDL, not a final
    * snapshot). A dropped table emits a null column list. */
  def registryVersions(ddlEvents: DataFrame): DataFrame = {
    val spark = ddlEvents.sparkSession
    import spark.implicits._
    ddlEvents
      .where(CdcFilters.isRegistryDdl(col("query")))
      .select(col("db"), col("sequence"), col("query"))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroups { (db: String, it: Iterator[(String, Long, String)]) =>
        val store = mutable.LinkedHashMap.empty[String, Seq[String]]
        it.toArray.sortBy(_._2).iterator.flatMap { case (_, seq, sql) =>
          parseDdl(sql).map { op =>
            op match {
              case CreateTable(t, cols) =>
                if (!store.contains(t)) store(t) = cols
                (db, t, seq, store.get(t).orNull)
              case AddColumn(t, c) =>
                store.updateWith(t)(_.map(_ :+ c))
                (db, t, seq, store.get(t).orNull)
              case RenameColumn(t, from, to) =>
                store.updateWith(t)(_.map(_.map(x => if (x == from) to else x)))
                (db, t, seq, store.get(t).orNull)
              case DropColumn(t, c) =>
                store.updateWith(t)(_.map(_.filterNot(_ == c)))
                (db, t, seq, store.get(t).orNull)
              case DropTable(t) =>
                store.remove(t)
                (db, t, seq, null)
            }
          }
        }
      }
      .toDF("db", "table", "sequence", "columns")
  }

  /** D7 — column lookup: broadcast equi-join of row events against the
    * registry snapshot (the one join-like op in the reference,
    * local_store.rs:66-69). The registry side is small by construction. */
  def resolveColumns(rowEvents: DataFrame, registry: DataFrame): DataFrame =
    rowEvents.join(
      broadcast(registry.withColumnRenamed("columns", "registry_columns")),
      Seq("db", "table"), "left")
}
