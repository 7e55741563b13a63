package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T1-T5 — the reference's filter/predicate surface, as pure Column
  * predicates (codegen-friendly, pushdown-eligible) plus DataFrame
  * transforms. All case folding happens on BOTH the config side (done once
  * at construction, mirroring profile.rs:77-92) and the event side.
  */
object CdcFilters {

  /** T1 — producer db filter (binlog_parser.rs:232-265): include-list wins
    * if present, else exclude-list; an event with NO db passes. */
  def producerDbFilter(
      dbCol: Column,
      includeDbs: Seq[String],
      excludeDbs: Seq[String]): Column = {
    val inc = includeDbs.map(_.toLowerCase)
    val exc = excludeDbs.map(_.toLowerCase)
    val base =
      if (inc.nonEmpty) lower(dbCol).isin(inc: _*)
      else if (exc.nonEmpty) !lower(dbCol).isin(exc: _*)
      else lit(true)
    dbCol.isNull || base
  }

  /** T2 — consumer db filter (mysql_manager.rs:375-391): same membership
    * test but an event with NO db is DROPPED (the documented asymmetry vs
    * T1, no-db reject at mysql_manager.rs:377-379). */
  def consumerDbFilter(
      dbCol: Column,
      includeDbs: Seq[String],
      excludeDbs: Seq[String]): Column = {
    val inc = includeDbs.map(_.toLowerCase)
    val exc = excludeDbs.map(_.toLowerCase)
    val base =
      if (inc.nonEmpty) lower(dbCol).isin(inc: _*)
      else if (exc.nonEmpty) !lower(dbCol).isin(exc: _*)
      else lit(true)
    dbCol.isNotNull && base
  }

  /** T3 — offset dedup (binlog_parser.rs:267-274): at-least-once replay
    * re-reads the boundary event; drop exact (file, offset) duplicates and
    * the event AT the resume offset itself. At scale this is one shuffle on
    * (file, offset) — the same key the downstream sequence stamp uses. */
  def offsetDedup(events: DataFrame, resumeFile: String, resumeOffset: Long): DataFrame =
    events
      .dropDuplicates("file", "offset")
      .where(!(col("file") === lit(resumeFile) && col("offset") === lit(resumeOffset)))

  /** T4 — BEGIN suppression (binlog_parser.rs:276-281): Query events whose
    * text is exactly "begin" (case-insensitive, trimmed) or absent produce
    * no output. Non-Query events are untouched. */
  def suppressBegin(opCol: Column, queryCol: Column): Column =
    !(opCol === graft.model.Cdc.OpQuery &&
      (queryCol.isNull || lower(trim(queryCol)) === "begin"))

  /** T5 — DATABASE-DDL suppression on the schema path
    * (query_parser.rs:63-66): any query containing "database" contributes
    * nothing to the registry. */
  def isRegistryDdl(queryCol: Column): Column =
    queryCol.isNotNull && !lower(queryCol).contains("database")
}
