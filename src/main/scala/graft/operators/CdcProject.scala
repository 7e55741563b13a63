package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Cdc

/** T6/T7/T9 — routing and projection operators. */
object CdcProject {

  /** URI construction (bn_message.rs:40-59):
    * flv://<resource>/<db>[/<table>]; db-less events address the host only. */
  def makeUri(resource: String, dbCol: Column, tableCol: Column): Column =
    concat_ws("/",
      lit(s"flv://$resource"),
      dbCol,
      when(dbCol.isNotNull, tableCol)) // no table segment without a db

  /** T9 — URI parse (mysql_manager.rs:341-363): split flv://host/db/table
    * back into optional (db, table). */
  def parseUri(uriCol: Column): (Column, Column) = {
    val parts = split(uriCol, "/")
    // flv: | <empty> | host | db | table  →  indices 1-based after split:
    // parts(0)="flv:", parts(1)="", parts(2)=host, parts(3)=db, parts(4)=table
    val db = when(size(parts) >= 4, element_at(parts, 4))
    val table = when(size(parts) >= 5, element_at(parts, 5))
    (db, table)
  }

  /** T6 — event-type dispatch (binlog_parser.rs:70-92). The binlog's
    * numeric type codes arrive as a `type_code` column; everything outside
    * the four known codes is routed to an "error" bucket rather than
    * silently dropped (the reference returns Err). */
  def routeOp(typeCode: Column): Column =
    when(typeCode === 2, Cdc.OpQuery)
      .when(typeCode === 30, Cdc.OpAdd)
      .when(typeCode === 31, Cdc.OpUpdate)
      .when(typeCode === 32, Cdc.OpDelete)
      .otherwise("Unsupported")

  /** T7 — enrichment/projection to the outgoing message shape
    * (binlog_parser.rs:130-224): URI from (resource, db, table), provenance
    * struct, column names carried alongside positional rows. Input must
    * have db/table/file/offset columns; row payloads pass through. */
  def enrich(events: DataFrame, resource: String): DataFrame =
    events
      .withColumn("uri", makeUri(resource, col("db"), col("table")))
      .withColumn("bn_file",
        struct(col("file").as("fileName"), col("offset").as("offset")))
}
