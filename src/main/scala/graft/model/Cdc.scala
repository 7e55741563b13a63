package graft.model

import org.apache.spark.sql.types._

/** Core CDC data model.
  *
  * Mirrors the reference wire record semantics (not its encoding):
  *  - `FluvioMessage` (cdc-mysql/src/messages/flv_message.rs:5-15): uri,
  *    sequence, provenance, columns, operation.
  *  - `Operation` (cdc-mysql/src/messages/operations.rs:5-11): a 4-variant
  *    sum type Query|Add|Update|Delete, flattened here into an `op`
  *    discriminator column + nullable `query` / `rows` payloads (idiomatic
  *    for a columnar engine; Catalyst prunes the unused branch).
  *  - Row payloads (cdc-mysql/src/messages/row_ops.rs:5-29): updates carry
  *    full before- AND after-images — the load-bearing semantic for replay.
  *
  * Cell encoding — two interchangeable conventions over the same
  * `ArrayType(StringType)` payload (schema-stable while the payload schema
  * evolves mid-stream; ALTER ADD COLUMN ⇒ longer arrays):
  *  - PLAIN: Spark round-trippable casts (Java `toString` forms), typed
  *    NULL = null array element; decode is `cast` back. Used by the bulk
  *    generated logs (CdcGen.customerEvents).
  *  - TYPED: the reference's externally-tagged serde JSON per cell
  *    (values.rs:8-45; [[Value]]), typed NULL = the `"Null"` token; decode
  *    via [[graft.operators.ValueCodec]] expressions. Full wire fidelity —
  *    a row's cells joined with "," reproduce the reference's `cols`
  *    array byte-for-byte (CdcGen.typedEvents).
  */
object Cdc {
  /** op discriminator values (operations.rs:5-11). */
  val OpQuery = "Query"
  val OpAdd = "Add"
  val OpUpdate = "Update"
  val OpDelete = "Delete"

  val CellType: ArrayType = ArrayType(StringType, containsNull = true)

  /** rows: ARRAY<STRUCT<before_cols, cols>> (row_ops.rs:20-29).
    * Add/Delete populate `cols` only; Update populates both. */
  val RowsType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("before_cols", CellType, nullable = true),
      StructField("cols", CellType, nullable = true)
    )),
    containsNull = false)

  /** The changelog schema — one fixed StructType for every event
    * (FIXTURES.md §1). `sequence` is the total-order key stamped at publish
    * (flv_message.rs:9); `file`/`offset` are binlog provenance
    * (bn_file.rs:3-8). */
  val EventSchema: StructType = StructType(Seq(
    StructField("sequence", LongType, nullable = false),
    StructField("uri", StringType, nullable = true),
    StructField("file", StringType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("op", StringType, nullable = false),
    StructField("query", StringType, nullable = true),
    StructField("columns", ArrayType(StringType), nullable = true),
    StructField("rows", RowsType, nullable = true)
  ))
}

/** Typed view of one changelog row payload (row_ops.rs:20-29). */
case class CdcRowImages(before_cols: Seq[String], cols: Seq[String])

/** Typed view of one changelog event — used on the Dataset/state paths
  * (flatMapGroupsWithState, Aggregator) where case-class Encoders help. */
case class CdcEvent(
    sequence: Long,
    uri: String,
    file: String,
    offset: Long,
    op: String,
    query: String,
    columns: Seq[String],
    rows: Seq[CdcRowImages])
