package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Cdc

/** Deterministic CDC event-log generator.
  *
  * The reference's input is a MySQL binlog; ours is the driver-provided
  * parquet tables (TESTDATA.md), from which we derive a changelog that
  * exercises every operation the reference's e2e script does
  * (cdc-mysql/scripts/helpers/mysql-send-cmds.sh:12-20: create, inserts,
  * updates, mid-stream ALTER, deletes, NULLs).
  *
  * Derivation rules over `customer` (all key-arithmetic, so a SQL oracle can
  * reproduce the expected post-apply state without replaying the log):
  *   - seq 0:            Query CREATE TABLE customer(...)
  *   - seq = custkey+1:  Add, one per customer row (full row image)
  *   - seq = 2^30+key:   Update where custkey % 5 == 0 —
  *                       before = original image, after = acctbal+100
  *   - seq = 2^31+key:   Delete where custkey % 7 == 0 — image must match
  *                       the *current* state (post-update for % 35 rows),
  *                       mirroring MySQL's full-before-image WHERE
  *                       (mysql_manager.rs:270-292)
  *   - NULL exercise:    the Update also nulls c_mktsegment where
  *                       custkey % 25 == 0 (null cell in the after-image)
  *
  * Everything is expression-only (no collect, no driver loop): at 100 TB
  * this generator is a linear scan per op kind, unioned — each branch's
  * filter is pushed to the parquet scan.
  */
object CdcGen {

  val Db = "graft"
  val Table = "customer"
  val Uri = s"flv://mysql-leader/$Db/$Table"
  val CustomerCols: Seq[String] =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")

  val CreateTableSql: String =
    "CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR(25), " +
      "c_nationkey INT, c_acctbal DOUBLE, c_mktsegment VARCHAR(10))"

  /** Round-trippable cell encoding (see Cdc scaladoc). */
  private def enc(c: Column): Column = c.cast("string")

  private val SeqUpdateBase = 1L << 30
  private val SeqDeleteBase = 1L << 31

  /** The full generated changelog for `customer`, schema = Cdc.EventSchema. */
  def customerEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val cust = spark.read.parquet(s"$sfDir/customer.parquet")

    val colNames = array(CustomerCols.map(lit): _*)
    val nullCells = lit(null).cast(Cdc.CellType)

    def image(bal: Column, seg: Column): Column = array(
      enc($"c_custkey"), enc($"c_name"), enc($"c_nationkey"),
      enc(bal), enc(seg))

    val origImage = image($"c_acctbal", $"c_mktsegment")
    val updBal = $"c_acctbal" + lit(100.0)
    val updSeg =
      when($"c_custkey" % 25 === 0, lit(null).cast("string"))
        .otherwise($"c_mktsegment")
    val updImage = image(updBal, updSeg)
    // Image current at delete time: post-update for custkey % 5 == 0 rows.
    val delImage = when($"c_custkey" % 5 === 0, updImage).otherwise(origImage)

    def event(src: DataFrame, seqCol: Column, op: String, rows: Column): DataFrame =
      src.select(
        seqCol.cast("long").as("sequence"),
        lit(Uri).as("uri"),
        lit("binlog.000001").as("file"),
        seqCol.cast("long").as("offset"),
        lit(op).as("op"),
        lit(null).cast("string").as("query"),
        colNames.as("columns"),
        rows.as("rows"))

    val ddl = cust.limit(1).select(
      lit(0L).as("sequence"),
      lit(s"flv://mysql-leader/$Db").as("uri"),
      lit("binlog.000001").as("file"),
      lit(0L).as("offset"),
      lit(Cdc.OpQuery).as("op"),
      lit(CreateTableSql).as("query"),
      lit(null).cast("array<string>").as("columns"),
      lit(null).cast(Cdc.RowsType.catalogString).as("rows"))

    val inserts = event(cust, $"c_custkey" + 1, Cdc.OpAdd, // +1: seq 0 is the DDL event
      array(struct(nullCells.as("before_cols"), origImage.as("cols"))))

    val updates = event(cust.where($"c_custkey" % 5 === 0),
      lit(SeqUpdateBase) + $"c_custkey", Cdc.OpUpdate,
      array(struct(origImage.as("before_cols"), updImage.as("cols"))))

    val deletes = event(cust.where($"c_custkey" % 7 === 0),
      lit(SeqDeleteBase) + $"c_custkey", Cdc.OpDelete,
      array(struct(nullCells.as("before_cols"), delImage.as("cols"))))

    ddl.unionByName(inserts).unionByName(updates).unionByName(deletes)
  }

  /** Decode a customer row image back to typed columns (registry-driven in
    * the general engine; static here because the demo table is typed). */
  def decodeCustomer(images: DataFrame, imageCol: String = "image"): DataFrame = {
    val img = col(imageCol)
    images.select(
      element_at(img, 1).cast("long").as("c_custkey"),
      element_at(img, 2).as("c_name"),
      element_at(img, 3).cast("int").as("c_nationkey"),
      element_at(img, 4).cast("double").as("c_acctbal"),
      element_at(img, 5).as("c_mktsegment"))
  }
}
