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

  /** A multi-db changelog derived from the `events` table, exercising the
    * filter/routing/projection surface (T1-T9):
    *   - db = "app_" || (user_id % 4); NULL db for event_type='error'
    *     (mirrors binlog Query events that carry no schema)
    *   - table = event_type
    *   - op: error rows become Query events — text "BEGIN" when
    *     event_id % 10 == 0 (T4 fodder), "CREATE DATABASE x" when
    *     event_id % 10 == 5 (T5 fodder), else a passthrough statement;
    *     other rows are Add with a 3-cell image [event_id, user_id, value]
    *   - file = "binlog.00000" || (1 + event_id % 3), offset = event_id
    * All arithmetic-only, so every downstream query has a SQL oracle. */
  def multiDbEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
    val isErr = $"event_type" === "error"
    val db = when(isErr, lit(null).cast("string"))
      .otherwise(concat(lit("app_"), ($"user_id" % 4).cast("string")))
    val table = when(isErr, lit(null).cast("string")).otherwise($"event_type")
    val query = when(!isErr, lit(null).cast("string"))
      .when($"event_id" % 10 === 0, lit("BEGIN"))
      .when($"event_id" % 10 === 5, lit("CREATE DATABASE app_x"))
      .otherwise(concat(lit("UPDATE noop SET v = "), $"event_id"))
    val image = array(
      $"event_id".cast("string"), $"user_id".cast("string"),
      $"value".cast("string"))
    ev.select(
      $"event_id".cast("long").as("sequence"),
      db.as("db"),
      table.as("table"),
      concat(lit("binlog.00000"), (lit(1) + $"event_id" % 3).cast("string")).as("file"),
      $"event_id".cast("long").as("offset"),
      when(isErr, Cdc.OpQuery).otherwise(Cdc.OpAdd).as("op"),
      query.as("query"),
      when(isErr, lit(null).cast("array<string>"))
        .otherwise(array(lit("id"), lit("user_id"), lit("value"))).as("columns"),
      when(isErr, lit(null).cast(Cdc.RowsType.catalogString))
        .otherwise(array(struct(
          lit(null).cast(Cdc.CellType).as("before_cols"),
          image.as("cols")))).as("rows")
    )
  }

  /** A DDL changelog derived from `nation` — drives the schema registry
    * (D6/D7). Per nation row n (db = "app_" || n_regionkey), DDL at EVEN
    * sequence offsets so row events can be interleaved at odd offsets for
    * the versioned as-of resolution (SURVEY.md §7 hard-part #3):
    *   seq n*10+0: CREATE TABLE t_<lower(n_name)> with 2+(n%3) columns c0..
    *   seq n*10+2: ALTER ADD extra_col      when n % 2 == 0
    *   seq n*10+4: ALTER RENAME c0 TO k0    when n % 5 == 0
    *   seq n*10+6: ALTER DROP c1            when n % 4 == 0
    *   seq n*10+8: DROP TABLE               when n % 11 == 10
    * (n = n_nationkey.) */
  def ddlEvents(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val nat = spark.read.parquet(s"$sfDir/nation.parquet")
      .select(
        $"n_nationkey".cast("long").as("n"),
        concat(lit("app_"), $"n_regionkey".cast("string")).as("db"),
        concat(lit("t_"), lower($"n_name")).as("t"))
    val width = lit(2) + ($"n" % 3) // 2..4 columns
    val colsBody = concat_ws(", ",
      lit("c0 INT"), lit("c1 VARCHAR(10)"),
      when(width >= 3, lit("c2 DOUBLE")),
      when(width === 4, lit("c3 DATE")))
    def stmt(offset: Int, cond: Column, text: Column): DataFrame =
      nat.where(cond).select(
        ($"n" * 10 + offset).as("sequence"), $"db", text.as("query"))
    val create = stmt(0, lit(true),
      concat(lit("CREATE TABLE "), $"t", lit(" ("), colsBody, lit(")")))
    val add = stmt(2, $"n" % 2 === 0,
      concat(lit("ALTER TABLE "), $"t", lit(" ADD COLUMN extra_col INT")))
    val rename = stmt(4, $"n" % 5 === 0,
      concat(lit("ALTER TABLE "), $"t", lit(" RENAME COLUMN c0 TO k0")))
    val drop = stmt(6, $"n" % 4 === 0,
      concat(lit("ALTER TABLE "), $"t", lit(" DROP COLUMN c1")))
    val dropTable = stmt(8, $"n" % 11 === 10,
      concat(lit("DROP TABLE "), $"t"))
    create.unionByName(add).unionByName(rename).unionByName(drop)
      .unionByName(dropTable)
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
