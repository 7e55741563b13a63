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

  /** The reference's flagship e2e fixture as a TYPED changelog
    * (scripts/helpers/mysql-send-cmds.sh:12-20): the 9-statement pet-table
    * script — CREATE DATABASE, CREATE TABLE, 2×INSERT, UPDATE, mid-stream
    * ALTER ADD COLUMN (row width changes!), DELETE carrying the widened
    * 6-cell image, INSERT with NULL, UPDATE of the added column — plus a
    * second db/table (`zooDb.menagerie`) exercising the remaining Value
    * variants (SignedInteger, Decimal, DateTime, Blob, Timestamp, Double,
    * Enum, Year, Float, Time, Json, Null; values.rs:8-45).
    *
    * Cells are the externally-tagged serde JSON of [[graft.model.Value]]
    * (values.rs goldens), so joining a row's cells with "," reproduces the
    * reference's wire `cols` array byte-for-byte. A literal fixture, like
    * the reference's own; every downstream oracle is a literal VALUES
    * table. */
  def typedEvents(spark: SparkSession): DataFrame = {
    import graft.model.Value._
    import graft.model.{CdcEvent, CdcRowImages}
    import spark.implicits._

    val host = "flv://mysql-leader"
    val petCols5 = Seq("name", "owner", "species", "sex", "birth")
    val petCols6 = petCols5 :+ "last_vaccine"
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)

    def q(seq: Long, db: String, sql: String) = CdcEvent(
      seq, s"$host/$db", "binlog.000001", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, db: String, tbl: String, op: String,
        cols: Seq[String], before: Seq[String], after: Seq[String]) = CdcEvent(
      seq, s"$host/$db/$tbl", "binlog.000001", seq, op, null, cols,
      Seq(CdcRowImages(before, after)))

    val d1999 = VDate(1999, 3, 30)
    val pet = Seq(
      q(1, "flvDb", "CREATE DATABASE flvDb"),
      q(2, "flvDb", "CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), " +
        "species VARCHAR(20), sex CHAR(1), birth DATE)"),
      row(3, "flvDb", "pet", Cdc.OpAdd, petCols5, null,
        cells(VString("Puffball"), VString("Diane"), VString("hamster"),
          VString("f"), d1999)),
      row(4, "flvDb", "pet", Cdc.OpAdd, petCols5, null,
        cells(VString("Jack"), VString("Peter"), VString("dog"),
          VString("m"), d1999)),
      row(5, "flvDb", "pet", Cdc.OpUpdate, petCols5,
        cells(VString("Jack"), VString("Peter"), VString("dog"),
          VString("m"), d1999),
        cells(VString("Jack"), VString("Peter"), VString("dog"),
          VString("m"), VDate(1989, 8, 31))),
      q(6, "flvDb", "ALTER TABLE pet ADD COLUMN last_vaccine DATE"),
      // post-ALTER images carry the widened 6th NULL cell, exactly as
      // MySQL row events would (README.md:186-188)
      row(7, "flvDb", "pet", Cdc.OpDelete, petCols6, null,
        cells(VString("Puffball"), VString("Diane"), VString("hamster"),
          VString("f"), d1999, VNull)),
      row(8, "flvDb", "pet", Cdc.OpAdd, petCols6, null,
        cells(VString("Spot"), VString("Jane"), VString("dog"),
          VString("m"), VDate(2010, 11, 2), VNull)),
      row(9, "flvDb", "pet", Cdc.OpUpdate, petCols6,
        cells(VString("Spot"), VString("Jane"), VString("dog"),
          VString("m"), VDate(2010, 11, 2), VNull),
        cells(VString("Spot"), VString("Jane"), VString("dog"),
          VString("m"), VDate(2010, 11, 2), VDate(2020, 6, 10))))

    val zooCols = Seq("id", "nick", "weight", "seen", "tag", "born",
      "score", "kind", "yr", "ratio", "feeding", "meta")
    def tweety = cells(VSignedInteger(1), VString("Tweety"),
      VDecimal("12.500000"), VDateTime(2021, 7, 4, 12, 30, 5, 250000),
      VBlob("chirp".getBytes("UTF-8").map(_.toInt)), VTimestamp(1524885322, 0),
      VDouble(7.25), VEnum(2), VYear(1999), VFloat(1.5f),
      VTime(21, 31, 30, 1000), VJson("""{"a":1}"""))
    def goldie(nick: String, weight: graft.model.Value) =
      cells(VSignedInteger(2), VString(nick), weight,
        VDateTime(2022, 1, 15, 8, 0, 0, 0),
        VBlob("glub".getBytes("UTF-8").map(_.toInt)), VTimestamp(1600000000, 0),
        VDouble(3.5), VEnum(5), VYear(2020), VFloat(2.5f),
        VTime(8, 0, 5, 0), VJson("""{"b":[1,2]}"""))
    val allNull3 = cells(Seq(VSignedInteger(3)) ++ Seq.fill(11)(VNull): _*)

    val zoo = Seq(
      q(10, "zooDb", "CREATE DATABASE zooDb"),
      q(11, "zooDb", "CREATE TABLE menagerie (id BIGINT, nick VARCHAR(20), " +
        "weight DECIMAL(18,6), seen DATETIME, tag BLOB, born TIMESTAMP, " +
        "score DOUBLE, kind ENUM('a','b'), yr YEAR, ratio FLOAT, " +
        "feeding TIME, meta JSON)"),
      row(12, "zooDb", "menagerie", Cdc.OpAdd, zooCols, null, tweety),
      row(13, "zooDb", "menagerie", Cdc.OpAdd, zooCols, null,
        goldie("Goldie", VDecimal("0.250000"))),
      // changed-cols update with a typed→Null transition (null-safe WHERE)
      row(14, "zooDb", "menagerie", Cdc.OpUpdate, zooCols,
        goldie("Goldie", VDecimal("0.250000")),
        goldie("Goldie II", VNull)),
      row(15, "zooDb", "menagerie", Cdc.OpAdd, zooCols, null, allNull3),
      row(16, "zooDb", "menagerie", Cdc.OpDelete, zooCols, null, tweety))

    (pet ++ zoo).toDS().toDF()
  }

  /** Fixture log for the verbatim-Query replay semantic
    * (mysql_manager.rs:77-95: EVERY Query statement runs on the follower,
    * registry op or not): a mid-stream TRUNCATE wipes the table's live
    * rows while its column list stays in force, then a post-TRUNCATE
    * ALTER widens survivors — so the fold must clear state WITHOUT
    * resetting schema. A second table in the same db proves the TRUNCATE
    * routes only to the table it names. */
  def truncateEvents(spark: SparkSession): DataFrame = {
    import graft.model.Value._
    import graft.model.{CdcEvent, CdcRowImages}
    import spark.implicits._

    val host = "flv://mysql-leader"
    val crate2 = Seq("id", "label")
    val crate3 = crate2 :+ "qty"
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def q(seq: Long, sql: String) = CdcEvent(
      seq, s"$host/wh", "binlog.000001", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, tbl: String, op: String, cols: Seq[String],
        before: Seq[String], after: Seq[String]) = CdcEvent(
      seq, s"$host/wh/$tbl", "binlog.000001", seq, op, null, cols,
      Seq(CdcRowImages(before, after)))

    Seq(
      q(1, "CREATE DATABASE wh"),
      q(2, "CREATE TABLE crate (id INT, label VARCHAR(20))"),
      row(3, "crate", Cdc.OpAdd, crate2, null,
        cells(VSignedInteger(1), VString("alpha"))),
      row(4, "crate", Cdc.OpAdd, crate2, null,
        cells(VSignedInteger(2), VString("beta"))),
      row(5, "crate", Cdc.OpUpdate, crate2,
        cells(VSignedInteger(2), VString("beta")),
        cells(VSignedInteger(2), VString("beta2"))),
      q(6, "CREATE TABLE box (id INT, note VARCHAR(20))"),
      row(7, "box", Cdc.OpAdd, Seq("id", "note"), null,
        cells(VSignedInteger(9), VString("keep"))),
      // db-qualified, server-comment-suffixed — the verbatim form MySQL
      // ships (query_parser strips comments; TableRef takes the last
      // path segment)
      q(8, "TRUNCATE TABLE `wh`.`crate` /* generated by server */"),
      row(9, "crate", Cdc.OpAdd, crate2, null,
        cells(VSignedInteger(3), VString("gamma"))),
      q(10, "ALTER TABLE crate ADD COLUMN qty INT"),
      row(11, "crate", Cdc.OpAdd, crate3, null,
        cells(VSignedInteger(4), VString("delta"), VSignedInteger(7))),
      // post-ALTER 3-cell delete must match the widened pre-ALTER insert
      row(12, "crate", Cdc.OpDelete, crate3, null,
        cells(VSignedInteger(3), VString("gamma"), VNull))
    ).toDS().toDF()
  }

  /** Fixture log for the RENAME TABLE passthrough semantic
    * (mysql_manager.rs:89-95: the follower executes every Query verbatim,
    * so a rename MOVES the table's entire state to the new name while the
    * producer registry keeps the old one): rows inserted under `stock`
    * must survive a mid-stream RENAME to `stock_v2`, be updatable and
    * deletable there, and a post-rename ALTER must widen the moved rows.
    * The old name is then re-CREATEd — a fresh table whose rows must NOT
    * mix with the renamed instance's. A sibling table proves scoping. */
  def renameEvents(spark: SparkSession): DataFrame = {
    import graft.model.Value._
    import graft.model.{CdcEvent, CdcRowImages}
    import spark.implicits._

    val host = "flv://mysql-leader"
    val c2 = Seq("id", "label")
    val c3 = c2 :+ "qty"
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def q(seq: Long, sql: String) = CdcEvent(
      seq, s"$host/inv", "binlog.000001", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, tbl: String, op: String, cols: Seq[String],
        before: Seq[String], after: Seq[String]) = CdcEvent(
      seq, s"$host/inv/$tbl", "binlog.000001", seq, op, null, cols,
      Seq(CdcRowImages(before, after)))

    Seq(
      q(1, "CREATE DATABASE inv"),
      q(2, "CREATE TABLE stock (id INT, label VARCHAR(20))"),
      row(3, "stock", Cdc.OpAdd, c2, null,
        cells(VSignedInteger(1), VString("bolt"))),
      row(4, "stock", Cdc.OpAdd, c2, null,
        cells(VSignedInteger(2), VString("nut"))),
      q(5, "CREATE TABLE audit (id INT, note VARCHAR(20))"),
      row(6, "audit", Cdc.OpAdd, Seq("id", "note"), null,
        cells(VSignedInteger(9), VString("keep"))),
      // db-qualified, comment-suffixed — the verbatim wire form
      q(7, "RENAME TABLE `inv`.`stock` TO `inv`.`stock_v2` /* by server */"),
      row(8, "stock_v2", Cdc.OpAdd, c2, null,
        cells(VSignedInteger(3), VString("washer"))),
      // a PRE-rename row updated POST-rename: state moved with the name
      row(9, "stock_v2", Cdc.OpUpdate, c2,
        cells(VSignedInteger(1), VString("bolt")),
        cells(VSignedInteger(1), VString("bolt-x"))),
      // post-rename DDL lands on the moved instance (timeline continuity)
      q(10, "ALTER TABLE stock_v2 ADD COLUMN qty INT"),
      row(11, "stock_v2", Cdc.OpAdd, c3, null,
        cells(VSignedInteger(4), VString("pin"), VSignedInteger(5))),
      // widened PRE-rename row deleted post-rename+ALTER
      row(12, "stock_v2", Cdc.OpDelete, c3, null,
        cells(VSignedInteger(2), VString("nut"), VNull)),
      // the old name re-created: a FRESH table, disjoint from stock_v2
      q(13, "CREATE TABLE stock (id INT, label VARCHAR(20))"),
      row(14, "stock", Cdc.OpAdd, c2, null,
        cells(VSignedInteger(7), VString("fresh")))
    ).toDS().toDF()
  }

  /** Fixture log for the DROP DATABASE passthrough semantic
    * (mysql_manager.rs:89-95): the follower wipes EVERY table of the
    * dropped db — both its tables go, a sibling db's table stays, and a
    * post-drop re-CREATE of one name starts from empty state. */
  def dropDbEvents(spark: SparkSession): DataFrame = {
    import graft.model.Value._
    import graft.model.{CdcEvent, CdcRowImages}
    import spark.implicits._

    val host = "flv://mysql-leader"
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def q(seq: Long, db: String, sql: String) = CdcEvent(
      seq, s"$host/$db", "binlog.000001", seq, Cdc.OpQuery, sql, null, null)
    def row(seq: Long, db: String, tbl: String, op: String, cols: Seq[String],
        before: Seq[String], after: Seq[String]) = CdcEvent(
      seq, s"$host/$db/$tbl", "binlog.000001", seq, op, null, cols,
      Seq(CdcRowImages(before, after)))

    Seq(
      q(1, "app", "CREATE DATABASE app"),
      q(2, "app", "CREATE TABLE users (id INT, name VARCHAR(20))"),
      row(3, "app", "users", Cdc.OpAdd, Seq("id", "name"), null,
        cells(VSignedInteger(1), VString("ann"))),
      row(4, "app", "users", Cdc.OpAdd, Seq("id", "name"), null,
        cells(VSignedInteger(2), VString("bob"))),
      q(5, "app", "CREATE TABLE carts (id INT, item VARCHAR(20))"),
      row(6, "app", "carts", Cdc.OpAdd, Seq("id", "item"), null,
        cells(VSignedInteger(10), VString("x"))),
      q(7, "keepdb", "CREATE DATABASE keepdb"),
      q(8, "keepdb", "CREATE TABLE logs (id INT, msg VARCHAR(20))"),
      row(9, "keepdb", "logs", Cdc.OpAdd, Seq("id", "msg"), null,
        cells(VSignedInteger(5), VString("hello"))),
      // the verbatim wipe: both app tables go; keepdb.logs stays
      q(10, "app", "DROP DATABASE app /* generated by server */"),
      // re-create one name post-drop: fresh instance, empty state
      q(11, "app", "CREATE TABLE users (id INT, name VARCHAR(20))"),
      row(12, "app", "users", Cdc.OpAdd, Seq("id", "name"), null,
        cells(VSignedInteger(3), VString("carol")))
    ).toDS().toDF()
  }

  /** Typed decode of the [[renameEvents]] / [[dropDbEvents]] replicas:
    * (db, tbl, id, txt) with `txt` the table's string column. */
  def decodeDbTables(state: DataFrame): DataFrame = {
    import graft.operators.ValueCodec._
    def cell(n: String) = cellByName(col("image"), col("columns"), n)
    state.select(
      col("db"), col("tbl"),
      decodeLong(cell("id")).as("id"),
      coalesce(decodeString(cell("label")), decodeString(cell("note")),
        decodeString(cell("name")), decodeString(cell("item")),
        decodeString(cell("msg"))).as("txt"),
      decodeLong(cell("qty")).as("qty"))
  }

  /** Typed decode of the [[truncateEvents]] replica: (tbl, id, txt, qty)
    * with `txt` the table's string column (crate.label / box.note). */
  def decodeTruncate(state: DataFrame): DataFrame = {
    import graft.operators.ValueCodec._
    def cell(n: String) = cellByName(col("image"), col("columns"), n)
    state.select(
      col("tbl"),
      decodeLong(cell("id")).as("id"),
      coalesce(decodeString(cell("label")), decodeString(cell("note"))).as("txt"),
      decodeLong(cell("qty")).as("qty"))
  }

  /** Registry-driven typed decode of the final pet table: cells located by
    * NAME against the registry column list (ValueCodec.cellByName — the D7
    * decode path), then decoded per the self-described value tag. */
  def decodePet(state: DataFrame): DataFrame = {
    import graft.operators.ValueCodec._
    def cell(n: String) = cellByName(col("image"), col("columns"), n)
    state.select(
      decodeString(cell("name")).as("name"),
      decodeString(cell("owner")).as("owner"),
      decodeString(cell("species")).as("species"),
      decodeString(cell("sex")).as("sex"),
      decodeDate(cell("birth")).as("birth"),
      decodeDate(cell("last_vaccine")).as("last_vaccine"))
  }

  /** Full typed decode of the final menagerie table — every remaining
    * Value variant family (values.rs:8-45) back to native Spark types. */
  def decodeMenagerie(state: DataFrame): DataFrame = {
    import graft.operators.ValueCodec._
    def cell(n: String) = cellByName(col("image"), col("columns"), n)
    state.select(
      decodeLong(cell("id")).as("id"),
      decodeString(cell("nick")).as("nick"),
      decodeDecimal(cell("weight")).as("weight"),
      decodeDateTime(cell("seen")).as("seen"),
      decodeBlobUtf8(cell("tag")).as("tag_utf8"),
      decodeTimestamp(cell("born")).as("born"),
      decodeDouble(cell("score")).as("score"),
      decodeEnum(cell("kind")).as("kind"),
      decodeYear(cell("yr")).as("yr"),
      decodeFloat(cell("ratio")).as("ratio"),
      decodeTimeString(cell("feeding")).as("feeding"),
      decodeJson(cell("meta")).as("meta"))
  }

  /** Decode a customer row image back to typed columns through the
    * registry path: the column list comes from PARSING the changelog's own
    * CREATE TABLE (D6), and each cell is located by NAME against it
    * (ValueCodec.cellByName — the D7 decode, same as decodePet), so the
    * registry-driven resolution is exercised at sf-scale, not just on the
    * 16-row typed fixture (round-2 verdict #7). The registry list is a
    * plan-time constant here because the demo log has a single static
    * schema; a mid-stream-ALTER log resolves per-event via the as-of
    * timeline instead (cdc_registry_asof). */
  def decodeCustomer(images: DataFrame, imageCol: String = "image"): DataFrame = {
    val regCols = graft.operators.SchemaRegistry.parseDdl(CreateTableSql)
      .collect { case graft.operators.SchemaRegistry.CreateTable(_, cs) => cs }
      .head
    val colsArr = array(regCols.map(lit): _*)
    def cell(n: String) =
      graft.operators.ValueCodec.cellByName(col(imageCol), colsArr, n)
    images.select(
      cell("c_custkey").cast("long").as("c_custkey"),
      cell("c_name").as("c_name"),
      cell("c_nationkey").cast("int").as("c_nationkey"),
      cell("c_acctbal").cast("double").as("c_acctbal"),
      cell("c_mktsegment").as("c_mktsegment"))
  }
}
