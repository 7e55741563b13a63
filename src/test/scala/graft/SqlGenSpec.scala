package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cdc, Value}
import graft.model.Value._
import graft.operators.SqlGen
import graft.sources.CdcGen

/** SQL-generation goldens mirroring mysql_manager.rs:393-598 verbatim,
  * plus a differential check that the Catalyst-expression path
  * (SqlGen.statements) agrees with the row-level builders on the full
  * typed fixture. */
class SqlGenSpec extends AnyFunSuite {

  private val petCols =
    Seq("name", "owner", "species", "sex", "birth", "death")

  test("build_add_queries golden (mysql_manager.rs:398-454)") {
    val rows = Seq(
      Seq(VString("Pip"), VString("Jake"), VString("mouse"), VString("m"),
        VDate(2020, 3, 30), VNull),
      Seq(VString("Spot"), VString("Jane"), VString("dog"), VString("m"),
        VDate(2010, 11, 2), VNull))
    assert(SqlGen.buildAddQueries("pet", petCols, rows) === Seq(
      "INSERT INTO pet (name, owner, species, sex, birth, death) VALUES (\"Pip\", \"Jake\", \"mouse\", \"m\", \"2020-3-30\", Null)",
      "INSERT INTO pet (name, owner, species, sex, birth, death) VALUES (\"Spot\", \"Jane\", \"dog\", \"m\", \"2010-11-2\", Null)"))
  }

  test("build_update_queries golden: changed-cols SET, null-safe WHERE (mysql_manager.rs:456-540)") {
    val rows = Seq(
      (Seq(VString("Pip"), VString("Jake"), VString("mouse"), VString("m"),
        VDate(2020, 3, 30), VNull),
        Seq(VString("Mickey"), VString("Jack"), VString("mouse"), VString("m"),
          VDate(2020, 3, 30), VNull)),
      (Seq(VString("Spot"), VString("Jane"), VString("dog"), VString("m"),
        VDate(2010, 11, 2), VNull),
        Seq(VString("Spot"), VString("Jane"), VString("dog"), VString("m"),
          VDate(2010, 11, 2), VDate(2020, 6, 10))))
    assert(SqlGen.buildUpdateQueries("pet", petCols, rows) === Seq(
      "UPDATE pet SET name=\"Mickey\", owner=\"Jack\" WHERE name=\"Pip\" AND owner=\"Jake\" AND species=\"mouse\" AND sex=\"m\" AND birth=\"2020-3-30\" AND death is NULL",
      "UPDATE pet SET death=\"2020-6-10\" WHERE name=\"Spot\" AND owner=\"Jane\" AND species=\"dog\" AND sex=\"m\" AND birth=\"2010-11-2\" AND death is NULL"))
  }

  test("build_delete_queries golden (mysql_manager.rs:542-598)") {
    val rows = Seq(
      Seq(VString("Pip"), VString("Jake"), VString("mouse"), VString("m"),
        VDate(2020, 3, 30), VNull),
      Seq(VString("Spot"), VString("Jane"), VString("dog"), VString("m"),
        VDate(2010, 11, 2), VNull))
    assert(SqlGen.buildDeleteQueries("pet", petCols, rows) === Seq(
      "DELETE FROM pet WHERE name=\"Pip\" AND owner=\"Jake\" AND species=\"mouse\" AND sex=\"m\" AND birth=\"2020-3-30\" AND death is NULL",
      "DELETE FROM pet WHERE name=\"Spot\" AND owner=\"Jane\" AND species=\"dog\" AND sex=\"m\" AND birth=\"2010-11-2\" AND death is NULL"))
  }

  test("col-count guard mirrors check_valid_col_count (mysql_manager.rs:326-335)") {
    val err = intercept[IllegalArgumentException] {
      SqlGen.buildAddQueries("pet", Seq("a"), Seq(Seq(VString("x"), VNull)))
    }
    assert(err.getMessage.contains("expected at least 2 columns, found 1"))
  }

  test("engine path errors on image wider than columns, like check_valid_cols (mysql_manager.rs:302-335)") {
    val spark = SparkTest.spark
    import spark.implicits._
    val bad = Seq(graft.model.CdcEvent(
      1L, "flv://m/d/t", "f", 1L, Cdc.OpAdd, null, Seq("a"),
      Seq(graft.model.CdcRowImages(null,
        Seq(VString("x").toJson, VNull.toJson))))).toDS().toDF()
    val e = intercept[Exception] { SqlGen.statements(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("expected at least 2 columns, found 1")),
      s"unexpected error chain: ${msgs(e)}")
    // differential: the row-level twin rejects the same malformed event
    intercept[IllegalArgumentException] {
      SqlGen.buildAddQueries("t", Seq("a"), Seq(Seq(VString("x"), VNull)))
    }
  }

  test("empty image yields empty clauses, not a descending-sequence error") {
    val spark = SparkTest.spark
    import spark.implicits._
    val ev = Seq(graft.model.CdcEvent(
      1L, "flv://m/d/t", "f", 1L, Cdc.OpDelete, null, Seq("a"),
      Seq(graft.model.CdcRowImages(null, Nil)))).toDS().toDF()
    val got = SqlGen.statements(ev).collect().map(_.getString(2))
    assert(got === Array("DELETE FROM t WHERE "))
  }

  test("expression path ≡ row-level builders on the full typed fixture") {
    val spark = SparkTest.spark
    val events = CdcGen.typedEvents(spark)
    val got = SqlGen.statements(events)
      .orderBy("sequence", "stmt_idx")
      .collect().map(r => (r.getLong(0), r.getString(2)))

    // Rebuild the expectation via the row-level builders, decoding the
    // fixture's own cells — a true differential, no duplicated literals.
    val raw = events.orderBy("sequence").collect()
    val expected = raw.flatMap { r =>
      val seq = r.getLong(r.fieldIndex("sequence"))
      val op = r.getString(r.fieldIndex("op"))
      val tbl = r.getString(r.fieldIndex("uri")).split("/").lift(4).orNull
      val cols = Option(r.getSeq[String](r.fieldIndex("columns")))
        .map(_.toSeq).getOrElse(Nil)
      def rows = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("rows")).toSeq
      def imgs(field: String) = rows.map(rr =>
        rr.getSeq[String](rr.fieldIndex(field)).toSeq.map(Value.fromJson))
      op match {
        case Cdc.OpQuery => Seq(seq -> r.getString(r.fieldIndex("query")))
        case Cdc.OpAdd =>
          SqlGen.buildAddQueries(tbl, cols, imgs("cols")).map(seq -> _)
        case Cdc.OpUpdate =>
          SqlGen.buildUpdateQueries(tbl, cols,
            imgs("before_cols").zip(imgs("cols"))).map(seq -> _)
        case Cdc.OpDelete =>
          SqlGen.buildDeleteQueries(tbl, cols, imgs("cols")).map(seq -> _)
      }
    }
    assert(got.toSeq === expected.toSeq)
  }
}
