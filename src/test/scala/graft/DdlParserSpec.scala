package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SchemaRegistry
import graft.operators.SchemaRegistry._

/** Pure parser tests mirroring the reference's DDL goldens
  * (query_parser.rs:122-249): CREATE/ALTER ADD|RENAME|DROP/DROP TABLE,
  * BEGIN and database-DDL no-ops, plus the edges the regexes must hold:
  * parenthesized type args, quoted identifiers, constraints, multi-drop. */
class DdlParserSpec extends AnyFunSuite {

  test("CREATE TABLE: column list, DECIMAL(10,2) comma inside parens") {
    assert(parseDdl("CREATE TABLE t (a INT, b DECIMAL(10,2), c VARCHAR(20))")
      === Seq(CreateTable("t", Seq("a", "b", "c"))))
  }

  test("CREATE TABLE: backticked identifiers and IF NOT EXISTS") {
    assert(parseDdl("create table if not exists `pet` (`name` varchar(20), owner varchar(20))")
      === Seq(CreateTable("pet", Seq("name", "owner"))))
  }

  test("CREATE TABLE: constraint clauses are not columns") {
    assert(parseDdl(
      "CREATE TABLE t (id INT, v INT, PRIMARY KEY (id), UNIQUE (v), CONSTRAINT c CHECK (v > 0))")
      === Seq(CreateTable("t", Seq("id", "v"))))
  }

  test("ALTER variants (query_parser.rs:80-101 semantics)") {
    assert(parseDdl("ALTER TABLE pet ADD COLUMN last_vaccine DATE")
      === Seq(AddColumn("pet", "last_vaccine")))
    assert(parseDdl("alter table pet add owner2 varchar(20)")
      === Seq(AddColumn("pet", "owner2")))
    assert(parseDdl("ALTER TABLE pet RENAME COLUMN owner TO keeper")
      === Seq(RenameColumn("pet", "owner", "keeper")))
    assert(parseDdl("ALTER TABLE pet DROP COLUMN owner")
      === Seq(DropColumn("pet", "owner")))
  }

  test("DROP TABLE: single, multiple, IF EXISTS (local_store.rs:125-135)") {
    assert(parseDdl("DROP TABLE t1") === Seq(DropTable("t1")))
    assert(parseDdl("drop table if exists t1, t2")
      === Seq(DropTable("t1"), DropTable("t2")))
  }

  test("no-ops: BEGIN, database DDL, unknown statements, null") {
    assert(parseDdl("BEGIN") === Nil)
    assert(parseDdl("CREATE DATABASE flvDb") === Nil) // query_parser.rs:63-66
    assert(parseDdl("DROP DATABASE flvDb") === Nil)
    assert(parseDdl("INSERT INTO t VALUES (1)") === Nil)
    assert(parseDdl(null) === Nil)
  }

  test("fold: duplicate create keeps first; ops on missing tables are no-ops") {
    val ops = Seq(
      CreateTable("t", Seq("a", "b")),
      CreateTable("t", Seq("x")), // duplicate → keep-first
      AddColumn("missing", "c"), // unknown table → no-op
      RenameColumn("t", "a", "a2"),
      DropColumn("t", "b"),
      AddColumn("t", "c"))
    assert(SchemaRegistry.foldOps(ops) === Map("t" -> Seq("a2", "c")))
  }
}
