package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Value
import graft.model.Value._

/** Serde + Display goldens for the 14-variant Value type, mirroring the
  * reference's unit tests: values.rs:104-132 (tagged-JSON round-trips),
  * values.rs:135-207 (MySQL-literal Display), row_ops.rs:36-115 (row
  * payload serialization built from cells). */
class ValueSpec extends AnyFunSuite {

  test("String serde golden (values.rs:104-113)") {
    val v = VString("Puffball")
    assert(v.toJson === """{"String":"Puffball"}""")
    assert(Value.fromJson(v.toJson) === v)
  }

  test("Date serde golden (values.rs:116-132)") {
    val v = VDate(2000, 3, 30)
    assert(v.toJson === """{"Date":{"year":2000,"month":3,"day":30}}""")
    assert(Value.fromJson(v.toJson) === v)
  }

  test("every variant round-trips through the tagged encoding") {
    val all: Seq[Value] = Seq(
      VUnsignedInteger(10), VSignedInteger(-10), VFloat(1.5f), VDouble(7.25),
      VString("Jack"), VEnum(2), VBlob("hello".getBytes("UTF-8").map(_.toInt)),
      VYear(1999), VDate(2000, 3, 30), VTime(21, 31, 30, 1000),
      VDateTime(2000, 3, 30, 21, 31, 30, 1000), VJson("""{"a":1}"""),
      VDecimal("5.54321"), VTimestamp(1524885322, 0), VNull)
    all.foreach(v => assert(Value.fromJson(v.toJson) === v, v))
  }

  test("Display goldens (values.rs:135-207)") {
    assert(VUnsignedInteger(10).display === "10")
    assert(VSignedInteger(-10).display === "-10")
    assert(VBlob("hello".getBytes("UTF-8").map(_.toInt)).display === "hello")
    assert(VYear(1999).display === "\"1999\"")
    assert(VDate(2000, 3, 30).display === "\"2000-3-30\"")
    assert(VTime(21, 31, 30, 1000).display === "\"21:31:30.1000\"")
    assert(VDateTime(2000, 3, 30, 21, 31, 30, 1000).display
      === "\"2000-3-30 21:31:30.1000\"")
    assert(VJson("\"10\"").display === "\"10\"")
    assert(VDecimal("5.54321").display === "5.54321")
    // chrono %Y-%m-%d %H:%M:%S.%f over whole seconds → 9 zero nanos
    assert(VTimestamp(1524885322, 0).display
      === "\"2018-04-28 03:15:22.000000000\"")
    assert(VNull.display === "Null")
  }

  test("Float shortest-repr formats from the f32, not the widened double (values.rs:47-93)") {
    // Rust {} on f32 prints "0.1"; the double expansion would be
    // 0.10000000149011612 — the round-2 advice regression pin.
    assert(VFloat(0.1f).toJson === """{"Float":0.1}""")
    assert(VFloat(0.1f).display === "0.1")
    assert(VFloat(2.0f).display === "2")
    assert(Value.fromJson(VFloat(0.1f).toJson) === VFloat(0.1f))
  }

  test("Double exponent forms expand to Rust's plain decimal") {
    assert(VDouble(1e-7).display === "0.0000001")
    assert(VDouble(1e-7).toJson === """{"Double":0.0000001}""")
    assert(VDouble(1e20).display === "100000000000000000000")
    assert(VDouble(7.25).display === "7.25")
  }

  private def rowsJson(field: String, rows: Seq[Seq[Value]]): String =
    rows.map(r => s"""{"$field":[${r.map(_.toJson).mkString(",")}]}""")
      .mkString("""{"rows":[""", ",", "]}")

  test("WriteRows wire golden (row_ops.rs:35-55)") {
    val row = Seq(VString("John"), VString("tttt"), VString("m"),
      VDate(2000, 3, 30))
    assert(rowsJson("cols", Seq(row)) ===
      """{"rows":[{"cols":[{"String":"John"},{"String":"tttt"},{"String":"m"},{"Date":{"year":2000,"month":3,"day":30}}]}]}""")
  }

  test("DeleteRows wire golden with Null cell (row_ops.rs:91-114)") {
    val row = Seq(VString("Puffball"), VString("Diane"), VString("hamster"),
      VString("f"), VDate(1999, 3, 30), VNull)
    assert(rowsJson("cols", Seq(row)) ===
      """{"rows":[{"cols":[{"String":"Puffball"},{"String":"Diane"},{"String":"hamster"},{"String":"f"},{"Date":{"year":1999,"month":3,"day":30}},"Null"]}]}""")
  }

  test("UpdateRows wire golden (row_ops.rs:57-89)") {
    val before = Seq(VString("Jack"), VString("Peter"), VString("dog"),
      VString("m"), VDate(1999, 3, 30))
    val after = Seq(VString("Jack"), VString("Peter"), VString("dog"),
      VString("m"), VDate(1989, 8, 31))
    val json =
      s"""{"rows":[{"before_cols":[${before.map(_.toJson).mkString(",")}],""" +
        s""""after_cols":[${after.map(_.toJson).mkString(",")}]}]}"""
    assert(json ===
      """{"rows":[{"before_cols":[{"String":"Jack"},{"String":"Peter"},{"String":"dog"},{"String":"m"},{"Date":{"year":1999,"month":3,"day":30}}],"after_cols":[{"String":"Jack"},{"String":"Peter"},{"String":"dog"},{"String":"m"},{"Date":{"year":1989,"month":8,"day":31}}]}]}""")
  }
}
