package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.Value

/** Column-level codec for typed changelog cells.
  *
  * A typed changelog stores each cell as the reference's externally-tagged
  * serde JSON text (values.rs:8-45; see [[graft.model.Value]]):
  * `{"String":"Jack"}`, `{"Date":{"year":1999,"month":3,"day":30}}`,
  * `"Null"`. Everything here is built from `get_json_object`/`when`/
  * `concat` — codegen'd expressions, no UDFs — so decode and SQL-literal
  * rendering run inside WholeStageCodegen at any scale.
  */
object ValueCodec {

  private val NullLit = lit(Value.NullCell)

  private def tagged(c: Column, path: String): Column =
    get_json_object(c, "$." + path)

  /** Positional cell lookup by registry column NAME — the registry-driven
    * decode path (D7): `columns` is the ordered name list in force for the
    * row, `image` the positional cells. Null when the name is absent
    * (e.g. rows materialized before an ALTER ADD). */
  def cellByName(image: Column, columns: Column, name: String): Column = {
    val pos = array_position(columns, name)
    when(pos > 0, element_at(image, pos.cast("int")))
  }

  // ---------- typed decode (one per Value variant family) ----------

  def decodeString(c: Column): Column = tagged(c, "String")

  def decodeLong(c: Column): Column =
    coalesce(tagged(c, "SignedInteger"), tagged(c, "UnsignedInteger"))
      .cast("long")

  def decodeEnum(c: Column): Column = tagged(c, "Enum").cast("short")

  def decodeYear(c: Column): Column = tagged(c, "Year").cast("int")

  def decodeDouble(c: Column): Column =
    coalesce(tagged(c, "Double"), tagged(c, "Float")).cast("double")

  def decodeFloat(c: Column): Column = tagged(c, "Float").cast("float")

  def decodeDecimal(c: Column, precision: Int = 18, scale: Int = 6): Column =
    tagged(c, "Decimal").cast(s"decimal($precision,$scale)")

  def decodeDate(c: Column): Column =
    make_date(tagged(c, "Date.year").cast("int"),
      tagged(c, "Date.month").cast("int"),
      tagged(c, "Date.day").cast("int"))

  /** DateTime → TimestampNTZ; `subsecond` is microseconds. */
  def decodeDateTime(c: Column): Column =
    when(tagged(c, "DateTime.year").isNotNull,
      call_function("make_timestamp_ntz",
        tagged(c, "DateTime.year").cast("int"),
        tagged(c, "DateTime.month").cast("int"),
        tagged(c, "DateTime.day").cast("int"),
        tagged(c, "DateTime.hour").cast("int"),
        tagged(c, "DateTime.minute").cast("int"),
        tagged(c, "DateTime.second").cast("decimal(16,6)") +
          tagged(c, "DateTime.subsecond").cast("decimal(16,6)") / 1000000))

  /** Timestamp → session-tz timestamp from epoch seconds (values.rs:40-43;
    * subsecond ignored exactly like the reference's Display). */
  def decodeTimestamp(c: Column): Column =
    timestamp_seconds(tagged(c, "Timestamp.unix_time").cast("long"))

  /** Blob (serde: array of byte ints) rendered as UTF-8 text — the
    * reference's own Blob handling ("TODO: add binary support",
    * values.rs:56-60). ASCII-exact via char(); good enough for the same
    * payloads the reference can represent. */
  def decodeBlobUtf8(c: Column): Column =
    when(tagged(c, "Blob").isNotNull,
      array_join(
        transform(
          from_json(tagged(c, "Blob"),
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.IntegerType)),
          b => call_function("char", b.cast("long"))), ""))

  /** Time-of-day as the reference's unpadded display text (no Spark
    * TimeType): "21:31:30.1000". */
  def decodeTimeString(c: Column): Column =
    when(tagged(c, "Time.hours").isNotNull,
      concat_ws(":", tagged(c, "Time.hours"), tagged(c, "Time.minutes"),
        concat_ws(".", tagged(c, "Time.seconds"), tagged(c, "Time.subseconds"))))

  /** Inner JSON text of a Json cell. */
  def decodeJson(c: Column): Column = tagged(c, "Json")

  // ---------- MySQL-literal rendering (Display, values.rs:47-93) ----------

  /** Render one tagged cell as the MySQL literal the reference's SQL
    * generator would emit: quoted-unpadded strings/dates/times, bare
    * numbers, bare `Null` token. Mirrors `Value.display` variant-for-
    * variant (cross-checked in SqlGenSpec). */
  def render(c: Column): Column = {
    val dY = tagged(c, "Date.year")
    val dtY = tagged(c, "DateTime.year")
    val tH = tagged(c, "Time.hours")
    val q = lit("\"")
    when(c === NullLit, lit("Null"))
      .when(tagged(c, "String").isNotNull,
        concat(q, tagged(c, "String"), q))
      .when(dY.isNotNull,
        concat(q, dY, lit("-"), tagged(c, "Date.month"), lit("-"),
          tagged(c, "Date.day"), q))
      .when(dtY.isNotNull,
        concat(q, dtY, lit("-"), tagged(c, "DateTime.month"), lit("-"),
          tagged(c, "DateTime.day"), lit(" "), tagged(c, "DateTime.hour"),
          lit(":"), tagged(c, "DateTime.minute"), lit(":"),
          tagged(c, "DateTime.second"), lit("."),
          tagged(c, "DateTime.subsecond"), q))
      .when(tH.isNotNull,
        concat(q, tH, lit(":"), tagged(c, "Time.minutes"), lit(":"),
          tagged(c, "Time.seconds"), lit("."),
          tagged(c, "Time.subseconds"), q))
      .when(tagged(c, "Timestamp.unix_time").isNotNull,
        concat(q,
          date_format(
            to_utc_timestamp(decodeTimestamp(c), "UTC"),
            "yyyy-MM-dd HH:mm:ss"),
          lit(".000000000"), q))
      .when(tagged(c, "Year").isNotNull, concat(q, tagged(c, "Year"), q))
      .when(tagged(c, "Blob").isNotNull, decodeBlobUtf8(c))
      .when(tagged(c, "Decimal").isNotNull, tagged(c, "Decimal"))
      .when(tagged(c, "Json").isNotNull, tagged(c, "Json"))
      // remaining numeric tags render as their raw JSON number text
      .otherwise(coalesce(
        tagged(c, "SignedInteger"), tagged(c, "UnsignedInteger"),
        tagged(c, "Enum"), tagged(c, "Double"), tagged(c, "Float")))
  }
}
