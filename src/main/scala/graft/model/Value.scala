package graft.model

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.JsonNodeFactory

/** The reference's 14-variant dynamic cell type
  * (cdc-mysql/src/messages/values.rs:8-45) with its two encodings:
  *
  *  1. `toJson` — the externally-tagged serde wire form, e.g.
  *     `{"String":"Puffball"}`, `{"Date":{"year":2000,"month":3,"day":30}}`,
  *     bare `"Null"` for the unit variant (serde goldens values.rs:104-132,
  *     row_ops.rs:36-55).
  *  2. `display` — the MySQL-literal rendering used for SQL regeneration
  *     (Display impl, values.rs:47-93): strings/dates/times double-quoted
  *     WITHOUT zero-padding, numbers bare, `Null` as the bare token,
  *     Timestamp formatted UTC `%Y-%m-%d %H:%M:%S.%f` (9-digit nanos,
  *     subsecond field ignored — values.rs:84-89), Blob as UTF-8 text
  *     (values.rs:56-60).
  *
  * In the Spark engine a typed changelog stores each cell as its `toJson`
  * text inside the `ArrayType(StringType)` event payload — the cells of a
  * row joined with "," literally reproduce the reference's serde `cols`
  * array. Column-level DECODE back to typed Spark columns is done with
  * expressions (see [[graft.operators.ValueCodec]]), not this driver-side
  * class; this ADT exists for generators, unit goldens, and row-level
  * tooling.
  */
sealed trait Value {
  import Value._

  /** Externally-tagged serde JSON (values.rs serde derive). */
  def toJson: String = this match {
    case VUnsignedInteger(v) => s"""{"UnsignedInteger":$v}"""
    case VSignedInteger(v) => s"""{"SignedInteger":$v}"""
    case VFloat(v) => s"""{"Float":${num(v)}}"""
    case VDouble(v) => s"""{"Double":${num(v)}}"""
    case VString(v) => s"""{"String":${jstr(v)}}"""
    case VEnum(v) => s"""{"Enum":$v}"""
    case VBlob(bytes) => bytes.mkString("""{"Blob":[""", ",", "]}")
    case VYear(v) => s"""{"Year":$v}"""
    case VDate(y, m, d) =>
      s"""{"Date":{"year":$y,"month":$m,"day":$d}}"""
    case VTime(h, mi, s, sub) =>
      s"""{"Time":{"hours":$h,"minutes":$mi,"seconds":$s,"subseconds":$sub}}"""
    case VDateTime(y, mo, d, h, mi, s, sub) =>
      s"""{"DateTime":{"year":$y,"month":$mo,"day":$d,"hour":$h,"minute":$mi,"second":$s,"subsecond":$sub}}"""
    case VJson(json) => s"""{"Json":$json}"""
    case VDecimal(v) => s"""{"Decimal":${jstr(v)}}"""
    case VTimestamp(t, sub) =>
      s"""{"Timestamp":{"unix_time":$t,"subsecond":$sub}}"""
    case VNull => "\"Null\""
  }

  /** MySQL-literal rendering (Display impl, values.rs:47-93). */
  def display: String = this match {
    case VUnsignedInteger(v) => v.toString
    case VSignedInteger(v) => v.toString
    case VFloat(v) => num(v)
    case VDouble(v) => num(v)
    case VString(v) => "\"" + v + "\""
    case VEnum(v) => v.toString
    case VBlob(bytes) => new String(bytes.map(_.toByte).toArray, "UTF-8")
    case VYear(v) => "\"" + v + "\""
    case VDate(y, m, d) => s""""$y-$m-$d""""
    case VTime(h, mi, s, sub) => s""""$h:$mi:$s.$sub""""
    case VDateTime(y, mo, d, h, mi, s, sub) => s""""$y-$mo-$d $h:$mi:$s.$sub""""
    case VJson(json) => json
    case VDecimal(v) => v
    case VTimestamp(t, _) =>
      // chrono %Y-%m-%d %H:%M:%S.%f over UNIX_EPOCH + whole seconds:
      // nanos are always zero → nine literal zeros (values.rs:84-89)
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
      "\"" + fmt.format(java.time.Instant.ofEpochSecond(t)) + ".000000000\""
    case VNull => "Null"
  }
}

object Value {
  final case class VUnsignedInteger(v: Short) extends Value
  final case class VSignedInteger(v: Long) extends Value
  final case class VFloat(v: Float) extends Value
  final case class VDouble(v: Double) extends Value
  final case class VString(v: String) extends Value
  final case class VEnum(v: Short) extends Value
  final case class VBlob(v: Seq[Int]) extends Value
  final case class VYear(v: Int) extends Value
  final case class VDate(year: Int, month: Int, day: Int) extends Value
  final case class VTime(hours: Int, minutes: Int, seconds: Int, subseconds: Int) extends Value
  final case class VDateTime(year: Int, month: Int, day: Int,
      hour: Int, minute: Int, second: Int, subsecond: Int) extends Value
  final case class VJson(json: String) extends Value
  final case class VDecimal(v: String) extends Value
  final case class VTimestamp(unixTime: Int, subsecond: Int) extends Value
  case object VNull extends Value

  /** Rust `{}` float formatting (values.rs:47-93 Display): shortest
    * round-trip repr in the value's OWN width, plain decimal, no trailing
    * ".0". Formatting must start from the value's own type — widening
    * 0.1f to double first would print the f64 expansion
    * "0.10000000149011612" where Rust prints the f32 shortest repr "0.1"
    * (round-2 advice). Java exponent forms (1.0E-7) are expanded to the
    * plain decimal on the same digits via BigDecimal, matching Rust's
    * Display; note serde_json's ryu DOES emit scientific notation for
    * extreme magnitudes, so `toJson` byte-fidelity is documented as
    * Display-style for such values (fixtures never reach them). */
  private def fmtNum(s: String): String =
    if (s.indexOf('E') >= 0)
      new java.math.BigDecimal(s).stripTrailingZeros.toPlainString
    else if (s.endsWith(".0")) s.dropRight(2) else s
  private def num(v: Double): String = fmtNum(v.toString)
  private def num(v: Float): String = fmtNum(v.toString)

  private def jstr(s: String): String =
    new ObjectMapper().writeValueAsString(JsonNodeFactory.instance.textNode(s))

  private val mapper = new ObjectMapper()

  /** Decode the externally-tagged serde form back into the ADT. */
  def fromJson(json: String): Value = {
    val node = mapper.readTree(json)
    if (node.isTextual && node.asText == "Null") VNull
    else {
      val tag = node.fieldNames().next()
      val v: JsonNode = node.get(tag)
      tag match {
        case "UnsignedInteger" => VUnsignedInteger(v.asInt.toShort)
        case "SignedInteger" => VSignedInteger(v.asLong)
        case "Float" => VFloat(v.asDouble.toFloat)
        case "Double" => VDouble(v.asDouble)
        case "String" => VString(v.asText)
        case "Enum" => VEnum(v.asInt.toShort)
        case "Blob" =>
          VBlob((0 until v.size).map(i => v.get(i).asInt))
        case "Year" => VYear(v.asInt)
        case "Date" =>
          VDate(v.get("year").asInt, v.get("month").asInt, v.get("day").asInt)
        case "Time" =>
          VTime(v.get("hours").asInt, v.get("minutes").asInt,
            v.get("seconds").asInt, v.get("subseconds").asInt)
        case "DateTime" =>
          VDateTime(v.get("year").asInt, v.get("month").asInt, v.get("day").asInt,
            v.get("hour").asInt, v.get("minute").asInt, v.get("second").asInt,
            v.get("subsecond").asInt)
        case "Json" => VJson(mapper.writeValueAsString(v))
        case "Decimal" => VDecimal(v.asText)
        case "Timestamp" =>
          VTimestamp(v.get("unix_time").asInt, v.get("subsecond").asInt)
        case other => throw new IllegalArgumentException(s"unknown tag $other")
      }
    }
  }

  /** The tagged-cell text a typed changelog stores for SQL NULL. */
  val NullCell: String = VNull.toJson
}
