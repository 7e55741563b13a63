package graft.sources

import java.io.{BufferedReader, File, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the topic wire format — JSON event lines
  * (the reference's produce/consume serde, cdc-mysql §2.5) read through
  * Spark's connector API instead of the generic text reader, so the
  * engine-side contracts are REAL, not advisory:
  *
  *  - '''Column pruning''' ([[SupportsPushDownRequiredColumns]]): the scan's
  *    output schema is exactly the required columns — unprojected fields
  *    are never converted (a 2-column projection over a 6-column wire
  *    record materializes 2 columns).
  *  - '''Filter pushdown''' ([[SupportsPushDownFilters]]): comparison/IN/
  *    null-test predicates over the typed columns are absorbed into the
  *    reader and evaluated on the parsed value BEFORE row materialization.
  *    Absorbed filters leave the query plan entirely — Spark trusts the
  *    source — so the reader's evaluation must be (and is) exact Catalyst
  *    semantics: null-rejecting comparisons, typed orderings.
  *  - '''Limit pushdown''' ([[SupportsPushDownLimit]]): each partition
  *    stops reading after the limit; reported as partial (`false`) so
  *    Spark keeps the global limit operator.
  *  - '''Splittable''' : one [[InputPartition]] per staged file — the scan
  *    parallelizes with the file count, the 100 TB unit of work.
  *
  * Timestamps use the staging serde's explicit pattern at UTC
  * (micros-exact, same contract as [[WireFormats.eventsJsonl]]). At 100 TB
  * the same connector shape holds: partitions map to object-store ranges
  * and pushed filters skip whole row groups of work per partition.
  */
class CdcWireSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "cdc-wire"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WireFormats.EventsSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new CdcWireTable(properties.get("path"), schema)
}

object CdcWireSource {
  /** Columns whose filters the reader absorbs (typed long/double/string
    * comparisons; timestamps stay residual — their literal forms are
    * session-tz-dependent and not worth the risk for one column). */
  private val Absorbable = Set("event_id", "user_id", "event_type", "value")

  private def okVal(v: Any): Boolean =
    v.isInstanceOf[Number] || v.isInstanceOf[String]

  /** Can this filter be fully evaluated by the reader? */
  def absorbs(f: Filter): Boolean = f match {
    case EqualTo(a, v) => Absorbable(a) && okVal(v)
    case GreaterThan(a, v) => Absorbable(a) && okVal(v)
    case GreaterThanOrEqual(a, v) => Absorbable(a) && okVal(v)
    case LessThan(a, v) => Absorbable(a) && okVal(v)
    case LessThanOrEqual(a, v) => Absorbable(a) && okVal(v)
    case In(a, vs) => Absorbable(a) && vs.forall(okVal)
    case IsNotNull(a) => Absorbable(a)
    case IsNull(a) => Absorbable(a)
    case And(l, r) => absorbs(l) && absorbs(r)
    case Or(l, r) => absorbs(l) && absorbs(r)
    case Not(c) => absorbs(c)
    case _ => false
  }

  /** Catalyst-exact ordering between a parsed column value and a pushed
    * literal. Literal types follow the column's Catalyst type after
    * coercion (Long/Double/String here). */
  private def cmp(l: Any, r: Any): Int = (l, r) match {
    case (a: java.lang.Long, b: Number) => java.lang.Long.compare(a, b.longValue())
    case (a: java.lang.Double, b: Number) => java.lang.Double.compare(a, b.doubleValue())
    case (a: String, b: String) => a.compareTo(b)
    case _ => sys.error(s"unpushable comparison: ${l.getClass} vs ${r.getClass}")
  }

  /** Null-rejecting comparison, as Catalyst evaluates it. */
  private def nn(x: Any)(p: Any => Boolean): Boolean = x != null && p(x)

  def eval(f: Filter, get: String => Any): Boolean = f match {
    case EqualTo(a, v) => nn(get(a))(cmp(_, v) == 0)
    case GreaterThan(a, v) => nn(get(a))(cmp(_, v) > 0)
    case GreaterThanOrEqual(a, v) => nn(get(a))(cmp(_, v) >= 0)
    case LessThan(a, v) => nn(get(a))(cmp(_, v) < 0)
    case LessThanOrEqual(a, v) => nn(get(a))(cmp(_, v) <= 0)
    case In(a, vs) => nn(get(a))(x => vs.exists(cmp(x, _) == 0))
    case IsNotNull(a) => get(a) != null
    case IsNull(a) => get(a) == null
    case And(l, r) => eval(l, get) && eval(r, get)
    case Or(l, r) => eval(l, get) || eval(r, get)
    case Not(c) => !eval(c, get)
    case other => sys.error(s"filter not absorbable: $other")
  }
}

class CdcWireTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"cdc_wire($path)"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcWireScanBuilder(path, tableSchema)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CdcWireWriteBuilder(path, info.schema())
}

class CdcWireScanBuilder(path: String, full: StructType)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(CdcWireSource.absorbs)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  // partial push: each partition stops at `l` rows; Spark keeps the
  // global limit (return false), so correctness never rests on it
  override def pushLimit(l: Int): Boolean = { limit = l; false }
  override def build(): Scan = new CdcWireScan(path, full, required, pushed, limit)
}

case class CdcWireFilePartition(file: String) extends InputPartition

class CdcWireScan(path: String, full: StructType, val required: StructType,
    val pushed: Array[Filter], val limit: Int) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"CdcWireScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}, PushedLimit: $limit"
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => CdcWireFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcWireReaderFactory(full, required, pushed, limit)
}

class CdcWireReaderFactory(full: StructType, required: StructType,
    pushed: Array[Filter], limit: Int) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new CdcWireReader(
      partition.asInstanceOf[CdcWireFilePartition].file,
      full, required, pushed, limit)
}

class CdcWireWriteBuilder(path: String, querySchema: StructType)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new CdcWireWrite(path, querySchema, doTruncate)
}

case class CdcWireCommit(tmp: String, dest: String)
    extends WriterCommitMessage

/** Batch write with a real two-phase commit: every task writes to an
  * underscore-prefixed temp file (invisible to the reader's listing),
  * and only the DRIVER's commit — after Spark's commit coordinator has
  * picked exactly one winning attempt per partition — renames winners
  * into place. A failed or speculative task's output never becomes
  * visible; abort deletes its temp. Truncate-overwrite removes the old
  * visible files inside the same commit, so readers see old-or-new,
  * never a mix of partial states. */
class CdcWireWrite(path: String, querySchema: StructType, truncate: Boolean)
    extends Write with BatchWrite {
  override def toBatch: BatchWrite = this
  override def description(): String =
    s"CdcWireWrite(truncate=$truncate, ${querySchema.simpleString})"
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    new File(path).mkdirs()
    new CdcWireWriterFactory(path, querySchema)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    if (truncate) {
      Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_tmp-"))
        .foreach(f => f.delete())
    }
    messages.foreach { case CdcWireCommit(tmp, dest) =>
      val ok = new File(tmp).renameTo(new File(dir, dest))
      require(ok, s"commit rename failed: $tmp -> $dest")
    }
    new java.io.FileOutputStream(new File(dir, "_SUCCESS")).close()
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case CdcWireCommit(tmp, _) => new File(tmp).delete(); ()
      case _ => ()
    }
}

class CdcWireWriterFactory(path: String, schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new CdcWireWriter(path, schema, partitionId, taskId)
}

/** Per-task JSON-lines writer matching the wire serde: schema-ordered
  * fields, nulls omitted, timestamps at the explicit UTC micros
  * pattern, doubles/longs through Jackson (shortest representation —
  * the same bytes Spark's JSON writer emits, so the reader round-trips
  * bit-exactly). */
class CdcWireWriter(path: String, schema: StructType, partitionId: Int,
    taskId: Long) extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()
  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  private val tmp = new File(path, s"_tmp-$partitionId-$taskId.json")
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmp), UTF_8))
  private val fields = schema.fields

  override def write(row: InternalRow): Unit = {
    val node = mapper.createObjectNode()
    var i = 0
    while (i < fields.length) {
      val f = fields(i)
      if (!row.isNullAt(i)) f.dataType match {
        case LongType => node.put(f.name, row.getLong(i))
        case DoubleType => node.put(f.name, row.getDouble(i))
        case StringType => node.put(f.name, row.getUTF8String(i).toString)
        case TimestampType =>
          val us = row.getLong(i)
          val ldt = java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
          node.put(f.name, ldt.format(ts))
          ()
        case dt => sys.error(s"unsupported wire type $dt")
      }
      i += 1
    }
    out.write(mapper.writeValueAsString(node))
    out.newLine()
  }
  override def commit(): WriterCommitMessage = {
    out.close()
    CdcWireCommit(tmp.getAbsolutePath, s"part-$partitionId-$taskId.json")
  }
  override def abort(): Unit = {
    out.close()
    tmp.delete()
    ()
  }
  override def close(): Unit = ()
}

/** Per-file line reader: parse → filter on parsed values → materialize
  * only required columns as an [[InternalRow]]. */
class CdcWireReader(file: String, full: StructType, required: StructType,
    pushed: Array[Filter], limit: Int) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  private val types: Map[String, DataType] =
    full.fields.map(f => f.name -> f.dataType).toMap
  private val reader = new BufferedReader(
    new InputStreamReader(new FileInputStream(file), UTF_8))
  private val outNames: Array[String] = required.fields.map(_.name)
  private var current: InternalRow = _
  private var emitted = 0

  /** Typed value of `name` in the parsed line (null-safe). Strings stay
    * JVM strings here — filters compare pre-conversion; UTF8String
    * conversion happens only for columns that survive projection. */
  private def field(node: JsonNode, name: String): Any = {
    val n = node.get(name)
    if (n == null || n.isNull) null
    else types(name) match {
      case LongType => java.lang.Long.valueOf(n.asLong())
      case DoubleType => java.lang.Double.valueOf(n.asDouble())
      case StringType => n.asText()
      case TimestampType =>
        val ldt = LocalDateTime.parse(n.asText(), ts)
        java.lang.Long.valueOf(
          ldt.toEpochSecond(ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
      case dt => sys.error(s"unsupported wire type $dt")
    }
  }

  private def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }

  override def next(): Boolean = {
    if (limit >= 0 && emitted >= limit) return false
    var line = reader.readLine()
    while (line != null) {
      val node = mapper.readTree(line)
      val get = (name: String) => field(node, name)
      if (pushed.forall(CdcWireSource.eval(_, get))) {
        val values = new Array[Any](outNames.length)
        var i = 0
        while (i < outNames.length) {
          values(i) = toCatalyst(field(node, outNames(i)))
          i += 1
        }
        current = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
        emitted += 1
        return true
      }
      line = reader.readLine()
    }
    false
  }
  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
