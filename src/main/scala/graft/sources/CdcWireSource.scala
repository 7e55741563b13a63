package graft.sources

import java.io.{BufferedReader, File, FileInputStream, InputStreamReader}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform, Expression => V2Expression}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min, Sum}
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

  /** Aggregate kinds the reader can compute per file. All are
    * MERGEABLE partials — min of mins, max of maxes, sum of counts —
    * which is exactly what Spark's final aggregate applies on top when
    * `supportCompletePushDown` is false. */
  sealed trait WireAggFunc extends Serializable
  case class AggCount(col: String) extends WireAggFunc
  case object AggCountStar extends WireAggFunc
  case class AggMin(col: String) extends WireAggFunc
  case class AggMax(col: String) extends WireAggFunc
  case class AggSum(col: String) extends WireAggFunc
  case class WireAgg(groupCols: Seq[String], funcs: Seq[WireAggFunc])
      extends Serializable

  /** The scan's output schema in aggregate mode: group columns first,
    * then one column per pushed function, positionally matching what
    * `V2ScanRelationPushDown` expects (count/sum partials are LongType;
    * min/max keep the column's type). */
  def aggSchema(full: StructType, spec: WireAgg): StructType = {
    val t = full.fields.map(f => f.name -> f.dataType).toMap
    StructType(
      spec.groupCols.map(c => StructField(c, t(c))) ++
      spec.funcs.map {
        case AggCount(c) => StructField(s"count_$c", LongType)
        case AggCountStar => StructField("count_star", LongType)
        case AggMin(c) => StructField(s"min_$c", t(c))
        case AggMax(c) => StructField(s"max_$c", t(c))
        case AggSum(c) => StructField(s"sum_$c", LongType)
      })
  }

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
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CdcWireScanBuilder(path, tableSchema, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new CdcWireWriteBuilder(path, info.schema())
}

class CdcWireScanBuilder(path: String, full: StructType,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  import CdcWireSource._

  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var agg: Option[WireAgg] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(CdcWireSource.absorbs)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // in aggregate mode the scan's schema is the aggregate schema —
    // Spark re-prunes with that same schema, which must not clobber it
    if (agg.isEmpty) required = requiredSchema
  // partial push: each partition stops at `l` rows; Spark keeps the
  // global limit (return false), so correctness never rests on it
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  /** Partial aggregate pushdown ([[SupportsPushDownAggregates]]): the
    * reader emits one pre-aggregated row per group PER FILE and Spark's
    * final aggregate merges the partials (min-of-mins, sum-of-counts),
    * so correctness never depends on the source seeing all files — the
    * distributed-safe contract. Complete pushdown is declined (default
    * `supportCompletePushDown` = false). Sum is absorbed only for long
    * columns: double summation is order-dependent, and a source must
    * never change float semantics behind the plan's back. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    def colOf(e: V2Expression): Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames()(0)).filter(c => full.fieldNames.contains(c))
      case _ => None
    }
    def typeOf(c: String): DataType = full(full.fieldIndex(c)).dataType
    val comparable: String => Boolean = c => typeOf(c) match {
      case LongType | DoubleType | StringType => true
      case _ => false
    }
    val groups = aggregation.groupByExpressions.toSeq.map(colOf)
    if (groups.exists(g => g.isEmpty || !comparable(g.get))) return false
    val funcs: Seq[Option[WireAggFunc]] =
      aggregation.aggregateExpressions.toSeq.map {
        case _: CountStar => Some(AggCountStar)
        case c: Count if !c.isDistinct => colOf(c.column).map(AggCount)
        case m: Min => colOf(m.column).filter(comparable).map(AggMin)
        case m: Max => colOf(m.column).filter(comparable).map(AggMax)
        case s: Sum if !s.isDistinct =>
          colOf(s.column).filter(typeOf(_) == LongType).map(AggSum)
        case _ => None
      }
    if (funcs.isEmpty || funcs.exists(_.isEmpty)) return false
    agg = Some(WireAgg(groups.map(_.get), funcs.map(_.get)))
    true
  }

  override def build(): Scan =
    new CdcWireScan(path, full, agg.map(aggSchema(full, _)).getOrElse(required),
      pushed, if (agg.isDefined) -1 else limit, agg, options)
}

case class CdcWireFilePartition(file: String) extends InputPartition

class CdcWireScan(path: String, full: StructType, val required: StructType,
    val pushed: Array[Filter], val limit: Int,
    val agg: Option[CdcWireSource.WireAgg] = None,
    options: CaseInsensitiveStringMap = CaseInsensitiveStringMap.empty())
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    require(agg.isEmpty, "aggregate pushdown is batch-only for cdc-wire")
    new CdcWireMicroBatchStream(path, full, required, pushed,
      Option(options.get("maxFilesPerTrigger")).map(_.toInt))
  }
  override def description(): String =
    s"CdcWireScan PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}, PushedLimit: $limit" +
      agg.map(a => s", PushedAggregation: [${a.funcs.mkString(", ")}], " +
        s"PushedGroupBy: [${a.groupCols.mkString(", ")}]").getOrElse("")
  override def planInputPartitions(): Array[InputPartition] = {
    val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
    files.filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getName)
      .map(f => CdcWireFilePartition(f.getAbsolutePath): InputPartition)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new CdcWireReaderFactory(full, required, pushed, limit, agg)
}

/** Micro-batch streaming read of the wire directory — the connector-level
  * form of the reference's offset-consuming SPU stream (SURVEY.md §2.1
  * S4/D9, cdc-mysql's consumer resumes from a stored topic offset): the
  * OFFSET is "first N files of the name-sorted listing consumed"
  * (append-only topic segments; rotation appends later-sorting names, as
  * in S3 index rotation). Admission control honors `maxFilesPerTrigger`
  * (bounded micro-batches) and Trigger.AvailableNow snapshots the listing
  * ONCE up front, so a drain has a fixed endpoint even while producers
  * keep appending. Filter/column pushdown from the batch scan applies
  * unchanged to every micro-batch; each batch plans one partition per
  * newly-admitted file. Progress/recovery is Spark's offset log — the
  * same checkpoint contract as every other source (D8). */
class CdcWireMicroBatchStream(path: String, full: StructType,
    required: StructType, pushed: Array[Filter], maxFilesPerTrigger: Option[Int])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private def visibleFiles: Array[File] =
    Option(new File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
      .sortBy(_.getName)

  // AvailableNow endpoint: fixed at prepare time, immune to appends
  @volatile private var availableTarget: Int = -1

  override def prepareForTriggerAvailableNow(): Unit =
    availableTarget = visibleFiles.length

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Offset at index `n` of a listing: carries the name of the last
    * admitted file as a HIGH WATERMARK plus a signature folded over ALL
    * admitted names, so a later re-listing that disagrees anywhere in
    * the prefix (earlier-sorting filename written, consumed segment
    * deleted/compacted — even a paired delete+insert that preserves the
    * boundary name and count) fails fast instead of silently remapping
    * positions to different files. */
  private def offsetAt(n: Int, files: Array[File]): CdcWireOffset =
    CdcWireOffset(n, if (n == 0) "" else files(n - 1).getName,
      CdcWireOffset.listingSig(files, n))

  override def initialOffset(): Offset = CdcWireOffset(0, "")

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (SupportsAdmissionControl)")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val so = start.asInstanceOf[CdcWireOffset]
    val files = visibleFiles
    val cap = if (availableTarget >= 0) availableTarget else files.length
    val next = limit match {
      case m: ReadMaxFiles => math.min(cap, so.n + m.maxFiles())
      case _ => cap
    }
    require(next <= files.length,
      s"cdc-wire listing drift: admission target $next but only " +
        s"${files.length} files visible (segment deleted mid-drain?)")
    if (next <= so.n) so else offsetAt(next, files)
  }

  override def reportLatestOffset(): Offset = {
    val files = visibleFiles
    offsetAt(files.length, files)
  }

  override def deserializeOffset(json: String): Offset = {
    val node = new ObjectMapper().readTree(json)
    CdcWireOffset(node.get("n").asInt(),
      Option(node.get("last")).map(_.asText()).getOrElse(""),
      Option(node.get("sig")).map(_.asLong())
        .getOrElse(CdcWireOffset.NoSig))
  }

  /** The admitted range [start, end) is positional, so before slicing we
    * re-check both boundaries against the watermarks the offsets carry.
    * Any drift of the name-sorted listing under committed positions
    * (deletion, compaction, an out-of-order producer) throws here —
    * rows are never silently skipped or replayed. */
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val so = start.asInstanceOf[CdcWireOffset]
    val eo = end.asInstanceOf[CdcWireOffset]
    val files = visibleFiles
    def check(o: CdcWireOffset): Unit = if (o.n > 0 && o.last.nonEmpty) {
      require(o.n <= files.length,
        s"cdc-wire listing drift: offset $o but only ${files.length} files visible")
      val actual = files(o.n - 1).getName
      require(actual == o.last,
        s"cdc-wire listing drift at position ${o.n}: committed watermark " +
          s"'${o.last}' but listing now has '$actual' — a consumed segment " +
          "was removed or an earlier-sorting name appeared")
      // boundary match is necessary but not sufficient: a paired
      // delete+insert inside the prefix preserves position AND boundary;
      // the full-prefix signature catches any such remapping
      require(o.sig == CdcWireOffset.NoSig ||
          o.sig == CdcWireOffset.listingSig(files, o.n),
        s"cdc-wire listing drift: the first ${o.n} file names no longer " +
          s"match the committed offset's listing signature — segments were " +
          "replaced under committed positions")
    }
    check(so); check(eo)
    files.slice(so.n, eo.n)
      .map(f => CdcWireFilePartition(f.getAbsolutePath): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new CdcWireReaderFactory(full, required, pushed, -1, None)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class CdcWireOffset(n: Int, last: String = "",
    sig: Long = CdcWireOffset.NoSig)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = {
    val node = new ObjectMapper().createObjectNode()
    node.put("n", n)
    node.put("last", last)
    node.put("sig", sig)
    node.toString
  }
}

object CdcWireOffset {
  /** Sentinel for offsets recovered from a pre-signature checkpoint —
    * the signature check is skipped (boundary checks still apply). */
  val NoSig: Long = Long.MinValue

  /** Order-sensitive fold over the first `n` listed names (String
    * .hashCode is specified by the JLS, so the value is stable across
    * JVMs and restarts). */
  def listingSig(files: Array[File], n: Int): Long = {
    var acc = 17L
    var i = 0
    while (i < n) { acc = acc * 31 + files(i).getName.hashCode; i += 1 }
    acc
  }
}

class CdcWireReaderFactory(full: StructType, required: StructType,
    pushed: Array[Filter], limit: Int,
    agg: Option[CdcWireSource.WireAgg] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[CdcWireFilePartition].file
    agg match {
      case Some(spec) => new CdcWireAggReader(file, full, pushed, spec)
      case None => new CdcWireReader(file, full, required, pushed, limit)
    }
  }
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
    extends Write with BatchWrite
    with org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def toBatch: BatchWrite = this
  override def toStreaming
      : org.apache.spark.sql.connector.write.streaming.StreamingWrite = this
  // both parent defaults are `true`; the diamond needs an explicit pick
  override def useCommitCoordinator(): Boolean = true
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

  // ---- streaming (K1 topic sink at the connector): one visible segment
  // per (epoch, partition). Epoch REPLAYS after a failure re-produce the
  // same dest names, and the commit's REPLACE move makes re-commits
  // idempotent — readers see each epoch's data exactly once. The
  // speculative-attempt story is unchanged: only the coordinator-chosen
  // attempt's message reaches commit, losers' temps are aborted.
  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory = {
    new File(path).mkdirs()
    new CdcWireStreamingWriterFactory(path, querySchema)
  }
  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val dir = new File(path)
    val committed = messages.map { case CdcWireCommit(_, dest) => dest }.toSet
    // An epoch REPLAY can run with a different partition count than the
    // crashed first attempt (repartition/AQE between attempts). REPLACE
    // only fixes same-name re-commits; segments from the first attempt's
    // higher partition ids would survive alongside the replay's output
    // and duplicate rows on read. Make the epoch's visible file set
    // exactly the committed one: drop any part-e<epoch>-* not in it.
    val prefix = s"part-e$epochId-"
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(prefix) &&
        !committed.contains(f.getName))
      .foreach(f => f.delete())
    messages.foreach { case CdcWireCommit(tmp, dest) =>
      java.nio.file.Files.move(new File(tmp).toPath,
        new File(dir, dest).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = abort(messages)
}

class CdcWireStreamingWriterFactory(path: String, schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new CdcWireWriter(path, schema, partitionId, taskId, Some(epochId))
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
    taskId: Long, epoch: Option[Long] = None) extends DataWriter[InternalRow] {
  private val mapper = new ObjectMapper()
  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  private val tmp = new File(path,
    s"_tmp-${epoch.map(e => s"e$e-").getOrElse("")}$partitionId-$taskId.json")
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
    // epoch dests EXCLUDE taskId: every attempt of (epoch, partition)
    // names the same segment, so replays overwrite instead of duplicate
    CdcWireCommit(tmp.getAbsolutePath,
      epoch.map(e => s"part-e$e-$partitionId.json")
        .getOrElse(s"part-$partitionId-$taskId.json"))
  }
  override def abort(): Unit = {
    out.close()
    tmp.delete()
    ()
  }
  override def close(): Unit = ()
}

/** Shared line-parse kernel for the wire readers: typed value
  * extraction per the table schema. Strings stay JVM strings here —
  * filters compare pre-conversion; UTF8String conversion happens only
  * for values that reach an output row. */
private[sources] class WireLineParser(full: StructType) extends Serializable {
  private val ts = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  private val types: Map[String, DataType] =
    full.fields.map(f => f.name -> f.dataType).toMap

  def field(node: JsonNode, name: String): Any = {
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

  def toCatalyst(v: Any): Any = v match {
    case s: String => UTF8String.fromString(s)
    case other => other
  }
}

/** Per-file line reader: parse → filter on parsed values → materialize
  * only required columns as an [[InternalRow]]. */
class CdcWireReader(file: String, full: StructType, required: StructType,
    pushed: Array[Filter], limit: Int) extends PartitionReader[InternalRow] {
  private val mapper = new ObjectMapper()
  private val parser = new WireLineParser(full)
  private val reader = new BufferedReader(
    new InputStreamReader(new FileInputStream(file), UTF_8))
  private val outNames: Array[String] = required.fields.map(_.name)
  private var current: InternalRow = _
  private var emitted = 0

  private def field(node: JsonNode, name: String): Any = parser.field(node, name)
  private def toCatalyst(v: Any): Any = parser.toCatalyst(v)

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

/** Aggregate-mode per-file reader: one pass over the file's lines
  * (pushed filters applied first), accumulating per-group partials in
  * a hash map, then one output row per group. Each FILE produces its
  * own partials — Spark's final aggregate merges across files, so a
  * straggler or retry of one partition never affects another's result.
  * Memory is O(groups in this file), not O(rows): the 100 TB contract
  * is that group cardinality per file is bounded (it is here —
  * event_type), and an unexpectedly-wide group-by simply falls back at
  * plan time because [[CdcWireScanBuilder.pushAggregation]] only
  * absorbs columns it knows. */
class CdcWireAggReader(file: String, full: StructType,
    pushed: Array[Filter], spec: CdcWireSource.WireAgg)
    extends PartitionReader[InternalRow] {
  import CdcWireSource._

  private val mapper = new ObjectMapper()
  private val parser = new WireLineParser(full)

  /** Catalyst-binary string order (UTF8String), so pushed MIN/MAX over
    * strings agree with what the engine would have computed. */
  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: java.lang.Long, y: java.lang.Long) => x < y
    case (x: java.lang.Double, y: java.lang.Double) =>
      java.lang.Double.compare(x, y) < 0
    case (x: String, y: String) =>
      UTF8String.fromString(x).compareTo(UTF8String.fromString(y)) < 0
    case _ => sys.error(s"incomparable: ${a.getClass}")
  }

  private var it: Iterator[InternalRow] = _
  private var current: InternalRow = _

  private def run(): Iterator[InternalRow] = {
    val acc = new java.util.LinkedHashMap[Seq[Any], Array[Any]]()
    val reader = new BufferedReader(
      new InputStreamReader(new FileInputStream(file), UTF_8))
    try {
      var line = reader.readLine()
      while (line != null) {
        val node = mapper.readTree(line)
        val get = (name: String) => parser.field(node, name)
        if (pushed.forall(CdcWireSource.eval(_, get))) {
          val key: Seq[Any] = spec.groupCols.map(get)
          var slots = acc.get(key)
          if (slots == null) {
            slots = new Array[Any](spec.funcs.length)
            var i = 0
            while (i < spec.funcs.length) {
              slots(i) = spec.funcs(i) match {
                case AggCount(_) | AggCountStar => java.lang.Long.valueOf(0L)
                case _ => null
              }
              i += 1
            }
            acc.put(key, slots)
          }
          var i = 0
          while (i < spec.funcs.length) {
            spec.funcs(i) match {
              case AggCountStar =>
                slots(i) = java.lang.Long.valueOf(
                  slots(i).asInstanceOf[java.lang.Long] + 1L)
              case AggCount(c) => if (get(c) != null)
                slots(i) = java.lang.Long.valueOf(
                  slots(i).asInstanceOf[java.lang.Long] + 1L)
              case AggMin(c) =>
                val v = get(c)
                if (v != null && (slots(i) == null || lt(v, slots(i))))
                  slots(i) = v
              case AggMax(c) =>
                val v = get(c)
                if (v != null && (slots(i) == null || lt(slots(i), v)))
                  slots(i) = v
              case AggSum(c) =>
                val v = get(c)
                if (v != null) {
                  val prev = if (slots(i) == null) 0L
                    else slots(i).asInstanceOf[java.lang.Long].longValue()
                  slots(i) = java.lang.Long.valueOf(
                    prev + v.asInstanceOf[java.lang.Long])
                }
            }
            i += 1
          }
        }
        line = reader.readLine()
      }
    } finally reader.close()
    // a global aggregate must yield exactly one partial row per file,
    // even over zero matching lines (count 0 / null min-max partials)
    if (spec.groupCols.isEmpty && acc.isEmpty) {
      val slots = spec.funcs.map {
        case AggCount(_) | AggCountStar => java.lang.Long.valueOf(0L): Any
        case _ => null: Any
      }.toArray
      acc.put(Nil, slots)
    }
    import scala.jdk.CollectionConverters._
    acc.entrySet().iterator().asScala.map { e =>
      val values = new Array[Any](spec.groupCols.length + spec.funcs.length)
      var i = 0
      e.getKey.foreach { g => values(i) = parser.toCatalyst(g); i += 1 }
      e.getValue.foreach { a => values(i) = parser.toCatalyst(a); i += 1 }
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(values)
    }
  }

  override def next(): Boolean = {
    if (it == null) it = run()
    if (it.hasNext) { current = it.next(); true } else false
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
