package graft.operators

import java.io.File
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

/** Manifest-pointer commit for file-backed mutable state
  * ([[ReplicaSink]]'s bucketed replica, [[IncrementalAgg]]'s aggregate
  * table).
  *
  * Local-FS directory renames are not a commit protocol an object store
  * honors (S3 "rename" is copy+delete, and a crash mid-swap leaves
  * neither snapshot whole). The portable protocol is the one every
  * lakehouse table format uses: DATA FILES ARE IMMUTABLE, each commit
  * writes new files under fresh names and then publishes a single small
  * MANIFEST naming exactly the files of the current snapshot — one
  * atomic pointer write (here an atomic move of a temp file; on S3 a
  * single PUT). Readers resolve the manifest first and read only what
  * it names, so they see the old snapshot or the new one, never a mix;
  * a crash between data write and pointer swap leaves orphan files that
  * the NEXT successful commit's [[gc]] removes, and the old snapshot
  * stays fully readable throughout.
  */
object SnapshotManifest {

  /** entries: logical name (e.g. "bucket=3", "cur") → root-relative
    * data directory of the current snapshot. `retain` is the table's
    * retention setting (see [[DefaultRetain]]), carried in the manifest
    * itself so every commit prunes by the table's own policy. */
  final case class State(version: Long, entries: Map[String, String],
      retain: Int = DefaultRetain)

  private val Name = "MANIFEST.json"
  private val HistoryDir = "_history"

  /** Snapshot versions retained for time travel beyond the current one:
    * [[commit]] archives each manifest under `_history/` and [[gc]]
    * keeps every data dir any retained manifest references, so
    * [[readAt]] can open the previous `retain` versions — rollback and
    * audit-read, the lakehouse retention contract in miniature. The
    * default applies to tables that never configured their own; set a
    * PER-TABLE policy with [[setRetention]] (a committed operation, so
    * the change itself is versioned and crash-safe). */
  val DefaultRetain = 2

  /** Change a table's retention policy: commits the current entries
    * unchanged with the new `retain` — version bump, archive, and prune
    * under the NEW policy, exactly like any other commit. */
  def setRetention(root: File, retain: Int): Unit = {
    require(retain >= 0, s"retain must be >= 0, got $retain")
    val m = read(root)
    commit(root, State(m.version + 1, m.entries, retain))
  }

  def read(root: File): State = {
    val f = new File(root, Name)
    if (!f.exists()) State(0L, Map.empty) else parse(f)
  }

  /** The `conf/attrs` convention shared by the attribute-carrying index
    * artifacts ([[TextIndex]], [[AnnIndex]]): filterable attribute
    * columns recorded as comma-joined `name TYPE` DDL fragments. Types
    * may themselves contain commas (DECIMAL(10,2), STRUCT<…>, MAP<…>),
    * so the split tracks paren/angle depth; renderer and parser live
    * together so the two indexes cannot drift. */
  def renderAttrDdl(schema: org.apache.spark.sql.types.StructType,
      attrs: Seq[String]): String =
    attrs.map(n => s"$n ${schema(n).dataType.sql}").mkString(",")

  def parseAttrDdl(entry: Option[String]): Seq[(String, String)] =
    entry.filter(_.nonEmpty).toSeq.flatMap { s =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      s.foreach {
        case c @ ('(' | '<') => depth += 1; cur += c; ()
        case c @ (')' | '>') => depth -= 1; cur += c; ()
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case c => cur += c; ()
      }
      if (cur.nonEmpty) out += cur.result()
      out.toSeq.map(_.trim).filter(_.nonEmpty).map { f =>
        val parts = f.split(" ", 2)
        require(parts.length == 2, s"malformed conf/attrs fragment '$f'")
        (parts(0), parts(1))
      }
    }

  private def serialize(s: State): Array[Byte] = {
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    node.put("retain", s.retain)
    val es = node.putObject("entries")
    s.entries.foreach { case (k, v) => es.put(k, v); () }
    node.toString.getBytes(UTF_8)
  }

  private def parse(f: File): State = {
    val node = new ObjectMapper().readTree(f)
    val es = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val it = node.get("entries").fields()
    while (it.hasNext) {
      val e = it.next()
      es(e.getKey) = e.getValue.asText()
    }
    val retain = // manifests written before the knob existed default
      Option(node.get("retain")).map(_.asInt()).getOrElse(DefaultRetain)
    State(node.get("version").asLong(), es.toMap, retain)
  }

  /** Publish a snapshot: serialize to a temp name, one atomic move onto
    * the manifest. The data dirs `s.entries` names must already be fully
    * written — this call is the commit point. An archive copy lands in
    * `_history/` first (before the pointer swap, so a crash in between
    * leaves the archive as a harmless orphan) and archives older than
    * the state's `retain` versions are pruned. */
  def commit(root: File, s: State): Unit = {
    root.mkdirs()
    val bytes = serialize(s)
    val hist = new File(root, HistoryDir)
    hist.mkdirs()
    java.nio.file.Files.write(
      new File(hist, s"v${s.version}.json").toPath, bytes)
    val tmp = new File(root, s"_$Name.tmp")
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, new File(root, Name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // prune AFTER the pointer swap: a crash before this point must not
    // shrink the still-committed older version's retention window (a
    // deleted archive is not a harmless orphan; an extra one is)
    Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("v\\d+\\.json") &&
        f.getName.stripPrefix("v").stripSuffix(".json").toLong
          < s.version - s.retain)
      .foreach(_.delete())
    ()
  }

  /** Time travel: the committed snapshot at `version`, if still within
    * the retention window. */
  def readAt(root: File, version: Long): Option[State] = {
    val f = new File(new File(root, HistoryDir), s"v$version.json")
    // an archive is written BEFORE its pointer swap; only trust archives
    // at or below the committed current version
    if (f.exists() && version <= read(root).version) Some(parse(f)) else None
  }

  /** One row of [[vacuumReport]]: a snapshot dir (or an unreferenced
    * child of a partially referenced dir), its classification, and its
    * modification age. */
  final case class VacuumEntry(path: String, kind: String, ageMs: Long)

  /** DRY-RUN vacuum: classify every snapshot dir under `root` as
    * `current` (named by the committed manifest), `retained` (named
    * only by a time-travel archive inside the retention window), or
    * `deletable` (what [[gc]] WOULD remove — crash orphans and
    * aged-out snapshots), with each path's modification age. Mirrors
    * gc's reference walk exactly — including per-child classification
    * of partially referenced dirs — and deletes nothing: the
    * observability surface an operator consults before trusting
    * collection, and the first thing a real lakehouse deployment asks
    * its table format for. */
  def vacuumReport(root: File, snapshotPrefix: String,
      nowMs: Long = System.currentTimeMillis()): Seq[VacuumEntry] = {
    val s = read(root)
    val hist = new File(root, HistoryDir)
    val retained = Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.json"))
      .flatMap(f => scala.util.Try(parse(f)).toOption)
      .flatMap(_.entries.values).toSet
    val current = s.entries.values.toSet
    val referenced = current ++ retained
    def kindOf(rel: String): String =
      if (current.contains(rel)) "current"
      else if (retained.contains(rel)) "retained"
      else "deletable"
    val out = Seq.newBuilder[VacuumEntry]
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(snapshotPrefix))
      .sortBy(_.getName)
      .foreach { d =>
        val name = d.getName
        if (referenced.contains(name))
          out += VacuumEntry(name, kindOf(name), nowMs - d.lastModified())
        else if (referenced.exists(_.startsWith(name + "/")))
          Option(d.listFiles()).getOrElse(Array.empty)
            .filter(_.isDirectory).sortBy(_.getName)
            .foreach { c =>
              val rel = s"$name/${c.getName}"
              out += VacuumEntry(rel, kindOf(rel), nowMs - c.lastModified())
            }
        else out += VacuumEntry(name, "deletable", nowMs - d.lastModified())
      }
    out.result()
  }

  /** Remove snapshot dirs (top-level children of `root` whose name
    * starts with `snapshotPrefix`) that neither the committed state nor
    * any RETAINED history version references — crash orphans and
    * snapshots past the time-travel window. Partially referenced dirs
    * (an epoch some of whose buckets are still current) lose only their
    * unreferenced children. Runs strictly AFTER [[commit]], so a reader
    * holding the old manifest has already been superseded when its
    * files disappear. */
  def gc(root: File, s: State, snapshotPrefix: String): Unit = {
    val hist = new File(root, HistoryDir)
    val retained = Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.json"))
      .flatMap(f => scala.util.Try(parse(f)).toOption)
      .flatMap(_.entries.values)
    val referenced = s.entries.values.toSet ++ retained
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(snapshotPrefix))
      .foreach { d =>
        if (referenced.contains(d.getName)) ()
        else if (referenced.exists(_.startsWith(d.getName + "/"))) {
          Option(d.listFiles()).getOrElse(Array.empty)
            .filter(c => c.isDirectory &&
              !referenced.contains(s"${d.getName}/${c.getName}"))
            .foreach(graft.Fs.deleteRecursively)
        } else graft.Fs.deleteRecursively(d)
      }
  }
}
