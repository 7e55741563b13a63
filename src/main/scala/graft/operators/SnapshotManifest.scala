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
  *
  * ==Multi-writer optimistic concurrency==
  * At 100 TB one artifact has many writers — the streaming upsert, a
  * compaction job, a retention change, a backfill — and last-writer-wins
  * on the pointer silently DROPS the loser's commit (its buckets revert
  * to the base the winner read). The protocol therefore makes the
  * version claim the commit point, exactly the lakehouse-log contract
  * (Delta's `_delta_log/N.json` put-if-absent): [[commit]] publishes
  * `_history/v<N>.json` via an atomic create-exclusive (a hardlink here;
  * a conditional PUT on an object store) and throws [[VersionConflict]]
  * if version N is already claimed by someone else. The `MANIFEST.json`
  * pointer is demoted to a read cache: [[read]] reconciles it against
  * the highest claim, so a racing or crashed pointer swap can neither
  * lose nor roll back a claimed commit. [[transact]] is the writer-side
  * retry loop: re-derive the update from the new head and retry when the
  * concurrent commits touched DISJOINT entries (two batches upserting
  * different buckets serialize automatically), surface [[WriteConflict]]
  * when they collide on an entry with different values (two writers
  * rewriting the same bucket from different bases — no merge is sound).
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

  /** Current committed state: the pointer file, reconciled against the
    * highest claimed version in `_history/`. The claim is the commit
    * point (see the class doc), so a claim above the pointer means a
    * writer committed but crashed (or lost a race) before its pointer
    * swap — that commit is real and must win. The listing is of a dir
    * holding O(retain) small files; on an object store this is the one
    * bounded LIST every lakehouse log read does. */
  def read(root: File): State = {
    val f = new File(root, Name)
    val pointed = if (f.exists()) Some(parse(f)) else None
    val hist = new File(root, HistoryDir)
    val claims = Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("v\\d+\\.json") && f.length() > 0)
    val maxClaim =
      if (claims.isEmpty) None
      else Some(claims.maxBy(
        _.getName.stripPrefix("v").stripSuffix(".json").toLong))
    (pointed, maxClaim) match {
      case (Some(p), Some(c))
          if c.getName.stripPrefix("v").stripSuffix(".json").toLong
            > p.version => parse(c)
      case (Some(p), _) => p
      case (None, Some(c)) => parse(c)
      case (None, None) => State(0L, Map.empty)
    }
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

  /** Version `version` is already claimed in `_history/` with DIFFERENT
    * content — a concurrent writer won the race for this version. The
    * caller's data dirs are untouched orphans (next gc collects them);
    * retry against the new head via [[transact]]. */
  final case class VersionConflict(root: String, version: Long)
    extends RuntimeException(
      s"manifest version $version already committed under $root")

  /** A [[transact]] retry found the concurrent commits changed the SAME
    * entry keys to different values — bucket-level write-write conflict,
    * no automatic merge is sound. */
  final case class WriteConflict(root: String, keys: Set[String])
    extends RuntimeException(
      s"concurrent commits under $root both rewrote: " +
        keys.toSeq.sorted.mkString(", "))

  /** Publish a snapshot. The data dirs `s.entries` names must already be
    * fully written — this call is the commit point, and the commit point
    * is the atomic CREATE-EXCLUSIVE of `_history/v<version>.json`
    * (hardlink of a fully written temp, so a concurrent [[read]] can
    * never observe a half-written claim; on an object store this is the
    * conditional PUT of the log entry). If the version is already
    * claimed: identical bytes mean OUR OWN earlier commit crashed before
    * the pointer swap and this is the recovery replay — a success;
    * different bytes mean another writer won → [[VersionConflict]].
    * The pointer swap that follows is only a read cache refresh, and the
    * history prune runs last so a crash anywhere here never shrinks a
    * committed version's retention window. */
  def commit(root: File, s: State): Unit = {
    root.mkdirs()
    val bytes = serialize(s)
    val hist = new File(root, HistoryDir)
    hist.mkdirs()
    val claim = new File(hist, s"v${s.version}.json")
    val claimTmp = File.createTempFile(s"_v${s.version}", ".tmp", hist)
    java.nio.file.Files.write(claimTmp.toPath, bytes)
    try {
      java.nio.file.Files.createLink(claim.toPath, claimTmp.toPath)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        val existing = java.nio.file.Files.readAllBytes(claim.toPath)
        if (!java.util.Arrays.equals(existing, bytes))
          throw VersionConflict(root.toString, s.version)
    } finally {
      claimTmp.delete()
      ()
    }
    // pointer refresh — a cache, not the commit ([[read]] reconciles),
    // so losing a swap race to a higher version is harmless. Unique temp
    // names keep concurrent writers from moving each other's bytes.
    val tmp = File.createTempFile(s"_$Name", ".tmp", root)
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, new File(root, Name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // prune AFTER the pointer swap: a crash before this point must not
    // shrink the still-committed older version's retention window (a
    // deleted archive is not a harmless orphan; an extra one is).
    // Pruning TRUNCATES to a zero-byte tombstone rather than deleting:
    // a deleted claim would re-open its version slot, and a writer
    // stalled since before that version was claimed could then
    // create-exclusive it "successfully" — committing into the past,
    // invisible to every reader (observed as a lost update in the
    // ManifestSpec thread race before this guard). The tombstone keeps
    // the slot occupied forever, so the zombie claim collides and
    // retries from the real head. One empty file per aged-out version
    // is the cost — the lakehouse-log equivalent is a checkpoint plus
    // a monotone log, same monotonicity contract.
    Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("v\\d+\\.json") && f.length() > 0 &&
        f.getName.stripPrefix("v").stripSuffix(".json").toLong
          < s.version - s.retain)
      .foreach(f => java.nio.file.Files.write(f.toPath,
        Array.emptyByteArray,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING))
    // a writer that crashed between claimTmp and createLink leaves its
    // temp file behind with no finally to delete it; neither the prune
    // above (v\d+.json only) nor [[gc]] (data dirs only) would ever
    // collect it, so stale *.tmp litter in _history/ grows unbounded
    // under crashy writers. A LIVE writer's tmp exists for milliseconds
    // between its write and the link, so an age threshold far above any
    // single manifest write is safe to reap.
    Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".tmp") &&
        f.lastModified() < System.currentTimeMillis() - TmpReapMs)
      .foreach(_.delete())
    // same litter class at the ROOT level: a writer hard-killed between
    // the pointer-temp's createTempFile and its atomic move (just above)
    // leaves `_MANIFEST.json*.tmp` beside the pointer, which no other
    // pass touches (the prune scans `_history/`, gc scans data dirs) —
    // reap it under the identical age threshold (round-9 advice). Only
    // FILES ending in .tmp are candidates; data dirs are never files.
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".tmp") &&
        f.lastModified() < System.currentTimeMillis() - TmpReapMs)
      .foreach(_.delete())
    ()
  }

  /** Age beyond which a crashed writer's `.tmp` litter in `_history/`
    * is reaped by the next [[commit]]'s prune pass (a manifest write is
    * bytes-sized; ten minutes is orders of magnitude above any live
    * window). */
  private val TmpReapMs = 600000L

  /** Entry keys whose value differs between two snapshots (adds,
    * changes, AND deletes — a deleted key is a write). */
  def diffKeys(a: Map[String, String], b: Map[String, String]): Set[String] =
    (a.keySet ++ b.keySet).filter(k => a.get(k) != b.get(k))

  /** Optimistic-concurrency commit loop: derive the next state from the
    * current head with `f` (which must bump `version` by exactly 1),
    * attempt the commit, and on [[VersionConflict]] re-read the head and
    * RE-DERIVE — but only when the interleaved commits are mergeable:
    * if a key this update writes was also changed by the concurrent
    * commits TO A DIFFERENT VALUE, both writers rewrote the same bucket
    * from different bases and the only sound outcome is
    * [[WriteConflict]] (equal values — e.g. both stamping the same
    * `conf/buckets` — are not conflicts). Disjoint-entry writers (the
    * common case: different buckets, different stats keys) serialize
    * automatically, each retry costing one manifest read + one claim
    * attempt, never a data rewrite — `f` re-derives entries, it must not
    * re-run the data job (the data dirs are immutable and already
    * written).
    *
    * `mergeKeys`: entry keys EXCLUDED from clash detection because `f`
    * re-derives them from the head by a commutative merge (the replica's
    * monotone `lastBatch` watermark takes a max on rebase) — without
    * this, two batches upserting DISJOINT buckets would still collide on
    * the watermark they both stamp and get a spurious [[WriteConflict]],
    * contradicting the disjoint-writers-serialize contract above. Only
    * keys whose re-derivation genuinely commutes belong here. */
  def transact(root: File, maxRetries: Int = 5,
      mergeKeys: Set[String] = Set.empty)(f: State => State): State = {
    var base = read(root)
    var attempts = 0
    var done: Option[State] = None
    while (done.isEmpty) {
      val next = f(base)
      require(next.version == base.version + 1,
        s"transact update must bump version by exactly 1 " +
          s"(base ${base.version} -> ${next.version})")
      try {
        commit(root, next)
        done = Some(next)
      } catch {
        case VersionConflict(_, _) =>
          attempts += 1
          if (attempts > maxRetries)
            throw WriteConflict(root.toString,
              Set(s"<retries exhausted after $maxRetries>"))
          // bounded exponential backoff: under a contending writer herd
          // an immediate retry can lose every race (all writers re-read
          // and re-claim in lockstep); a short growing pause breaks the
          // convoy, the standard OCC loop discipline
          Thread.sleep(math.min(1L << math.min(attempts, 6), 50L))
          val head = read(root)
          val ours = diffKeys(base.entries, next.entries)
          val theirs = diffKeys(base.entries, head.entries)
          val clash = ours.intersect(theirs)
            .filter(k => next.entries.get(k) != head.entries.get(k))
            .diff(mergeKeys)
          if (clash.nonEmpty) throw WriteConflict(root.toString, clash)
          if (next.retain != base.retain && head.retain != base.retain &&
              next.retain != head.retain)
            throw WriteConflict(root.toString, Set("<retain>"))
          base = head
      }
    }
    done.get
  }

  /** SHALLOW CLONE — the lakehouse table-clone verb (Delta/Iceberg's
    * zero-copy clone) on the manifest protocol: materialize the CURRENT
    * snapshot of `src` as an independent table at `dst` by HARDLINKING
    * every manifest-named data path's files (no data copied — on an
    * object store this is the same manifest-only operation with shared
    * object keys) and committing a fresh version-1 manifest carrying
    * the same entries (conf geometry, stats partials, and the
    * `lastBatch` watermark included, so a stream resumed against the
    * clone replays nothing). Safe BECAUSE data files are immutable by
    * protocol: writes on either side stage new files under their own
    * root, and either side's gc unlinks only its own root's references
    * — the shared inodes survive until both sides drop them. The clone
    * starts its own history (dev branches, reproducible-experiment
    * pinning, blast-radius-free migration tests — the standard clone
    * use set). Entry values that name no existing path (scalar conf /
    * stats entries) carry over verbatim. */
  def cloneTo(src: File, dst: File): State = {
    val m = read(src)
    require(m.version > 0L, s"nothing committed to clone at $src")
    require(read(dst).version == 0L, s"clone target $dst is not empty")
    m.entries.values.toSet[String]
      .map(rel => new File(src, rel)).filter(_.exists())
      .foreach(f => linkTree(f, new File(dst,
        src.toPath.relativize(f.toPath).toString)))
    val s = State(1L, m.entries, m.retain)
    commit(dst, s)
    s
  }

  private def linkTree(from: File, to: File): Unit =
    if (from.isDirectory) {
      to.mkdirs()
      Option(from.listFiles()).getOrElse(Array.empty)
        .foreach(c => linkTree(c, new File(to, c.getName)))
    } else {
      to.getParentFile.mkdirs()
      try { java.nio.file.Files.createLink(to.toPath, from.toPath); () }
      catch {
        // a cloneTo retried after a crash mid-link finds some targets
        // already linked: data files are immutable by protocol, so an
        // existing target IS the link — skip it instead of degrading
        // every already-linked file to a full copy (round-10 advice)
        case _: java.nio.file.FileAlreadyExistsException => ()
        // genuinely-unsupported linking (cross-device EXDEV, a
        // filesystem without hardlinks): fall back to a real copy.
        // Anything else (permissions, disk full) propagates — masking
        // it behind a copy hid real failures.
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
          java.nio.file.Files.copy(from.toPath, to.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
      }
    }

  /** Time travel: the committed snapshot at `version`, if still within
    * the retention window. */
  def readAt(root: File, version: Long): Option[State] = {
    val f = new File(new File(root, HistoryDir), s"v$version.json")
    // an archive is written BEFORE its pointer swap; only trust archives
    // at or below the committed current version (zero-byte = pruned
    // tombstone, not a readable version)
    if (f.exists() && f.length() > 0 && version <= read(root).version)
      Some(parse(f))
    else None
  }

  /** One row of [[history]]: a committed version still inside the
    * retention window, with its entry-level delta against the previous
    * RETAINED version (the oldest retained row reports its full entry
    * set as `added` — its predecessor is out of the window). */
  final case class HistoryRow(version: Long, nEntries: Int,
      added: Int, removed: Int, changed: Int, retain: Int)

  /** The artifact's commit log as data — the DESCRIBE HISTORY surface:
    * one row per retained version, ascending, each with the number of
    * manifest entries added/removed/changed relative to the previous
    * retained version. Reads only `_history/` (O(retain) small files);
    * nothing here opens a data dir. */
  def history(root: File): Seq[HistoryRow] = {
    val hist = new File(root, HistoryDir)
    val versions = Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("v\\d+\\.json") && f.length() > 0)
      .map(f => (f.getName.stripPrefix("v").stripSuffix(".json").toLong, f))
      .sortBy(_._1)
    versions.foldLeft((Map.empty[String, String], Seq.empty[HistoryRow])) {
      case ((prev, acc), (v, f)) =>
        val s = parse(f)
        val added = s.entries.keySet.diff(prev.keySet).size
        val removed = prev.keySet.diff(s.entries.keySet).size
        val changed = s.entries.count { case (k, x) =>
          prev.get(k).exists(_ != x)
        }
        (s.entries, acc :+ HistoryRow(v, s.entries.size,
          added, removed, changed, s.retain))
    }._2
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
  /** `graceMs`: an UNREFERENCED dir younger than this survives the
    * pass. Under a single writer 0 is safe (an unreferenced dir can
    * only be this writer's own crash orphan). Under CONCURRENT writers
    * an in-flight peer's epoch dir is unreferenced between its data
    * write and its claim — a zero-grace gc racing that window deletes
    * data a commit is about to reference. Multi-writer deployments set
    * graceMs above their longest data write (the VACUUM-retention
    * discipline every lakehouse format imposes for the same reason);
    * the single-writer streams and tests here keep 0 so crash orphans
    * collect on the very next commit. */
  def gc(root: File, s: State, snapshotPrefix: String,
      graceMs: Long = 0L): Unit = {
    val hist = new File(root, HistoryDir)
    val retained = Option(hist.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("v\\d+\\.json"))
      .flatMap(f => scala.util.Try(parse(f)).toOption)
      .flatMap(_.entries.values)
    val referenced = s.entries.values.toSet ++ retained
    val cutoff = System.currentTimeMillis() - graceMs
    Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(snapshotPrefix) &&
        d.lastModified() <= cutoff)
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
