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
    * data directory of the current snapshot. */
  final case class State(version: Long, entries: Map[String, String])

  private val Name = "MANIFEST.json"

  def read(root: File): State = {
    val f = new File(root, Name)
    if (!f.exists()) State(0L, Map.empty)
    else {
      val node = new ObjectMapper().readTree(f)
      val es = scala.collection.mutable.LinkedHashMap.empty[String, String]
      val it = node.get("entries").fields()
      while (it.hasNext) {
        val e = it.next()
        es(e.getKey) = e.getValue.asText()
      }
      State(node.get("version").asLong(), es.toMap)
    }
  }

  /** Publish a snapshot: serialize to a temp name, one atomic move onto
    * the manifest. The data dirs `s.entries` names must already be fully
    * written — this call is the commit point. */
  def commit(root: File, s: State): Unit = {
    root.mkdirs()
    val mapper = new ObjectMapper()
    val node = mapper.createObjectNode()
    node.put("version", s.version)
    val es = node.putObject("entries")
    s.entries.foreach { case (k, v) => es.put(k, v); () }
    val tmp = new File(root, s"_$Name.tmp")
    java.nio.file.Files.write(tmp.toPath, node.toString.getBytes(UTF_8))
    java.nio.file.Files.move(tmp.toPath, new File(root, Name).toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    ()
  }

  /** Remove snapshot dirs (top-level children of `root` whose name
    * starts with `snapshotPrefix`) that the committed state no longer
    * references — crash orphans and superseded snapshots. Partially
    * referenced dirs (an epoch some of whose buckets are still current)
    * lose only their unreferenced children. Runs strictly AFTER
    * [[commit]], so a reader holding the old manifest has already been
    * superseded when its files disappear. */
  def gc(root: File, s: State, snapshotPrefix: String): Unit = {
    val referenced = s.entries.values.toSet
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
