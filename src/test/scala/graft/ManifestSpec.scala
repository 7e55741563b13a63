package graft

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SnapshotManifest
import graft.operators.SnapshotManifest.{State, VersionConflict, WriteConflict}

/** Multi-writer optimistic concurrency for the manifest protocol
  * (SnapshotManifest.scala class doc "Multi-writer optimistic
  * concurrency"). Pure file-level tests — the interleavings are staged
  * deterministically, no threads: each scenario is one writer observing
  * a base, a concurrent commit landing, and the first writer's commit
  * attempt. The reference consumer is single-writer by construction
  * (one `mysql_manager` per replica, cdc-mysql/src/consumer/
  * mysql_manager.rs), so this surface is the 100 TB extension: a
  * streaming upsert, a compaction, and a retention change sharing one
  * artifact must serialize without losing commits.
  */
class ManifestSpec extends AnyFunSuite {

  private def tmpRoot(): File =
    Files.createTempDirectory("graft_manifest_occ").toFile

  test("losing writer gets VersionConflict, not silent lost update") {
    val root = tmpRoot()
    SnapshotManifest.commit(root, State(1L, Map("bucket=0" -> "e0/b0")))
    val base = SnapshotManifest.read(root)
    // writer B wins the race for version 2
    SnapshotManifest.commit(root,
      State(base.version + 1, base.entries + ("bucket=2" -> "e2/b2")))
    // writer A attempts the same version from the same base
    val ex = intercept[VersionConflict] {
      SnapshotManifest.commit(root,
        State(base.version + 1, base.entries + ("bucket=1" -> "e1/b1")))
    }
    assert(ex.version == 2L)
    // B's commit is intact — nothing was overwritten
    assert(SnapshotManifest.read(root).entries("bucket=2") == "e2/b2")
    assert(!SnapshotManifest.read(root).entries.contains("bucket=1"))
  }

  test("identical-bytes re-claim is crash-recovery, not a conflict") {
    val root = tmpRoot()
    val s = State(1L, Map("cur" -> "snap_1"))
    SnapshotManifest.commit(root, s)
    // same writer replays its own commit after a crash mid-pointer-swap
    SnapshotManifest.commit(root, s) // must not throw
    assert(SnapshotManifest.read(root) == s)
  }

  test("read reconciles to the highest claim: a crashed pointer swap cannot lose a commit") {
    val root = tmpRoot()
    SnapshotManifest.commit(root, State(1L, Map("cur" -> "snap_1")))
    val pointerBytes =
      Files.readAllBytes(new File(root, "MANIFEST.json").toPath)
    SnapshotManifest.commit(root, State(2L, Map("cur" -> "snap_2")))
    // simulate v2's writer dying between claim and pointer swap (or a
    // racing v1 swap landing last): regress the pointer to v1's bytes
    Files.write(new File(root, "MANIFEST.json").toPath, pointerBytes)
    val got = SnapshotManifest.read(root)
    assert(got.version == 2L && got.entries("cur") == "snap_2",
      "read must reconcile the stale pointer against the v2 claim")
    // time travel still answers below the head
    assert(SnapshotManifest.readAt(root, 1L).exists(_.entries("cur") == "snap_1"))
  }

  test("transact rebases disjoint-entry interleaves automatically") {
    val root = tmpRoot()
    SnapshotManifest.commit(root,
      State(1L, Map("conf/buckets" -> "4", "bucket=0" -> "e0/b0")))
    var interleaved = false
    val fin = SnapshotManifest.transact(root) { base =>
      if (!interleaved) {
        interleaved = true
        // concurrent writer B lands bucket=2 after A read its base
        SnapshotManifest.commit(root,
          State(base.version + 1, base.entries + ("bucket=2" -> "e2/b2")))
      }
      State(base.version + 1, base.entries + ("bucket=1" -> "e1/b1"))
    }
    assert(fin.version == 3L)
    val got = SnapshotManifest.read(root).entries
    assert(got("bucket=1") == "e1/b1" && got("bucket=2") == "e2/b2" &&
      got("bucket=0") == "e0/b0",
      "both writers' buckets must survive the interleave")
  }

  test("transact surfaces WriteConflict when both writers rewrote the same entry") {
    val root = tmpRoot()
    SnapshotManifest.commit(root, State(1L, Map("bucket=0" -> "e0/b0")))
    var interleaved = false
    val ex = intercept[WriteConflict] {
      SnapshotManifest.transact(root) { base =>
        if (!interleaved) {
          interleaved = true
          SnapshotManifest.commit(root,
            State(base.version + 1, base.entries + ("bucket=0" -> "eB/b0")))
        }
        State(base.version + 1, base.entries + ("bucket=0" -> "eA/b0"))
      }
    }
    assert(ex.keys == Set("bucket=0"))
    // the first-landed rewrite is the one that survives
    assert(SnapshotManifest.read(root).entries("bucket=0") == "eB/b0")
  }

  test("equal-value writes to the same key are not conflicts (conf stamping)") {
    val root = tmpRoot()
    var interleaved = false
    val fin = SnapshotManifest.transact(root) { base =>
      if (!interleaved) {
        interleaved = true
        SnapshotManifest.commit(root,
          State(base.version + 1, base.entries +
            ("conf/buckets" -> "16", "bucket=5" -> "e5/b5")))
      }
      State(base.version + 1, base.entries +
        ("conf/buckets" -> "16", "bucket=6" -> "e6/b6"))
    }
    val got = SnapshotManifest.read(root).entries
    assert(fin.version == 2L && got("conf/buckets") == "16" &&
      got("bucket=5") == "e5/b5" && got("bucket=6") == "e6/b6")
  }

  test("a delete racing a rewrite of the same entry is a conflict") {
    val root = tmpRoot()
    SnapshotManifest.commit(root, State(1L, Map("bucket=3" -> "e0/b3")))
    var interleaved = false
    intercept[WriteConflict] {
      SnapshotManifest.transact(root) { base =>
        if (!interleaved) {
          interleaved = true
          SnapshotManifest.commit(root,
            State(base.version + 1, base.entries + ("bucket=3" -> "eB/b3")))
        }
        State(base.version + 1, base.entries - "bucket=3") // our delete
      }
    }
    ()
  }

  test("true thread race: every disjoint-entry writer's commit survives") {
    val root = tmpRoot()
    SnapshotManifest.commit(root, State(1L, Map("conf/buckets" -> "4")))
    val writers = 6
    val commitsPerWriter = 4
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          (0 until commitsPerWriter).foreach { i =>
            SnapshotManifest.transact(root, maxRetries = 64) { base =>
              State(base.version + 1,
                base.entries + (s"bucket=w${w}_$i" -> s"e$w/$i"), base.retain)
            }
            ()
          }
        } catch { case t: Throwable => errors.add(t); () }
      }, s"occ-writer-$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(60000))
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    val fin = SnapshotManifest.read(root)
    assert(fin.version == 1L + writers * commitsPerWriter,
      s"every commit must claim its own version, head=${fin.version}")
    val won = fin.entries.keys.count(_.startsWith("bucket=w"))
    assert(won == writers * commitsPerWriter,
      s"lost update: only $won of ${writers * commitsPerWriter} writer entries survive")
  }

  test("gc grace window: a young unreferenced dir (an in-flight writer's data) survives") {
    val root = tmpRoot()
    val young = new java.io.File(root, "epoch_inflight/data")
    young.mkdirs()
    val old = new java.io.File(root, "epoch_orphan/data")
    old.mkdirs()
    old.setLastModified(System.currentTimeMillis() - 120000)
    new java.io.File(root, "epoch_orphan").setLastModified(
      System.currentTimeMillis() - 120000)
    val s = State(1L, Map("cur" -> "snap_1"))
    SnapshotManifest.commit(root, s)
    SnapshotManifest.gc(root, s, "epoch_", graceMs = 60000)
    assert(young.exists(),
      "an unreferenced dir younger than the grace must survive (it may be a concurrent writer's in-flight data)")
    assert(!new java.io.File(root, "epoch_orphan").exists(),
      "an aged-out orphan past the grace must still collect")
    // zero grace keeps the single-writer contract: next pass collects it
    SnapshotManifest.gc(root, s, "epoch_")
    assert(!young.exists())
  }

  test("retention prune and readAt guard survive the claim-based commit") {
    val root = tmpRoot()
    (1 to 5).foreach { v =>
      SnapshotManifest.commit(root,
        State(v.toLong, Map("cur" -> s"snap_$v"), retain = 2))
    }
    // retain=2 behind head v5 → v3..v5 kept, v1/v2 pruned
    assert(SnapshotManifest.readAt(root, 3L).isDefined)
    assert(SnapshotManifest.readAt(root, 2L).isEmpty)
    assert(SnapshotManifest.readAt(root, 6L).isEmpty,
      "a version above the head must not resolve")
  }

  test("shallow clone: same entries at version 1, divergence and gc " +
      "stay independent of the source") {
    val src = tmpRoot()
    val dataDir = new File(src, "epoch_0/bucket=0")
    dataDir.mkdirs()
    Files.write(new File(dataDir, "part-0").toPath, "rows-v1".getBytes)
    SnapshotManifest.commit(src, State(2L,
      Map("bucket=0" -> "epoch_0/bucket=0", "conf/buckets" -> "1",
        "lastBatch" -> "7"), retain = 1))
    val dst = tmpRoot()
    val cloned = SnapshotManifest.cloneTo(src, dst)
    // fresh history, same entries (conf + watermark carried), shared
    // file content without a copy (hardlink: same inode)
    assert(cloned.version == 1L)
    assert(cloned.entries == SnapshotManifest.read(src).entries)
    val srcFile = new File(src, "epoch_0/bucket=0/part-0")
    val dstFile = new File(dst, "epoch_0/bucket=0/part-0")
    assert(new String(Files.readAllBytes(dstFile.toPath)) == "rows-v1")
    // divergence: the clone rewrites its bucket under a new epoch and
    // its gc collects the superseded SHARED dir from its own root only
    val d2 = new File(dst, "epoch_1/bucket=0")
    d2.mkdirs()
    Files.write(new File(d2, "part-0").toPath, "rows-v2".getBytes)
    val next = State(2L, cloned.entries + ("bucket=0" -> "epoch_1/bucket=0"),
      cloned.retain)
    SnapshotManifest.commit(dst, next)
    // age the clone past retention so the shared epoch_0 leaves its log
    SnapshotManifest.commit(dst, State(3L, next.entries, 0))
    SnapshotManifest.gc(dst, SnapshotManifest.read(dst), "epoch_")
    assert(!dstFile.exists(), "clone gc must collect its own reference")
    assert(srcFile.exists() &&
      new String(Files.readAllBytes(srcFile.toPath)) == "rows-v1",
      "the source's shared inode must survive the clone's gc untouched")
    assert(SnapshotManifest.read(src).entries("bucket=0")
      == "epoch_0/bucket=0")
    // a clone into a non-empty target is refused
    intercept[IllegalArgumentException] {
      SnapshotManifest.cloneTo(src, dst)
    }
    ()
  }
}
