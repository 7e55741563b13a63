package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, DedupIndex, SnapshotManifest}

/** Maintained MinHash signature index: probe ≡ the inline incremental
  * classifier over the union of appended batches, replay idempotence,
  * and compaction invisibility. */
class DedupIndexSpec extends AnyFunSuite {
  import SparkTest._

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val base = Seq(
    (0L, "red fox jumps over the lazy dog tonight"),
    (1L, "red red wine stains the old rug badly"),
    (2L, "quick brown fox and the quick clever hare"),
    (3L, "the dog chased the red fox away again"),
    (4L, "wine and cheese pair with fresh warm bread"))
  // exact copy of 0, near-dup of 2 (one word changed), novel
  private val batch = Seq(
    (100L, "red fox jumps over the lazy dog tonight"),
    (101L, "quick brown fox and the quick clever fox"),
    (102L, "completely unrelated sentence about spark plans here"))

  private def build(segments: Seq[Seq[(Long, String)]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_dedupidx").toString
    segments.zipWithIndex.foreach { case (s, i) =>
      DedupIndex.appendBatch(dir)(df(s), i.toLong)
    }
    dir
  }

  private def probeRows(dir: String) =
    DedupIndex.probe(spark, dir, df(batch), 0.5)
      .orderBy("doc_id").collect().toSeq

  private def inlineRows() =
    Dedup.incremental(df(base), df(batch), "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq

  test("probe ≡ inline incremental classifier; verdict classes non-vacuous") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    val got = probeRows(dir)
    assert(got === inlineRows())
    assert(got.map(_.getString(1)).sorted === Seq("exact", "near", "novel"))
  }

  test("replay of a committed batch is a no-op") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    val before = probeRows(dir)
    val v = SnapshotManifest.read(new java.io.File(dir)).version
    DedupIndex.appendBatch(dir)(df(base.drop(3)), 1L)
    assert(SnapshotManifest.read(new java.io.File(dir)).version === v)
    assert(probeRows(dir) === before)
  }

  test("compaction: one segment after, identical answers, appends continue") {
    val dir = build(Seq(base.take(2), base.slice(2, 4)))
    DedupIndex.compact(spark, dir)
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries.keys.count(_.startsWith("seg/")) === 1)
    // post-compaction append still folds in (watermark carried through)
    DedupIndex.appendBatch(dir)(df(base.drop(4)), 2L)
    assert(probeRows(dir) === inlineRows())
  }

  test("maybeRebucket policy: additive bytes/ partials in the manifest, " +
      "fires at the ×2 bytes-per-bucket threshold, hysteresis after") {
    import graft.operators.SegmentStore
    val dir = build(Seq(base.take(2), base.slice(2, 4)))
    val m0 = SnapshotManifest.read(new java.io.File(dir))
    val byteKeys = m0.entries.keys.filter(_.startsWith("bytes/")).toSeq
    assert(byteKeys.size === 2, "one additive bytes/ partial per segment")
    val bytes = SegmentStore.bytesOf(m0)
    // the partials are the segments' real on-disk sizes
    val walked = SegmentStore.segments(m0).map(seg =>
      SegmentStore.dirBytes(new java.io.File(dir, s"$seg/data"))).sum
    assert(bytes === walked && bytes > 0L)
    // a generous target declines: 8 buckets hold `bytes` comfortably
    assert(!DedupIndex.maybeRebucket(spark, dir,
      targetBytesPerBucket = bytes))
    val before = probeRows(dir)
    // a tight target fires: bytes > 2 × (bytes/32) × 8
    val target = math.max(1L, bytes / 32)
    assert(DedupIndex.maybeRebucket(spark, dir, target))
    val m1 = SnapshotManifest.read(new java.io.File(dir))
    val want = ((bytes + target - 1) / target).toInt
    assert(m1.entries("conf/buckets") === want.toString,
      "rotation target is ceil(bytes/target)")
    assert(m1.entries.keys.count(_.startsWith("bytes/")) === 1,
      "the merge replaces the folded segments' bytes/ partials with its own")
    assert(probeRows(dir) === before, "rotation moves layout, never answers")
    // hysteresis: the rewrite resolved tombstones and re-sharded to
    // ceil(bytes/target), so post-rotation bytes-per-bucket sits a full
    // doubling below the trigger — the SAME target must now decline
    assert(!DedupIndex.maybeRebucket(spark, dir, target))
  }

  test("rebucket rotation: new geometry, identical probe answers, appends continue") {
    val dir = build(Seq(base.take(2), base.slice(2, 4)))
    val before = probeRows(dir)
    DedupIndex.rebucket(spark, dir, 5) // non-divisor of the default 8
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries("conf/buckets") === "5",
      "geometry must switch inside the same pointer swap")
    assert(probeRows(dir) === before)
    // appends after the rotation bucket under the NEW count
    DedupIndex.appendBatch(dir)(df(base.drop(4)), 2L)
    assert(probeRows(dir) === inlineRows())
  }

  private def cdcDf(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "deleted")
  }

  test("CDC apply: update = tombstone + re-add, delete = tombstone; " +
      "probe ≡ inline over the live corpus; compaction resolves") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    // batch 2: doc 0 re-written (its exact copy must demote), doc 2
    // deleted (its near-dup candidate must vanish)
    DedupIndex.applyCdcBatch(dir)(cdcDf(Seq(
      (0L, "an entirely different replacement text body now", false),
      (2L, null, true))), 2L)
    val live = Seq(
      (0L, "an entirely different replacement text body now")) ++
      base.filter(r => r._1 != 0L && r._1 != 2L)
    val want = Dedup.incremental(df(live), df(batch), "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(probeRows(dir) === want)
    // the planted exact copy of doc 0's OLD text is no longer exact
    assert(probeRows(dir).find(_.getLong(0) == 100L)
      .get.getString(1) !== "exact")
    // the live profile reflects the applied state: doc 2 gone, doc 0's
    // replacement counted once — 4 live docs on every doc-keyed kind
    val prof = DedupIndex.profile(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(prof("doc") === 4L)
    assert(prof("size") === 4L)
    assert(prof("band") === 4L)
    // compaction resolves tombstones: answers identical, no tomb rows
    DedupIndex.compact(spark, dir)
    assert(probeRows(dir) === want)
    assert(DedupIndex.profile(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap === prof)
    val m = SnapshotManifest.read(new java.io.File(dir))
    val seg = m.entries.collectFirst {
      case (k, v) if k.startsWith("seg/") => v }.get
    assert(!new java.io.File(dir, s"$seg/data/kind=tomb").exists())
    // a re-add AFTER compaction revives the doc under a fresh stamp
    DedupIndex.applyCdcBatch(dir)(cdcDf(Seq(
      (2L, base(2)._2, false))), 3L)
    val live2 = live :+ (2L -> base(2)._2)
    assert(probeRows(dir) === Dedup.incremental(df(live2), df(batch),
      "doc_id", "text", 0.5).orderBy("doc_id").collect().toSeq)
  }

  test("property: random add/update/delete interleavings ≡ inline " +
      "over the folded live state") {
    val rnd = new scala.util.Random(29)
    val vocab = Vector("red", "fox", "dog", "wine", "quick", "lazy",
      "bread", "cheese", "rug", "naps", "hare", "the", "and", "over")
    def text() = Seq.fill(4 + rnd.nextInt(8))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 0 until 2) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_dedupidx_cdc").toString
      var state = Map.empty[Long, String]
      val nBatches = 3 + rnd.nextInt(2)
      for (b <- 0 until nBatches) {
        val ops = (0 until (2 + rnd.nextInt(3))).map { _ =>
          val id = rnd.nextInt(8).toLong
          if (state.contains(id) && rnd.nextInt(3) == 0)
            (id, null: String, true) // delete
          else (id, text(), false)   // add or full-image update
        }.groupBy(_._1).map(_._2.last).toSeq // one post-state per doc
        ops.foreach { case (id, t, del) =>
          if (del) state -= id else state += (id -> t)
        }
        DedupIndex.applyCdcBatch(dir)(cdcDf(ops), b.toLong)
        if (b == 1) DedupIndex.compact(spark, dir)
      }
      val probeBatch = Seq(
        (500L, state.values.headOption.getOrElse("xx yy zz")),
        (501L, "totally novel text with unique words qqq www eee"))
      val got = DedupIndex.probe(spark, dir, df(probeBatch), 0.5)
        .orderBy("doc_id").collect().toSeq
      val want = Dedup.incremental(df(state.toSeq.sortBy(_._1)),
          df(probeBatch), "doc_id", "text", 0.5)
        .orderBy("doc_id").collect().toSeq
      assert(got === want, s"round $round: live=${state.keys.toSeq.sorted}")
    }
  }

  test("property: delete-heavy churn (deletes ≫ live docs) ≡ inline; " +
      "probe answers from the pruned tombstone read") {
    // a long-running CDC consumer between compactions: most of the
    // corpus has been deleted, tombstones dominate the artifact. The
    // two-phase liveness read must still answer exactly (every matched
    // candidate's bucket carries its complete tombstone history).
    val rnd = new scala.util.Random(41)
    val vocab = Vector("red", "fox", "dog", "wine", "quick", "lazy",
      "bread", "cheese", "rug", "naps", "hare", "the", "and", "over")
    def text() = Seq.fill(5 + rnd.nextInt(6))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dedupidx_churn").toString
    var state = Map.empty[Long, String]
    // batch 0: add 24 docs; batches 1-3: delete 7 each (21 deletes,
    // 3 live at the end — deletes outnumber live docs 7:1)
    val adds = (0L until 24L).map(id => (id, text(), false))
    adds.foreach { case (id, t, _) => state += (id -> t) }
    DedupIndex.applyCdcBatch(dir)(cdcDf(adds), 0L)
    for (b <- 1 to 3) {
      val dels = ((b - 1) * 7 until b * 7)
        .map(id => (id.toLong, null: String, true))
      dels.foreach { case (id, _, _) => state -= id }
      DedupIndex.applyCdcBatch(dir)(cdcDf(dels), b.toLong)
    }
    assert(state.size === 3)
    val probeBatch = Seq(
      (500L, state.values.head),                       // exact vs a live doc
      (501L, adds(0)._2),                              // exact copy of a DELETED doc: must not match
      (502L, "totally novel text with unique words qqq www eee"))
    val got = DedupIndex.probe(spark, dir, df(probeBatch), 0.5)
      .orderBy("doc_id").collect().toSeq
    val want = Dedup.incremental(df(state.toSeq.sortBy(_._1)),
        df(probeBatch), "doc_id", "text", 0.5)
      .orderBy("doc_id").collect().toSeq
    assert(got === want)
    // plan pin (round-9 verdict item 6): the probe's phase-2 tombstone
    // read enumerates ONLY the buckets its resolved candidates hash
    // into — the same SegmentStore.leafPaths call with the candidate
    // bucket list must open strictly fewer leaf dirs than the full
    // 21-doc delete history spread across the default 8 buckets.
    // Candidates here are the two exact-tier matches (deleted doc 0 and
    // the one live copy), so ≤ 2 doc-hash buckets are ever listed.
    import graft.operators.SegmentStore
    val root = new java.io.File(dir)
    val m = SnapshotManifest.read(root)
    val segs = SegmentStore.segments(m)
    def bucketOfId(id: Long): Int = spark.range(1)
      .select(pmod(hash(lit(id)), lit(8))).head.getInt(0)
    val liveExactId = state.find(_._2 == probeBatch.head._2).get._1
    val candBuckets = Seq(bucketOfId(0L), bucketOfId(liveExactId))
      .distinct.sorted
    val prunedTomb = SegmentStore.leafPaths(root, segs, "tomb", candBuckets)
    val fullTomb = SegmentStore.leafPaths(root, segs, "tomb", 0 until 8)
    assert(prunedTomb.nonEmpty && prunedTomb.size < fullTomb.size,
      s"tombstone read must be candidate-bucket-pruned: " +
        s"${prunedTomb.size} vs ${fullTomb.size} leaf dirs")
  }

  test("property: random corpus, random split ≡ inline classifier") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("red", "fox", "dog", "wine", "quick", "lazy",
      "bread", "cheese", "rug", "naps", "hare", "the", "and", "over",
      "spark", "plans")
    for (round <- 0 until 2) {
      val corpus = (0L until (6 + rnd.nextInt(8)).toLong).map { id =>
        (id, Seq.fill(4 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // batch: one exact copy, one tail-perturbed near-dup, one novel
      val b = Seq(
        (500L, corpus(rnd.nextInt(corpus.size))._2),
        (501L, corpus(rnd.nextInt(corpus.size))._2 + " zzz"),
        (502L, "totally novel text with unique words qqq www eee rrr"))
      val cuts = (Seq(0, corpus.size) ++
        Seq.fill(rnd.nextInt(2))(rnd.nextInt(corpus.size + 1)))
        .distinct.sorted
      val segs = cuts.zip(cuts.tail).map { case (x, y) => corpus.slice(x, y) }
        .filter(_.nonEmpty)
      val dir = build(segs.map(_.toSeq))
      val got = DedupIndex.probe(spark, dir, df(b), 0.5)
        .orderBy("doc_id").collect().toSeq
      val want = Dedup.incremental(df(corpus), df(b), "doc_id", "text", 0.5)
        .orderBy("doc_id").collect().toSeq
      assert(got === want, s"round $round: segs=${segs.map(_.size)}")
    }
  }
}
