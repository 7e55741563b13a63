package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SnapshotManifest, TextAnalysis, TextIndex}

/** Incrementally-maintained BM25 index: incremental ≡ one-shot rebuild,
  * replay idempotence, and listing-level bucket pruning on the probe. */
class TextIndexSpec extends AnyFunSuite {
  import SparkTest._

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val batch1 = Seq(
    (0L, "red fox jumps over the lazy dog"),
    (1L, "red red wine stains the rug"),
    (2L, "quick brown fox and the quick hare"))
  private val batch2 = Seq(
    (3L, "the dog chased the red fox"),
    (4L, "wine and cheese pair with bread"),
    (5L, "lazy afternoons and quick naps"))

  private def queries = {
    import spark.implicits._
    Seq((0L, "red"), (0L, "fox"), (4L, "wine"), (4L, "quick"))
      .toDF("q_id", "term").distinct()
  }

  private def buildIndex(): String = {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_textidx").toString
    TextIndex.appendBatch(dir)(corpus(batch1: _*), 0)
    TextIndex.appendBatch(dir)(corpus(batch2: _*), 1)
    dir
  }

  test("incrementally-built index ≡ one-shot batch BM25 retrieval") {
    val dir = buildIndex()
    val incremental = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    val oneShot = TextAnalysis.bm25Retrieve(
        corpus(batch1 ++ batch2: _*), queries, "doc_id", "text", k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(incremental.nonEmpty && incremental === oneShot)
  }

  test("replay of a committed batch is a no-op: no version burned, results unchanged") {
    val dir = buildIndex()
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    val v = SnapshotManifest.read(new java.io.File(dir)).version
    TextIndex.appendBatch(dir)(corpus(batch2: _*), 1) // foreachBatch replay
    assert(SnapshotManifest.read(new java.io.File(dir)).version === v)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
  }

  test("segment merge: one segment after, identical answers, watermark and appends survive") {
    val dir = buildIndex()
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    TextIndex.compact(spark, dir) // v3
    val m = SnapshotManifest.read(new java.io.File(dir))
    val segEntries = m.entries.filter(_._1.startsWith("seg/"))
    assert(segEntries.size === 1 &&
      segEntries.values.head.startsWith("epoch_compact"))
    // additive partials re-aggregated: answers are unchanged
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
    // watermark carried: replaying batch 1 is still a detected no-op
    TextIndex.appendBatch(dir)(corpus(batch2: _*), 1)
    assert(SnapshotManifest.read(new java.io.File(dir)).version === m.version)
    // a NEW batch appends a fresh segment on top of the merged one —
    // and the merged index plus the new segment answers like a one-shot
    // build over all three batches
    val batch3 = Seq((6L, "bread and wine for the quick fox"))
    TextIndex.appendBatch(dir)(corpus(batch3: _*), 2) // v4
    val all = corpus(batch1 ++ batch2 ++ batch3: _*)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq ===
      TextAnalysis.bm25Retrieve(all, queries, "doc_id", "text", k = 3)
        .orderBy("q_id", "rnk").collect().toSeq)
    // once pre-merge versions age out of retention, gc reclaims the
    // merged-away per-batch segments
    TextIndex.appendBatch(dir)(corpus((7L, "naps on the rug")), 3) // v5
    assert(!new java.io.File(dir, "epoch_0").exists() &&
      !new java.io.File(dir, "epoch_1").exists(),
      "aged-out pre-merge segments must be collected")
  }

  test("snapshot isolation: a probe plan built before a concurrent commit answers from its snapshot") {
    val dir = buildIndex()
    // build (but do not collect) the probe plan against the current
    // snapshot — this is the reader a concurrent maintenance loop races
    val planned = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk")
    val expected = TextAnalysis.bm25Retrieve(
        corpus(batch1 ++ batch2: _*), queries, "doc_id", "text", k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    // a writer commits a new segment AFTER the plan snapshot
    TextIndex.appendBatch(dir)(
      corpus((6L, "red red red fox fox wine quick")), 2)
    // the planned reader still answers from ITS snapshot: segment dirs
    // are immutable and the plan's path list + manifest-folded stats
    // were fixed at plan time
    assert(planned.collect().toSeq === expected)
    // a fresh reader sees the new commit
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq ===
      TextAnalysis.bm25Retrieve(
          corpus(batch1 ++ batch2 :+ ((6L, "red red red fox fox wine quick")): _*),
          queries, "doc_id", "text", k = 3)
        .orderBy("q_id", "rnk").collect().toSeq)
  }

  test("crash tolerance: an uncommitted orphan segment dir is invisible and gc'd by the next commit") {
    val dir = buildIndex()
    val root = new java.io.File(dir)
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    // simulate a crash mid-compaction/append: a segment dir exists on
    // disk but no manifest names it
    val orphan = new java.io.File(root, "epoch_compact99/data")
    orphan.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(orphan, "garbage.parquet").toPath,
      Array[Byte](1, 2, 3))
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before,
      "probes list manifest-named segments only — orphans are invisible")
    // the next successful commit collects the orphan (retention-aware gc)
    TextIndex.appendBatch(dir)(corpus((7L, "naps on the rug")), 2)
    assert(!new java.io.File(root, "epoch_compact99").exists(),
      "gc must reclaim crash orphans")
  }

  test("per-segment term blooms: sidecars written, absent terms excluded, missing sidecar degrades") {
    val dir = buildIndex()
    val root = new java.io.File(dir)
    val bf0 = TextIndex.readTermBloom(root, "epoch_0")
    val bf1 = TextIndex.readTermBloom(root, "epoch_1")
    assert(bf0.isDefined && bf1.isDefined, "every commit writes its sidecar")
    // no false negatives: every batch-1 term must hit batch 1's bloom
    assert(batch1.flatMap(_._2.split(" ")).forall(bf0.get.mightContainString))
    // segment skip is real: terms only batch 2 holds miss batch 1's
    // bloom (deterministic — same build ⇒ same bits)
    assert(!bf0.get.mightContainString("cheese") &&
      !bf0.get.mightContainString("chased") &&
      !bf1.get.mightContainString("stains"))
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    // a pre-bloom artifact (sidecar removed) keeps answering — absent
    // means "might contain anything"
    assert(new java.io.File(root, "epoch_0/term_bloom.bin").delete())
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
    // compaction rebuilds the sidecar for the merged segment
    TextIndex.compact(spark, dir)
    val m = SnapshotManifest.read(root)
    val seg = m.entries.collectFirst {
      case (k, v) if k.startsWith("seg/") => v }.get
    assert(TextIndex.readTermBloom(root, seg).isDefined)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
    // knob honesty: a non-default capacity is recorded at creation,
    // wins over later appends' defaults, and answers are unchanged
    // (capacity only moves the false-positive rate)
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_textidx_cap").toString
    TextIndex.appendBatch(dir2, bloomCap = 64L)(corpus(batch1: _*), 0)
    TextIndex.appendBatch(dir2)(corpus(batch2: _*), 1)
    val m2 = SnapshotManifest.read(new java.io.File(dir2))
    assert(m2.entries("conf/bloomCap") === "64")
    assert(TextIndex.retrieve(spark, dir2, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
  }

  test("merge policy: maybeCompact no-ops at the threshold, merges above it, answers invariant") {
    val dir = buildIndex() // 2 segments
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    val v = SnapshotManifest.read(new java.io.File(dir)).version
    assert(!TextIndex.maybeCompact(spark, dir, maxSegments = 2))
    assert(SnapshotManifest.read(new java.io.File(dir)).version === v,
      "a declined merge must not burn a version")
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
    TextIndex.appendBatch(dir)(
      corpus((6L, "bread and wine for the quick fox")), 2) // 3 segments
    assert(TextIndex.maybeCompact(spark, dir, maxSegments = 2))
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries.keys.count(_.startsWith("seg/")) === 1)
    // answers equal a one-shot build over all three batches
    val all = corpus(batch1 ++ batch2 :+ (6L, "bread and wine for the quick fox"): _*)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq ===
      TextAnalysis.bm25Retrieve(all, queries, "doc_id", "text", k = 3)
        .orderBy("q_id", "rnk").collect().toSeq)
  }

  test("maybeRebucket policy: fires from the manifest stats at the ×2 " +
      "hysteresis threshold, rotates to ceil(live/target), never thrashes") {
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_textidx_policy").toString
    def buckets(): String =
      SnapshotManifest.read(new java.io.File(dir)).entries("conf/buckets")
    // target 1 doc/bucket on a 2-bucket index → threshold = 2×1×2 = 4
    TextIndex.appendBatch(dir, buckets = 2)(corpus(batch1: _*), 0) // 3 docs
    assert(!TextIndex.maybeRebucket(spark, dir, targetDocsPerBucket = 1),
      "3 live docs at threshold 4: the policy must decline")
    assert(buckets() === "2")
    TextIndex.appendBatch(dir)(corpus(batch2: _*), 1) // 6 docs > 4
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(TextIndex.maybeRebucket(spark, dir, targetDocsPerBucket = 1))
    assert(buckets() === "6", "rotation target is ceil(live/target)")
    assert(!TextIndex.maybeRebucket(spark, dir, targetDocsPerBucket = 1),
      "hysteresis: 6 live docs on 6 buckets is a full doubling below " +
        "the next trigger (12)")
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before,
      "rotation moves layout, never answers")
    // ingest continues under the rotated geometry; the policy reads the
    // NET live count, so a delete-heavy batch moves it back down
    TextIndex.applyBatch(dir)(
      corpus(batch2.map(_._1).map(id => (id, null: String)): _*)
        .withColumn("deleted", lit(true)), 2)
    assert(!TextIndex.maybeRebucket(spark, dir, targetDocsPerBucket = 1),
      "3 live docs on 6 buckets: far below threshold after deletes")
    assert(buckets() === "6")
  }

  test("rebucket rotation: new geometry, identical answers, old version still serves, appends continue") {
    val dir = buildIndex()
    val before = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    val vOld = SnapshotManifest.read(new java.io.File(dir)).version
    TextIndex.rebucket(spark, dir, 5) // non-divisor of the default 8
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries("conf/buckets") === "5",
      "geometry must switch inside the same pointer swap")
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === before)
    // the prior geometry stays queryable within the retention window —
    // its retained manifest carries its own conf/buckets
    val at = TextIndex.retrieveAt(spark, dir, vOld, queries, k = 3)
    assert(at.isDefined &&
      at.get.orderBy("q_id", "rnk").collect().toSeq === before)
    // appends after the rotation bucket under the NEW count and the
    // index still answers like a one-shot build
    val batch3 = Seq((6L, "bread and wine for the quick fox"))
    TextIndex.appendBatch(dir)(corpus(batch3: _*), 2)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq ===
      TextAnalysis.bm25Retrieve(corpus(batch1 ++ batch2 ++ batch3: _*),
          queries, "doc_id", "text", k = 3)
        .orderBy("q_id", "rnk").collect().toSeq)
  }

  test("property: random corpus, random batch split, random merge point ≡ one-shot build") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "fox", "dog", "wine", "quick", "lazy",
      "bread", "cheese", "rug", "naps", "hare", "the", "and", "over")
    for (round <- 0 until 3) {
      val docs = (0L until (8 + rnd.nextInt(12)).toLong).map { id =>
        (id, Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size)))
          .mkString(" "))
      }
      // partition the corpus into 1..4 contiguous batches
      val cuts = (Seq(0, docs.size) ++
        Seq.fill(rnd.nextInt(3))(rnd.nextInt(docs.size + 1))).distinct.sorted
      val batches = cuts.zip(cuts.tail).map { case (a, b) => docs.slice(a, b) }
        .filter(_.nonEmpty)
      val mergeAfter = rnd.nextInt(batches.size + 1) // 0 = never
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_textidx_prop$round").toString
      batches.zipWithIndex.foreach { case (b, i) =>
        TextIndex.appendBatch(dir)(corpus(b: _*), i.toLong)
        if (mergeAfter == i + 1) TextIndex.compact(spark, dir)
      }
      val qs = {
        import spark.implicits._
        docs.indices.filter(_ % 3 == 0)
          .flatMap(i => docs(i)._2.split(" ").take(2)
            .map(t => (docs(i)._1, t))).distinct
          .toDF("q_id", "term")
      }
      val got = TextIndex.retrieve(spark, dir, qs, k = 4)
        .orderBy("q_id", "rnk").collect().toSeq
      val want = TextAnalysis.bm25Retrieve(corpus(docs: _*), qs,
          "doc_id", "text", k = 4)
        .orderBy("q_id", "rnk").collect().toSeq
      assert(got === want,
        s"round $round: batches=${batches.map(_.size)} merge@$mergeAfter")
    }
  }

  test("property: serving is stateless per query — random query splits union to the one-shot answer") {
    // the invariant every streamServe* loop's epoch union rests on:
    // retrieval depends only on the (immutable) index and the query's
    // own rows, so ANY partition of the query set answers identically
    val rnd = new scala.util.Random(11)
    val dir = buildIndex()
    val all = queries.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val oneShot = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    for (round <- 0 until 3) {
      // split by q_id (a query's terms must travel together — the
      // partitionKey contract of the staged stream)
      val qids = all.map(_._1).distinct
      val groups = qids.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(3)))
        .values.toSeq.filter(_.nonEmpty)
      val unioned = groups.flatMap { g =>
        import spark.implicits._
        val qs = all.filter(p => g.contains(p._1)).toDF("q_id", "term")
        TextIndex.retrieve(spark, dir, qs, k = 3).collect()
      }.sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(unioned === oneShot.sortBy(r => (r.getLong(0), r.getInt(1))),
        s"round $round: splits=${groups.map(_.size)}")
    }
  }

  test("CDC apply: update = tombstone + re-add, delete = tombstone; ≡ rebuild of post-apply corpus") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_textidx_cdc").toString
    // batch 0: adds; batch 1: update doc 1, delete doc 2, add doc 3
    TextIndex.applyBatch(dir)(
      Seq((0L, "red fox jumps over the lazy dog", false),
          (1L, "red red wine stains the rug", false),
          (2L, "quick brown fox and the quick hare", false))
        .toDF("doc_id", "text", "deleted"), 0)
    TextIndex.applyBatch(dir)(
      Seq((1L, "white wine pairs with quick cheese", false),
          (2L, null.asInstanceOf[String], true),
          (3L, "the dog chased the red fox", false))
        .toDF("doc_id", "text", "deleted"), 1)
    val postApply = corpus(
      (0L, "red fox jumps over the lazy dog"),
      (1L, "white wine pairs with quick cheese"),
      (3L, "the dog chased the red fox"))
    val want = TextAnalysis.bm25Retrieve(postApply, queries, "doc_id", "text",
        k = 3).orderBy("q_id", "rnk").collect().toSeq
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === want)
    // compaction resolves the tombstones; answers unchanged; a fresh
    // CDC batch on the compacted index still sees doc 2 as dead
    TextIndex.compact(spark, dir)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === want)
    // re-add of the deleted doc after compaction: must come back live
    TextIndex.applyBatch(dir)(
      Seq((2L, "quick naps on the lazy rug", false))
        .toDF("doc_id", "text", "deleted"), 2)
    val postApply2 = corpus(
      (0L, "red fox jumps over the lazy dog"),
      (1L, "white wine pairs with quick cheese"),
      (2L, "quick naps on the lazy rug"),
      (3L, "the dog chased the red fox"))
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq ===
      TextAnalysis.bm25Retrieve(postApply2, queries, "doc_id", "text", k = 3)
        .orderBy("q_id", "rnk").collect().toSeq)
  }

  test("property: random add/update/delete batches with random merge points ≡ post-apply rebuild") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("red", "fox", "dog", "wine", "quick", "lazy",
      "bread", "cheese", "rug", "naps", "hare", "the", "and", "over")
    def text(): String =
      Seq.fill(3 + rnd.nextInt(9))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 0 until 3) {
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft_textidx_cdcprop$round").toString
      val state = scala.collection.mutable.LinkedHashMap.empty[Long, String]
      val nBatches = 2 + rnd.nextInt(3)
      val mergeAfter = rnd.nextInt(nBatches + 1) // 0 = never
      for (b <- 0 until nBatches) {
        val ops = scala.collection.mutable.LinkedHashMap.empty[Long, (String, Boolean)]
        for (_ <- 0 until (1 + rnd.nextInt(6))) {
          val known = state.keys.toVector
          val op = rnd.nextInt(3)
          if (op == 0 || known.isEmpty) { // add
            val id = (round * 1000 + b * 100 + ops.size).toLong
            ops(id) = (text(), false)
          } else if (op == 1) { // update a live doc
            val id = known(rnd.nextInt(known.size))
            ops(id) = (text(), false)
          } else { // delete a live doc
            val id = known(rnd.nextInt(known.size))
            ops(id) = (null, true)
          }
        }
        TextIndex.applyBatch(dir)(
          ops.toSeq.map { case (id, (t, d)) => (id, t, d) }
            .toDF("doc_id", "text", "deleted"), b.toLong)
        ops.foreach { case (id, (t, d)) =>
          if (d) state.remove(id) else state(id) = t
        }
        if (mergeAfter == b + 1) TextIndex.compact(spark, dir)
      }
      val docs = state.toSeq.sortBy(_._1)
      val qs = docs.indices.filter(_ % 2 == 0)
        .flatMap(i => docs(i)._2.split(" ").take(2).map(t => (docs(i)._1, t)))
        .distinct.toDF("q_id", "term")
      val got = TextIndex.retrieve(spark, dir, qs, k = 4)
        .orderBy("q_id", "rnk").collect().toSeq
      val want = TextAnalysis.bm25Retrieve(corpus(docs: _*), qs,
          "doc_id", "text", k = 4)
        .orderBy("q_id", "rnk").collect().toSeq
      assert(got === want, s"round $round: merge@$mergeAfter")
    }
  }

  test("time-travel retrieval: pre-delete snapshot queryable, compaction invisible, aged-out None") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_textidx_tt").toString
    TextIndex.applyBatch(dir)(
      Seq((0L, "red fox jumps over the lazy dog", false),
          (1L, "red red wine stains the rug", false))
        .toDF("doc_id", "text", "deleted"), 0)
    val v1 = SnapshotManifest.read(new java.io.File(dir)).version
    TextIndex.applyBatch(dir)(
      Seq((1L, null.asInstanceOf[String], true))
        .toDF("doc_id", "text", "deleted"), 1)
    val cur = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    // the pre-delete snapshot still answers with doc 1 present
    val old = TextIndex.retrieveAt(spark, dir, v1, queries, k = 3)
    assert(old.isDefined)
    val oldRows = old.get.orderBy("q_id", "rnk").collect().toSeq
    assert(oldRows.exists(_.getLong(2) == 1L) && !cur.exists(_.getLong(2) == 1L),
      "pre-delete version must still rank the deleted doc; current must not")
    // compaction changes layout, not any answer — current or retained
    val v2 = SnapshotManifest.read(new java.io.File(dir)).version
    TextIndex.compact(spark, dir)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === cur)
    assert(TextIndex.retrieveAt(spark, dir, v2, queries, k = 3)
      .get.orderBy("q_id", "rnk").collect().toSeq === cur)
    // beyond the retention window: None, not a broken read
    assert(TextIndex.retrieveAt(spark, dir, v1 - 1, queries, k = 3).isEmpty)
  }

  test("attribute-filtered retrieval: attrs flow through CDC maintenance and compaction") {
    import java.nio.file.Files
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_textidx_attr").toString
    // lang rides the postings; an update may CHANGE a doc's attribute
    TextIndex.applyBatch(dir, attrs = Seq("lang"))(
      Seq((0L, "red fox jumps over the lazy dog", false, "en"),
          (1L, "red red wine stains the rug", false, "fr"),
          (2L, "quick brown fox and the quick hare", false, "en"))
        .toDF("doc_id", "text", "deleted", "lang"), 0)
    TextIndex.applyBatch(dir)(
      Seq((1L, "white wine pairs with quick cheese", false, "en"),
          (2L, null.asInstanceOf[String], true, null.asInstanceOf[String]),
          (3L, "the dog chased the red fox", false, "fr"))
        .toDF("doc_id", "text", "deleted", "lang"), 1)
    val postApply = corpus(
      (0L, "red fox jumps over the lazy dog"),
      (1L, "white wine pairs with quick cheese"),
      (3L, "the dog chased the red fox"))
    val allowed = Seq(0L, 1L).toDF("doc_id") // lang = en, post-apply
    val want = TextAnalysis.bm25Retrieve(postApply, queries, "doc_id",
        "text", k = 3, allowed = Some(allowed))
      .orderBy("q_id", "rnk").collect().toSeq
    def got() = TextIndex.retrieve(spark, dir, queries, k = 3,
        filter = Some(col("lang") === "en"))
      .orderBy("q_id", "rnk").collect().toSeq
    assert(got() === want,
      "filtered index retrieval must equal the batch tier over the " +
        "post-apply corpus with the same allowed set")
    TextIndex.compact(spark, dir)
    assert(got() === want, "compaction must preserve attribute columns")
  }

  test("non-default bucket count: manifest-recorded, equivalence and compaction hold") {
    import java.nio.file.Files
    // the bucket count is a creation-time knob recorded in the manifest;
    // run the full append → compact → append equivalence under a
    // NON-default count so the scaling knob is executed, not asserted
    val dir = Files.createTempDirectory("graft_textidx_b3").toString
    TextIndex.appendBatch(dir, buckets = 3)(corpus(batch1: _*), 0)
    TextIndex.compact(spark, dir) // single segment: no-op
    TextIndex.appendBatch(dir, buckets = 99 /* ignored: manifest wins */)(
      corpus(batch2: _*), 1)
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries.get("conf/buckets") === Some("3"))
    val oneShot = TextAnalysis.bm25Retrieve(
        corpus(batch1 ++ batch2: _*), queries, "doc_id", "text", k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === oneShot)
    TextIndex.compact(spark, dir)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === oneShot)
    // the merged segment was bucketed by the index's own count
    val mC = SnapshotManifest.read(new java.io.File(dir))
    val seg = mC.entries.collect { case (k, v) if k.startsWith("seg/") => v }.head
    val bucketDirs = new java.io.File(dir, s"$seg/data/kind=post").listFiles()
      .filter(_.getName.startsWith("bucket=")).map(_.getName).toSet
    assert(bucketDirs.forall(_.stripPrefix("bucket=").toInt < 3))
  }

  test("probe reads ONLY the query terms' buckets (listing-level pruning)") {
    val dir = buildIndex()
    val expected = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    // the buckets the probe may touch, by the index's own hash
    val matched = queries
      .select(pmod(hash(col("term")), lit(TextIndex.Buckets)).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(matched.size < TextIndex.Buckets,
      "fixture must leave at least one unmatched bucket")
    // poison every UNMATCHED bucket dir: any scan that lists one dies
    for {
      seg <- Seq("epoch_0", "epoch_1")
      b <- 0 until TextIndex.Buckets if !matched.contains(b)
      d = new java.io.File(dir, s"$seg/data/kind=post/bucket=$b") if d.exists()
    } {
      d.listFiles().foreach(_.delete())
      java.nio.file.Files.write(new java.io.File(d, "part-poison.parquet").toPath,
        "not a parquet file".getBytes)
    }
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === expected)
  }
}
