package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SegmentStore, SnapshotManifest, TextAnalysis, TextIndex, VecStore}

/** Consistent-prefix serving (round-9 verdict item 2): a tier ahead of
  * the fusion's common watermark must answer from the RETAINED snapshot
  * that had consumed exactly that prefix — skewed artifacts produce the
  * same answers as aligned ones, and an aged-out prefix fails loudly
  * instead of silently fusing mixed states. */
class ConsistentServeSpec extends AnyFunSuite {
  import SparkTest._

  private def corpus(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val batch0 = Seq(
    (0L, "red fox jumps over the lazy dog"),
    (1L, "red red wine stains the rug"),
    (2L, "quick brown fox and the quick hare"))
  // batch 1 rewrites doc 0 and deletes doc 2 — retrieval at wm=0 must
  // NOT see either change
  private def cdcBatch1 = {
    import spark.implicits._
    Seq((0L, "bread and cheese replace every fox", false),
        (2L, null.asInstanceOf[String], true))
      .toDF("doc_id", "text", "deleted")
  }

  private def queries = {
    import spark.implicits._
    Seq((9L, "red"), (9L, "fox"), (9L, "quick"))
      .toDF("q_id", "term").distinct()
  }

  private def buildSkewed(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_consistent").toString
    TextIndex.applyBatch(dir)(corpus(batch0: _*)
      .withColumn("deleted", lit(false)), 0L)
    TextIndex.applyBatch(dir)(cdcBatch1, 1L)
    dir
  }

  test("stateAtWatermark resolves head for the lagging tier and the " +
      "retained prefix snapshot for the leading one") {
    val dir = buildSkewed()
    val root = new java.io.File(dir)
    assert(SegmentStore.watermarkOf(root) === 1L)
    assert(SegmentStore.stateAtWatermark(root, 1L).get.version ===
      SnapshotManifest.read(root).version)
    val at0 = SegmentStore.stateAtWatermark(root, 0L).get
    assert(at0.entries("lastBatch") === "0")
    assert(at0.version < SnapshotManifest.read(root).version)
  }

  test("retrieveAtWatermark(0) over the skewed artifact ≡ batch BM25 " +
      "over the batch-0 corpus — the applied changelog is invisible") {
    val dir = buildSkewed()
    val got = TextIndex.retrieveAtWatermark(spark, dir, wm = 0L,
        queries, k = 3).get
      .orderBy("q_id", "rnk").collect().toSeq
    val want = TextAnalysis.bm25Retrieve(
        corpus(batch0: _*), queries, "doc_id", "text", k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(got.nonEmpty && got === want)
    // head serving still reflects the applied changelog (doc 2 gone)
    val headDocs = TextIndex.retrieve(spark, dir, queries, k = 3)
      .select(col("doc_id")).distinct().collect().map(_.getLong(0)).toSet
    assert(!headDocs.contains(2L))
    assert(got.map(_.getLong(2)).contains(2L))
  }

  test("moving skew: the common watermark is a per-batch decision — " +
      "a later tier commit advances it, and the retained prefix still " +
      "answers exactly what it answered before the commit") {
    val dir = buildSkewed() // head wm = 1
    // serving decision at commonWm = 0 (the other tier lags at 0)
    val at0Before = TextIndex.retrieveAtWatermark(spark, dir, wm = 0L,
        queries, k = 3).get
      .orderBy("q_id", "rnk").collect().toSeq
    // the lagging tier catches up: this artifact consumes batch 2 —
    // the NEXT serving batch resolves commonWm = 2 and serves the new
    // head, while wm=0 still answers the OLD prefix bit-for-bit (a
    // later commit must never disturb a retained read point)
    TextIndex.applyBatch(dir)(corpus((20L, "fresh red words arrive"))
      .withColumn("deleted", lit(false)), 2L)
    assert(SegmentStore.watermarkOf(new java.io.File(dir)) === 2L)
    val at0After = TextIndex.retrieveAtWatermark(spark, dir, wm = 0L,
        queries, k = 3).get
      .orderBy("q_id", "rnk").collect().toSeq
    assert(at0After === at0Before)
    val at2 = TextIndex.retrieveAtWatermark(spark, dir, wm = 2L,
        queries, k = 3).get
      .orderBy("q_id", "rnk").collect().toSeq
    assert(at2 === TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq)
    assert(at2 !== at0Before, "the advanced prefix must see batch 2")
  }

  test("a cloned index artifact serves identically and diverges " +
      "independently (SnapshotManifest.cloneTo over the segment store)") {
    val dir = buildSkewed()
    val clone = java.nio.file.Files
      .createTempDirectory("graft_consistent_clone").toString
    SnapshotManifest.cloneTo(new java.io.File(dir), new java.io.File(clone))
    val orig = TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(TextIndex.retrieve(spark, clone, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === orig)
    // watermark carried: replaying batch 1 against the clone is a no-op
    val v = SnapshotManifest.read(new java.io.File(clone)).version
    TextIndex.applyBatch(clone)(cdcBatch1, 1L)
    assert(SnapshotManifest.read(new java.io.File(clone)).version === v)
    // the clone takes batch 2; the source must not see it
    TextIndex.applyBatch(clone)(corpus((21L, "clone only red doc"))
      .withColumn("deleted", lit(false)), 2L)
    assert(TextIndex.retrieve(spark, dir, queries, k = 3)
      .orderBy("q_id", "rnk").collect().toSeq === orig)
    assert(TextIndex.retrieve(spark, clone, queries, k = 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      .contains(21L))
  }

  // ---- the rerank tier's own artifact (round-10 verdict item 1) ----

  private def vecBatch(rows: (Long, Seq[Double], Boolean)*) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "deleted")
  }

  private def buildSkewedVecStore(): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_consistent_vec").toString
    VecStore.applyCdcBatch(dir)(vecBatch(
      (0L, Seq(1.0, 0.0, 0.0, 0.0), false),
      (1L, Seq(0.0, 1.0, 0.0, 0.0), false),
      (2L, Seq(0.0, 0.0, 1.0, 0.0), false)), 0L)
    // batch 1 re-embeds vec 0 (direction change) and deletes vec 2 —
    // a rerank at wm=0 must see NEITHER
    VecStore.applyCdcBatch(dir)(vecBatch(
      (0L, Seq(0.0, 0.0, 0.0, 1.0), false),
      (2L, null.asInstanceOf[Seq[Double]], true)), 1L)
    dir
  }

  private def candidates(ids: Long*) = {
    import spark.implicits._
    ids.toDF("vec_id")
  }

  test("VecStore.vectorsAtWatermark(0) serves the batch-0 vectors — " +
      "the head perturbation and delete are invisible at the prefix, " +
      "visible at head") {
    val dir = buildSkewedVecStore()
    assert(SegmentStore.watermarkOf(new java.io.File(dir)) === 1L)
    val at0 = VecStore.vectorsAtWatermark(spark, dir, 0L,
        candidates(0L, 1L, 2L)).get
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(at0.keySet === Set(0L, 1L, 2L))
    assert(at0(0L) === Seq(1.0, 0.0, 0.0, 0.0),
      "wm-0 read must serve the pre-perturbation vector")
    val atHead = VecStore.vectorsAtWatermark(spark, dir, 1L,
        candidates(0L, 1L, 2L)).get
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(atHead.keySet === Set(0L, 1L),
      "the head delete must apply at wm=1")
    assert(atHead(0L) === Seq(0.0, 0.0, 0.0, 1.0))
    assert(atHead(1L) === at0(1L), "untouched vectors identical")
  }

  test("VecStore probe reads only the candidates' buckets and an " +
      "aged-out prefix returns None") {
    val dir = buildSkewedVecStore()
    // only candidate 1 requested: the read is bucket-pruned but still
    // complete for that key (its whole history hashes to one bucket)
    val one = VecStore.vectorsAtWatermark(spark, dir, 1L,
        candidates(1L)).get.collect()
    assert(one.map(_.getLong(0)).toSeq === Seq(1L))
    // push wm=0's snapshot past retention (retain = 2)
    (2L to 4L).foreach { b =>
      VecStore.applyCdcBatch(dir)(vecBatch(
        (10L + b, Seq(1.0, 1.0, 0.0, 0.0), false)), b)
    }
    assert(VecStore.vectorsAtWatermark(spark, dir, 0L,
      candidates(0L)).isEmpty)
    assert(VecStore.vectorsAtWatermark(spark, dir, 3L,
      candidates(0L)).nonEmpty)
  }

  test("VecStore compaction resolves tombstones without moving answers " +
      "and survives a geometry rotation") {
    val dir = buildSkewedVecStore()
    val before = VecStore.vectorsAtWatermark(spark, dir, 1L,
        candidates(0L, 1L, 2L)).get
      .orderBy("vec_id").collect().toSeq
    VecStore.compact(spark, dir, newBuckets = Some(3))
    // the merge commits a fresh head past every batch watermark; head
    // answers must be identical under the new geometry
    val after = VecStore.vectorsAtWatermark(spark, dir,
        SegmentStore.watermarkOf(new java.io.File(dir)),
        candidates(0L, 1L, 2L)).get
      .orderBy("vec_id").collect().toSeq
    assert(after === before)
  }

  test("an aged-out prefix returns None rather than a mixed answer") {
    val dir = buildSkewed()
    // push wm=0's snapshot past the retention window (retain = 2)
    (2L to 4L).foreach { b =>
      TextIndex.applyBatch(dir)(corpus((10L + b, s"filler doc $b words"))
        .withColumn("deleted", lit(false)), b)
    }
    assert(TextIndex.retrieveAtWatermark(spark, dir, wm = 0L,
      queries, k = 3).isEmpty)
    // the still-retained prefix resolves fine
    assert(TextIndex.retrieveAtWatermark(spark, dir, wm = 3L,
      queries, k = 3).nonEmpty)
  }
}
