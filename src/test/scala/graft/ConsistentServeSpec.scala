package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SegmentStore, SnapshotManifest, TextAnalysis, TextIndex}

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
