package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SnapshotManifest, SubstringIndex}

/** Maintained k-gram index: probe ≡ the inline incremental span pass
  * over the union of appended batches, replay idempotence, compaction
  * invisibility, and the CDC tombstone fold. k = 3 throughout so small
  * fixtures exercise every merge shape. */
class SubstringIndexSpec extends AnyFunSuite {
  import SparkTest._

  private val K = 3

  private def df(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def cdcDf(rows: Seq[(Long, String, Boolean)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "deleted")
  }

  private val base = Seq(
    (0L, "red fox jumps over the lazy dog tonight"),
    (1L, "red red wine stains the old rug badly"),
    (2L, "quick brown fox and the quick clever hare"),
    (3L, "the dog chased the red fox away again"),
    (4L, "wine and cheese pair with fresh warm bread"))
  // full copy of 0, a run shared with 2, novel
  private val batch = Seq(
    (100L, "red fox jumps over the lazy dog tonight"),
    (101L, "zz quick brown fox and yy xx ww"),
    (102L, "completely unrelated sentence about spark plans here"))

  private def build(segments: Seq[Seq[(Long, String)]]): String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ssidx").toString
    segments.zipWithIndex.foreach { case (s, i) =>
      SubstringIndex.appendBatch(dir, k = K)(df(s), i.toLong)
    }
    dir
  }

  private def probeRows(dir: String) =
    SubstringIndex.probe(spark, dir, df(batch))
      .orderBy("doc_id", "span_start").collect().toSeq

  private def inlineRows(corpus: Seq[(Long, String)]) =
    Dedup.incrementalSpans(df(corpus), df(batch), "doc_id", "text", K)
      .orderBy("doc_id", "span_start").collect().toSeq

  test("probe ≡ inline incremental spans; copy and shared-run both hit") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    val got = probeRows(dir)
    assert(got === inlineRows(base))
    val byDoc = got.groupBy(_.getLong(0))
    assert(byDoc.contains(100L) && byDoc.contains(101L)) // non-vacuous
    assert(!byDoc.contains(102L)) // novel stays silent
  }

  test("replay of a committed batch is a no-op") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    val before = probeRows(dir)
    val v = SnapshotManifest.read(new java.io.File(dir)).version
    SubstringIndex.appendBatch(dir, k = K)(df(base.drop(3)), 1L)
    assert(SnapshotManifest.read(new java.io.File(dir)).version === v)
    assert(probeRows(dir) === before)
  }

  test("compaction: one segment after, identical answers, appends continue") {
    val dir = build(Seq(base.take(2), base.slice(2, 4)))
    SubstringIndex.compact(spark, dir)
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries.keys.count(_.startsWith("seg/")) === 1)
    SubstringIndex.appendBatch(dir, k = K)(df(base.drop(4)), 2L)
    assert(probeRows(dir) === inlineRows(base))
  }

  test("CDC apply: update re-counts, delete vanishes; compaction resolves; revive works") {
    val dir = build(Seq(base.take(3), base.drop(3)))
    // doc 0 re-written: batch doc 100's full-doc span must shrink to
    // nothing (no other doc shares its grams); doc 2 deleted: doc 101's
    // shared-run span must vanish
    SubstringIndex.applyCdcBatch(dir, k = K)(cdcDf(Seq(
      (0L, "an entirely different replacement text body now", false),
      (2L, null, true))), 2L)
    val live = Seq(
      (0L, "an entirely different replacement text body now")) ++
      base.filter(r => r._1 != 0L && r._1 != 2L)
    assert(probeRows(dir) === inlineRows(live))
    assert(!probeRows(dir).exists(_.getLong(0) == 101L))
    // compaction resolves tombstones, answers unchanged
    SubstringIndex.compact(spark, dir)
    assert(probeRows(dir) === inlineRows(live))
    val m = SnapshotManifest.read(new java.io.File(dir))
    val seg = m.entries.collectFirst {
      case (k, v) if k.startsWith("seg/") => v }.get
    assert(!new java.io.File(dir, s"$seg/data/kind=tomb").exists())
    // revive doc 2 under a fresh stamp: the shared-run span returns
    SubstringIndex.applyCdcBatch(dir, k = K)(cdcDf(Seq(
      (2L, base(2)._2, false))), 3L)
    val live2 = live :+ (2L -> base(2)._2)
    assert(probeRows(dir) === inlineRows(live2))
    assert(probeRows(dir).exists(_.getLong(0) == 101L))
  }

  test("rebucket rotation: new geometry, identical probe answers, appends continue") {
    val dir = build(Seq(base.take(2), base.slice(2, 4)))
    val before = probeRows(dir)
    SubstringIndex.rebucket(spark, dir, 5) // non-divisor of the default 8
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries("conf/buckets") === "5",
      "geometry must switch inside the same pointer swap")
    assert(probeRows(dir) === before)
    // appends after the rotation bucket under the NEW count
    SubstringIndex.appendBatch(dir, k = K)(df(base.drop(4)), 2L)
    assert(probeRows(dir) === inlineRows(base))
  }

  test("property: random corpora, random splits and merge points ≡ inline") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("w0", "w1", "w2", "w3", "w4")
    def text() = Seq.fill(3 + rnd.nextInt(10))(
      vocab(rnd.nextInt(vocab.size))).mkString(" ")
    for (round <- 0 until 3) {
      val corpus = (0L until (4 + rnd.nextInt(5)).toLong)
        .map(i => i -> text())
      val split = 1 + rnd.nextInt(corpus.size - 1)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_ssidx_prop").toString
      // non-default geometry on odd rounds: the bucket knob runs, not
      // just asserts (the creation call pins it in the manifest; the
      // second append's mismatched argument must be ignored)
      val nb = if (round % 2 == 1) 3 else SubstringIndex.Buckets
      SubstringIndex.appendBatch(dir, buckets = nb, k = K)(
        df(corpus.take(split)), 0L)
      if (rnd.nextBoolean()) SubstringIndex.compact(spark, dir)
      SubstringIndex.appendBatch(dir, buckets = 99, k = K)(
        df(corpus.drop(split)), 1L)
      val got = probeRows(dir)
      assert(got === inlineRows(corpus), s"round $round, corpus $corpus")
    }
  }
}
