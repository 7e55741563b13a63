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
