package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property pin for the substring-dedup tier: on random small-vocab
  * corpora (tiny vocabularies force rich accidental repetition —
  * within-doc, cross-doc, overlapping, and back-to-back adjacent
  * windows all arise), [[Dedup.duplicatedSpans]] must equal a
  * driver-side brute-force reference (hash every k-gram, mark starts
  * occurring ≥ 2 times corpus-wide, merge marked windows whose covered
  * ranges touch), and [[Dedup.removeDuplicatedSpans]] must equal the
  * reference mask applied to the reference spans. (Raw ScalaCheck Gen
  * with fixed seeds — the scalatestplus bridge is not in the offline
  * dependency cache.) */
class SpanPropertySpec extends AnyFunSuite {
  import SparkTest._

  private def refSpans(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val counts = scala.collection.mutable.Map[Seq[String], Int]()
    toks.foreach { case (_, t) =>
      if (t.length >= k)
        t.sliding(k).foreach(g => counts(g) = counts.getOrElse(g, 0) + 1)
    }
    toks.flatMap { case (id, t) =>
      if (t.length < k) Nil
      else {
        val marked = t.sliding(k).zipWithIndex
          .collect { case (g, i) if counts(g) >= 2 => i.toLong }.toList
        // merge marked windows: [pos, pos+k) ranges touch when the next
        // start is <= prev start + k
        val islands = marked.foldLeft(List.empty[List[Long]]) {
          case (acc, p) => acc match {
            case cur :: rest if p <= cur.head + k => (p :: cur) :: rest
            case _ => List(p) :: acc
          }
        }
        islands.map { isl =>
          val start = isl.last
          val end = isl.head + k
          (id, start, end, isl.size.toLong)
        }
      }
    }.toSet
  }

  private def refClean(docs: Seq[(Long, String)], k: Int)
      : Set[(Long, Long, Long, String)] = {
    val spans = refSpans(docs, k)
      .groupBy(_._1)
      .map { case (id, ss) => id -> ss.map(s => (s._2, s._3)) }
    docs.map { case (id, text) =>
      val t = text.split(" ", -1).toSeq
      val sp = spans.getOrElse(id, Set.empty)
      val keep = t.zipWithIndex.collect {
        case (w, i) if !sp.exists(s => i >= s._1 && i < s._2) => w
      }
      (id, t.length.toLong, keep.length.toLong, keep.mkString(" "))
    }.toSet
  }

  private val genCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(2, 10)
    vocab <- Gen.choose(2, 5) // tiny vocab => dense accidental repeats
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(1, 30)
      ws <- Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("duplicatedSpans ≡ brute-force reference on random corpora (25 seeded draws)") {
    import spark.implicits._
    val k = 3
    (1 to 25).foreach { i =>
      val docs = genCorpus(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val got = Dedup.duplicatedSpans(df, "doc_id", "text", k)
          .select("doc_id", "span_start", "span_end", "n_grams")
          .as[(Long, Long, Long, Long)].collect().toSet
        assert(got === refSpans(docs, k), s"seed $i, docs $docs")
      }
    }
  }

  test("removeDuplicatedSpans ≡ reference mask on random corpora (10 seeded draws)") {
    import spark.implicits._
    val k = 3
    (30 to 39).foreach { i =>
      val docs = genCorpus(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (docs.nonEmpty) {
        val df = docs.toDF("doc_id", "text")
        val got = Dedup.removeDuplicatedSpans(df, "doc_id", "text", k)
          .select("doc_id", "n_before", "n_after", "text_clean")
          .as[(Long, Long, Long, String)].collect().toSet
        assert(got === refClean(docs, k), s"seed $i, docs $docs")
      }
    }
  }
}
