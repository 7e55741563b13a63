package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property pin for the shared-shingle pair tier: on random small-vocab
  * corpora, [[Dedup.ngramJaccard]] and [[Dedup.containment]] must equal
  * driver-side set arithmetic — including the df-cap trade (capped
  * shingles generate no candidates and leave the intersection, while
  * full sizes stay in the denominator). dfCap = 2 here so the cap BITES
  * on tiny corpora (the production 64 never would). */
class PairDedupPropertySpec extends AnyFunSuite {
  import SparkTest._

  private val DfCap = 2

  private def shingleSet(t: String): Set[String] =
    t.split(" ", -1).toSeq.sliding(3).filter(_.length == 3)
      .map(_.mkString(" ")).toSet

  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** (a_id, b_id) -> (nInterRare, |A|, |B|) for candidate pairs only
    * (pairs sharing at least one RARE shingle). */
  private def refPairs(docs: Seq[(Long, String)])
      : Map[(Long, Long), (Int, Int, Int)] = {
    val sets = docs.map { case (id, t) => id -> shingleSet(t) }.toMap
    val df = sets.values.flatten.toSeq.groupBy(identity)
      .map { case (s, xs) => s -> xs.size }
    val rare = df.filter(_._2 <= DfCap).keySet
    val ids = docs.map(_._1).sorted
    (for {
      a <- ids; b <- ids if a < b
      inter = (sets(a) & sets(b)) & rare
      if inter.nonEmpty
    } yield (a, b) -> (inter.size, sets(a).size, sets(b).size)).toMap
  }

  private val genCorpus: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(3, 9)
    vocab <- Gen.choose(3, 6)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(3, 14)
      ws <- Gen.listOfN(len, Gen.choose(0, vocab - 1).map(i => s"w$i"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("ngramJaccard ≡ reference under a biting df-cap (20 seeded draws)") {
    import spark.implicits._
    (1 to 20).foreach { i =>
      val docs = genCorpus(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (docs.nonEmpty) {
        val got = Dedup.ngramJaccard(docs.toDF("doc_id", "text"),
            "doc_id", "text", 0.0, dfCap = DfCap)
          .select($"a_id", $"b_id", $"jaccard")
          .as[(Long, Long, Double)].collect().toSet
        val want = refPairs(docs).map { case ((a, b), (n, sa, sb)) =>
          (a, b, round6(n.toDouble / (sa + sb - n)))
        }.toSet
        assert(got === want, s"seed $i, docs $docs")
      }
    }
  }

  test("containment ≡ reference, directed by set size (20 seeded draws)") {
    import spark.implicits._
    (30 to 49).foreach { i =>
      val docs = genCorpus(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (docs.nonEmpty) {
        val got = Dedup.containment(docs.toDF("doc_id", "text"),
            "doc_id", "text", 0.0, dfCap = DfCap)
          .select($"contained_id", $"container_id", $"containment")
          .as[(Long, Long, Double)].collect().toSet
        val want = refPairs(docs).map { case ((a, b), (n, sa, sb)) =>
          val (cd, cr) = if (sa <= sb) (a, b) else (b, a)
          (cd, cr, round6(n.toDouble / math.min(sa, sb)))
        }.toSet
        assert(got === want, s"seed $i, docs $docs")
      }
    }
  }
}
