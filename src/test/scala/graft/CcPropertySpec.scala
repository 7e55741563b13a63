package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Property pin for connectedComponents (hash-to-min with the fused
  * min-neighbor initialization): on random pair graphs the labels must
  * equal the min-reachable-id from a driver-side union-find — for every
  * topology, not just the shallow near-dup clusters the oracle corpus
  * produces (paths, cycles, stars, disjoint unions all get generated).
  * (Raw ScalaCheck Gen with fixed seeds — the scalatestplus bridge is
  * not in the offline dependency cache.) */
class CcPropertySpec extends AnyFunSuite {
  import SparkTest._

  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .map(x => x -> find(x)).toMap
  }

  private val genGraph: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 24)
    nEdges <- Gen.choose(1, 40)
    edges <- Gen.listOfN(nEdges, for {
      a <- Gen.choose(0, n - 1)
      b <- Gen.choose(0, n - 1)
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield edges.filter(e => e._1 != e._2).distinct

  test("CC labels = min reachable id, on random graphs (20 seeded draws)") {
    import spark.implicits._
    (1 to 20).foreach { i =>
      val pairs = genGraph(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(Nil)
      if (pairs.nonEmpty) {
        val got = Dedup.connectedComponents(pairs.toDF("a_id", "b_id"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === unionFind(pairs), s"seed $i, pairs $pairs")
      }
    }
  }

  test("CC converges on an adversarial long path (diameter >> cluster depth)") {
    import spark.implicits._
    // a 20-node path: worst case for hash-to-min round count (label 0
    // travels one hop per round; near-dup clusters are diameter ≲ 3)
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val got = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 20 && got.values.forall(_ === 0L))
  }
}
