package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, KMeansOp}

/** Unit pins for the curation operators (SURVEY.md §2.7 round-4): hand
  * computable inputs with exact expected outputs, plus structural
  * invariants (coverage, conservation) the oracles can't express. */
class CurationSpec extends AnyFunSuite {
  import SparkTest._

  test("IVFADC recall@5 is at least the plain-IVF tier's (exact rerank pays for PQ loss)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val brute = graft.queries.ExtensionQueries.queries("ann_cosine_topk")(spark, dir)
      .select(col("q_id"), col("vec_id")).cache()
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = brute.join(df.select(col("q_id"), col("vec_id")),
        Seq("q_id", "vec_id"), "left_semi").count()
      hits.toDouble / brute.count()
    }
    val rIvf = recall(graft.queries.ExtensionQueries.queries("ann_ivf_topk")(spark, dir))
    val rPq = recall(graft.queries.CurationQueries.queries("ann_ivf_pq")(spark, dir))
    assert(rPq >= rIvf,
      s"IVFADC recall@5 $rPq must not trail plain IVF $rIvf")
    assert(rPq > 0.0)
  }

  test("linearProbe: strict loss descent, exact determinism, join-free scoring plan") {
    import org.apache.spark.sql.functions._
    val docs = graft.sources.Tables.table(spark, Sf, "documents")
    val label = when(col("lang") === "en", 1L).otherwise(0L)
    val run1 = graft.operators.Curation.linearProbe(docs, "text", label)
      .orderBy("dim").collect().toSeq
    // fixed-point integer GD is deterministic to the bit, not "close"
    val run2 = graft.operators.Curation.linearProbe(docs, "text", label)
      .orderBy("dim").collect().toSeq
    assert(run1.map(_.toSeq) == run2.map(_.toSeq))
    val h = run1.head
    val (l0, l1, l2) = (h.getLong(3), h.getLong(4), h.getLong(5))
    assert(l0 > l1 && l1 > l2,
      s"squared loss must strictly descend across the two GD steps: $l0, $l1, $l2")
    // scoring inlines the weights as literals: the executed plan must
    // contain no join of any kind — the filter runs at scan speed
    val score = graft.operators.Curation.linearProbeScore(
      docs, "text", label, "lang")
    val plan = score.queryExecution.executedPlan.toString()
    assert(!plan.toLowerCase.contains("join"),
      s"probe scoring must be map-only (weights are literals), plan:\n$plan")
    assert(score.collect().length == 5)
  }

  test("chunk: window coverage, overlap, and short-final-window semantics") {
    import spark.implicits._
    // 10 tokens, chunkSize 4, stride 3 → starts 0,3,6,9
    val d = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val rows = Curation.chunk(d, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
    assert(rows.map(_.getLong(1)).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_.getString(3)).toSeq === Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"))
    assert(rows.map(_.getLong(2)).toSeq === Seq(4L, 4L, 4L, 1L))
    // single-token doc: exactly one chunk, itself
    val one = Curation.chunk(Seq((2L, "only")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(one.length === 1 && one.head.getString(3) === "only")
  }

  test("mixBySource: keep decision matches the hash rule exactly") {
    import spark.implicits._
    val docs = (0L until 200L).map(i => (i, s"src${i % 7}")).toDF("doc_id", "source")
    val got = Curation.mixBySource(docs, "doc_id", "source")
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val permille = Curation.MixPermille.toMap
    val expected = (0L until 200L).groupBy(i => s"src${i % 7}").map {
      case (src, ids) =>
        val rate = permille(src.drop(3).toInt % 5)
        val kept = ids.filter(i => (i * 2246822519L) % 1000L < rate)
        src -> ((ids.size.toLong, kept.size.toLong, kept.sum))
    }
    got.foreach { case (src, total, kept, sum) =>
      assert((total, kept, sum) === expected(src))
    }
    // downweighted sources actually lose documents
    assert(got.exists { case (_, total, kept, _) => kept < total })
  }

  test("decontaminate: planted benchmark overlap is flagged, clean doc is not") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta"),         // benchmark (0 % 97 == 0)
      (1L, "alpha beta gamma other words"),   // shares "alpha beta gamma"
      (2L, "zz yy xx ww vv")                  // clean
    ).toDF("doc_id", "text")
    val got = Curation.decontaminate(docs, "doc_id", "text").collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1L && got.head.getLong(1) === 1L)
  }

  test("packBins: conservation + agreement with single-partition reference") {
    import spark.implicits._
    val docs = (0L until 100L).map(i => (i, s"d$i " * (1 + (i % 13)).toInt))
      .toDF("doc_id", "text")
    val nTok = size(split(col("text"), " ")) // includes trailing empty token; irrelevant — both sides use it
    val got = Curation.packBins(docs, "doc_id", nTok, budget = 50L)
      .orderBy("bin").collect()
    // conservation: every doc lands in exactly one bin
    assert(got.map(_.getLong(1)).sum === 100L)
    // reference: driver-side exclusive prefix sum in id order
    val toks = docs.select(col("doc_id"), nTok.cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val expBins = toks.map { case (_, n) => val b = acc / 50L; acc += n; b }
    val expected = toks.zip(expBins).groupBy(_._2).toSeq.sortBy(_._1)
      .map { case (b, xs) =>
        (b, xs.length.toLong, xs.map(_._1._2).sum,
          xs.map(_._1._1).min, xs.map(_._1._1).max)
      }
    val gotTuples = got.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(gotTuples === expected)
  }

  test("charDiversity: hand-computed Gini and repetition") {
    import spark.implicits._
    // "aab": counts a=2,b=1 → gini = 1 - (4+1)/9; words "aa ab aa":
    // 3 words, 2 distinct → rep = 1 - 2/3
    val d = Seq((1L, "aab"), (2L, "aa ab aa")).toDF("doc_id", "text")
    val got = Curation.charDiversity(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got(0).getLong(1) === 2L)
    assert(math.abs(got(0).getDouble(2) - (1.0 - 5.0 / 9.0)) < 1e-6)
    assert(got(0).getDouble(3) === 0.0) // "aab" = 1 word, 1 distinct
    assert(math.abs(got(1).getDouble(3) - (1.0 - 2.0 / 3.0)) < 1e-6)
  }

  test("trigram LM: hand-computed conditional probabilities and doc score") {
    import graft.operators.LangModel
    import spark.implicits._
    // "a b c" ×2 and "a b d": P(c|a b) = 2/3, P(d|a b) = 1/3
    val docs = Seq((1L, "a b c"), (2L, "a b c"), (3L, "a b d"))
      .toDF("doc_id", "text")
    val probs = LangModel.trigramProbs(docs, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(probs === Set(
      ("a", "b", "c", 2L, 3L, 0.666667),
      ("a", "b", "d", 1L, 3L, 0.333333)))
    // doc scores: docs 1/2 have one trigram at p=2/3; doc 3 at p=1/3
    val pruned = LangModel.trigramProbs(docs, "doc_id", "text", minCount = 2L)
    val scores = LangModel.docLmScore(docs, "doc_id", "text", pruned)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // under minCount=2 the "a b d" trigram is pruned → doc 3 scores 0
    assert(scores === Map(1L -> 0.666667, 2L -> 0.666667, 3L -> 0.0))
  }

  test("pagerank: 2-cycle fixed point; no-in-link node keeps only teleport mass") {
    import graft.operators.PageRank
    import spark.implicits._
    val nodes = Seq(0L, 1L).toDF("doc_id")
    // a ↔ b: uniform 0.5 is the fixed point of the damped iteration
    val cycle = Seq((0L, 1L), (1L, 0L)).toDF("src", "dst")
    val rCycle = PageRank.ranks(nodes, cycle, "doc_id", 2L, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rCycle(0L) - 0.5) < 1e-12 &&
      math.abs(rCycle(1L) - 0.5) < 1e-12)
    // 0 → 1 only: node 0 has no in-links → teleport only (0.15/2);
    // node 1 gets teleport + damped full rank of node 0
    val chain = Seq((0L, 1L)).toDF("src", "dst")
    val rChain = PageRank.ranks(nodes, chain, "doc_id", 2L, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(rChain(0L) - 0.075) < 1e-12)
    assert(math.abs(rChain(1L) - (0.075 + 0.85 * 0.5)) < 1e-12)
  }

  test("kmeans: well-separated clusters recovered; singleton centroid is its point") {
    import spark.implicits._
    // two tight groups around (0,0) and (10,10), plus one outlier at
    // (-10,0); ids 1..3 (the deterministic seeds) span all three groups
    val pts = Seq(
      (1L, Seq(0.0, 0.1)), (2L, Seq(10.0, 10.1)), (3L, Seq(-10.0, 0.0)),
      (4L, Seq(0.1, 0.0)), (5L, Seq(-0.1, 0.0)),
      (6L, Seq(10.1, 10.0))
    ).toDF("vec_id", "embedding")
    val assigned = KMeansOp.fit(pts, "vec_id", "embedding", k = 3, iters = 3)
    val byCluster = assigned.collect()
      .groupBy(_.getInt(2)).map { case (c, rs) =>
        c -> rs.map(_.getLong(0)).toSet
      }
    assert(byCluster.values.toSet === Set(Set(1L, 4L, 5L), Set(2L, 6L), Set(3L)))
    // singleton cluster's centroid equals its member exactly
    val cents = KMeansOp.update(assigned, "embedding").collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val outlierCluster = byCluster.find(_._2 === Set(3L)).get._1
    assert(cents(outlierCluster) === Seq(-10.0, 0.0))
  }
}
