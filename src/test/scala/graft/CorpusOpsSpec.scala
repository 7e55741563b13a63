package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Embeddings, KMeansOp, LangModel, TextAnalysis}

/** Unit pins for the round-4 corpus operators: winnowing's detection
  * guarantee, vocabulary rank/coverage arithmetic, self-calibrating
  * stratified rates, Matryoshka renormalization, and SemDeDup's
  * cluster-blocked pair semantics — the structural properties the
  * row-level oracles can't phrase. */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTest._

  test("winnow: shared run of ≥ w+2 words ⇒ shared fingerprint; tiny doc gets one") {
    import spark.implicits._
    // w=4 windows over 3-gram hashes: any shared run of 4+2=6 words spans
    // a full window of shared grams, so its selected min is shared too.
    val shared = "alpha beta gamma delta epsilon zeta"
    val d = Seq(
      (1L, s"one two $shared nine ten eleven twelve"),
      (2L, s"red blue green $shared yellow purple"),
      (3L, "tiny doc here")).toDF("doc_id", "text")
    val sel = TextAnalysis.winnowSelected(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val fp1 = sel.collect { case (1L, h) => h }.toSet
    val fp2 = sel.collect { case (2L, h) => h }.toSet
    assert(fp1.intersect(fp2).nonEmpty,
      "docs sharing a 6-word run must share a winnowed fingerprint")
    // doc 3 has 1 gram (< w): min-of-all ⇒ exactly one fingerprint
    assert(sel.count(_._1 == 3L) === 1)
    // summaries aggregate the same set
    val sums = TextAnalysis.winnowFingerprints(d, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(sums.map(_.getLong(1)).toSeq ===
      Seq(fp1.size.toLong, fp2.size.toLong, 1L))
    assert(sums.head.getLong(2) === fp1.sum)
  }

  test("vocabTopK: rank order, k cut, exact cumulative coverage") {
    import spark.implicits._
    // counts: a=4, b=3, c=2, d=1 (10 tokens)
    val d = Seq((1L, "a a b c"), (2L, "a b d"), (3L, "a b c")).toDF("doc_id", "text")
    val got = LangModel.vocabTopK(d, "text", k = 3).orderBy("rnk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "a", 4L, 0.4), (2L, "b", 3L, 0.7), (3L, "c", 2L, 0.9)))
  }

  test("stratifiedSample: smallest stratum keeps everything; rates follow the floor rule") {
    import spark.implicits._
    val docs = ((0L until 40L).map(i => (i, "big")) ++
      (100L until 110L).map(i => (i, "small"))).toDF("doc_id", "lang")
    val got = Curation.stratifiedSample(docs, "doc_id", "lang")
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val big = got.find(_._1 == "big").get
    val small = got.find(_._1 == "small").get
    assert(small._3 === 1000L && small._4 === 10L) // permille 1000 ⇒ all kept
    assert(big._3 === math.floor(1000.0 * 10.0 / 40.0).toLong)
    val expectedKept = (0L until 40L)
      .count(i => (i * 3266489917L) % 1000L < big._3)
    assert(big._4 === expectedKept.toLong)
  }

  test("truncateRenorm: unit norm after renorm; zero prefix stays zero") {
    import spark.implicits._
    val d = Seq(
      (1L, (1 to 20).map(_.toFloat).toArray),
      (2L, Array.fill(20)(0f))).toDF("vec_id", "embedding")
    val rows = Embeddings.truncateRenorm(d).collect()
    assert(rows.count(_.getLong(0) == 1L) === 16) // dims cut to 16
    val sumSq = rows.filter(_.getLong(0) == 1L)
      .map(r => r.getDouble(2) * r.getDouble(2)).sum
    assert(math.abs(sumSq - 1.0) < 1e-4, s"renormalized norm² was $sumSq")
    assert(rows.filter(_.getLong(0) == 2L)
      .forall(r => r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0))
  }

  test("pmiBigrams: always-adjacent pair outranks independent pairs; marginals exact") {
    import spark.implicits._
    // "x y" always adjacent (5 times); "a b" co-occurs 5 of many times
    val d = Seq(
      (1L, "x y a b a c a d x y"), (2L, "x y a b a c a d x y"),
      (3L, "a b a c a d x y a b"), (4L, "b a c a d a b c d a"),
      (5L, "a b c d a b c d a b")).toDF("doc_id", "text")
    val got = LangModel.pmiBigrams(d, "doc_id", "text", minCount = 5L, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.head._2 === "x" && got.head._3 === "y",
      s"perfect collocation must rank first, got ${got.toSeq}")
    // hand-check the score of (x,y): c12=5... derive from data
    val bigrams = d.collect().flatMap { r =>
      val t = r.getString(1).split(" "); t.zip(t.tail)
    }
    val n = bigrams.length.toLong
    val c12 = bigrams.count(_ == ("x", "y")).toLong
    val cl = bigrams.count(_._1 == "x").toLong
    val cr = bigrams.count(_._2 == "y").toLong
    val expected = BigDecimal((c12 * n).toDouble / (cl * cr).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gotScore = LangModel.pmiBigrams(d, "doc_id", "text", 5L, 3)
      .collect().head.getDouble(4)
    assert(gotScore === expected)
  }

  test("corpusReport: lower median picks the exact rank, odd and even strata") {
    import spark.implicits._
    // odd stratum: token counts 1,2,3 → median 2; even: 2,4 → lower median 2
    val d = Seq(
      (1L, "w", "odd", "s1"), (2L, "w w", "odd", "s1"), (3L, "w w w", "odd", "s2"),
      (4L, "w w", "even", "s1"), (5L, "w w w w", "even", "s1")
    ).toDF("doc_id", "text", "lang", "source")
    val got = Curation.corpusReport(d, "lang", "doc_id", "text")
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(5), r.getLong(7)))
    assert(got.toSeq === Seq(("even", 2L, 1L), ("odd", 2L, 2L)))
  }

  test("semanticDedup: finds planted in-cluster dup, never cross-cluster") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.99, 0.02)),   // cluster A + dup
      (2L, Array(0.0, 1.0)), (3L, Array(0.02, 0.99))    // cluster B + dup
    ).toDF("vec_id", "embedding")
    val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 2, 2).cache()
    val got = Dedup.semanticDedup(assigned, 0.9).orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    // ids 1 and 3 are the higher-id members of each near-dup pair
    assert(got.toSeq === Seq((1L, 0L), (3L, 2L)))
  }
}
