package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, KMeansOp}

/** Physical-plan pins for the round-4 curation operators: each test
  * asserts the SCALE property the operator exists for — the shape that
  * must survive a 100 TB input — not just its output. */
class CurationPlanSpec extends AnyFunSuite {
  import SparkTest._

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    (df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString()
  }

  test("q_multiway_join: every dim joins broadcast, no cartesian product") {
    val df = graft.SparkEntry.queries("q_multiway_join")(spark, Sf)
    val plan = finalPlan(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"dims must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"no cartesian product allowed:\n$plan")
    // orders' date range must reach the parquet scan as pushed filters
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderdate)"),
      s"o_orderdate filter must push to the scan:\n$plan")
  }

  test("packBins: the running-sum window is partitioned (no global window)") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val df = Curation.packBins(docs, "doc_id",
      size(split(col("text"), " ")), 256L)
    val plan = finalPlan(df)
    // the Window node must carry the part_id partition spec — a Window
    // with an empty partition spec would serialize the corpus through
    // one task (the exact failure mode packBins exists to avoid)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, s"expected a Window node:\n$plan")
    assert(windowLines.forall(_.contains("part_id")),
      s"running-sum window must partition by part_id:\n$windowLines")
  }

  test("runningSum: generalized prefix sum keeps its window partitioned too") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long")
        .as("n_tokens"))
    val df = Curation.runningSum(docs,
      Seq(col("n_tokens").desc, col("doc_id").asc),
      col("n_tokens"), "cum")
    val plan = finalPlan(df)
    val windowLines = plan.linesIterator.filter(_.contains("Window")).toSeq
    assert(windowLines.nonEmpty, s"expected a Window node:\n$plan")
    assert(windowLines.forall(_.contains("_rs_part")),
      s"running-sum window must partition by _rs_part:\n$windowLines")
  }

  test("decontaminate: benchmark shingle set joins as broadcast") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = finalPlan(Curation.decontaminate(docs, "doc_id", "text"))
    assert(plan.contains("BroadcastHashJoin"),
      s"benchmark set must broadcast — a shuffle join of corpus shingles " +
        s"against it defeats the design:\n$plan")
  }

  test("kmeans assign: literal centroids, map-only — no join, no exchange of the corpus") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"$Sf/embeddings.parquet")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val plan = finalPlan(KMeansOp.fit(emb, "vec_id", "embedding", 4, 2))
    // centroids are inlined literals: the final assignment pass is a pure
    // per-row Project over the scan — the corpus is never joined,
    // aggregated, or shuffled to pick nearest centroids (the earlier
    // broadcast-join + argmin-aggregate form exchanged one partial row
    // per vector per iteration)
    assert(!plan.contains("Join"), s"assign must not join:\n$plan")
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    assert(plan.contains("array_min"),
      s"literal-centroid argmin missing from the assign plan:\n$plan")
  }

  test("trigramProbs: ONE corpus explode — the c2 marginal is a window sum") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = finalPlan(
      graft.operators.LangModel.trigramProbs(docs, "doc_id", "text"))
    // pre-window-sum, the plan had TWO Generate(posexplode) subtrees; the
    // marginal must now come from the vocab-sized count table, not a
    // second corpus pass
    val generates = plan.linesIterator.count(_.contains("Generate"))
    assert(generates === 1,
      s"expected exactly 1 corpus explode, found $generates:\n$plan")
  }

  test("pmiBigrams: both consumers scan the CACHED counts; top-k is TakeOrdered") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val df = graft.operators.LangModel.pmiBigrams(docs, "doc_id", "text")
    val plan = finalPlan(df)
    // the corpus explode lives only inside the c12 cache build: the
    // marginal-window branch AND the broadcast-N branch must both read
    // the InMemory bigram counts, not re-run the explode
    assert(plan.linesIterator.count(_.contains("InMemoryTableScan")) >= 2,
      s"both c12 consumers must scan the cache:\n$plan")
    // the only unkeyed window ranks the k=50 TakeOrdered survivors
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must run as TakeOrdered, not a global sort:\n$plan")
    df.sparkSession.catalog.clearCache()
  }

  test("vocabTopK: the top-k cut is TakeOrdered, never a full-vocab sort") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = finalPlan(
      graft.operators.LangModel.vocabTopK(docs, "text"))
    assert(plan.contains("TakeOrderedAndProject"),
      s"vocab cut must be per-partition heaps + merge:\n$plan")
  }

  test("stratifiedSample: the rate table broadcasts back to the corpus scan") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = finalPlan(
      Curation.stratifiedSample(docs, "doc_id", "lang"))
    assert(plan.contains("BroadcastHashJoin"),
      s"per-stratum rates must broadcast — shuffling the corpus by " +
        s"stratum to meet a 5-row rate table defeats the design:\n$plan")
  }

  test("incremental dedup: batch-derived sides broadcast into the corpus scans") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val batch = graft.sources.ExtCorpus.incrementalBatch(spark, Sf)
    val plan = finalPlan(graft.operators.Dedup.incremental(
      docs, batch, "doc_id", "text", 0.5))
    // exact matching broadcasts the batch texts; candidate generation
    // broadcasts the batch band rows — the corpus side must never be
    // shuffled against itself (the increment-vs-accumulated-corpus shape)
    val bhj = plan.linesIterator.count(_.contains("BroadcastHashJoin"))
    assert(bhj >= 2,
      s"expected the exact join AND the band-candidate join to broadcast " +
        s"the batch side (got $bhj BroadcastHashJoins):\n$plan")
    spark.catalog.clearCache()
  }

  test("paragraphDedup: exactly two shuffles — segment-keyed dedup + doc reassembly") {
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val plan = finalPlan(
      graft.operators.Dedup.paragraphDedup(docs, "doc_id", "text"))
    // one exchange keyed by the segment (the corpus-wide first-occurrence
    // window), one keyed by doc_id (reassembly groupBy) — a third would
    // mean the plan re-shuffles the exploded segments somewhere it
    // shouldn't; reassembly must NOT re-scan the corpus
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size == 2,
      s"expected exactly 2 hash exchanges (seg window + doc groupBy):\n$plan")
    assert(exchanges.exists(_.contains("seg")) &&
      exchanges.exists(_.contains("doc_id")),
      s"exchanges must key by seg and doc_id:\n$exchanges")
  }

  test("dsirWeights: features build map-side (no window), weights broadcast back") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$Sf/documents.parquet")
    val df = graft.operators.Importance.dsirWeights(
      docs, "doc_id", "text", col("source") === "src0")
    val plan = finalPlan(df)
    // bigrams come from array transform, not a per-doc lead() window — a
    // Window here would mean a corpus shuffle before the first aggregate
    assert(!plan.contains("Window"),
      s"feature extraction must be map-side:\n$plan")
    // the ≤B-row weight table must come back via broadcast, never by
    // shuffling the feature stream a third time
    assert(plan.contains("BroadcastHashJoin"),
      s"weight table must broadcast onto the feature stream:\n$plan")
    spark.catalog.clearCache() // release the intra-query feature cache
  }
}
