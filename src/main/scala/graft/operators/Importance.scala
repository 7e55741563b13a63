package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document in a
  * raw corpus by how much its hashed n-gram feature distribution looks
  * like a target domain's, so a downstream sampler can resample the raw
  * pool toward the target. The reference engine has no equivalent — this
  * is charter §"training-data pipeline" surface, like Dedup/TextAnalysis.
  *
  * Shape, built for 100 TB:
  *  - features are word bigrams built MAP-SIDE with array `transform`
  *    (no per-doc window, no shuffle) and hashed into `B` buckets with
  *    the codegen'd `fold_hash` — the hashing is what bounds the model:
  *    whatever the vocabulary, the weight table is ≤ B rows.
  *  - source and target bucket counts come from ONE partial-aggregated
  *    shuffle of ≤ B·partitions rows (the target is a filter flag
  *    aggregated in the same pass, not a second scan).
  *  - the ≤ B-row weight table broadcast-joins back onto the feature
  *    stream; per-doc scoring is one partial-agg shuffle on doc_id.
  *  Two passes over the feature stream (estimate, then score) are
  *  inherent to importance weighting; the stream is pre-aggregated to
  *  (doc, bucket, n) multiplicities — map-side combine, then one shuffle
  *  — before caching, so the cached form is ≤ docs·B rows however long
  *  the documents are, and both passes start from the compacted form.
  *
  * Determinism/oracle parity: Laplace-smoothed ratio weights use one
  * fixed IEEE division sequence ((tgt+1)/(tgtTot+B)) / ((src+1)/(srcTot+B))
  * — no logs — and the per-doc mean runs through DECIMAL(38,18) so
  * summation order can't move the result (ExtensionQueries ground rules).
  */
object Importance {

  /** Feature-hash bucket count. 2^10 keeps the sf oracle exercisable;
    * at 100 TB you'd raise it (DSIR's paper uses 10k hash buckets) — the
    * weight table stays broadcastable at any plausible B. */
  val Buckets = 1024

  /** Per-document DSIR weight over hashed word-bigram features.
    *
    * @param target row predicate marking the target-domain sample
    * @return (idCol, n_features, dsir_weight), docs with ≥1 bigram
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      target: Column): DataFrame = {
    val spark = docs.sparkSession
    graft.expressions.ShingleOps.ensureRegistered(spark)
    val b = lit(Buckets.toLong)

    // map-side hashed-bigram buckets through the codegen'd
    // word_bigram_buckets kernel — one static call per row, bigram
    // strings never materialized; bit-identical to
    // fold_hash(concat(a, \' \', b)) % B, which is what the oracle
    // spells out (fanned out: this scan is the CPU-heavy stage; the
    // HOF transform/concat formulation it replaces cost 3.5 s at
    // sf0.1 against the kernel's ~1 s)
    val features = graft.sources.Tables.fanout(docs)
      .select(col(idCol), target.as("is_target"),
        explode(call_function("word_bigram_buckets",
          col(textCol), b)).as("bucket"))
      // pre-aggregate to (doc, bucket) multiplicity BEFORE caching: the
      // cache holds ≤ docs·B rows instead of one row per bigram
      // occurrence, and both downstream passes (estimate, score) start
      // from the compacted form. Map-side combine does most of the
      // reduction before the one shuffle. is_target is doc-functional,
      // so adding it to the key splits nothing.
      .groupBy(col(idCol), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .cache() // two bounded-agg passes: estimate + score

    // one pass for BOTH distributions: target rides as a filtered count
    val stats = features.groupBy("bucket").agg(
      sum(col("n")).as("src_n"),
      sum(when(col("is_target"), col("n")).otherwise(0L)).as("tgt_n"))
    val totals = stats.agg(
      sum("src_n").as("src_tot"), sum("tgt_n").as("tgt_tot"))

    val weights = stats.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (((col("tgt_n") + 1L).cast("double") / (col("tgt_tot") + b)) /
         ((col("src_n") + 1L).cast("double") / (col("src_tot") + b))).as("wt"))

    // n·dec18(wt) computed EXACTLY: decimal(28,18) × decimal(8,0) →
    // decimal(37,18), inside the 38 cap, so no scale truncation — the sum
    // is bit-identical to n separate additions of dec18(wt), i.e. to the
    // pre-compaction form the DuckDB oracle still spells out.
    features
      .join(broadcast(weights), "bucket")
      .groupBy(col(idCol))
      .agg(
        sum(col("n")).as("n_features"),
        round(sum(col("wt").cast("decimal(28,18)") *
            col("n").cast("decimal(8,0)")).cast("double") /
          sum(col("n")), 6).as("dsir_weight"))
  }
}
