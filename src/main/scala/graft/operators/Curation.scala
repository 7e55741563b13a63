package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for the training-data pipeline (charter
  * extensions, SURVEY.md §2.7): context chunking, weighted source mixing,
  * benchmark decontamination, stream packing, and arithmetic diversity
  * scoring.
  *
  * Scale notes (the design constraint for each member):
  *  - chunking / diversity: map-side expressions only — zero shuffle.
  *  - mixing: the weight table is joined (broadcast), not hard-coded —
  *    at 100 TB the mixing policy is config data, not query text.
  *  - decontamination: benchmark n-grams are a broadcast semi-join —
  *    never a pair join against the corpus.
  *  - packing: the exclusive prefix sum uses the two-phase
  *    per-partition-offset pattern (same family as [[Sequencer]]) —
  *    a single-partition global window would serialize the corpus.
  *
  * Everything stays in integer / single-division IEEE arithmetic with
  * fixed fold order, so the DuckDB oracle reproduces values bit-exactly
  * (same ground rules as [[TextAnalysis]]/[[Embeddings]]).
  */
object Curation {

  // ---------- context chunking ----------

  /** Overlapping token windows: chunk c covers tokens [c*stride,
    * c*stride + chunkSize). Every token position below n is covered;
    * the final window may be short. One posexplode — no shuffle; chunk
    * text is rebuilt with array_join so downstream stages see plain
    * documents. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 32, stride: Int = 24): DataFrame = {
    val toks = split(col(textCol), " ")
    val starts = sequence(lit(0), greatest(size(toks) - 1, lit(0)), lit(stride))
    docs
      .select(col(idCol).as("doc_id"), toks.as("toks"),
        posexplode(starts).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkSize), size(col("toks")) - col("start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  // ---------- weighted source mixing ----------

  /** Deterministic per-source sampling rates in permille, keyed by the
    * numeric suffix of the source name (a stand-in for a curation policy
    * table: web sources downweighted, curated sources kept). */
  val MixPermille: Seq[(Int, Long)] =
    Seq(0 -> 1000L, 1 -> 800L, 2 -> 600L, 3 -> 400L, 4 -> 200L)

  /** Independent second hash stream for mixing decisions (xxhash prime;
    * [[Embeddings.assignSplit]] uses the Knuth constant — the two
    * decisions must be uncorrelated or mixing would skew splits). */
  def mixHash(id: Column): Column =
    pmod(id.cast("long") * 2246822519L, lit(1000L))

  /** Weighted mixing: keep a doc iff its hash falls under its source's
    * permille rate. The rate table arrives as a DataFrame and is
    * broadcast-joined — the plan a policy-driven 100 TB mix needs (rates
    * change without replanning the scan). Returns per-source audit
    * counts: kept/total and an id checksum of the kept set. */
  def mixBySource(docs: DataFrame, idCol: String, sourceCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rates = MixPermille.toDF("suffix_mod", "permille")
    val keyed = docs.withColumn("suffix_mod",
      pmod(regexp_extract(col(sourceCol), "([0-9]+)$", 1).cast("int"),
        lit(MixPermille.size)))
    keyed
      .join(broadcast(rates), "suffix_mod")
      .withColumn("kept", mixHash(col(idCol)) < col("permille"))
      .groupBy(col(sourceCol).as("source"))
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col(idCol)).otherwise(0L)).as("kept_checksum"))
  }

  // ---------- stratified sampling ----------

  /** Third independent hash stream (sampling must be uncorrelated with
    * both the split and the mixing decisions). */
  def sampleHash(id: Column): Column =
    pmod(id.cast("long") * 3266489917L, lit(1000L))

  /** Self-calibrating stratified sampling: per-stratum keep rates derived
    * FROM THE DATA so every stratum downsamples toward the smallest one
    * (the language-balancing move multilingual pipelines make) —
    * permille_s = floor(1000·min_count / count_s), keep iff
    * sampleHash(id) < permille_s. Two corpus scans: one |strata|-sized
    * count aggregate (broadcast back as the rate table, like
    * [[mixBySource]]'s policy join) and one map-side filter pass. The
    * floor runs on the identical IEEE division in both engines. Returns
    * per-stratum audit counts. */
  def stratifiedSample(docs: DataFrame, idCol: String,
      stratumCol: String): DataFrame = {
    val counts = docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_total"))
    val rates = counts
      .crossJoin(broadcast(counts.agg(min(col("n_total")).as("min_cnt"))))
      .withColumn("permille",
        floor(lit(1000.0) * col("min_cnt").cast("double") /
          col("n_total").cast("double")).cast("long"))
      .select(col("stratum"), col("n_total"), col("permille"))
    docs.select(col(idCol).as("doc_id"), col(stratumCol).as("stratum"))
      .join(broadcast(rates), "stratum")
      .withColumn("kept", sampleHash(col("doc_id")) < col("permille"))
      .groupBy(col("stratum"), col("n_total"), col("permille"))
      .agg(
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("doc_id")).otherwise(0L)).as("kept_checksum"))
  }

  // ---------- benchmark decontamination ----------

  /** Benchmark membership predicate: a deterministic held-out slice. */
  def isBenchmark(id: Column): Column = id % 97 === 0

  /** Flag training docs sharing any word 3-gram with the benchmark
    * slice — the overlap check every eval-aware pipeline runs before
    * training. Candidate generation is a semi-join against the DISTINCT
    * benchmark shingle set (small — broadcast at any corpus scale);
    * there is no doc-pair join anywhere, so cost is linear in corpus
    * shingles. Returns contaminated docs with their shared-shingle
    * count. */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val sh = Dedup.shingles(docs, idCol, textCol)
    val benchShingles = sh.where(isBenchmark(col("doc_id")))
      .select(col("shingle")).distinct()
    sh.where(!isBenchmark(col("doc_id")))
      .join(broadcast(benchShingles), "shingle")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  // ---------- stream packing ----------

  /** Pack-and-split sequence packing: concatenate docs in id order into
    * one token stream, cut every `budget` tokens — bin(d) =
    * floor(exclusiveTokenPrefix(d) / budget), i.e. the bin where doc d's
    * first token lands. This is the standard packing rule for LLM
    * pretraining batches (documents straddle cuts; the tokenizer inserts
    * boundaries).
    *
    * The exclusive prefix sum is two-phase: (1) range-partition by id and
    * run the running-sum window per PHYSICAL partition (parallel), (2)
    * per-partition totals —
    * O(#partitions) scalars — collected, cumulated on the driver, and
    * broadcast back as offsets. No single-partition window anywhere; the
    * one collect is #partitions-sized by construction (same scalability
    * argument as [[Sequencer.stampSequence]]'s zipWithIndex). */
  def packBins(docs: DataFrame, idCol: String, nTokens: Column,
      budget: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      nTokens.cast("long").as("n_tokens"))
    // One range shuffle gives both the per-partition order and the
    // partition→offset mapping. Materialized via localCheckpoint, not
    // cache(): the offsets below are keyed by part_id, and a cache
    // eviction would recompute the range shuffle with RESAMPLED
    // boundaries — silently mismatching the collected offsets — while a
    // catalog cache entry also pins executor storage for the rest of
    // the session (nothing ever unpersisted it). The checkpoint
    // truncates lineage (part_ids cannot resample) and its blocks are
    // released by the ContextCleaner when the plan is garbage
    // collected — no session-lifetime leak.
    val ranged = base.repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .withColumn("part_id", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("part_id"))
      .agg(sum(col("n_tokens")).as("part_sum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }.tail.zip(totals).map { case ((pid, inclusive), (_, s)) =>
      (pid, inclusive - s) // exclusive offset of the partition
    }
    val offsetDf = broadcast(offsets.toSeq.toDF("part_id", "offset"))
    val w = Window.partitionBy(col("part_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged
      .join(offsetDf, "part_id")
      .withColumn("prefix",
        coalesce(sum(col("n_tokens")).over(w), lit(0L)) + col("offset"))
      .withColumn("bin", floor(col("prefix") / budget.toDouble).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Two-phase INCLUSIVE prefix sum of `value` under the total order
    * `order` — [[packBins]]'s machinery generalized to any sort key
    * (packBins keeps its own doc_id-ranged copy because its plan is
    * pinned): range-partition by the order columns, per-partition
    * running-sum window (parallel), per-partition totals — #partitions
    * scalars — cumulated on the driver and broadcast back as offsets.
    * No single-partition window; the collect is #partitions-sized by
    * construction. Output = `df`'s columns + `cum` (inclusive running
    * sum of `value`). */
  def runningSum(df: DataFrame, order: Seq[Column], value: Column,
      cumName: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the working columns are internal and dropped on output; colliding
    // input names would be silently overwritten, so refuse them
    Seq("_rs_v", "_rs_part", "_rs_off").foreach(c =>
      require(!df.columns.contains(c),
        s"runningSum reserves internal column name '$c'"))
    val base = df.withColumn("_rs_v", value.cast("long"))
    // localCheckpoint, not cache(): part_id-keyed offsets must never see
    // a recomputed (resampled) range shuffle, and the blocks are GC-
    // released instead of pinned in the catalog cache (see [[packBins]])
    val ranged = base.repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("_rs_part", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("_rs_part"))
      .agg(sum(col("_rs_v")).as("part_sum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }.tail.zip(totals).map { case ((pid, inclusive), (_, s)) =>
      (pid, inclusive - s) // exclusive offset of the partition
    }
    val offsetDf = broadcast(offsets.toSeq.toDF("_rs_part", "_rs_off"))
    val w = Window.partitionBy(col("_rs_part")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    ranged
      .join(offsetDf, "_rs_part")
      .withColumn(cumName, sum(col("_rs_v")).over(w) + col("_rs_off"))
      .drop("_rs_part", "_rs_off", "_rs_v")
  }

  /** Learning-rate denominator of [[linearProbe]] (2^22): weight updates
    * are `w -= grad / LrDen` in symmetric (truncate-toward-zero) integer
    * division, so the whole training loop stays in exact fixed-point —
    * Long `/` truncates toward zero, and the oracle spells the same
    * truncation with flooring `//` on the negated absolute value. */
  val LrDen = 4194304L

  /** Fixed-point scale of [[linearProbe]] labels and weights (micro). */
  val ProbeScale = 1000000L

  /** Train a LINEAR quality/domain classifier inside the engine — the
    * fastText-style filter every pretraining pipeline runs, as
    * distributed full-batch gradient descent with squared loss, kept
    * EXACT end to end: features are integer token-length-bucket counts
    * (+ bias), labels live in micro-units, per-row products stay in
    * Long, per-dim gradient sums fold through DECIMAL(38,0) (order-
    * independent), and the update divides by the power-of-two [[LrDen]]
    * in truncating integer division. No float appears anywhere, so N
    * partial aggregations merge bit-identically to one — and the DuckDB
    * oracle replays the identical arithmetic.
    *
    * Scale shape: one cached featurize pass (map-side — 9 columns from
    * one token array), then one aggregation per unrolled iteration whose
    * partials fold map-side into TEN scalars (9 gradients + loss); the
    * weights return to the plan as inlined LITERALS (the
    * [[KMeansOp.assignLiteral]] idiom — no join, no broadcast, map-only
    * scoring), so each iteration is one scan + one 10-scalar reduce.
    * At 100 TB that is the textbook data-parallel GD step; the driver
    * holds 9 longs. Learning rate is effectively lr/N absorbed into
    * [[LrDen]] — a knob a deployment tunes; the two unrolled iterations
    * here pin the loop's arithmetic, not a converged model.
    *
    * Returns 9 rows: (dim, w1_micro, w2_micro, loss0_sh, loss1_sh,
    * loss2_sh) — weights after each iteration plus the (2^20-downshifted)
    * squared losses before/between/after, whose strict descent is the
    * visible proof the loop learns. */
  def linearProbe(docs: DataFrame, textCol: String,
      labelExpr: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val (w1, w2, losses) = trainProbe(docs, textCol, labelExpr, Nil)
    (0 until 9).map(j => (j, w1(j), w2(j),
        losses(0) / 1048576L, losses(1) / 1048576L, losses(2) / 1048576L))
      .toDF("dim", "w1_micro", "w2_micro",
        "loss0_sh", "loss1_sh", "loss2_sh")
  }

  /** [[linearProbe]]'s trained model APPLIED: score every document with
    * the final weights — a map-only pass (weights are inlined literals,
    * no join, no broadcast; at 100 TB the filter runs at scan speed) —
    * and roll the scores up per `groupCol`: the separation report an
    * operator reads BEFORE letting the probe gate a corpus. On the
    * synthetic corpus it shows per-class means barely apart (the
    * length-bucket features carry little language signal there) — which
    * is precisely the go/no-go answer the report exists to give.
    * Scores stay in exact micro-unit integers. */
  def linearProbeScore(docs: DataFrame, textCol: String,
      labelExpr: Column, groupCol: String): DataFrame = {
    val (_, w2, _) = trainProbe(docs, textCol, labelExpr, Seq(groupCol))
    val scored = featurize(docs, textCol, labelExpr, Seq(groupCol))
      .withColumn("score_micro",
        (0 until 9).map(j => col(s"x$j") * lit(w2(j))).reduce(_ + _))
    scored.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("score_micro")).cast("long").as("sum_score_micro"))
  }

  private def featurize(docs: DataFrame, textCol: String,
      labelExpr: Column, carry: Seq[String]): DataFrame = {
    val toks = split(col(textCol), " ")
    val xs = (0 until 8).map(j =>
      size(filter(toks, t => length(t) % 8 === j)).cast("long").as(s"x$j")) :+
      lit(1L).as("x8")
    docs.select(carry.map(col) ++ xs :+
      (labelExpr.cast("long") * ProbeScale).as("ys"): _*)
  }

  /** The unrolled 2-iteration GD loop shared by [[linearProbe]] and
    * [[linearProbeScore]]: returns (w1, w2, losses(3)). */
  private def trainProbe(docs: DataFrame, textCol: String,
      labelExpr: Column, carry: Seq[String]): (Seq[Long], Seq[Long], Seq[Long]) = {
    val feat = featurize(docs, textCol, labelExpr, carry).cache()
    // one GD pass: gradient of 0.5*Σ(x·w − y)² per dim + the loss, all
    // folded in a single 10-scalar aggregation with literal-inlined w
    def pass(w: Seq[Long]): (Seq[Long], Long) = {
      val pred = (0 until 9).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _)
      val withDiff = feat.withColumn("diff", pred - col("ys"))
      val aggs = (0 until 9).map(j =>
        sum((col(s"x$j") * col("diff")).cast("decimal(38,0)"))
          .cast("long").as(s"g$j")) :+
        sum((col("diff") * col("diff")).cast("decimal(38,0)"))
          .cast("long").as("loss")
      val r = withDiff.agg(aggs.head, aggs.tail: _*).collect()(0)
      ((0 until 9).map(r.getLong), r.getLong(9))
    }
    // symmetric integer division — Long / already truncates toward zero;
    // spelled out so the oracle's CASE-wrapped floor `//` is visibly the
    // same function
    def sdiv(g: Long): Long = if (g >= 0) g / LrDen else -((-g) / LrDen)
    val w0 = Seq.fill(9)(0L)
    val (g1, loss0) = pass(w0)
    val w1 = w0.zip(g1).map { case (w, g) => w - sdiv(g) }
    val (g2, loss1) = pass(w1)
    val w2 = w1.zip(g2).map { case (w, g) => w - sdiv(g) }
    val (_, loss2) = pass(w2)
    feat.unpersist(blocking = false)
    (w1, w2, Seq(loss0, loss1, loss2))
  }

  // ---------- dataset-card statistics ----------

  /** Per-stratum corpus report — the "dataset card" panel a curation run
    * publishes: doc/token/char totals, token extremes, the LOWER MEDIAN
    * of tokens-per-doc, and distinct sources. The median is rank-based
    * (value at row ⌈n/2⌉ in (n_tokens, doc_id) order), NOT an
    * interpolated percentile: rank selection is pure integer logic, so
    * both engines pick the identical row — no FP interpolation to
    * diverge — and it runs as one stratum-keyed window (one shuffle)
    * instead of a global sort. Mean chars/doc rides the decimal-sum
    * contract. */
  def corpusReport(docs: DataFrame, stratumCol: String, idCol: String,
      textCol: String): DataFrame = {
    val nTokens = size(split(col(textCol), " ")).cast("long")
    val base = docs.select(col(stratumCol).as("stratum"),
      col(idCol).as("doc_id"), nTokens.as("n_tokens"),
      length(col(textCol)).cast("long").as("n_chars"), col("source"))
    val w = Window.partitionBy(col("stratum"))
      .orderBy(col("n_tokens"), col("doc_id"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("stratum"))))
      .groupBy(col("stratum"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        max(when(col("rn") === floor((col("n") + 1) / 2).cast("long"),
          col("n_tokens"))).as("median_tokens"),
        round(sum(col("n_chars").cast("decimal(38,18)")).cast("double") /
          count(lit(1)), 6).as("mean_chars"),
        count_distinct(col("source")).as("n_sources"))
  }

  // ---------- arithmetic diversity / repetition scoring ----------

  /** Character-diversity (Gini impurity over the character distribution)
    * and word-repetition ratio — quality signals for spotting generated /
    * boilerplate text. Both reduce to INTEGER aggregates followed by ONE
    * division, so summation order cannot perturb the value and both
    * engines produce the identical double (the same trick as BM25's
    * ratio-form idf — no log, no incremental FP accumulation):
    *   gini = 1 - Σ_c count(c)² / len²,  rep = 1 - distinctWords / words.
    * Map-side only; the per-distinct-char count scan is O(alphabet·len)
    * (alphabet ≤ ~100; a 100 TB corpus would fold this into a codegen'd
    * expression like [[graft.expressions.FoldHash]] — same semantics). */
  /** Duplicate-n-gram repetition filter (the Gopher-rule family): the
    * fraction of a doc's word 3-grams that are repeats of an earlier
    * 3-gram in the SAME doc — high values mark boilerplate / generated
    * loops. total = n_words - 2 sliding 3-grams; distinct via the
    * codegen'd [[graft.expressions.WordShingles]]. Map-side only; the
    * keep flag applies the standard ≤ 0.3 threshold. */
  def repeatedNgrams(docs: DataFrame, idCol: String, textCol: String,
      maxDupFrac: Double = 0.3): DataFrame = {
    graft.expressions.ShingleOps.ensureRegistered(docs.sparkSession)
    val nWords = size(split(col(textCol), " ")).cast("long")
    val total = greatest(nWords - 2L, lit(0L))
    val distinctN =
      size(call_function("word_shingles", col(textCol))).cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      total.as("n_grams"),
      distinctN.as("n_distinct"),
      when(total > 0,
        round(lit(1.0) - distinctN.cast("double") / total.cast("double"), 6))
        .otherwise(lit(0.0)).as("dup_frac"))
      .withColumn("keep", col("dup_frac") <= maxDupFrac)
  }

  def charDiversity(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = split(col(textCol), "")
    val distinctChars = array_distinct(chars)
    // Σ count² as a LONG: order-independent by integer associativity
    val sumSq = aggregate(
      transform(distinctChars, c =>
        size(filter(chars, x => x === c)).cast("long")),
      lit(0L), (acc, n) => acc + n * n)
    val len = length(col(textCol)).cast("long")
    val toks = split(col(textCol), " ")
    val nWords = size(toks).cast("long")
    val nDistinct = size(array_distinct(toks)).cast("long")
    docs.select(
      col(idCol).as("doc_id"),
      size(distinctChars).cast("long").as("n_distinct_chars"),
      round(lit(1.0) - sumSq.cast("double") / (len * len).cast("double"), 6)
        .as("char_gini"),
      round(lit(1.0) - nDistinct.cast("double") / nWords.cast("double"), 6)
        .as("word_rep_ratio"))
  }
}
