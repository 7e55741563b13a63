package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Curation, KMeansOp, TextAnalysis}
import graft.sources.Tables

/** Corpus-curation queries (charter extensions, SURVEY.md §2.7 round-4
  * continuation): context chunking, weighted source mixing, benchmark
  * decontamination, pack-and-split sequence packing, arithmetic
  * diversity scoring, and k-means centroid training.
  *
  * Oracle-parity ground rules as in [[ExtensionQueries]]: integer
  * arithmetic or single-division IEEE expressions, strict left folds
  * mirrored by list_reduce, decimal-exact sums for means.
  */
object CurationQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Word 3-gram CTEs over `documents` directly (doc_id, text) —
    * distinct per doc; mirrors Dedup.shingles / WordShingles. */
  private val DocShingleCtes =
    """dwords AS (
       SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
              unnest(string_split(text, ' ')) AS w
       FROM documents),
     dsh3 AS (
       SELECT doc_id,
         w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
           || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS shingle,
         lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
       FROM dwords),
     dshingles AS (
       SELECT DISTINCT doc_id, shingle FROM dsh3 WHERE w3 IS NOT NULL)"""

  /** BPE merge-round CTE chain shared by the train and encode oracles:
    * word-frequency table → char symbols → 3 rounds of (pair count,
    * lexicographic-tie argmax t{k}, strict-left-fold merge w{k}). Each
    * w{k} applies the winning pair with the SAME fold as the Spark HOF
    * (list_reduce over single-element lists with an empty-accumulator
    * prepend; acc[-1] on the empty accumulator is NULL in DuckDB,
    * falling to ELSE exactly like the Spark short-circuit). */
  private def bpeRnd(k: Int): String = {
    val prev = s"w${k - 1}"
    s"""p$k AS (
       SELECT syms[i] AS lft, syms[i+1] AS rgt,
         CAST(SUM(cnt) AS BIGINT) AS pc
       FROM (SELECT cnt, syms, unnest(range(1, len(syms))) AS i
             FROM $prev WHERE len(syms) >= 2)
       GROUP BY 1, 2),
     t$k AS (SELECT lft, rgt, pc FROM p$k
             ORDER BY pc DESC, lft, rgt LIMIT 1),
     w$k AS (
       SELECT word, cnt,
         list_reduce(
           list_prepend(CAST([] AS VARCHAR[]),
             list_transform(syms, s -> [s])),
           (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = t.lft
                                 AND x[1] = t.rgt
                       THEN list_append(acc[1:len(acc)-1],
                              t.lft || t.rgt)
                       ELSE list_concat(acc, x) END) AS syms
       FROM $prev, t$k t)"""
  }

  private lazy val BpeCtes: String =
    s"""wd AS (
       SELECT w AS word, COUNT(*) AS cnt
       FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       GROUP BY 1),
     w0 AS (SELECT word, cnt,
       list_transform(range(1, len(word) + 1), i -> word[i:i]) AS syms
       FROM wd),
     ${bpeRnd(1)}, ${bpeRnd(2)}, ${bpeRnd(3)}"""

  /** DuckDB twin of one KMeansOp.assign pass: nearest centroid from
    * `centCte` (cluster_id, c) for every vector in `embCte` (vec_id, e). */
  private def sqlAssignOn(embCte: String, centCte: String): String =
    s"""SELECT vec_id, e, cluster_id FROM (
        SELECT $embCte.vec_id, $embCte.e, $centCte.cluster_id,
          ROW_NUMBER() OVER (PARTITION BY $embCte.vec_id ORDER BY
            list_reduce(list_transform(range(1, len($embCte.e) + 1),
              j -> ($embCte.e[j] - $centCte.c[j]) *
                   ($embCte.e[j] - $centCte.c[j])),
              (acc, x) -> acc + x) ASC,
            $centCte.cluster_id) AS rn
        FROM $embCte CROSS JOIN $centCte) WHERE rn = 1"""

  private def sqlAssign(centCte: String): String = sqlAssignOn("emb", centCte)

  /** DuckDB twin of one KMeansOp.update pass over assignment CTE `a`:
    * per-dim decimal-exact means re-listed into centroid arrays. */
  private def sqlUpdate(a: String): String =
    s"""SELECT cluster_id, list(cx ORDER BY i) AS c FROM (
        SELECT cluster_id, i,
          CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS cx
        FROM (SELECT cluster_id, generate_subscripts(e, 1) AS i,
                     unnest(e) AS x FROM $a)
        GROUP BY 1, 2) GROUP BY 1"""

  /** Shared k-means CTE chain (2 unrolled Lloyd iterations to the final
    * assignment a2) parameterized over the `emb` source CTE — prefix of
    * the kmeans_train / ann_ivf_trained / dedup_semantic oracles. */
  private def kmeansChain(embCte: String): String =
    s"""$embCte,
       seeds AS (SELECT vec_id, e FROM emb ORDER BY vec_id LIMIT 4),
       c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER)
                AS cluster_id, e AS c FROM seeds),
       a1 AS (${sqlAssign("c0")}),
       c1 AS (${sqlUpdate("a1")}),
       a2 AS (${sqlAssign("c1")})"""

  /** DuckDB twin of one Curation.trainProbe gradient pass over `src`
    * (rows carrying x0..x8 + diff): 9 decimal-exact per-dim gradient
    * sums + the squared loss. */
  private def probeGradCte(src: String, name: String, loss: String) =
    s"""$name AS (SELECT ${(0 until 9).map(j =>
         s"CAST(SUM(CAST(x$j * diff AS DECIMAL(38,0))) AS BIGINT) AS g$j")
         .mkString(", ")},
       CAST(SUM(CAST(diff * diff AS DECIMAL(38,0))) AS BIGINT) AS $loss
       FROM $src)"""

  /** Shared CTE chain of the linear-probe oracles: featurize (token-
    * length buckets + bias + micro-scaled en label, lang carried for the
    * scoring rollup), two unrolled GD iterations to weights w1/w2 with
    * the same truncate-toward-zero /2^22 update as the Scala trainer. */
  private lazy val ProbeCtes: String = {
    val D = Curation.LrDen
    def sdiv(e: String) =
      s"(CASE WHEN ($e) >= 0 THEN ($e) // $D ELSE -((-($e)) // $D) END)"
    val dims = 0 until 9
    val featCols = (0 until 8).map(j =>
      s"CAST(len(list_filter(string_split(text, ' '), t -> len(t) % 8 = $j)) AS BIGINT) AS x$j")
      .mkString(", ")
    s"""feat AS (
         SELECT lang, $featCols, CAST(1 AS BIGINT) AS x8,
           CAST(CASE WHEN lang = 'en' THEN 1000000 ELSE 0 END AS BIGINT)
             AS ys
         FROM documents),
       p1 AS (SELECT *, (0 - ys) AS diff FROM feat),
       ${probeGradCte("p1", "g1", "loss0")},
       w1 AS (SELECT ${dims.map(j => s"(0 - ${sdiv(s"g$j")}) AS w$j")
      .mkString(", ")} FROM g1),
       p2 AS (SELECT f.*, (${dims.map(j => s"f.x$j * w1.w$j")
      .mkString(" + ")}) - f.ys AS diff FROM feat f CROSS JOIN w1),
       ${probeGradCte("p2", "g2", "loss1")},
       w2 AS (SELECT ${dims.map(j => s"(w1.w$j - ${sdiv(s"g2.g$j")}) AS w$j")
      .mkString(", ")} FROM w1, g2)"""
  }

  private def kmeansCtes: String = kmeansChain(
    """emb AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings)""")

  /** Prefixed kmeans chain (2 Lloyd iterations to final assignment
    * ${p}a2 + trained codebook ${p}c2) over the [lo:hi] sub-slice of
    * `emb` — the per-subspace PQ codebook trainer. Prefixing lets two
    * chains coexist in one WITH clause. */
  private def pqChain(p: String, lo: Int, hi: Int): String =
    s"""${p}emb AS (SELECT vec_id, e[$lo:$hi] AS e FROM emb),
       ${p}seeds AS (SELECT vec_id, e FROM ${p}emb ORDER BY vec_id LIMIT 4),
       ${p}c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INTEGER)
                AS cluster_id, e AS c FROM ${p}seeds),
       ${p}a1 AS (${sqlAssignOn(s"${p}emb", s"${p}c0")}),
       ${p}c1 AS (${sqlUpdate(s"${p}a1")}),
       ${p}a2 AS (${sqlAssignOn(s"${p}emb", s"${p}c1")}),
       ${p}c2 AS (${sqlUpdate(s"${p}a2")})"""

  /** data_profile's column list — ONE definition shared by the Spark
    * plan and its DuckDB oracle (the "keep adjacent so they cannot
    * drift" convention): a documents-schema change breaks both sides
    * loudly and symmetrically instead of desynchronizing the compare. */
  private val ProfileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  val queries: Map[String, Q] = Map(
    // overlapping token-window chunking (context windows for training)
    "text_chunk" -> ((s, dir) => {
      Curation.chunk(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id", "chunk_idx")
    }),

    // weighted per-source mixing with a broadcast policy table
    "data_mix_weighted" -> ((s, dir) => {
      Curation.mixBySource(Tables.table(s, dir, "documents"), "doc_id", "source")
        .orderBy("source")
    }),

    // benchmark decontamination: shared word-3-gram flagging
    "text_decontaminate" -> ((s, dir) => {
      Curation.decontaminate(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // pack-and-split sequence packing via distributed prefix sum
    "doc_pack" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      Curation.packBins(d, "doc_id", size(split(col("text"), " ")), 256L)
        .orderBy("bin")
    }),

    // Token-budget selection — "fill 10k tokens with the best documents":
    // rank the corpus by an exact integer quality score (stopword density
    // in millionths — integral division, no float anywhere), take the
    // prefix whose INCLUSIVE running token sum fits the budget. The
    // running sum is the two-phase distributed prefix sum
    // (Curation.runningSum — range shuffle + per-partition window +
    // #partitions-sized driver fold), never a single-partition window,
    // so the selection scales to a corpus-wide cut at 100 TB: the budget
    // knob is how a pretraining run sizes a data mixture to a token
    // target rather than a document count.
    "curate_token_budget" -> ((s, dir) => {
      val toks = split(col("text"), " ")
      val base = Tables.table(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(filter(toks, w =>
          w.isin(TextAnalysis.Stopwords.map(lit(_)): _*))).cast("long")
          .as("n_stop"))
        .withColumn("quality_milli",
          expr("(n_stop * 1000000) div n_tokens"))
      Curation.runningSum(base,
          Seq(col("quality_milli").desc, col("doc_id").asc),
          col("n_tokens"), "cum_tokens")
        .where(col("cum_tokens") <= 10000L)
        .select(col("doc_id"), col("quality_milli"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy("doc_id")
    }),

    // In-engine classifier training (Curation.linearProbe): a linear
    // en-vs-rest probe on token-length-bucket features, trained by TWO
    // unrolled full-batch GD iterations in exact fixed-point integer
    // arithmetic — per-dim gradients fold map-side through decimal
    // sums, weights come back as inlined literals, the loop is one scan
    // + one 10-scalar reduce per iteration (textbook data-parallel GD).
    // loss0 > loss1 > loss2 in the output rows is the visible descent.
    "curate_train_classifier" -> ((s, dir) => {
      Curation.linearProbe(Tables.table(s, dir, "documents"), "text",
          when(col("lang") === "en", 1L).otherwise(0L))
        .orderBy("dim")
    }),

    // the trained probe APPLIED (Curation.linearProbeScore): every doc
    // scored map-only with the literal-inlined final weights, rolled up
    // per language — the separation report an operator reads before
    // letting the probe gate a corpus (here it reveals WEAK separation:
    // the synthetic corpus carries no language-specific vocabulary, so
    // the probe mostly learns length — exactly the go/no-go answer the
    // report exists to give).
    "curate_classifier_score" -> ((s, dir) => {
      Curation.linearProbeScore(Tables.table(s, dir, "documents"), "text",
          when(col("lang") === "en", 1L).otherwise(0L), "lang")
        .orderBy("lang")
    }),

    // duplicate-3-gram repetition fraction + keep flag (Gopher-rule family)
    "text_rep_ngrams" -> ((s, dir) => {
      Curation.repeatedNgrams(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Gini character diversity + word repetition (bit-exact arithmetic)
    "text_char_diversity" -> ((s, dir) => {
      Curation.charDiversity(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // IVF ANN over TRAINED centroids — the loop KMeansOp's scaladoc
    // promises closed: fit() trains the coarse quantizer, queries route
    // to their nearest trained centroid (same L2 metric as training),
    // exact cosine top-5 within that cell's members only. Sublinear like
    // ann_ivf_topk, but the cells come from the data, not the labels.
    "ann_ivf_trained" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .cache()
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val cents = KMeansOp.update(assigned, "embedding")
      val q = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val routed = KMeansOp.assign(
        q.withColumnRenamed("q_emb", "embedding"), cents, "q_id", "embedding")
        .select(col("q_id"), col("embedding").as("q_emb"),
          col("cluster_id"))
      val cos = graft.expressions.CosineSimilarity.cosineSim(s) _
      val wk = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      routed.join(assigned.select(col("vec_id"), col("embedding"),
          col("cluster_id")), Seq("cluster_id"))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("cos", round(cos(col("q_emb"), col("embedding")), 6))
        .withColumn("rnk", row_number().over(wk))
        .where(col("rnk") <= 5)
        .select(col("q_id"), col("cluster_id").cast("long").as("cluster_id"),
          col("rnk"), col("vec_id"), col("cos"))
        .orderBy("q_id", "rnk")
    }),

    // kNN JOIN — both sides LARGE (the shape ann_* probe queries never
    // exercise: there is no small query set to broadcast). Every vector
    // finds its top-3 neighbors among vectors of its own trained IVF
    // cell: the join shuffles BOTH sides on cluster_id (cell
    // co-partitioning), pair count is Σ|cell|² instead of N², and the
    // per-cell top-k rides the RankLimitToTopK rewrite (partial heaps
    // map-side, no full pair sort). This is the kernel of embedding-
    // corpus self-analysis at 100 TB — kNN-graph construction,
    // duplicate-cluster seeding, hubness audits — where "broadcast the
    // queries" is not an option because the queries ARE the corpus.
    // Recall is bounded by cell purity exactly as in IVF serving
    // (nprobe=1 here); the oracle replays the same routing, so the
    // check is exact.
    "ann_knn_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .cache()
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val cos = graft.expressions.CosineSimilarity.cosineSim(s) _
      val left = assigned.select(col("cluster_id"),
        col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val right = assigned.select(col("cluster_id"), col("vec_id"),
        col("embedding"))
      val wk = Window.partitionBy(col("q_id"))
        .orderBy(col("cos_x").desc, col("vec_id"))
      left.join(right, Seq("cluster_id"))
        .where(col("vec_id") =!= col("q_id"))
        // rank on the UNROUNDED cosine (identical fold order ⇒ identical
        // bits in both engines); round only the emitted column
        .withColumn("cos_x", cos(col("q_emb"), col("embedding")))
        .withColumn("rnk", row_number().over(wk))
        .where(col("rnk") <= 3)
        .select(col("q_id"), col("cluster_id").cast("long").as("cluster_id"),
          col("rnk"), col("vec_id"), round(col("cos_x"), 6).as("cos"))
        .orderBy("q_id", "rnk")
    }),

    // RANGE (radius) search — the API sibling of top-k: ALL pairs within
    // a cosine threshold inside each trained IVF cell, not a fixed k per
    // probe. Same cell-co-partitioned join as ann_knn_join (Σ|cell|²
    // pairs, no broadcastable side); the threshold test runs on the
    // UNROUNDED cosine (identical IEEE fold both engines) with the
    // emitted value rounded, and a pair-count guard keeps ties off the
    // cut: the boundary is a strict > on a value both engines derive
    // bit-identically. This is the duplicate-radius query (find
    // everything closer than τ) a dedup pass runs where top-k would
    // miss high-multiplicity clusters.
    "ann_range_search" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .cache()
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val cos = graft.expressions.CosineSimilarity.cosineSim(s) _
      val left = assigned.select(col("cluster_id"),
        col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val right = assigned.select(col("cluster_id"), col("vec_id"),
        col("embedding"))
      left.join(right, Seq("cluster_id"))
        .where(col("vec_id") > col("a_id")) // each unordered pair once
        .withColumn("cos_x", cos(col("a_emb"), col("embedding")))
        .where(col("cos_x") > lit(0.45))
        .select(col("a_id"), col("vec_id").as("b_id"),
          col("cluster_id").cast("long").as("cluster_id"),
          round(col("cos_x"), 6).as("cos"))
        .orderBy("a_id", "b_id")
    }),

    // PageRank quality prior: 2 unrolled power iterations over the
    // deterministic citation graph (decimal-exact contribution sums)
    "doc_pagerank" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val n = docs.count() // O(1) scalar to the driver (graph modulus)
      val edges = graft.operators.PageRank.syntheticLinks(docs, "doc_id", n)
      graft.operators.PageRank.ranks(docs, edges, "doc_id", n, 2)
        .select(col("id").as("doc_id"), round(col("rank"), 9).as("rank"))
        .orderBy("doc_id")
    }),

    // trigram LM estimation: conditional probabilities from exact counts
    "lm_trigram_counts" -> ((s, dir) => {
      graft.operators.LangModel
        .trigramProbs(Tables.table(s, dir, "documents"), "doc_id", "text")
        .select(col("w1"), col("w2"), col("w3"), col("c3"), col("c2"),
          col("prob"))
        .orderBy("w1", "w2", "w3")
    }),

    // BPE tokenizer training: 3 unrolled merge rounds over the
    // word-frequency table — the corpus is exploded exactly once
    "lm_bpe_train" -> ((s, dir) => {
      graft.operators.LangModel
        .bpeTrain(Tables.table(s, dir, "documents"), "text", 3)
        .orderBy("rnd")
    }),

    // BPE tokenizer APPLICATION: vocab-level encode + per-doc join —
    // the train→apply loop closed (tokens + exact symbol checksum)
    "lm_bpe_encode" -> ((s, dir) => {
      graft.operators.LangModel
        .bpeEncode(Tables.table(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("doc_id")
    }),

    // perplexity-style doc scoring under the corpus trigram model
    "lm_doc_score" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val probs = graft.operators.LangModel
        .trigramProbs(docs, "doc_id", "text")
      graft.operators.LangModel.docLmScore(docs, "doc_id", "text", probs)
        .orderBy("doc_id")
    }),

    // END-TO-END curation pipeline — the operators composed the way a
    // real corpus run chains them, in ONE declarative plan Catalyst
    // optimizes as a whole: repetition gate → diversity gate → exact
    // dedup (keep canonical copy) → weighted source mixing → split
    // assignment → per-split audit counts. Each stage is individually
    // oracle-proven; this pins that they COMPOSE (column contracts,
    // filter interactions) and that the composite stays one pipeline:
    // the gates and hashes are map-side, dedup adds the one groupBy.
    // Deterministic epoch shuffling — the training-reproducibility op:
    // each epoch orders the packed bins by an affine integer key
    // (bin·2654435761 + epoch·40503 mod 2^32, the Knuth/xxhash
    // constants), so the schedule is a pure function of (data, epoch) —
    // re-runs and failure recovery see the identical order, no RNG
    // state anywhere. One range shuffle per epoch (the sort), nothing
    // else; at 100 TB this is exactly how you shuffle 10^9 sequences
    // without a shuffle buffer. Ties (none at these sizes, possible at
    // 2^32-scale bins) break on the bin id — still deterministic.
    "data_shuffle_epochs" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.table(s, dir, "documents")
      val bins = Curation
        .packBins(d, "doc_id", size(split(col("text"), " ")), 256L)
        .select(col("bin"))
      val epochs = bins.crossJoin(broadcast(Seq(0L, 1L).toDF("epoch")))
      val key = pmod(col("bin") * lit(2654435761L) +
        col("epoch") * lit(40503L), lit(4294967296L))
      epochs
        .withColumn("position", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("epoch")).orderBy(key, col("bin"))))
        .select(col("epoch"), col("position").cast("long").as("position"),
          col("bin"))
        .orderBy("epoch", "position")
    }),

    // Stride-scheduled source interleaving — the mixture SCHEDULE (not
    // the sample): each source advances a virtual clock by L/weight per
    // doc (L = lcm of the weights keeps every tick an exact integer),
    // and the global order merges on that clock — a weight-4 source
    // appears 4× as often as weight-1, evenly spread, deterministically.
    // One rank per source (partitioned window) + one global sort; no
    // RNG, no driver loop.
    "data_mix_schedule" -> ((s, dir) => {
      val wSrc = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          (pmod(regexp_extract(col("source"), "([0-9]+)$", 1).cast("long"),
            lit(4L)) + 1L).as("w"))
      val ticked = d
        .withColumn("rn", row_number().over(wSrc).cast("long"))
        // L = lcm(1..4) = 12; v = rn * (12 / w) is an exact integer
        .withColumn("vtime", col("rn") * (lit(12L) / col("w")).cast("long"))
      // head of the schedule via sort+limit (a PARALLEL range sort, not
      // a single-partition global window); position then numbers the
      // 200-row result, where a one-partition window is free
      ticked
        .orderBy(col("vtime"), col("source"), col("doc_id"))
        .limit(200)
        .withColumn("position", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("vtime"), col("source"), col("doc_id")))
          .cast("long"))
        .select(col("position"), col("vtime"), col("source"), col("doc_id"))
        .orderBy("position")
    }),

    // pretraining-corpus capstone: substring-dedup CLEAN the corpus
    // (span removal, not doc dropping) -> length gate on what remains
    // -> decontaminate the cleaned text against the benchmark slice ->
    // pack survivors into training sequences. The spans/shingles stages
    // each add one key-aggregate + one join; the packer adds its single
    // range shuffle; everything else is map-side — O(tokens) at any
    // scale, like each stage individually.
    "pipeline_pretrain" -> ((s, dir) => {
      val docs = Tables.table(s, dir, "documents")
      val cleaned = graft.operators.Dedup
        .removeDuplicatedSpans(docs, "doc_id", "text")
        .where(col("n_after") >= 30)
        .select(col("doc_id"), col("text_clean"), col("n_after"))
      val contaminated = Curation.decontaminate(
          cleaned.select(col("doc_id"), col("text_clean").as("text")),
          "doc_id", "text")
        .select(col("doc_id"))
      val train = cleaned
        .where(!Curation.isBenchmark(col("doc_id")))
        .join(contaminated, Seq("doc_id"), "left_anti")
      Curation.packBins(train, "doc_id", col("n_after"), 2048L)
        .orderBy("bin")
    }),

    "pipeline_curate" -> ((s, dir) => {
      val docs = Tables.fanout(Tables.table(s, dir, "documents"))
      val gated = Curation.repeatedNgrams(docs, "doc_id", "text")
        .where(col("keep"))
        .join(docs, "doc_id")
        .join(Curation.charDiversity(docs, "doc_id", "text")
          .where(col("char_gini") >= 0.9).select(col("doc_id")), "doc_id")
      // exact dedup as keep-first-copy: the min doc_id of each text wins
      val canonical = gated.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"))
      val kept = canonical.join(docs, Seq("doc_id"))
        .withColumn("suffix_mod",
          pmod(regexp_extract(col("source"), "([0-9]+)$", 1).cast("int"),
            lit(Curation.MixPermille.size)))
        .join(broadcast({
          import s.implicits._
          Curation.MixPermille.toDF("suffix_mod", "permille")
        }), "suffix_mod")
        .where(Curation.mixHash(col("doc_id")) < col("permille"))
      kept
        .select(col("doc_id"),
          graft.operators.Embeddings.assignSplit(col("doc_id")).as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"))
        .orderBy("split")
    }),

    // Curation PROVENANCE — the row-level "why did my document
    // disappear" audit every production pipeline ends up needing:
    // for EVERY input doc, the FIRST pipeline_curate gate that dropped
    // it (repetition → diversity → exact-duplicate → mixdown) or
    // 'kept'. Same gates, same order, same constants as the capstone —
    // but instead of surviving rows it emits the complement with
    // attribution. All gates stay in their capstone shapes (map-side
    // flags, one text-keyed canonical agg, broadcast mix table); the
    // when-chain is the only addition, so provenance costs what the
    // pipeline already cost.
    "pipeline_provenance" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.fanout(Tables.table(s, dir, "documents"))
      val rep = Curation.repeatedNgrams(docs, "doc_id", "text")
        .select(col("doc_id"), col("keep").as("rep_ok"))
      val gin = Curation.charDiversity(docs, "doc_id", "text")
        .select(col("doc_id"), (col("char_gini") >= 0.9).as("gini_ok"))
      val base = docs.join(rep, "doc_id").join(gin, "doc_id")
      val canon = base.where(col("rep_ok") && col("gini_ok"))
        .groupBy(col("text")).agg(min(col("doc_id")).as("canon_id"))
      val mixTable = broadcast(
        Curation.MixPermille.toDF("suffix_mod", "permille"))
      base
        .join(canon, Seq("text"), "left")
        .withColumn("suffix_mod",
          pmod(regexp_extract(col("source"), "([0-9]+)$", 1).cast("int"),
            lit(Curation.MixPermille.size)))
        .join(mixTable, Seq("suffix_mod"), "left")
        .withColumn("verdict",
          when(!col("rep_ok"), "repetition")
            .when(!col("gini_ok"), "diversity")
            .when(col("doc_id") =!= col("canon_id"), "duplicate")
            .when(Curation.mixHash(col("doc_id")) >= col("permille"),
              "mixdown")
            .otherwise("kept"))
        .select(col("doc_id"), col("verdict"))
        .orderBy("doc_id")
    }),

    // ratio-form PMI collocations: phrase-mining over adjacent pairs
    "lm_pmi_bigrams" -> ((s, dir) => {
      graft.operators.LangModel
        .pmiBigrams(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("rnk")
    }),

    // per-language dataset-card report (rank-based exact median)
    "corpus_stats_report" -> ((s, dir) => {
      Curation.corpusReport(Tables.table(s, dir, "documents"),
          "lang", "doc_id", "text")
        .orderBy("stratum")
    }),

    // tokenizer-precursor vocabulary: top-100 words, rank + coverage
    "lm_vocab_topk" -> ((s, dir) => {
      graft.operators.LangModel
        .vocabTopK(Tables.table(s, dir, "documents"), "text")
        .orderBy("rnk")
    }),

    // OOV coverage (LangModel.oovRate): per-doc out-of-vocabulary rate
    // against the corpus' own top-100 vocab — the number a vocab-size
    // decision reads. Vocab inlined as literals → the per-doc pass is
    // map-only (no explode, no join); exact integer permille.
    "lm_oov_rate" -> ((s, dir) => {
      graft.operators.LangModel
        .oovRate(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // self-calibrating stratified sampling: per-language rates derived
    // from the data (downsample every stratum toward the smallest)
    "data_sample_stratified" -> ((s, dir) => {
      Curation.stratifiedSample(Tables.table(s, dir, "documents"),
          "doc_id", "lang")
        .orderBy("stratum")
    }),

    // Matryoshka truncation + L2 renorm, flat (vec_id, dim) shape
    "emb_truncate_norm" -> ((s, dir) => {
      graft.operators.Embeddings
        .truncateRenorm(Tables.table(s, dir, "embeddings"))
        .orderBy("vec_id", "i")
    }),

    // SemDeDup: the k-means fit is the blocking structure — semantic
    // near-dups found inside TRAINED cells (cluster-mate with
    // cosine ≥ 0.9 and a smaller id ⇒ this vector is a duplicate).
    // Runs on the planted-near-dup corpus so the assertion is
    // non-vacuous (the raw table has NO cos ≥ 0.9 pairs — checked).
    "dedup_semantic" -> ((s, dir) => {
      val emb = graft.sources.ExtCorpus.embCorpus(s, dir)
        .select(col("vec_id"), col("embedding")).cache()
      // cached: the self-join scans the assignment TWICE (a and b sides)
      // and would otherwise run the whole unrolled fit per side
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val cos = graft.expressions.CosineSimilarity.cosineSim(s) _
      graft.operators.Dedup.semanticDedup(assigned, 0.9, cos)
        .select(col("vec_id"), col("cluster_id").cast("long").as("cluster_id"),
          col("dup_of"), col("n_dups"), col("max_cos"))
        .orderBy("vec_id")
    }),

    // winnowing (MOSS) local fingerprints: windowed-min 3-gram hashes
    "text_winnow" -> ((s, dir) => {
      graft.operators.TextAnalysis
        .winnowFingerprints(Tables.table(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // k-means centroid training: 2 unrolled Lloyd iterations, k=4.
    // The casted corpus is cached: every assign pass re-scans it (like a
    // real trainer would — per-query lifecycle, see Bench).
    "kmeans_train" -> ((s, dir) => {
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .cache()
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val sizes = assigned.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"))
      KMeansOp.updatePerDim(assigned, "embedding")
        .join(sizes, "cluster_id")
        .select(col("cluster_id").cast("long").as("cluster_id"),
          col("i").cast("long").as("i"),
          round(col("cx"), 6).as("cx"),
          col("n_members"))
        .orderBy("cluster_id", "i")
    }),

    // Custom table-generating expression (Catalyst Generator tier):
    // sliding token windows emitted as ROWS by `sliding_windows` inside
    // the scan's Generate node — the UDTF extension path. Per-doc
    // window count + an order-sensitive fold_hash checksum over each
    // window's joined text prove content AND order of every generated
    // row. Map-side except the one per-doc aggregation.
    "q_generator_windows" -> ((s, dir) => {
      graft.expressions.ShingleOps.ensureRegistered(s)
      Tables.fanout(Tables.table(s, dir, "documents"))
        .select(col("doc_id"),
          expr("sliding_windows(split(text, ' '), 8, 4)").as(
            Seq("win_idx", "window")))
        .select(col("doc_id"), col("win_idx"),
          expr("fold_hash(array_join(window, ' '))").as("h"),
          size(col("window")).as("wlen"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_windows"),
          sum(col("h")).as("win_checksum"),
          max(col("wlen")).cast("long").as("max_wlen"),
          min(col("wlen")).cast("long").as("min_wlen"))
        .orderBy("doc_id")
    }),

    // Product-quantization ANN (FAISS-PQ shape): the embedding splits
    // into M=2 subspaces, each with its OWN trained k=4 codebook
    // (KMeansOp, 2 unrolled Lloyd iterations on the sub-vectors); every
    // vector compresses to M codebook ids. A query computes one M×k
    // distance TABLE (strict-fold sqdist of its sub-vectors against each
    // sub-centroid — broadcast-sized), and asymmetric distance (ADC) is
    // a table lookup sum: dist(q, x) ≈ dt0[q, code0(x)] + dt1[q,
    // code1(x)]. The corpus is scanned in CODE space — no full-width
    // vector math per (q, x) pair — which is the compressed-domain
    // search tier between IVF routing and exact rerank at 100 TB: codes
    // are M bytes per vector, the tables are per-query constants, and
    // the scan is two broadcast joins + a per-query top-k window.
    "ann_pq_adc" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .cache()
      val subs = Seq(0, 1).map { m =>
        val sub = emb.select(col("vec_id"),
          slice(col("e"), m * 16 + 1, 16).as("se"))
        val assigned = KMeansOp.fit(sub, "vec_id", "se", 4, 2).cache()
        val cents = KMeansOp.update(assigned, "se")
        (assigned.select(col("vec_id"),
          col("cluster_id").as(s"code$m")), cents)
      }
      val codes = subs(0)._1.join(subs(1)._1, "vec_id")
      val queries = graft.operators.AnnIndex.stdQuerySet(s, dir)
      val dts = Seq(0, 1).map { m =>
        queries.crossJoin(broadcast(subs(m)._2))
          .select(col("q_id"), col("cluster_id").as(s"code$m"),
            KMeansOp.sqDist(slice(col("qe"), m * 16 + 1, 16), col("centroid"))
              .as(s"d$m"))
      }
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("adist"), col("vec_id"))
      codes
        .join(broadcast(dts(0)), "code0")
        .join(broadcast(dts(1)), Seq("q_id", "code1"))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("adist", col("d0") + col("d1"))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"),
          round(col("adist"), 6).as("adist"))
        .orderBy("q_id", "rnk")
    }),

    // Single-pass table profile: per-column row/null/distinct counts and
    // min/max — the data-quality report every ingest runs first. ONE
    // scan: all columns' stats in one aggregate (the multi-countDistinct
    // compiles to a single Expand pass, rows x columns, still one read
    // of the table), then stack() to long form. At 100 TB swap the exact
    // distincts for approx_count_distinct; everything else is already a
    // mergeable partial.
    "data_profile" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
      val cols = ProfileCols
      val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { f =>
        Seq(count(col(f)).as(s"cnt_$f"),
          countDistinct(col(f)).as(s"nd_$f"),
          min(col(f)).cast("string").as(s"min_$f"),
          max(col(f)).cast("string").as(s"max_$f"))
      }
      d.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${cols.size}, " + cols.map(f =>
            s"'$f', n_rows, n_rows - cnt_$f, nd_$f, min_$f, max_$f")
          .mkString(", ") +
          ") as (col_name, n_rows, n_null, n_distinct, min_repr, max_repr)")
        .orderBy("col_name")
    }),

    // Prototype-distance pruning (SSL-prototypes shape): each vector's
    // squared distance to its TRAINED cluster centroid ranks how
    // (a)typical it is; the per-cluster top-5 farthest are the prune/
    // keep candidates a curation pass acts on. One broadcast join
    // (k centroids) + one per-cluster top-k — the same row_number idiom
    // the RankLimitToTopK rule rewrites to the native k-heap.
    "data_prune_prototypes" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val assigned = KMeansOp.fit(emb, "vec_id", "embedding", 4, 2).cache()
      val cents = KMeansOp.update(assigned, "embedding")
      val w = Window.partitionBy(col("cluster_id"))
        .orderBy(col("dist").desc, col("vec_id"))
      // rank on the UNROUNDED distance (identical strict-fold bits in
      // both engines); round only at output — round(double) is not
      // cross-engine order-stable at the rounding boundary
      assigned.join(broadcast(cents), "cluster_id")
        .withColumn("dist", KMeansOp.sqDist(col("embedding"), col("centroid")))
        .withColumn("rnk", row_number().over(w))
        .where(col("rnk") <= 5)
        .select(col("cluster_id").cast("long").as("cluster_id"),
          col("rnk"), col("vec_id"), round(col("dist"), 6).as("dist"))
        .orderBy("cluster_id", "rnk")
    }),

    // IVFADC (FAISS IVF+PQ composed): the 100 TB serving shape. The
    // trained coarse quantizer routes each query to its nearest cell
    // (nprobe=2 — recall insurance the pure-PQ scan doesn't need,
    // since cell edges are where ADC loses neighbors), the scan then
    // touches ONLY the routed cells' inverted lists, and distance is
    // PQ-compressed ADC: per-query M×k lookup tables, corpus read in
    // code space. A final exact-cosine rerank over the ADC top-50
    // restores metric fidelity — the standard two-stage ANN contract
    // (compressed recall, exact precision). Every join is broadcast
    // (routing pairs, distance tables); the only corpus-sized pass is
    // the code scan.
    "ann_ivf_pq" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.table(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
        .cache()
      // coarse quantizer over the full 32-dim vectors
      val coarse = KMeansOp.fit(emb, "vec_id", "e", 4, 2).cache()
      val coarseCents = KMeansOp.update(coarse, "e")
      // per-subspace PQ codebooks (M=2, k=4), as in ann_pq_adc
      val subs = Seq(0, 1).map { m =>
        val sub = emb.select(col("vec_id"), slice(col("e"), m * 16 + 1, 16).as("se"))
        val assigned = KMeansOp.fit(sub, "vec_id", "se", 4, 2).cache()
        val cents = KMeansOp.update(assigned, "se")
        (assigned.select(col("vec_id"), col("cluster_id").as(s"code$m")), cents)
      }
      // inverted lists: every vector's PQ codes tagged with its cell
      val codes = subs(0)._1.join(subs(1)._1, "vec_id")
        .join(coarse.select(col("vec_id"), col("cluster_id").as("cell")), "vec_id")
      val queries = graft.operators.AnnIndex.stdQuerySet(s, dir)
      // nprobe=2 routing against the trained coarse centroids
      val wr = Window.partitionBy(col("q_id"))
        .orderBy(col("cdist"), col("cell"))
      val routed = queries.crossJoin(broadcast(
          coarseCents.select(col("cluster_id").as("cell"), col("centroid"))))
        .withColumn("cdist", KMeansOp.sqDist(col("qe"), col("centroid")))
        .withColumn("crn", row_number().over(wr))
        .where(col("crn") <= 2)
        .select(col("q_id"), col("cell"))
      // per-query ADC lookup tables
      val dts = Seq(0, 1).map { m =>
        queries.crossJoin(broadcast(subs(m)._2))
          .select(col("q_id"), col("cluster_id").as(s"code$m"),
            KMeansOp.sqDist(slice(col("qe"), m * 16 + 1, 16), col("centroid"))
              .as(s"d$m"))
      }
      val wa = Window.partitionBy(col("q_id"))
        .orderBy(col("adist"), col("vec_id"))
      val adcTop = codes
        .join(broadcast(routed), "cell")
        .join(broadcast(dts(0)), Seq("q_id", "code0"))
        .join(broadcast(dts(1)), Seq("q_id", "code1"))
        .where(col("vec_id") =!= col("q_id"))
        .withColumn("adist", col("d0") + col("d1"))
        .withColumn("arn", row_number().over(wa))
        .where(col("arn") <= 50)
        .select(col("q_id"), col("vec_id"))
      // exact rerank of the ADC shortlist (50 rows/query — broadcast)
      val cos = graft.expressions.CosineSimilarity.cosineSim(s) _
      val wf = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      adcTop
        .join(queries, "q_id")
        .join(emb, "vec_id")
        .withColumn("cos", round(cos(col("qe"), col("e")), 6))
        .withColumn("rnk", row_number().over(wf))
        .where(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
        .orderBy("q_id", "rnk")
    }),

    // IVFADC with SPLIT train/serve — the real serving shape: the coarse
    // quantizer, PQ codebooks, and cell-partitioned inverted lists are a
    // manifest-committed index artifact trained ONCE per corpus
    // (AnnIndex.train); the query-time plan loads them and only routes,
    // ADC-scans the routed cells, and reranks — zero k-means iterations
    // in the serving plan (PqServePlanSpec pins that). Training math is
    // identical to ann_ivf_pq's inline version, so the results — and the
    // DuckDB oracle — are shared bit-for-bit.
    "ann_ivf_pq_served" -> ((s, dir) => {
      val idx = graft.operators.AnnIndex.trainedIndexDir(s, dir)
      val emb = graft.operators.AnnIndex.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      graft.operators.AnnIndex.serve(s, idx, queries, emb)
        .orderBy("q_id", "rnk")
    }),

    // Quantization-quality audit of the trained index — the NUMERIC
    // codebook-drift signal behind the rebuild schedule: per-subspace
    // SSE between every live vector and its assigned PQ centroid, from
    // the artifact + exact vectors. No training, no pairwise shape —
    // one codes scan + a broadcast of k·subDim centroid scalars per
    // subspace. Distances are the assignment's own strict-fold doubles
    // summed through DECIMAL (order-independent, engine-identical).
    "ann_pq_error" -> ((s, dir) => {
      val idx = graft.operators.AnnIndex.trainedIndexDir(s, dir)
      val emb = graft.operators.AnnIndex.embeddings(s, dir)
      graft.operators.AnnIndex.quantizationError(s, idx, emb)
        .orderBy("subspace")
    }),

    // Attribute-FILTERED vector search, exact tier: top-k cosine among
    // only the candidates passing a metadata predicate (label % 3 = 0)
    // — the predicate prunes the candidate side at the parquet scan
    // (pushed filter), then the same broadcast + partial-top-k-heaps
    // plan as ann_cosine_topk runs over the allowed subset. The exact
    // baseline the served tier's approximation is judged against.
    "ann_filtered_topk" -> ((s, dir) => {
      val src = Tables.table(s, dir, "embeddings")
      val emb = src.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val allowed = src.where(col("label") % 3 === 0)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
      graft.operators.Similarity.bruteForceTopK(queries, allowed, 5)
        .orderBy("q_id", "rnk")
    }),

    // Attribute-filtered search, SERVED tier — the vector-database
    // "filtered search" shape: the trained index carries `label` on its
    // code rows as a filterable attribute, and the predicate evaluates
    // INSIDE the routed cells' codes scan — disallowed vectors never
    // enter the ADC shortlist, so the query returns a full top-k of
    // allowed vectors at the same sublinear route+scan cost
    // (post-filtering an unfiltered top-k returns too few). Oracle:
    // the IVFADC pipeline with the filter applied at the same point —
    // approximation pinned exactly.
    "ann_filtered_served" -> ((s, dir) => {
      val idx = graft.operators.AnnIndex.trainedIndexDir(s, dir)
      val emb = graft.operators.AnnIndex.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      graft.operators.AnnIndex.serve(s, idx, queries, emb,
          filter = Some(col("label") % 3 === 0))
        .orderBy("q_id", "rnk")
    }),

    // Index observability, vector twin of text_index_profile: live
    // cell occupancy of the trained artifact's inverted lists — the
    // routing-quality audit (skew = hot probes + starved recall, the
    // signal that schedules a rebuild). Oracle: the k-means pipeline's
    // own final assignment, counted per cell.
    "ann_index_profile" -> ((s, dir) => {
      val idx = graft.operators.AnnIndex.trainedIndexDir(s, dir)
      graft.operators.AnnIndex.profile(s, idx).orderBy("cell")
    }),

    // Incremental ANN index maintenance driven by a REAL stream: base
    // slice trains the index, the remaining embeddings arrive in
    // micro-batches and are folded into the cell-partitioned inverted
    // lists per batch (frozen codebooks, manifest-committed segments,
    // replay-idempotent) — then the query serves from the maintained
    // index. Oracle: base-slice k-means training + frozen-codebook
    // encoding of the appended rows, then the same route/ADC/rerank.
    "stream_ann_index" -> ((s, dir) =>
      graft.streaming.CdcStream.streamAnnIndex(s, dir)
        .orderBy("q_id", "rnk")),

    // CDC-maintained ANN index (round-8 item 1): a real changelog of
    // adds (%10>=8), full-image re-embeds (%9, negated) and deletes
    // (%13) folds per micro-batch into tombstone + re-encode segments
    // against the frozen base codebooks (compaction mid-drain), then
    // serving runs over the post-apply corpus. Oracle: base training +
    // frozen-codebook encoding of the POST-APPLY state — maintained ≡
    // rebuilt.
    "stream_ann_index_cdc" -> ((s, dir) =>
      graft.streaming.CdcStream.streamAnnIndexCdc(s, dir)
        .orderBy("q_id", "rnk")),

    // Codebook-drift REBUILD policy end-to-end — the maintenance-policy
    // family's capstone: the CDC drain maintains BOTH the ANN index
    // (frozen-codebook applies against a deliberately small 20% base)
    // and the exact-vector store; the post-drain maintenance tick fires
    // AnnIndex.maybeRebuild from the manifest's additive mass partials
    // (abytes/ vs bytesBase — guard fails the query if it never does),
    // retraining on the live corpus read from the co-maintained
    // VecStore. Oracle: the IVFADC reproduction RETRAINED on the
    // post-apply corpus — the policy-fired rotation lands exactly what
    // a from-scratch build of the current corpus would.
    "stream_ann_index_autorebuild" -> ((s, dir) =>
      graft.streaming.CdcStream.streamAnnIndexAutoRebuild(s, dir)
        .orderBy("q_id", "rnk")),

    // Hybrid retrieval SERVED from the two maintained index artifacts
    // (round-8 item 2) — the production RAG query: the lexical tier
    // probes the manifest-committed inverted index (query-term buckets
    // only), the semantic tier routes the trained IVFADC index (no
    // k-means in the plan, codes scan pruned to routed cells), and the
    // two top-10 rankings fuse under the integer-exact RRF score. The
    // oracle reproduces both tiers end-to-end, so served results are
    // pinned exactly — including where the ANN tier's approximation
    // diverges from the brute-force tier of text_retrieval_hybrid.
    "text_retrieval_hybrid_served" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val textIdx = graft.operators.TextIndex.builtIndexDir(s, dir)
      val docs = Tables.table(s, dir, "documents")
      val qs = Tables.textProbeSet(s, dir)
      val lex = graft.operators.TextIndex
        .retrieve(s, textIdx, qs, k = 10, excludeSelf = true)
        .select(col("q_id"), col("doc_id"), col("rnk").as("lex_rnk"))
      val annIdx = graft.operators.AnnIndex.trainedIndexDir(s, dir)
      val emb = graft.operators.AnnIndex.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      val sem = graft.operators.AnnIndex
        .serve(s, annIdx, queries, emb, topK = 10)
        .select(col("q_id"), col("vec_id").as("doc_id"),
          col("rnk").as("sem_rnk"))
      graft.operators.Fusion.rrfFuse(lex, sem, k = 5).orderBy("q_id", "rnk")
    }),

    // The ONLINE hybrid serving loop: the same two maintained artifacts
    // behind a streaming trigger — per-batch bucket probes + routed
    // cells + integer RRF, epoch-idempotent output. Stateless per
    // query ⇒ stream ≡ batch: shares text_retrieval_hybrid_served's
    // oracle verbatim. Consistency contract: the two artifacts commit
    // independently, so fused results are changelog-consistent only
    // when their lastBatch watermarks agree — serve_skew_report is the
    // check a deployment runs beside this loop.
    "stream_hybrid_serve" -> ((s, dir) =>
      graft.streaming.CdcStream.streamServeHybrid(s, dir)
        .orderBy("q_id", "rnk")),

    // The full composition triangle: CDC → maintained indexes → hybrid
    // serving. Both artifacts carry an APPLIED changelog (text: % 7
    // updates / % 11 deletes; vectors: % 10 ≥ 8 adds, % 9 re-embeds,
    // % 13 deletes) with LIVE tombstone segments — the serving plan
    // must fold them at probe time, exactly the state a long-running
    // CDC consumer serves from between compactions. Oracle: both
    // post-apply tiers reproduced end-to-end (BM25 over the applied
    // corpus; base-trained frozen-codebook IVFADC over the applied
    // vectors) at top-10 + the shared integer RRF. Consistency
    // contract: the two artifacts commit independently; fused answers
    // are changelog-consistent only at equal lastBatch watermarks
    // (serve_skew_report surfaces the skew — these fixtures are
    // deliberately offset by one batch).
    "text_retrieval_hybrid_cdc" -> ((s, dir) => {
      val textIdx = graft.operators.TextIndex.cdcAppliedIndexDir(s, dir)
      val annIdx = graft.operators.AnnIndex.cdcAppliedIndexDir(s, dir)
      val docs = Tables.table(s, dir, "documents")
      val qs = Tables.textProbeSet(s, dir)
      val lex = graft.operators.TextIndex
        .retrieve(s, textIdx, qs, k = 10, excludeSelf = true)
        .select(col("q_id"), col("doc_id"), col("rnk").as("lex_rnk"))
      val emb = graft.operators.AnnIndex.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      val postEmb = emb.where(col("vec_id") % 13 =!= 0)
        .select(col("vec_id"),
          when(col("vec_id") % 9 === 0, transform(col("e"), x => -x))
            .otherwise(col("e")).as("e"))
      val sem = graft.operators.AnnIndex
        .serve(s, annIdx, queries, postEmb, topK = 10)
        .select(col("q_id"), col("vec_id").as("doc_id"),
          col("rnk").as("sem_rnk"))
      graft.operators.Fusion.rrfFuse(lex, sem, k = 5).orderBy("q_id", "rnk")
    }),

    // Artifact-skew observability for the hybrid serving loop (round-8
    // verdict item 5): hybrid fusion reads TWO independently committed
    // artifacts, and nothing in the fusion itself checks they have
    // consumed the changelog to the same point — a lagging tier would
    // silently serve a stale side. This report surfaces each tier's
    // lastBatch replay watermark straight from its manifest (an
    // O(retain)-small-files read, no data dir opened — the vacuum-
    // report pattern) plus the skew between them: the number a serving
    // deployment alerts on. Consistency contract: hybrid results are
    // only changelog-consistent when batch_skew = 0; the fixtures here
    // are deliberately skewed (text applied through batch 1, vectors
    // through batch 0) so the report is non-vacuous.
    // CONSISTENT-PREFIX hybrid serving (round-9 verdict item 2): the
    // same skewed CDC artifacts, fused at min(lexWm, semWm) — the
    // leading text tier serves its RETAINED batch-0 snapshot via the
    // manifest's time-travel read, the lagging ANN tier serves head.
    // Where serve_skew_report only OBSERVES the skew, this query acts
    // on it: fusion is changelog-consistent by construction, pinned by
    // an oracle built entirely at the common watermark.
    "stream_hybrid_serve_consistent" -> ((s, dir) =>
      graft.streaming.CdcStream.streamServeHybridConsistent(s, dir)
        .orderBy("q_id", "rnk")),

    "serve_skew_report" -> ((s, dir) => {
      import s.implicits._
      def wm(d: String): Long = graft.operators.SnapshotManifest
        .read(new java.io.File(d))
        .entries.get("lastBatch").map(_.toLong).getOrElse(-1L)
      val lexWm = wm(graft.operators.TextIndex.cdcAppliedIndexDir(s, dir))
      val semWm = wm(graft.operators.AnnIndex.cdcAppliedIndexDir(s, dir))
      Seq((lexWm, semWm, math.abs(lexWm - semWm)))
        .toDF("lex_last_batch", "sem_last_batch", "batch_skew")
    }),

    // DSIR importance weighting: hashed-bigram distribution match against
    // the src0 "target domain" — the resampling weight a 100 TB curation
    // run would feed to data_sample_stratified / data_mix_weighted.
    "data_dsir_weights" -> ((s, dir) => {
      graft.operators.Importance.dsirWeights(
          Tables.table(s, dir, "documents"), "doc_id", "text",
          col("source") === "src0")
        .orderBy("doc_id")
    })
  )

  /** The IVFADC serving oracle, parameterized by an optional predicate
    * on the codes CTE — the attribute-filter evaluation point: the
    * Spark plan filters the codes scan BEFORE the ADC shortlist
    * ranking, so the oracle must too. */
  private def ivfPqOracleWith(codesWhere: String): String = s"""
       WITH $kmeansCtes,
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       q AS (SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id)
         JOIN a2 m USING (vec_id)
         JOIN embeddings lb ON lb.vec_id = a.vec_id $codesWhere),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN emb m ON m.vec_id = s.vec_id)
       SELECT q_id, rnk, vec_id, cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM rr)
       WHERE rnk <= 5 ORDER BY q_id, rnk"""

  private lazy val ivfPqOracle: String = ivfPqOracleWith("")

  /** Per-subspace reconstruction SSE under the trained PQ codebooks —
    * the same pqChain training reproduction as the served oracle, then
    * the strict-fold squared distance of each vector to its assigned
    * centroid, floor-quantized to micro-units and summed as BIGINT
    * (floor of identical doubles is identical; decimal casts are not —
    * see the operator's scaladoc). */
  private lazy val pqErrorOracle: String = s"""
       WITH emb AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       err AS (
         SELECT 0 AS subspace,
           list_reduce(list_transform(range(1, 17),
             j -> (e.e[j] - c.c[j]) * (e.e[j] - c.c[j])),
             (acc, x) -> acc + x) AS d
         FROM s0a2 a JOIN s0c2 c ON c.cluster_id = a.cluster_id
         JOIN emb e ON e.vec_id = a.vec_id
         UNION ALL
         SELECT 1,
           list_reduce(list_transform(range(1, 17),
             j -> (e.e[j + 16] - c.c[j]) * (e.e[j + 16] - c.c[j])),
             (acc, x) -> acc + x)
         FROM s1a2 a JOIN s1c2 c ON c.cluster_id = a.cluster_id
         JOIN emb e ON e.vec_id = a.vec_id)
       SELECT subspace, COUNT(*) AS n_vectors,
         CAST(SUM(CAST(FLOOR(d * 1000000) AS BIGINT)) AS BIGINT) AS sse_e6
       FROM err GROUP BY subspace ORDER BY subspace"""

  private lazy val filteredServedOracle: String =
    ivfPqOracleWith("WHERE lb.label % 3 = 0")

  private lazy val filteredBruteOracle: String = s"""
       WITH emb AS (
         SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
         FROM embeddings),
       q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM emb
             WHERE vec_id % 100 = 0),
       scored AS (
         SELECT q.q_id, e.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.q_emb", "e.embedding")}, 6) AS cos
         FROM q JOIN emb e ON e.vec_id <> q.q_id
         WHERE e.label % 3 = 0),
       ranked AS (
         SELECT q_id, vec_id, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id
             ORDER BY cos DESC, vec_id) AS rnk
         FROM scored)
       SELECT q_id, rnk, vec_id, cos FROM ranked WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  /** Both serving tiers reproduced end-to-end: the batch BM25 ranking
    * (the maintained text index answers it bit-for-bit) and the
    * IVFADC route/ADC/rerank tail at top-10, fused in exact integer
    * RRF — pinning the SERVED hybrid exactly, approximation included. */
  private lazy val hybridServedOracle: String = s"""
       WITH terms AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
       dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       scored AS (
         SELECT tf.doc_id, tf.term,
           ((n_docs - df + 0.5) / (df + 0.5)) * (tf * ${1.2 + 1}) /
             (tf + ${1.2} * (1 - ${0.75} + ${0.75} * dl / avgdl)) AS score
         FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
         CROSS JOIN stats),
       qterms AS (
         SELECT DISTINCT doc_id AS q_id,
           unnest(string_split(text, ' ')[1:3]) AS term
         FROM documents WHERE doc_id % 100 = 0),
       lexhits AS (
         SELECT q.q_id, s.doc_id,
           SUM(CAST(s.score AS DECIMAL(38,18))) AS sdec
         FROM scored s JOIN qterms q USING (term)
         WHERE s.doc_id <> q.q_id
         GROUP BY 1, 2),
       lexr AS (
         SELECT q_id, doc_id, rnk AS lex_rnk FROM (
           SELECT q_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sdec DESC, doc_id) AS rnk
           FROM lexhits) WHERE rnk <= 10),
       $kmeansCtes,
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       q AS (SELECT vec_id AS q_id, e AS qe FROM emb WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id)
         JOIN a2 m USING (vec_id)),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN emb m ON m.vec_id = s.vec_id),
       semr AS (
         SELECT q_id, doc_id, rnk AS sem_rnk FROM (
           SELECT q_id, vec_id AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk
           FROM rr) WHERE rnk <= 10),
       fused AS (
         SELECT COALESCE(l.q_id, s.q_id) AS q_id,
                COALESCE(l.doc_id, s.doc_id) AS doc_id,
                COALESCE(${ExtensionQueries.RrfLcm} // (60 + l.lex_rnk), 0) +
                COALESCE(${ExtensionQueries.RrfLcm} // (60 + s.sem_rnk), 0) AS rrf
         FROM lexr l FULL OUTER JOIN semr s
           ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
       SELECT q_id, rnk, doc_id, CAST(rrf AS BIGINT) AS rrf FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY rrf DESC, doc_id) AS rnk
         FROM fused) WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  /** The hybrid_cdc oracle: lex tier = batch BM25 over the POST-APPLY
    * text corpus (queries still drawn from the original documents —
    * they arrive from outside the store); sem tier = the
    * stream_ann_index_cdc reproduction (base-slice training,
    * frozen-codebook encode of the applied vectors, route/ADC/rerank
    * over post-apply exact vectors); both at top-10, fused in the
    * shared integer RRF. */
  private lazy val hybridCdcOracle: String = hybridCdcOracleOver("""
         SELECT doc_id,
           CASE WHEN doc_id % 7 = 0 THEN text || ' graft cdc update'
                ELSE text END AS text
         FROM documents WHERE doc_id % 11 <> 0""")

  /** The consistent-prefix serving oracle (round-9 verdict item 2):
    * both tiers AT THE COMMON WATERMARK min(lexWm=1, semWm=0) = 0 —
    * lexical BM25 over the BATCH-0 base corpus (the text artifact's
    * retained pre-update snapshot), semantic tail over the post-apply
    * vectors (batch 0 IS the ANN artifact's whole changelog, so its
    * head already sits at the common prefix). The skewed fixtures must
    * answer exactly what watermark-aligned artifacts would. */
  private lazy val hybridConsistentOracle: String =
    hybridCdcOracleOver("SELECT doc_id, text FROM documents")

  /** hybrid_cdc's two-tier reproduction, parameterized by the LEXICAL
    * corpus state (the semantic tier is the post-apply IVFADC tail in
    * both uses — its changelog is one batch deep). */
  private def hybridCdcOracleOver(corpusSql: String): String = s"""
       WITH corpus AS ($corpusSql),
       terms AS (
         SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus),
       tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
       dl AS (SELECT doc_id, COUNT(*) AS dl FROM terms GROUP BY 1),
       stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
       dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       scored AS (
         SELECT tf.doc_id, tf.term,
           ((n_docs - df + 0.5) / (df + 0.5)) * (tf * ${1.2 + 1}) /
             (tf + ${1.2} * (1 - ${0.75} + ${0.75} * dl / avgdl)) AS score
         FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term)
         CROSS JOIN stats),
       qterms AS (
         SELECT DISTINCT doc_id AS q_id,
           unnest(string_split(text, ' ')[1:3]) AS term
         FROM documents WHERE doc_id % 100 = 0),
       lexhits AS (
         SELECT q.q_id, s.doc_id,
           SUM(CAST(s.score AS DECIMAL(38,18))) AS sdec
         FROM scored s JOIN qterms q USING (term)
         WHERE s.doc_id <> q.q_id
         GROUP BY 1, 2),
       lexr AS (
         SELECT q_id, doc_id, rnk AS lex_rnk FROM (
           SELECT q_id, doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY sdec DESC, doc_id) AS rnk
           FROM lexhits) WHERE rnk <= 10),
       emball AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       ${kmeansChain(
        "emb AS (SELECT vec_id, e FROM emball WHERE vec_id % 10 < 8)")},
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       enc AS (
         SELECT vec_id, list_transform(e, x -> -x) AS e FROM emball
         WHERE vec_id % 9 = 0 AND vec_id % 13 <> 0
         UNION ALL
         SELECT vec_id, e FROM emball
         WHERE vec_id % 10 >= 8 AND vec_id % 9 <> 0 AND vec_id % 13 <> 0),
       enca AS (${sqlAssignOn("enc", "c2")}),
       encs0 AS (SELECT vec_id, e[1:16] AS e FROM enc),
       encs0a AS (${sqlAssignOn("encs0", "s0c2")}),
       encs1 AS (SELECT vec_id, e[17:32] AS e FROM enc),
       encs1a AS (${sqlAssignOn("encs1", "s1c2")}),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id) JOIN a2 m USING (vec_id)
         WHERE a.vec_id % 9 <> 0 AND a.vec_id % 13 <> 0
         UNION ALL
         SELECT a.vec_id, a.cluster_id, b.cluster_id, m.cluster_id
         FROM encs0a a JOIN encs1a b USING (vec_id) JOIN enca m USING (vec_id)),
       embfinal AS (
         SELECT vec_id,
           CASE WHEN vec_id % 9 = 0 THEN list_transform(e, x -> -x)
                ELSE e END AS e
         FROM emball WHERE vec_id % 13 <> 0),
       q AS (SELECT vec_id AS q_id, e AS qe FROM emball WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN embfinal m ON m.vec_id = s.vec_id),
       semr AS (
         SELECT q_id, doc_id, rnk AS sem_rnk FROM (
           SELECT q_id, vec_id AS doc_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk
           FROM rr) WHERE rnk <= 10),
       fused AS (
         SELECT COALESCE(l.q_id, s.q_id) AS q_id,
                COALESCE(l.doc_id, s.doc_id) AS doc_id,
                COALESCE(${ExtensionQueries.RrfLcm} // (60 + l.lex_rnk), 0) +
                COALESCE(${ExtensionQueries.RrfLcm} // (60 + s.sem_rnk), 0) AS rrf
         FROM lexr l FULL OUTER JOIN semr s
           ON l.q_id = s.q_id AND l.doc_id = s.doc_id)
       SELECT q_id, rnk, doc_id, CAST(rrf AS BIGINT) AS rrf FROM (
         SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
           ORDER BY rrf DESC, doc_id) AS rnk
         FROM fused) WHERE rnk <= 5
       ORDER BY q_id, rnk"""

  val oracles: Map[String, String] = Map(
    "text_retrieval_hybrid_served" -> hybridServedOracle,
    "stream_hybrid_serve" -> hybridServedOracle,
    "text_retrieval_hybrid_cdc" -> hybridCdcOracle,
    "stream_hybrid_serve_consistent" -> hybridConsistentOracle,
    // the text fixture applies batches 0 and 1; the vector fixture
    // applies only batch 0 — watermarks 1 and 0, skew 1
    "serve_skew_report" ->
      """SELECT CAST(1 AS BIGINT) AS lex_last_batch,
           CAST(0 AS BIGINT) AS sem_last_batch,
           CAST(1 AS BIGINT) AS batch_skew""",
    "text_chunk" -> """
       WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents),
       c AS (SELECT doc_id, toks,
               unnest(range(0, greatest(len(toks) - 1, 0) + 1, 24)) AS start
             FROM t)
       SELECT doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
         CAST(least(32, len(toks) - start) AS BIGINT) AS n_tokens,
         array_to_string(toks[start + 1 : start + 32], ' ') AS chunk_text
       FROM c ORDER BY doc_id, chunk_idx""",
    "data_mix_weighted" -> """
       WITH d AS (
         SELECT doc_id, source,
           CAST(regexp_extract(source, '([0-9]+)$', 1) AS INTEGER) % 5 AS m,
           (doc_id * 2246822519) % 1000 AS h
         FROM documents),
       w AS (
         SELECT d.*, CASE m WHEN 0 THEN 1000 WHEN 1 THEN 800 WHEN 2 THEN 600
                            WHEN 3 THEN 400 ELSE 200 END AS permille
         FROM d)
       SELECT source, COUNT(*) AS n_total,
         CAST(SUM(CASE WHEN h < permille THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN h < permille THEN doc_id ELSE 0 END) AS BIGINT)
           AS kept_checksum
       FROM w GROUP BY source ORDER BY source""",
    "text_decontaminate" -> s"""
       WITH $DocShingleCtes,
       bench AS (
         SELECT DISTINCT shingle FROM dshingles WHERE doc_id % 97 = 0)
       SELECT doc_id, COUNT(*) AS n_shared
       FROM dshingles JOIN bench USING (shingle)
       WHERE doc_id % 97 <> 0
       GROUP BY doc_id ORDER BY doc_id""",
    // the identical fixed-point GD replayed in SQL: same feature fold,
    // same decimal gradient sums, same truncate-toward-zero /2^22 update
    "curate_train_classifier" -> {
      val rows = (0 until 9).map(j =>
        s"""SELECT $j AS dim, w1.w$j AS w1_micro, w2.w$j AS w2_micro,
            g1.loss0 // 1048576 AS loss0_sh, g2.loss1 // 1048576 AS loss1_sh,
            g3.loss2 // 1048576 AS loss2_sh
            FROM w1, w2, g1, g2, g3""").mkString(" UNION ALL ")
      s"""
       WITH $ProbeCtes,
       p3 AS (SELECT f.*, (${(0 until 9).map(j => s"f.x$j * w2.w$j")
         .mkString(" + ")}) - f.ys AS diff FROM feat f CROSS JOIN w2),
       ${probeGradCte("p3", "g3", "loss2")}
       SELECT * FROM ($rows) ORDER BY dim"""
    },
    // the probe's separation report: map-only scoring with w2, per-lang
    // exact integer rollup
    "curate_classifier_score" -> s"""
       WITH $ProbeCtes,
       scored AS (SELECT f.lang,
           (${(0 until 9).map(j => s"f.x$j * w2.w$j").mkString(" + ")})
             AS score_micro
         FROM feat f CROSS JOIN w2)
       SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(CAST(score_micro AS DECIMAL(38,0))) AS BIGINT)
           AS sum_score_micro
       FROM scored GROUP BY lang ORDER BY lang""",
    "curate_token_budget" -> {
      val stop = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""
       WITH scored AS (
         SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(string_split(text, ' '),
             w -> w IN ($stop))) AS BIGINT) AS n_stop
         FROM documents),
       q AS (SELECT doc_id, n_tokens,
               (n_stop * 1000000) // n_tokens AS quality_milli
             FROM scored),
       c AS (SELECT *, SUM(n_tokens) OVER (ORDER BY quality_milli DESC,
               doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM q)
       SELECT doc_id, quality_milli, n_tokens,
         CAST(cum AS BIGINT) AS cum_tokens
       FROM c WHERE cum <= 10000 ORDER BY doc_id"""
    },
    "doc_pack" -> """
       WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                  FROM documents),
       p AS (SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix
             FROM t)
       SELECT CAST(prefix // 256 AS BIGINT) AS bin,
         COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM p GROUP BY 1 ORDER BY bin""",
    "text_rep_ngrams" -> s"""
       WITH $DocShingleCtes,
       tot AS (
         SELECT doc_id,
           greatest(len(string_split(text, ' ')) - 2, 0) AS n_grams
         FROM documents),
       dst AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct
         FROM dshingles GROUP BY doc_id),
       f AS (
         SELECT t.doc_id, CAST(t.n_grams AS BIGINT) AS n_grams,
           COALESCE(d.n_distinct, 0) AS n_distinct,
           CASE WHEN t.n_grams > 0
                THEN ROUND(1.0 - CAST(COALESCE(d.n_distinct, 0) AS DOUBLE)
                  / t.n_grams, 6)
                ELSE 0.0 END AS dup_frac
         FROM tot t LEFT JOIN dst d USING (doc_id))
       SELECT doc_id, n_grams, n_distinct, dup_frac,
         dup_frac <= 0.3 AS keep
       FROM f ORDER BY doc_id""",
    "text_char_diversity" -> """
       WITH cnt AS (
         SELECT doc_id, len, c, COUNT(*) AS n FROM (
           SELECT doc_id, length(text) AS len,
             unnest(list_transform(range(1, length(text) + 1),
               i -> text[i:i])) AS c
           FROM documents) GROUP BY 1, 2, 3),
       agg AS (
         SELECT doc_id, len,
           CAST(SUM(n * n) AS BIGINT) AS sumsq,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars
         FROM cnt GROUP BY 1, 2),
       words AS (
         SELECT doc_id, len(string_split(text, ' ')) AS n_words,
           len(list_distinct(string_split(text, ' '))) AS n_distinct
         FROM documents)
       SELECT a.doc_id, a.n_distinct_chars,
         ROUND(1.0 - CAST(sumsq AS DOUBLE) /
           (CAST(len AS DOUBLE) * CAST(len AS DOUBLE)), 6) AS char_gini,
         ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS word_rep_ratio
       FROM agg a JOIN words USING (doc_id) ORDER BY doc_id""",
    "doc_pagerank" -> """
       WITH nn AS (SELECT COUNT(*) AS n FROM documents),
       links AS (
         SELECT doc_id AS src, dst FROM (
           SELECT doc_id, unnest(list_distinct(list_filter(
             [(doc_id * 7 + 1) % (SELECT n FROM nn),
              (doc_id * 13 + 2) % (SELECT n FROM nn),
              (doc_id * 31 + 5) % (SELECT n FROM nn)],
             t -> t <> doc_id))) AS dst
           FROM documents)),
       deg AS (SELECT src, COUNT(*) AS outdeg FROM links GROUP BY 1),
       r0 AS (SELECT doc_id AS id,
                CAST(1 AS DOUBLE) / (SELECT n FROM nn) AS rank
              FROM documents),
       c1 AS (SELECT l.dst AS id,
                CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,18)))
                  AS DOUBLE) AS s
              FROM links l JOIN r0 r ON r.id = l.src
              JOIN deg d ON d.src = l.src GROUP BY 1),
       r1 AS (SELECT d0.doc_id AS id,
                CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
                  + CAST(0.85 AS DOUBLE) * COALESCE(c1.s, CAST(0 AS DOUBLE))
                  AS rank
              FROM documents d0 LEFT JOIN c1 ON c1.id = d0.doc_id),
       c2 AS (SELECT l.dst AS id,
                CAST(SUM(CAST(r.rank / d.outdeg AS DECIMAL(38,18)))
                  AS DOUBLE) AS s
              FROM links l JOIN r1 r ON r.id = l.src
              JOIN deg d ON d.src = l.src GROUP BY 1),
       r2 AS (SELECT d0.doc_id AS id,
                CAST(0.15 AS DOUBLE) / (SELECT n FROM nn)
                  + CAST(0.85 AS DOUBLE) * COALESCE(c2.s, CAST(0 AS DOUBLE))
                  AS rank
              FROM documents d0 LEFT JOIN c2 ON c2.id = d0.doc_id)
       SELECT id AS doc_id, ROUND(rank, 9) AS rank
       FROM r2 ORDER BY doc_id""",
    "lm_trigram_counts" -> """
       WITH words AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
                unnest(string_split(text, ' ')) AS w
         FROM documents),
       tri AS (
         SELECT doc_id, w AS w1,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
         FROM words),
       t AS (SELECT w1, w2, w3 FROM tri WHERE w3 IS NOT NULL),
       c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c3
              FROM t GROUP BY 1, 2, 3),
       c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
              FROM t GROUP BY 1, 2)
       SELECT w1, w2, w3, c3, c2,
         ROUND(CAST(c3 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) AS prob
       FROM c3 JOIN c2 USING (w1, w2)
       WHERE c3 >= 2 ORDER BY w1, w2, w3""",
    "lm_doc_score" -> """
       WITH words AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
                unnest(string_split(text, ' ')) AS w
         FROM documents),
       tri AS (
         SELECT doc_id, w AS w1,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2,
           lead(w, 2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
         FROM words),
       t AS (SELECT doc_id, w1, w2, w3 FROM tri WHERE w3 IS NOT NULL),
       c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM t GROUP BY 1, 2, 3),
       c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM t GROUP BY 1, 2),
       probs AS (
         SELECT w1, w2, w3,
           ROUND(CAST(c3 AS DOUBLE) / CAST(c2 AS DOUBLE), 6) AS prob
         FROM c3 JOIN c2 USING (w1, w2) WHERE c3 >= 2),
       j AS (
         SELECT t.doc_id, COALESCE(p.prob, 0.0) AS p
         FROM t LEFT JOIN probs p USING (w1, w2, w3))
       SELECT doc_id, COUNT(*) AS n_trigrams,
         ROUND(CAST(SUM(CAST(p AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*), 6)
           AS mean_prob
       FROM j GROUP BY 1 ORDER BY doc_id""",
    // doc_pack's bins crossed with epochs, the same affine integer key
    "data_shuffle_epochs" -> """
       WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                  FROM documents),
       p AS (SELECT doc_id, n_tokens,
               COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prefix
             FROM t),
       bins AS (SELECT DISTINCT CAST(prefix // 256 AS BIGINT) AS bin FROM p),
       e AS (SELECT bin, unnest([CAST(0 AS BIGINT), CAST(1 AS BIGINT)])
               AS epoch FROM bins),
       keyed AS (SELECT epoch, bin,
           (bin * 2654435761 + epoch * 40503) % 4294967296 AS k FROM e)
       SELECT epoch,
         CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY k, bin)
           AS BIGINT) AS position,
         bin
       FROM keyed ORDER BY epoch, position""",
    // per-source rank × integer stride L/w (L = lcm(1..4) = 12), head
    // of the merged schedule
    "data_mix_schedule" -> """
       WITH d AS (SELECT doc_id, source,
           CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 + 1
             AS w
         FROM documents),
       r AS (SELECT doc_id, source, w,
           CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id)
             AS BIGINT) AS rn
         FROM d),
       v AS (SELECT doc_id, source, rn * (12 // w) AS vtime FROM r),
       o AS (SELECT CAST(ROW_NUMBER() OVER
             (ORDER BY vtime, source, doc_id) AS BIGINT) AS position,
           vtime, source, doc_id
         FROM v)
       SELECT position, vtime, source, doc_id FROM o
       WHERE position <= 200 ORDER BY position""",

    // the dedup_substring_clean chain -> len>=30 gate -> 3-gram
    // decontamination on the CLEANED tokens -> doc_pack prefix-sum rule
    "pipeline_pretrain" -> {
      val k = graft.operators.Dedup.SpanGramK
      s"""
       WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
         FROM documents WHERE len(string_split(text, ' ')) >= $k),
       u AS (SELECT doc_id, unnest(generate_series(1, len(t) - $k + 1)) AS i,
           t FROM toks),
       g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
           array_to_string(t[i:i + ${k - 1}], ' ') AS gram FROM u),
       d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
       m AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
       s AS (SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev FROM m),
       b AS (SELECT doc_id, pos,
           CASE WHEN prev IS NULL OR pos > prev + $k THEN 1 ELSE 0 END
             AS brk FROM s),
       i2 AS (SELECT doc_id, pos,
           SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
         FROM b),
       sp AS (SELECT doc_id, MIN(pos) AS ss, MAX(pos) + $k AS se
         FROM i2 GROUP BY doc_id, island),
       spl AS (SELECT doc_id, list({'ss': ss, 'se': se}) AS spans
         FROM sp GROUP BY doc_id),
       alltoks AS (SELECT doc_id, string_split(text, ' ') AS t
         FROM documents),
       c AS (SELECT a.doc_id, a.t, COALESCE(l.spans, []) AS spans
         FROM alltoks a LEFT JOIN spl l USING (doc_id)),
       o AS (SELECT doc_id,
           list_filter(range(1, len(t) + 1), i ->
             len(list_filter(spans,
               sp2 -> i - 1 >= sp2.ss AND i - 1 < sp2.se)) = 0) AS keep, t
         FROM c),
       cl AS (SELECT doc_id, list_transform(keep, i -> t[i]) AS tc,
           CAST(len(keep) AS BIGINT) AS n_after
         FROM o WHERE len(keep) >= 30),
       psh AS (SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(tc) - 1),
             i -> tc[i] || ' ' || tc[i + 1] || ' ' || tc[i + 2])))
           AS shingle FROM cl),
       bench AS (SELECT DISTINCT shingle FROM psh WHERE doc_id % 97 = 0),
       contam AS (SELECT DISTINCT doc_id FROM psh JOIN bench
         USING (shingle) WHERE doc_id % 97 <> 0),
       train AS (SELECT doc_id, n_after FROM cl
         WHERE doc_id % 97 <> 0
           AND doc_id NOT IN (SELECT doc_id FROM contam)),
       p AS (SELECT doc_id, n_after,
           COALESCE(SUM(n_after) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS prefix
         FROM train)
       SELECT CAST(prefix // 2048 AS BIGINT) AS bin, COUNT(*) AS n_docs,
         CAST(SUM(n_after) AS BIGINT) AS sum_tokens,
         MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
       FROM p GROUP BY 1 ORDER BY bin"""
    },

    "pipeline_curate" -> s"""
       WITH $DocShingleCtes,
       tot AS (
         SELECT doc_id,
           greatest(len(string_split(text, ' ')) - 2, 0) AS n_grams
         FROM documents),
       dst AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct
         FROM dshingles GROUP BY doc_id),
       rep AS (
         SELECT t.doc_id,
           CASE WHEN t.n_grams > 0
                THEN ROUND(1.0 - CAST(COALESCE(d.n_distinct, 0) AS DOUBLE)
                  / t.n_grams, 6)
                ELSE 0.0 END AS dup_frac
         FROM tot t LEFT JOIN dst d USING (doc_id)),
       cnt AS (
         SELECT doc_id, len, c, COUNT(*) AS n FROM (
           SELECT doc_id, length(text) AS len,
             unnest(list_transform(range(1, length(text) + 1),
               i -> text[i:i])) AS c
           FROM documents) GROUP BY 1, 2, 3),
       gin AS (
         SELECT doc_id, ROUND(1.0 - CAST(SUM(n * n) AS DOUBLE)
           / (CAST(len AS DOUBLE) * CAST(len AS DOUBLE)), 6) AS char_gini
         FROM cnt GROUP BY doc_id, len),
       gated AS (
         SELECT d.doc_id, d.text, d.source FROM documents d
         JOIN rep USING (doc_id) JOIN gin USING (doc_id)
         WHERE rep.dup_frac <= 0.3 AND gin.char_gini >= 0.9),
       canon AS (SELECT MIN(doc_id) AS doc_id FROM gated GROUP BY text),
       kept AS (
         SELECT c.doc_id FROM canon c JOIN documents d USING (doc_id)
         WHERE (c.doc_id * 2246822519) % 1000 <
           (CASE CAST(regexp_extract(d.source, '([0-9]+)$$', 1) AS INTEGER) % 5
            WHEN 0 THEN 1000 WHEN 1 THEN 800 WHEN 2 THEN 600
            WHEN 3 THEN 400 ELSE 200 END)),
       sp AS (
         SELECT doc_id,
           CASE WHEN (doc_id * 2654435761) % 1000 < 800 THEN 'train'
                WHEN (doc_id * 2654435761) % 1000 < 900 THEN 'val'
                ELSE 'test' END AS split
         FROM kept)
       SELECT split, COUNT(*) AS n, CAST(SUM(doc_id) AS BIGINT) AS id_checksum
       FROM sp GROUP BY 1 ORDER BY split""",
    // same gates, same order, same constants as pipeline_curate — the
    // complement with attribution instead of the survivors
    "pipeline_provenance" -> s"""
       WITH $DocShingleCtes,
       tot AS (
         SELECT doc_id,
           greatest(len(string_split(text, ' ')) - 2, 0) AS n_grams
         FROM documents),
       dst AS (
         SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_distinct
         FROM dshingles GROUP BY doc_id),
       rep AS (
         SELECT t.doc_id,
           CASE WHEN t.n_grams > 0
                THEN ROUND(1.0 - CAST(COALESCE(d.n_distinct, 0) AS DOUBLE)
                  / t.n_grams, 6)
                ELSE 0.0 END AS dup_frac
         FROM tot t LEFT JOIN dst d USING (doc_id)),
       cnt AS (
         SELECT doc_id, len, c, COUNT(*) AS n FROM (
           SELECT doc_id, length(text) AS len,
             unnest(list_transform(range(1, length(text) + 1),
               i -> text[i:i])) AS c
           FROM documents) GROUP BY 1, 2, 3),
       gin AS (
         SELECT doc_id, ROUND(1.0 - CAST(SUM(n * n) AS DOUBLE)
           / (CAST(len AS DOUBLE) * CAST(len AS DOUBLE)), 6) AS char_gini
         FROM cnt GROUP BY doc_id, len),
       flags AS (
         SELECT d.doc_id, d.text, d.source,
           (r.dup_frac <= 0.3) AS rep_ok, (g.char_gini >= 0.9) AS gini_ok
         FROM documents d JOIN rep r USING (doc_id)
           JOIN gin g USING (doc_id)),
       canon AS (
         SELECT text, MIN(doc_id) AS canon_id FROM flags
         WHERE rep_ok AND gini_ok GROUP BY text)
       SELECT f.doc_id,
         CASE WHEN NOT rep_ok THEN 'repetition'
              WHEN NOT gini_ok THEN 'diversity'
              WHEN f.doc_id <> c.canon_id THEN 'duplicate'
              WHEN (f.doc_id * 2246822519) % 1000 >=
                (CASE CAST(regexp_extract(f.source, '([0-9]+)$$', 1)
                      AS INTEGER) % 5
                 WHEN 0 THEN 1000 WHEN 1 THEN 800 WHEN 2 THEN 600
                 WHEN 3 THEN 400 ELSE 200 END) THEN 'mixdown'
              ELSE 'kept' END AS verdict
       FROM flags f LEFT JOIN canon c ON c.text = f.text
       ORDER BY f.doc_id""",
    "ann_ivf_trained" -> s"""
       WITH $kmeansCtes,
       c2 AS (${sqlUpdate("a2")}),
       q AS (SELECT vec_id AS q_id, e AS q_emb FROM emb
             WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, q_emb, cluster_id FROM (
           SELECT q.q_id, q.q_emb, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.q_emb) + 1),
                 j -> (q.q_emb[j] - c2.c[j]) * (q.q_emb[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS rn
           FROM q CROSS JOIN c2) WHERE rn = 1),
       scored AS (
         SELECT r.q_id, r.cluster_id, m.vec_id,
           ROUND(${ExtensionQueries.sqlCos("r.q_emb", "m.e")}, 6) AS cos
         FROM routed r JOIN a2 m
           ON m.cluster_id = r.cluster_id AND m.vec_id <> r.q_id)
       SELECT q_id, CAST(cluster_id AS BIGINT) AS cluster_id, rnk, vec_id, cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM scored)
       WHERE rnk <= 5 ORDER BY q_id, rnk""",
    "ann_knn_join" -> s"""
       WITH $kmeansCtes,
       pairs AS (
         SELECT l.vec_id AS q_id, l.cluster_id, r.vec_id,
           ${ExtensionQueries.sqlCos("l.e", "r.e")} AS cos
         FROM a2 l JOIN a2 r
           ON l.cluster_id = r.cluster_id AND r.vec_id <> l.vec_id)
       SELECT q_id, CAST(cluster_id AS BIGINT) AS cluster_id, rnk, vec_id,
         ROUND(cos, 6) AS cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM pairs)
       WHERE rnk <= 3 ORDER BY q_id, rnk""",
    "ann_range_search" -> s"""
       WITH $kmeansCtes,
       pairs AS (
         SELECT l.vec_id AS a_id, r.vec_id AS b_id, l.cluster_id,
           ${ExtensionQueries.sqlCos("l.e", "r.e")} AS cos
         FROM a2 l JOIN a2 r
           ON l.cluster_id = r.cluster_id AND r.vec_id > l.vec_id)
       SELECT a_id, b_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         ROUND(cos, 6) AS cos
       FROM pairs WHERE cos > 0.45
       ORDER BY a_id, b_id""",
    "lm_pmi_bigrams" -> """
       WITH words AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
                unnest(string_split(text, ' ')) AS w
         FROM documents),
       bi AS (
         SELECT w AS w1,
           lead(w, 1) OVER (PARTITION BY doc_id ORDER BY i) AS w2
         FROM words),
       c12 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
               FROM bi WHERE w2 IS NOT NULL GROUP BY 1, 2),
       m AS (
         SELECT w1, w2, c12,
           SUM(c12) OVER (PARTITION BY w1) AS c_l,
           SUM(c12) OVER (PARTITION BY w2) AS c_r,
           (SELECT SUM(c12) FROM c12) AS n
         FROM c12),
       scored AS (
         SELECT w1, w2, c12,
           ROUND(CAST(c12 * n AS DOUBLE) / CAST(c_l * c_r AS DOUBLE), 6)
             AS pmi_ratio
         FROM m WHERE c12 >= 5),
       top AS (SELECT * FROM scored
               ORDER BY pmi_ratio DESC, w1, w2 LIMIT 50)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi_ratio DESC, w1, w2)
           AS BIGINT) AS rnk,
         w1, w2, c12, pmi_ratio
       FROM top ORDER BY rnk""",
    "corpus_stats_report" -> """
       WITH base AS (
         SELECT lang AS stratum, doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars, source
         FROM documents),
       rk AS (
         SELECT *,
           ROW_NUMBER() OVER (PARTITION BY stratum
             ORDER BY n_tokens, doc_id) AS rn,
           COUNT(*) OVER (PARTITION BY stratum) AS n
         FROM base)
       SELECT stratum, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens,
         MAX(CASE WHEN rn = CAST(FLOOR((n + 1) / 2) AS BIGINT)
             THEN n_tokens END) AS median_tokens,
         ROUND(CAST(SUM(CAST(n_chars AS DECIMAL(38,18))) AS DOUBLE)
           / COUNT(*), 6) AS mean_chars,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       FROM rk GROUP BY 1 ORDER BY stratum""",
    // BPE merge rounds: each w{k} applies the winning pair with the SAME
    // strict left fold as the Spark HOF (list_reduce over single-element
    // lists with an empty-accumulator prepend; acc[-1] on the empty
    // accumulator is NULL in DuckDB, falling to ELSE exactly like the
    // Spark short-circuit) — every merge decision is bit-identical
    "lm_bpe_train" ->
      s"""WITH $BpeCtes
         SELECT * FROM (
           SELECT 1 AS rnd, lft, rgt, pc, lft || rgt AS new_sym FROM t1
           UNION ALL SELECT 2, lft, rgt, pc, lft || rgt FROM t2
           UNION ALL SELECT 3, lft, rgt, pc, lft || rgt FROM t3)
         ORDER BY rnd""",
    // encode = per-doc join against the trained w3 vocab; the checksum
    // is an additive fold_hash over emitted symbols (nested list_reduce
    // — per-symbol char fold summed per word, summed per doc)
    "lm_bpe_encode" ->
      s"""WITH $BpeCtes,
         dw AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents),
         enc AS (SELECT doc_id, syms FROM dw JOIN w3 USING (word))
         SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(syms)) AS BIGINT) AS n_tokens,
           CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(syms, s ->
               list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(s) + 1),
                   j -> CAST(unicode(s[j:j]) AS BIGINT))),
                 (acc, x) -> (acc * 131 + x)
                   % ${graft.expressions.ShingleOps.P}))),
             (acc, x) -> acc + x)) AS BIGINT) AS sym_checksum
         FROM enc GROUP BY doc_id ORDER BY doc_id""",
    "lm_oov_rate" -> """
       WITH counts AS (
         SELECT w AS word, COUNT(*) AS cnt
         FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         GROUP BY 1),
       vocab AS (SELECT word FROM counts ORDER BY cnt DESC, word LIMIT 100),
       toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents),
       oov AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_oov
               FROM toks t LEFT JOIN vocab v ON v.word = t.w
               WHERE v.word IS NULL GROUP BY 1),
       base AS (SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         FROM documents)
       SELECT b.doc_id, b.n_tokens,
         CAST(COALESCE(o.n_oov, 0) AS BIGINT) AS n_oov,
         (CAST(COALESCE(o.n_oov, 0) AS BIGINT) * 1000) // b.n_tokens
           AS oov_permille
       FROM base b LEFT JOIN oov o USING (doc_id) ORDER BY b.doc_id""",
    "lm_vocab_topk" -> """
       WITH c AS (
         SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
           SELECT unnest(string_split(text, ' ')) AS w FROM documents)
         GROUP BY 1),
       t AS (SELECT SUM(cnt) AS total FROM c),
       top AS (SELECT word, cnt FROM c ORDER BY cnt DESC, word LIMIT 100)
       SELECT CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, word) AS BIGINT)
           AS rnk,
         word, cnt,
         ROUND(CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST((SELECT total FROM t) AS DOUBLE), 6) AS cum_frac
       FROM top ORDER BY rnk""",
    "data_sample_stratified" -> """
       WITH c AS (SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_total
                  FROM documents GROUP BY 1),
       m AS (SELECT MIN(n_total) AS min_cnt FROM c),
       r AS (SELECT stratum, n_total,
               CAST(FLOOR(1000.0 * CAST((SELECT min_cnt FROM m) AS DOUBLE)
                 / CAST(n_total AS DOUBLE)) AS BIGINT) AS permille
             FROM c),
       k AS (SELECT d.doc_id, r.stratum, r.n_total, r.permille,
               (d.doc_id * 3266489917) % 1000 < r.permille AS kept
             FROM documents d JOIN r ON r.stratum = d.lang)
       SELECT stratum, n_total, permille,
         CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN kept THEN doc_id ELSE 0 END) AS BIGINT)
           AS kept_checksum
       FROM k GROUP BY 1, 2, 3 ORDER BY stratum""",
    "emb_truncate_norm" -> """
       WITH p AS (SELECT vec_id,
                    list_transform(embedding[1:16], x -> CAST(x AS DOUBLE)) AS e
                  FROM embeddings),
       n AS (SELECT vec_id, e,
               sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(e, x -> x * x)), (acc, x) -> acc + x)) AS nrm
             FROM p),
       ux AS (SELECT vec_id, generate_subscripts(e, 1) AS i, unnest(e) AS x,
                nrm
              FROM n)
       SELECT vec_id, CAST(i - 1 AS BIGINT) AS i,
         ROUND(CASE WHEN nrm = 0.0 THEN 0.0 ELSE x / nrm END, 6) AS x_norm,
         ROUND(nrm, 6) AS norm_k
       FROM ux ORDER BY vec_id, i""",
    "dedup_semantic" -> s"""
       WITH ${graft.sources.ExtCorpus.EmbCorpusCte},
       ${kmeansChain("emb AS (SELECT vec_id, embedding AS e FROM corpus)")},
       prs AS (
         SELECT b.vec_id AS vec_id, b.cluster_id, a.vec_id AS a_id,
           ${ExtensionQueries.sqlCos("a.e", "b.e")} AS cos
         FROM a2 a JOIN a2 b
           ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id)
       SELECT vec_id, CAST(cluster_id AS BIGINT) AS cluster_id,
         MIN(a_id) AS dup_of, COUNT(*) AS n_dups, ROUND(MAX(cos), 6) AS max_cos
       FROM prs WHERE cos >= 0.9 GROUP BY 1, 2 ORDER BY vec_id""",
    "text_winnow" -> s"""
       WITH words AS (
         SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS i,
                unnest(string_split(text, ' ')) AS w
         FROM documents),
       tri AS (
         SELECT doc_id, i,
           w || ' ' || lead(w,1) OVER (PARTITION BY doc_id ORDER BY i)
             || ' ' || lead(w,2) OVER (PARTITION BY doc_id ORDER BY i)
             AS shingle,
           lead(w,2) OVER (PARTITION BY doc_id ORDER BY i) AS w3
         FROM words),
       h AS (
         SELECT doc_id, i,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(shingle) + 1),
               j -> CAST(ascii(shingle[j:j]) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % ${graft.operators.Dedup.P}) AS h
         FROM tri WHERE w3 IS NOT NULL),
       wm AS (
         SELECT doc_id, i,
           MIN(h) OVER (PARTITION BY doc_id ORDER BY i
             ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin,
           COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
         FROM h),
       sel AS (SELECT DISTINCT doc_id, wmin FROM wm
               WHERE i <= greatest(n_grams - 3, 1))
       SELECT doc_id, COUNT(*) AS n_fp, CAST(SUM(wmin) AS BIGINT) AS fp_checksum,
         MIN(wmin) AS fp_min, MAX(wmin) AS fp_max
       FROM sel GROUP BY 1 ORDER BY doc_id""",
    "kmeans_train" -> s"""
       WITH $kmeansCtes,
       perdim AS (
         SELECT cluster_id, CAST(i - 1 AS BIGINT) AS i,
           CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS cx
         FROM (SELECT cluster_id, generate_subscripts(e, 1) AS i,
                      unnest(e) AS x FROM a2)
         GROUP BY 1, 2),
       sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM a2 GROUP BY 1)
       SELECT CAST(p.cluster_id AS BIGINT) AS cluster_id, p.i,
         ROUND(p.cx, 6) AS cx, sizes.n_members
       FROM perdim p JOIN sizes USING (cluster_id)
       ORDER BY cluster_id, i""",
    // windows start at 0, step, 2·step … while start < len (trailing
    // window partial); the checksum is the char fold over the joined
    // window text, summed per doc — content- and order-sensitive
    "q_generator_windows" -> s"""
       WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk
                  FROM documents),
       w AS (SELECT doc_id, tk,
               unnest(range(0, len(tk), 4)) AS start FROM t),
       s AS (SELECT doc_id,
               array_to_string(tk[start + 1 : least(start + 8, len(tk))],
                 ' ') AS wtext,
               least(start + 8, len(tk)) - start AS wlen
             FROM w)
       SELECT doc_id, COUNT(*) AS n_windows,
         CAST(SUM(list_reduce(list_prepend(CAST(0 AS BIGINT),
           list_transform(range(1, length(wtext) + 1),
             i -> CAST(unicode(wtext[i:i]) AS BIGINT))),
           (acc, x) -> (acc * 131 + x)
             % ${graft.expressions.ShingleOps.P})) AS BIGINT)
           AS win_checksum,
         CAST(MAX(wlen) AS BIGINT) AS max_wlen,
         CAST(MIN(wlen) AS BIGINT) AS min_wlen
       FROM s GROUP BY doc_id ORDER BY doc_id""",

    // two prefixed codebook chains + per-query distance tables; the ADC
    // sum d0 + d1 is two strict folds added in fixed order, so ranking
    // agrees bit-for-bit and ties break on vec_id
    "ann_pq_adc" -> s"""
       WITH emb AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       q AS (SELECT vec_id AS q_id, e FROM emb WHERE vec_id % 100 = 0),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.e[j] - c.c[j]) * (q.e[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.e[j + 16] - c.c[j]) * (q.e[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1
         FROM s0a2 a JOIN s1a2 b USING (vec_id)),
       scored AS (
         SELECT t0.q_id, c.vec_id, t0.d0 + t1.d1 AS adist
         FROM codes c
         JOIN dt0 t0 ON t0.code0 = c.code0
         JOIN dt1 t1 ON t1.q_id = t0.q_id AND t1.code1 = c.code1
         WHERE c.vec_id <> t0.q_id)
       SELECT q_id, rnk, vec_id, ROUND(adist, 6) AS adist
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY adist, vec_id) AS rnk FROM scored)
       WHERE rnk <= 5 ORDER BY q_id, rnk""",

    "data_profile" -> {
      val cols = ProfileCols
      cols.map { f =>
        s"""SELECT '$f' AS col_name, COUNT(*) AS n_rows,
            COUNT(*) - COUNT($f) AS n_null,
            CAST(COUNT(DISTINCT $f) AS BIGINT) AS n_distinct,
            CAST(MIN($f) AS VARCHAR) AS min_repr,
            CAST(MAX($f) AS VARCHAR) AS max_repr
            FROM documents"""
      }.mkString("", " UNION ALL ", " ORDER BY col_name")
    },
    "data_prune_prototypes" -> s"""
       WITH $kmeansCtes,
       c2 AS (${sqlUpdate("a2")}),
       d AS (
         SELECT a.cluster_id, a.vec_id,
           list_reduce(list_transform(range(1, len(a.e) + 1),
             j -> (a.e[j] - c.c[j]) * (a.e[j] - c.c[j])),
             (acc, x) -> acc + x) AS dist
         FROM a2 a JOIN c2 c USING (cluster_id)),
       ranked AS (
         SELECT cluster_id, vec_id, dist,
           ROW_NUMBER() OVER (PARTITION BY cluster_id
             ORDER BY dist DESC, vec_id) AS rnk
         FROM d)
       SELECT CAST(cluster_id AS BIGINT) AS cluster_id, rnk, vec_id,
              ROUND(dist, 6) AS dist
       FROM ranked WHERE rnk <= 5 ORDER BY cluster_id, rnk""",

    // coarse kmeans chain + two PQ codebook chains + nprobe-2 routing +
    // cell-restricted ADC top-50 shortlist + exact-cosine rerank — every stage
    // the Spark plan runs, in the same strict-fold arithmetic
    "ann_ivf_pq" -> ivfPqOracle,
    // identical training math, identical results: the served variant's
    // oracle IS the inline variant's
    "ann_ivf_pq_served" -> ivfPqOracle,
    "ann_pq_error" -> pqErrorOracle,
    "ann_filtered_topk" -> filteredBruteOracle,
    "ann_filtered_served" -> filteredServedOracle,
    "ann_index_profile" -> s"""
       WITH $kmeansCtes
       SELECT cluster_id AS cell, COUNT(*) AS n_vectors
       FROM a2 GROUP BY 1 ORDER BY cell""",

    // base-slice training + frozen-codebook encoding of the appended
    // slice, then the shared route/ADC/rerank tail — the DuckDB twin of
    // train(base) + appendBatch(rest) + serve
    "stream_ann_index" -> s"""
       WITH emball AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       ${kmeansChain(
        "emb AS (SELECT vec_id, e FROM emball WHERE vec_id % 10 < 8)")},
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       app AS (SELECT vec_id, e FROM emball WHERE vec_id % 10 >= 8),
       appa AS (${sqlAssignOn("app", "c2")}),
       apps0 AS (SELECT vec_id, e[1:16] AS e FROM app),
       apps0a AS (${sqlAssignOn("apps0", "s0c2")}),
       apps1 AS (SELECT vec_id, e[17:32] AS e FROM app),
       apps1a AS (${sqlAssignOn("apps1", "s1c2")}),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id) JOIN a2 m USING (vec_id)
         UNION ALL
         SELECT a.vec_id, a.cluster_id, b.cluster_id, m.cluster_id
         FROM apps0a a JOIN apps1a b USING (vec_id) JOIN appa m USING (vec_id)),
       q AS (SELECT vec_id AS q_id, e AS qe FROM emball WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN emball m ON m.vec_id = s.vec_id)
       SELECT q_id, rnk, vec_id, cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM rr)
       WHERE rnk <= 5 ORDER BY q_id, rnk""",


    // the CDC twin: base training + frozen-codebook encoding of the
    // POST-APPLY corpus (adds not superseded, %9 re-embeds negated, %13
    // deleted) + the shared route/ADC/rerank tail over the post-apply
    // exact vectors — the maintained index must answer what a full
    // rebuild of the applied state answers
    "stream_ann_index_cdc" -> s"""
       WITH emball AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       ${kmeansChain(
        "emb AS (SELECT vec_id, e FROM emball WHERE vec_id % 10 < 8)")},
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       enc AS (
         SELECT vec_id, list_transform(e, x -> -x) AS e FROM emball
         WHERE vec_id % 9 = 0 AND vec_id % 13 <> 0
         UNION ALL
         SELECT vec_id, e FROM emball
         WHERE vec_id % 10 >= 8 AND vec_id % 9 <> 0 AND vec_id % 13 <> 0),
       enca AS (${sqlAssignOn("enc", "c2")}),
       encs0 AS (SELECT vec_id, e[1:16] AS e FROM enc),
       encs0a AS (${sqlAssignOn("encs0", "s0c2")}),
       encs1 AS (SELECT vec_id, e[17:32] AS e FROM enc),
       encs1a AS (${sqlAssignOn("encs1", "s1c2")}),
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id) JOIN a2 m USING (vec_id)
         WHERE a.vec_id % 9 <> 0 AND a.vec_id % 13 <> 0
         UNION ALL
         SELECT a.vec_id, a.cluster_id, b.cluster_id, m.cluster_id
         FROM encs0a a JOIN encs1a b USING (vec_id) JOIN enca m USING (vec_id)),
       embfinal AS (
         SELECT vec_id,
           CASE WHEN vec_id % 9 = 0 THEN list_transform(e, x -> -x)
                ELSE e END AS e
         FROM emball WHERE vec_id % 13 <> 0),
       q AS (SELECT vec_id AS q_id, e AS qe FROM emball WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN embfinal m ON m.vec_id = s.vec_id)
       SELECT q_id, rnk, vec_id, cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM rr)
       WHERE rnk <= 5 ORDER BY q_id, rnk""",

    // the policy-fired rebuild lands exactly the index a from-scratch
    // build of the POST-APPLY corpus would: k-means retrained on the
    // live vectors (the drained store's state), codes = the training
    // assignments (a rebuild encodes its own training set — no frozen
    // tail), then the standard route/ADC/rerank
    "stream_ann_index_autorebuild" -> s"""
       WITH emball AS (
         SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
         FROM embeddings),
       embfinal AS (
         SELECT vec_id,
           CASE WHEN vec_id % 9 = 0 THEN list_transform(e, x -> -x)
                ELSE e END AS e
         FROM emball WHERE vec_id % 13 <> 0),
       ${kmeansChain("emb AS (SELECT vec_id, e FROM embfinal)")},
       c2 AS (${sqlUpdate("a2")}),
       ${pqChain("s0", 1, 16)},
       ${pqChain("s1", 17, 32)},
       codes AS (
         SELECT a.vec_id, a.cluster_id AS code0, b.cluster_id AS code1,
                m.cluster_id AS cell
         FROM s0a2 a JOIN s1a2 b USING (vec_id) JOIN a2 m USING (vec_id)),
       q AS (SELECT vec_id AS q_id, e AS qe FROM emball WHERE vec_id % 100 = 0),
       routed AS (
         SELECT q_id, cluster_id AS cell FROM (
           SELECT q.q_id, c2.cluster_id,
             ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
               list_reduce(list_transform(range(1, len(q.qe) + 1),
                 j -> (q.qe[j] - c2.c[j]) * (q.qe[j] - c2.c[j])),
                 (acc, x) -> acc + x) ASC,
               c2.cluster_id) AS crn
           FROM q CROSS JOIN c2) WHERE crn <= 2),
       dt0 AS (
         SELECT q.q_id, c.cluster_id AS code0,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j] - c.c[j]) * (q.qe[j] - c.c[j])),
             (acc, x) -> acc + x) AS d0
         FROM q CROSS JOIN s0c2 c),
       dt1 AS (
         SELECT q.q_id, c.cluster_id AS code1,
           list_reduce(list_transform(range(1, 17),
             j -> (q.qe[j + 16] - c.c[j]) * (q.qe[j + 16] - c.c[j])),
             (acc, x) -> acc + x) AS d1
         FROM q CROSS JOIN s1c2 c),
       shortlist AS (
         SELECT q_id, vec_id FROM (
           SELECT r.q_id, c.vec_id,
             ROW_NUMBER() OVER (PARTITION BY r.q_id
               ORDER BY t0.d0 + t1.d1, c.vec_id) AS arn
           FROM codes c
           JOIN routed r ON r.cell = c.cell
           JOIN dt0 t0 ON t0.q_id = r.q_id AND t0.code0 = c.code0
           JOIN dt1 t1 ON t1.q_id = r.q_id AND t1.code1 = c.code1
           WHERE c.vec_id <> r.q_id) WHERE arn <= 50),
       rr AS (
         SELECT s.q_id, s.vec_id,
           ROUND(${ExtensionQueries.sqlCos("q.qe", "m.e")}, 6) AS cos
         FROM shortlist s JOIN q ON q.q_id = s.q_id
         JOIN embfinal m ON m.vec_id = s.vec_id)
       SELECT q_id, rnk, vec_id, cos
       FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
               ORDER BY cos DESC, vec_id) AS rnk FROM rr)
       WHERE rnk <= 5 ORDER BY q_id, rnk""",

    // bigrams via 1-based list slices (range(1, len) = 1..len-1), the
    // char fold is the fold_hash mirror (sids CTE in ExtensionQueries),
    // weights are one fixed IEEE division sequence — no logs — and the
    // per-doc mean goes through DECIMAL so order can't move it
    "data_dsir_weights" -> s"""
       WITH toks AS (
         SELECT doc_id, source = 'src0' AS is_target,
                string_split(text, ' ') AS t
         FROM documents),
       bgs AS (
         SELECT doc_id, is_target,
           unnest(list_transform(range(1, len(t)),
             i -> t[i] || ' ' || t[i+1])) AS bg
         FROM toks),
       hb AS (
         SELECT doc_id, is_target,
           list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, length(bg) + 1),
               i -> CAST(unicode(bg[i:i]) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % ${graft.expressions.ShingleOps.P})
             % ${graft.operators.Importance.Buckets} AS bucket
         FROM bgs),
       stats AS (
         SELECT bucket, COUNT(*) AS src_n,
           SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS tgt_n
         FROM hb GROUP BY 1),
       tot AS (SELECT SUM(src_n) AS src_tot, SUM(tgt_n) AS tgt_tot FROM stats),
       w AS (
         SELECT bucket,
           (CAST(tgt_n + 1 AS DOUBLE)
              / (tgt_tot + ${graft.operators.Importance.Buckets})) /
           (CAST(src_n + 1 AS DOUBLE)
              / (src_tot + ${graft.operators.Importance.Buckets})) AS wt
         FROM stats CROSS JOIN tot)
       SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_features,
         ROUND(CAST(SUM(CAST(wt AS DECIMAL(38,18))) AS DOUBLE)
           / COUNT(*), 6) AS dsir_weight
       FROM hb JOIN w USING (bucket)
       GROUP BY doc_id ORDER BY doc_id"""
  )
}
