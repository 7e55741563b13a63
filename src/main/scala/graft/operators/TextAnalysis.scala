package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (charter
  * extensions, SURVEY.md §2.7): tokenization, quality scoring, heuristic
  * language ID, and document fingerprinting.
  *
  * All of it is expression-only (whole-stage codegen, no UDFs) and scales
  * as a single linear scan — at 100 TB these run map-side with zero
  * shuffle; only the downstream aggregations shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens. The corpus is single-space separated; a real
    * corpus would use a regex split — same operator shape. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword count: tokens plus an extra unit per 4 characters of
    * word length beyond the first 4 (a cheap deterministic stand-in for a
    * byte-pair merge table; linear, no dictionary lookup). */
  def subwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, w) =>
      acc + lit(1L) +
        floor((length(w).cast("double") - 1.0) / 4.0).cast("long"))

  /** Quality features: character/word counts, mean word length, stopword
    * ratio, uppercase-start ratio. Score is a fixed linear blend — the
    * weights are arbitrary but deterministic (quality scoring is a policy,
    * not a ground truth). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "to", "and")

  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nWords = size(toks).cast("long")
    val nStop = size(filter(toks, w => w.isin(Stopwords.map(lit(_)): _*)))
      .cast("long")
    df
      .withColumn("n_words", nWords)
      .withColumn("mean_word_len",
        (length(col(textCol)).cast("double") - (nWords - 1L)) / nWords)
      .withColumn("stopword_ratio", nStop.cast("double") / nWords)
  }

  /** Heuristic language ID: count marker-word hits per class, argmax with
    * a deterministic tie order. (The real thing uses char n-gram profiles;
    * the operator shape — per-class linear scoring + argmax — is what
    * matters for the pipeline.) */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "query" -> Seq("query", "filter", "join", "scan", "sort"),
    "data" -> Seq("table", "row", "column", "customer", "line"),
    "exec" -> Seq("hash", "merge", "batch", "vector", "stream"))

  def langId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = LangMarkers.foldLeft(df) { case (d, (name, markers)) =>
      d.withColumn(s"score_$name",
        size(filter(toks, w => w.isin(markers.map(lit(_)): _*))).cast("long"))
    }
    // argmax with ties resolved by declaration order (strict > on later)
    val pred = LangMarkers.tail.foldLeft(
      (lit(LangMarkers.head._1), col(s"score_${LangMarkers.head._1}"))) {
      case ((bestName, bestScore), (name, _)) =>
        val s = col(s"score_$name")
        (when(s > bestScore, lit(name)).otherwise(bestName),
          greatest(s, bestScore))
    }._1
    scored.withColumn("pred_lang", pred)
  }

  /** PII scrubbing: replace email/phone matches with typed placeholder
    * tokens and count what was removed — the redaction pass every
    * training-data pipeline runs before tokenization. Patterns stick to
    * character classes + quantifiers (no backrefs/lookaround) so Java
    * regex (Spark) and RE2 (DuckDB oracle) agree exactly. Map-side only. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}" -> "<PHONE>")

  def scrubPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  def piiCount(text: Column): Column =
    PiiPatterns.map { case (pat, _) =>
      size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")
    }.reduce(_ + _)

  /** BM25 scoring, keyword extraction, and retrieval.
    *
    * The idf uses the RATIO form (N - df + 0.5) / (df + 0.5) instead of
    * its log: log is monotone, so per-doc term rankings are identical to
    * BM25's, and the score stays inside IEEE +,*,/ — bit-exact across
    * engines, so the DuckDB oracle reproduces it digit-for-digit (the
    * same reason the cosine fold avoids engine builtins).
    *
    * Plan shape: ONE explode → tf hash aggregation (map-side partial
    * combine); dl is size(tokens) — a map-side projection, never an
    * aggregation of tf — and df is |vocab|-sized from tf. Deliberately
    * NOT fanned out: tokenize+tf is cheap per row and the fan-out
    * shuffle cost it back (measured 1.48 -> 0.93 s at sf0.1); a
    * cluster-scale scan already has >= cores splits. */
  /** The BM25 per-(doc, term) score expression over tf/dl/df/n_docs/
    * avgdl columns — ONE definition shared by the batch build and
    * [[TextIndex]]'s incremental probe, so "incremental ≡ one-shot
    * rebuild bit-for-bit" is enforced by construction, not by tests
    * chasing two copies of the formula. */
  private[operators] def bm25Score(tf: Column, dl: Column, df: Column,
      nDocs: Column, avgdl: Column, k1: Double, b: Double): Column = {
    val idf = (nDocs - df + 0.5) / (df + 0.5)
    idf * (tf * lit(k1 + 1)) /
      (tf + lit(k1) * (lit(1) - lit(b) + lit(b) * dl / avgdl))
  }

  private def bm25Scored(docs: DataFrame, idCol: String, textCol: String,
      k1: Double, b: Double): DataFrame = {
    val terms = docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // dl = size(tokens), a map-side projection — same integers as the
    // former sum(tf) per doc (see bm25Retrieve's derivation note), so
    // the per-doc length never pays a corpus-wide aggregation
    val dl = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(dl, "doc_id")
      .join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .withColumn("score", bm25Score(col("tf"), col("dl"), col("df"),
        col("n_docs"), col("avgdl"), k1, b))
  }

  def bm25Keywords(docs: DataFrame, idCol: String, textCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = bm25Scored(docs, idCol, textCol, k1, b)
      .withColumn("score", round(col("score"), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("score"))
  }

  /** BM25 retrieval: top-k documents per QUERY over the corpus — the
    * lexical serving twin of the ANN family (benchmark decontamination
    * and eval-set dedup run exactly this shape corpus-wide). `queries`
    * is (q_id, term) — already tokenized, distinct terms.
    *
    * Scale shape: the query set BROADCASTS against the (doc, term) score
    * table — the inverted-index probe; only postings of matched terms
    * flow into the (q_id, doc_id) aggregation, everything else is pruned
    * at the join. Per-pair scores sum through DECIMAL so term addition
    * order cannot move the rounded output (the cross-engine ground
    * rule), and ranking uses the EXACT decimal sum — ties break on
    * doc_id identically in both engines. */
  def bm25Retrieve(docs: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, k1: Double = 1.2, b: Double = 0.75,
      excludeSelf: Boolean = false,
      allowed: Option[DataFrame] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // The probe filter comes FIRST — below even the tf aggregation: the
    // exploded (doc, term) rows hash-probe the broadcast query terms
    // BEFORE any shuffle, so the only tf aggregation in the plan is over
    // matched postings (a term's occurrences are all kept by the filter,
    // so tf/df computed from the matched rows are exact). dl needs no tf
    // at all: a doc's token count is size(tokens) — a map-side
    // projection — so the corpus-wide work is two scans with NO
    // corpus-wide exchange anywhere: map+tiny-agg for dl/stats, and
    // explode+broadcast-filter+matched-agg for the postings.
    // (bm25Scored keeps the full (doc, term) build for keyword
    // extraction, which needs every pair.)
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val matchedTerms = terms.join(
      broadcast(queries.select(col("term")).distinct()), "term")
    // persisted: df's BROADCAST build and the candidate path both
    // consume this aggregate, and a broadcast-exchange subplan is never
    // unified with a shuffle plan by exchange reuse — without the pin
    // the corpus explode+probe+aggregation runs TWICE per query set.
    // Size is probe-bounded (matched postings only), the same contract
    // that lets the query set broadcast. (Bench/Verify unpersist all
    // RDD blocks per query, so the pin cannot leak across queries.)
    val tf = matchedTerms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf")).persist()
    // dl = exploded-row count per doc ≡ size(tokens): split() yields
    // [""] for an empty string (1 row either way) and null for null
    // text (explode drops the doc; the filter drops it here) — the two
    // derivations agree row-for-row by construction.
    val dl = docs.where(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        size(tokens(col(textCol))).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val matched = tf
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // metadata-filtered retrieval: `allowed` restricts CANDIDATES only —
    // df/avgdl stay corpus-wide (the filter narrows who may be returned,
    // not what the corpus statistics describe). The semi-join keys on
    // matched rows (bounded by the probe's postings), the same cost
    // class as the dl join below.
    val cand = allowed match {
      case None => matched
      case Some(a) => matched.join(
        a.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_semi")
    }
    val hits0 = cand
      .join(broadcast(queries), "term")
      .join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score", bm25Score(col("tf"), col("dl"), col("df"),
        col("n_docs"), col("avgdl"), k1, b))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("score").cast("decimal(38,18)")).as("sdec"))
    // self-exclusion is a HIT filter, never a corpus filter: df/avgdl
    // stats must stay corpus-wide (used by the hybrid fusion, whose
    // semantic tier also excludes the query's own row)
    val hits =
      if (excludeSelf) hits0.where(col("doc_id") =!= col("q_id")) else hits0
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("sdec").desc, col("doc_id"))
    hits
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"),
        round(col("sdec").cast("double"), 6).as("score"))
  }

  /** Document fingerprint: position-weighted rolling hash over tokens,
    * h = sum_i (i+1) * poly(word_i) mod P with poly a per-word arithmetic
    * code — order-sensitive (anagrams differ), engine-portable (pure
    * integer arithmetic), computable as one posexplode + sum. */
  val FpPrime = 1000000007L

  /** Arithmetic word code: sum of (pos+1)*ascii over characters — no
    * engine hash builtin, so DuckDB computes the identical value. */
  private def wordCode(w: Column): Column =
    aggregate(
      zip_with(
        split(w, ""),
        sequence(lit(1), length(w)),
        (ch, i) => i.cast("long") * ascii(ch).cast("long")),
      lit(0L), (acc, x) => acc + x)

  def fingerprint(df: DataFrame, textCol: String): DataFrame = {
    val codes = transform(tokens(col(textCol)),
      (w, i) => (i.cast("long") + 1L) * wordCode(w) % lit(FpPrime))
    df.withColumn("fingerprint",
      aggregate(codes, lit(0L), (acc, x) => (acc + x) % lit(FpPrime)))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken, MOSS
    * — SIGMOD'03): position-ordered word-3-gram hashes; every window of
    * `w` consecutive positions selects its minimum hash, and the doc's
    * fingerprint set is the distinct selected values. Winnowing's
    * guarantee — any shared run of ≥ w+2 words produces a shared
    * fingerprint — makes it the LOCAL alternative to [[fingerprint]]'s
    * whole-doc hash (partial overlap is detectable, not just identity).
    * A doc with fewer than w grams contributes min-of-all (one window).
    *
    * One shuffle (doc-keyed window); the gram hash is the codegen'd
    * fold_hash, so the per-position pass stays in whole-stage codegen.
    * Returns per-doc fingerprint-set summaries in exact integers. */
  def winnowSelected(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.expressions.ShingleOps.ensureRegistered(docs.sparkSession)
    val toks = split(col(textCol), " ")
    val tri = graft.sources.Tables.fanout(docs)
      .select(col(idCol).as("doc_id"), toks.as("toks"),
        posexplode(toks).as(Seq("i", "w1")))
      .where(col("i") + 2 < size(col("toks")))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", col("w1"),
          element_at(col("toks"), col("i") + 2),
          element_at(col("toks"), col("i") + 3)).as("shingle"))
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("i"))
    val perDoc = Window.partitionBy(col("doc_id"))
    tri.withColumn("h", call_function("fold_hash", col("shingle")))
      .select(col("doc_id"), col("i"),
        min(col("h")).over(byPos.rowsBetween(Window.currentRow, w - 1))
          .as("wmin"),
        count(lit(1)).over(perDoc).as("n_grams"))
      .where(col("i") <= greatest(col("n_grams") - w, lit(0)))
      .select(col("doc_id"), col("wmin")).distinct()
  }

  /** Per-doc fingerprint-set summaries over [[winnowSelected]], in exact
    * integers (set size, sum, min, max). */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      w: Int = 4): DataFrame =
    winnowSelected(docs, idCol, textCol, w)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_fp"), sum(col("wmin")).as("fp_checksum"),
        min(col("wmin")).as("fp_min"), max(col("wmin")).as("fp_max"))

  /** Unicode-safe text normalization — the pass every pipeline runs
    * BEFORE hashing/dedup ("café" as `e`+U+0301 vs precomposed U+00E9
    * must dedup together): NFC (codegen'd [[graft.expressions
    * .NfcNormalize]]) → collapse whitespace runs to one space → trim.
    * Pure per-row expressions, zero shuffle at any scale; the NFC kernel
    * fast-paths already-normalized (e.g. all-ASCII) text, so on a real
    * crawl the common case allocates nothing. */
  def normalize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.expressions.NormalizeOps.ensureRegistered(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"), col(textCol).as("raw"))
      .withColumn("norm",
        trim(regexp_replace(
          call_function("nfc_normalize", col("raw")), "\\s+", " ")))
      .select(col("doc_id"),
        length(col("raw")).cast("long").as("pre_cp"),
        length(col("norm")).cast("long").as("post_cp"),
        col("norm"))
  }
}
