package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication test corpora with PLANTED duplicates.
  *
  * The driver's `documents`/`embeddings` tables contain no duplicates
  * (all 500-5000 texts distinct; max pairwise embedding cosine ≈ 0.45), so
  * dedup operators would vacuously return nothing. We derive corpora with
  * deterministic, SQL-reproducible duplicates, so the DuckDB oracle can
  * build the identical corpus and the dedup output is a real assertion:
  *
  *  - exact dup:  doc_id + 100000, text unchanged       (doc_id % 17 == 0)
  *  - near dup:   doc_id + 200000, text + 3 extra words (doc_id % 10 == 0)
  *  - embedding near dup: vec_id + 100000,
  *    e'_i = e_i + 0.01 * ((i % 5) - 2)                 (vec_id % 10 == 0)
  */
object ExtCorpus {

  val NearDupSuffix = " extra token tail"

  def docCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.table(spark, sfDir, "documents").select($"doc_id", $"text")
    val exact = d.where($"doc_id" % 17 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val near = d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 200000L).as("doc_id"),
        concat($"text", lit(NearDupSuffix)).as("text"))
    d.unionByName(exact).unionByName(near)
  }

  /** DuckDB CTE building the identical corpus (keep adjacent to the Scala
    * so they cannot drift). */
  val DocCorpusCte: String =
    """corpus AS (
       SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id + 100000, text FROM documents WHERE doc_id % 17 = 0
       UNION ALL
       SELECT doc_id + 200000, text || ' extra token tail' FROM documents
       WHERE doc_id % 10 = 0)"""

  /** New-ingest batch for incremental dedup: exact copies (id+100000),
    * near copies with the 3-word tail (id+200000), and NOVEL docs —
    * word-reversed texts (id+300000), whose shingle sets are disjoint
    * from the originals' except for palindromic 3-grams (Jaccard ~0,
    * far below any verify threshold). */
  def incrementalBatch(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.table(spark, sfDir, "documents").select($"doc_id", $"text")
    val exact = d.where($"doc_id" % 17 === 0)
      .select(($"doc_id" + 100000L).as("doc_id"), $"text")
    val near = d.where($"doc_id" % 10 === 0)
      .select(($"doc_id" + 200000L).as("doc_id"),
        concat($"text", lit(NearDupSuffix)).as("text"))
    val novel = d.where($"doc_id" % 13 === 0)
      .select(($"doc_id" + 300000L).as("doc_id"),
        array_join(reverse(split($"text", " ")), " ").as("text"))
    exact.unionByName(near).unionByName(novel)
  }

  /** DuckDB twin of [[incrementalBatch]] alone. */
  val IncrementalBatchCte: String =
    """batch AS (
       SELECT doc_id + 100000 AS doc_id, text FROM documents
       WHERE doc_id % 17 = 0
       UNION ALL
       SELECT doc_id + 200000, text || ' extra token tail' FROM documents
       WHERE doc_id % 10 = 0
       UNION ALL
       SELECT doc_id + 300000,
         array_to_string(list_reverse(string_split(text, ' ')), ' ')
       FROM documents WHERE doc_id % 13 = 0)"""

  /** DuckDB twin of base ∪ [[incrementalBatch]] as one `corpus` CTE
    * (batch ids all ≥ 100000; base ids all below — the id ranges ARE
    * the side markers). */
  val IncrementalCorpusCte: String =
    s"""$IncrementalBatchCte,
     corpus AS (
       SELECT doc_id, text FROM documents
       UNION ALL
       SELECT doc_id, text FROM batch)"""

  /** [[IncrementalCorpusCte]] with the CDC changelog's net effect
    * applied to the BASE side (docs % 11 deleted, docs % 7 re-written
    * with the update marker, delete wins on the overlap — the
    * [[graft.streaming.CdcStream]] index-maintenance changelog): the
    * oracle for probes against a CDC-maintained signature index. The
    * probe batch still plants copies of the ORIGINAL texts, so updated
    * bases demote their exact copies to near matches and deleted bases
    * orphan theirs — the apply visibly moves verdicts. */
  /** [[IncrementalCorpusCte]] over the CHURN fixture's live remainder
    * ([[graft.operators.DedupIndex.churnIndexDir]]: batches 1..5 delete
    * doc_id % 6 ∈ {0..4}, so only % 6 = 5 survives) — the oracle corpus
    * for probes against a delete-dominated, uncompacted index: deleted
    * bases must orphan their planted copies exactly as if the corpus
    * had been rebuilt from the live docs. */
  val ChurnIncrementalCorpusCte: String =
    s"""$IncrementalBatchCte,
     corpus AS (
       SELECT doc_id, text FROM documents WHERE doc_id % 6 = 5
       UNION ALL
       SELECT doc_id, text FROM batch)"""

  val CdcAppliedIncrementalCorpusCte: String =
    s"""$IncrementalBatchCte,
     corpus AS (
       SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN text || ' graft cdc update'
              ELSE text END AS text
       FROM documents WHERE doc_id % 11 <> 0
       UNION ALL
       SELECT doc_id, text FROM batch)"""

  def embCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.table(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding")
    val near = e.where($"vec_id" % 10 === 0).select(
      ($"vec_id" + 100000L).as("vec_id"),
      $"label",
      transform($"embedding", (x, i) =>
        (x.cast("double") + lit(0.01) * ((i % 5).cast("double") - 2.0))
      ).as("embedding"))
    Tables.fanout(e.select($"vec_id", $"label",
        transform($"embedding", x => x.cast("double")).as("embedding"))
      .unionByName(near))
  }

  /** DuckDB twin of embCorpus. Elementwise perturbation via
    * unnest + generate_subscripts + list(... ORDER BY i) rebuild; i is
    * 1-based there vs 0-based in Spark's transform — hence (i-1). */
  val EmbCorpusCte: String =
    """flat AS (
       SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
              CAST(unnest(embedding) AS DOUBLE) AS x
       FROM embeddings),
     corpus AS (
       SELECT vec_id, label, list(x ORDER BY i) AS embedding
       FROM flat GROUP BY vec_id, label
       UNION ALL
       SELECT vec_id + 100000, label,
              list(x + 0.01 * (((i - 1) % 5) - 2.0) ORDER BY i) AS embedding
       FROM flat WHERE vec_id % 10 = 0 GROUP BY vec_id, label)"""
}
