package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained MinHash-LSH signature index — the dedup story's artifact,
  * beside [[TextIndex]] (postings) and [[AnnIndex]] (inverted lists).
  *
  * [[Dedup.incremental]] classifies a new batch against an existing
  * corpus, but recomputes the CORPUS side's shingles, signatures, and
  * band rows on every call — at 100 TB that is a full corpus pass per
  * arriving micro-batch, which is exactly what an ingest service cannot
  * pay. This index persists the corpus side once, bucketed for
  * probe-side pruning, on the same manifest-committed segment model as
  * the other two artifacts:
  *
  *   data/kind=band    / bucket=hash(band_key) % B   (doc_id, band_idx, band_key)
  *   data/kind=shingle / bucket=hash(doc_id)   % B   (doc_id, shingle)
  *   data/kind=size    / bucket=hash(doc_id)   % B   (doc_id, n)
  *   data/kind=doc     / bucket=hash(text)     % B   (doc_id, text)
  *
  * A probe batch computes ITS OWN shingles/signatures/bands (O(batch)),
  * then reads only: the band buckets its own band keys hash to (LSH
  * candidates), the doc buckets its own full-text hashes land in (exact
  * tier), and the shingle/size buckets of the candidate base ids
  * (verification) — every artifact read is listing-level pruned to a
  * bucket set bounded by the batch, never the corpus. Accepted batches
  * fold in via [[appendBatch]] (immutable segments, lastBatch
  * watermark); [[compact]] merges segments. The corpus of an ingest
  * deduper only ever grows, so the artifact is append-only by SEMANTICS
  * (a CDC-driven removal would ride the same tombstone pattern as
  * [[TextIndex.applyBatch]]).
  *
  * [[probe]] answers bit-for-bit what [[Dedup.incremental]] answers
  * over the union of every appended batch (DedupIndexSpec pins it under
  * random corpora and split points).
  */
object DedupIndex {

  /** Default band/doc hash-bucket count — manifest-recorded at creation
    * ("conf/buckets") like the other artifacts' geometry; thousands at
    * 100 TB. */
  val Buckets = 8

  private val Kinds = Seq("band", "shingle", "size", "doc")

  private def bucketOf(c: org.apache.spark.sql.Column, nb: Int) =
    pmod(hash(c), lit(nb))

  private def bucketsOf(m: SnapshotManifest.State): Int =
    m.entries.getOrElse("conf/buckets", Buckets.toString).toInt

  private def segments(m: SnapshotManifest.State): Seq[String] =
    m.entries.toSeq.filter(_._1.startsWith("seg/")).sortBy(_._1).map(_._2)

  private def emptyDf(spark: SparkSession, schema: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** The superset row layout all four kinds share in one partitioned
    * segment write (the [[TextIndex]] one-job-per-batch idiom). */
  private def segmentRows(docs: DataFrame, nb: Int): DataFrame = {
    val spark = docs.sparkSession
    val sh = Dedup.shingles(docs, "doc_id", "text")
    val sigs = Dedup.minhashSignatures(sh)
    val nullS = lit(null).cast("string")
    val nullI = lit(null).cast("int")
    val nullL = lit(null).cast("long")
    val bandRows = Dedup.bandRowsOf(sigs)
      .select(lit("band").as("kind"),
        bucketOf(col("band_key"), nb).as("bucket"),
        col("doc_id"), col("band_idx").cast("int").as("band_idx"),
        col("band_key"), nullS.as("shingle"), nullL.as("n"),
        nullS.as("text"))
    val shRows = sh
      .select(lit("shingle").as("kind"),
        bucketOf(col("doc_id"), nb).as("bucket"),
        col("doc_id"), nullI.as("band_idx"), nullS.as("band_key"),
        col("shingle"), nullL.as("n"), nullS.as("text"))
    val sizeRows = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .select(lit("size").as("kind"),
        bucketOf(col("doc_id"), nb).as("bucket"),
        col("doc_id"), nullI.as("band_idx"), nullS.as("band_key"),
        nullS.as("shingle"), col("n"), nullS.as("text"))
    val docRows = docs
      .select(lit("doc").as("kind"),
        bucketOf(col("text"), nb).as("bucket"),
        col("doc_id"), nullI.as("band_idx"), nullS.as("band_key"),
        nullS.as("shingle"), nullL.as("n"), col("text"))
    Seq(bandRows, shRows, sizeRows, docRows).reduce(_ unionByName _)
  }

  /** Fold one accepted batch into the index as an immutable segment —
    * ONE partitioned write job, manifest-committed under the lastBatch
    * watermark (replays are detected no-ops; idle batches advance only
    * the watermark). */
  def appendBatch(dir: String, buckets: Int = Buckets)(
      batch: DataFrame, batchId: Long): Unit = {
    val root = new java.io.File(dir)
    val m = SnapshotManifest.read(root)
    if (m.entries.get("lastBatch").exists(_.toLong >= batchId)) return
    if (batch.isEmpty) {
      SnapshotManifest.commit(root, SnapshotManifest.State(m.version + 1,
        m.entries + ("lastBatch" -> batchId.toString), m.retain))
      return
    }
    val nb = if (m.version == 0L) buckets else bucketsOf(m)
    val docs = batch.select(col("doc_id"), col("text")).persist()
    try {
      val segName = s"epoch_$batchId"
      segmentRows(docs, nb)
        .repartition(2 * nb, col("kind"), col("bucket"))
        .write.mode("overwrite").partitionBy("kind", "bucket")
        .parquet(new java.io.File(root, s"$segName/data").toString)
      val entries = m.entries +
        ("conf/buckets" -> nb.toString) +
        (s"seg/e$batchId" -> segName) +
        ("lastBatch" -> batchId.toString)
      val next = SnapshotManifest.State(m.version + 1, entries, m.retain)
      SnapshotManifest.commit(root, next)
      SnapshotManifest.gc(root, next, "epoch_")
    } finally { docs.unpersist(blocking = false); () }
  }

  /** Segment merge: every current segment folded into one fresh
    * immutable `epoch_compact<version>` segment published by the same
    * pointer swap — probe answers unchanged (the rows only move), probe
    * listing drops from O(segments × buckets) to O(buckets). */
  def compact(spark: SparkSession, dir: String): Unit = {
    val root = new java.io.File(dir)
    val m = SnapshotManifest.read(root)
    val segs = segments(m)
    if (segs.size <= 1) return
    val nb = bucketsOf(m)
    val version = m.version + 1
    val outName = s"epoch_compact$version"
    val schema = "doc_id LONG, band_idx INT, band_key STRING, " +
      "shingle STRING, n LONG, text STRING"
    val all = Kinds.map { kind =>
      val paths = for {
        seg <- segs; bk <- 0 until nb
        d = new java.io.File(root, s"$seg/data/kind=$kind/bucket=$bk")
        if d.exists()
      } yield d.toString
      (if (paths.isEmpty) emptyDf(spark, schema)
       else spark.read.schema(schema).parquet(paths: _*))
        .withColumn("kind", lit(kind))
    }.reduce(_ unionByName _)
      .withColumn("bucket",
        when(col("kind") === "band", bucketOf(col("band_key"), nb))
          .when(col("kind") === "doc", bucketOf(col("text"), nb))
          .otherwise(bucketOf(col("doc_id"), nb)))
    all.repartition(2 * nb, col("kind"), col("bucket"))
      .write.mode("overwrite").partitionBy("kind", "bucket")
      .parquet(new java.io.File(root, s"$outName/data").toString)
    val entries = m.entries.filterNot(_._1.startsWith("seg/")) +
      (s"seg/c$version" -> outName)
    val next = SnapshotManifest.State(version, entries, m.retain)
    SnapshotManifest.commit(root, next)
    SnapshotManifest.gc(root, next, "epoch_")
  }

  /** Classify a probe batch against the indexed corpus — identical
    * output to [[Dedup.incremental]](union of appended batches, batch):
    * (doc_id, verdict exact|near|novel, dup_of, jaccard). Artifact
    * reads are pruned to: the batch's own band-key buckets, the batch's
    * own text-hash buckets, and the candidate base ids' doc-hash
    * buckets — every bucket list is a driver-side collect bounded by
    * the bucket count, computed by the engine's own hash so probe and
    * writer can never disagree. */
  def probe(spark: SparkSession, dir: String, batch: DataFrame,
      threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val root = new java.io.File(dir)
    val m = SnapshotManifest.read(root)
    val segs = segments(m)
    require(segs.nonEmpty, s"empty dedup index at $dir")
    val nb = bucketsOf(m)
    def readLeaves(kind: String, schema: String, probed: Seq[Int]): DataFrame = {
      val paths = for {
        seg <- segs
        bk <- probed
        d = new java.io.File(root, s"$seg/data/kind=$kind/bucket=$bk")
        if d.exists()
      } yield d.toString
      if (paths.isEmpty) emptyDf(spark, schema)
      else spark.read.schema(schema).parquet(paths: _*)
    }
    val n = batch.select(col("doc_id"), col("text")).cache()
    // exact tier: only the buckets the batch's own full-text hashes land in
    val textBuckets = n.select(bucketOf(col("text"), nb).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val exact = readLeaves("doc", "doc_id LONG, text STRING", textBuckets)
      .toDF("base_id", "text")
      .join(broadcast(n), Seq("text"))
      .groupBy(col("doc_id")).agg(min(col("base_id")).as("exact_of"))
    // near tier: LSH candidates from the batch's own band-key buckets
    val shBatch = Dedup.shingles(n, "doc_id", "text").cache()
    val bandBatch = Dedup.bandRowsOf(Dedup.minhashSignatures(shBatch))
      .cache()
    val bandBuckets = bandBatch.select(bucketOf(col("band_key"), nb).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val candidates = readLeaves("band",
        "doc_id LONG, band_idx INT, band_key STRING", bandBuckets)
      .toDF("base_id", "band_idx", "band_key")
      .join(broadcast(bandBatch.toDF("doc_id", "band_idx", "band_key")),
        Seq("band_idx", "band_key"))
      .select(col("base_id"), col("doc_id")).distinct().cache()
    // verification: shingles/sizes of ONLY the candidate base ids' buckets
    val candBuckets = candidates.select(bucketOf(col("base_id"), nb).as("b"))
      .distinct().collect().map(_.getInt(0)).sorted
    val candIds = broadcast(candidates.select(col("base_id")).distinct())
    val baseSh = readLeaves("shingle", "doc_id LONG, shingle STRING",
        candBuckets)
      .toDF("base_id", "shingle")
      .join(candIds, Seq("base_id"), "left_semi")
    val inter = candidates
      .join(baseSh, "base_id")
      .join(shBatch.toDF("doc_id", "shingle"), Seq("doc_id", "shingle"))
      .groupBy(col("base_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    val baseSizes = readLeaves("size", "doc_id LONG, n LONG", candBuckets)
      .toDF("base_id", "a_n")
      .join(candIds, Seq("base_id"), "left_semi")
    val near = inter
      .join(baseSizes, "base_id")
      .join(shBatch.groupBy(col("doc_id")).agg(count(lit(1)).as("b_n")),
        "doc_id")
      .withColumn("jaccard",
        round(col("n_inter").cast("double") /
          (col("a_n") + col("b_n") - col("n_inter")), 6))
      .where(col("jaccard") >= threshold)
    val best = Window.partitionBy(col("doc_id"))
      .orderBy(col("jaccard").desc, col("base_id"))
    val bestNear = near.withColumn("rn", row_number().over(best))
      .where(col("rn") === 1)
      .select(col("doc_id"), col("base_id").as("near_of"), col("jaccard"))
    n.select(col("doc_id"))
      .join(exact, Seq("doc_id"), "left")
      .join(bestNear, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("exact_of").isNotNull, lit("exact"))
          .when(col("near_of").isNotNull, lit("near"))
          .otherwise(lit("novel")).as("verdict"),
        coalesce(col("exact_of"), col("near_of")).as("dup_of"),
        when(col("exact_of").isNotNull, lit(1.0))
          .otherwise(col("jaccard")).as("jaccard"))
  }

  /** Memoized per-(process, sfDir) built index over the documents
    * table, folded in TWO segments so every probe exercises the
    * multi-segment path. */
  def builtIndexDir(spark: SparkSession, sfDir: String): String =
    synchronized {
      val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val dir = new java.io.File(s"/tmp/graft_dedup_index/p${graft.Fs.pid}_$key")
      if (SnapshotManifest.read(dir).version == 0L) {
        val docs = graft.sources.Tables.table(spark, sfDir, "documents")
          .select(col("doc_id"), col("text"))
        appendBatch(dir.toString)(docs.where(col("doc_id") % 2 === 0), 0L)
        appendBatch(dir.toString)(docs.where(col("doc_id") % 2 === 1), 1L)
      }
      dir.toString
    }
}
