package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe-cost-vs-corpus-size measurement for the four maintained index
  * artifacts (round-9 verdict item 5 — the decade beyond the sf0.3
  * suite curve, where the probe-vs-rebuild gap becomes visible).
  *
  * For each corpus multiplier (default 1, 3, 10 over the sf0.1
  * documents/embeddings — 10× sf0.1 ≈ sf1), the tool synthesizes a
  * deterministic corpus under /tmp (disjoint id ranges; texts prefixed
  * per replica so shingle/term sets stay distinct and no artificial
  * near-clique forms; embeddings perturbed per replica), BUILDS each
  * artifact once, then times the FIXED standard probe against it —
  * the same probe batch / query set at every multiplier, because the
  * claim under test is exactly that probe cost is O(batch + touched
  * buckets), flat in corpus size, while the build pays the corpus.
  *
  * Each multiplier measures TWO geometries per artifact:
  *   - `<artifact>` — the creation-time DEFAULT geometry (8 buckets /
  *     4 cells): probe cost here grows as corpus ÷ buckets, because a
  *     probed bucket's CONTENT grows when the bucket count does not —
  *     the measured argument for geometry evolution;
  *   - `<artifact>@geo` — geometry scaled WITH the corpus (buckets =
  *     8×mult, cells = 4×mult — what `rebucket`/`rebuild` exist for):
  *     the probed slice stays O(batch), so probe cost stays flat while
  *     build grows with the corpus. This pair IS the 100 TB claim.
  *
  * A third measurement per (artifact, geometry) point covers the
  * DELETE-HEAVY regime (`dedupchurn` / `dedupchurn@geo`): the corpus
  * added whole then ~83% tombstoned across five uncompacted delete
  * batches, probed by the same fixed batch — the last unmeasured axis
  * of the tombstone story (probe cost must track the batch, not the
  * corpus and not the delete history, at every multiplier).
  *
  * Usage: tools/run.sh graft.tools.ScalePoint [mult ...]
  * (pass a duplicate leading mult as a sacrificial JIT warm-up and
  * read only the later occurrence of each point). Prints one JSON
  * line per (artifact, geometry, multiplier):
  *   {"artifact":"text","mult":10,"corpus_rows":N,"build_sec":B,
  *    "probe_sec":P}
  * probe_sec is the min of 3 timed probes (first discarded as warm-up).
  */
object ScalePoint {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.warehouse.dir", s"/tmp/graft_warehouse_${graft.Fs.pid}")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnIndex, DedupIndex, SubstringIndex, TextIndex}

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probeMin(reps: Int = 3)(f: => Unit): Double =
      (1 to reps).map { _ =>
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        timed(f)
      }.drop(1).min

    /** mult replicas of the documents table with disjoint id ranges;
      * replica i's texts carry a distinct leading token so no replica
      * duplicates another (the probe's candidate volume must not grow
      * superlinearly by construction). Staged to parquet so builds read
      * a real corpus, not a recomputed union. */
    def docsAt(mult: Int): DataFrame = {
      val base = graft.sources.Tables.table(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"))
      val out = graft.Fs.scratch("/tmp/graft_scalepoint", s"docs_x$mult")
      if (!new java.io.File(out, "_SUCCESS").exists())
        (0 until mult).map { i =>
          base.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
            (if (i == 0) col("text")
             else concat(lit(s"rep$i "), col("text"))).as("text"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(out.toString)
      spark.read.parquet(out.toString)
    }

    /** Embedding replicas, deterministically rotated per replica (a
      * per-dimension sign flip pattern keyed by replica index) so cells
      * stay populated without duplicating vectors. */
    def embAt(mult: Int): DataFrame = {
      val base = graft.sources.Tables.table(spark, sfDir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("e"))
      val out = graft.Fs.scratch("/tmp/graft_scalepoint", s"emb_x$mult")
      if (!new java.io.File(out, "_SUCCESS").exists())
        (0 until mult).map { i =>
          base.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
            (if (i == 0) col("e")
             else transform(col("e"), (x, j) =>
               when((j + lit(i)) % 3 === 0, -x).otherwise(x))).as("e"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(out.toString)
      spark.read.parquet(out.toString)
    }

    def report(artifact: String, mult: Int, rows: Long, build: Double,
        probe: Double): Unit =
      println(s"""{"artifact":"$artifact","mult":$mult,"corpus_rows":$rows,""" +
        f""""build_sec":$build%.3f,"probe_sec":$probe%.3f}""")

    mults.foreach { mult =>
      val docs = docsAt(mult)
      val nDocs = docs.count()
      val emb = embAt(mult)
      val nVecs = emb.count()
      val probeBatch = graft.sources.ExtCorpus.incrementalBatch(spark, sfDir)
      val qs = graft.sources.Tables.table(spark, sfDir, "documents")
        .where(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("q_id"),
          explode(slice(split(col("text"), " "), 1, 3)).as("term"))
        .distinct()
      val queries = emb.where(col("vec_id") % 100 === 0)
        .where(col("vec_id") < 10000000L)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))

      // geoMult = 1: creation-time default geometry regardless of
      // corpus size. geoMult = mult: geometry scaled with the corpus.
      def run(geoMult: Int): Unit = {
        val geo = if (geoMult == 1) "" else "@geo"
        val nb = 8 * geoMult

        val textDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_text$geo-x$mult").toString
        val tBuild = timed(
          TextIndex.appendBatch(textDir, buckets = nb)(docs, 0L))
        val tProbe = probeMin()(
          TextIndex.retrieve(spark, textDir, qs, k = 10).count())
        report(s"text$geo", mult, nDocs, tBuild, tProbe)

        val annDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_ann$geo-x$mult").toString
        val aBuild = timed(AnnIndex.train(emb, annDir,
          AnnIndex.Conf(coarseK = 4 * geoMult)))
        val aProbe = probeMin()(
          AnnIndex.serve(spark, annDir, queries, emb).count())
        report(s"ann$geo", mult, nVecs, aBuild, aProbe)

        val dedupDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_dedup$geo-x$mult").toString
        val dBuild = timed(
          DedupIndex.appendBatch(dedupDir, buckets = nb)(docs, 0L))
        val dProbe = probeMin()(
          DedupIndex.probe(spark, dedupDir, probeBatch, 0.5).count())
        report(s"dedup$geo", mult, nDocs, dBuild, dProbe)

        // the DELETE-HEAVY column (round-10 verdict item 5): the same
        // corpus added whole then ~83% tombstoned across five
        // uncompacted delete batches — the sf0.1 `dedup_churn_probe`
        // regime at every multiplier. The claim under test: the probe's
        // two-phase liveness read stays bounded by the BATCH's candidate
        // buckets, so churn-probe cost tracks the clean probe and stays
        // flat in corpus size (and in the accumulated delete history).
        val churnDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_dchurn$geo-x$mult").toString
        val cBuild = timed {
          DedupIndex.applyCdcBatch(churnDir, buckets = nb)(
            docs.withColumn("deleted", lit(false)), 0L)
          (0 until 5).foreach { k =>
            DedupIndex.applyCdcBatch(churnDir)(
              docs.where(col("doc_id") % 6 === k)
                .select(col("doc_id"),
                  lit(null).cast("string").as("text"),
                  lit(true).as("deleted")), (k + 1).toLong)
          }
        }
        val cProbe = probeMin()(
          DedupIndex.probe(spark, churnDir, probeBatch, 0.5).count())
        report(s"dedupchurn$geo", mult, nDocs, cBuild, cProbe)

        val subDir = java.nio.file.Files
          .createTempDirectory(s"graft_sp_substr$geo-x$mult").toString
        val sBuild = timed(
          SubstringIndex.appendBatch(subDir, buckets = nb)(docs, 0L))
        val sProbe = probeMin()(
          SubstringIndex.probe(spark, subDir, probeBatch).count())
        report(s"substring$geo", mult, nDocs, sBuild, sProbe)
      }
      run(1)
      if (mult > 1) run(mult)
    }
    spark.stop()
  }
}
