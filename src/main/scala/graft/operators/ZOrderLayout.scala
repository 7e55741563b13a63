package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.InterleaveBits

/** Z-order data layout + file-level min/max skipping — the lakehouse
  * data-skipping pattern (Delta/Iceberg OPTIMIZE ZORDER), built from
  * first principles on plain parquet so the mechanism is explicit:
  *
  *  1. '''Layout''': rows are range-partitioned and sorted by the Morton
  *     interleave of the two filter dimensions
  *     ([[graft.expressions.InterleaveBits]]), so each written file
  *     covers a compact 2-D tile — its per-file (min,max) box is TIGHT
  *     in both dimensions, where a 1-D sort gives tight boxes in one
  *     dimension and full-range boxes in the other.
  *  2. '''Manifest''': one aggregate over the written files computes the
  *     per-file min/max of both dimensions — O(files) driver-side state,
  *     the same shape as a table format's file-statistics manifest.
  *  3. '''Skipping read''': a 2-D box predicate consults the manifest and
  *     reads ONLY the files whose stats box intersects the query box;
  *     the exact predicate still applies to the surviving rows, so
  *     results are exact regardless of how coarse the stats are.
  *
  * At 100 TB the manifest is the planning index: a tenant/time box query
  * opens the handful of files whose tiles intersect it instead of
  * listing the table. Layout cost is one shuffle (range partition by z),
  * amortized over every box query that follows. ZOrderSpec pins the
  * skipping (pruned file set strictly smaller) and exactness.
  */
object ZOrderLayout {

  val Files = 16

  private val manifests =
    scala.collection.mutable.Map[String, Seq[FileBox]]()

  case class FileBox(path: String, uLo: Long, uHi: Long, eLo: Long, eHi: Long)

  /** Stage the z-ordered copy of `events` (once per sfDir + process). */
  def layout(spark: SparkSession, sfDir: String): String = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    val dir = graft.Fs.scratch("/tmp/graft_zorder", key)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      dir.getParentFile.mkdirs()
      val z = InterleaveBits.zorder(spark) _
      graft.sources.Tables.events(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("z", z(col("user_id"), col("event_id")))
        .repartitionByRange(Files, col("z"))
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite").parquet(dir.toString)
    }
    dir.toString
  }

  /** Per-file min/max stats of both filter dimensions (cached; one small
    * aggregate job per staged dir — files × 4 longs of driver state). */
  def manifest(spark: SparkSession, dir: String): Seq[FileBox] = synchronized {
    manifests.getOrElseUpdate(dir, {
      spark.read.parquet(dir)
        .groupBy(input_file_name().as("path"))
        .agg(min("user_id").as("ulo"), max("user_id").as("uhi"),
          min("event_id").as("elo"), max("event_id").as("ehi"))
        .collect()
        .map(r => FileBox(r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4)))
        .toSeq
    })
  }

  /** Files whose stats box intersects the query box. */
  def prunedPaths(spark: SparkSession, dir: String,
      uLo: Long, uHi: Long, eLo: Long, eHi: Long): Seq[String] =
    manifest(spark, dir)
      .filter(b => b.uLo <= uHi && uLo <= b.uHi &&
        b.eLo <= eHi && eLo <= b.eHi)
      .map(_.path)

  /** Exact 2-D box query through the skipping index: read only the
    * intersecting files, then apply the exact predicate. */
  def readBox(spark: SparkSession, sfDir: String,
      uLo: Long, uHi: Long, eLo: Long, eHi: Long): DataFrame = {
    val dir = layout(spark, sfDir)
    val paths = prunedPaths(spark, dir, uLo, uHi, eLo, eHi)
    val base =
      if (paths.isEmpty)
        spark.read.parquet(dir).limit(0) // schema-only; no file reads run
      else spark.read.parquet(paths: _*)
    base.where(col("user_id").between(uLo, uHi) &&
        col("event_id").between(eLo, eHi))
      .select(col("event_id"), col("user_id"), col("value"))
  }
}
