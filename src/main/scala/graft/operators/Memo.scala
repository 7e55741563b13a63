package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-(process, sfDir) materialized-result memo.
  *
  * Exact ANN ground truth is the textbook use: recall@k audits of every
  * maintained serving path (inline, served, CDC-applied) share one
  * brute-force top-k over the same query set, and recomputing it per
  * audit multiplies the single most expensive scan in the suite — at
  * 100 TB an exact-truth pass over the corpus is an audit ARTIFACT you
  * compute once and evaluate many models/indexes against (the standard
  * recall-eval discipline), not a subexpression. The memo is keyed by
  * process so concurrent JVMs (verify vs bench) never race on a
  * half-written dir, and by sfDir so scale factors stay isolated;
  * `_SUCCESS` is the completed-write marker, the same contract as
  * [[DedupIndex.builtIndexDir]].
  */
object Memo {
  def df(spark: SparkSession, sfDir: String, name: String)
      (build: => DataFrame): DataFrame = synchronized {
    val key = sfDir.replaceAll("[^A-Za-z0-9]", "_")
    // runKey-scoped (pid + JVM start time) with dead-owner reaping on
    // first use — pid recycling can never resurrect a stale memo, and
    // a bench session leaves no orphaned dirs from prior pids
    val dir = new java.io.File(graft.Fs.scratch("/tmp/graft_memo", key), name)
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      dir.getParentFile.mkdirs()
      build.write.mode("overwrite").parquet(dir.toString)
    }
    spark.read.parquet(dir.toString)
  }
}
