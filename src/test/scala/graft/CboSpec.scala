package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cost-based-optimizer plumbing: ANALYZE TABLE writes table + column
  * statistics into the catalog, and a CBO-enabled session's plans carry
  * the analyzed rowCount instead of a size-derived guess — the
  * prerequisite for stats-driven join reordering at 100 TB, where
  * "which side is small" cannot be read off file sizes after filters.
  */
class CboSpec extends AnyFunSuite {
  import SparkTest._

  test("ANALYZE TABLE feeds exact rowCount + column NDV into plan stats") {
    // own-conf session: CBO stays off for every other suite. Plan-stats
    // visitors read SQLConf.get (the ACTIVE session's conf), so the CBO
    // session must also be made active for the assertion window.
    val parent = spark
    val ss = parent.newSession()
    ss.conf.set("spark.sql.cbo.enabled", "true")
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try {
    ss.sql("CREATE DATABASE IF NOT EXISTS graft_cbo")
    ss.read.parquet(s"$Sf/nation.parquet").write
      .mode("overwrite").saveAsTable("graft_cbo.nation_t")
    ss.sql("ANALYZE TABLE graft_cbo.nation_t COMPUTE STATISTICS FOR ALL COLUMNS")

    val n = ss.table("graft_cbo.nation_t").count()
    val stats = ss.table("graft_cbo.nation_t")
      .queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(n)),
      s"expected analyzed rowCount=$n, got ${stats.rowCount}")

    // column-level NDV survives into the catalog (what joinReorder uses)
    val desc = ss.sql(
      "DESCRIBE EXTENDED graft_cbo.nation_t n_nationkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(desc("distinct_count") === n.toString)

    // a filtered scan's estimate shrinks BELOW the analyzed total —
    // selectivity from column stats, not file size
    val filtered = ss.table("graft_cbo.nation_t")
      .where("n_nationkey < 5").queryExecution.optimizedPlan.stats
    assert(filtered.rowCount.exists(_ < BigInt(n)),
      s"expected filtered rowCount < $n, got ${filtered.rowCount}")
    } finally org.apache.spark.sql.SparkSession.setActiveSession(parent)
  }
}
