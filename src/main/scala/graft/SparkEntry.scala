package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.ChangelogApply
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names match its oracle SQL exactly; both sides ORDER BY a unique key so
  * row order can never distort the driver's hash compare. Queries live in
  * graft.queries.* modules, one per capability area.
  */
object SparkEntry {

  /** Flagship: CDC changelog generate → apply → replica snapshot
    * (SURVEY.md §2 D10) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChangelogApply.customerSnapshot(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++
      ExtensionQueries.queries ++ StreamingQueries.queries ++
      SourceQueries.queries ++ CurationQueries.queries ++
      Sql4Queries.queries ++ AnalyticsQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++
      ExtensionQueries.oracles ++ StreamingQueries.oracles ++
      SourceQueries.oracles ++ CurationQueries.oracles ++
      Sql4Queries.oracles ++ AnalyticsQueries.oracles
}
