package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ChangelogApply
import graft.sources.CdcGen

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query takes (spark, sfDir) and returns a DataFrame whose column
  * names match its oracle SQL exactly; both sides ORDER BY a unique key so
  * row order can never distort the driver's hash compare.
  */
object SparkEntry {

  /** Flagship: CDC changelog generate → apply → replica snapshot
    * (SURVEY.md §2 D10) on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ChangelogApply.customerSnapshot(spark, "/root/testdata/sf0.001")

  private def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- D10 changelog apply: scale path (latest-image per key) ----
    "cdc_apply_snapshot" -> ((s, dir) =>
      ChangelogApply.customerSnapshot(s, dir).orderBy("c_custkey")),

    // ---- D10 changelog apply: faithful full-image multiset path ----
    "cdc_apply_full_image" -> ((s, dir) => {
      val events = CdcGen.customerEvents(s, dir)
      CdcGen.decodeCustomer(ChangelogApply.fullImageMultiset(events))
        .orderBy("c_custkey")
    }),

    // ---- relational surface: hash agg w/ partial aggregation (TPC-H Q1) --
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .where($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(28,10)"))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    // Post-apply state expressed directly over the base table via the
    // CdcGen derivation rules (no replay needed — that's the point).
    "cdc_apply_snapshot" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    "cdc_apply_full_image" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
  )
}
