package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AdaptiveSparkPlanHelper}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopK, TopKPerKeyExec}

/** The native grouped top-k operator (tier-(c) plan extension). Pins the
  * three properties that make it worth a custom physical operator:
  * result parity with the window-rank formulation, the partial→exchange→
  * final plan shape, and the shuffle-volume bound (partial emits ≤
  * k·keys·partitions rows, strictly fewer than the input). */
class TopKPlanSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  import SparkTest._

  private def executed(df: DataFrame): SparkPlan = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
  }

  private def orders = spark.read.parquet(s"$Sf/orders.parquet")
    .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))

  test("parity with the window-rank twin (ties broken by unique key)") {
    val native = TopK.perKey(orders, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .orderBy("o_custkey", "o_orderkey").collect()
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val twin = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
      .orderBy("o_custkey", "o_orderkey").collect()
    assert(native.length === twin.length)
    assert(native.sameElements(twin))
  }

  test("k larger than any group returns every row") {
    val n = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_orderkey", false)), k = 1000000).count()
    assert(n === orders.count())
  }

  test("plan: partial phase feeds an exchange feeding the final phase") {
    val df = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val plan = executed(df)
    // AdaptiveSparkPlanHelper.collect descends through AQE stage boundaries
    val phases = collect(plan) { case e: TopKPerKeyExec => e }
    assert(phases.map(_.isFinal).sorted === Seq(false, true),
      s"expected one partial and one final TopKPerKeyExec:\n$plan")
    // the final phase must sit above a hash exchange on the key — that
    // exchange is the ONLY shuffle, and it carries the partial's output
    assert(plan.toString.contains("Exchange hashpartitioning(o_custkey"),
      s"expected a hash exchange between the phases:\n$plan")
  }

  test("partial phase ships fewer rows than the input (the 100 TB argument)") {
    val df = TopK.perKey(orders, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
    val plan = executed(df)
    val Seq(partial) = collect(plan) {
      case e: TopKPerKeyExec if !e.isFinal => e
    }
    val shipped = partial.metrics("numOutputRows").value
    val input = orders.count()
    val finalRows = df.count()
    assert(shipped < input,
      s"partial must cut shuffle volume: shipped $shipped of $input")
    // bounded by k · keys · map-partitions, and no smaller than the answer
    assert(shipped >= finalRows)
  }

  test("RankLimitToTopK: the window idiom silently plans as the native operator") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val idiom = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = executed(idiom)
    val phases = collect(plan) { case e: TopKPerKeyExec => e }
    assert(phases.size === 2, s"expected the native operator:\n$plan")
    assert(!plan.toString.contains("Window"),
      s"window machinery must be gone:\n$plan")

    // ground truth from a session with the rewrite excluded: a REAL
    // window plan, same rows
    val ctl = spark.newSession()
    ctl.conf.set("spark.sql.optimizer.excludedRules",
      "graft.plans.RankLimitToTopK")
    val ordersCtl = ctl.read.parquet(s"$Sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val ctlDf = ordersCtl.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(collect(executed(ctlDf)) { case e: TopKPerKeyExec => e }.isEmpty,
      "control session must keep the window plan")
    assert(idiom.orderBy("o_custkey", "o_orderkey").collect()
      .sameElements(ctlDf.orderBy("o_custkey", "o_orderkey").collect()))
  }

  test("RankLimitToTopK guards: projected rank or rank() do NOT rewrite") {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    // rnk is in the output → the native operator can't produce it
    val keepsRank = orders.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
    assert(collect(executed(keepsRank)) { case e: TopKPerKeyExec => e }.isEmpty)
    // rank() admits >k rows on ties — semantics the heap can't express
    val rankFn = orders.withColumn("rn", rank().over(w))
      .where(col("rn") <= 3).drop("rn")
    assert(collect(executed(rankFn)) { case e: TopKPerKeyExec => e }.isEmpty)
  }
}
