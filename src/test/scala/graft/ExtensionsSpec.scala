package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: the SparkSessionExtensions entry point (injected
  * catalog function + optimizer rule). The shared test session is built
  * with the extensions (SparkTest), so they are exercised exactly as a
  * deployment would wire them. */
class ExtensionsSpec extends AnyFunSuite {
  import SparkTest._

  test("injected cosine_sim resolves from SQL without manual registration") {
    val r = spark.sql(
      "SELECT cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
      .head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // and is a catalog function, not a temp one: DESCRIBE works
    val desc = spark.sql("DESCRIBE FUNCTION cosine_sim").collect().mkString
    assert(desc.contains("cosine_sim"))
  }

  test("AnchoredRegexToPrefix: anchored literal RLIKE becomes a pushed StringStartsWith") {
    import spark.implicits._
    val df = graft.sources.Tables.table(spark, Sf, "customer")
      .where($"c_name".rlike("^Customer"))
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("StringStartsWith"),
      s"expected the rewritten prefix filter pushed to the scan:\n$physical")
    // result parity with the un-rewritten regex evaluated as a UDF-free
    // literal plan: compare against substring equality
    val viaPrefix = df.count()
    val expected = graft.sources.Tables.table(spark, Sf, "customer")
      .where(substring($"c_name", 1, 8) === "Customer").count()
    assert(viaPrefix === expected && viaPrefix > 0)
  }

  test("AnchoredRegexToPrefix leaves non-literal or unanchored patterns untouched") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.RLike
    for (pat <- Seq("^Customer.*9$", "Customer", "^(A|B)")) {
      val df = graft.sources.Tables.table(spark, Sf, "customer")
        .where($"c_name".rlike(pat))
      val rlikes = df.queryExecution.optimizedPlan.expressions.flatMap(_.collect {
        case r: RLike => r
      })
      assert(rlikes.nonEmpty, s"pattern $pat should have stayed an RLike")
    }
  }

  test("redundant nested dedup collapses via Spark's own optimizer (no custom rule needed)") {
    import spark.implicits._
    // dropDuplicates(k).distinct(): ReplaceDeduplicateWithAggregate +
    // RemoveRedundantAggregates leave a single aggregate — evidence that
    // declarative plans get this for free (the Spark-first argument).
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .dropDuplicates("k")
      .distinct()
    val aggs = df.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1, df.queryExecution.optimizedPlan.toString)
    assert(df.count() === 2)
  }
}
