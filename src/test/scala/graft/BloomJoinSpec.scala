package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BloomJoin

/** Bloom-pruned join: the prune is a strict superset of the true match
  * set (no false negatives), actually prunes, and the joined result is
  * bit-identical to the unpruned join. */
class BloomJoinSpec extends AnyFunSuite {
  import SparkTest._

  private def tbl(name: String) =
    spark.read.parquet(s"$Sf/$name.parquet")

  test("prune keeps every true match and drops most non-matches") {
    val dim = tbl("orders").where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    val fact = tbl("lineitem")
    val pruned = BloomJoin.pruneFact(fact, "l_orderkey", dim, "o_orderkey",
      dim.count())
    val factN = fact.count()
    val prunedN = pruned.count()
    val trueN = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi").count()
    assert(trueN > 0)
    // superset of true matches, strictly smaller than the fact
    assert(prunedN >= trueN)
    assert(prunedN < factN,
      s"bloom pruned nothing: $prunedN of $factN rows survive")
    // at fpp=1% the false-positive overhang is small
    assert(prunedN - trueN <= (factN - trueN) / 10,
      s"false-positive overhang too large: pruned=$prunedN true=$trueN")
  }

  test("pruned join result equals the unpruned join") {
    val dim = tbl("orders").where(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"), col("o_orderpriority"))
    val fact = tbl("lineitem")
    def agg(f: org.apache.spark.sql.DataFrame) =
      f.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(28,10)"))
            .cast("double").as("rev"))
        .orderBy("o_orderpriority")
    val pruned = BloomJoin.pruneFact(fact, "l_orderkey", dim, "o_orderkey",
      dim.count())
    assert(agg(pruned).collect().toSeq === agg(fact).collect().toSeq)
  }

  test("null probe keys are dropped by the prune (inner-join semantics)") {
    import spark.implicits._
    val dim = Seq(1L, 2L).toDF("k")
    val fact = Seq(Some(1L), Some(99L), None).toDF("fk")
    val kept = BloomJoin.pruneFact(fact, "fk", dim, "k", 2L)
      .collect().map(r => r.getLong(0)).toSet
    assert(kept.contains(1L))
    assert(!kept.contains(99L) || kept.size <= 2) // 99 may false-positive
    // the null row can never survive: mightContain(null) = false
    assert(BloomJoin.pruneFact(fact, "fk", dim, "k", 2L)
      .where(col("fk").isNull).count() === 0L)
  }

  test("probe expression agrees with the driver-side sketch") {
    import spark.implicits._
    val dim = (0L until 500L).filter(_ % 3 == 0).toDF("k")
    val bytes = BloomJoin.keyFilter(dim, "k", 200L)
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bytes))
    val got = (0L until 500L).toDF("x")
      .select(col("x"),
        BloomJoin.mightContain(spark)(col("x"), bytes).as("m"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1))
    got.foreach { case (x, m) => assert(m === bf.mightContainLong(x)) }
  }
}
