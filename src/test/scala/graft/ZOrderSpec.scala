package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.expressions.InterleaveBits
import graft.operators.ZOrderLayout

/** Z-order layout: interleave goldens, codegen/interpreted agreement,
  * file-skipping effectiveness, and exactness of the pruned read. */
class ZOrderSpec extends AnyFunSuite {
  import SparkTest._

  test("Morton interleave goldens") {
    // x=3 (0b11) spreads to 0b0101; y=1 spreads to 0b01, shifted 0b10
    assert(InterleaveBits.spread(3L) === 5L)
    assert(InterleaveBits.spread(0xFFFFFFFFL) === 0x5555555555555555L)
    val z = (x: Long, y: Long) =>
      InterleaveBits.spread(x) | (InterleaveBits.spread(y) << 1)
    assert(z(3L, 1L) === 7L)
    assert(z(0L, 0L) === 0L)
    // Morton order groups quadrants: all of [0,1]x[0,1] sorts before
    // any of [2,3]x[2,3]
    val q00 = for { x <- 0L to 1L; y <- 0L to 1L } yield z(x, y)
    val q11 = for { x <- 2L to 3L; y <- 2L to 3L } yield z(x, y)
    assert(q00.max < q11.min)
  }

  test("codegen expression agrees with the interpreted spread") {
    import spark.implicits._
    val df = (0L until 1000L).toDF("x")
      .select(col("x"), (col("x") * 7919L % 1000000L).as("y"))
    val got = df.select(
        InterleaveBits.zorder(spark)(col("x"), col("y")).as("z"),
        col("x"), col("y"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(0) ===
        (InterleaveBits.spread(r.getLong(1)) |
          (InterleaveBits.spread(r.getLong(2)) << 1)))
    }
    // out-of-range input fails loudly, not silently
    intercept[Exception] {
      Seq(-1L).toDF("x").select(
        InterleaveBits.zorder(spark)(col("x"), col("x"))).collect()
    }
    ()
  }

  test("box query reads strictly fewer files than the table has") {
    val dir = ZOrderLayout.layout(spark, Sf)
    val total = ZOrderLayout.manifest(spark, dir).size
    val pruned = ZOrderLayout.prunedPaths(spark, dir, 4L, 7L, 200L, 399L)
    assert(total === ZOrderLayout.Files)
    assert(pruned.nonEmpty)
    assert(pruned.size < total,
      s"z-order skipping pruned nothing: ${pruned.size} of $total files")
  }

  test("pruned read is exact: equals the full-scan filter") {
    val viaIndex = ZOrderLayout.readBox(spark, Sf, 4L, 7L, 200L, 399L)
      .orderBy("event_id").collect().toSeq
    val viaScan = graft.sources.Tables.events(spark, Sf)
      .where(col("user_id").between(4, 7) &&
        col("event_id").between(200, 399))
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy("event_id").collect().toSeq
    assert(viaIndex === viaScan)
    assert(viaIndex.nonEmpty)
  }

  test("a box outside the data reads zero files and returns empty") {
    val dir = ZOrderLayout.layout(spark, Sf)
    assert(ZOrderLayout.prunedPaths(spark, dir,
      1000000L, 2000000L, 1L, 2L).isEmpty)
    assert(ZOrderLayout.readBox(spark, Sf,
      1000000L, 2000000L, 1L, 2L).count() === 0L)
  }
}
