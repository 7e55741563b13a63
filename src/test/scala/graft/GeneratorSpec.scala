package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the custom Catalyst Generator (`sliding_windows`): exact
  * window semantics (start grid, partial tail, empty/null inputs), the
  * analysis-time contract for bad arguments, and that the analyzer
  * plans it into a Generate node (the UDTF path, composing with column
  * pruning like built-in explode). */
class GeneratorSpec extends AnyFunSuite {
  import SparkTest._

  private def windows(arr: Seq[String], size: Int, step: Int): Seq[(Int, Seq[String])] = {
    import spark.implicits._
    graft.expressions.ShingleOps.ensureRegistered(spark)
    Seq(arr).toDF("a")
      .select(expr(s"sliding_windows(a, $size, $step)").as(Seq("i", "w")))
      .as[(Int, Seq[String])].collect().toSeq
  }

  test("window grid: starts at 0, step, …; trailing window partial") {
    assert(windows(Seq("a", "b", "c", "d", "e"), 3, 2) ===
      Seq((0, Seq("a", "b", "c")), (1, Seq("c", "d", "e")), (2, Seq("e"))))
    // size > length: one partial window
    assert(windows(Seq("x"), 8, 4) === Seq((0, Seq("x"))))
  }

  test("empty and null arrays generate no rows") {
    assert(windows(Seq.empty, 3, 2).isEmpty)
    import spark.implicits._
    val nulls = Seq(Option.empty[Seq[String]]).toDF("a")
      .select(expr("sliding_windows(a, 3, 2)"))
    assert(nulls.count() === 0)
  }

  test("bad size/step are analysis-time errors, not task failures") {
    import spark.implicits._
    val df = Seq(Seq("a")).toDF("a")
    val e = intercept[Exception] {
      df.select(expr("sliding_windows(a, 0, 2)")).collect()
    }
    assert(e.getMessage.contains("positive integer literals"), e.getMessage)
    val e2 = intercept[Exception] {
      df.select(expr("sliding_windows(42, 3, 2)")).collect()
    }
    assert(e2.getMessage.toLowerCase.contains("array"), e2.getMessage)
  }

  test("partition property: step == size windows concatenate to the input") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val n = rnd.nextInt(40) + 1
      val arr = Seq.fill(n)(rnd.alphanumeric.take(3).mkString)
      val size = rnd.nextInt(8) + 1
      val ws = windows(arr, size, size)
      assert(ws.map(_._1) === ws.indices, "window indices dense from 0")
      assert(ws.flatMap(_._2) === arr,
        s"step==size windows must partition the input (n=$n size=$size)")
      // overlapping windows: every element appears in ceil coverage and
      // each window starts on the step grid
      val ov = windows(arr, size + 1, size)
      ov.zipWithIndex.foreach { case ((i, w), k) =>
        assert(i === k)
        assert(w === arr.slice(k * size, k * size + size + 1))
      }
    }
  }

  test("plans into a Generate node (the built-in UDTF path)") {
    val df = graft.SparkEntry.queries("q_generator_windows")(spark, Sf)
    val analyzed = df.queryExecution.analyzed.toString()
    assert(analyzed.contains("Generate slidingwindows") ||
      analyzed.contains("Generate sliding_windows") ||
      analyzed.contains("SlidingWindows"),
      s"expected a Generate over SlidingWindows:\n$analyzed")
  }
}
