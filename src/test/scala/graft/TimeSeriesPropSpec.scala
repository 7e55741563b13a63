package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TimeSeries

/** Property test: for random per-user event-time sets, the distributed
  * gaps-and-islands result equals a direct in-memory fold (raw
  * ScalaCheck Gen with fixed seeds, as in ApplyPropertySpec). Exercises
  * duplicate timestamps, exact-threshold gaps, and single-event users —
  * the boundary zoo a planted corpus misses. */
class TimeSeriesPropSpec extends AnyFunSuite {
  import SparkTest._

  private val GapMin = 45

  /** events per user: micros offsets over a ~6h window, with duplicates
    * and near-threshold gaps made likely. */
  private val userGen: Gen[(Long, List[Long])] = for {
    uid <- Gen.choose(1L, 6L)
    n <- Gen.choose(1, 12)
    us <- Gen.listOfN(n, Gen.oneOf(
      Gen.choose(0L, 6L * 3600L * 1000000L),
      // exact multiples of the threshold — boundary pressure
      Gen.choose(0L, 8L).map(_ * GapMin * 60L * 1000000L)))
  } yield (uid, us)

  private def reference(us: Seq[Long]): (Long, Long, Long) = {
    val sorted = us.sorted
    val gapUs = GapMin * 60L * 1000000L
    // split where the strict gap exceeds the threshold (matches `>`)
    val islands = sorted.tail.foldLeft(List(List(sorted.head))) {
      case (acc @ cur :: rest, t) =>
        if (t - cur.head > gapUs) List(t) :: acc
        else (t :: cur) :: rest
      case (Nil, t) => List(List(t))
    }
    val spans = islands.map(i => (i.max - i.min) / 1000000L)
    (islands.size.toLong, spans.sum, spans.max)
  }

  test("activityIslands ≡ in-memory fold over random event sets") {
    import spark.implicits._
    for (seed <- 1 to 30) {
      val users = Gen.listOfN(5, userGen)
        .apply(Gen.Parameters.default, Seed(seed.toLong)).get
        .groupBy(_._1).view.mapValues(_.flatMap(_._2)).toMap
      val rows = users.toSeq.flatMap { case (uid, us) =>
        us.map(u => (uid, new java.sql.Timestamp(u / 1000L)))
      }
      // Timestamp(ms) loses sub-ms precision — regenerate the reference
      // from the same truncated values the operator will see
      val trunc = rows.groupBy(_._1).view
        .mapValues(_.map(r => r._2.getTime * 1000L)).toMap
      val got = TimeSeries.activityIslands(
          rows.toDF("user_id", "ts"), GapMin)
        .as[(Long, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      val want = trunc.map { case (u, us) => u -> reference(us.toSeq) }
      assert(got === want, s"seed $seed: got $got want $want")
    }
  }

  test("interpolate's second window adds NO exchange over the gap-fill plan") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
      df.collect()
      "Exchange (hash|range)partitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).size
    }
    val ev = graft.sources.Tables.events(spark, Sf)
    val nFill = exchanges(TimeSeries.gapFillHourly(ev, maxUser = 8))
    val nInterp = exchanges(TimeSeries.interpolateHourly(ev, maxUser = 8))
    // the forward window reuses the backward window's user_id hash
    // partitioning — "nearest in both directions" must cost a sort,
    // never a shuffle, over the one-direction plan
    assert(nInterp === nFill,
      s"interpolate added a shuffle: gapfill=$nFill interpolate=$nInterp")
  }
}
