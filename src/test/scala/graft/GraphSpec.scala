package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, TimeSeries}

/** Triangle counting (both physical strategies) + time-series gap-fill. */
class GraphSpec extends AnyFunSuite {
  import SparkTest._

  /** Hand-auditable graph: K4 on {1,2,3,4} (4 triangles) + pendant 5-1 +
    * disjoint triangle {6,7,8} + isolated edge 9-10. */
  private val handEdges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (1L, 5L), (6L, 7L), (6L, 8L), (7L, 8L), (9L, 10L))

  test("triangleCount: K4 + pendant + disjoint triangle, both strategies") {
    import spark.implicits._
    val edges = handEdges.toDF("a", "b")
    // 4 triangles in K4 (Σ nodes: 123+124+134+234 = 6+7+8+9 = 30)
    // + {6,7,8} (Σ 21) → 5 triangles, checksum 51
    for (fn <- Seq(Graph.triangleCount _, Graph.triangleCountAdj _)) {
      val Array(row) = fn(edges).as[(Long, Long)].collect()
      assert(row === ((5L, 51L)))
    }
  }

  test("wedge-join and broadcast-adjacency strategies agree on real co-occurrence edges") {
    import spark.implicits._
    val edges = Graph.coOccurrenceEdges(
      graft.sources.Tables.events(spark, "/root/testdata/sf0.01"))
    val a = Graph.triangleCount(edges).as[(Long, Long)].collect().head
    val b = Graph.triangleCountAdj(edges).as[(Long, Long)].collect().head
    assert(a === b)
    assert(a._1 > 0) // non-vacuous: the graph actually has triangles
  }

  test("triangleCountAuto dispatches on edge count and both tiers agree") {
    import spark.implicits._
    val edges = handEdges.toDF("a", "b") // 11 edges, 5 triangles
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.optimizedPlan.toString
    // small side of the threshold → broadcast-adjacency tier
    // (its signature op is the map-side array_intersect)
    val small = Graph.triangleCountAuto(edges, broadcastMaxEdges = 100)
    assert(planOf(small).contains("array_intersect"))
    assert(small.as[(Long, Long)].collect().head === ((5L, 51L)))
    // a "dense" graph past the threshold → partitioned wedge join
    // (no broadcast adjacency anywhere in the plan)
    val big = Graph.triangleCountAuto(edges, broadcastMaxEdges = 10)
    assert(!planOf(big).contains("array_intersect"))
    assert(big.as[(Long, Long)].collect().head === ((5L, 51L)))
  }

  test("triangleCountAutoFromEvents: bucket-bound dispatch, tiers agree on real events") {
    import spark.implicits._
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val viaAdj = Graph.triangleCountAutoFromEvents(events)
      .as[(Long, Long)].collect().head
    // a 1-edge threshold forces the wedge tier on the same events
    val viaWedge = Graph.triangleCountAutoFromEvents(events, broadcastMaxEdges = 1)
      .as[(Long, Long)].collect().head
    assert(viaAdj === viaWedge)
  }

  test("activityIslands: adjacent events merge, a gap splits, span is exact") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:30:00")),
      (1L, ts("2024-01-01 01:00:00")), // island 1: span 3600s
      (1L, ts("2024-01-01 03:00:00")), // >45min gap → island 2: span 0
      (2L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:45:00"))
    ).toDF("user_id", "ts")
    val out = TimeSeries.activityIslands(events, gapMin = 45)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, 2L, 3600L, 3600L),
      (2L, 1L, 2700L, 2700L))) // exactly 45min apart: NOT a split (>, not >=)
  }

  test("interpolateHourly: gap values sit on the line between observations") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00"), 10.0),
      // hours 01, 02 silent → interpolate 10 → 40 linearly
      (1L, ts("2024-01-01 03:05:00"), 40.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.interpolateHourly(events, maxUser = 100)
      .select($"hour".cast("string"), $"rev_interp", $"is_gap")
      .as[(String, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      ("2024-01-01 00:00:00", 10.0, false),
      ("2024-01-01 01:00:00", 20.0, true),
      ("2024-01-01 02:00:00", 30.0, true),
      ("2024-01-01 03:00:00", 40.0, false)))
  }

  test("gapFillHourly: gaps carry the last observed value and are flagged") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, ts("2024-01-01 00:10:00"), 5.0),
      (1L, ts("2024-01-01 00:40:00"), 7.0),
      // hours 01 and 02 silent
      (1L, ts("2024-01-01 03:05:00"), 1.5),
      (2L, ts("2024-01-01 10:00:00"), 2.0)
    ).toDF("user_id", "ts", "value")
    val out = TimeSeries.gapFillHourly(events, maxUser = 100)
      .select($"user_id", $"hour".cast("string"), $"n", $"rev_filled", $"is_gap")
      .as[(Long, String, Long, Double, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, "2024-01-01 00:00:00", 2L, 12.0, false),
      (1L, "2024-01-01 01:00:00", 0L, 12.0, true), // forward-filled
      (1L, "2024-01-01 02:00:00", 0L, 12.0, true),
      (1L, "2024-01-01 03:00:00", 1L, 1.5, false),
      (2L, "2024-01-01 10:00:00", 1L, 2.0, false)))
  }
}
