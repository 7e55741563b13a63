package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, Sequencer}

class OperatorSpec extends AnyFunSuite {
  import SparkTest._

  test("stampSequence: dense 1..N, follows the requested total order") {
    import spark.implicits._
    val df = graft.sources.Tables.events(spark, Sf)
      .select($"event_id")
    val stamped = Sequencer.stampSequence(df.toDF(), "seq", Seq($"event_id".desc))
    val n = df.count()
    val rows = stamped.select($"event_id", $"seq").as[(Long, Long)].collect()
    assert(rows.map(_._2).sorted.toSeq === (1L to n).toSeq) // dense, unique
    // descending event_id order ⇒ seq + event_id rank invariant
    val byId = rows.sortBy(_._1)
    assert(byId.map(_._2).toSeq === (n to 1L by -1).toSeq)
  }

  test("asOf: picks latest right <= left, equal timestamps included, none before → null") {
    import spark.implicits._
    val left = Seq((1L, 10L, "l1"), (1L, 20L, "l2"), (1L, 5L, "l0"),
      (2L, 10L, "lx")).toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r@10"), (1L, 15L, "r@15"))
      .toDF("k", "rt", "payload")
    val out = AsOfJoin.asOf(left, right, key = "k",
        leftTime = "t", rightTime = "rt", payload = Seq("payload"))
      .select($"tag", $"asof_payload").as[(String, String)].collect().toMap
    assert(out("l0") === null) // no right row at or before t=5
    assert(out("l1") === "r@10") // equal timestamp matches (<= semantics)
    assert(out("l2") === "r@15") // latest preceding wins
    assert(out("lx") === null) // key with no right side at all
  }

  test("asOfNearest: closer side wins, exact-distance ties go backward") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000000L)
    val left = Seq((1L, ts(10), "only-after"), (1L, ts(100), "closer-before"),
      (1L, ts(52), "tie"), (2L, ts(5), "no-right"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, ts(50), "r@50"), (1L, ts(54), "r@54"),
      (1L, ts(110), "r@110")).toDF("k", "rt", "payload")
    val out = AsOfJoin.asOfNearest(left, right, key = "k",
        leftTime = "t", rightTime = "rt", payload = Seq("payload"))
      .select($"tag", $"asof_payload").as[(String, String)]
      .collect().toMap
    assert(out("only-after") === "r@50") // nothing before t=10 → forward
    assert(out("closer-before") === "r@110") // |100-110| < |100-54|
    assert(out("tie") === "r@50") // |52-50| == |54-52| → backward wins
    assert(out("no-right") === null)
  }
}
