package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Cdc, CdcEvent, CdcRowImages}
import graft.operators.ChangelogApply
import graft.streaming.CdcStream

class StreamingSpec extends AnyFunSuite {
  import SparkTest._

  test("streaming apply ≡ batch apply on the generated changelog") {
    val stream = CdcStream.customerSnapshotStream(spark, Sf)
    val batch = ChangelogApply.customerSnapshot(spark, Sf)
    assert(stream.count() === batch.count())
    assert(stream.except(batch).isEmpty && batch.except(stream).isEmpty)
  }

  test("state carries across micro-batches (insert batch 1, update+delete batch 2)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CdcEvent]
    val snapshot = CdcStream.applyStream(input.toDF())
    val q = snapshot.writeStream.format("memory").queryName("fmgws_t")
      .outputMode("append").start()

    def ev(seq: Long, op: String, img: Seq[String]) =
      CdcEvent(seq, "flv://m/g/t", "f", seq, op, null, Seq("k", "v"),
        Seq(CdcRowImages(null, img)))

    input.addData(ev(1, Cdc.OpAdd, Seq("a", "1")), ev(2, Cdc.OpAdd, Seq("b", "1")))
    q.processAllAvailable()
    input.addData(ev(3, Cdc.OpUpdate, Seq("a", "2")), ev(4, Cdc.OpDelete, Seq("b", "1")))
    q.processAllAvailable()
    q.stop()

    // batch 1 emitted both inserts; batch 2 emitted the updated image for
    // key a only (b deleted → no emission). Latest emission per key wins.
    val emitted = spark.table("fmgws_t").as[Seq[String]].collect().toSeq
    assert(emitted.contains(Seq("a", "2")), s"got $emitted")
    assert(!emitted.contains(Seq("b", "2")))
    assert(emitted.count(_.head == "b") === 1) // only the batch-1 insert
  }
}
