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

  test("D8/D9 — checkpoint resume: restart skips consumed input, restores state") {
    import spark.implicits._
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft_resume_in").toString
    val ckpt = Files.createTempDirectory("graft_resume_ckpt").toString
    val outDir = Files.createTempDirectory("graft_resume_out").toString

    def ev(seq: Long, op: String, img: Seq[String]) =
      CdcEvent(seq, "flv://m/g/t", "f", seq, op, null, Seq("k", "v"),
        Seq(CdcRowImages(null, img)))
    def writeBatch(name: String, evs: CdcEvent*): Unit =
      evs.toSeq.toDS().toDF().coalesce(1)
        .write.mode("overwrite").parquet(s"$inDir/$name")

    // memory sink cannot recover from a checkpoint; the file sink is the
    // fault-tolerant (exactly-once) one — the D8/D9 analogue proper.
    def runOnce(): Unit = {
      val stream = spark.readStream.schema(Cdc.EventSchema)
        .parquet(s"$inDir/*")
      val q = CdcStream.applyStream(stream)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      q.processAllAvailable(); q.stop()
    }

    // run 1: two inserts, consumed and checkpointed
    writeBatch("b1", ev(10, Cdc.OpAdd, Seq("a", "1")), ev(11, Cdc.OpAdd, Seq("b", "1")))
    runOnce()
    assert(spark.read.parquet(outDir).count() === 2)

    // run 2 (fresh query, same checkpoint): an update for a and a STALE
    // (lower-sequence) event for b. Total sink content must be run-1
    // emissions + {a's new image, b's RUN-1 image}: b re-emitting image
    // "1" (not "0") proves key state was restored from the checkpoint,
    // and no duplicate of run-1's rows proves the consumed input was
    // not reprocessed (offsets resumed).
    writeBatch("b2", ev(20, Cdc.OpUpdate, Seq("a", "2")), ev(5, Cdc.OpAdd, Seq("b", "0")))
    runOnce()
    val all = spark.read.parquet(outDir).as[Seq[String]].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(all === Map(
      Seq("a", "1") -> 1, Seq("a", "2") -> 1, Seq("b", "1") -> 2), s"got $all")
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
