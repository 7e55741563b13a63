package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ReplicaSink

/** The partitioned replica sink (K2'): layout, pruning, and content. */
class SinkSpec extends AnyFunSuite {
  import SparkTest._

  test("partitioned replica: nation filter becomes a PartitionFilter (pruned scan, not a data filter)") {
    val out = ReplicaSink.readNation(spark, Sf, 7)
    val plan = out.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters") &&
      plan.matches("(?s).*PartitionFilters: \\[[^\\]]*c_nationkey[^\\]]*\\].*"),
      s"expected the nation filter in PartitionFilters, plan:\n$plan")
    // and the data-filter list must NOT need the partition key
    assert(!plan.matches("(?s).*PushedFilters: \\[[^\\]]*c_nationkey[^\\]]*\\].*"),
      s"nation filter leaked into PushedFilters (full scan), plan:\n$plan")
  }

  test("dim-side filter prunes the fact scan at runtime (dynamic partition pruning)") {
    val df = graft.queries.CdcQueries.queries("q_dpp_join")(spark, Sf)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("dynamicpruning"),
      s"expected a dynamicpruning subquery in PartitionFilters, plan:\n$plan")
    // and it must sit in PartitionFilters (listing-level pruning), not as
    // a post-scan data filter
    assert(plan.matches("(?s).*PartitionFilters: \\[[^\\]]*dynamicpruning[^\\]]*\\].*"),
      s"dynamicpruning not in PartitionFilters, plan:\n$plan")
    assert(df.collect().nonEmpty)
  }

  test("change feed opens ONLY the buckets the manifest diff names (O(delta), not O(table))") {
    import graft.operators.SnapshotManifest
    val root = java.nio.file.Files.createTempDirectory("graft_cdf_spec").toFile
    val rows = (0L until 40L).map(k => (k, k * 10))
    import spark.implicits._
    rows.toDF("k", "v").withColumn("bucket", pmod(col("k"), lit(4)).cast("int"))
      .repartition(4, col("bucket"))
      .write.partitionBy("bucket").parquet(new java.io.File(root, "e1").toString)
    SnapshotManifest.commit(root, SnapshotManifest.State(1L,
      (0 until 4).map(b => s"bucket=$b" -> s"e1/bucket=$b").toMap))
    // v2 rewrites bucket 2 only: k=2 updated, k=6 deleted, k=102 inserted
    rows.filter(_._1 % 4 == 2).filterNot(_._1 == 6)
      .map { case (k, v) => (k, if (k == 2) v + 1 else v) }
      .toDF("k", "v").unionByName(Seq((102L, 9L)).toDF("k", "v"))
      .withColumn("bucket", lit(2))
      .coalesce(1)
      .write.partitionBy("bucket").parquet(new java.io.File(root, "e2").toString)
    SnapshotManifest.commit(root, SnapshotManifest.State(2L,
      SnapshotManifest.read(root).entries + ("bucket=2" -> "e2/bucket=2")))
    val feed = ReplicaSink.changesBetween(spark, root.toString, 1L, 2L,
      "k BIGINT, v BIGINT", Seq("k"))
    val got = feed.select("k", "change_type", "before_v", "after_v")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)), Option(r.get(3)))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (2L, "update", Some(20L), Some(21L)),
      (6L, "delete", Some(60L), None),
      (102L, "insert", None, Some(9L))),
      s"unexpected feed: ${got.toSeq}")
    // the scan must touch bucket=2's dirs only — unchanged buckets are
    // invisible to the plan, which is the whole O(delta) contract
    val files = feed.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("bucket=2")),
      s"feed read outside the changed bucket: ${files.mkString(", ")}")
  }

  test("partitioned replica: read-back equals the direct apply for that nation") {
    import spark.implicits._
    val direct = graft.operators.ChangelogApply.customerSnapshot(spark, Sf)
      .where($"c_nationkey" === 7)
      .orderBy("c_custkey")
      .collect().toSeq
    val readBack = ReplicaSink.readNation(spark, Sf, 7)
      .orderBy("c_custkey")
      .collect().toSeq
    assert(readBack === direct)
    assert(readBack.nonEmpty)
  }

  test("streaming K2: multi-batch foreachBatch upsert converges to the batch apply") {
    // the replay MUST take the incremental path (several micro-batches,
    // each upserted into the bucketed replica) — not one big batch
    val out = graft.sources.CdcGen.decodeCustomer(
      graft.streaming.CdcStream.customerReplicaStreamSink(spark, Sf))
    val direct = graft.operators.ChangelogApply.customerSnapshot(spark, Sf)
    assert(out.count() === direct.count())
    assert(out.except(direct).isEmpty && direct.except(out).isEmpty)
    assert(ReplicaSink.lastUpsertBatches >= 2,
      s"expected a multi-micro-batch replay, saw ${ReplicaSink.lastUpsertBatches} upserts")
  }

  test("streaming K2: a delete crossing micro-batches removes the key from the replica") {
    import spark.implicits._
    import graft.model.{Cdc, CdcEvent, CdcRowImages}
    import java.nio.file.Files
    def ev(seq: Long, op: String, img: Seq[String]) =
      CdcEvent(seq, "flv://m/g/t", "f", seq, op, null, Seq("k", "v"),
        Seq(CdcRowImages(null, img)))
    val dir = Files.createTempDirectory("graft_upsert").toString
    def run(batchId: Long, evs: CdcEvent*): Unit = {
      // drive upsertBatch directly with the post-fold deltas the FMGWS
      // apply would emit for this batch
      val deltas = evs.map { e =>
        (e.uri, e.rows.head.cols.head, e.rows.head.cols,
          e.op == Cdc.OpDelete)
      }.toDF("uri", "key", "image", "deleted")
      ReplicaSink.upsertBatch(dir)(deltas, batchId)
    }
    run(0, ev(1, Cdc.OpAdd, Seq("a", "1")), ev(2, Cdc.OpAdd, Seq("b", "1")))
    assert(ReplicaSink.readReplicaImages(spark, dir).as[Seq[String]]
      .collect().toSet === Set(Seq("a", "1"), Seq("b", "1")))
    // batch 1: update a, delete b — b's removal must reach the replica
    run(1, ev(3, Cdc.OpUpdate, Seq("a", "2")), ev(4, Cdc.OpDelete, Seq("b", "1")))
    assert(ReplicaSink.readReplicaImages(spark, dir).as[Seq[String]]
      .collect().toSet === Set(Seq("a", "2")))
  }

  test("replica reads go through the manifest: a crashed epoch write is invisible") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_manifest").toString
    val b0 = Seq(("flv://m/g/t", "a", Seq("a", "1"), false))
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(b0, 0)
    val before = ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet
    assert(before === Set(Seq("a", "1")))
    // simulate a crash BETWEEN the epoch-1 data write and the manifest
    // swap: the epoch dir exists on disk with conflicting data, but no
    // pointer ever named it
    val orphan = Seq(("flv://m/g/t", "a", Seq("a", "CRASHED"), false))
      .toDF("uri", "key", "image", "deleted")
      .withColumn("bucket", org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.hash($"uri", $"key"),
        org.apache.spark.sql.functions.lit(ReplicaSink.ReplicaBuckets)))
    orphan.write.mode("overwrite")
      .partitionBy("bucket").parquet(s"$dir/epoch_1")
    // the old snapshot stays fully readable — reads never list the dir
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === before)
    // the next SUCCESSFUL commit supersedes and collects the orphan
    val b2 = Seq(("flv://m/g/t", "a", Seq("a", "2"), false))
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(b2, 2)
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === Set(Seq("a", "2")))
    assert(!new java.io.File(s"$dir/epoch_1").exists(),
      "gc after the next commit must collect the crashed epoch's orphan")
  }

  test("replay of an already-committed batch is a no-op, not a snapshot corruption") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_replay").toString
    val b0 = Seq(("flv://m/g/t", "a", Seq("a", "1"), false))
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(b0, 0)
    val b1 = Seq(("flv://m/g/t", "a", Seq("a", "2"), false),
        ("flv://m/g/t", "b", Seq("b", "1"), false))
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(b1, 1)
    val committed = ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet
    assert(committed === Set(Seq("a", "2"), Seq("b", "1")))
    // driver died after batch 1's manifest swap but before the streaming
    // checkpoint recorded it: foreachBatch replays batchId 1 — the sink
    // must detect the committed epoch and leave the snapshot untouched
    // (re-merging would overwrite epoch_1 while reading from inside it)
    ReplicaSink.upsertBatch(dir)(b1, 1)
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === committed)
  }

  test("replica time travel: retained versions read back exactly; horizon returns None") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_tt").toString
    def batch(rows: (String, Seq[String], Boolean)*) = rows
      .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), false)), 0)
    ReplicaSink.upsertBatch(dir)(batch(("b", Seq("b", "1"), false)), 1)
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "2"), false),
      ("b", Seq("b", "1"), true)), 2)
    // current = v3 (after batch 2); v2 = state after batch 1
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === Set(Seq("a", "2")))
    val v2 = ReplicaSink.readReplicaImagesAt(spark, dir, 2L)
    assert(v2.isDefined, "version 2 must be inside the retention window")
    assert(v2.get.as[Seq[String]].collect().toSet ===
      Set(Seq("a", "1"), Seq("b", "1")))
    // a version that never existed is not readable
    assert(ReplicaSink.readReplicaImagesAt(spark, dir, 99L).isEmpty)
    // drive past the horizon: after v4 and v5 commit (Retain=2 keeps
    // v3..v5), v1 and v2 must age out — the archive is pruned AND gc may
    // reclaim their data — while v3 stays exactly readable
    ReplicaSink.upsertBatch(dir)(batch(("c", Seq("c", "1"), false)), 3)
    ReplicaSink.upsertBatch(dir)(batch(("d", Seq("d", "1"), false)), 4)
    assert(ReplicaSink.readReplicaImagesAt(spark, dir, 1L).isEmpty)
    assert(ReplicaSink.readReplicaImagesAt(spark, dir, 2L).isEmpty)
    val v3 = ReplicaSink.readReplicaImagesAt(spark, dir, 3L)
    assert(v3.isDefined, "version 3 must still be retained after v5")
    assert(v3.get.as[Seq[String]].collect().toSet === Set(Seq("a", "2")))
  }

  test("compaction: layout consolidates, content/watermark/time-travel survive, upserts continue") {
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotManifest
    val dir = Files.createTempDirectory("graft_compact").toString
    def batch(rows: (String, Seq[String], Boolean)*) = rows
      .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), false)), 0) // v1
    ReplicaSink.upsertBatch(dir)(batch(("b", Seq("b", "1"), false)), 1) // v2
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "2"), false),
      ("c", Seq("c", "1"), false), ("b", Seq("b", "1"), true)), 2)      // v3
    val before = ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet
    val report = ReplicaSink.compact(spark, dir)                        // v4
    // every current bucket now lives inside the single compaction dir
    val m = SnapshotManifest.read(new java.io.File(dir))
    val bucketEntries = m.entries.filter(_._1.startsWith("bucket="))
    assert(bucketEntries.nonEmpty &&
      bucketEntries.values.forall(_.startsWith("epoch_compact4/")))
    assert(report.map(_.after).toSet === bucketEntries.map {
      case (k, rel) => rel }.toSet)
    // content is byte-for-byte the pre-compaction snapshot
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === before)
    // the replay watermark carried through: replaying batch 2 after the
    // compaction must still be a detected no-op (no version burned)
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "9"), false)), 2)
    assert(SnapshotManifest.read(new java.io.File(dir)).version === 4L)
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === before)
    // time travel to the pre-compaction version still reads (retain=2)
    val v3 = ReplicaSink.readReplicaImagesAt(spark, dir, 3L)
    assert(v3.isDefined, "pre-compaction version must stay readable")
    assert(v3.get.as[Seq[String]].collect().toSet === before)
    // the stream keeps upserting on top of the compacted layout
    ReplicaSink.upsertBatch(dir)(batch(("d", Seq("d", "1"), false),
      ("a", Seq("a", "3"), false)), 3)                                  // v5
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet ===
      Set(Seq("a", "3"), Seq("c", "1"), Seq("d", "1")))
    // once the pre-compaction versions age out of retention, gc reclaims
    // the scattered epochs the compaction superseded
    ReplicaSink.upsertBatch(dir)(batch(("d", Seq("d", "2"), false)), 4) // v6
    assert(ReplicaSink.readReplicaImagesAt(spark, dir, 3L).isEmpty)
    assert(!new java.io.File(s"$dir/epoch_1").exists() &&
      !new java.io.File(s"$dir/epoch_2").exists(),
      "aged-out pre-compaction epochs must be collected")
  }

  test("incremental aggregate update with a batchId is idempotent under replay") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("graft_incragg_replay").toString
    val ev = graft.sources.Tables.events(spark, Sf)
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 2 === 0), batchId = 0L)
    val once = graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq
    // foreachBatch replay after a committed fold: must NOT double-count
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 2 === 0), batchId = 0L)
    assert(graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq === once)
    // the NEXT batch still folds
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 2 === 1), batchId = 1L)
    assert(graft.operators.IncrementalAgg.read(spark, stateDir)
      .agg(sum(col("n"))).collect()(0).getLong(0) === ev.count())
  }

  test("join-MV delta rule: split-batch enriched folds ≡ one join+agg over the full log") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    import graft.operators.IncrementalAgg
    val stateDir = Files.createTempDirectory("graft_joinmv").toString
    val orders = graft.sources.Tables.table(spark, Sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dims = graft.sources.Tables.table(spark, Sf, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(graft.sources.Tables.table(spark, Sf, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    def fold(slice: org.apache.spark.sql.DataFrame, id: Long): Unit =
      IncrementalAgg.updateMv(spark, stateDir,
        slice.join(broadcast(dims), col("o_custkey") === col("c_custkey")),
        IncrementalAgg.RevenueByNationMv, id)
    fold(orders.where(col("o_orderkey") % 3 === 0), 0L)
    fold(orders.where(col("o_orderkey") % 3 === 1), 1L)
    // replay of a folded batch must not double-count
    fold(orders.where(col("o_orderkey") % 3 === 1), 1L)
    fold(orders.where(col("o_orderkey") % 3 === 2), 2L)
    val got = IncrementalAgg.readMv(spark, stateDir,
        IncrementalAgg.RevenueByNationMv)
      .orderBy("n_name").collect().toSeq
    val want = orders
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)"))
          .cast("decimal(38,2)").as("sum_revenue"))
      .orderBy("n_name").collect().toSeq
    assert(got.nonEmpty && got === want)
  }

  test("replica geometry is manifest-recorded: upserts follow the committed bucket count") {
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotManifest
    val dir = Files.createTempDirectory("graft_replica_geom").toString
    // a replica created under a NON-DEFAULT 5-bucket geometry (as if by
    // a binary built with a different ReplicaBuckets)
    SnapshotManifest.commit(new java.io.File(dir),
      SnapshotManifest.State(1L, Map("conf/buckets" -> "5")))
    def batch(rows: (String, Seq[String], Boolean)*) = rows
      .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(batch(
      ("a", Seq("a", "1"), false), ("b", Seq("b", "2"), false)), 0)
    val m = SnapshotManifest.read(new java.io.File(dir))
    assert(m.entries("conf/buckets") === "5",
      "the recorded geometry must survive upserts")
    assert(m.entries.keys.filter(_.startsWith("bucket=")).forall(
      k => k.stripPrefix("bucket=").toInt < 5),
      "rows must hash into the RECORDED bucket space, not the default")
    // update + delete keep merging under the recorded geometry
    ReplicaSink.upsertBatch(dir)(batch(
      ("a", Seq("a", "1b"), false), ("b", null, true)), 1)
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === Set(Seq("a", "1b")))
    // compaction preserves it too
    ReplicaSink.compact(spark, dir)
    assert(SnapshotManifest.read(new java.io.File(dir))
      .entries("conf/buckets") === "5")
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().toSet === Set(Seq("a", "1b")))
  }

  test("counting-algorithm MV: signed deltas cancel exactly — update, group move, delete, revive") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    import graft.operators.IncrementalAgg
    import spark.implicits._
    val stateDir = Files.createTempDirectory("graft_countmv").toString
    def fold(rows: Seq[(String, Long, Double)], id: Long): Unit =
      IncrementalAgg.updateMv(spark, stateDir,
        rows.toDF("n_name", "mult", "price")
          .withColumn("val_2dp", col("price").cast("decimal(18,2)")),
        IncrementalAgg.OrderDeltaByNationMv, id)
    // batch 0: three orders — two in FR, one in DE
    fold(Seq(("FR", 1L, 10.10), ("FR", 1L, 20.20), ("DE", 1L, 5.05)), 0L)
    // batch 1: price update in FR (−old +new), group MOVE DE→FR
    fold(Seq(("FR", -1L, -10.10), ("FR", 1L, 11.11),
      ("DE", -1L, -5.05), ("FR", 1L, 5.05)), 1L)
    // batch 2: delete one FR order, then revive it at a new price
    fold(Seq(("FR", -1L, -20.20)), 2L)
    fold(Seq(("FR", 1L, 7.00)), 3L)
    val got = IncrementalAgg.readMv(spark, stateDir,
        IncrementalAgg.OrderDeltaByNationMv)
      .orderBy("n_name")
      .select(col("n_name"), col("n_orders"),
        col("sum_revenue").cast("string").as("rev"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // DE netted to an empty group (0, 0.00); FR holds the three live
    // orders at exactly 11.11 + 5.05 + 7.00
    assert(got === Seq(("DE", 0L, "0.00"), ("FR", 3L, "23.16")))
  }

  test("retention knob: retain=1 ages versions out; retain=3 keeps them; vacuum ages populated") {
    import spark.implicits._
    import java.nio.file.Files
    import graft.operators.SnapshotManifest
    def batch(rows: (String, Seq[String], Boolean)*) = rows
      .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
      .toDF("uri", "key", "image", "deleted")
    def drive(retain: Int): String = {
      val dir = Files.createTempDirectory(s"graft_retain$retain").toString
      SnapshotManifest.setRetention(new java.io.File(dir), retain) // -> v1
      ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), false)), 0) // v2
      ReplicaSink.upsertBatch(dir)(batch(("b", Seq("b", "1"), false)), 1) // v3
      ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "2"), false)), 2) // v4
      dir
    }
    // the configured policy survives every commit
    val d1 = drive(1)
    assert(SnapshotManifest.read(new java.io.File(d1)).retain === 1)
    // retain=1: only v3 stays readable behind the committed v4
    assert(ReplicaSink.readReplicaImagesAt(spark, d1, 2L).isEmpty)
    assert(ReplicaSink.readReplicaImagesAt(spark, d1, 3L).isDefined)
    val d3 = drive(3)
    // retain=3: v2 still readable with identical content
    val v2 = ReplicaSink.readReplicaImagesAt(spark, d3, 2L)
    assert(v2.isDefined)
    assert(v2.get.as[Seq[String]].collect().toSet === Set(Seq("a", "1")))
    // vacuum dry-run: ages populated, nothing deleted by the report
    val rep = SnapshotManifest.vacuumReport(new java.io.File(d1), "epoch_")
    assert(rep.nonEmpty && rep.forall(_.ageMs >= 0L))
    val before = ReplicaSink.readReplicaImages(spark, d1)
      .as[Seq[String]].collect().toSet
    assert(before === Set(Seq("a", "2"), Seq("b", "1")))
  }

  test("pure-delete batch: replay detected via lastBatch watermark, no version burned") {
    import spark.implicits._
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_puredel").toString
    def batch(rows: (String, Seq[String], Boolean)*) = rows
      .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
      .toDF("uri", "key", "image", "deleted")
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), false)), 0)
    // batch 1 deletes the bucket's only key: its epoch dir has no
    // surviving bucket files, so no epoch entry lands in the manifest —
    // the replay guard must still see the batch as committed
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), true)), 1)
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().isEmpty)
    val root = new java.io.File(dir)
    val v = graft.operators.SnapshotManifest.read(root).version
    ReplicaSink.upsertBatch(dir)(batch(("a", Seq("a", "1"), true)), 1)
    assert(graft.operators.SnapshotManifest.read(root).version === v,
      "replaying a committed pure-delete batch must not burn a manifest version")
    assert(ReplicaSink.readReplicaImages(spark, dir)
      .as[Seq[String]].collect().isEmpty)
  }

  test("manual incremental-agg update carries the stream-recorded lastBatch forward") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("graft_incragg_manual").toString
    val ev = graft.sources.Tables.events(spark, Sf)
    val b0 = ev.where(col("event_id") % 3 === 0)
    graft.operators.IncrementalAgg.update(spark, stateDir, b0, batchId = 0L)
    // a manual (batchId-less) fold — e.g. an operator backfill — between
    // stream batches must not erase the replay watermark
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 3 === 1))
    val after = graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq
    // checkpoint replay of batch 0 must STILL be a detected no-op
    graft.operators.IncrementalAgg.update(spark, stateDir, b0, batchId = 0L)
    assert(graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq === after)
  }

  test("bucketed MV state (many groups) ≡ single-file state; replay guard holds") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    import graft.operators.IncrementalAgg
    val ev = graft.sources.Tables.events(spark, Sf)
    val single = Files.createTempDirectory("graft_incragg_one").toString
    val bucketed = Files.createTempDirectory("graft_incragg_bkt").toString
    // oneFileGroups = 1 forces the hash-bucketed multi-file layout
    IncrementalAgg.update(spark, single, ev.where(col("event_id") % 2 === 0),
      batchId = 0L)
    IncrementalAgg.update(spark, bucketed, ev.where(col("event_id") % 2 === 0),
      batchId = 0L, oneFileGroups = 1L)
    IncrementalAgg.update(spark, single, ev.where(col("event_id") % 2 === 1),
      batchId = 1L)
    IncrementalAgg.update(spark, bucketed, ev.where(col("event_id") % 2 === 1),
      batchId = 1L, oneFileGroups = 1L)
    def state(dir: String) =
      IncrementalAgg.read(spark, dir).orderBy("event_type").collect().toSeq
    assert(state(bucketed) === state(single),
      "bucket-dispatched state must read back identically to the single file")
    // the bucketed snapshot really is multi-dir
    val root = new java.io.File(bucketed)
    val cur = graft.operators.SnapshotManifest.read(root).entries("cur")
    val bucketDirs = Option(new java.io.File(root, cur).listFiles())
      .getOrElse(Array.empty).filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.length > 1, "expected hash-bucketed state dirs")
    // replay guard unchanged under the bucketed layout
    val before = state(bucketed)
    IncrementalAgg.update(spark, bucketed, ev.where(col("event_id") % 2 === 1),
      batchId = 1L, oneFileGroups = 1L)
    assert(state(bucketed) === before)
  }

  test("incremental aggregate state: crash between snapshot write and swap keeps old state") {
    import org.apache.spark.sql.functions._
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("graft_incragg_crash").toString
    val ev = graft.sources.Tables.events(spark, Sf)
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 2 === 0))
    val before = graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq
    // crashed second update: snapshot dir written, pointer never swapped
    graft.operators.IncrementalAgg
      .partials(ev.where(col("event_id") % 2 === 1))
      .coalesce(1).write.mode("overwrite").parquet(s"$stateDir/v2")
    assert(graft.operators.IncrementalAgg.read(spark, stateDir)
      .orderBy("event_type").collect().toSeq === before)
    // the replayed update commits v2 content properly and equals one
    // aggregation of the whole log
    graft.operators.IncrementalAgg.update(spark, stateDir,
      ev.where(col("event_id") % 2 === 1))
    val after = graft.operators.IncrementalAgg.read(spark, stateDir)
    val oneShot = graft.operators.IncrementalAgg.partials(ev)
      .select(col("event_type"), col("n"), col("sum_users"),
        col("sum_value").cast("double").as("sum_value"),
        col("min_value"), col("max_value"))
    assert(after.except(oneShot).isEmpty && oneShot.except(after).isEmpty)
  }

  test("conf/attrs DDL round-trips types whose SQL contains commas") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("label", IntegerType),
      StructField("price", DecimalType(10, 2)),
      StructField("meta", StructType(Seq(
        StructField("a", LongType), StructField("b", StringType))))))
    val ddl = graft.operators.SnapshotManifest.renderAttrDdl(
      schema, Seq("label", "price", "meta"))
    val parsed = graft.operators.SnapshotManifest.parseAttrDdl(Some(ddl))
    assert(parsed === Seq(
      ("label", "INT"), ("price", "DECIMAL(10,2)"),
      ("meta", "STRUCT<a: BIGINT, b: STRING>")))
    assert(graft.operators.SnapshotManifest.parseAttrDdl(None) === Nil)
    assertThrows[IllegalArgumentException](
      graft.operators.SnapshotManifest.parseAttrDdl(Some("nameonly")))
  }
}
