package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AnnIndex, SnapshotManifest}

/** Train/serve split + incremental maintenance of the IVFADC index
  * (round-7 items 2 and 3): the serving plan must be training-free and
  * cell-pruned, served results must equal the inline-trained query, and
  * per-batch index maintenance must be exactly-once and equivalent to a
  * one-shot encode of the same rows. */
class AnnIndexSpec extends AnyFunSuite {
  import SparkTest._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(tag).toFile
    graft.Fs.deleteRecursively(d)
    d.toString
  }

  private def queriesOf(emb: org.apache.spark.sql.DataFrame) =
    emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("e").as("qe"))

  test("serving plan is training-free and prunes inverted-list partitions dynamically") {
    val dir = AnnIndex.trainedIndexDir(spark, Sf)
    val emb = AnnIndex.embeddings(spark, Sf)
    val served = AnnIndex.serve(spark, dir, queriesOf(emb), emb)
    val optimized = served.queryExecution.optimizedPlan.toString
    // the k-means update aggregate's decimal-exact signature: present in
    // every training plan, must be ABSENT from the serving plan
    assert(!optimized.toLowerCase.contains("decimal(38,18)"),
      "serving plan must not contain k-means training aggregates")
    // the inverted-list scan is pruned to the ROUTED cells at file level
    // (dynamic partition pruning from the broadcast routing join) — the
    // sublinear 100 TB serving read
    val executed = served.queryExecution.executedPlan.toString
    assert(executed.contains("dynamicpruning"),
      "codes scan must carry a dynamic partition-pruning filter on cell")
  }

  test("served results equal the inline-trained ann_ivf_pq") {
    val inline = graft.queries.CurationQueries.queries("ann_ivf_pq")(spark, Sf)
      .collect().toSeq
    val dir = AnnIndex.trainedIndexDir(spark, Sf)
    val emb = AnnIndex.embeddings(spark, Sf)
    val served = AnnIndex.serve(spark, dir, queriesOf(emb), emb)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(served === inline)
  }

  test("property: serving is stateless per query — random query splits union to the one-shot answer") {
    // the invariant streamServeAnn/streamServeHybrid's epoch union rests
    // on: route + ADC + rerank read only the committed artifact and the
    // query's own row, so ANY partition of the query set answers
    // identically (a query vector is one self-contained row)
    val rnd = new scala.util.Random(13)
    val dir = AnnIndex.trainedIndexDir(spark, Sf)
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val qs = queriesOf(emb)
    val oneShot = AnnIndex.serve(spark, dir, qs, emb)
      .orderBy("q_id", "rnk").collect().toSeq
    val qids = qs.select("q_id").collect().map(_.getLong(0)).toSeq
    for (round <- 0 until 2) {
      val groups = qids.groupBy(_ => rnd.nextInt(1 + rnd.nextInt(3)))
        .values.toSeq.filter(_.nonEmpty)
      val unioned = groups.flatMap { g =>
        AnnIndex.serve(spark, dir,
            qs.where(col("q_id").isin(g: _*)), emb)
          .collect()
      }.sortBy(r => (r.getLong(0), r.getInt(1)))
      assert(unioned === oneShot.sortBy(r => (r.getLong(0), r.getInt(1))),
        s"round $round: splits=${groups.map(_.size)}")
    }
    emb.unpersist()
  }

  test("incremental maintenance ≡ one-shot encode; replays are detected no-ops") {
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val base = emb.where(col("vec_id") % 10 < 8)
    val rest = graft.sources.Tables.table(spark, Sf, "embeddings")
      .where(col("vec_id") % 10 >= 8)

    // index A: base + the rest folded in three micro-batch appends
    val dirA = freshDir("graft_ann_inc")
    AnnIndex.train(base, dirA)
    Seq(0, 1, 2).foreach { b =>
      AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 3 === b), b.toLong)
    }
    // index B: base + the rest in ONE append (the batch-rebuilt twin
    // under the same frozen codebooks)
    val dirB = freshDir("graft_ann_oneshot")
    AnnIndex.train(base, dirB)
    AnnIndex.appendBatch(dirB)(rest, 0L)

    val q = queriesOf(emb)
    def result(dir: String) =
      AnnIndex.serve(spark, dir, q, emb).orderBy("q_id", "rnk").collect().toSeq
    assert(result(dirA) === result(dirB),
      "incrementally-maintained index must serve identically to the one-shot encode")

    // replay of a committed append: watermark-detected no-op, no version burn
    val vA = SnapshotManifest.read(new java.io.File(dirA)).version
    AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 3 === 2), 2L)
    assert(SnapshotManifest.read(new java.io.File(dirA)).version === vA)
    assert(result(dirA) === result(dirB))

    // the serving plan's relation count is CONSTANT in segment count:
    // the codes view is ONE multi-path scan, not a per-segment union
    // chain — plan-analysis cost must not grow as the stream ages
    def relations(dir: String): Int = {
      val plan = AnnIndex.serve(spark, dir, q, emb)
        .queryExecution.optimizedPlan.toString
      plan.linesIterator.count(_.contains("Relation"))
    }
    assert(relations(dirA) === relations(dirB),
      "4-segment index must plan the same relation count as 2-segment")

    // compact: all code segments fold into one; serving output unchanged
    val before = result(dirA)
    AnnIndex.compact(spark, dirA)
    val mC = SnapshotManifest.read(new java.io.File(dirA))
    assert(mC.entries.keys.count(_.startsWith("codes/")) === 1,
      "compact must collapse the code segments to one")
    assert(mC.entries.get("lastBatch").map(_.toLong) === Some(2L),
      "compact must carry the replay watermark through")
    assert(result(dirA) === before,
      "compaction must not change serving output")
    // appends keep working on top of the merged segment
    AnnIndex.appendBatch(dirA)(rest.limit(0), 3L)
    assert(result(dirA) === before)
    emb.unpersist(blocking = false)
    ()
  }

  test("maybeRebuild policy: additive mass partials, corpus untouched " +
      "while declining, compact folds abytes, fired rebuild ≡ from-scratch " +
      "train and resets the ratio") {
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val base = emb.where(col("vec_id") % 10 < 2)
    val rest = graft.sources.Tables.table(spark, Sf, "embeddings")
      .where(col("vec_id") % 10 >= 2)
    val dir = freshDir("graft_ann_policy")
    AnnIndex.train(base, dir)
    def m() = SnapshotManifest.read(new java.io.File(dir))
    val baseBytes = m().entries("bytesBase").toLong
    assert(baseBytes > 0L)
    Seq(0, 1, 2).foreach { b =>
      AnnIndex.appendBatch(dir)(rest.where(col("vec_id") % 3 === b), b.toLong)
    }
    def abytes() = m().entries.collect {
      case (k, v) if k.startsWith("abytes/") => v.toLong }.sum
    // the partials are the appended segments' real on-disk sizes
    val walked = m().entries.collect {
      case (k, rel) if k.startsWith("codes/") && k != "codes/base" => rel }
      .map(rel => graft.operators.SegmentStore.dirBytes(
        new java.io.File(dir, rel))).sum
    assert(abytes() === walked && abytes() > 0L)
    // declining evaluations never read the corpus (it is by-name)
    var corpusReads = 0
    def corpus = { corpusReads += 1; emb }
    assert(!AnnIndex.maybeRebuild(spark, dir, corpus, ratio = 1e9))
    assert(corpusReads === 0)
    // compact FOLDS the partials (one carried entry, sum unchanged —
    // the compacted dir's own size would mix base-encoded rows in)
    val sumBefore = abytes()
    AnnIndex.compact(spark, dir)
    assert(m().entries.keys.count(_.startsWith("abytes/")) === 1)
    assert(abytes() === sumBefore)
    assert(m().entries("bytesBase").toLong === baseBytes,
      "a compact never changes the trained-mass denominator")
    // past the ratio the rebuild fires, retrains on the live corpus,
    // and lands exactly the from-scratch index of that corpus
    assert(AnnIndex.maybeRebuild(spark, dir, corpus, ratio = 0.0))
    assert(corpusReads === 1)
    val m1 = m()
    assert(m1.entries.keys.count(_.startsWith("abytes/")) === 0,
      "a fired rebuild resets the appended-mass partials")
    assert(m1.entries("bytesBase").toLong > 0L)
    val fresh = freshDir("graft_ann_policy_fresh")
    AnnIndex.train(emb, fresh)
    val q = queriesOf(emb)
    assert(AnnIndex.serve(spark, dir, q, emb)
        .orderBy("q_id", "rnk").collect().toSeq ===
      AnnIndex.serve(spark, fresh, q, emb)
        .orderBy("q_id", "rnk").collect().toSeq)
    // and the reset ratio declines again until new mass accumulates
    assert(!AnnIndex.maybeRebuild(spark, dir, corpus, ratio = 0.0))
    emb.unpersist(blocking = false)
    ()
  }

  test("CDC maintenance: update = tombstone + re-encode, delete = tombstone; compaction resolves") {
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val base = emb.where(col("vec_id") % 10 < 8)
    val raw = graft.sources.Tables.table(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val adds = raw.where(col("vec_id") % 10 >= 8)
    val upd = raw.where(col("vec_id") % 9 === 0 && col("vec_id") % 13 =!= 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => -x).as("embedding"))
    val del = raw.where(col("vec_id") % 13 === 0)
    def tagged(df: org.apache.spark.sql.DataFrame, d: Boolean) =
      df.withColumn("deleted", lit(d))

    // A: incremental — two add batches, an update batch, a delete batch,
    // compactions interleaved (tombstones must survive the first merge
    // untouched and resolve in the second)
    val dirA = freshDir("graft_ann_cdc_inc")
    AnnIndex.train(base, dirA)
    AnnIndex.applyCdcBatch(dirA)(tagged(adds.where(col("vec_id") % 2 === 0), d = false), 0L)
    AnnIndex.applyCdcBatch(dirA)(tagged(adds.where(col("vec_id") % 2 === 1), d = false), 1L)
    AnnIndex.compact(spark, dirA)
    AnnIndex.applyCdcBatch(dirA)(tagged(upd, d = false), 2L)
    AnnIndex.applyCdcBatch(dirA)(tagged(del, d = true), 3L)
    AnnIndex.compact(spark, dirA)

    // B: one-shot apply of every touched vector's FINAL state
    val dirB = freshDir("graft_ann_cdc_oneshot")
    AnnIndex.train(base, dirB)
    val finals = tagged(adds
        .where(col("vec_id") % 9 =!= 0 && col("vec_id") % 13 =!= 0), d = false)
      .unionByName(tagged(upd, d = false))
      .unionByName(tagged(del, d = true))
    AnnIndex.applyCdcBatch(dirB)(finals, 0L)

    // serve both over the POST-APPLY corpus
    val postEmb = emb.where(col("vec_id") % 13 =!= 0)
      .select(col("vec_id"),
        when(col("vec_id") % 9 === 0, transform(col("e"), x => -x))
          .otherwise(col("e")).as("e"))
    val q = queriesOf(emb)
    def result(dir: String) =
      AnnIndex.serve(spark, dir, q, postEmb).orderBy("q_id", "rnk").collect().toSeq
    val a = result(dirA)
    assert(a.nonEmpty && a === result(dirB),
      "interleaved CDC batches must serve identically to a one-shot apply of final states")
    // deleted vectors never surface
    assert(!a.exists(r => r.getLong(2) % 13 == 0),
      "a tombstoned vector must never appear in results")
    emb.unpersist(blocking = false)
    ()
  }

  test("CDC apply: an EMPTY micro-batch advances only the watermark — no tombstone segment") {
    // round-11 advice (medium): the old length>0 part-file witness never
    // fired — a zero-row coalesce(1) parquet write still leaves one
    // schema-only part- file, so every idle batch committed a zero-row
    // tombstone segment (unbounded listing growth on an idle drain and
    // spurious maybeCompact rewrites). The footer-rowcount witness
    // (SegmentStore.stagedHasRows) must keep the promise the scaladoc
    // makes: empty batches advance only the watermark.
    val emb = AnnIndex.embeddings(spark, Sf)
    val base = emb.where(col("vec_id") % 10 < 8)
    val dir = freshDir("graft_ann_cdc_idle")
    AnnIndex.train(base, dir)
    val m0 = SnapshotManifest.read(new java.io.File(dir))
    val segs0 = m0.entries.keys.count(k =>
      k.startsWith("codes/") || k.startsWith("tombs/"))
    val idle = graft.sources.Tables.table(spark, Sf, "embeddings")
      .where(lit(false))
      .select(col("vec_id"), col("embedding"), lit(true).as("deleted"))
    AnnIndex.applyCdcBatch(dir)(idle, 0L)
    val m1 = SnapshotManifest.read(new java.io.File(dir))
    assert(m1.entries.get("lastBatch").map(_.toLong) === Some(0L),
      "an empty batch must still advance the replay watermark")
    assert(m1.entries.keys.count(k =>
      k.startsWith("codes/") || k.startsWith("tombs/")) === segs0,
      "an empty batch must commit NO code or tombstone segment")
    assert(!m1.entries.keys.exists(_.startsWith("abytes/")),
      "an empty batch must add no drift mass")
    // and the replay of the now-committed empty batch is still a no-op
    val v1 = m1.version
    AnnIndex.applyCdcBatch(dir)(idle, 0L)
    assert(SnapshotManifest.read(new java.io.File(dir)).version === v1)
  }

  test("rebuild rotation: pointer swap, old generation queryable, crash leaves old intact") {
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val dir = freshDir("graft_ann_rebuild")
    AnnIndex.train(emb, dir)
    val q = queriesOf(emb)
    def serveNow() =
      AnnIndex.serve(spark, dir, q, emb).orderBy("q_id", "rnk").collect().toSeq
    val before = serveNow()
    val v1 = SnapshotManifest.read(new java.io.File(dir)).version

    // crash mid-rebuild: a new generation's dirs exist but the pointer
    // never swapped — the committed index must be untouched
    new java.io.File(dir, "v99").mkdirs()
    new java.io.File(dir, "codes/seg=base99").mkdirs()
    assert(serveNow() === before, "orphan generation dirs must be invisible")

    // the rotation: retrain on the SAME corpus (deterministic training
    // → identical artifacts) under a new generation + pointer swap
    AnnIndex.rebuild(spark, dir, emb)
    val m2 = SnapshotManifest.read(new java.io.File(dir))
    assert(m2.version === v1 + 1)
    assert(m2.entries("coarse").startsWith(s"v${v1 + 1}/"),
      "rebuild must publish a fresh generation")
    assert(serveNow() === before,
      "rebuild on unchanged data must serve identically")
    // the crash orphans were collected by the rebuild's gc
    assert(!new java.io.File(dir, "v99").exists() &&
      !new java.io.File(dir, "codes/seg=base99").exists())
    // the prior generation stays queryable within the retention window
    val old = AnnIndex.serveAt(spark, dir, v1, q, emb)
    assert(old.isDefined &&
      old.get.orderBy("q_id", "rnk").collect().toSeq === before)
    emb.unpersist(blocking = false)
    ()
  }

  test("maintenance continues across a rebuild: appends land on the fresh codebooks") {
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val base = emb.where(col("vec_id") % 10 < 8)
    val raw = graft.sources.Tables.table(spark, Sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val rest = raw.where(col("vec_id") % 10 >= 8)

    // A: train on base, append half the rest, REBUILD on the corpus so
    // far, then the ingest stream keeps appending — now encoded against
    // the rebuilt codebooks (watermark carried through the rotation)
    val dirA = freshDir("graft_ann_rebuild_cont")
    AnnIndex.train(base, dirA)
    AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 2 === 0), 0L)
    val corpusSoFar = emb.where(col("vec_id") % 10 < 8 ||
      (col("vec_id") % 10 >= 8 && col("vec_id") % 2 === 0))
    AnnIndex.rebuild(spark, dirA, corpusSoFar)
    AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 2 === 1), 1L)
    // replay of the pre-rebuild batch: still a watermark-detected no-op
    val vA = SnapshotManifest.read(new java.io.File(dirA)).version
    AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 2 === 0), 0L)
    assert(SnapshotManifest.read(new java.io.File(dirA)).version === vA,
      "a pre-rebuild batchId must stay replay-protected after the rotation")

    // B: the batch-built twin — train on the same rebuild corpus, then
    // one append of the remaining rows against those codebooks
    val dirB = freshDir("graft_ann_rebuild_cont_b")
    AnnIndex.train(corpusSoFar, dirB)
    AnnIndex.appendBatch(dirB)(rest.where(col("vec_id") % 2 === 1), 0L)

    val q = queriesOf(emb)
    def result(dir: String) =
      AnnIndex.serve(spark, dir, q, emb).orderBy("q_id", "rnk").collect().toSeq
    assert(result(dirA).nonEmpty && result(dirA) === result(dirB),
      "post-rebuild appends must encode against the rebuilt codebooks, " +
        "identically to a fresh train+append of the same state")
    emb.unpersist(blocking = false)
    ()
  }

  test("attribute-filtered serving: full top-k of allowed vectors, attrs flow through maintenance") {
    val raw = graft.sources.Tables.table(spark, Sf, "embeddings")
    val base = raw.where(col("vec_id") % 10 < 8)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"),
        col("label"))
    val dir = freshDir("graft_ann_attr")
    AnnIndex.train(base, dir, attrs = Seq("label"))
    // maintenance batches carry the attribute: one append, one CDC batch
    val rest = raw.where(col("vec_id") % 10 >= 8)
      .select(col("vec_id"), col("embedding"), col("label"))
    AnnIndex.appendBatch(dir)(rest.where(col("vec_id") % 2 === 0), 0L)
    AnnIndex.applyCdcBatch(dir)(rest.where(col("vec_id") % 2 === 1)
      .withColumn("deleted", lit(false)), 1L)
    AnnIndex.compact(spark, dir)
    val emb = AnnIndex.embeddings(spark, Sf)
    val q = queriesOf(emb)
    // exhaustive parameters collapse the approximation: route to ALL
    // cells, shortlist the whole corpus — the filtered serve must then
    // equal the EXACT brute-force top-k over the allowed subset, which
    // pins both the filter's evaluation point (pre-shortlist) and that
    // a full k of allowed vectors comes back
    val served = AnnIndex.serve(spark, dir, q, emb,
        nprobe = AnnIndex.CoarseK, shortlist = 1000000, topK = 5,
        filter = Some(col("label") % 3 === 0))
      .orderBy("q_id", "rnk").collect().toSeq
    val allowed = raw.where(col("label") % 3 === 0)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val brute = graft.operators.Similarity.bruteForceTopK(
        q.select(col("q_id"), col("qe").as("q_emb")), allowed, 5)
      .orderBy("q_id", "rnk").collect().toSeq
    assert(served.nonEmpty && served === brute,
      "exhaustive filtered serve must equal exact filtered brute force")
    // a plain comparison predicate reaches the parquet reader itself
    val plan = AnnIndex.serve(spark, dir, q, emb,
        filter = Some(col("label") <= 4))
      .queryExecution.executedPlan.toString
    assert(plan.contains("LessThanOrEqual(label,4)"),
      "comparison attr predicates must appear in the codes scan's PushedFilters")
  }

  test("non-default geometry: manifest-recorded conf drives encode, serve, and compact") {
    // 3 cells × 4 subspaces of 8 dims × 3 codes — every knob off its
    // default, exercised through the same maintenance-equivalence
    // property: the artifact is self-describing, so appendBatch/serve
    // never see the compile-time defaults
    val conf = AnnIndex.Conf(coarseK = 3, pqM = 4, pqK = 3, subDim = 8)
    val emb = AnnIndex.embeddings(spark, Sf).cache()
    val base = emb.where(col("vec_id") % 10 < 8)
    val rest = graft.sources.Tables.table(spark, Sf, "embeddings")
      .where(col("vec_id") % 10 >= 8)
    val dirA = freshDir("graft_ann_conf_inc")
    AnnIndex.train(base, dirA, conf)
    Seq(0, 1).foreach { b =>
      AnnIndex.appendBatch(dirA)(rest.where(col("vec_id") % 2 === b), b.toLong)
    }
    AnnIndex.compact(spark, dirA)
    val dirB = freshDir("graft_ann_conf_oneshot")
    AnnIndex.train(base, dirB, conf)
    AnnIndex.appendBatch(dirB)(rest, 0L)
    val q = queriesOf(emb)
    def result(dir: String) =
      AnnIndex.serve(spark, dir, q, emb).orderBy("q_id", "rnk").collect().toSeq
    assert(result(dirA).nonEmpty && result(dirA) === result(dirB),
      "non-default geometry must satisfy the same maintenance equivalence")
    // the codebook count actually followed the conf
    val m = graft.operators.SnapshotManifest.read(new java.io.File(dirA))
    assert(m.entries.contains("pq3") && !m.entries.contains("pq4"))
    assert(m.entries.get("conf/coarseK") === Some("3"))
    emb.unpersist(blocking = false)
    ()
  }

  test("long drain: threshold merges fire mid-stream, segment listing stays bounded") {
    // streamAnnIndex drains 8 single-file micro-batches through
    // maybeCompact(maxSegments=3) on top of the trained base segment:
    // counts walk 2,3,4→merge→1,2,3,4→merge→1,2,3 — two threshold
    // merges under live ingest, final listing 3 (one compact epoch +
    // the two appends since). Merge invisibility (answers unchanged)
    // is covered by the driver oracle and the one-shot-encode pin;
    // this pins that the policy OBSERVABLY fired mid-drain.
    val out = graft.streaming.CdcStream.streamAnnIndex(spark, Sf)
    assert(out.count() > 0)
    val stateDir = graft.Fs.scratch("/tmp/graft_ann_stream",
      Sf.replaceAll("[^A-Za-z0-9]", "_"))
    val m = SnapshotManifest.read(stateDir)
    val segs = m.entries.filter(_._1.startsWith("codes/")).toSeq.sorted
    assert(segs.size === 3, s"post-drain segment listing: $segs")
    assert(segs.exists(_._2.contains("compact")),
      s"a threshold merge must have fired mid-drain: $segs")
    assert(m.entries("lastBatch") === "7", "8 micro-batches must drain")
  }
}
