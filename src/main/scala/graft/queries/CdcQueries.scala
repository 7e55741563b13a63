package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Cdc
import graft.operators._
import graft.sources.CdcGen

/** SURVEY.md §2 reference-surface queries (T1-T9, S5, D6/D7, D10) with
  * DuckDB oracles. Inputs are the deterministic generated changelogs
  * (CdcGen) whose derivation rules are pure key arithmetic — so each
  * oracle states the expected output directly over the base tables. */
object CdcQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB-side reconstruction of CdcGen.multiDbEvents, shared by the
    * oracles below (kept in one place so Spark and SQL can't drift). */
  private val MdeCte =
    """WITH mde AS (
       SELECT event_id AS sequence,
         CASE WHEN event_type='error' THEN NULL
              ELSE 'app_' || (user_id % 4) END AS db,
         CASE WHEN event_type='error' THEN NULL ELSE event_type END AS tbl,
         'binlog.00000' || (1 + event_id % 3) AS file,
         event_id AS "offset",
         CASE WHEN event_type='error' THEN 'Query' ELSE 'Add' END AS op,
         CASE WHEN event_type<>'error' THEN NULL
              WHEN event_id % 10 = 0 THEN 'BEGIN'
              WHEN event_id % 10 = 5 THEN 'CREATE DATABASE app_x'
              ELSE 'UPDATE noop SET v = ' || event_id END AS query
       FROM events)"""

  private val CdfSchema = "c_custkey BIGINT, cents BIGINT"

  /** Shared two-version replica fixture of the change-feed queries:
    * v1 = customer balances in integer cents, bucketed custkey%4;
    * v2 = one upsert epoch updating bucket 1 (+500 everywhere, plus
    * shadow-key inserts custkey+100000 carrying cents+1000 for
    * custkey%16==1) and deleting custkey%8==7 from bucket 3. Fresh
    * root per (pid, tag) so the queries sharing it stay independent. */
  private def cdfFixture(s: SparkSession, dir: String, tag: String): String = {
    val root = graft.Fs.scratch(s"/tmp/$tag")
    graft.Fs.deleteRecursively(root)
    root.mkdirs()
    val nb = 4
    val cust = graft.sources.Tables.table(s, dir, "customer")
      .select(col("c_custkey"),
        round(col("c_acctbal") * lit(100)).cast("bigint").as("cents"),
        pmod(col("c_custkey"), lit(nb)).cast("int").as("bucket"))
    cust.repartition(nb, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(new java.io.File(root, "snap_base").toString)
    SnapshotManifest.commit(root, SnapshotManifest.State(1L,
      (0 until nb).map(b => s"bucket=$b" -> s"snap_base/bucket=$b").toMap
        + ("conf/buckets" -> nb.toString)))
    // the upsert epoch: bucket 1 = updates + inserts, bucket 3 = deletes
    val m1 = SnapshotManifest.read(root)
    def bucketDf(b: Int) = s.read.schema(CdfSchema)
      .parquet(new java.io.File(root, m1.entries(s"bucket=$b")).toString)
    val b1 = bucketDf(1)
      .withColumn("cents", col("cents") + lit(500L))
      .unionByName(bucketDf(1).where(col("c_custkey") % 16 === 1)
        .select((col("c_custkey") + 100000L).as("c_custkey"),
          (col("cents") + 1000L).as("cents")))
    val b3 = bucketDf(3).where(col("c_custkey") % 8 =!= 7)
    val epoch = new java.io.File(root, "epoch_cdc")
    b1.withColumn("bucket", lit(1))
      .unionByName(b3.withColumn("bucket", lit(3)))
      .repartition(2, col("bucket"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(epoch.toString)
    SnapshotManifest.commit(root, SnapshotManifest.State(2L,
      m1.entries ++ Map("bucket=1" -> "epoch_cdc/bucket=1",
        "bucket=3" -> "epoch_cdc/bucket=3")))
    root.toString
  }

  val queries: Map[String, Q] = Map(
    // D10 — changelog apply, scale path (latest-image per key).
    "cdc_apply_snapshot" -> ((s, dir) =>
      ChangelogApply.customerSnapshot(s, dir).orderBy("c_custkey")),

    // K2' — apply sink to a PARTITIONED parquet replica; read-back filter
    // prunes to the one nation directory (SinkSpec pins PartitionFilters).
    "cdc_sink_partitioned" -> ((s, dir) =>
      ReplicaSink.readNation(s, dir, 7).orderBy("c_custkey")),

    // Dynamic partition pruning over the partitioned replica: the filter
    // lives on the DIM side (nation.n_regionkey), yet the fact scan must
    // only read the surviving nations' partition directories — Spark
    // inserts a dynamicpruning subquery into PartitionFilters, reusing
    // the join's broadcast. At 100 TB this is runtime partition pruning:
    // the scan set is decided by the dim filter's result, not statically.
    // SinkSpec pins the dynamicpruning expression in the executed plan.
    "q_dpp_join" -> ((s, dir) => {
      val fact = s.read.parquet(ReplicaSink.partitionedReplica(s, dir))
      val dim = graft.sources.Tables.table(s, dir, "nation")
        .where(col("n_regionkey") === 1)
      fact.join(dim, col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
            .as("total_bal"))
        .orderBy("n_name")
    }),

    // D10 — changelog apply, faithful full-image multiset path.
    "cdc_apply_full_image" -> ((s, dir) => {
      val events = CdcGen.customerEvents(s, dir)
      CdcGen.decodeCustomer(ChangelogApply.fullImageMultiset(events))
        .orderBy("c_custkey")
    }),

    // S1 — changelog scan: the generated customer event log itself,
    // flattened to scalars (decoded first-cell key, image width, op).
    "cdc_changelog_scan" -> ((s, dir) => {
      val ev = CdcGen.customerEvents(s, dir)
      ev.select(col("sequence"), col("op"),
          size(col("columns")).as("n_columns"),
          element_at(element_at(col("rows"), 1).getField("cols"), 1)
            .cast("long").as("row_key"))
        .orderBy("sequence")
    }),

    // §2.5 — JSON wire round-trip: the reference serde-encodes every
    // event to JSON on publish and re-parses on consume
    // (binlog_parser.rs:125, producer.rs:49, mysql_manager.rs:61). Here:
    // struct → to_json → from_json(EventSchema) → apply; the snapshot
    // matching the apply oracle proves the round-trip is lossless.
    "cdc_json_roundtrip" -> ((s, dir) => {
      val ev = CdcGen.customerEvents(s, dir)
      val wire = ev.select(to_json(struct(ev.columns.map(col): _*)).as("json"))
      val parsed = wire
        .select(from_json(col("json"), graft.model.Cdc.EventSchema).as("e"))
        .select("e.*")
      CdcGen.decodeCustomer(ChangelogApply.latestImage(parsed))
        .orderBy("c_custkey")
    }),

    // T1 — producer include-list filter; null-db events pass.
    "cdc_filter_db_producer" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      mde.where(CdcFilters.producerDbFilter(col("db"), Seq("APP_1", "app_2"), Nil))
        .select(col("sequence"), col("db"), col("op"))
        .orderBy("sequence")
    }),

    // T2 — consumer exclude-list filter; null-db events DROPPED.
    "cdc_filter_db_consumer" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      mde.where(CdcFilters.consumerDbFilter(col("db"), Nil, Seq("App_0")))
        .select(col("sequence"), col("db"), col("op"))
        .orderBy("sequence")
    }),

    // T3 — offset dedup after an at-least-once replay of offsets <= 100;
    // the boundary event (resume offset 100 → file binlog.000002, since
    // 1 + 100 % 3 = 2) is dropped too (binlog_parser.rs:57-59).
    "cdc_offset_dedup" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      val replayed = mde.unionByName(mde.where(col("offset") <= 100))
      CdcFilters.offsetDedup(replayed, "binlog.000002", 100L)
        .select(col("sequence"), col("file"), col("offset"))
        .orderBy("sequence")
    }),

    // T4 — BEGIN suppression.
    "cdc_suppress_begin" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      mde.where(CdcFilters.suppressBegin(col("op"), col("query")))
        .select(col("sequence"), col("op"), col("query"))
        .orderBy("sequence")
    }),

    // T5 — DATABASE-DDL suppression on the registry path.
    "cdc_registry_ddl_slice" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      mde.where(col("op") === Cdc.OpQuery && CdcFilters.isRegistryDdl(col("query")))
        .select(col("sequence"), col("query"))
        .orderBy("sequence")
    }),

    // T6 — event-type dispatch: synthetic binlog type codes routed to ops.
    "cdc_route_ops" -> ((s, dir) => {
      val ev = graft.sources.Tables.events(s, dir)
      val code = when(col("event_type") === "error", 2)
        .when(col("event_type") === "click", 30)
        .when(col("event_type") === "purchase", 31)
        .when(col("event_type") === "signup", 32)
        .otherwise(99)
      ev.withColumn("op", CdcProject.routeOp(code))
        .groupBy("op").agg(count(lit(1)).as("n"))
        .orderBy("op")
    }),

    // T7 — enrichment to the outgoing message shape.
    "cdc_project_enrich" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      CdcProject.enrich(mde, "mysql-leader")
        .select(
          col("sequence"), col("uri"),
          col("bn_file.fileName").as("file_name"),
          col("bn_file.offset").as("file_offset"),
          array_join(col("columns"), ",").as("cols_joined"))
        .orderBy("sequence")
    }),

    // T8 — scalable global sequence stamp ordered by (file, offset).
    "cdc_sequence_stamp" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      Sequencer.stampSequence(mde, "pub_seq", Seq(col("file"), col("offset")))
        .select(col("sequence"), col("pub_seq"))
        .orderBy("sequence")
    }),

    // T9 — URI parse back to (db, table).
    "cdc_parse_uri" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      val enriched = CdcProject.enrich(mde, "mysql-leader")
      val (db, table) = CdcProject.parseUri(col("uri"))
      enriched.select(col("sequence"), db.as("parsed_db"), table.as("parsed_table"))
        .orderBy("sequence")
    }),

    // S5 — last-record probe.
    "cdc_last_record" -> ((s, dir) => {
      val mde = CdcGen.multiDbEvents(s, dir)
      Sequencer.lastRecord(mde)
        .select(col("sequence"), col("file"), col("offset"))
    }),

    // D6 — DDL parse + registry fold.
    "cdc_schema_registry" -> ((s, dir) => {
      val reg = SchemaRegistry.fromEvents(CdcGen.ddlEvents(s, dir))
      reg.select(col("db"), col("table").as("tbl"),
          array_join(col("columns"), ",").as("cols"))
        .orderBy("db", "tbl")
    }),

    // Hard-part #3 (SURVEY.md §7): mid-stream schema evolution. Row events
    // interleave with DDL (odd vs even sequence offsets); each resolves
    // its column list against the registry version AS-OF its sequence —
    // an as-of join to the DDL timeline, not a static snapshot lookup.
    "cdc_registry_asof" -> ((s, dir) => {
      import s.implicits._
      val versions = SchemaRegistry.registryVersions(CdcGen.ddlEvents(s, dir))
        .withColumn("k", concat_ws(".", col("db"), col("table")))
        .withColumn("cols_joined", array_join(col("columns"), ","))
        .select("k", "sequence", "cols_joined")
      val nat = s.read.parquet(s"$dir/nation.parquet").select(
        $"n_nationkey".cast("long").as("n"),
        concat(lit("app_"), $"n_regionkey".cast("string")).as("db"),
        concat(lit("t_"), lower($"n_name")).as("tbl"))
      val rowEvents = Seq(1, 3, 7).map { off =>
        nat.select(($"n" * 10 + off).as("sequence"), $"db", $"tbl")
      }.reduce(_ unionByName _)
        .withColumn("k", concat_ws(".", $"db", $"tbl"))
      AsOfJoin.asOf(rowEvents, versions, key = "k",
          leftTime = "sequence", rightTime = "sequence",
          payload = Seq("cols_joined"))
        .select($"sequence", $"db", $"tbl", $"asof_cols_joined".as("asof_cols"))
        .orderBy("sequence")
    }),

    // E2E pet fixture (mysql-send-cmds.sh:12-20): the reference's
    // flagship 9-statement script replayed through the schema-aware apply
    // — the mid-stream ALTER widens live rows so the post-ALTER 6-cell
    // DELETE matches the pre-ALTER 5-cell insert — then decoded typed via
    // registry column names. Mirrors mysql-validate-result.sh:74-78's
    // leader≡follower diff as a DuckDB VALUES golden.
    "cdc_e2e_pet" -> ((s, _) => {
      val st = ChangelogApply.applyWithSchema(CdcGen.typedEvents(s))
      CdcGen.decodePet(st.where(col("tbl") === "pet")).orderBy("name")
    }),

    // Malformed-event guards (mysql_manager.rs:302-335): the typed pet
    // changelog plus PLANTED corrupt events — a column list naming a
    // column the as-of registry does not know (100), a row with more
    // values than its own column list (101), a registry-resolved row
    // (null column list — legal in this engine) with more values than
    // the as-of width (102), a row event on a db-only URI (103), and a
    // row on a table a DROP TABLE just removed (105; the DROP itself at
    // 104 is clean DDL and passes) — classified in one map-side pass;
    // 106 hits a table with NO in-log DDL and must PASS (the fallback
    // contract: ungoverned tables are not guarded). Output: the
    // quarantine side-output.
    "cdc_guard_invalid" -> ((s, _) => {
      import graft.model.{CdcEvent, CdcRowImages}
      import graft.model.Value._
      import s.implicits._
      val host = "flv://mysql-leader"
      val petCols6 = Seq("name", "owner", "species", "sex", "birth",
        "last_vaccine")
      val bogusCols = Seq("name", "bogus", "species", "sex", "birth",
        "last_vaccine")
      def cells(vs: graft.model.Value*): Seq[String] = vs.map(_.toJson)
      val planted = Seq(
        CdcEvent(100, s"$host/flvDb/pet", "binlog.000001", 100, Cdc.OpAdd,
          null, bogusCols, Seq(CdcRowImages(null,
            cells(VString("Bogus"), VString("Eve"), VString("cat"),
              VString("f"), VDate(2001, 1, 1), VNull)))),
        CdcEvent(101, s"$host/flvDb/pet", "binlog.000001", 101, Cdc.OpAdd,
          null, petCols6, Seq(CdcRowImages(null,
            cells(VString("Extra"), VString("Eve"), VString("cat"),
              VString("f"), VDate(2001, 1, 1), VNull, VString("overflow"))))),
        CdcEvent(102, s"$host/flvDb/pet", "binlog.000001", 102, Cdc.OpAdd,
          null, null, Seq(CdcRowImages(null,
            cells(VString("Wide"), VString("Eve"), VString("cat"),
              VString("f"), VDate(2001, 1, 1), VNull, VString("overflow"))))),
        CdcEvent(103, s"$host/flvDb", "binlog.000001", 103, Cdc.OpAdd,
          null, petCols6, Seq(CdcRowImages(null,
            cells(VString("NoTbl"), VString("Eve"), VString("cat"),
              VString("f"), VDate(2001, 1, 1), VNull)))),
        CdcEvent(104, s"$host/flvDb", "binlog.000001", 104, Cdc.OpQuery,
          "DROP TABLE pet", null, null),
        CdcEvent(105, s"$host/flvDb/pet", "binlog.000001", 105, Cdc.OpAdd,
          null, petCols6, Seq(CdcRowImages(null,
            cells(VString("Ghost"), VString("Eve"), VString("cat"),
              VString("f"), VDate(2001, 1, 1), VNull)))),
        CdcEvent(106, s"$host/flvDb/stray", "binlog.000001", 106, Cdc.OpAdd,
          null, Seq("k", "v"), Seq(CdcRowImages(null,
            cells(VString("ok"), VString("ungoverned"))))))
      val events = CdcGen.typedEvents(s)
        .unionByName(planted.toDS().toDF())
      val (_, quarantine) = graft.operators.CdcGuards.partition(events)
      quarantine.orderBy("sequence")
    }),

    // Verbatim-Query replay (mysql_manager.rs:77-95): a mid-stream
    // TRUNCATE — a statement the registry parser ignores but the follower
    // executes — must wipe the table's rows while its columns stay in
    // force, and must not touch sibling tables. The fixture follows the
    // TRUNCATE with an ALTER ADD so the fold proves state cleared without
    // schema reset.
    "cdc_apply_truncate" -> ((s, _) => {
      val st = ChangelogApply.applyWithSchema(CdcGen.truncateEvents(s))
      CdcGen.decodeTruncate(st).orderBy("tbl", "id")
    }),

    // Vacuum DRY-RUN report over the manifest-committed replica
    // (round-7 item 8): a deterministic little replica history — retain
    // policy set to 1 (a committed, versioned operation), three upsert
    // batches, one crashed orphan epoch — then the report classifies
    // every snapshot dir as current / retained / deletable, exactly
    // mirroring what gc WOULD collect, deleting nothing. The
    // observability surface an operator consults before trusting
    // collection.
    "sink_vacuum_report" -> ((s, _) => {
      import graft.operators.{ReplicaSink, SnapshotManifest}
      import s.implicits._
      val root = graft.Fs.scratch("/tmp/graft_vacuum")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      SnapshotManifest.setRetention(root, 1)
      def batch(rows: (String, Seq[String], Boolean)*) = rows
        .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
        .toDF("uri", "key", "image", "deleted")
      ReplicaSink.upsertBatch(root.toString)(
        batch(("a", Seq("a", "1"), false)), 0)
      ReplicaSink.upsertBatch(root.toString)(
        batch(("b", Seq("b", "1"), false)), 1)
      ReplicaSink.upsertBatch(root.toString)(
        batch(("a", Seq("a", "2"), false)), 2)
      // a crashed epoch write: the dir exists, no manifest ever named it
      new java.io.File(root, "epoch_9/bucket=0").mkdirs()
      SnapshotManifest.vacuumReport(root, "epoch_")
        .map(e => (e.path, e.kind))
        .toDF("path", "kind")
        .orderBy("path")
    }),

    // Compaction over the manifest-committed replica: three upsert
    // batches leave the current snapshot's two buckets pinned in two
    // different epoch dirs; compact() rewrites both into one immutable
    // epoch_compact dir and commits the layout change via the same
    // pointer swap. The report pins WHERE each bucket moved from/to and
    // WHAT it holds after the move — layout changed, content didn't.
    "sink_compact_report" -> ((s, _) => {
      import graft.operators.{ReplicaSink, SnapshotManifest}
      import s.implicits._
      val root = graft.Fs.scratch("/tmp/graft_compact")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      def batch(rows: (String, Seq[String], Boolean)*) = rows
        .map { case (k, img, del) => ("flv://m/g/t", k, img, del) }
        .toDF("uri", "key", "image", "deleted")
      ReplicaSink.upsertBatch(root.toString)(
        batch(("a", Seq("a", "1"), false)), 0)
      ReplicaSink.upsertBatch(root.toString)(
        batch(("b", Seq("b", "1"), false)), 1)
      ReplicaSink.upsertBatch(root.toString)(
        batch(("a", Seq("a", "2"), false)), 2)
      val report = ReplicaSink.compact(s, root.toString)
        .map(e => (e.bucket, e.before, e.after))
        .toDF("bucket", "before", "after")
      val m = SnapshotManifest.read(root)
      val content = m.entries.toSeq.sortBy(_._1).collect {
        case (k, rel) if k.startsWith("bucket=") =>
          s.read.schema("uri STRING, key STRING, image ARRAY<STRING>")
            .parquet(new java.io.File(root, rel).toString)
            .withColumn("bucket", lit(k.stripPrefix("bucket=").toInt))
      }.reduce(_ unionByName _)
        .groupBy("bucket")
        .agg(array_join(sort_array(collect_list(
          concat_ws("|", col("key"), array_join(col("image"), ",")))), ";")
          .as("rows"))
      report.join(content, Seq("bucket")).orderBy("bucket")
    }),

    // Change Data Feed between two committed replica versions
    // (ReplicaSink.changesBetween): v1 = the customer table bucketed by
    // custkey, v2 = one upsert epoch that updates bucket 1 (+500 on
    // every custkey%4==1 balance), deletes custkey%8==7 (bucket 3), and
    // inserts shadow keys custkey+100000 (bucket 1 again). The feed is
    // derived purely from the snapshot DIFF: the manifest names buckets
    // 1 and 3 as changed, only those four dirs are opened (O(delta),
    // not O(table)), and the full-outer key join classifies each row.
    // The replica — built by CONSUMING a changelog — here re-EMITS one:
    // replication chaining, the converse of mysql_manager.rs:232-292.
    "sink_change_feed" -> ((s, dir) => {
      val root = cdfFixture(s, dir, "graft_cdf")
      ReplicaSink.changesBetween(s, root, 1L, 2L,
          CdfSchema, Seq("c_custkey"))
        .select(col("c_custkey"), col("change_type"),
          col("before_cents"), col("after_cents"))
        .orderBy("c_custkey")
    }),

    // SCD TYPE-2 dimension from the changelog (ChangelogApply.
    // scd2Dimension): the warehouse materialization the replica apply
    // collapses — per key, EVERY version with its validity interval in
    // sequence numbers (insert opens v1; the %5 update closes it and
    // opens v2; the %7 delete closes the open version without opening).
    // One key shuffle + shared-sort windows; cell layout per the
    // generator's fixed customer schema.
    "cdc_scd2" -> ((s, dir) => {
      ChangelogApply.scd2Dimension(CdcGen.customerEvents(s, dir))
        .select(element_at(col("image"), 1).cast("long").as("c_custkey"),
          col("version"),
          col("valid_from_seq"), col("valid_to_seq"), col("is_current"),
          element_at(col("image"), 4).cast("double").as("c_acctbal"),
          element_at(col("image"), 5).as("c_mktsegment"))
        .orderBy("c_custkey", "version")
    }),

    // Point lookup through the manifest: resolve each key's bucket from
    // the recorded geometry and open ONLY those bucket dirs — the
    // O(bucket), never O(table), serving read a keyed replica exists
    // for (key 15 is deleted in v2 and must be absent; 13 reads its
    // updated balance; 100017 is a v2 insert).
    "sink_point_lookup" -> ((s, dir) => {
      val root = cdfFixture(s, dir, "graft_ptlkp")
      val m = SnapshotManifest.read(new java.io.File(root))
      val keys = Seq(11L, 13L, 15L, 100017L)
      val paths = keys.map(k => (k % 4).toInt).distinct.sorted
        .flatMap(b => m.entries.get(s"bucket=$b"))
        .map(rel => new java.io.File(root, rel).toString)
      s.read.schema(CdfSchema).parquet(paths: _*)
        .where(col("c_custkey").isin(keys: _*))
        .select(col("c_custkey"), col("cents"))
        .orderBy("c_custkey")
    }),

    // CDF → downstream incremental MV, the consumption loop the feed
    // exists for: a balances-by-group rollup initialized from v1 and
    // maintained ONLY from the change feed (counting algorithm — each
    // feed row becomes a ±1/±cents signed delta, updates cancel
    // exactly), never rescanning the table; a replayed fold is a
    // detected no-op (the IncrementalAgg lastBatch watermark). The
    // result must equal a direct aggregate over the v2 head — which is
    // exactly what the oracle computes.
    "sink_cdf_mv" -> ((s, dir) => {
      import graft.operators.IncrementalAgg
      val root = cdfFixture(s, dir, "graft_cdfmv")
      val mvDir = s"$root/_mv"
      val spec = IncrementalAgg.MvSpec("grp",
        partialAggs = Seq(sum(col("mult")).cast("long").as("n_rows"),
          sum(col("cents_s")).cast("long").as("sum_cents")),
        mergeAggs = Seq(sum(col("n_rows")).cast("long").as("n_rows"),
          sum(col("sum_cents")).cast("long").as("sum_cents")),
        cols = Seq("grp", "n_rows", "sum_cents"))
      val init = s.read.schema(CdfSchema)
        .parquet((0 until 4).map(b =>
          s"$root/snap_base/bucket=$b"): _*)
        .select((col("c_custkey") % 10).as("grp"),
          lit(1L).as("mult"), col("cents").as("cents_s"))
      IncrementalAgg.updateMv(s, mvDir, init, spec, 0L)
      val feed = ReplicaSink.changesBetween(s, root, 1L, 2L,
        CdfSchema, Seq("c_custkey"))
      val minus = feed
        .where(col("change_type").isin("delete", "update"))
        .select((col("c_custkey") % 10).as("grp"),
          lit(-1L).as("mult"), (-col("before_cents")).as("cents_s"))
      val plus = feed
        .where(col("change_type").isin("insert", "update"))
        .select((col("c_custkey") % 10).as("grp"),
          lit(1L).as("mult"), col("after_cents").as("cents_s"))
      IncrementalAgg.updateMv(s, mvDir, minus.unionByName(plus), spec, 1L)
      // replay of the already-folded batch: must be a detected no-op
      IncrementalAgg.updateMv(s, mvDir, minus.unionByName(plus), spec, 1L)
      IncrementalAgg.readMv(s, mvDir, spec).orderBy("grp")
    }),

    // RESTORE as a commit (ReplicaSink.restore): v1 = the customer
    // balances, v2 = a bad deploy (bucket 0 corrupted +999, bucket 2
    // dropped entirely), v3 = restore(v1) — a rollback that re-commits
    // v1's entries as a new version without rewriting a byte of data.
    // The head read returns exactly the original table; the bad v2
    // stays retained and auditable behind it.
    "sink_restore" -> ((s, dir) => {
      val root = graft.Fs.scratch("/tmp/graft_restore")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      val nb = 4
      val rbSchema = "c_custkey BIGINT, cents BIGINT"
      val cust = graft.sources.Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          round(col("c_acctbal") * lit(100)).cast("bigint").as("cents"),
          pmod(col("c_custkey"), lit(nb)).cast("int").as("bucket"))
      cust.repartition(nb, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(new java.io.File(root, "snap_base").toString)
      SnapshotManifest.commit(root, SnapshotManifest.State(1L,
        (0 until nb).map(b => s"bucket=$b" -> s"snap_base/bucket=$b").toMap
          + ("conf/buckets" -> nb.toString)))
      // the bad deploy: corrupt bucket 0, drop bucket 2
      val m1 = SnapshotManifest.read(root)
      s.read.schema(rbSchema)
        .parquet(new java.io.File(root, m1.entries("bucket=0")).toString)
        .withColumn("cents", col("cents") + lit(999L))
        .withColumn("bucket", lit(0))
        .coalesce(1)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(new java.io.File(root, "epoch_bad").toString)
      SnapshotManifest.commit(root, SnapshotManifest.State(2L,
        m1.entries - "bucket=2" + ("bucket=0" -> "epoch_bad/bucket=0")))
      val fin = ReplicaSink.restore(root.toString, 1L)
      val m = SnapshotManifest.read(root)
      val paths = (0 until nb)
        .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
      s.read.schema(rbSchema).parquet(paths: _*)
        .select(col("c_custkey"), col("cents").as("acctbal_cents"))
        .withColumn("n_commits", lit(fin.version).cast("bigint"))
        .orderBy("c_custkey")
    }),

    // The artifact's commit log as data (SnapshotManifest.history — the
    // DESCRIBE HISTORY surface): three deterministic commits, one row
    // per retained version with its entry-level delta vs the previous
    // one. Reads only the O(retain) manifest archives; no data dir is
    // ever opened.
    "sink_history" -> ((s, _) => {
      import s.implicits._
      val root = graft.Fs.scratch("/tmp/graft_hist")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      SnapshotManifest.commit(root, SnapshotManifest.State(1L, Map(
        "conf/buckets" -> "4", "bucket=0" -> "e1/b0", "bucket=1" -> "e1/b1")))
      SnapshotManifest.commit(root, SnapshotManifest.State(2L, Map(
        "conf/buckets" -> "4", "bucket=0" -> "e1/b0", "bucket=1" -> "e2/b1",
        "bucket=2" -> "e2/b2")))
      SnapshotManifest.commit(root, SnapshotManifest.State(3L, Map(
        "conf/buckets" -> "4", "bucket=1" -> "e2/b1", "bucket=2" -> "e2/b2")))
      SnapshotManifest.history(root)
        .map(h => (h.version, h.nEntries, h.added, h.removed, h.changed,
          h.retain))
        .toDF("version", "n_entries", "added", "removed", "changed",
          "retain")
        .orderBy("version")
    }),

    // Multi-writer commit under optimistic concurrency (SnapshotManifest
    // class doc "Multi-writer optimistic concurrency"): two writers each
    // rewrite a DISJOINT half of the bucketed customer replica (+100 /
    // +200 on the balance, held in integer cents for cross-engine
    // exactness) from the same base version. Writer B lands first;
    // writer A's claim collides and transact() rebases — re-deriving its
    // manifest entries on B's head WITHOUT re-running the data job (the
    // epoch dirs are immutable and already written). The output reads
    // the final snapshot: both halves updated, version 3 (base + B + A),
    // the lost-update the last-writer-wins pointer would have silently
    // committed structurally impossible. At 100 TB this is the streaming
    // upsert, the compaction job, and the backfill sharing one artifact.
    "sink_concurrent_commits" -> ((s, dir) => {
      val root = graft.Fs.scratch("/tmp/graft_occ")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      val nb = 4
      val cust = graft.sources.Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          round(col("c_acctbal") * lit(100)).cast("bigint").as("cents"),
          pmod(col("c_custkey"), lit(nb)).cast("int").as("bucket"))
      cust.repartition(nb, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(new java.io.File(root, "snap_base").toString)
      SnapshotManifest.commit(root, SnapshotManifest.State(1L,
        (0 until nb).map(b => s"bucket=$b" -> s"snap_base/bucket=$b").toMap
          + ("conf/buckets" -> nb.toString)))
      val rbSchema = "c_custkey BIGINT, cents BIGINT"
      // a writer's DATA phase: merge its delta into its buckets under an
      // immutable epoch dir (reads its base's bucket dirs only)
      def rewrite(label: String, touch: Seq[Int],
          deltaCents: Long): Map[String, String] = {
        val m = SnapshotManifest.read(root)
        val paths = touch
          .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
        s.read.schema(rbSchema).parquet(paths: _*)
          .withColumn("cents", col("cents") + lit(deltaCents))
          .withColumn("bucket", pmod(col("c_custkey"), lit(nb)).cast("int"))
          .repartition(touch.length, col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(new java.io.File(root, s"epoch_$label").toString)
        touch.map(b => s"bucket=$b" -> s"epoch_$label/bucket=$b").toMap
      }
      val aEntries = rewrite("A", Seq(0, 1), 10000L)
      val bEntries = rewrite("B", Seq(2, 3), 20000L)
      var staged = false
      val fin = SnapshotManifest.transact(root) { base =>
        if (!staged) {
          staged = true // writer B wins the claim race for version 2
          SnapshotManifest.commit(root, SnapshotManifest.State(
            base.version + 1, base.entries ++ bEntries, base.retain))
        }
        SnapshotManifest.State(
          base.version + 1, base.entries ++ aEntries, base.retain)
      }
      val m = SnapshotManifest.read(root)
      val paths = (0 until nb)
        .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
      s.read.schema(rbSchema).parquet(paths: _*)
        .select(col("c_custkey"), col("cents").as("acctbal_cents"))
        .withColumn("n_commits", lit(fin.version).cast("bigint"))
        .orderBy("c_custkey")
    }),

    // WriteConflict RECOVERY end-to-end (round-9 verdict item 7): the
    // companion to sink_concurrent_commits with a TOUCHED-BUCKET
    // collision instead of disjoint halves. Writer B (+200 on buckets
    // {0,2}) wins the version race against writer A (+100 on buckets
    // {0,1}, data derived from the STALE base); A's transact rebase
    // finds bucket=0 rewritten to a different value on both sides — no
    // merge is sound — and surfaces WriteConflict naming exactly that
    // bucket. Recovery is the protocol's contract: the loser RE-RUNS
    // ITS DATA JOB from the new head (reading B's bucket-0 output, so
    // B's +200 is under A's +100 — nothing lost), then retries and
    // converges. Output pins the final state of all four buckets (+300
    // on the collided bucket, each writer's own delta on its private
    // bucket, base on the untouched one), the commit count, and that
    // exactly one conflict-rebase cycle ran. At 100 TB this is the
    // streaming upsert racing a compaction that rewrote the same
    // bucket — the drift guards (ReplicaSink upsert/compact/rebucket)
    // throw this same WriteConflict; this query is the measured proof
    // the recovery loop they prescribe terminates with no lost update.
    "sink_conflict_retry" -> ((s, dir) => {
      val root = graft.Fs.scratch("/tmp/graft_occ_retry")
      graft.Fs.deleteRecursively(root)
      root.mkdirs()
      val nb = 4
      val cust = graft.sources.Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          round(col("c_acctbal") * lit(100)).cast("bigint").as("cents"),
          pmod(col("c_custkey"), lit(nb)).cast("int").as("bucket"))
      cust.repartition(nb, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(new java.io.File(root, "snap_base").toString)
      SnapshotManifest.commit(root, SnapshotManifest.State(1L,
        (0 until nb).map(b => s"bucket=$b" -> s"snap_base/bucket=$b").toMap
          + ("conf/buckets" -> nb.toString)))
      val rbSchema = "c_custkey BIGINT, cents BIGINT"
      // a writer's DATA phase against the CURRENT head (immutable epoch
      // dir; reads only its touched buckets)
      def rewrite(label: String, touch: Seq[Int],
          deltaCents: Long): Map[String, String] = {
        val m = SnapshotManifest.read(root)
        val paths = touch
          .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
        s.read.schema(rbSchema).parquet(paths: _*)
          .withColumn("cents", col("cents") + lit(deltaCents))
          .withColumn("bucket", pmod(col("c_custkey"), lit(nb)).cast("int"))
          .repartition(touch.length, col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(new java.io.File(root, s"epoch_$label").toString)
        touch.map(b => s"bucket=$b" -> s"epoch_$label/bucket=$b").toMap
      }
      // both writers derive their data from version 1
      val bEntries = rewrite("B", Seq(0, 2), 20000L)
      val aStale = rewrite("A1", Seq(0, 1), 10000L)
      var retries = 0L
      var staged = false
      val fin =
        try {
          SnapshotManifest.transact(root) { base =>
            if (!staged) {
              staged = true // B wins the claim race for version 2
              SnapshotManifest.commit(root, SnapshotManifest.State(
                base.version + 1, base.entries ++ bEntries, base.retain))
            }
            SnapshotManifest.State(
              base.version + 1, base.entries ++ aStale, base.retain)
          }
          throw new IllegalStateException(
            "expected WriteConflict on bucket=0 — drift guard did not fire")
        } catch {
          case SnapshotManifest.WriteConflict(_, keys) =>
            require(keys == Set("bucket=0"),
              s"conflict must name exactly the collided bucket, got $keys")
            retries += 1
            // recovery: re-derive the DATA from the new head (rewrite
            // reads the current manifest, so bucket 0 now comes from
            // B's epoch) and retry the commit
            val aFresh = rewrite("A2", Seq(0, 1), 10000L)
            SnapshotManifest.transact(root)(base => SnapshotManifest.State(
              base.version + 1, base.entries ++ aFresh, base.retain))
        }
      val m = SnapshotManifest.read(root)
      val paths = (0 until nb)
        .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
      s.read.schema(rbSchema).parquet(paths: _*)
        .select(col("c_custkey"), col("cents").as("acctbal_cents"))
        .withColumn("n_commits", lit(fin.version).cast("bigint"))
        .withColumn("n_retries", lit(retries).cast("bigint"))
        .orderBy("c_custkey")
    }),

    // SHALLOW CLONE (SnapshotManifest.cloneTo — the lakehouse zero-copy
    // table clone, completing the maintenance verb set beside
    // CDF/history/restore/vacuum): the bucketed replica is cloned
    // manifest-only (data files hardlinked, never copied), then the
    // CLONE takes an upsert on bucket 1 while the SOURCE takes none.
    // The output reads BOTH tables: the source must still serve the
    // base snapshot bit-for-bit (writes on the clone stage new files
    // under its own root — shared immutable inodes are never mutated)
    // while the clone serves base + delta, each side reporting its own
    // commit count (source still 1, clone 2 — the clone owns its
    // history from version 1). At 100 TB this is the dev-branch /
    // reproducible-experiment / migration-test verb: a full-corpus
    // "copy" that costs one manifest write.
    "sink_clone" -> ((s, dir) => {
      val src = graft.Fs.scratch("/tmp/graft_clone_src")
      val dst = graft.Fs.scratch("/tmp/graft_clone_dst")
      graft.Fs.deleteRecursively(src)
      graft.Fs.deleteRecursively(dst)
      src.mkdirs()
      val nb = 4
      val cust = graft.sources.Tables.table(s, dir, "customer")
        .select(col("c_custkey"),
          round(col("c_acctbal") * lit(100)).cast("bigint").as("cents"),
          pmod(col("c_custkey"), lit(nb)).cast("int").as("bucket"))
      cust.repartition(nb, col("bucket"))
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(new java.io.File(src, "snap_base").toString)
      SnapshotManifest.commit(src, SnapshotManifest.State(1L,
        (0 until nb).map(b => s"bucket=$b" -> s"snap_base/bucket=$b").toMap
          + ("conf/buckets" -> nb.toString)))
      SnapshotManifest.cloneTo(src, dst)
      // diverge the CLONE: +300.00 on bucket 1, committed under its own
      // history (immutable epoch dir + pointer swap)
      val rbSchema = "c_custkey BIGINT, cents BIGINT"
      val mC = SnapshotManifest.read(dst)
      s.read.schema(rbSchema)
        .parquet(new java.io.File(dst, mC.entries("bucket=1")).toString)
        .withColumn("cents", col("cents") + lit(30000L))
        .write.mode("overwrite")
        .parquet(new java.io.File(dst, "epoch_d/bucket=1").toString)
      SnapshotManifest.commit(dst, SnapshotManifest.State(mC.version + 1,
        mC.entries + ("bucket=1" -> "epoch_d/bucket=1"), mC.retain))
      def side(root: java.io.File, label: String) = {
        val m = SnapshotManifest.read(root)
        val paths = (0 until nb)
          .map(b => new java.io.File(root, m.entries(s"bucket=$b")).toString)
        s.read.schema(rbSchema).parquet(paths: _*)
          .select(lit(label).as("side"), col("c_custkey"),
            col("cents").as("acctbal_cents"),
            lit(m.version).cast("bigint").as("n_commits"))
      }
      side(src, "src").unionByName(side(dst, "clone"))
        .orderBy("side", "c_custkey")
    }),

    // Verbatim-Query replay, RENAME TABLE (mysql_manager.rs:89-95): the
    // follower moves the table's whole state to the new name — rows
    // inserted pre-rename are updated/deleted/widened post-rename under
    // the new identity, and a re-CREATE of the old name starts fresh.
    // The registry never sees the rename (query_parser fall-through);
    // the apply resolves it via the table-identity remap.
    "cdc_apply_rename" -> ((s, _) => {
      val st = ChangelogApply.applyWithSchema(CdcGen.renameEvents(s))
      CdcGen.decodeDbTables(st).orderBy("tbl", "id")
    }),

    // Verbatim-Query replay, DROP DATABASE (mysql_manager.rs:89-95): the
    // follower wipes EVERY table of the db — a statement the registry
    // explicitly ignores (query_parser.rs:63-66) but the replica must
    // execute. A sibling db survives; a post-drop re-CREATE is empty.
    "cdc_apply_dropdb" -> ((s, _) => {
      val st = ChangelogApply.applyWithSchema(CdcGen.dropDbEvents(s))
      CdcGen.decodeDbTables(st).orderBy("db", "tbl", "id")
    }),

    // Typed Value wire fidelity (values.rs:8-45): every remaining Value
    // variant family — SignedInteger, Decimal, DateTime, Blob, Timestamp,
    // Double, Enum, Year, Float, Time, Json, Null — encoded as tagged
    // serde JSON cells, round-tripped through to_json/from_json wire
    // form, applied (incl. a changed-cols update with a typed→Null
    // transition), and decoded back to native Spark types.
    "cdc_typed_roundtrip" -> ((s, _) => {
      val ev = CdcGen.typedEvents(s)
      val wire = ev.select(to_json(struct(ev.columns.map(col): _*)).as("json"))
      val parsed = wire
        .select(from_json(col("json"), Cdc.EventSchema).as("e"))
        .select("e.*")
      val st = ChangelogApply.applyWithSchema(parsed)
      CdcGen.decodeMenagerie(st.where(col("tbl") === "menagerie"))
        .orderBy("id")
    }),

    // K2 front half — SQL statement regeneration
    // (mysql_manager.rs:208-292): INSERT / UPDATE with changed-cols-only
    // SET + null-safe full-image WHERE / DELETE, plus verbatim DDL
    // passthrough (mysql_manager.rs:89-95). Pet-db slice checked against
    // literal goldens here; the menagerie slice is differentially checked
    // against the row-level builders in SqlGenSpec.
    "cdc_sqlgen" -> ((s, _) => {
      val ev = CdcGen.typedEvents(s)
        .where(element_at(split(col("uri"), "/"), 4) === "flvDb")
      SqlGen.statements(ev).orderBy("sequence", "stmt_idx")
    }),

    // D7 — broadcast registry join resolving column lists for row events.
    "cdc_registry_join" -> ((s, dir) => {
      import s.implicits._
      val reg = SchemaRegistry.fromEvents(CdcGen.ddlEvents(s, dir))
      val rowEvents = s.read.parquet(s"$dir/nation.parquet").select(
        concat(lit("app_"), $"n_regionkey".cast("string")).as("db"),
        concat(lit("t_"), lower($"n_name")).as("table"),
        $"n_nationkey".cast("long").as("sequence"))
      SchemaRegistry.resolveColumns(rowEvents, reg)
        .select(col("sequence"), col("db"), col("table").as("tbl"),
          size(col("registry_columns")).as("ncols"))
        .orderBy("sequence")
    })
  )

  /** Post-apply replica state expressed directly over the base table via
    * the CdcGen derivation rules (no replay needed — that's the point). */
  private val ApplyOracle =
    """SELECT c_custkey, c_name, c_nationkey,
       c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
       CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
       FROM customer WHERE c_custkey % 7 <> 0 ORDER BY c_custkey"""

  val oracles: Map[String, String] = Map(
    "cdc_changelog_scan" ->
      """(SELECT 0 AS sequence, 'Query' AS op, NULL AS n_columns,
           NULL AS row_key FROM customer LIMIT 1)
         UNION ALL
         SELECT c_custkey + 1, 'Add', 5, c_custkey FROM customer
         UNION ALL
         SELECT 1073741824 + c_custkey, 'Update', 5, c_custkey
         FROM customer WHERE c_custkey % 5 = 0
         UNION ALL
         SELECT 2147483648 + c_custkey, 'Delete', 5, c_custkey
         FROM customer WHERE c_custkey % 7 = 0
         ORDER BY sequence""",
    "cdc_apply_snapshot" -> ApplyOracle,
    "cdc_sink_partitioned" ->
      """SELECT c_custkey, c_name, c_nationkey,
         c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END) AS c_acctbal,
         CASE WHEN c_custkey % 25 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
         FROM customer WHERE c_custkey % 7 <> 0 AND c_nationkey = 7
         ORDER BY c_custkey""",
    "q_dpp_join" ->
      """WITH replica AS (
         SELECT c_custkey, c_nationkey,
           c_acctbal + (CASE WHEN c_custkey % 5 = 0 THEN 100.0 ELSE 0.0 END)
             AS c_acctbal
         FROM customer WHERE c_custkey % 7 <> 0)
         SELECT n_name, count(*) AS n_cust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM replica JOIN nation ON c_nationkey = n_nationkey
         WHERE n_regionkey = 1
         GROUP BY n_name ORDER BY n_name""",
    "cdc_apply_full_image" -> ApplyOracle,
    "cdc_json_roundtrip" -> ApplyOracle,
    "cdc_filter_db_producer" -> s"""$MdeCte
      SELECT sequence, db, op FROM mde
      WHERE db IS NULL OR lower(db) IN ('app_1','app_2') ORDER BY sequence""",
    "cdc_filter_db_consumer" -> s"""$MdeCte
      SELECT sequence, db, op FROM mde
      WHERE db IS NOT NULL AND lower(db) NOT IN ('app_0') ORDER BY sequence""",
    "cdc_offset_dedup" -> s"""$MdeCte
      SELECT sequence, file, "offset" FROM mde
      WHERE NOT (file = 'binlog.000002' AND "offset" = 100) ORDER BY sequence""",
    "cdc_suppress_begin" -> s"""$MdeCte
      SELECT sequence, op, query FROM mde
      WHERE NOT (op = 'Query' AND (query IS NULL OR lower(trim(query)) = 'begin'))
      ORDER BY sequence""",
    "cdc_registry_ddl_slice" -> s"""$MdeCte
      SELECT sequence, query FROM mde
      WHERE op = 'Query' AND query IS NOT NULL
        AND NOT contains(lower(query), 'database')
      ORDER BY sequence""",
    "cdc_route_ops" ->
      """SELECT CASE event_type WHEN 'error' THEN 'Query' WHEN 'click' THEN 'Add'
           WHEN 'purchase' THEN 'Update' WHEN 'signup' THEN 'Delete'
           ELSE 'Unsupported' END AS op, COUNT(*) AS n
         FROM events GROUP BY 1 ORDER BY op""",
    "cdc_project_enrich" -> s"""$MdeCte
      SELECT sequence,
        CASE WHEN db IS NULL THEN 'flv://mysql-leader'
             ELSE 'flv://mysql-leader/' || db || '/' || tbl END AS uri,
        file AS file_name, "offset" AS file_offset,
        CASE WHEN op = 'Add' THEN 'id,user_id,value' END AS cols_joined
      FROM mde ORDER BY sequence""",
    "cdc_sequence_stamp" -> s"""$MdeCte
      SELECT sequence,
        ROW_NUMBER() OVER (ORDER BY file, "offset") AS pub_seq
      FROM mde ORDER BY sequence""",
    "cdc_parse_uri" -> s"""$MdeCte
      SELECT sequence, db AS parsed_db, tbl AS parsed_table
      FROM mde ORDER BY sequence""",
    "cdc_last_record" -> s"""$MdeCte
      SELECT sequence, file, "offset" FROM mde
      ORDER BY sequence DESC LIMIT 1""",
    "cdc_schema_registry" ->
      """SELECT 'app_' || n_regionkey AS db, 't_' || lower(n_name) AS tbl,
         concat_ws(',',
           CASE WHEN n_nationkey % 5 = 0 THEN 'k0' ELSE 'c0' END,
           CASE WHEN n_nationkey % 4 = 0 THEN NULL ELSE 'c1' END,
           CASE WHEN n_nationkey % 3 >= 1 THEN 'c2' END,
           CASE WHEN n_nationkey % 3 = 2 THEN 'c3' END,
           CASE WHEN n_nationkey % 2 = 0 THEN 'extra_col' END) AS cols
         FROM nation WHERE n_nationkey % 11 <> 10
         ORDER BY db, tbl""",
    "cdc_registry_asof" ->
      """WITH r AS (
           SELECT n_nationkey AS n, 'app_' || n_regionkey AS db,
                  't_' || lower(n_name) AS tbl, o.off
           FROM nation CROSS JOIN (VALUES (1), (3), (7)) AS o(off))
         SELECT n * 10 + off AS sequence, db, tbl,
           concat_ws(',',
             CASE WHEN off >= 5 AND n % 5 = 0 THEN 'k0' ELSE 'c0' END,
             CASE WHEN off >= 7 AND n % 4 = 0 THEN NULL ELSE 'c1' END,
             CASE WHEN n % 3 >= 1 THEN 'c2' END,
             CASE WHEN n % 3 = 2 THEN 'c3' END,
             CASE WHEN off >= 3 AND n % 2 = 0 THEN 'extra_col' END) AS asof_cols
         FROM r ORDER BY sequence""",
    "cdc_guard_invalid" ->
      """SELECT * FROM (VALUES
           (CAST(100 AS BIGINT), 'Add', 'unknown_column'),
           (CAST(101 AS BIGINT), 'Add', 'arity_mismatch'),
           (CAST(102 AS BIGINT), 'Add', 'width_mismatch'),
           (CAST(103 AS BIGINT), 'Add', 'missing_table'),
           (CAST(105 AS BIGINT), 'Add', 'unknown_table'))
         AS t(sequence, op, reason)
         ORDER BY sequence""",
    "cdc_e2e_pet" ->
      """SELECT * FROM (VALUES
           ('Jack', 'Peter', 'dog', 'm', DATE '1989-08-31', CAST(NULL AS DATE)),
           ('Spot', 'Jane', 'dog', 'm', DATE '2010-11-02', DATE '2020-06-10'))
         AS t(name, owner, species, sex, birth, last_vaccine)
         ORDER BY name""",
    "cdc_apply_truncate" ->
      """SELECT * FROM (VALUES
           ('box', CAST(9 AS BIGINT), 'keep', CAST(NULL AS BIGINT)),
           ('crate', CAST(4 AS BIGINT), 'delta', CAST(7 AS BIGINT)))
         AS t(tbl, id, txt, qty)
         ORDER BY tbl, id""",
    // epoch_0's bucket survives only through the retained v3 archive
    // (retain=1 keeps exactly one version behind the committed v4);
    // epoch_1/epoch_2 hold the current buckets; the orphan is what a
    // gc pass would collect
    "sink_vacuum_report" ->
      """SELECT * FROM (VALUES
           ('epoch_0/bucket=0', 'retained'),
           ('epoch_1/bucket=8', 'current'),
           ('epoch_2/bucket=0', 'current'),
           ('epoch_9', 'deletable'))
         AS t(path, kind)
         ORDER BY path""",
    // key "a" hashes to bucket 0, "b" to bucket 8 (same keys as the
    // vacuum fixture); commits v1..v3 put them in epoch_2 / epoch_1,
    // compaction commits v4 and gathers both into epoch_compact4
    "sink_compact_report" ->
      """SELECT * FROM (VALUES
           (CAST(0 AS INTEGER), 'epoch_2/bucket=0', 'epoch_compact4/bucket=0', 'a|a,2'),
           (CAST(8 AS INTEGER), 'epoch_1/bucket=8', 'epoch_compact4/bucket=8', 'b|b,1'))
         AS t(bucket, before, after, rows)
         ORDER BY bucket""",
    // update = every bucket-1 key (+500); delete = custkey%8==7 (those
    // are exactly the bucket-3 deletions); insert = shadow keys
    // 100000+custkey for custkey%16==1, carrying cents+1000. Rows of
    // buckets 1/3 untouched by any of the three are absent (null-safe
    // value filter); buckets 0/2 are never read at all.
    "sink_change_feed" ->
      """WITH base AS (
           SELECT c_custkey AS k,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer)
         SELECT * FROM (
           SELECT k AS c_custkey, 'update' AS change_type,
             cents AS before_cents, cents + 500 AS after_cents
           FROM base WHERE k % 4 = 1
           UNION ALL
           SELECT k, 'delete', cents, CAST(NULL AS BIGINT)
           FROM base WHERE k % 8 = 7
           UNION ALL
           SELECT k + 100000, 'insert', CAST(NULL AS BIGINT), cents + 1000
           FROM base WHERE k % 16 = 1)
         ORDER BY c_custkey""",
    // the restored head is byte-for-byte the original balances; the
    // restore is the third commit
    "sink_restore" ->
      """SELECT c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) AS acctbal_cents,
           CAST(3 AS BIGINT) AS n_commits
         FROM customer ORDER BY c_custkey""",
    // v1 for every key (closed by the %5 update else the %7 delete);
    // v2 for %5 keys (closed by the %7 delete); sequence arithmetic
    // mirrors the generator (insert = key+1, update = 2^30+key,
    // delete = 2^31+key)
    "cdc_scd2" ->
      """WITH base AS (
           SELECT c_custkey AS k, c_acctbal, c_mktsegment FROM customer)
         SELECT * FROM (
           SELECT k AS c_custkey, CAST(1 AS INTEGER) AS version,
             CAST(k + 1 AS BIGINT) AS valid_from_seq,
             CAST(CASE WHEN k % 5 = 0 THEN 1073741824 + k
                       WHEN k % 7 = 0 THEN 2147483648 + k END AS BIGINT)
               AS valid_to_seq,
             (k % 5 <> 0 AND k % 7 <> 0) AS is_current,
             c_acctbal, c_mktsegment
           FROM base
           UNION ALL
           SELECT k, CAST(2 AS INTEGER),
             CAST(1073741824 + k AS BIGINT),
             CAST(CASE WHEN k % 7 = 0 THEN 2147483648 + k END AS BIGINT),
             k % 7 <> 0,
             c_acctbal + 100.0,
             CASE WHEN k % 25 = 0 THEN NULL ELSE c_mktsegment END
           FROM base WHERE k % 5 = 0)
         ORDER BY c_custkey, version""",
    // the v2 head restricted to the probed keys; the deleted key is
    // structurally absent
    "sink_point_lookup" ->
      """WITH base AS (
           SELECT c_custkey AS k,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         head AS (
           SELECT k, cents + CASE WHEN k % 4 = 1 THEN 500 ELSE 0 END
             AS cents
           FROM base WHERE k % 8 <> 7
           UNION ALL
           SELECT k + 100000, cents + 1000 FROM base WHERE k % 16 = 1)
         SELECT k AS c_custkey, cents FROM head
         WHERE k IN (11, 13, 15, 100017) ORDER BY c_custkey""",
    // direct aggregate over the v2 head — inserts added, deletes gone,
    // updates at their new balance; the MV saw only v1 + the feed
    "sink_cdf_mv" ->
      """WITH base AS (
           SELECT c_custkey AS k,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         head AS (
           SELECT k, cents + CASE WHEN k % 4 = 1 THEN 500 ELSE 0 END
             AS cents
           FROM base WHERE k % 8 <> 7
           UNION ALL
           SELECT k + 100000, cents + 1000 FROM base WHERE k % 16 = 1)
         SELECT k % 10 AS grp, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
         FROM head GROUP BY 1 ORDER BY grp""",
    // v1 creates 3 entries; v2 rewrites bucket=1 and adds bucket=2;
    // v3 drops bucket=0 — the commit log's entry-level deltas
    "sink_history" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 3, 3, 0, 0, 2),
           (CAST(2 AS BIGINT), 4, 1, 0, 1, 2),
           (CAST(3 AS BIGINT), 3, 0, 1, 0, 2))
         AS t(version, n_entries, added, removed, changed, retain)
         ORDER BY version""",
    // buckets 0/1 got writer A's +100, buckets 2/3 writer B's +200;
    // three commits land (base, B, A-rebased) — a lost update would
    // leave one half at its base balance and hash-mismatch here
    "sink_concurrent_commits" ->
      """SELECT c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) +
             CASE WHEN c_custkey % 4 IN (0, 1) THEN 10000 ELSE 20000 END
             AS acctbal_cents,
           CAST(3 AS BIGINT) AS n_commits
         FROM customer ORDER BY c_custkey""",
    // src serves base untouched (1 commit); the clone serves base
    // +300.00 on its bucket-1 keys under its own 2-commit history
    "sink_clone" ->
      """SELECT side, c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) +
             CASE WHEN side = 'clone' AND c_custkey % 4 = 1
                  THEN 30000 ELSE 0 END AS acctbal_cents,
           CAST(CASE WHEN side = 'clone' THEN 2 ELSE 1 END AS BIGINT)
             AS n_commits
         FROM customer
         CROSS JOIN (SELECT unnest(['clone', 'src']) AS side)
         ORDER BY side, c_custkey""",
    // collided bucket 0 carries BOTH deltas (B's +200 under A's
    // post-rebase +100), each writer's private bucket its own, bucket 3
    // untouched; 3 commits (base + B + A's retry), exactly 1 retry
    "sink_conflict_retry" ->
      """SELECT c_custkey,
           CAST(ROUND(c_acctbal * 100) AS BIGINT) +
             CASE WHEN c_custkey % 4 = 0 THEN 30000
                  WHEN c_custkey % 4 = 1 THEN 10000
                  WHEN c_custkey % 4 = 2 THEN 20000
                  ELSE 0 END AS acctbal_cents,
           CAST(3 AS BIGINT) AS n_commits,
           CAST(1 AS BIGINT) AS n_retries
         FROM customer ORDER BY c_custkey""",
    "cdc_apply_rename" ->
      """SELECT * FROM (VALUES
           ('inv', 'audit', CAST(9 AS BIGINT), 'keep', CAST(NULL AS BIGINT)),
           ('inv', 'stock', CAST(7 AS BIGINT), 'fresh', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(1 AS BIGINT), 'bolt-x', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(3 AS BIGINT), 'washer', CAST(NULL AS BIGINT)),
           ('inv', 'stock_v2', CAST(4 AS BIGINT), 'pin', CAST(5 AS BIGINT)))
         AS t(db, tbl, id, txt, qty)
         ORDER BY tbl, id""",
    "cdc_apply_dropdb" ->
      """SELECT * FROM (VALUES
           ('app', 'users', CAST(3 AS BIGINT), 'carol', CAST(NULL AS BIGINT)),
           ('keepdb', 'logs', CAST(5 AS BIGINT), 'hello', CAST(NULL AS BIGINT)))
         AS t(db, tbl, id, txt, qty)
         ORDER BY db, tbl, id""",
    "cdc_typed_roundtrip" ->
      """SELECT * FROM (VALUES
           (CAST(2 AS BIGINT), 'Goldie II', CAST(NULL AS DECIMAL(18,6)),
            TIMESTAMP '2022-01-15 08:00:00', 'glub',
            TIMESTAMP '2020-09-13 12:26:40', CAST(3.5 AS DOUBLE),
            CAST(5 AS SMALLINT), 2020, CAST(2.5 AS REAL),
            '8:0:5.0', '{"b":[1,2]}'),
           (CAST(3 AS BIGINT), CAST(NULL AS VARCHAR), CAST(NULL AS DECIMAL(18,6)),
            CAST(NULL AS TIMESTAMP), CAST(NULL AS VARCHAR),
            CAST(NULL AS TIMESTAMP), CAST(NULL AS DOUBLE),
            CAST(NULL AS SMALLINT), CAST(NULL AS INTEGER), CAST(NULL AS REAL),
            CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR)))
         AS t(id, nick, weight, seen, tag_utf8, born, score, kind, yr,
              ratio, feeding, meta)
         ORDER BY id""",
    "cdc_sqlgen" ->
      """SELECT * FROM (VALUES
           (CAST(1 AS BIGINT), 0, 'CREATE DATABASE flvDb'),
           (2, 0, 'CREATE TABLE pet (name VARCHAR(20), owner VARCHAR(20), species VARCHAR(20), sex CHAR(1), birth DATE)'),
           (3, 0, 'INSERT INTO pet (name, owner, species, sex, birth) VALUES ("Puffball", "Diane", "hamster", "f", "1999-3-30")'),
           (4, 0, 'INSERT INTO pet (name, owner, species, sex, birth) VALUES ("Jack", "Peter", "dog", "m", "1999-3-30")'),
           (5, 0, 'UPDATE pet SET birth="1989-8-31" WHERE name="Jack" AND owner="Peter" AND species="dog" AND sex="m" AND birth="1999-3-30"'),
           (6, 0, 'ALTER TABLE pet ADD COLUMN last_vaccine DATE'),
           (7, 0, 'DELETE FROM pet WHERE name="Puffball" AND owner="Diane" AND species="hamster" AND sex="f" AND birth="1999-3-30" AND last_vaccine is NULL'),
           (8, 0, 'INSERT INTO pet (name, owner, species, sex, birth, last_vaccine) VALUES ("Spot", "Jane", "dog", "m", "2010-11-2", Null)'),
           (9, 0, 'UPDATE pet SET last_vaccine="2020-6-10" WHERE name="Spot" AND owner="Jane" AND species="dog" AND sex="m" AND birth="2010-11-2" AND last_vaccine is NULL'))
         AS t(sequence, stmt_idx, stmt)
         ORDER BY sequence, stmt_idx""",
    "cdc_registry_join" ->
      """SELECT n_nationkey AS sequence, 'app_' || n_regionkey AS db,
         't_' || lower(n_name) AS tbl,
         CASE WHEN n_nationkey % 11 = 10 THEN NULL ELSE
           (2 + n_nationkey % 3)
           + (CASE WHEN n_nationkey % 4 = 0 THEN -1 ELSE 0 END)
           + (CASE WHEN n_nationkey % 2 = 0 THEN 1 ELSE 0 END)
         END AS ncols
         FROM nation ORDER BY sequence"""
  )
}
