package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Graph, TimeSeries}
import graft.sources.Tables

/** Advanced-analytics queries rounding out the engine surface: time-series
  * gap-fill, graph triangle counting, ANN recall evaluation, mergeable
  * distinct-count sketches, and an integer-exact Gram matrix — each with a
  * DuckDB oracle under the repo's exactness ground rules (integer/decimal
  * arithmetic wherever summation order could differ; doubles only for
  * values both engines derive by the identical IEEE operation).
  */
object AnalyticsQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Away-from-zero round-to-integer written only with floor/ceil so BOTH
    * engines evaluate the identical double expression — Spark's
    * double→long cast truncates while DuckDB's rounds, so neither cast
    * nor engine `round` appears in the quantization. */
  private def sqlQuant(x: String): String =
    s"CASE WHEN $x >= 0 THEN floor($x * 1000 + 0.5) ELSE ceil($x * 1000 - 0.5) END"

  val queries: Map[String, Q] = Map(
    // time-series resample + forward-fill over the hour grid
    "ts_gapfill" -> ((s, dir) =>
      TimeSeries.gapFillHourly(Tables.events(s, dir), maxUser = 8)),

    // OHLC downsampling — the metrics-pipeline resample: per
    // (event_type, hour), open/close are the first/last values in event
    // order, high/low/volume the extremes and sum, all in integer cents
    // (floor/ceil quantization — no engine round, no cast divergence).
    // open/close ride min_by/max_by ON A COMPOSITE ORDERING STRUCT
    // (ts, event_id), so the whole query is ONE two-phase aggregation
    // (SortAggregate — struct-ordered min_by/max_by partials fold
    // map-side), one shuffle on the group key,
    // no window sort anywhere — the shape that survives a 100 TB event
    // stream where a per-group ROW_NUMBER sort would shuffle and sort
    // the full table. The oracle derives first/last by ROW_NUMBER over
    // the same (ts, event_id) order — tie-free because event_id is
    // unique, so the two derivations are exactly equal.
    "ts_downsample" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"),
          col("ts"), col("event_id"),
          when(col("value") >= 0, floor(col("value") * 100 + 0.5))
            .otherwise(ceil(col("value") * 100 - 0.5))
            .cast("long").as("cents"))
      val ord = struct(col("ts"), col("event_id"))
      ev.groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n"),
          min_by(col("cents"), ord).as("open_cents"),
          max(col("cents")).as("high_cents"),
          min(col("cents")).as("low_cents"),
          max_by(col("cents"), ord).as("close_cents"),
          sum(col("cents")).as("vol_cents"))
        .orderBy("event_type", "hour")
    }),

    // co-occurrence graph → degree-oriented triangle count (broadcast-
    // adjacency edge-iterator; the partitioned wedge join is the
    // beyond-broadcast fallback, pinned equal in GraphSpec)
    "graph_triangles" -> ((s, dir) =>
      Graph.triangleCountAutoFromEvents(Tables.events(s, dir))),

    // Label-propagation communities over the purchase co-occurrence
    // graph (Graph.labelPropagation): 2 synchronous mode-label rounds,
    // per-round one N-vs-2m shuffle join + count agg + WindowGroupLimit
    // top-1 — the community summary (label, size, member checksum).
    "graph_communities" -> ((s, dir) => {
      val edges = Graph.coOccurrenceEdges(Tables.events(s, dir))
      Graph.labelPropagation(edges, 2)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("v")).as("member_checksum"))
        .orderBy("label")
    }),

    // Behavioral path mining: the 20 most frequent event-type TRIGRAM
    // paths across per-user ordered timelines — two lead() windows on
    // one user_id shuffle, a count aggregation, and a two-phase
    // TakeOrdered top-20 (the rank window runs on 20 rows, post-limit).
    "ts_path_trigrams" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val top = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("s1"))
        .withColumn("s2", lead(col("s1"), 1).over(w))
        .withColumn("s3", lead(col("s1"), 2).over(w))
        .where(col("s2").isNotNull && col("s3").isNotNull)
        .groupBy(col("s1"), col("s2"), col("s3"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))
        .limit(20)
      top.withColumn("rnk", row_number().over(
          Window.orderBy(col("n").desc, col("s1"), col("s2"), col("s3"))))
        .select(col("rnk"), col("s1"), col("s2"), col("s3"), col("n"))
        .orderBy("rnk")
    }),

    // Seasonality profile: per (event_type, hour-of-day) volume and
    // mean value — the diurnal baseline an anomaly alert is judged
    // against. One two-phase hash aggregation over 24×5 groups; means
    // in exact integer millicents (integral division — positive sums).
    "ts_seasonality" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_type"),
          hour(col("ts")).cast("int").as("hod"),
          when(col("value") >= 0, floor(col("value") * 100 + 0.5))
            .otherwise(ceil(col("value") * 100 - 0.5))
            .cast("long").as("cents"))
        .groupBy(col("event_type"), col("hod"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .withColumn("mean_millicents",
          expr("(sum_cents * 1000) div n"))
        .orderBy("event_type", "hod")
    }),

    // Outlier detection with NO floating point: flag events whose value
    // sits more than 2 standard deviations from their type's mean —
    // the z-score test cross-multiplied into pure integers,
    //   (x−μ)² > 4σ²  ⟺  (x·n − Σ)² > 4·(n·Σx² − Σ²),
    // so both engines agree exactly (no sqrt, no division anywhere).
    // One two-phase stats aggregation (n, Σ, Σx² in cents), the
    // per-type stats broadcast back onto the scan, the flag map-side.
    "ts_anomaly" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("event_id"), col("event_type"),
          when(col("value") >= 0, floor(col("value") * 100 + 0.5))
            .otherwise(ceil(col("value") * 100 - 0.5))
            .cast("decimal(38,0)").as("cents"))
      val stats = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("cents")).cast("decimal(38,0)").as("s"),
          sum(col("cents") * col("cents")).cast("decimal(38,0)").as("sq"))
      ev.join(broadcast(stats), "event_type")
        .where((col("cents") * col("n") - col("s")) *
               (col("cents") * col("n") - col("s")) >
          lit(4) * (col("n") * col("sq") - col("s") * col("s")))
        .select(col("event_id"), col("event_type"),
          col("cents").cast("bigint").as("cents"))
        .orderBy("event_id")
    }),

    // recall@5 of the IVF cell search against brute-force ground truth —
    // the accuracy/efficiency trade every ANN deployment must measure.
    // Both pipelines are the already-verified queries; the eval is a
    // per-query left-semi intersection count, so recall is hits/5 — an
    // identical IEEE division on both engines.
    // Ordered-funnel analysis (view -> click -> purchase): each stage's
    // completion is the user's FIRST qualifying event STRICTLY AFTER the
    // previous stage's completion — the product-analytics primitive.
    // Three stage aggregations, each shuffling only on user_id, each
    // input pre-filtered to one event type (filter reaches the scan);
    // lag totals stay in integer microseconds (exact cross-engine).
    "q_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val s1 = ev.where(col("event_type") === "view")
        .groupBy("user_id").agg(min(col("ts")).as("t1"))
      val s2 = ev.where(col("event_type") === "click")
        .join(s1, "user_id").where(col("ts") > col("t1"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("t2"), min(col("t1")).as("t1"))
      val s3 = ev.where(col("event_type") === "purchase")
        .join(s2.select(col("user_id"), col("t2")), "user_id")
        .where(col("ts") > col("t2"))
        .groupBy("user_id")
        .agg(min(col("ts")).as("t3"), min(col("t2")).as("t2"))
      s1.select(lit("1_view").as("stage"), col("user_id"), lit(0L).as("lag_us"))
        .unionByName(s2.select(lit("2_view_click").as("stage"), col("user_id"),
          (unix_micros(col("t2")) - unix_micros(col("t1"))).as("lag_us")))
        .unionByName(s3.select(lit("3_full_funnel").as("stage"), col("user_id"),
          (unix_micros(col("t3")) - unix_micros(col("t2"))).as("lag_us")))
        .groupBy("stage")
        .agg(count(lit(1)).as("users"), sum(col("lag_us")).as("total_lag_us"))
        .orderBy("stage")
    }),

    // Cohort retention matrix — the other product-analytics primitive
    // next to the funnel: cohort = first-signup week, retention = weeks
    // with a purchase at or after it, cell = users active at that
    // offset. Two pre-filtered scans (event_type reaches the parquet
    // scan), one shuffle on user_id each, a co-partitioned user_id
    // join, and a cohort-week-sized final aggregate. Week arithmetic
    // stays in whole days (both weeks are Mondays, the difference is an
    // exact multiple of 7) so the offset is integer-exact cross-engine.
    "q_cohort_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"))
      val cohort = ev.where(col("event_type") === "signup")
        .groupBy("user_id")
        .agg(date_trunc("week", min(col("ts"))).cast("date")
          .as("cohort_week"))
      val act = ev.where(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
      act.join(cohort, "user_id")
        .where(col("week") >= col("cohort_week"))
        .groupBy(col("cohort_week"),
          (datediff(col("week"), col("cohort_week")) / 7).cast("long")
            .as("week_offset"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_week", "week_offset")
    }),

    // Exact ground truth is MEMOIZED per (process, sfDir) — all three
    // recall audits evaluate against the same brute-force top-5, and an
    // exact-truth pass is an audit artifact computed once (Memo), not a
    // per-audit subexpression (round-8 verdict item 6). ann_cosine_topk
    // itself stays un-memoized: it IS the measured brute-force baseline.
    "ann_recall_eval" -> ((s, dir) => {
      val brute = graft.operators.Memo.df(s, dir, "ann_truth_top5") {
        ExtensionQueries.queries("ann_cosine_topk")(s, dir)
          .select(col("q_id"), col("vec_id"))
      }
      val ivf = ExtensionQueries.queries("ann_ivf_topk")(s, dir)
        .select(col("q_id"), col("vec_id"))
      val hits = brute.join(ivf, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      brute.select("q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("hits"), lit(0L)).as("hits"),
          (coalesce(col("hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    }),

    // Recall audit of the CDC-MAINTAINED path — the third maintained
    // serving state beside served/appended: the CDC-applied artifact
    // (live tombstone + re-add segments, folded at serve time) vs exact
    // brute force over the POST-APPLY corpus. Keeps recall measured
    // where it is most at risk: re-embedded vectors encoded under
    // codebooks trained before their drift.
    "ann_recall_eval_cdc" -> ((s, dir) => {
      import graft.operators.{AnnIndex, Similarity}
      val emb = AnnIndex.embeddings(s, dir)
      val post = emb.where(col("vec_id") % 13 =!= 0)
        .select(col("vec_id"),
          when(col("vec_id") % 9 === 0, transform(col("e"), x => -x))
            .otherwise(col("e")).as("e"))
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      val brute = graft.operators.Memo.df(s, dir, "ann_truth_top5_cdc") {
        Similarity.bruteForceTopK(
            queries.select(col("q_id"), col("qe").as("q_emb")),
            post.select(col("vec_id"), col("e").as("embedding")), 5)
          .select(col("q_id"), col("vec_id"))
      }
      val served = AnnIndex.serve(s, AnnIndex.cdcAppliedIndexDir(s, dir),
          queries, post)
        .select(col("q_id"), col("vec_id"))
      val hits = brute.join(served, Seq("q_id", "vec_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
      brute.select("q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("hits"), lit(0L)).as("hits"),
          (coalesce(col("hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("q_id")
    }),

    // Recall audit of the MAINTAINED-index serving paths (round-8
    // item 6): recall@5 vs exact brute force for (a) the served IVFADC
    // artifact and (b) a post-append maintained state — two appended
    // segments encoded under FROZEN base codebooks, the state a
    // long-running ingest stream reaches (stream ≡ batch appends,
    // AnnIndexSpec) — so codebook-drift recall stays measured, not
    // assumed, as segments accumulate. Oracle: each tier's existing
    // oracle SQL composed as subqueries + the same recall arithmetic.
    "ann_recall_eval_served" -> ((s, dir) => {
      import graft.operators.AnnIndex
      val brute = graft.operators.Memo.df(s, dir, "ann_truth_top5") {
        ExtensionQueries.queries("ann_cosine_topk")(s, dir)
          .select(col("q_id"), col("vec_id"))
      }
      val served = CurationQueries.queries("ann_ivf_pq_served")(s, dir)
        .select(col("q_id"), col("vec_id"))
      val emb = AnnIndex.embeddings(s, dir)
      val queries = emb.where(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("e").as("qe"))
      val appended = AnnIndex
        .serve(s, AnnIndex.appendedIndexDir(s, dir), queries, emb)
        .select(col("q_id"), col("vec_id"))
      val tiers = served.withColumn("tier", lit("served"))
        .unionByName(appended.withColumn("tier", lit("appended")))
      val hits = brute.join(tiers, Seq("q_id", "vec_id"))
        .groupBy("tier", "q_id").agg(count(lit(1)).as("hits"))
      val tierNames = { import s.implicits._; Seq("served", "appended").toDF("tier") }
      brute.select("q_id").distinct()
        .crossJoin(tierNames)
        .join(hits, Seq("tier", "q_id"), "left")
        .select(col("tier"), col("q_id"),
          coalesce(col("hits"), lit(0L)).as("hits"),
          (coalesce(col("hits"), lit(0L)) / lit(5.0)).as("recall"))
        .orderBy("tier", "q_id")
    }),

    // mergeable HLL sketches: per-(type, day) sketches built map-side,
    // merged across days with hll_union_agg — the re-aggregatable
    // distinct-count cube pattern (store one sketch per cell, answer any
    // rollup by union, never re-scan). The estimate is asserted within
    // 5% of exact — vacuously tight here (sparse-mode HLL is exact at
    // these cardinalities) but the bound, not the estimate, is the
    // cross-engine-stable output.
    "q_sketch_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = daily.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      exact.join(merged, "event_type")
        .select(col("event_type"), col("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            col("n_exact").cast("double") * 0.05).as("within_5pct"))
        .orderBy("event_type")
    }),

    // linear interpolation across the hour grid (the gap-fill's smooth
    // sibling) — the interpolation expression is mirrored verbatim in
    // the oracle so both engines run the identical IEEE sequence
    "ts_interpolate" -> ((s, dir) =>
      TimeSeries.interpolateHourly(Tables.events(s, dir), maxUser = 8)),

    // gaps-and-islands: merge per-user activity into islands (>45 min
    // silence splits); lag-flag + running-sum island ids, all-integer
    // aggregate — the session-merge shape without session_window
    "ts_islands" -> ((s, dir) =>
      TimeSeries.activityIslands(Tables.events(s, dir), gapMin = 45)),

    // GROUPING()/grouping-id disambiguation: which NULLs are "rolled
    // up" vs genuine — the id arithmetic (g1*2+g2) is portable
    "q_grouping_id" -> ((s, dir) => {
      Tables.table(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
          COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""")
    }),

    // corpus snapshot diff — the dataset-versioning audit between two
    // crawls/ingests: epoch B is derived from A by arithmetic plan
    // (drop %13, edit %10, add a fresh doc per %17), the diff is ONE
    // full-outer join on doc_id with a text compare — added / removed /
    // changed / same counts + id checksums. At 100 TB this is the
    // epoch-promotion gate (expected-churn bounds) run before a new
    // snapshot replaces production.
    "corpus_diff" -> ((s, dir) => {
      val a = Tables.table(s, dir, "documents").select(col("doc_id"), col("text"))
      val maxId = lit(1000000L)
      val bKept = a.where(col("doc_id") % 13 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 10 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val bNew = a.where(col("doc_id") % 17 === 0)
        .select((col("doc_id") + maxId).as("doc_id"), col("text"))
      val b = bKept.unionAll(bNew)
      a.select(col("doc_id"), col("text").as("text_a"))
        .join(b.select(col("doc_id"), col("text").as("text_b")),
          Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          when(col("text_b").isNull, "removed")
            .when(col("text_a").isNull, "added")
            .when(col("text_a") =!= col("text_b"), "changed")
            .otherwise("same").as("status"))
        .groupBy("status")
        .agg(count(lit(1)).as("n"), sum(col("doc_id")).as("id_checksum"))
        .orderBy("status")
    }),

    // key-skew report — the pre-join diagnostic that decides whether a
    // key needs salting/AQE-skew handling: per-key counts in one
    // aggregate, then exact min/p50/max over the count distribution
    // (p50 positions land on .0/.5 so midpoint arithmetic is exact in
    // double on both engines) and the max/p50 skew ratio.
    "data_skew_report" -> ((s, dir) => {
      val cnt = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).as("cnt"))
      cnt.agg(
          count(lit(1)).as("n_keys"),
          min(col("cnt")).as("min_cnt"),
          expr("percentile(cnt, 0.5)").as("p50_cnt"),
          max(col("cnt")).as("max_cnt"))
        .select(col("n_keys"), col("min_cnt"), col("p50_cnt"), col("max_cnt"),
          round(col("max_cnt") / col("p50_cnt"), 6).as("skew_ratio"))
    }),

    // mergeable quantile sketch beside the HLL cube: percentile_approx
    // is the GK-style summary whose partials merge across partitions /
    // cells — the scalable quantile path where exact percentile means a
    // full sort per group. The rank guarantee (ε = 1/accuracy = 0.001)
    // is the cross-engine-stable claim: the approx median must sit
    // between the exact 0.45 and 0.55 quantiles, with ~49× headroom.
    "q_sketch_quantile" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      ev.groupBy("event_type").agg(
          percentile_approx(col("value"), lit(0.5), lit(1000)).as("ap"),
          expr("percentile(value, 0.45)").as("lo"),
          expr("percentile(value, 0.55)").as("hi"),
          count(lit(1)).as("n"))
        .select(col("event_type"), col("n"),
          (col("ap") >= col("lo") && col("ap") <= col("hi"))
            .as("within_rank_bound"))
        .orderBy("event_type")
    }),

    // URL canonicalization dedup: four planted spellings of every
    // resource (host/scheme case, :443 default port, utm_ tracking key,
    // param order, fragment, trailing slash) collapse to ONE canonical
    // key — pure map-side regexp/HOF column work + one hash aggregate.
    // The oracle knows the planted group arithmetic AND the exact
    // canonical string, so a canonicalizer that over- or under-merges
    // fails on rows, strings, or counts.
    "dedup_url" -> ((s, dir) => {
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), expr("doc_id DIV 4").as("base"),
          (col("doc_id") % 4).as("v"))
      val url = when(col("v") === 0,
          concat(lit("https://Example.COM/page/"), col("base"), lit("?b=2&a=1#frag")))
        .when(col("v") === 1,
          concat(lit("https://example.com:443/page/"), col("base"), lit("?a=1&b=2")))
        .when(col("v") === 2,
          concat(lit("HTTPS://example.com/page/"), col("base"), lit("?a=1&utm_source=x&b=2")))
        .otherwise(
          concat(lit("https://example.com/page/"), col("base"), lit("/?a=1&b=2")))
      d.withColumn("canon_url", graft.operators.UrlCanon.canonicalize(url))
        .groupBy("canon_url")
        .agg(count(lit(1)).as("n_variants"), min(col("doc_id")).as("keeper"))
        .orderBy("keeper")
    }),

    // integer-exact Gram matrix over mx1000-quantized embeddings: each
    // row emits its upper-triangle outer product MAP-SIDE via nested
    // array transforms (no self-join — at 100 TB the d²/2 per-row expand
    // into a d²/2-group partial aggregate is the classic one-shuffle
    // X'X build; d=64 → 2080 groups), then one hash aggregate. BIGINT
    // products/sums → bit-exact oracle.
    "emb_gram_topk" -> ((s, dir) => {
      val emb = Tables.fanout(Tables.table(s, dir, "embeddings"))
      val quant = emb.select(expr(
        s"""transform(embedding, x -> CAST(${sqlQuant("CAST(x AS DOUBLE)")}
            AS BIGINT))""").as("q"))
      val tri = quant.select(explode(expr(
        """flatten(transform(q, (xi, i) ->
             transform(slice(q, i + 1, size(q) - i), (xj, j) ->
               struct(i AS i, i + j AS j, xi * xj AS p))))""")).as("c"))
      tri.groupBy(col("c.i").as("i"), col("c.j").as("j"))
        .agg(sum(col("c.p")).as("gram"))
        .orderBy(abs(col("gram")).desc, col("i"), col("j"))
        .limit(20)
    })
  )

  private def gapfillOracle: String = """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,2))) AS rev
      FROM events WHERE user_id < 8 GROUP BY 1, 2),
    span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
             FROM hourly GROUP BY 1),
    grid AS (SELECT user_id,
               unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
             FROM span),
    j AS (SELECT g.user_id, g.hour, h.n, h.rev
          FROM grid g LEFT JOIN hourly h USING (user_id, hour))
    SELECT user_id, hour, COALESCE(n, 0) AS n,
      CAST(last_value(rev IGNORE NULLS) OVER (
        PARTITION BY user_id ORDER BY hour
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        AS rev_filled,
      (n IS NULL) AS is_gap
    FROM j ORDER BY user_id, hour"""

  private def trianglesOracle: String = """
    WITH acts AS (
      SELECT DISTINCT date_trunc('hour', ts) AS hb, user_id
      FROM events WHERE event_type = 'purchase'),
    edges AS (
      SELECT DISTINCT l.user_id AS a, r.user_id AS b
      FROM acts l JOIN acts r USING (hb)
      WHERE l.user_id < r.user_id)
    SELECT COUNT(*) AS n_triangles,
      CAST(SUM(e1.a + e1.b + e2.b) AS BIGINT) AS node_checksum
    FROM edges e1
    JOIN edges e2 ON e2.a = e1.b
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b"""

  private def recallOracle: String = s"""
    WITH emb AS (
      SELECT vec_id, label,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
      FROM embeddings),
    q AS (SELECT vec_id AS q_id, embedding AS q_emb FROM emb
          WHERE vec_id % 100 = 0),
    brute AS (
      SELECT q_id, vec_id FROM (
        SELECT q.q_id, e.vec_id,
          ROW_NUMBER() OVER (PARTITION BY q.q_id
            ORDER BY ROUND(${ExtensionQueries.sqlCos("q.q_emb", "e.embedding")}, 6)
              DESC, e.vec_id) AS rnk
        FROM q JOIN emb e ON e.vec_id <> q.q_id)
      WHERE rnk <= 5),
    flat AS (
      SELECT label, generate_subscripts(embedding, 1) AS i,
             unnest(embedding) AS x
      FROM emb),
    cent AS (
      SELECT label AS c_label, list(cx ORDER BY i) AS centroid FROM (
        SELECT label, i,
          CAST(SUM(CAST(x AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS cx
        FROM flat GROUP BY label, i) GROUP BY label),
    routed AS (
      SELECT q_id, q_emb, c_label AS best_label FROM (
        SELECT q.q_id, q.q_emb, c.c_label,
          ROW_NUMBER() OVER (PARTITION BY q.q_id
            ORDER BY ROUND(${ExtensionQueries.sqlCos("q.q_emb", "c.centroid")}, 6)
              DESC, c.c_label) AS crn
        FROM q CROSS JOIN cent c) WHERE crn = 1),
    ivf AS (
      SELECT q_id, vec_id FROM (
        SELECT r.q_id, e.vec_id,
          ROW_NUMBER() OVER (PARTITION BY r.q_id
            ORDER BY ROUND(${ExtensionQueries.sqlCos("r.q_emb", "e.embedding")}, 6)
              DESC, e.vec_id) AS rnk
        FROM routed r JOIN emb e
          ON e.label = r.best_label AND e.vec_id <> r.q_id)
      WHERE rnk <= 5),
    hits AS (
      SELECT b.q_id, COUNT(*) AS hits FROM brute b
      WHERE EXISTS (SELECT 1 FROM ivf i
                    WHERE i.q_id = b.q_id AND i.vec_id = b.vec_id)
      GROUP BY b.q_id)
    SELECT q.q_id, COALESCE(h.hits, 0) AS hits,
      CAST(COALESCE(h.hits, 0) AS DOUBLE) / CAST(5 AS DOUBLE) AS recall
    FROM (SELECT DISTINCT q_id FROM brute) q
    LEFT JOIN hits h USING (q_id) ORDER BY q_id"""

  private def gramOracle: String = s"""
    WITH quant AS (
      SELECT vec_id,
        list_transform(embedding,
          x -> CAST(${sqlQuant("CAST(x AS DOUBLE)")} AS BIGINT)) AS q
      FROM embeddings),
    flat AS (
      SELECT vec_id, generate_subscripts(q, 1) - 1 AS i, unnest(q) AS x
      FROM quant),
    gram AS (
      SELECT a.i AS i, b.i AS j, CAST(SUM(a.x * b.x) AS BIGINT) AS gram
      FROM flat a JOIN flat b ON a.vec_id = b.vec_id AND a.i <= b.i
      GROUP BY a.i, b.i)
    SELECT i, j, gram FROM gram
    ORDER BY abs(gram) DESC, i, j LIMIT 20"""

  /** Each tier's own oracle SQL composed as a subquery (the maintained
    * paths' oracles already reproduce base training + frozen-codebook
    * encoding end-to-end), then the shared recall@5 arithmetic. */
  private lazy val recallServedOracle: String = s"""
    WITH brute AS (
      SELECT q_id, vec_id FROM (${ExtensionQueries.oracles("ann_cosine_topk")})),
    served AS (
      SELECT q_id, vec_id FROM (${CurationQueries.oracles("ann_ivf_pq_served")})),
    appended AS (
      SELECT q_id, vec_id FROM (${CurationQueries.oracles("stream_ann_index")})),
    tiers AS (
      SELECT 'served' AS tier, q_id, vec_id FROM served
      UNION ALL SELECT 'appended', q_id, vec_id FROM appended),
    hits AS (
      SELECT t.tier, b.q_id, COUNT(*) AS hits
      FROM brute b JOIN tiers t ON t.q_id = b.q_id AND t.vec_id = b.vec_id
      GROUP BY 1, 2),
    grid AS (
      SELECT tier, q_id FROM (SELECT DISTINCT q_id FROM brute)
      CROSS JOIN (SELECT unnest(['served', 'appended']) AS tier))
    SELECT g.tier, g.q_id, COALESCE(h.hits, 0) AS hits,
           COALESCE(h.hits, 0) / 5.0 AS recall
    FROM grid g LEFT JOIN hits h ON h.tier = g.tier AND h.q_id = g.q_id
    ORDER BY 1, 2"""

  /** Recall of the CDC-served tier vs exact brute force over the
    * POST-APPLY corpus — served rows from the stream_ann_index_cdc
    * oracle (the CDC apply's end-to-end training+encode reproduction),
    * brute rows from the applied corpus (deletes removed, re-embeds
    * negated — negation of a double is exact in both engines). */
  private lazy val recallCdcOracle: String = s"""
    WITH pemb AS (
      SELECT vec_id, CASE WHEN vec_id % 9 = 0
          THEN list_transform(embedding, x -> -CAST(x AS DOUBLE))
          ELSE list_transform(embedding, x -> CAST(x AS DOUBLE)) END AS e
      FROM embeddings WHERE vec_id % 13 <> 0),
    q AS (SELECT vec_id AS q_id,
        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
      FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.q_id, e.vec_id,
        ROUND(${ExtensionQueries.sqlCos("q.qe", "e.e")}, 6) AS cos
      FROM q JOIN pemb e ON e.vec_id <> q.q_id),
    brute AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
          ROW_NUMBER() OVER (PARTITION BY q_id
            ORDER BY cos DESC, vec_id) AS rnk
        FROM scored) WHERE rnk <= 5),
    served AS (
      SELECT q_id, vec_id
      FROM (${CurationQueries.oracles("stream_ann_index_cdc")})),
    hits AS (
      SELECT b.q_id, COUNT(*) AS hits
      FROM brute b JOIN served s ON s.q_id = b.q_id AND s.vec_id = b.vec_id
      GROUP BY 1)
    SELECT g.q_id, COALESCE(h.hits, 0) AS hits,
           COALESCE(h.hits, 0) / 5.0 AS recall
    FROM (SELECT DISTINCT q_id FROM brute) g
    LEFT JOIN hits h ON h.q_id = g.q_id
    ORDER BY g.q_id"""

  val oracles: Map[String, String] = Map(
    "ts_gapfill" -> gapfillOracle,
    "ts_downsample" -> """
       WITH q AS (
         SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
           CAST(CASE WHEN value >= 0 THEN floor(value * 100 + 0.5)
                     ELSE ceil(value * 100 - 0.5) END AS BIGINT) AS cents
         FROM events),
       rk AS (
         SELECT *,
           ROW_NUMBER() OVER (PARTITION BY event_type, hour
             ORDER BY ts, event_id) AS ra,
           ROW_NUMBER() OVER (PARTITION BY event_type, hour
             ORDER BY ts DESC, event_id DESC) AS rd
         FROM q)
       SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n,
         MAX(CASE WHEN ra = 1 THEN cents END) AS open_cents,
         MAX(cents) AS high_cents, MIN(cents) AS low_cents,
         MAX(CASE WHEN rd = 1 THEN cents END) AS close_cents,
         CAST(SUM(cents) AS BIGINT) AS vol_cents
       FROM rk GROUP BY 1, 2 ORDER BY event_type, hour""",
    "graph_triangles" -> trianglesOracle,
    // the same 2 unrolled mode-label rounds over the same edge CTE
    "graph_communities" -> """
      WITH acts AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hb, user_id
        FROM events WHERE event_type = 'purchase'),
      edges AS (
        SELECT DISTINCT l.user_id AS a, r.user_id AS b
        FROM acts l JOIN acts r USING (hb)
        WHERE l.user_id < r.user_id),
      adj AS (SELECT a AS v, b AS nbr FROM edges
              UNION ALL SELECT b, a FROM edges),
      l0 AS (SELECT DISTINCT v, v AS label FROM adj),
      n1 AS (SELECT adj.v, l0.label, COUNT(*) AS cnt
             FROM adj JOIN l0 ON l0.v = adj.nbr GROUP BY 1, 2),
      l1 AS (SELECT v, label FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v
                 ORDER BY cnt DESC, label) AS rn FROM n1) WHERE rn = 1),
      n2 AS (SELECT adj.v, l1.label, COUNT(*) AS cnt
             FROM adj JOIN l1 ON l1.v = adj.nbr GROUP BY 1, 2),
      l2 AS (SELECT v, label FROM (
               SELECT *, ROW_NUMBER() OVER (PARTITION BY v
                 ORDER BY cnt DESC, label) AS rn FROM n2) WHERE rn = 1)
      SELECT label, CAST(COUNT(*) AS BIGINT) AS n_members,
        CAST(SUM(v) AS BIGINT) AS member_checksum
      FROM l2 GROUP BY 1 ORDER BY label""",
    "ts_seasonality" -> """
      WITH ev AS (
        SELECT event_type, CAST(hour(ts) AS INTEGER) AS hod,
          CAST(CASE WHEN value >= 0 THEN floor(value * 100 + 0.5)
                    ELSE ceil(value * 100 - 0.5) END AS BIGINT) AS cents
        FROM events)
      SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(cents) AS BIGINT) AS sum_cents,
        (CAST(SUM(cents) AS BIGINT) * 1000) // COUNT(*) AS mean_millicents
      FROM ev GROUP BY 1, 2 ORDER BY event_type, hod""",
    "ts_anomaly" -> """
      WITH ev AS (
        SELECT event_id, event_type,
          CAST(CASE WHEN value >= 0 THEN floor(value * 100 + 0.5)
                    ELSE ceil(value * 100 - 0.5) END AS HUGEINT) AS cents
        FROM events),
      st AS (
        SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
          SUM(cents) AS s, SUM(cents * cents) AS sq
        FROM ev GROUP BY 1)
      SELECT e.event_id, e.event_type, CAST(e.cents AS BIGINT) AS cents
      FROM ev e JOIN st USING (event_type)
      WHERE (e.cents * n - s) * (e.cents * n - s)
              > 4 * (n * sq - s * s)
      ORDER BY event_id""",
    "ts_path_trigrams" -> """
      WITH tri AS (
        SELECT event_type AS s1,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS s2,
          lead(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS s3
        FROM events),
      c AS (SELECT s1, s2, s3, CAST(COUNT(*) AS BIGINT) AS n
            FROM tri WHERE s2 IS NOT NULL AND s3 IS NOT NULL
            GROUP BY 1, 2, 3),
      top AS (SELECT * FROM c ORDER BY n DESC, s1, s2, s3 LIMIT 20)
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, s1, s2, s3)
          AS INTEGER) AS rnk,
        s1, s2, s3, n
      FROM top ORDER BY rnk""",
    "ann_recall_eval" -> recallOracle,
    "ann_recall_eval_served" -> recallServedOracle,
    "ann_recall_eval_cdc" -> recallCdcOracle,
    // the ANN serving loop is stateless per query ⇒ stream ≡ batch:
    // the oracle is the served tier's batch SQL verbatim (registered
    // here, not in ExtensionQueries, so the oracle maps keep their
    // acyclic init order: Analytics → Curation → Extension)
    "stream_ann_serve" -> CurationQueries.oracles("ann_ivf_pq_served"),
    // trunc(min(ts)) ≡ min(trunc) (order-preserving); offsets in whole
    // days // 7 — Monday-based date_trunc('week') in both engines
    "q_cohort_retention" -> """
      WITH cohort AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE)
          AS cohort_week
        FROM events WHERE event_type = 'signup' GROUP BY 1),
      act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE)
          AS week
        FROM events WHERE event_type = 'purchase'),
      j AS (
        SELECT c.cohort_week,
          CAST(date_diff('day', c.cohort_week, a.week) // 7 AS BIGINT)
            AS week_offset
        FROM cohort c JOIN act a USING (user_id)
        WHERE a.week >= c.cohort_week)
      SELECT cohort_week, week_offset, COUNT(*) AS n_users
      FROM j GROUP BY 1, 2 ORDER BY 1, 2""",

    "q_funnel" -> """
      WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY 1),
      s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2, MIN(s1.t1) AS t1
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1 GROUP BY 1),
      s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3, MIN(s2.t2) AS t2
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      SELECT stage, COUNT(*) AS users,
             CAST(SUM(lag_us) AS BIGINT) AS total_lag_us
      FROM (
        SELECT '1_view' AS stage, user_id, 0 AS lag_us FROM s1
        UNION ALL
        SELECT '2_view_click', user_id, epoch_us(t2) - epoch_us(t1) FROM s2
        UNION ALL
        SELECT '3_full_funnel', user_id, epoch_us(t3) - epoch_us(t2) FROM s3)
      GROUP BY 1 ORDER BY stage""",
    "q_sketch_union" -> """
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact,
        TRUE AS within_5pct
      FROM events GROUP BY event_type ORDER BY event_type""",
    "emb_gram_topk" -> gramOracle,
    "ts_interpolate" -> """
      WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour,
          CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM events WHERE user_id < 8 GROUP BY 1, 2),
      span AS (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
               FROM hourly GROUP BY 1),
      grid AS (SELECT user_id,
                 unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
               FROM span),
      j AS (SELECT g.user_id, g.hour, h.rev
            FROM grid g LEFT JOIN hourly h USING (user_id, hour)),
      f AS (SELECT user_id, hour, rev,
        last_value(rev IGNORE NULLS) OVER back AS prev_v,
        last_value(CASE WHEN rev IS NOT NULL THEN hour END IGNORE NULLS)
          OVER back AS prev_h,
        first_value(rev IGNORE NULLS) OVER fwd AS next_v,
        first_value(CASE WHEN rev IS NOT NULL THEN hour END IGNORE NULLS)
          OVER fwd AS next_h
        FROM j
        WINDOW back AS (PARTITION BY user_id ORDER BY hour
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        fwd AS (PARTITION BY user_id ORDER BY hour
          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, hour,
        CASE WHEN rev IS NOT NULL THEN rev
             WHEN next_v IS NULL THEN prev_v
             ELSE prev_v + (next_v - prev_v) *
               CAST(epoch_us(hour) - epoch_us(prev_h) AS DOUBLE) /
               CAST(epoch_us(next_h) - epoch_us(prev_h) AS DOUBLE)
        END AS rev_interp,
        (rev IS NULL) AS is_gap
      FROM f ORDER BY user_id, hour""",

    "ts_islands" -> """
      WITH marked AS (
        SELECT user_id, ts,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                    > CAST(45 AS BIGINT) * 60 * 1000000
               THEN 1 ELSE 0 END AS new_island
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      ids AS (
        SELECT user_id, ts,
          SUM(new_island) OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked),
      spans AS (
        SELECT user_id, island,
          (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS span_s
        FROM ids GROUP BY user_id, island)
      SELECT user_id, COUNT(*) AS n_islands,
        CAST(SUM(span_s) AS BIGINT) AS covered_s,
        CAST(MAX(span_s) AS BIGINT) AS longest_s
      FROM spans GROUP BY user_id ORDER BY user_id""",

    "q_grouping_id" -> """
      SELECT o_orderstatus, o_orderpriority,
        GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS gid,
        COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      FROM orders
      GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                              (o_orderstatus), ())
      ORDER BY gid, o_orderstatus NULLS LAST, o_orderpriority NULLS LAST""",

    "corpus_diff" -> """
      WITH a AS (SELECT doc_id, text FROM documents),
      b AS (
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN text || ' v2' ELSE text END AS text
        FROM a WHERE doc_id % 13 <> 0
        UNION ALL
        SELECT doc_id + 1000000, text FROM a WHERE doc_id % 17 = 0),
      d AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
          CASE WHEN b.doc_id IS NULL THEN 'removed'
               WHEN a.doc_id IS NULL THEN 'added'
               WHEN a.text <> b.text THEN 'changed'
               ELSE 'same' END AS status
        FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
      SELECT status, COUNT(*) AS n,
        CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      FROM d GROUP BY status ORDER BY status""",

    "data_skew_report" -> """
      WITH cnt AS (
        SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id)
      SELECT COUNT(*) AS n_keys, MIN(cnt) AS min_cnt,
        quantile_cont(cnt, 0.5) AS p50_cnt, MAX(cnt) AS max_cnt,
        ROUND(MAX(cnt) / quantile_cont(cnt, 0.5), 6) AS skew_ratio
      FROM cnt""",

    "q_sketch_quantile" -> """
      SELECT event_type, COUNT(*) AS n, TRUE AS within_rank_bound
      FROM events GROUP BY event_type ORDER BY event_type""",
    // the planted-group arithmetic: every base has exactly its residue
    // class of variants, and the canonical string is fully determined
    "dedup_url" -> """
      SELECT 'https://example.com/page/' || CAST(doc_id // 4 AS VARCHAR)
          || '?a=1&b=2' AS canon_url,
        COUNT(*) AS n_variants, MIN(doc_id) AS keeper
      FROM documents GROUP BY doc_id // 4 ORDER BY keeper"""
  )
}
