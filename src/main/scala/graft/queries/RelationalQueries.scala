package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, BloomJoin, IncrementalAgg, SaltedJoin}

/** General relational engine surface (SURVEY.md §2.6 absence-list
  * categories, implemented Spark-first): joins (broadcast/semi/anti/as-of/
  * interval), aggregation (hash, rollup, cube, distinct), window functions,
  * sorts/top-k, set operations, scalar function families (string/date/
  * JSON). Float aggregates go through DECIMAL so results are
  * order-independent and engine-identical; every query orders by a unique
  * key.
  */
object RelationalQueries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") graft.sources.Tables.events(s, dir)
    else s.read.parquet(s"$dir/$name.parquet")

  val queries: Map[String, Q] = Map(
    // Hash aggregation with partial/map-side combine (TPC-H Q1 shape).
    "q1_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .where($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount")).cast("decimal(28,10)"))
            .cast("decimal(38,4)").cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    // 3-way join: broadcast dim (customer) → orders → lineitem, top-10
    // revenue (TPC-H Q3 shape). At scale: customer-filter broadcasts,
    // orders⋈lineitem shuffles on orderkey.
    "q3_join_topk" -> ((s, dir) => {
      import s.implicits._
      val cust = t(s, dir, "customer").where($"c_mktsegment" === "BUILDING")
      val ord = t(s, dir, "orders")
        .where($"o_orderdate" < lit("1995-03-15").cast("timestamp"))
      val li = t(s, dir, "lineitem")
        .where($"l_shipdate" > lit("1995-03-15").cast("timestamp"))
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(broadcast(cust), $"o_custkey" === $"c_custkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(28,10)")).cast("decimal(38,4)")
          .cast("double").as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    // 6-way join (TPC-H Q5 shape): region→nation broadcast down the
    // chain; customer⋈orders⋈lineitem shuffle on their keys; the
    // supplier join carries the c_nationkey = s_nationkey "local
    // supplier" theta on top of l_suppkey. Catalyst reorders + AQE picks
    // broadcast for every dim — the canonical multi-join planner test.
    "q_multiway_join" -> ((s, dir) => {
      import s.implicits._
      val asia = t(s, dir, "region").where($"r_name" === "ASIA")
      val nat = t(s, dir, "nation")
        .join(broadcast(asia), $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      val cust = t(s, dir, "customer")
      val ord = t(s, dir, "orders")
        .where($"o_orderdate" >= lit("1996-01-01").cast("timestamp") &&
          $"o_orderdate" < lit("1998-01-01").cast("timestamp"))
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(sup, $"l_suppkey" === $"s_suppkey" &&
          $"c_nationkey" === $"s_nationkey")
        .join(broadcast(nat), $"s_nationkey" === $"n_nationkey")
        .groupBy($"n_name")
        .agg(sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .cast("decimal(28,10)")).cast("decimal(38,4)")
          .cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"n_name")
    }),

    // Left-semi join (EXISTS).
    "q_join_semi" -> ((s, dir) => {
      import s.implicits._
      val bigLines = t(s, dir, "lineitem").where($"l_quantity" > 45)
        .select($"l_orderkey".as("o_orderkey"))
      t(s, dir, "orders").join(bigLines, Seq("o_orderkey"), "left_semi")
        .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus")
    }),

    // Left-anti join (NOT EXISTS): customers with no urgent order.
    "q_join_anti" -> ((s, dir) => {
      import s.implicits._
      val urgent = t(s, dir, "orders")
        .where($"o_orderpriority" === "1-URGENT")
        .select($"o_custkey".as("c_custkey"))
      t(s, dir, "customer").join(urgent, Seq("c_custkey"), "left_anti")
        .select($"c_custkey", $"c_mktsegment")
        .orderBy($"c_custkey")
    }),

    // Full-outer join: machinery customers vs per-customer order counts —
    // unmatched rows survive on both sides (name-only and count-only).
    "q_join_full_outer" -> ((s, dir) => {
      import s.implicits._
      val mach = t(s, dir, "customer")
        .where($"c_mktsegment" === "MACHINERY")
        .select($"c_custkey".as("k"), $"c_name")
      val bought = t(s, dir, "orders")
        .groupBy($"o_custkey".as("k")).agg(count(lit(1)).as("n_orders"))
      mach.join(bought, Seq("k"), "full_outer")
        .select($"k", $"c_name", $"n_orders")
        .orderBy($"k")
    }),

    // Skew-safe salted equi-join (SaltedJoin operator): semantics are the
    // plain join — that's the oracle — while a hot user_id spreads over 8
    // reducers. The deterministic per-row salt keys on event_id.
    "q_salted_join" -> ((s, dir) => {
      import s.implicits._
      val fact = t(s, dir, "events").select($"event_id", $"user_id", $"value")
      val dim = t(s, dir, "customer")
        .select($"c_custkey".as("user_id"), $"c_mktsegment")
      SaltedJoin.join(fact, dim, "user_id", 8, pmod($"event_id", lit(8)))
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy($"c_mktsegment")
    }),

    // Ranking window: top-3 orders per customer by price.
    "q_window_rank" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice".desc, $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("rnk", row_number().over(w))
        .where($"rnk" <= 3)
        .select($"o_custkey", $"o_orderkey", $"rnk")
        .orderBy($"o_custkey", $"rnk")
    }),

    // Analytic window: running revenue per customer (frame-exact DECIMAL
    // so segment-tree vs streaming accumulation can't differ).
    "q_window_running" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .withColumn("running_spend",
          sum($"o_totalprice".cast("decimal(18,2)")).over(w).cast("double"))
        .select($"o_custkey", $"o_orderkey", $"running_spend")
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Lag/lead analytic: gap in days since the customer's previous order.
    "q_window_lag" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
      t(s, dir, "orders")
        .withColumn("prev_date", lag($"o_orderdate", 1).over(w))
        .select($"o_custkey", $"o_orderkey",
          datediff($"o_orderdate", $"prev_date").as("gap_days"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Explicit window FRAMES: a bounded sliding ROWS frame and a RANGE
    // frame (peers-inclusive running sum — ties share a value, which a
    // ROWS frame would split). DECIMAL inside, double out.
    "q_window_frames" -> ((s, dir) => {
      import s.implicits._
      val rows3 = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
        .rowsBetween(-2, Window.currentRow)
      val rangePeers = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          sum($"o_totalprice".cast("decimal(18,2)")).over(rows3)
            .cast("double").as("sliding3"),
          sum($"o_totalprice".cast("decimal(18,2)")).over(rangePeers)
            .cast("double").as("range_running"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Distribution window family: ntile / percent_rank / cume_dist over
    // a tie-free ordering (unique price per customer at every SF).
    "q_window_dist" -> ((s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_totalprice", $"o_orderkey")
      t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey",
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // ROLLUP aggregation (grouping-set family).
    "q_rollup" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .rollup($"l_returnflag", $"l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("qty"))
        .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
    }),

    // CUBE aggregation.
    "q_cube" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"))
        .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
    }),

    // GROUPING SETS (SQL surface; rollup/cube cover the API surface).
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST,
                 o_orderpriority ASC NULLS FIRST""")
    }),

    // Exact interpolated percentiles per group.
    "q_percentile" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(
          round(percentile($"o_totalprice", lit(0.5)), 6).as("p50"),
          round(percentile($"o_totalprice", lit(0.9)), 6).as("p90"))
        .orderBy($"o_orderstatus")
    }),

    // Sessionization: session_window (30-min gap) per user — the batch
    // form of the streaming session-window operator.
    "q_sessionize" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes"))
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("session_value"))
        .select($"user_id", $"session_window.start".as("session_start"),
          $"n_events", $"session_value")
        .orderBy($"user_id", $"session_start")
    }),

    // Approximate distinct (HLL sketch) — how 100 TB distinct-counts
    // actually run. Oracle-checkable form: emit the exact count plus a
    // boolean asserting the sketch landed within 5% of it; DuckDB's oracle
    // asserts the same exact count and `TRUE`, so the sketch's accuracy is
    // genuinely exercised by the hash compare instead of being rows-only.
    "q_approx_distinct" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(approx_count_distinct($"user_id", 0.02).as("approx_users"),
          countDistinct($"user_id").as("exact_users"))
        .select($"event_type", $"exact_users",
          (abs($"approx_users" - $"exact_users") <=
            $"exact_users" * 0.05).as("approx_ok"))
        .orderBy($"event_type")
    }),

    // Set operations: one query exercising UNION/INTERSECT/EXCEPT.
    "q_setops" -> ((s, dir) => {
      import s.implicits._
      val buyers = t(s, dir, "orders").select($"o_custkey".as("k")).distinct()
      val building = t(s, dir, "customer")
        .where($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      val both = building.intersect(buyers).withColumn("tag", lit("building_buyer"))
      val dormant = building.except(buyers).withColumn("tag", lit("building_dormant"))
      both.unionByName(dormant).orderBy($"tag", $"k")
    }),

    // Multiset set ops: INTERSECT ALL / EXCEPT ALL on part keys.
    "q_setops_all" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select($"l_partkey".as("k"))
      val cheap = t(s, dir, "lineitem")
        .where($"l_extendedprice" < 5000).select($"l_partkey".as("k"))
      val both = li.intersectAll(cheap).groupBy($"k")
        .agg(count(lit(1)).as("n")).withColumn("tag", lit("inter_all"))
      val only = li.exceptAll(cheap).groupBy($"k")
        .agg(count(lit(1)).as("n")).withColumn("tag", lit("except_all"))
      both.unionByName(only).orderBy($"tag", $"k")
    }),

    // Global top-k (TakeOrderedAndProject — per-partition top-k + merge).
    "q_topk" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .limit(15)
    }),

    // Grouped top-k through the NATIVE plan operator (tier-(c) extension:
    // custom LogicalPlan + SparkStrategy + SparkPlan, graft.plans.TopKPerKey).
    // Partial phase keeps a k-bounded heap per key map-side so the shuffle
    // carries ≤ k rows per key per partition — the window-rank formulation
    // of the same query shuffles EVERY row. Plan + shuffle-volume pinned in
    // TopKPlanSpec.
    "q_topk_group_native" -> ((s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
        .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      graft.plans.TopK.perKey(o, Seq("o_custkey"),
          Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // observe() metrics: pipeline health counters collected DURING the
    // main query's own scan — no second pass over the data. The main
    // query here is a filter+write-shaped pass over lineitem; the
    // observation rides it and surfaces as a 1-row DataFrame (the O(1)
    // driver hop is the API's contract, not a collect of data).
    "q_observe_metrics" -> ((s, dir) => {
      import s.implicits._
      val obs = new org.apache.spark.sql.Observation("gate_metrics")
      val gated = t(s, dir, "lineitem")
        .observe(obs,
          count(lit(1)).as("rows_seen"),
          sum(when($"l_quantity" > 45, 1L).otherwise(0L)).as("rows_dropped"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double")
            .as("price_seen"))
        .where($"l_quantity" <= 45)
      val kept = gated.count() // materializes the pass; obs.get blocks on it
      val m = obs.get
      s.createDataFrame(Seq((
          m("rows_seen").asInstanceOf[Long],
          m("rows_dropped").asInstanceOf[Long],
          kept,
          m("price_seen").asInstanceOf[Double])))
        .toDF("rows_seen", "rows_dropped", "rows_kept", "price_seen")
    }),

    // As-of join: latest order state per (user, event-time).
    "q_asof_join" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id", $"user_id".as("k"), $"ts")
      // right side made unique per (key, time) by pre-aggregation
      val ord = t(s, dir, "orders")
        .groupBy($"o_custkey".as("k"), $"o_orderdate")
        .agg(count(lit(1)).as("n_orders"))
      AsOfJoin.asOf(ev, ord, key = "k", leftTime = "ts",
          rightTime = "o_orderdate", payload = Seq("n_orders"))
        .select($"event_id", $"k".as("user_id"), $"asof_n_orders")
        .orderBy($"event_id")
    }),

    // NEAREST-direction as-of: minimize |right - left| within the key,
    // distance ties backward — both directions resolved over ONE union
    // shuffle (two in-partition window sorts, no range join).
    "q_asof_nearest" -> ((s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .select($"event_id", $"user_id".as("k"), $"ts")
      val ord = t(s, dir, "orders")
        .groupBy($"o_custkey".as("k"), $"o_orderdate")
        .agg(count(lit(1)).as("n_orders"))
      AsOfJoin.asOfNearest(ev, ord, key = "k", leftTime = "ts",
          rightTime = "o_orderdate", payload = Seq("n_orders"))
        .select($"event_id", $"k".as("user_id"), $"asof_n_orders", $"asof_ts")
        .orderBy($"event_id")
    }),

    // Interval/range join: follow-up events of the same user within 1 hour.
    // The join key is (user, hour-bucket): each probe row checks its own
    // and the next bucket (b_ts ∈ (ts, ts+1h] ⟹ floor_h(b_ts) ∈
    // {floor_h(ts), floor_h(ts)+1}), so candidate pairs are bounded by
    // per-(user, hour) density instead of a user's whole history — the
    // standard interval-join bucketing; the range predicate then filters
    // exactly. A hot user with a long history no longer degenerates.
    "q_interval_join" -> ((s, dir) => {
      import s.implicits._
      val hourBkt = (c: org.apache.spark.sql.Column) =>
        floor(unix_timestamp(c) / 3600)
      val a = t(s, dir, "events").select($"event_id", $"user_id", $"ts")
        .withColumn("bkt", explode(array(hourBkt($"ts"), hourBkt($"ts") + 1)))
      val b = t(s, dir, "events").select(
        $"event_id".as("b_id"), $"user_id".as("b_user"), $"ts".as("b_ts"))
        .withColumn("bkt", hourBkt($"b_ts"))
      a.join(b, $"user_id" === $"b_user" && a("bkt") === b("bkt") &&
          $"b_ts" > $"ts" && $"b_ts" <= $"ts" + expr("INTERVAL 1 HOUR"))
        .groupBy($"event_id").agg(count(lit(1)).as("followups"))
        .orderBy($"event_id")
    }),

    // Pivot (dynamic columns from data, fixed value list for determinism).
    "q_pivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy(($"user_id" % 10).as("user_decile"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count()
        .orderBy($"user_decile")
    }),

    // Theta join (non-equi nested-loop shape, small dims): nation pairs
    // across adjacent regions.
    "q_theta_join" -> ((s, dir) => {
      import s.implicits._
      val a = t(s, dir, "nation")
        .select($"n_nationkey".as("a_key"), $"n_regionkey".as("a_region"))
      val b = t(s, dir, "nation")
        .select($"n_nationkey".as("b_key"), $"n_regionkey".as("b_region"))
      a.join(b, $"b_region" === $"a_region" + 1)
        .groupBy($"a_region").agg(count(lit(1)).as("n_pairs"))
        .orderBy($"a_region")
    }),

    // Bloom-pruned join: the fact side is filtered map-side by a Bloom
    // filter of the dim's key set BEFORE the join — the shape broadcast
    // can't save (dim too big to broadcast as rows, key set fits bloom
    // bits). False positives die in the real join; the result is
    // exactly the unpruned join's (BloomJoinSpec pins prune + parity).
    "q_bloom_prune_join" -> ((s, dir) => {
      import s.implicits._
      val dim = t(s, dir, "orders").where($"o_totalprice" > 400000.0)
        .select($"o_orderkey", $"o_orderpriority")
      val pruned = BloomJoin.pruneFact(
        t(s, dir, "lineitem"), "l_orderkey", dim, "o_orderkey", dim.count())
      pruned.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          // products are price(2dp) × (1 - disc(2dp)) = exactly 4
          // decimal digits; quantizing each row at 4dp recovers the
          // identical decimal on both engines (binary error ~1e-11 ≪
          // 0.5e-4), so the decimal sums match bit-exactly
          sum(($"l_extendedprice" * (lit(1.0) - $"l_discount"))
            .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy($"o_orderpriority")
    }),

    // Incrementally-maintained aggregate table (MV maintenance): the
    // log arrives as three append batches, each folded into the stored
    // partials at O(delta + groups) — the already-processed batches
    // are never rescanned. Algebraic partials make the N-batch fold
    // bit-identical to one aggregation of the whole log (the oracle).
    "q_incremental_agg" -> ((s, dir) => {
      import s.implicits._
      val stateDir = graft.Fs.scratch("/tmp/graft_incragg",
        dir.replaceAll("[^A-Za-z0-9]", "_")).toString
      graft.Fs.deleteRecursively(new java.io.File(stateDir))
      val ev = t(s, dir, "events")
      Seq(0L, 1L, 2L).foreach { epoch =>
        IncrementalAgg.update(s, stateDir,
          ev.where($"event_id" % 3 === epoch))
      }
      IncrementalAgg.read(s, stateDir).orderBy("event_type")
    }),

    // Distinct aggregation.
    "q_distinct_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .groupBy($"event_type")
        .agg(countDistinct($"user_id").as("users"),
          count(lit(1)).as("n"))
        .orderBy($"event_type")
    }),

    // JSON extraction (reference Value::Json surface, values.rs:38).
    "q_json_extract" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("long"))
        .groupBy($"event_type")
        .agg(sum($"k").as("sum_k"), max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    // Date bucketing + aggregation (reference Date/Time/Timestamp surface).
    "q_date_trunc" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").cast("date").as("month"))
        .agg(sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("revenue"),
          count(lit(1)).as("n"))
        .orderBy($"month")
    }),

    // UNPIVOT/melt: wide metric columns to (metric, value) rows, then
    // re-aggregated per metric.
    "q_unpivot" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_linenumber",
          $"l_quantity", $"l_discount", $"l_tax")
        .unpivot(
          Array($"l_orderkey", $"l_linenumber"),
          Array($"l_quantity", $"l_discount", $"l_tax"),
          "metric", "val")
        .groupBy($"metric")
        .agg(count(lit(1)).as("n"),
          sum($"val".cast("decimal(18,2)")).cast("double").as("total"))
        .orderBy($"metric")
    }),

    // Scalar subqueries, correlated (per-customer MAX) and uncorrelated
    // (global MAX) — exact comparisons/divisions only, so both engines
    // agree bit-for-bit.
    "q_scalar_subquery" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_sq")
      s.sql("""SELECT o_orderkey,
        CAST(o_totalprice >= (SELECT MAX(o2.o_totalprice) FROM orders_sq o2
          WHERE o2.o_custkey = o.o_custkey) AS BOOLEAN) AS is_cust_max,
        ROUND(o_totalprice / (SELECT MAX(o_totalprice) FROM orders_sq), 6)
          AS pct_of_max
        FROM orders_sq o ORDER BY o_orderkey""")
    }),

    // Math function family: sqrt is IEEE-correctly-rounded (unlike
    // pow/log, which differ across libm builds), ceil/floor/abs/pmod are
    // exact — so every value hash-matches the oracle.
    "q_math_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          round(sqrt($"o_totalprice"), 6).as("sqrt_price"),
          ceil($"o_totalprice").cast("long").as("ceil_price"),
          floor($"o_totalprice").cast("long").as("floor_price"),
          abs($"o_custkey" - 500).as("abs_off"),
          pmod($"o_orderkey", lit(7)).as("bucket"))
        .orderBy($"o_orderkey")
    }),

    // Array function family: per-customer order-key array (sorted for
    // determinism) reduced back to scalars via size / element_at /
    // array_max / array_distinct / an explicit left-fold sum.
    "q_array_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(sort_array(collect_list($"o_orderkey")).as("arr"))
        .select($"o_custkey",
          size($"arr").cast("long").as("n"),
          element_at($"arr", 1).as("first_key"),
          array_max($"arr").as("max_key"),
          size(array_distinct($"arr")).cast("long").as("n_distinct"),
          aggregate($"arr", lit(0L), (acc, x) => acc + x).as("key_sum"))
        .orderBy($"o_custkey")
    }),

    // Bitwise family: the bit_and/bit_or/bit_xor AGGREGATES (flag-mask
    // folding over grouped rows) plus &, shiftleft scalars — the bitmap
    // arithmetic a feature-flag or partition-mask column needs.
    "q_bitwise_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("bit_and(o_orderkey)").as("all_bits"),
          expr("bit_or(o_orderkey % 256)").as("any_low"),
          expr("bit_xor(o_orderkey)").as("xor_keys"),
          sum(expr("o_orderkey & 255")).as("sum_masked"),
          sum(expr("shiftleft(o_orderkey % 16, 2)")).as("sum_shifted"))
        .orderBy($"o_orderstatus")
    }),

    // Error-safe try_* family (ingest-grade semantics: malformed input
    // yields NULL, never a task failure): try_divide on a planted zero
    // divisor, try_cast on both a parsing and a non-parsing slice,
    // try_add at the bigint overflow edge, try_element_at out of range.
    "q_try_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          expr("try_divide(100L, o_orderkey % 7)").as("safe_div"),
          expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
            .as("prio_num"),
          expr("try_cast(o_orderstatus AS INT)").as("bad_cast"),
          expr("try_add(o_orderkey, 9223372036854775800L)").as("edge_add"),
          expr("try_element_at(split(o_orderpriority, '-'), 3)")
            .as("no_third"))
        .orderBy($"o_orderkey")
    }),

    // URL parsing family (parse_url HOST/PATH/QUERY-param): the URL is
    // constructed from columns, so the oracle re-derives the parts
    // directly — parse_url must exactly invert the construction.
    "q_parse_url" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), $"source",
          lit(".example.com/docs/"), $"doc_id", lit("?lang="), $"lang",
          lit("&v=2")))
        .select($"doc_id",
          parse_url($"url", lit("HOST")).as("host"),
          parse_url($"url", lit("PATH")).as("path"),
          parse_url($"url", lit("QUERY"), lit("lang")).as("q_lang"),
          parse_url($"url", lit("QUERY"), lit("missing")).as("q_missing"))
        .orderBy($"doc_id")
    }),

    // Higher-order array-function family as the USER-facing surface:
    // transform / filter / exists / forall / aggregate / zip_with
    // lambdas over per-row arrays, all map-side (zero shuffle). Folds
    // are strict-left with a typed 0L init (the list_reduce mirror);
    // zip_with pairs each token with its mirror-position twin.
    "q_hof_funcs" -> ((s, dir) => {
      import s.implicits._
      val toks = split($"text", " ")
      val lens = transform(toks, w => length(w).cast("long"))
      t(s, dir, "documents")
        .select($"doc_id",
          aggregate(lens, lit(0L), (a, x) => a + x).as("sum_len"),
          size(filter(toks, w => length(w) > 4)).cast("long").as("n_long"),
          exists(toks, w => w === "the").as("has_the"),
          forall(toks, w => length(w) <= 12).as("all_short"),
          array_max(lens).as("max_len"),
          aggregate(
            zip_with(toks, reverse(toks),
              (a, b) => when(length(a) === length(b), 1L).otherwise(0L)),
            lit(0L), (acc, x) => acc + x).as("n_mirror"))
        .orderBy($"doc_id")
    }),

    // Window VALUE functions: first/last with IGNORE NULLS semantics +
    // nth_value over an explicit full frame, on a planted-null column
    // (every 10th key) so null skipping is non-vacuous.
    "q_window_value" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      t(s, dir, "orders")
        .withColumn("p", when($"o_orderkey" % 10 === 0,
          lit(null).cast("double")).otherwise($"o_totalprice"))
        .select($"o_custkey", $"o_orderkey",
          first($"p", ignoreNulls = true).over(w).as("first_nn"),
          last($"p", ignoreNulls = true).over(wf).as("last_nn"),
          nth_value($"p", 2).over(wf).as("second_p"))
        .orderBy($"o_custkey", $"o_orderkey")
    }),

    // Map function family: per-row map construction, lookup, keys,
    // size — reduced to scalars whose truth is the underlying columns.
    "q_map_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .withColumn("m", map(
          lit("status"), $"o_orderstatus",
          lit("priority"), $"o_orderpriority"))
        .select($"o_orderkey",
          element_at($"m", "status").as("status_val"),
          element_at($"m", "missing").as("missing_val"),
          size($"m").cast("long").as("n_keys"),
          array_join(sort_array(map_keys($"m")), ",").as("keys_sorted"))
        .orderBy($"o_orderkey")
    }),

    // String function family (reference §2.5: lower/upper/trim/concat).
    "q_string_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select($"c_custkey",
          concat_ws("-", upper(substring($"c_name", 1, 8)),
            length($"c_name").cast("string")).as("tag"),
          lower($"c_mktsegment").as("seg"))
        .orderBy($"c_custkey")
    }),

    // Regexp function family: extract / global replace / count / rlike.
    // Patterns restricted to the Java∩RE2 common subset (char classes,
    // anchors, +) so the DuckDB oracle matches byte-for-byte — same rule
    // as TextAnalysis's PII patterns.
    "q_regexp_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          regexp_extract($"text", "^([A-Za-z]+)", 1).as("first_word"),
          regexp_count($"text", lit("[0-9]")).cast("long").as("n_digits"),
          length(regexp_replace($"text", "[aeiou]", "")).cast("long")
            .as("vowelless_len"),
          $"text".rlike("^[A-Z]").as("starts_upper"))
        .orderBy($"doc_id")
    }),

    // Conditional family: CASE, coalesce, nullif, greatest/least. Doubles
    // pass through untouched (comparison only), so no decimal detour.
    "q_cond_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select($"o_orderkey",
          when($"o_orderstatus" === "F", "done")
            .when($"o_orderstatus" === "O", "open")
            .otherwise("other").as("status_label"),
          coalesce(nullif($"o_orderpriority", lit("1-URGENT")),
            lit("urgent!")).as("prio"),
          greatest($"o_totalprice", lit(150000.0)).as("hi"),
          least($"o_totalprice", lit(150000.0)).as("lo"))
        .orderBy($"o_orderkey")
    }),

    // Hash function family (content fingerprinting at ingest scale):
    // md5 + sha-256 hex digests, both codegen'd built-ins.
    "q_hash_funcs" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "customer")
        .select($"c_custkey",
          md5($"c_name").as("md5_hex"),
          sha2($"c_name", 256).as("sha256_hex"))
        .orderBy($"c_custkey")
    }),

    // Statistical aggregate family: stddev/variance/corr/covar. These are
    // float-order-dependent in the last ulps, so results are rounded to
    // well inside the cross-engine error bound (~1e-10 relative) —
    // StatsAggSpec separately pins Spark's builtins against exact
    // decimal-sum formulas.
    "q_stats_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(stddev_samp($"o_totalprice"), 3).as("sd_price"),
          round(var_samp($"o_totalprice"), 2).as("var_price"),
          round(corr($"o_totalprice", $"o_custkey".cast("double")), 6)
            .as("corr_pc"),
          round(covar_samp($"o_totalprice", $"o_custkey".cast("double")), 2)
            .as("covar_pc"))
        .orderBy($"o_orderstatus")
    }),

    // min_by/max_by (argmin/argmax) aggregates — the "which row wins"
    // family. Order prices are tie-free at every SF (checked), so the
    // winners are deterministic.
    "q_minmax_by" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(max_by($"o_orderkey", $"o_totalprice").as("best_order"),
          min_by($"o_orderkey", $"o_totalprice").as("worst_order"),
          max($"o_totalprice").as("max_price"),
          min($"o_totalprice").as("min_price"))
        .orderBy($"o_custkey")
    }),

    // Filtered aggregates (SQL FILTER clause surface): conditional count
    // and a conditional sum through DECIMAL for order independence.
    "q_filtered_agg" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(count(when($"o_orderstatus" === "F", 1)).as("n_done"),
          sum(when($"o_orderstatus" === "F",
            $"o_totalprice".cast("decimal(18,2)"))).cast("double")
            .as("rev_done"),
          count(lit(1)).as("n_all"))
        .orderBy($"o_orderpriority")
    }),

    // Bucketed co-located join: both sides pre-bucketed on the join key,
    // so the join itself plans with NO shuffle (BucketingSpec pins it).
    "q_bucketed_join" -> ((s, dir) => {
      import s.implicits._
      graft.operators.Bucketed.coLocatedJoin(s, dir).orderBy($"c_custkey")
    }),

    // Typed UDAF surface: the Top2Agg Aggregator through functions.udaf —
    // plans with partial aggregation like a builtin (map-side combine
    // before the shuffle; see Top2Agg scaladoc).
    "q_udaf_top2" -> ((s, dir) => {
      import s.implicits._
      val top2 = udaf(graft.functions.Top2Agg)
      t(s, dir, "orders")
        .groupBy($"o_custkey")
        .agg(top2($"o_totalprice").as("t2"))
        .select($"o_custkey", $"t2._1".as("best"),
          when($"t2._2" === lit(Double.NegativeInfinity), lit(null))
            .otherwise($"t2._2").as("second"))
        .orderBy($"o_custkey")
    }),

    // Correlated EXISTS subquery through the SQL entry point (plans to a
    // left-semi join — no driver-side anything).
    "q_exists_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_custkey, c_name FROM customer c
               WHERE EXISTS (SELECT 1 FROM orders o
                             WHERE o.o_custkey = c.c_custkey
                               AND o.o_totalprice > 300000)
               ORDER BY c_custkey""")
    }),

    // IN subquery (uncorrelated) — also a left-semi join after rewrite.
    "q_in_subquery" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderkey, o_custkey FROM orders
               WHERE o_custkey IN (SELECT c_custkey FROM customer
                                   WHERE c_mktsegment = 'BUILDING')
               ORDER BY o_orderkey""")
    }),

    // Lateral/table-generating surface: posexplode of the first three
    // words of each document (generator runs inside the scan stage — no
    // shuffle).
    "q_lateral_explode" -> ((s, dir) => {
      import s.implicits._
      t(s, dir, "documents")
        .select($"doc_id",
          posexplode(slice(split($"text", " "), 1, 3)).as(Seq("pos0", "word")))
        .select($"doc_id", ($"pos0" + 1).cast("long").as("pos"), $"word")
        .orderBy($"doc_id", $"pos")
    })
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_disc_price,
         COUNT(*) AS count_order
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_join_topk" ->
      """SELECT l_orderkey, o_orderdate,
         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,10))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
           AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
         GROUP BY l_orderkey, o_orderdate
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_multiway_join" ->
      """SELECT n_name,
         CAST(CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(28,10))) AS DECIMAL(38,4)) AS DOUBLE) AS revenue,
         COUNT(*) AS n_lines
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
                      AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
           AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
         GROUP BY n_name ORDER BY n_name""",
    "q_join_semi" ->
      """SELECT o_orderstatus, COUNT(*) AS n FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
           WHERE l_orderkey = o_orderkey AND l_quantity > 45)
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_join_anti" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "q_join_full_outer" ->
      """SELECT COALESCE(c.k, o.k) AS k, c_name, n_orders
         FROM (SELECT c_custkey AS k, c_name FROM customer
               WHERE c_mktsegment = 'MACHINERY') c
         FULL OUTER JOIN (SELECT o_custkey AS k, COUNT(*) AS n_orders
               FROM orders GROUP BY 1) o
           ON c.k = o.k
         ORDER BY k""",
    "q_salted_join" ->
      """SELECT c_mktsegment, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         FROM events JOIN customer ON user_id = c_custkey
         GROUP BY 1 ORDER BY c_mktsegment""",
    "q_window_rank" ->
      """SELECT o_custkey, o_orderkey, rnk FROM (
           SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders) WHERE rnk <= 3
         ORDER BY o_custkey, rnk""",
    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_lag" ->
      """SELECT o_custkey, o_orderkey,
         DATEDIFF('day', LAG(o_orderdate, 1) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           o_orderdate) AS gap_days
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
         FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
         FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",
    "q_sessionize" ->
      """WITH marked AS (
           SELECT user_id, ts, value,
             CASE WHEN ts >= lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         + INTERVAL 30 MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
           FROM events),
         sessions AS (
           SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM marked)
         SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
         FROM sessions GROUP BY user_id, sid
         ORDER BY user_id, session_start""",
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY o_orderstatus ASC NULLS FIRST,
                  o_orderpriority ASC NULLS FIRST""",
    "q_percentile" ->
      """SELECT o_orderstatus,
         ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
         ROUND(quantile_cont(o_totalprice, 0.9), 6) AS p90
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_setops" ->
      """WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
         building AS (SELECT c_custkey AS k FROM customer
           WHERE c_mktsegment = 'BUILDING')
         SELECT k, 'building_buyer' AS tag FROM building
           WHERE k IN (SELECT k FROM buyers)
         UNION ALL
         SELECT k, 'building_dormant' AS tag FROM building
           WHERE k NOT IN (SELECT k FROM buyers)
         ORDER BY tag, k""",
    "q_setops_all" ->
      """WITH li AS (SELECT l_partkey AS k FROM lineitem),
         cheap AS (SELECT l_partkey AS k FROM lineitem
           WHERE l_extendedprice < 5000)
         SELECT k, COUNT(*) AS n, 'inter_all' AS tag
         FROM (SELECT k FROM li INTERSECT ALL SELECT k FROM cheap)
         GROUP BY k
         UNION ALL
         SELECT k, COUNT(*) AS n, 'except_all' AS tag
         FROM (SELECT k FROM li EXCEPT ALL SELECT k FROM cheap)
         GROUP BY k
         ORDER BY tag, k""",
    "q_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 15""",
    "q_topk_group_native" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) t
         WHERE rn <= 3 ORDER BY o_custkey, o_orderkey""",
    "q_observe_metrics" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS rows_seen,
         CAST(SUM(CASE WHEN l_quantity > 45 THEN 1 ELSE 0 END) AS BIGINT)
           AS rows_dropped,
         CAST(SUM(CASE WHEN l_quantity <= 45 THEN 1 ELSE 0 END) AS BIGINT)
           AS rows_kept,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS price_seen
       FROM lineitem""",
    "q_asof_join" ->
      """WITH ord AS (
           SELECT o_custkey AS k, o_orderdate, COUNT(*) AS n_orders
           FROM orders GROUP BY 1, 2)
         SELECT e.event_id, e.user_id,
           (SELECT n_orders FROM ord
             WHERE ord.k = e.user_id AND ord.o_orderdate <= e.ts
             ORDER BY ord.o_orderdate DESC LIMIT 1) AS asof_n_orders
         FROM events e ORDER BY e.event_id""",

    // nearest ≡ minimize (|Δt|, right time): the tie rule "backward
    // wins" is exactly the secondary ascending right-time sort
    "q_asof_nearest" ->
      """WITH ord AS (
           SELECT o_custkey AS k, o_orderdate, COUNT(*) AS n_orders
           FROM orders GROUP BY 1, 2)
         SELECT e.event_id, e.user_id, x.asof_n_orders, x.asof_ts
         FROM events e LEFT JOIN LATERAL (
           SELECT n_orders AS asof_n_orders, o_orderdate AS asof_ts
           FROM ord WHERE ord.k = e.user_id
           ORDER BY abs(epoch_us(e.ts) - epoch_us(o_orderdate)),
             o_orderdate
           LIMIT 1) x ON TRUE
         ORDER BY e.event_id""",
    "q_interval_join" ->
      """SELECT a.event_id, COUNT(*) AS followups
         FROM events a JOIN events b ON a.user_id = b.user_id
           AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
         GROUP BY a.event_id ORDER BY a.event_id""",
    "q_pivot" ->
      """SELECT user_id % 10 AS user_decile,
         COUNT(*) FILTER (event_type = 'click') AS click,
         COUNT(*) FILTER (event_type = 'error') AS error,
         COUNT(*) FILTER (event_type = 'purchase') AS purchase,
         COUNT(*) FILTER (event_type = 'signup') AS signup,
         COUNT(*) FILTER (event_type = 'view') AS view
         FROM events GROUP BY 1 ORDER BY user_decile""",
    "q_theta_join" ->
      """SELECT a.n_regionkey AS a_region, COUNT(*) AS n_pairs
         FROM nation a JOIN nation b ON b.n_regionkey = a.n_regionkey + 1
         GROUP BY 1 ORDER BY a_region""",
    "q_distinct_agg" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS n
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_incremental_agg" ->
      """SELECT event_type, COUNT(*) AS n,
         CAST(SUM(user_id) AS BIGINT) AS sum_users,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         MIN(value) AS min_value, MAX(value) AS max_value
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_bloom_prune_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
         CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
           AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE o_totalprice > 400000
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
         TRUE AS approx_ok
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_json_extract" ->
      """SELECT event_type,
         CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
         MAX(CAST(props->>'k' AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_date_trunc" ->
      """SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         COUNT(*) AS n
         FROM orders GROUP BY 1 ORDER BY month""",
    "q_unpivot" ->
      """WITH m AS (
           SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
           UNION ALL
           SELECT 'l_discount', l_discount FROM lineitem
           UNION ALL
           SELECT 'l_tax', l_tax FROM lineitem)
         SELECT metric, COUNT(*) AS n,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM m GROUP BY metric ORDER BY metric""",
    "q_scalar_subquery" ->
      """SELECT o_orderkey,
         o_totalprice >= (SELECT MAX(o2.o_totalprice) FROM orders o2
           WHERE o2.o_custkey = o.o_custkey) AS is_cust_max,
         ROUND(o_totalprice / (SELECT MAX(o_totalprice) FROM orders), 6)
           AS pct_of_max
         FROM orders o ORDER BY o_orderkey""",
    "q_math_funcs" ->
      """SELECT o_orderkey,
         ROUND(sqrt(o_totalprice), 6) AS sqrt_price,
         CAST(ceil(o_totalprice) AS BIGINT) AS ceil_price,
         CAST(floor(o_totalprice) AS BIGINT) AS floor_price,
         abs(o_custkey - 500) AS abs_off,
         o_orderkey % 7 AS bucket
         FROM orders ORDER BY o_orderkey""",
    "q_array_funcs" ->
      """WITH a AS (
           SELECT o_custkey, list(o_orderkey ORDER BY o_orderkey) AS arr
           FROM orders GROUP BY o_custkey)
         SELECT o_custkey,
           CAST(len(arr) AS BIGINT) AS n,
           arr[1] AS first_key,
           list_aggregate(arr, 'max') AS max_key,
           CAST(len(list_distinct(arr)) AS BIGINT) AS n_distinct,
           CAST(list_reduce(arr, (acc, x) -> acc + x) AS BIGINT) AS key_sum
         FROM a ORDER BY o_custkey""",
    "q_bitwise_funcs" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
         bit_and(o_orderkey) AS all_bits,
         bit_or(o_orderkey % 256) AS any_low,
         bit_xor(o_orderkey) AS xor_keys,
         CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_masked,
         CAST(SUM((o_orderkey % 16) << 2) AS BIGINT) AS sum_shifted
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // DuckDB has TRY_CAST but no try_* arithmetic (overflow errors), so
    // the add mirrors via a guard; OOB list index is natively NULL
    "q_try_funcs" ->
      """SELECT o_orderkey,
         100.0 / nullif(o_orderkey % 7, 0) AS safe_div,
         TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
         TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
         CASE WHEN o_orderkey <= 7
              THEN o_orderkey + 9223372036854775800 END AS edge_add,
         string_split(o_orderpriority, '-')[3] AS no_third
         FROM orders ORDER BY o_orderkey""",
    // the URL is built from columns; parsing must invert construction
    "q_parse_url" ->
      """SELECT doc_id,
         source || '.example.com' AS host,
         '/docs/' || doc_id AS path,
         lang AS q_lang,
         CAST(NULL AS VARCHAR) AS q_missing
         FROM documents ORDER BY doc_id""",
    // forall(p) ≡ len(filter(NOT p)) = 0; zip-with-reverse ≡ compare
    // t[i] against t[n-i+1] by index; the length fold prepends a typed
    // 0 so the strict left fold starts identically
    "q_hof_funcs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t
                    FROM documents)
         SELECT doc_id,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(t, w -> CAST(length(w) AS BIGINT))),
             (a, x) -> a + x) AS BIGINT) AS sum_len,
           CAST(len(list_filter(t, w -> length(w) > 4)) AS BIGINT)
             AS n_long,
           list_contains(t, 'the') AS has_the,
           len(list_filter(t, w -> length(w) > 12)) = 0 AS all_short,
           list_aggregate(list_transform(t, w -> CAST(length(w) AS BIGINT)),
             'max') AS max_len,
           CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
             list_transform(range(1, len(t) + 1),
               i -> CAST(CASE WHEN length(t[i]) = length(t[len(t) - i + 1])
                              THEN 1 ELSE 0 END AS BIGINT))),
             (a, x) -> a + x) AS BIGINT) AS n_mirror
         FROM d ORDER BY doc_id""",
    "q_window_value" ->
      """WITH p AS (
           SELECT o_custkey, o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_totalprice END AS p
           FROM orders)
         SELECT o_custkey, o_orderkey,
           first_value(p IGNORE NULLS) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey) AS first_nn,
           last_value(p IGNORE NULLS) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_nn,
           nth_value(p, 2) OVER
             (PARTITION BY o_custkey ORDER BY o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_p
         FROM p ORDER BY o_custkey, o_orderkey""",
    "q_map_funcs" ->
      """SELECT o_orderkey,
         o_orderstatus AS status_val,
         CAST(NULL AS VARCHAR) AS missing_val,
         CAST(2 AS BIGINT) AS n_keys,
         'priority,status' AS keys_sorted
         FROM orders ORDER BY o_orderkey""",
    "q_string_funcs" ->
      """SELECT c_custkey,
         concat_ws('-', upper(substring(c_name, 1, 8)), CAST(length(c_name) AS VARCHAR)) AS tag,
         lower(c_mktsegment) AS seg
         FROM customer ORDER BY c_custkey""",
    "q_window_frames" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sliding3,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate
           RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_running
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q_window_dist" ->
      """SELECT o_custkey, o_orderkey,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) AS pct_rank,
         round(cume_dist() OVER w, 6) AS cume
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",
    "q_regexp_funcs" ->
      """SELECT doc_id,
         regexp_extract(text, '^([A-Za-z]+)', 1) AS first_word,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
         CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS vowelless_len,
         regexp_matches(text, '^[A-Z]') AS starts_upper
         FROM documents ORDER BY doc_id""",
    "q_cond_funcs" ->
      """SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'F' THEN 'done'
              WHEN o_orderstatus = 'O' THEN 'open'
              ELSE 'other' END AS status_label,
         coalesce(nullif(o_orderpriority, '1-URGENT'), 'urgent!') AS prio,
         greatest(o_totalprice, 150000.0) AS hi,
         least(o_totalprice, 150000.0) AS lo
         FROM orders ORDER BY o_orderkey""",
    "q_hash_funcs" ->
      """SELECT c_custkey,
         md5(c_name) AS md5_hex,
         sha256(c_name) AS sha256_hex
         FROM customer ORDER BY c_custkey""",
    "q_stats_agg" ->
      """SELECT o_orderstatus,
         count(*) AS n,
         round(stddev_samp(o_totalprice), 3) AS sd_price,
         round(var_samp(o_totalprice), 2) AS var_price,
         round(corr(o_totalprice, CAST(o_custkey AS DOUBLE)), 6) AS corr_pc,
         round(covar_samp(o_totalprice, CAST(o_custkey AS DOUBLE)), 2) AS covar_pc
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_minmax_by" ->
      """SELECT o_custkey,
         arg_max(o_orderkey, o_totalprice) AS best_order,
         arg_min(o_orderkey, o_totalprice) AS worst_order,
         max(o_totalprice) AS max_price,
         min(o_totalprice) AS min_price
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q_filtered_agg" ->
      """SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS n_done,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS rev_done,
         count(*) AS n_all
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_bucketed_join" ->
      """SELECT c_custkey, c_name, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name ORDER BY c_custkey""",
    "q_udaf_top2" ->
      """WITH r AS (SELECT o_custkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC) AS rn
           FROM orders)
         SELECT o_custkey,
           max(CASE WHEN rn = 1 THEN o_totalprice END) AS best,
           max(CASE WHEN rn = 2 THEN o_totalprice END) AS second
         FROM r GROUP BY o_custkey ORDER BY o_custkey""",
    "q_exists_subquery" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 300000)
         ORDER BY c_custkey""",
    "q_in_subquery" ->
      """SELECT o_orderkey, o_custkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer
                             WHERE c_mktsegment = 'BUILDING')
         ORDER BY o_orderkey""",
    "q_lateral_explode" ->
      """SELECT doc_id, w.pos, w.word FROM documents,
         LATERAL (SELECT unnest(string_split(text, ' ')[1:3]) AS word,
                  generate_subscripts(string_split(text, ' ')[1:3], 1) AS pos) w
         ORDER BY doc_id, pos"""
  )
}
