package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Modern SQL-surface queries (Spark 4 features), exercised through the
  * SQL entry point so the engine's parser/analyzer path is covered, not
  * just the DataFrame DSL. Each has a DuckDB oracle:
  *
  *  - `q_recursive_cte`: WITH RECURSIVE (Catalyst UnionLoop) — the
  *    iterative-query surface the reference's consumers would use for
  *    hierarchy walks. Both engines run the SAME standard SQL text.
  *  - `q_variant_json`: VARIANT ingest (`parse_json`) + typed path
  *    extraction (`variant_get`) — the semi-structured column story at
  *    ingest scale (shredded binary encoding, not per-row string
  *    re-parsing). Oracle strips the roundtrip: JSON encode → VARIANT →
  *    extract is the identity on the source columns.
  *  - `q_listagg`: ordered string aggregation (SQL:2016 LISTAGG ...
  *    WITHIN GROUP) — deterministic because the order-by key is total.
  *  - `q_sql_udf`: declarative SQL scalar UDFs (CREATE TEMPORARY
  *    FUNCTION ... RETURN expr). Unlike JVM closures these inline into
  *    the plan (no serialization wall, full codegen) — the extension
  *    mechanism a SQL-only user gets. Oracle inlines the same bodies.
  *  - `q_collation_group`: case-insensitive grouping via UTF8_LCASE
  *    collation (Spark 4 collations) — equivalent to grouping by
  *    lower() for the ASCII corpus, which is exactly what the oracle
  *    does. Output keys are lower()-normalized on both sides because a
  *    collated group's representative value is whichever variant a
  *    partition saw first.
  *
  * Scale notes: the recursive walk shuffles once per iteration level
  * (bounded by tree depth, log2 N); VARIANT extraction is map-side;
  * LISTAGG groups are dimension-sized (nations per region); SQL UDFs
  * add zero physical operators. No query materializes anything driver-
  * side.
  */
object Sql4Queries {

  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Binary-tree reachability over doc ids: node i → children 2i, 2i+1
    * (strictly increasing ⇒ acyclic ⇒ UNION ALL terminates; every node
    * has one parent ⇒ no duplicate paths). Standard SQL, runs verbatim
    * on both engines. */
  private val RecursiveSql = """
    WITH RECURSIVE walk(doc_id, depth) AS (
      SELECT doc_id, 0 AS depth FROM documents WHERE doc_id = 1
      UNION ALL
      SELECT d.doc_id, w.depth + 1
      FROM walk w JOIN documents d
        ON d.doc_id = w.doc_id * 2 OR d.doc_id = w.doc_id * 2 + 1)
    SELECT depth, COUNT(*) AS n_docs,
      CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
      MIN(doc_id) AS first_id, MAX(doc_id) AS last_id
    FROM walk GROUP BY depth ORDER BY depth"""

  /** Top-2 orders per (sampled) customer through a correlated LATERAL
    * derived table with LIMIT — identical text on both engines. */
  private val LateralTopkSql = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
             WHERE o.o_custkey = c.c_custkey
             ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    WHERE c.c_custkey % 100 = 0
    ORDER BY c.c_custkey, o_totalprice DESC, o_orderkey"""

  val queries: Map[String, Q] = Map(
    "q_recursive_cte" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(RecursiveSql)
    }),

    "q_variant_json" -> ((s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql("""
        WITH enc AS (
          SELECT parse_json(to_json(named_struct(
            'doc_id', doc_id, 'lang', lang,
            'meta', named_struct('source', source, 'n_chars', n_chars),
            'tags', slice(split(text, ' '), 1, 2)))) AS v
          FROM documents),
        x AS (
          SELECT variant_get(v, '$.doc_id', 'bigint') AS doc_id,
                 variant_get(v, '$.lang', 'string') AS lang,
                 variant_get(v, '$.meta.n_chars', 'bigint') AS n_chars,
                 variant_get(v, '$.tags[0]', 'string') AS tag0
          FROM enc)
        SELECT doc_id, lang, n_chars, tag0 FROM x
        WHERE n_chars % 7 = 0 ORDER BY doc_id""")
    }),

    "q_listagg" -> ((s, dir) => {
      t(s, dir, "region").createOrReplaceTempView("region")
      t(s, dir, "nation").createOrReplaceTempView("nation")
      s.sql("""
        SELECT r.r_name,
          listagg(n.n_name, ',') WITHIN GROUP (ORDER BY n.n_name)
            AS nations,
          COUNT(*) AS n_nations
        FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name""")
    }),

    "q_sql_udf" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc(
                 p DOUBLE, d DOUBLE) RETURNS DOUBLE RETURN p * (1.0 - d)""")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_prio_class(
                 p STRING) RETURNS STRING
               RETURN CASE WHEN p IN ('1-URGENT', '2-HIGH')
                           THEN 'expedite' ELSE 'standard' END""")
      s.sql("""
        SELECT graft_prio_class(o_orderpriority) AS prio_class,
          COUNT(*) AS n,
          CAST(SUM(CAST(graft_disc(o_totalprice, 0.05)
            AS DECIMAL(28,6))) AS DOUBLE) AS disc_total
        FROM orders GROUP BY 1 ORDER BY 1""")
    }),

    // LATERAL correlated derived table (Spark 4 planner: DomainJoin
    // decorrelation of a per-row dependent subquery with LIMIT) — the
    // top-2 orders per customer, the query shape window-rank users
    // reach for LATERAL to express. Same standard SQL text runs on both
    // engines.
    "q_lateral_topk" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(LateralTopkSql)
    }),

    // SQL:2003 linear-regression aggregate family. Inputs are INTEGER-
    // valued doubles (key residues), so every internal sum is exact in
    // IEEE double on both engines; rounding margins validated with exact
    // rational arithmetic (see the oracle's comment).
    "q_regr_agg" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT o_orderpriority,
          regr_count(CAST(o_custkey % 97 AS DOUBLE),
                     CAST(o_orderkey % 113 AS DOUBLE)) AS n,
          ROUND(regr_slope(CAST(o_custkey % 97 AS DOUBLE),
                           CAST(o_orderkey % 113 AS DOUBLE)), 5) AS slope,
          ROUND(regr_intercept(CAST(o_custkey % 97 AS DOUBLE),
                               CAST(o_orderkey % 113 AS DOUBLE)), 5) AS icept,
          ROUND(regr_avgx(CAST(o_custkey % 97 AS DOUBLE),
                          CAST(o_orderkey % 113 AS DOUBLE)), 5) AS mean_x
        FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    // SQL scripting (SQL/PSM, Spark 4): DECLARE/WHILE/SET procedural
    // control flow around data-driven scalar subqueries — the migration
    // surface for stored-procedure workloads. The script's iterative
    // accumulation has a closed form the oracle states directly.
    "q_sql_script" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      // parser gate for BEGIN...END blocks; scoped to this session
      s.conf.set("spark.sql.scripting.enabled", "true")
      s.sql("""
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 5 DO
            SET total = total +
              (SELECT COUNT(*) FROM orders WHERE o_orderkey % 5 = i) * (i + 1);
            SET i = i + 1;
          END WHILE;
          SELECT total AS weighted_n;
        END""")
    }),

    // EXECUTE IMMEDIATE with positional params INCLUDING the table name
    // (IDENTIFIER(?)) — dynamic SQL built at runtime without string
    // concatenation, the injection-safe form of generated queries.
    "q_execute_immediate" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""EXECUTE IMMEDIATE
        'SELECT o_orderpriority AS prio, COUNT(*) AS n,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
         FROM IDENTIFIER(?) WHERE o_orderkey % 2 = ? GROUP BY 1 ORDER BY 1'
        USING 'orders', 0""")
    }),

    // SQL pipe syntax (Spark 4): the linear FROM |> WHERE |> AGGREGATE
    // |> ... form — each |> stage maps 1:1 onto the same logical
    // operators the nested form produces (zero new physical operators;
    // the plan is identical to the classic GROUP BY query), so the
    // oracle is that classic query. Ordered top-k through the pipe
    // keeps the cross-engine rank contract: rank on exact integer
    // sums, never rounded doubles.
    "q_pipe_sql" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        FROM orders
        |> WHERE o_orderstatus = 'F'
        |> EXTEND o_orderkey % 7 AS bucket
        |> AGGREGATE COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
             GROUP BY o_orderpriority, bucket
        |> WHERE n > 0
        |> ORDER BY o_orderpriority, bucket
        |> SELECT o_orderpriority AS prio, bucket, n, key_checksum""")
    }),

    "q_collation_group" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT lower(ck) AS prio, COUNT(*) AS n,
          CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
        FROM (
          SELECT o_orderkey,
            collate(CASE WHEN o_orderkey % 2 = 0
                         THEN lower(o_orderpriority)
                         ELSE o_orderpriority END, 'UTF8_LCASE') AS ck
          FROM orders)
        GROUP BY ck ORDER BY prio""")
    })
  )

  val oracles: Map[String, String] = Map(
    // identical SQL text — the point of the recursive-CTE entry
    "q_recursive_cte" -> RecursiveSql,

    // identical SQL text — the LATERAL decorrelation claim
    "q_lateral_topk" -> LateralTopkSql,

    // DuckDB's regr_* over the same integer-valued doubles. Inputs are
    // small integer residues so every internal sum is exact; the
    // engines' one-pass-vs-Welford implementation differences live
    // ~1e-11 from the exact value, and the (97, 113, round-5) choice
    // was validated with exact rational arithmetic: at both test SFs
    // every slope/intercept/avgx sits ≥ 4e-7 from the nearest 0.5e-5
    // rounding boundary — four orders of margin over the float noise.
    "q_regr_agg" -> """
      SELECT o_orderpriority,
        regr_count(CAST(o_custkey % 97 AS DOUBLE),
                   CAST(o_orderkey % 113 AS DOUBLE)) AS n,
        ROUND(regr_slope(CAST(o_custkey % 97 AS DOUBLE),
                         CAST(o_orderkey % 113 AS DOUBLE)), 5) AS slope,
        ROUND(regr_intercept(CAST(o_custkey % 97 AS DOUBLE),
                             CAST(o_orderkey % 113 AS DOUBLE)), 5) AS icept,
        ROUND(regr_avgx(CAST(o_custkey % 97 AS DOUBLE),
                        CAST(o_orderkey % 113 AS DOUBLE)), 5) AS mean_x
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",

    // the WHILE accumulation's closed form
    "q_sql_script" -> """
      SELECT CAST(SUM(o_orderkey % 5 + 1) AS BIGINT) AS weighted_n
      FROM orders""",

    // the pipe stages' classic nested form
    "q_pipe_sql" -> """
      SELECT o_orderpriority AS prio, o_orderkey % 7 AS bucket,
        COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      FROM orders WHERE o_orderstatus = 'F'
      GROUP BY o_orderpriority, o_orderkey % 7
      HAVING COUNT(*) > 0
      ORDER BY prio, bucket""",

    // the dynamic text with params substituted
    "q_execute_immediate" -> """
      SELECT o_orderpriority AS prio, COUNT(*) AS n,
        CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1 ORDER BY 1""",

    // encode → VARIANT → typed extract is the identity on the columns
    "q_variant_json" -> """
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
        string_split(text, ' ')[1] AS tag0
      FROM documents WHERE n_chars % 7 = 0 ORDER BY doc_id""",

    "q_listagg" -> """
      SELECT r.r_name,
        string_agg(n.n_name, ',' ORDER BY n.n_name) AS nations,
        COUNT(*) AS n_nations
      FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name ORDER BY r.r_name""",

    // UDF bodies inlined. Two float-semantics pins: (a) the discount
    // factor must be DOUBLE on both engines — DuckDB parses bare
    // 1.0 - 0.05 as exact DECIMAL subtraction, the Spark UDF's DOUBLE
    // parameter forces IEEE 1.0d - 0.05d; (b) the sum detours through
    // DECIMAL scale 6, not 10 — at scale 10 the scaled integer exceeds
    // 2^53 for ~5e5 prices and DuckDB's double->decimal cast (which
    // scales IN DOUBLE) stops being correctly rounded, while Spark casts
    // via the decimal string.
    "q_sql_udf" -> """
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 'expedite' ELSE 'standard' END AS prio_class,
        COUNT(*) AS n,
        CAST(SUM(CAST(o_totalprice *
          (CAST(1.0 AS DOUBLE) - CAST(0.05 AS DOUBLE))
          AS DECIMAL(28,6))) AS DOUBLE) AS disc_total
      FROM orders GROUP BY 1 ORDER BY 1""",

    // case-insensitive grouping ≡ grouping by lower() on ASCII data
    "q_collation_group" -> """
      SELECT lower(CASE WHEN o_orderkey % 2 = 0
                        THEN lower(o_orderpriority)
                        ELSE o_orderpriority END) AS prio,
        COUNT(*) AS n, CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
      FROM orders GROUP BY 1 ORDER BY prio"""
  )
}
