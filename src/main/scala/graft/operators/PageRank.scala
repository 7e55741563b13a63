package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank as a corpus quality prior — the link-analysis signal web
  * pipelines use to prioritize documents (a page's rank upstream of
  * content filters). Same engineering shape as [[KMeansOp]]: a fixed
  * number of power iterations UNROLLED into one declarative plan.
  *
  * Per iteration: contributions = edges ⋈ ranks on src (shuffle on the
  * edge key; edges carry their precomputed out-degree so no extra join),
  * then a dst-keyed aggregate whose sum runs in DECIMAL(38,18) — exact,
  * order-independent, so partition combining cannot perturb the result
  * and the DuckDB oracle reproduces every rank digit-for-digit. Nodes
  * with no in-links keep the teleport term via a left join + coalesce.
  *
  * At 100 TB: the edge table shuffles once per iteration on its join
  * key; ranks are node-sized; out-degrees ride the cached edge table.
  * The damping/teleport arithmetic is single-division IEEE with every
  * literal cast to double on both engines.
  */
object PageRank {

  val Damping = 0.85
  /** Teleport mass as its OWN literal, not `1.0 - Damping`: the Scala
    * expression evaluates to 0.15000000000000002 while the oracle's
    * `CAST(0.15 AS DOUBLE)` parses the decimal string — both engines
    * must parse the same literal to get the same IEEE value. */
  val Teleport = 0.15

  /** Deterministic synthetic citation graph over ids 0..n-1: each doc
    * links to (7id+1, 13id+2, 31id+5) mod n, self-loops and duplicate
    * targets removed (the arithmetic yields no self-loops for the test
    * moduli, but the guard is semantic, not incidental). */
  def syntheticLinks(docs: DataFrame, idCol: String, n: Long): DataFrame = {
    val id = col(idCol).cast("long")
    val targets = array_distinct(array(
      (id * 7L + 1L) % n, (id * 13L + 2L) % n, (id * 31L + 5L) % n))
    docs.select(id.as("src"),
        explode(filter(targets, t => t =!= id)).as("dst"))
  }

  /** `iters` unrolled power iterations from a uniform start; returns
    * (id, rank). `edges` must be (src, dst); out-degrees are computed
    * once and cached with the edges. */
  def ranks(nodes: DataFrame, edges: DataFrame, idCol: String, n: Long,
      iters: Int): DataFrame = {
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val withDeg = edges.join(deg, "src").cache()
    val teleport = lit(Teleport) / n.toDouble
    var r = nodes.select(col(idCol).cast("long").as("id"),
      (lit(1.0) / n.toDouble).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(r, withDeg("src") === r("id"))
        .select(withDeg("dst").as("id"),
          (r("rank") / col("outdeg")).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c").cast("decimal(38,18)")).cast("double").as("s"))
      r = nodes.select(col(idCol).cast("long").as("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (teleport + lit(Damping) * coalesce(col("s"), lit(0.0))).as("rank"))
    }
    r
  }
}
