package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the centroid
  * TRAINING step that [[graft.queries.ExtensionQueries]]'s IVF ANN
  * routing consumes (ann_ivf_topk uses label-derived centroids; a real
  * index trains them).
  *
  * Spark-first shape, fully declarative — a fixed number of Lloyd
  * iterations UNROLLED into one logical plan, no driver-side loop over
  * data:
  *  - assignment: corpus ⨯ broadcast(k centroids) → strict-left-fold
  *    squared distance → per-vector argmin via a k-row window. The only
  *    corpus-wide work per iteration; embeds in whole-stage codegen.
  *  - update: posexplode to (cluster, dim) → per-dim mean. Sums run in
  *    DECIMAL(38,18): decimal addition is exact, hence order-independent
  *    — the mean is bit-identical no matter how partitions combine
  *    (same trick as the IVF centroid aggregate), so the DuckDB oracle
  *    reproduces every coordinate digit-for-digit.
  *  - init: the k smallest vec_ids (deterministic; a production run
  *    would use k-means‖ sampling — the plan shape downstream is
  *    identical).
  *
  * At 100 TB: per iteration one scan + one (cluster, dim)-keyed
  * aggregate of k·d cells — both partial-aggregated map-side; centroids
  * (k·d doubles) stay broadcast-sized by definition. Distance math is
  * zip_with/aggregate folds (engine-portable IEEE, no BLAS dependency).
  */
object KMeansOp {

  /** Strict-left-fold squared euclidean distance (mirrored by the
    * oracle's list_transform + list_reduce). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, c) => (x - c) * (x - c)),
      lit(0.0), (acc, v) => acc + v)

  /** Deterministic seed centroids: embeddings of the k smallest ids,
    * numbered 1..k in id order. k rows — the single-partition window is
    * k-sized by construction. */
  def initCentroids(emb: DataFrame, idCol: String, embCol: String,
      k: Int): DataFrame =
    emb.orderBy(col(idCol)).limit(k)
      .select(row_number().over(Window.orderBy(col(idCol))).as("cluster_id"),
        col(embCol).as("centroid"))

  /** One assignment pass: nearest centroid per vector (ties broken by
    * cluster_id — both engines compare identical doubles, so the argmin
    * agrees exactly).
    *
    * The argmin is a hash AGGREGATE — `min(struct(d, cluster_id, emb))`
    * is lexicographic, d first, cluster_id (unique per centroid)
    * breaking ties before the embedding is ever compared — identical
    * selection to the oracle's ROW_NUMBER() ... ORDER BY d, cluster_id
    * formulation, but it partial-aggregates map-side (k rows collapse
    * to 1 before the exchange) instead of sort-shuffling all k·N
    * candidate rows through a per-key window. With 4-5 assign passes in
    * a PQ/IVF training plan this is the dominant shuffle. */
  def assign(emb: DataFrame, centroids: DataFrame, idCol: String,
      embCol: String): DataFrame =
    emb.crossJoin(broadcast(centroids))
      .withColumn("d", sqDist(col(embCol), col("centroid")))
      .groupBy(col(idCol))
      .agg(min(struct(col("d"), col("cluster_id"), col(embCol))).as("m"))
      .select(col(idCol), col("m").getField(embCol).as(embCol),
        col("m").getField("cluster_id").as("cluster_id"))

  /** Per-(cluster, dim) decimal-exact means — the update aggregate in
    * its flat form (also the natural OUTPUT shape: k·d rows). */
  def updatePerDim(assigned: DataFrame, embCol: String): DataFrame =
    assigned
      .select(col("cluster_id"), posexplode(col(embCol)).as(Seq("i", "x")))
      .groupBy(col("cluster_id"), col("i"))
      .agg((sum(col("x").cast("decimal(38,18)")).cast("double") /
        count(lit(1))).as("cx"))

  /** One update pass: per-dim means reassembled into centroid arrays
    * ordered by dim. */
  def update(assigned: DataFrame, embCol: String): DataFrame =
    updatePerDim(assigned, embCol)
      .groupBy(col("cluster_id"))
      .agg(array_sort(collect_list(struct(col("i"), col("cx")))).as("sorted"))
      .select(col("cluster_id"),
        transform(col("sorted"), p => p.getField("cx")).as("centroid"))

  /** `iters` unrolled Lloyd iterations (assign → update → assign → …);
    * returns the FINAL assignment (id, embedding, cluster_id) as one
    * declarative plan. Callers derive sizes / final centroids from it. */
  def fit(emb: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int): DataFrame = {
    var cent = initCentroids(emb, idCol, embCol, k)
    var assigned = assign(emb, cent, idCol, embCol)
    for (_ <- 2 to iters) {
      cent = update(assigned, embCol)
      assigned = assign(emb, cent, idCol, embCol)
    }
    assigned
  }
}
