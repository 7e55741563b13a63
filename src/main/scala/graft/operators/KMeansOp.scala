package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over embedding columns — the centroid
  * TRAINING step that [[graft.queries.ExtensionQueries]]'s IVF ANN
  * routing consumes (ann_ivf_topk uses label-derived centroids; a real
  * index trains them).
  *
  * Spark-first shape — the driver touches only k·d centroid SCALARS per
  * iteration, never data:
  *  - assignment: the k centroids are INLINED as literals, so
  *    nearest-centroid is a map-only strict-left-fold distance + an
  *    `array_min` argmin per row — no join, no aggregate, no exchange;
  *    embeds in whole-stage codegen ([[assignLiteral]]).
  *  - update: posexplode to (cluster, dim) → per-dim mean. Sums run in
  *    DECIMAL(38,18): decimal addition is exact, hence order-independent
  *    — the mean is bit-identical no matter how partitions combine
  *    (same trick as the IVF centroid aggregate), so the DuckDB oracle
  *    reproduces every coordinate digit-for-digit.
  *  - init: the k smallest vec_ids (deterministic; a production run
  *    would use k-means‖ sampling — the plan shape downstream is
  *    identical).
  *
  * At 100 TB: per iteration one map-only scan + one (cluster, dim)-keyed
  * aggregate of k·d cells (partial-aggregated map-side) — the corpus is
  * never shuffled; centroids (k·d doubles) ride the plan as literals,
  * the same smallness bound as a broadcast. Distance math is
  * zip_with/aggregate folds (engine-portable IEEE, no BLAS dependency).
  * [[assign]] keeps the broadcast-frame form for callers whose
  * centroids live in a table (e.g. AnnIndex's frozen codebooks).
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

  /** Map-only assignment against LITERAL centroids: the k centroid
    * arrays are inlined into the expression, so nearest-centroid is a
    * pure per-row map — NO crossJoin, NO aggregate, NO exchange. This
    * is the 100 TB shape for the training loop's hot pass: the previous
    * broadcast-join + argmin-aggregate form shuffled one partial row
    * per vector per iteration; this shuffles nothing (the only
    * remaining exchange in a Lloyd iteration is [[update]]'s k·d-cell
    * aggregate, map-combined). Selection arithmetic is identical:
    * `array_min` over struct(d, cluster_id) is the same lexicographic
    * (d, cluster_id) argmin the aggregate form computed, on the same
    * strict-fold distances. */
  def assignLiteral(emb: DataFrame, idCol: String, embCol: String,
      cents: Seq[(Int, Seq[Double])]): DataFrame =
    emb.select(col(idCol), col(embCol),
      codeLiteral(col(embCol), cents).as("cluster_id"))

  /** The literal-centroid nearest-code COLUMN — [[assignLiteral]]'s
    * selection expression alone, for callers that compute SEVERAL codes
    * per row (a coarse cell plus per-subspace PQ codes) in one map-only
    * projection instead of one assignment join per model. */
  def codeLiteral(embCol: Column,
      cents: Seq[(Int, Seq[Double])]): Column =
    array_min(array(cents.map { case (cid, c) =>
      struct(sqDist(embCol, typedLit(c)).as("d"),
        lit(cid).as("cluster_id"))
    }: _*)).getField("cluster_id")

  /** Collect a (cluster_id, centroid) frame to the literal form —
    * k·d scalars, the same smallness bound as the broadcast it
    * replaces. Doubles round-trip the driver exactly, so literal-based
    * assignment is bit-identical to joining the frame. The centroid
    * column is cast to array<double> first: the broadcast-join form
    * this replaced coerced array<float> input implicitly, and getSeq
    * would otherwise ClassCastException at encoding time. */
  private[operators] def collectCents(cents: DataFrame): Seq[(Int, Seq[Double])] =
    cents.select(col("cluster_id"),
        col("centroid").cast("array<double>").as("centroid"))
      .collect().toSeq.map { r =>
        (r.getAs[Number]("cluster_id").intValue(),
          r.getSeq[Double](r.fieldIndex("centroid")))
      }.sortBy(_._1)

  /** `iters` Lloyd iterations (assign → update → assign → …); returns
    * the FINAL assignment (id, embedding, cluster_id). Each iteration's
    * centroids are collected driver-side (k·d scalars — the same
    * smallness argument as the D7 registry broadcast) and inlined, so
    * every assignment pass is map-only over the corpus and the per-
    * iteration exchange is just [[update]]'s k·d-cell aggregate. The
    * corpus itself never moves. */
  def fit(emb: DataFrame, idCol: String, embCol: String, k: Int,
      iters: Int): DataFrame = {
    var cents = collectCents(initCentroids(emb, idCol, embCol, k))
    var assigned = assignLiteral(emb, idCol, embCol, cents)
    for (_ <- 2 to iters) {
      cents = collectCents(update(assigned, embCol))
      assigned = assignLiteral(emb, idCol, embCol, cents)
    }
    assigned
  }
}
