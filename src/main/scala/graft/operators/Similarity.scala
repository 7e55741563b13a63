package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2.7).
  *
  * Cosine is computed as a strict LEFT FOLD over the dimension axis
  * (`aggregate` over `zip_with` — codegen'd, no UDF, arrays never
  * exploded). The DuckDB oracle mirrors it with
  * `list_reduce(list_transform(...))`, which is also a left fold, so both
  * engines produce bit-identical doubles: same products, same summation
  * order, same final `dot / sqrt(na*nb)` expression. Outputs are rounded
  * to 6 dp and ranked on the rounded value with an id tiebreak, so results
  * are hash-stable.
  *
  * Scale: brute-force top-k is one broadcast of the query set + a linear
  * scan with a per-partition top-k (window over query id) — the right
  * baseline even at 100 TB when the query set is small. The IVF-style
  * variant in [[Dedup.embeddingNearDups]] (hyperplane buckets) is the
  * sublinear path.
  */
object Similarity {

  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Engine-portable cosine (see scaladoc). Inputs must be double arrays. */
  def cosineExact(a: Column, b: Column): Column =
    dotFold(a, b) / sqrt(dotFold(a, a) * dotFold(b, b))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * non-identical candidates, ranked by rounded cosine then id.
    * `cosFn` defaults to the HOF fold; pass the codegen'd
    * [[graft.expressions.CosineSimilarity]] for the hot path — both
    * compute identical bits. */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, q_emb)
      candidates: DataFrame, // (vec_id, embedding)
      k: Int,
      cosFn: (Column, Column) => Column = cosineExact): DataFrame = {
    val scored = candidates
      .crossJoin(broadcast(queries))
      .where(col("q_id") =!= col("vec_id"))
      .withColumn("cos", round(cosFn(col("q_emb"), col("embedding")), 6))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
  }
}
