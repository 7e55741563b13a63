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

  // Heap ordering for the partial top-k: the MAX element is the WORST
  // candidate (lowest cos; ties broken toward higher vec_id), so the heap
  // head is what k+1'th candidates must beat.
  private val evictFirst: Ordering[(Double, Long)] =
    Ordering.fromLessThan { (a, b) =>
      if (a._1 != b._1) a._1 > b._1 else a._2 < b._2
    }

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * non-identical candidates, ranked by rounded cosine then id.
    * `cosFn` defaults to the HOF fold; pass the codegen'd
    * [[graft.expressions.CosineSimilarity]] for the hot path — both
    * compute identical bits.
    *
    * Scale shape: scoring is a broadcast + linear scan; each input
    * partition reduces to at most k rows per query via bounded heaps
    * (iterator-to-iterator, no shuffle of raw scores), so the shuffle into
    * the final per-query window carries ≤ k·|partitions| rows per query
    * instead of |candidates| — the "partial top-k then merge" plan a
    * 100 TB scan needs. Exact: the global top-k is a subset of the union
    * of per-partition top-ks. */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, q_emb)
      candidates: DataFrame, // (vec_id, embedding)
      k: Int,
      cosFn: (Column, Column) => Column = cosineExact,
      pairFilter: Column = lit(true)): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    // pairFilter may reference columns of BOTH sides (e.g. the
    // hard-negative mining predicate label =!= q_label) — it evaluates
    // in the scan stage right after the broadcast probe, before any
    // heap sees the pair, so a filtered search still returns a full
    // top-k of allowed candidates at the same single-scan cost.
    val scored = candidates
      .crossJoin(broadcast(queries))
      .where(col("q_id") =!= col("vec_id") && pairFilter)
      .select(col("q_id").cast("long"), col("vec_id").cast("long"),
        round(cosFn(col("q_emb"), col("embedding")), 6).as("cos"))
      .as[(Long, Long, Double)]
    val partial = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (q, v, c) =>
        val h = heaps.getOrElseUpdate(q,
          scala.collection.mutable.PriorityQueue.empty(evictFirst))
        if (h.size < k) h.enqueue((c, v))
        else if (c > h.head._1 || (c == h.head._1 && v < h.head._2)) {
          h.dequeue(); h.enqueue((c, v))
        }
      }
      heaps.iterator.flatMap { case (q, h) =>
        h.iterator.map { case (c, v) => (q, v, c) }
      }
    }.toDF("q_id", "vec_id", "cos")
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    partial
      .withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("vec_id"), col("cos"))
  }
}
