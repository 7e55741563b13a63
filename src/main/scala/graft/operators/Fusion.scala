package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank fusion for multi-tier retrieval (SURVEY.md §2.7).
  *
  * Reciprocal-rank fusion in INTEGER arithmetic: each tier contributes
  * L/(60+rank) with L = lcm(61..70), so every reciprocal is an exact
  * BIGINT and the fused order is oracle-exact by construction — no
  * floating-point 1/(k+r) to diverge between engines. ONE definition
  * shared by the batch hybrid, the served hybrid, and the online
  * serving loop, so "every hybrid tier fuses identically" is enforced
  * by construction rather than by three copies of the formula.
  *
  * Scale shape: both tier inputs are (q_id, doc_id, rank) tables
  * already bounded by their tier's top-k — the full-outer fuse and the
  * per-query window touch ≤ 2k rows per query, never a corpus.
  */
object Fusion {

  /** lcm(61..70): every RRF denominator (60 + rank, rank ≤ 10) divides
    * it exactly, so `RrfLcm div (60 + rnk)` is integer-exact. */
  val RrfLcm = 142813628717760L

  /** Fuse two tiers — `lex` (q_id, doc_id, lex_rnk) and `sem`
    * (q_id, doc_id, sem_rnk) — into the top-`k` per query by integer
    * RRF, doc_id tiebreak. A doc present in one tier only scores that
    * tier's term (the other coalesces to 0). */
  def rrfFuse(lex: DataFrame, sem: DataFrame, k: Int = 5): DataFrame = {
    val fused = lex.join(sem, Seq("q_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(expr(s"$RrfLcm div (60 + lex_rnk)"), lit(0L)) +
          coalesce(expr(s"$RrfLcm div (60 + sem_rnk)"), lit(0L)))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= k)
      .select(col("q_id"), col("rnk"), col("doc_id"), col("rrf"))
  }
}
