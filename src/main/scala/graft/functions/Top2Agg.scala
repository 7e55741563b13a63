package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.6 "UDF/UDAF/UDTF surface"): the largest and
  * second-largest value per group in one pass with constant-size state —
  * the shape every "keep the best k" custom aggregate takes. `merge` is
  * associative and commutative, so Spark plans it with partial
  * aggregation (map-side combine before the shuffle) exactly like a
  * builtin — a custom aggregate that forced all rows to the reducer would
  * be unusable at 100 TB. Comparisons only, no float arithmetic, so the
  * result is bit-exact and order-independent.
  *
  * Empty slots are NegativeInfinity sentinels (inputs here are positive
  * prices); the query maps a sentinel second slot to SQL NULL. */
object Top2Agg extends Aggregator[Double, (Double, Double), (Double, Double)] {
  private val Empty = Double.NegativeInfinity

  override def zero: (Double, Double) = (Empty, Empty)

  override def reduce(b: (Double, Double), v: Double): (Double, Double) =
    if (v > b._1) (v, b._1) else if (v > b._2) (b._1, v) else b

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) = {
    val best = math.max(a._1, b._1)
    val second = math.max(math.min(a._1, b._1), math.max(a._2, b._2))
    (best, second)
  }

  override def finish(r: (Double, Double)): (Double, Double) = r

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
  override def outputEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
}
