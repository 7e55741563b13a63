package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rewrite: the standard SQL spelling of grouped top-k —
  *
  *   SELECT <cols> FROM (
  *     SELECT *, row_number() OVER (PARTITION BY p ORDER BY o) AS rnk ...)
  *   WHERE rnk <= K          -- and <cols> never mentions rnk
  *
  * — becomes the native [[TopKPerKey]] operator, so users writing the
  * window idiom get the k-bounded-heap physical plan (≤ k rows per key
  * per partition cross the shuffle) without knowing the operator exists.
  * This is the same contract as Spark's own WindowGroupLimit
  * optimization, taken one step further: no per-partition sort and no
  * window machinery at all survive in the rewritten plan.
  *
  * Strict guards — the rewrite fires only when it is a strict identity:
  *  - the Window computes EXACTLY ONE expression: row_number() over the
  *    default (UNBOUNDED PRECEDING, CURRENT ROW) row frame with
  *    non-empty PARTITION BY and ORDER BY (global top-k has better
  *    built-ins; rank()/dense_rank() admit >k survivors on ties);
  *  - the filter bounds that rank attribute by a literal: rnk <= K,
  *    rnk < K, rnk = 1; extra conjuncts move ABOVE the operator (they
  *    commuted past the rank filter already) so long as they don't
  *    reference the rank; IsNotNull(rnk) conjuncts drop (row_number is
  *    non-nullable);
  *  - the projection above never references the rank attribute (the
  *    native operator does not materialize ranks).
  *
  * Ties under a non-total ORDER BY keep an arbitrary k — exactly the
  * window form's semantics (which k ties survive is partition-order
  * dependent there too).
  */
object RankLimitToTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** Literal top-k bound on `rank`, if `e` is one. */
  private def boundOf(e: Expression, rank: Attribute): Option[Int] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rank) => Some(v)
    case LessThan(a: Attribute, Literal(v: Int, IntegerType))
      if a.semanticEquals(rank) => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(v - 1)
    case EqualTo(a: Attribute, Literal(1, IntegerType))
      if a.semanticEquals(rank) => Some(1)
    case EqualTo(Literal(1, IntegerType), a: Attribute)
      if a.semanticEquals(rank) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(parts, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
            _, _, child, _)))
        if parts.nonEmpty && order.nonEmpty &&
          !projList.exists(_.references.contains(alias.toAttribute)) =>
      val rank = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(boundOf(_, rank))
      val residual = conjuncts.filter { c =>
        boundOf(c, rank).isEmpty && (c match {
          case IsNotNull(a: Attribute) if a.semanticEquals(rank) => false
          case _ => true
        })
      }
      if (bounds.isEmpty || bounds.min <= 0 ||
          residual.exists(_.references.contains(rank))) p
      else {
        val topk = TopKPerKey(parts, order, bounds.min, child)
        val filtered = residual match {
          case Nil => topk
          case cs => Filter(cs.reduce(And), topk)
        }
        Project(projList, filtered)
      }
  }
}
