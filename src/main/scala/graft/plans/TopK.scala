package graft.plans

import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}

/** Public entry for the native grouped top-k operator. Resolves column
  * names against the input's analyzed output and lifts a [[TopKPerKey]]
  * node over it; planning requires [[TopKStrategy]] to be injected (via
  * `graft.GraftExtensions`), otherwise Spark has no physical plan for the
  * node and analysis fails fast with an assertion from the planner.
  *
  * `order` entries are (column, descending?) pairs; include a unique
  * tie-breaker column for deterministic results, same as any top-k.
  */
object TopK {
  def perKey(df: DataFrame, keyCols: Seq[String], order: Seq[(String, Boolean)], k: Int): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String) =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"topKPerKey: column '$name' not in ${plan.output.map(_.name).mkString(", ")}"))
    val keys = keyCols.map(attr)
    val ordering = order.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftPlanBridge.ofRows(df.sparkSession, TopKPerKey(keys, ordering, k, plan))
  }
}
