package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by key salting — the standard remedy when one hot
  * join key would otherwise send most of a 100 TB fact table through a
  * single reducer and the dim side is too large to broadcast outright.
  *
  * Fact rows get a deterministic salt in [0, salts); the dim side is
  * replicated once per salt value (explode of a sequence — dim grows
  * ×salts, fact doesn't move twice). Joining on (key, salt) spreads a hot
  * key's rows over `salts` reducers. Semantics are exactly
  * `fact.join(dim, key)` — the oracle for any salted query is the plain
  * join. AQE's skew-join splitting handles moderate skew on its own;
  * salting is the explicit, planner-independent form for the extreme
  * cases (and composes with AQE).
  */
object SaltedJoin {

  /** `saltExpr` must be deterministic per fact row (e.g.
    * `pmod(col("event_id"), salts)`) so replays and retries salt
    * identically. */
  def join(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
      saltExpr: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt", saltExpr.cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
