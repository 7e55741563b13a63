package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpressionInfo, Literal, RLike, StartsWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType

import graft.expressions.CosineSimilarity

/** The library's `SparkSessionExtensions` entry point (SURVEY.md §4.3
  * "UDF/extension surface") — production wiring for everything the engine
  * injects into a session, usable either programmatically
  * (`builder.withExtensions(new GraftExtensions)`) or by config
  * (`spark.sql.extensions=graft.GraftExtensions`):
  *
  *  - `cosine_sim`: the codegen'd similarity expression, registered as a
  *    proper catalog function (visible to SQL, `call_function`, and
  *    `DESCRIBE FUNCTION`) instead of a per-session temp function.
  *  - [[AnchoredRegexToPrefix]]: optimizer rule, see below.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getCanonicalName,
        "cosine_sim"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        // analysis-time arity error naming the function, not an
        // IndexOutOfBoundsException from exprs(1) (round-3 advice)
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"cosine_sim requires exactly 2 arguments (vector, vector); got ${exprs.length}")
        CosineSimilarity(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[graft.expressions.WordShingles].getCanonicalName,
        "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"word_shingles requires exactly 1 argument (text); got ${exprs.length}")
        graft.expressions.WordShingles(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("fold_hash"),
      new ExpressionInfo(classOf[graft.expressions.FoldHash].getCanonicalName,
        "fold_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"fold_hash requires exactly 1 argument (string); got ${exprs.length}")
        graft.expressions.FoldHash(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_bigram_buckets"),
      new ExpressionInfo(classOf[graft.expressions.BigramBuckets].getCanonicalName,
        "word_bigram_buckets"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            "word_bigram_buckets requires exactly 2 arguments " +
              s"(text, buckets); got ${exprs.length}")
        graft.expressions.BigramBuckets(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("word_kgrams"),
      new ExpressionInfo(classOf[graft.expressions.WordKGrams].getCanonicalName,
        "word_kgrams"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"word_kgrams requires exactly 2 arguments (text, k); got ${exprs.length}")
        graft.expressions.WordKGrams(exprs(0), exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getCanonicalName,
        "nfc_normalize"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 1)
          throw new IllegalArgumentException(
            s"nfc_normalize requires exactly 1 argument (string); got ${exprs.length}")
        graft.expressions.NfcNormalize(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("sliding_windows"),
      new ExpressionInfo(classOf[graft.expressions.SlidingWindows].getCanonicalName,
        "sliding_windows"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        if (exprs.length != 3)
          throw new IllegalArgumentException(
            "sliding_windows requires exactly 3 arguments " +
              s"(array, size, step); got ${exprs.length}")
        graft.expressions.SlidingWindows(exprs(0), exprs(1), exprs(2))
      }))
    ext.injectOptimizerRule(_ => AnchoredRegexToPrefix)
    // Window-rank top-k idiom → native TopKPerKey (guards in the rule's
    // scaladoc; TopKPlanSpec pins the rewrite + the non-rewrites)
    ext.injectOptimizerRule(_ => graft.plans.RankLimitToTopK)
    // Tier-(c) whole-operator extension: the grouped top-k logical node
    // gets a physical plan (partial → shuffle ≤k/key → final), see
    // graft.plans.TopKPerKey.
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

/** Rewrites `col RLIKE '^<literal>'` to `StartsWith(col, <literal>)` when
  * the pattern after the anchor is a pure literal (no regex
  * metacharacters). Semantically exact: RLike is an unanchored regex FIND,
  * so `^abc` holds iff the string starts with "abc"; null propagation is
  * identical on both sides.
  *
  * Why it earns its place: Spark's own `LikeSimplification` does this for
  * LIKE patterns but nothing does it for RLIKE — and a regex-heavy engine
  * (language ID, PII scrubbing, log routing) writes anchored-prefix RLIKEs
  * all the time. `StartsWith` is codegen-simple AND becomes a
  * `StringStartsWith` pushed filter at the parquet scan, so min/max-based
  * row-group skipping applies — at 100 TB the difference between
  * evaluating a regex on every row and not reading most row groups. */
object AnchoredRegexToPrefix extends Rule[LogicalPlan] {
  /** Characters with no special meaning in a Java regex. Conservative by
    * construction: anything outside this set leaves the RLike untouched. */
  private val SafeLiteralChars =
    (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ " _,:;@#/%&'-").toSet

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // child must be DEFAULT-collation string too: collation-aware
      // StartsWith would diverge from RLike's binary regex semantics on a
      // case-insensitive-collated column (round-3 advice)
      case r @ RLike(child, Literal(pat, t))
          if t == StringType && pat != null && child.dataType == StringType =>
        val s = pat.toString
        if (s.startsWith("^") && s.drop(1).forall(SafeLiteralChars)) {
          StartsWith(child, Literal(s.drop(1)))
        } else r
    }
}
