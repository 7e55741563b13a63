package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time kernels for the dedup shingle pipeline, shared by the
  * interpreted `eval` and the generated code (the codegen emits one static
  * call per row; the loop inside is JIT-compiled Scala — the win over the
  * HOF formulation is removing the per-ELEMENT interpreted lambda
  * dispatch, which dominated the pipeline's cold cost).
  *
  * Semantics are pinned to the previous built-in formulations (and thus
  * to the DuckDB oracle CTEs, which reproduce them independently):
  *
  *  - [[wordShingles]] ≡ array_distinct(filter(transform(split(text," "),
  *    (_,i) => when(i+2 < n, concat_ws(" ", t(i), t(i+1), t(i+2)))),
  *    notNull)): tokens split on every single space (empty tokens kept,
  *    like Java split with limit -1), word 3-grams joined by one space,
  *    first-occurrence-distinct.
  *  - [[foldHash]] ≡ aggregate over characters of (acc*131 + codepoint)
  *    mod P with acc0 = 0, empty/null → 0 (the `when(length>0)` +
  *    `otherwise(0)` of the HOF version folded in).
  */
object ShingleOps {

  val P: Long = 1000000007L

  /** Temp-function registration fallback (idempotent) for sessions not
    * built with [[graft.GraftExtensions]] — same route as
    * CosineSimilarity.register; the extension entry point registers both
    * as proper catalog functions. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    if (!reg.functionExists(FunctionIdentifier("word_shingles")))
      reg.createOrReplaceTempFunction(
        "word_shingles", exprs => WordShingles(exprs.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("fold_hash")))
      reg.createOrReplaceTempFunction(
        "fold_hash", exprs => FoldHash(exprs.head), "built-in")
    if (!reg.functionExists(FunctionIdentifier("sliding_windows")))
      reg.createOrReplaceTempFunction(
        "sliding_windows",
        exprs => SlidingWindows(exprs(0), exprs(1), exprs(2)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("word_bigram_buckets")))
      reg.createOrReplaceTempFunction(
        "word_bigram_buckets",
        exprs => BigramBuckets(exprs(0), exprs(1)), "built-in")
    if (!reg.functionExists(FunctionIdentifier("word_kgrams")))
      reg.createOrReplaceTempFunction(
        "word_kgrams", exprs => WordKGrams(exprs(0), exprs(1)), "built-in")
  }

  def wordShingles(text: UTF8String): ArrayData = {
    val s = text.toString
    // Java split(" ", -1): every single space is a separator, empty
    // tokens (from runs of spaces) and the trailing empty token kept —
    // identical to Spark's split(text, " ")
    val toks = s.split(" ", -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(16, n))
    var i = 0
    while (i + 2 < n) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Hashed-bigram feature buckets of a text: for each adjacent token
    * pair, the [[foldHash]] of "tokA tokB" taken mod `buckets` — WITHOUT
    * materializing the concatenated bigram strings. Arithmetic is
    * exactly foldHash over (chars of A, ' ', chars of B), so the result
    * is bit-identical to `fold_hash(concat(a, ' ', b)) % buckets` (and
    * to the DuckDB oracle that spells the same fold); the win is purely
    * physical — no per-bigram string allocation, no per-element HOF
    * lambda dispatch (measured 3.5 s → the array-scan floor on the DSIR
    * feature pass at sf0.1). Multiplicity kept (NOT distinct): DSIR
    * counts feature occurrences. */
  def bigramBuckets(text: UTF8String, buckets: Long): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val n = toks.length
    if (n < 2 || buckets <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i + 1 < n) {
      var acc = 0L
      val a = toks(i)
      val b = toks(i + 1)
      var j = 0
      while (j < a.length) {
        val cp = a.codePointAt(j)
        acc = (acc * 131 + cp) % P
        j += Character.charCount(cp)
      }
      acc = (acc * 131 + 32) % P // the joining space
      j = 0
      while (j < b.length) {
        val cp = b.codePointAt(j)
        acc = (acc * 131 + cp) % P
        j += Character.charCount(cp)
      }
      out(i) = acc % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional word k-grams: element i joins tokens i..i+k-1 with one
    * space, so the array INDEX is the gram's 0-based start position (the
    * substring-dedup tier rides posexplode of this). NOT distinct —
    * multiplicity and position both matter for span detection. Semantics
    * pinned to transform(sequence(0, n-k), i -> concat_ws(" ",
    * slice(split(text, " "), i+1, k))); < k tokens → empty array. */
  def wordKGrams(text: UTF8String, k: Int): ArrayData = {
    val s = text.toString
    val toks = s.split(" ", -1)
    val n = toks.length
    if (k <= 0 || n < k) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - k + 1)
    var i = 0
    while (i + k <= n) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < k) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def foldHash(s: UTF8String): Long = {
    if (s == null) return 0L
    val str = s.toString
    val len = str.length
    var acc = 0L
    var i = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 131 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Distinct word 3-grams of a string column — the codegen'd twin of the
  * split/transform/filter/array_distinct chain (see [[ShingleOps]] for
  * the pinned semantics; reference shingling per SURVEY §2.7). */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    ShingleOps.wordShingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.ShingleOps.wordShingles($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** Hashed-bigram feature buckets — codegen'd twin of building adjacent-
  * token bigram strings and bucketing their [[FoldHash]], with the
  * intermediate strings never materialized
  * (see [[ShingleOps.bigramBuckets]] for the pinned semantics).
  * Accepts an int or bigint bucket count, so the SQL form
  * `word_bigram_buckets(text, 1024)` works on a plain integer literal
  * like any builtin. */
case class BigramBuckets(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType &&
        (right.dataType == LongType || right.dataType == IntegerType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "word_bigram_buckets expects (string, int/bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_bigram_buckets"

  override def nullSafeEval(t: Any, b: Any): Any =
    ShingleOps.bigramBuckets(t.asInstanceOf[UTF8String],
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, b) => s"graft.expressions.ShingleOps.bigramBuckets($t, (long) $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BigramBuckets =
    copy(left = newLeft, right = newRight)
}

/** Positional word k-grams — the codegen'd twin of the
  * transform/sequence/slice/concat_ws HOF chain (see
  * [[ShingleOps.wordKGrams]] for the pinned semantics). Array index =
  * 0-based gram start position; not distinct. */
case class WordKGrams(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType &&
        (right.dataType == IntegerType || right.dataType == LongType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "word_kgrams expects (string, int/bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_kgrams"

  override def nullSafeEval(t: Any, k: Any): Any =
    ShingleOps.wordKGrams(t.asInstanceOf[UTF8String],
      k.asInstanceOf[Number].intValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, k) => s"graft.expressions.ShingleOps.wordKGrams($t, (int) $k)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordKGrams =
    copy(left = newLeft, right = newRight)
}

/** Arithmetic char fold (acc*131 + codepoint) mod P — the codegen'd twin
  * of the shingle-id HOF aggregate. Null/empty input folds to 0 (matching
  * the original `when(length > 0, ...).otherwise(0)`), so the expression
  * itself is never null. */
case class FoldHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"fold_hash expects a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "fold_hash"

  override def eval(input: InternalRow): Any =
    ShingleOps.foldHash(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        long ${ev.value} = graft.expressions.ShingleOps.foldHash(
          ${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): FoldHash =
    copy(child = newChild)
}
