package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-at-a-time NFC kernel shared by the interpreted `eval` and the
  * generated code (same pattern as [[ShingleOps]]).
  *
  * Unicode NFC is the normalization every text pipeline runs before
  * hashing or dedup — "café" as `e`+U+0301 and as precomposed U+00E9 are
  * different byte strings that MUST dedup together. The kernel fast-paths
  * already-normalized text (`Normalizer.isNormalized` is a cheap scan
  * that answers yes for all-ASCII, the overwhelming majority of a crawled
  * corpus), so the hot path allocates nothing.
  *
  * Parity: `java.text.Normalizer` NFC and DuckDB's `nfc_normalize` both
  * implement UAX #15 — verified codepoint-identical on combining
  * sequences (U+0301/U+0308 fold into precomposed forms; a combining mark
  * with no composite, e.g. U+0307 after À, stays combining in both).
  */
object NormalizeOps {

  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Temp-function fallback for sessions not built with
    * [[graft.GraftExtensions]] (idempotent; same route as
    * [[ShingleOps.ensureRegistered]]). */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    if (!reg.functionExists(FunctionIdentifier("nfc_normalize")))
      reg.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
  }
}

/** Unicode NFC normalization of a string column — codegen'd (one static
  * call per row, the loop inside JIT-compiled; no interpreted per-char
  * dispatch). Null in → null out via UnaryExpression's null handling. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NormalizeOps.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.NormalizeOps.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
