package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: Morton (Z-order) interleave of the low 32
  * bits of two non-negative longs — `z = spread(x) | spread(y) << 1`.
  *
  * Sorting by `z` clusters rows that are close in BOTH dimensions into
  * the same file, which is what makes per-file min/max statistics
  * selective for 2-D box predicates (see
  * [[graft.operators.ZOrderLayout]]). The bit-spread is the standard
  * magic-number doubling sequence — five shift-mask steps per operand,
  * branch-free, codegen'd into the row pipeline (no per-row closure).
  *
  * Both inputs must be in [0, 2^31): the interleave of two 31-bit values
  * fits a positive signed long, so the ordinary LongType sort order IS
  * the Morton order. Out-of-range inputs fail eval loudly rather than
  * silently wrapping.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder_interleave expects (bigint, bigint), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "zorder_interleave"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    if (x < 0L || x > 0x7FFFFFFFL || y < 0L || y > 0x7FFFFFFFL)
      sys.error(s"zorder_interleave inputs must be in [0, 2^31): $x, $y")
    InterleaveBits.spread(x) | (InterleaveBits.spread(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      def spread(in: String, out: String): String =
        s"""
           |long $out = $in & 0xFFFFFFFFL;
           |$out = ($out | ($out << 16)) & 0x0000FFFF0000FFFFL;
           |$out = ($out | ($out << 8)) & 0x00FF00FF00FF00FFL;
           |$out = ($out | ($out << 4)) & 0x0F0F0F0F0F0F0F0FL;
           |$out = ($out | ($out << 2)) & 0x3333333333333333L;
           |$out = ($out | ($out << 1)) & 0x5555555555555555L;
         """.stripMargin
      s"""
         |if ($a < 0L || $a > 0x7FFFFFFFL || $b < 0L || $b > 0x7FFFFFFFL) {
         |  throw new IllegalArgumentException(
         |    "zorder_interleave inputs must be in [0, 2^31)");
         |}
         |${spread(a, sx)}
         |${spread(b, sy)}
         |${ev.value} = $sx | ($sy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {

  /** Spread the low 32 bits of `v` into the even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Register `zorder_interleave` (idempotent) and return the Column. */
  def zorder(spark: org.apache.spark.sql.SparkSession)(
      a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("zorder_interleave")))
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        "zorder_interleave",
        exprs => InterleaveBits(exprs(0), exprs(1)), "built-in")
    org.apache.spark.sql.functions.call_function("zorder_interleave", a, b)
  }
}
