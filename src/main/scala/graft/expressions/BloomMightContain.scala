package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native probe expression for a pre-shuffle Bloom-filter join prune:
  * `bloom_might_contain(key, filterBytes)` where `filterBytes` is a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]] literal (the
  * build side's key set, produced by `df.stat.bloomFilter`).
  *
  * The filter deserializes ONCE per task (lazy, from the foldable
  * right child), then each row is a branch-free multi-hash probe —
  * false positives possible (caught by the real join that follows),
  * false negatives never (the join's result is exact). Codegen
  * references the deserialized filter object directly via
  * `addReferenceObj`, so the hot path is `bloom.mightContainLong(key)`
  * inside whole-stage codegen — no closure, no per-row deserialization.
  *
  * This is the manual form of Spark's own injected runtime bloom filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`): making it an
  * explicit operator lets the engine prune a 100 TB probe side BEFORE
  * its shuffle when the dim is too big to broadcast but its key set
  * fits a few megabytes of bits.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == BinaryType &&
        right.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "bloom_might_contain expects (bigint, foldable binary), got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(InternalRow.empty).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override def eval(input: InternalRow): Any = {
    val k = left.eval(input)
    if (k == null) false
    else bloom.mightContainLong(k.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bloomRef = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    val leftGen = left.genCode(ctx)
    ev.copy(code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = false;
        boolean ${ev.value} = !${leftGen.isNull} &&
          $bloomRef.mightContainLong(${leftGen.value});
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
