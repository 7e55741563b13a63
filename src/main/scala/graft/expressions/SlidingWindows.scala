package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Table-generating expression (custom Catalyst `Generator`): emits one
  * row per sliding window over an array — `sliding_windows(arr, size,
  * step)` → rows of (win_idx, window), windows starting at 0, step,
  * 2·step, … while the start is in range; the trailing window may be
  * partial. The extension tier BETWEEN scalar expressions (WordShingles,
  * FoldHash, …) and whole-operator plans (TopKPerKey): the analyzer
  * plans it into the same `Generate` node as built-in explode/inline,
  * so it composes with lateral references, outer generation, and column
  * pruning for free — the idiomatic way to add a UDTF-shaped operator
  * without touching the planner.
  *
  * Null/empty input generates no rows (explode semantics). Size/step
  * must be positive integer literals — violations are ANALYSIS-time
  * errors, not runtime task failures.
  *
  * Context windows are the canonical use (overlapping training windows
  * over token arrays, c.f. Curation.chunk's arithmetic formulation —
  * the generator subsumes it whenever per-window ROWS are wanted
  * rather than per-window scalars). Evaluation is row-at-a-time inside
  * `GenerateExec` (CodegenFallback — custom generators do not join
  * whole-stage codegen; the per-row work is one array slice per
  * window, no interpreted per-element lambdas).
  *
  * Reference provenance: none — charter extension (SURVEY.md §2.7).
  */
case class SlidingWindows(child: Expression, size: Expression,
    step: Expression) extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, size, step)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SlidingWindows =
    copy(child = newChildren(0), size = newChildren(1), step = newChildren(2))

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_, _) =>
      val ok = Seq(size, step).forall(e =>
        e.foldable && e.dataType == IntegerType && {
          val v = e.eval()
          v != null && v.asInstanceOf[Int] > 0
        })
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "sliding_windows(arr, size, step): size and step must be " +
          "positive integer literals")
    case other => TypeCheckResult.TypeCheckFailure(
      s"sliding_windows requires an array input, got ${other.catalogString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("win_idx", IntegerType, nullable = false),
    StructField("window", ArrayType(elemType), nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null) return Nil
    val n = arr.numElements()
    if (n == 0) return Nil
    val sz = size.eval().asInstanceOf[Int]
    val st = step.eval().asInstanceOf[Int]
    val et = elemType
    val elems = arr.toObjectArray(et)
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var start = 0
    var idx = 0
    while (start < n) {
      val end = math.min(start + sz, n)
      out += InternalRow(idx,
        new GenericArrayData(java.util.Arrays.copyOfRange(
          elems.asInstanceOf[Array[AnyRef]], start, end)))
      start += st
      idx += 1
    }
    out
  }
}
