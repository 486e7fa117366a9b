package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Row-level graph kernels shared by interpreted eval and generated code.
  *
  * Both replace interpreted paths that dominated `graph_triangle_count`
  * wall time: the C(k, 2) intra-order pair expansion was a nested
  * `transform(…, slice(…))` HOF (lambda functions are interpreted, and
  * `slice` copies O(k) per element → O(k²) allocations per row), and the
  * per-edge neighborhood intersection was `array_intersect` (a hash set
  * allocated per call). The kernels are value-identical to the HOF forms
  * the DuckDB oracles replay, so the oracles are unchanged.
  */
object GraphOps {
  /** All ordered pairs (a(i), a(j)), i < j, of a sorted distinct array —
    * u < v holds because the input is ascending.
    */
  def pairCombos(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val u = a.getLong(i)
      var j = i + 1
      while (j < n) { out(k) = InternalRow(u, a.getLong(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** |a ∩ b| for two ascending long arrays — one merge pass, no
    * allocation (vs array_intersect's per-call hash set + result array).
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** Native Catalyst expression: `pair_combos(array<bigint>) ->
  * array<struct<u bigint, v bigint>>` — the C(k, 2) unordered-pair
  * expansion of a sorted distinct array, u < v by construction.
  */
case class PairCombinations(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("u", LongType, nullable = false),
      StructField("v", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "pair_combos"

  // containsNull arrays are rejected at ANALYSIS: the kernel reads
  // elements with getLong, which would silently treat a null slot as 0
  // for an external SQL caller (the registry exposes this function
  // generally, not just to the null-free internal graph plans)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, false) => TypeCheckResult.TypeCheckSuccess
    case ArrayType(LongType, true) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-null elements " +
        "(wrap the argument in array_compact or filter(x, x -> x IS NOT NULL))")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    GraphOps.pairCombos(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraphOps.pairCombos($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native Catalyst expression: `sorted_intersect_count(array<bigint>,
  * array<bigint>) -> int` — |a ∩ b| of two ascending arrays by merge scan.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_count"

  // same analysis-time containsNull rejection as pair_combos: getLong on a
  // null slot would silently read 0 for an external caller
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, false) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> with non-null elements " +
        "(wrap the argument in array_compact or filter(x, x -> x IS NOT NULL))")
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    GraphOps.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.GraphOps.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
