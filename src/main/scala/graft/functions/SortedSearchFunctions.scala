package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Binary-search kernels over ascending long arrays, shared by interpreted
  * eval and generated code.
  *
  * These exist for the as-of join family: its grouped-dim shape (one sorted
  * per-key array, probe side never expands) previously resolved each probe
  * with `array_max(filter(dates, d -> d <= ts))` — a full O(K) scan of the
  * key's array per probe row, with an interpreted lambda. Under a hot key
  * (one customer owning ~10% of orders, ~10% of events probing it) that is
  * M·K work concentrated in one task — the classic skew scale-killer. A
  * binary search is O(log K) per probe: the same hot key costs M·log K,
  * which no realistic skew turns into a bottleneck.
  *
  * Null slots are the caller's responsibility: the intended producer is
  * `sort_array(collect_list(...))`, and `collect_list` never emits nulls
  * (Spark skips them), so the kernels read with getLong unconditionally.
  */
object SortedSearch {
  /** Index of the greatest element <= key, or -1 when none. */
  def floorIndex(a: ArrayData, key: Long): Int = {
    var lo = 0
    var hi = a.numElements() - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) <= key) { res = mid; lo = mid + 1 }
      else hi = mid - 1
    }
    res
  }

  /** Index of the least element strictly > key, or -1 when none. */
  def ceilStrictIndex(a: ArrayData, key: Long): Int = {
    var lo = 0
    var hi = a.numElements() - 1
    var res = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (a.getLong(mid) > key) { res = mid; hi = mid - 1 }
      else lo = mid + 1
    }
    res
  }
}

/** Shared shape of the two sorted-search expressions: `(array<bigint>,
  * bigint) -> bigint` (nullable — "no such element" is NULL, matching what
  * the `array_max(filter(...))` form it replaces returns on an empty
  * filter result).
  */
abstract class SortedSearchExpression extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  /** Kernel index lookup; -1 means no match (→ NULL). */
  protected def searchIndex(a: ArrayData, key: Long): Int
  protected def kernelCall: String

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got " +
        s"${l.simpleString} and ${r.simpleString}")
  }

  override def nullSafeEval(a: Any, k: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val idx = searchIndex(arr, k.asInstanceOf[Long])
    if (idx < 0) null else arr.getLong(idx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, k) => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = $kernelCall($arr, $k);
         |if ($idx < 0) { ${ev.isNull} = true; }
         |else { ${ev.value} = $arr.getLong($idx); }
       """.stripMargin
    })
}

/** Native Catalyst expression: `sorted_floor(array<bigint>, bigint) ->
  * bigint` — the greatest element <= key of an ascending array by binary
  * search, NULL when every element is greater. O(log K) replacement for
  * `array_max(filter(a, x -> x <= k))`.
  */
case class SortedFloor(left: Expression, right: Expression)
    extends SortedSearchExpression {
  override def prettyName: String = "sorted_floor"
  override protected def searchIndex(a: ArrayData, key: Long): Int =
    SortedSearch.floorIndex(a, key)
  override protected def kernelCall: String =
    "graft.functions.SortedSearch.floorIndex"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: `sorted_ceil_strict(array<bigint>, bigint)
  * -> bigint` — the least element strictly > key of an ascending array by
  * binary search, NULL when none. O(log K) replacement for
  * `array_min(filter(a, x -> x > k))`.
  */
case class SortedCeilStrict(left: Expression, right: Expression)
    extends SortedSearchExpression {
  override def prettyName: String = "sorted_ceil_strict"
  override protected def searchIndex(a: ArrayData, key: Long): Int =
    SortedSearch.ceilStrictIndex(a, key)
  override protected def kernelCall: String =
    "graft.functions.SortedSearch.ceilStrictIndex"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
