package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level token-statistics kernel shared by interpreted eval and
  * generated code.
  *
  * `maxMultiplicity` is value-identical to the HOF form the DuckDB oracles
  * replay — `array_max(transform(array_distinct(tk), d -> size(filter(tk,
  * t -> t = d))))`, i.e. the count of the most frequent token — but runs
  * as one native sort + run-length pass (O(n log n)) instead of an
  * interpreted O(distinct × n) nested-lambda scan, which dominated
  * `text_quality_flags` wall time (~2 000 interpreted string comparisons
  * per row). Empty input is handled by the caller (the HOF form yields
  * NULL there; the query guards with `size(tk) = 0`).
  */
object TokenOps {
  def maxMultiplicity(tokens: ArrayData): Int = {
    val n = tokens.numElements()
    if (n == 0) return 0
    val arr = new Array[UTF8String](n)
    var i = 0
    while (i < n) { arr(i) = tokens.getUTF8String(i); i += 1 }
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    var best = 1
    var run = 1
    i = 1
    while (i < n) {
      if (arr(i).equals(arr(i - 1))) { run += 1; if (run > best) best = run }
      else run = 1
      i += 1
    }
    best
  }
}

/** Native Catalyst expression: `max_token_count(array<string>) -> int`
  * (multiplicity of the most frequent element). Same preference-order
  * rationale as [[MinhashSignature]]: a codegen'd kernel call beats the
  * interpreted nested-HOF equivalent ~10×, with identical values, so the
  * DuckDB oracle is unchanged.
  */
case class MaxTokenMultiplicity(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "max_token_count"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    TokenOps.maxMultiplicity(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenOps.maxMultiplicity($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
