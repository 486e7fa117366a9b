package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-hash kernel for content-defined chunking.
  *
  * Value-identical to the HOF form the DuckDB oracle replays —
  * `filter(transform(sequence(8, n-1), i -> aggregate(sequence(i-7, i), 0L,
  * (a, j) -> (a*31 + ascii(substr(text, j, 1))) % 1000003)), h -> h % 64 = 0)`
  * — but computes each window hash from the previous one via the true
  * rolling recurrence H(i+1) = (H(i) − c_{i-7}·31⁷)·31 + c_{i+1} (mod M):
  * O(1) per position instead of an O(8) interpreted-HOF re-derivation, and
  * the whole scan is one codegen'd kernel call per document. The recurrence
  * preserves the residue exactly (mod is ring-homomorphic over the Horner
  * fold), so boundary positions — and therefore every downstream chunk
  * hash — are bit-identical to the oracle's.
  *
  * Character semantics match Spark's `substr`/`ascii` pair: both are
  * codepoint-based (Spark's `Ascii` evaluates `codePointAt(0)` of the
  * 1-char substring), so the kernel folds over the string's codepoints.
  */
object CdcOps {
  private val Mod = 1000003L
  // 31^7 mod M — the weight of the outgoing character in the 8-wide window.
  private val Pow7: Long = {
    var p = 1L; var k = 0
    while (k < 7) { p = p * 31 % Mod; k += 1 }
    p
  }

  /** 1-based boundary positions i in [8, n-1] where the hash of the
    * trailing 8-codepoint window ≡ 0 (mod 64). Position n is excluded
    * (a boundary there would open an empty tail chunk), matching the
    * HOF form's `sequence(8, n-1)` range.
    */
  def boundaries(text: UTF8String): ArrayData = {
    val cps: Array[Int] = text.toString.codePoints().toArray()
    val n = cps.length
    if (n <= 8) return ArrayData.toArrayData(Array.emptyIntArray)
    var h = 0L
    var k = 0
    while (k < 8) { h = (h * 31 + cps(k)) % Mod; k += 1 }
    val out = new scala.collection.mutable.ArrayBuilder.ofInt
    if (h % 64 == 0) out += 8
    var i = 9
    while (i < n) {
      // window ending at 1-based i: drop codepoint index i-9, add index i-1.
      // |h − c·31⁷| ≤ 1.12e12 and ×31 ≤ 3.5e13 — far inside Long range.
      h = (((h - cps(i - 9) * Pow7) * 31 + cps(i - 1)) % Mod + Mod) % Mod
      if (h % 64 == 0) out += i
      i += 1
    }
    ArrayData.toArrayData(out.result())
  }
}

/** Native Catalyst expression: `cdc_boundaries(string) -> array<int>`
  * (1-based content-defined chunk boundary positions). Same
  * preference-order rationale as [[MaxTokenMultiplicity]]: the codegen'd
  * rolling-hash kernel replaces the interpreted O(8)-per-position HOF
  * `aggregate` that dominated the bench (SURVEY §4 contingency), with
  * identical values, so the DuckDB oracle is unchanged.
  */
case class CdcBoundaries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundaries"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    CdcOps.boundaries(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcOps.boundaries($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

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
