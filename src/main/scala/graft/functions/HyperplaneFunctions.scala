package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Row-level hyperplane-LSH kernel shared by interpreted eval and generated
  * code.
  *
  * The ±1 plane coefficients depend only on (plane, dimension) — the parity
  * of the first md5 nibble of "p:d", exactly the arithmetic the DuckDB
  * oracle replays (SimilarityQueries.lshTopKSql) — so the sign matrix is
  * computed ONCE per (planes, dims) shape and cached; each row then costs
  * planes×dims fused multiply-adds inside whole-stage codegen. The HOF
  * formulation of the same bucket recomputed 256 interpreted md5 calls per
  * row — and, inlined into a broadcast-nested-loop join condition, per
  * candidate×probe PAIR (observed 100× blowup in the bench).
  */
object HyperplaneOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Double]]]()

  private def signs(planes: Int, dims: Int): Array[Array[Double]] =
    cache.computeIfAbsent((planes, dims), { _ =>
      val md = MessageDigest.getInstance("MD5")
      Array.tabulate(planes, dims) { (p, d) =>
        md.reset()
        val digest = md.digest(s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first hex char = high nibble of byte 0; even value -> +1
        if (((digest(0) >>> 4) & 1) == 0) 1.0 else -1.0
      }
    })

  def bucket(emb: ArrayData, planes: Int): Int = {
    val n = emb.numElements()
    val sg = signs(planes, n)
    var b = 0
    var p = 0
    while (p < planes) {
      val row = sg(p)
      var acc = 0.0
      var d = 0
      while (d < n) { acc += emb.getFloat(d).toDouble * row(d); d += 1 }
      if (acc > 0.0) b |= 1 << p
      p += 1
    }
    b
  }
}

/** Native Catalyst expression: `hyperplane_bucket(array<float>, planes) -> int`.
  * Values are identical to the md5-parity HOF form, so the DuckDB oracle is
  * unchanged.
  */
case class HyperplaneBucket(child: Expression, planes: Int) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes > 0 && planes <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, planes in 1..30), got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    HyperplaneOps.bucket(a.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneOps.bucket($c, $planes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
