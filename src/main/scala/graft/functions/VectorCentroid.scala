package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mutable-free centroid buffer: element-wise sums plus row count. */
case class CentroidBuf(sums: Array[Double], n: Long)

/** Typed aggregator computing the element-wise mean of float vectors
  * (SURVEY.md §2 "Custom typed agg"). Partial aggregation happens map-side
  * (reduce), merge combines partials — so at 100 TB each partition ships one
  * 64-double buffer per group, not its rows.
  */
class VectorCentroid extends Aggregator[Seq[Float], CentroidBuf, Seq[Double]] {

  override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: CentroidBuf, v: Seq[Float]): CentroidBuf = {
    if (v == null) return b
    if (b.n == 0L) {
      val s = new Array[Double](v.length)
      var i = 0
      while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
      CentroidBuf(s, 1L)
    } else {
      val s = b.sums
      val m = math.min(s.length, v.length)
      var i = 0
      while (i < m) { s(i) += v(i).toDouble; i += 1 }
      CentroidBuf(s, b.n + 1L)
    }
  }

  override def merge(a: CentroidBuf, b: CentroidBuf): CentroidBuf = {
    if (a.n == 0L) b
    else if (b.n == 0L) a
    else {
      val s = a.sums
      val m = math.min(s.length, b.sums.length)
      var i = 0
      while (i < m) { s(i) += b.sums(i); i += 1 }
      CentroidBuf(s, a.n + b.n)
    }
  }

  override def finish(r: CentroidBuf): Seq[Double] =
    if (r.n == 0L) Seq.empty else r.sums.map(_ / r.n).toSeq

  override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
