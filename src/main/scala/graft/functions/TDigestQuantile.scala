package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Serializable t-digest state: compressed centroids plus an uncompressed
  * per-row buffer (fixed capacity [[TDigestQuantile.MaxPending]], first
  * `nPending` slots valid). Primitive arrays, not Seq: `reduce` runs once
  * per input row, and a boxed `x +: pending` there cost an O(pending)
  * copy + box per row (~100× the arithmetic).
  */
case class TDigestState(
    means: Array[Double],
    weights: Array[Double],
    pending: Array[Double],
    nPending: Int)

/** Bounded-memory approximate quantiles: a merging t-digest (Dunning &
  * Ertl, "Computing Extremely Accurate Quantiles Using t-Digests", 2019 —
  * public algorithm). Memory is O(compression) regardless of input size —
  * the 100 TB answer to exact `percentile`, whose state is O(n) per group.
  *
  * Distributed shape: `reduce` folds rows into a bounded pending buffer,
  * `merge` concatenates centroid sets and recompresses — both
  * associative-enough for Spark's partial aggregation (map-side combine),
  * so each executor ships at most ~2·compression centroids per group.
  *
  * The scale function is the classic k₀ bound (cluster weight ≤
  * 4·W·q·(1-q)/δ): accurate at the tails, coarser mid-distribution.
  * Estimates depend on partition merge order (like every t-digest), so
  * oracle-facing queries expose the *accuracy contract* (estimate within
  * tolerance of exact) rather than the raw estimate; rank-error bounds are
  * pinned in TDigestSpec.
  */
class TDigestQuantile(qs: Seq[Double], compression: Double = 100.0)
    extends Aggregator[Double, TDigestState, Seq[Double]] {

  import TDigestQuantile.MaxPending

  override def zero: TDigestState =
    TDigestState(Array.emptyDoubleArray, Array.emptyDoubleArray,
      new Array[Double](MaxPending), 0)

  override def reduce(b: TDigestState, x: Double): TDigestState = {
    // in-place append into the fixed-capacity buffer — the per-row hot
    // path allocates nothing beyond the state wrapper. The encoder can
    // hand back a short array after a shuffle round-trip; re-grow then.
    val p =
      if (b.pending.length >= MaxPending) b.pending
      else java.util.Arrays.copyOf(b.pending, MaxPending)
    p(b.nPending) = x
    val n = b.nPending + 1
    if (n >= MaxPending) compressed(centroids(b), p, n)
    else TDigestState(b.means, b.weights, p, n)
  }

  override def merge(a: TDigestState, b: TDigestState): TDigestState =
    compressed(centroids(a) ++ centroids(b),
      java.util.Arrays.copyOf(a.pending, a.nPending) ++
        java.util.Arrays.copyOf(b.pending, b.nPending), a.nPending + b.nPending)

  override def finish(b: TDigestState): Seq[Double] = {
    val cs = compress(centroids(b) ++
      java.util.Arrays.copyOf(b.pending, b.nPending).map((_, 1.0)))
    qs.map(quantile(cs, _))
  }

  override def bufferEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  private def centroids(s: TDigestState): Seq[(Double, Double)] =
    s.means.indices.map(i => (s.means(i), s.weights(i)))

  private def compressed(cs: Seq[(Double, Double)], pending: Array[Double],
      n: Int): TDigestState = {
    val merged = compress(cs ++ pending.iterator.take(n).map((_, 1.0)))
    TDigestState(merged.map(_._1).toArray, merged.map(_._2).toArray,
      new Array[Double](MaxPending), 0)
  }

  /** Sort by mean, then greedily absorb neighbors while the merged cluster
    * stays under the k₀ weight limit for its quantile midpoint.
    */
  private[functions] def compress(cs: Seq[(Double, Double)]): Seq[(Double, Double)] = {
    if (cs.isEmpty) return cs
    val sorted = cs.sortBy(_._1)
    val total = sorted.iterator.map(_._2).sum
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
    var (m, w) = sorted.head
    var cum = 0.0 // total weight already emitted
    sorted.tail.foreach { case (m2, w2) =>
      val q = (cum + (w + w2) / 2) / total
      val limit = 4.0 * total * q * (1.0 - q) / compression
      if (w + w2 <= limit) {
        m = (m * w + m2 * w2) / (w + w2); w += w2
      } else {
        out += ((m, w)); cum += w; m = m2; w = w2
      }
    }
    out += ((m, w))
    out.toSeq
  }

  /** Linear interpolation between centroid weight-midpoints. */
  private[functions] def quantile(cs: Seq[(Double, Double)], q: Double): Double = {
    if (cs.isEmpty) return Double.NaN
    val total = cs.iterator.map(_._2).sum
    val target = q * total
    var cum = 0.0
    val pts = cs.map { case (m, w) => val c = cum + w / 2; cum += w; (c, m) }
    if (target <= pts.head._1) return cs.head._1
    if (target >= pts.last._1) return cs.last._1
    pts.sliding(2).foreach {
      case Seq((c1, m1), (c2, m2)) =>
        if (target >= c1 && target <= c2) {
          val f = if (c2 == c1) 0.0 else (target - c1) / (c2 - c1)
          return m1 + f * (m2 - m1)
        }
      case _ =>
    }
    cs.last._1
  }
}

object TDigestQuantile {
  /** Rows buffered uncompressed in `reduce` before a compression pass. */
  val MaxPending = 256
}

/** Partial-building half of the persisted two-level rollup: identical fold
  * to [[TDigestQuantile]], but `finish` returns the compressed STATE
  * itself (pending buffer folded in, so the persisted struct is canonical)
  * instead of quantiles — the digest becomes a first-class column value
  * that can be written to a partials table and merged later by
  * [[TDigestMergeQuantile]], the same pre-agg/merge architecture as
  * `hll_sketch_agg`/`hll_union_agg` but for quantiles.
  */
class TDigestBuild(compression: Double = 100.0)
    extends Aggregator[Double, TDigestState, TDigestState] {
  private val td = new TDigestQuantile(Nil, compression)
  override def zero: TDigestState = td.zero
  override def reduce(b: TDigestState, x: Double): TDigestState = td.reduce(b, x)
  override def merge(a: TDigestState, b: TDigestState): TDigestState = td.merge(a, b)
  // merge-with-zero = one compression pass that absorbs the pending buffer
  override def finish(b: TDigestState): TDigestState = td.merge(b, td.zero)
  override def bufferEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
  override def outputEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
}

/** Merging half of the persisted rollup: folds already-built digest states
  * (read back from the partials table) and finishes to quantile estimates.
  * Merging compressed digests is the t-digest's designed composition — the
  * result is equivalent (up to compression reordering) to a digest built
  * over the union, which is what makes the partials INCREMENTAL: a new
  * day's partial merges in without touching historical rows.
  */
class TDigestMergeQuantile(qs: Seq[Double], compression: Double = 100.0)
    extends Aggregator[TDigestState, TDigestState, Seq[Double]] {
  private val td = new TDigestQuantile(qs, compression)
  override def zero: TDigestState = td.zero
  override def reduce(b: TDigestState, x: TDigestState): TDigestState = td.merge(b, x)
  override def merge(a: TDigestState, b: TDigestState): TDigestState = td.merge(a, b)
  override def finish(b: TDigestState): Seq[Double] = td.finish(b)
  override def bufferEncoder: Encoder[TDigestState] = Encoders.product[TDigestState]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()
}
