package graft

import graft.functions.{TDigestBuild, TDigestMergeQuantile, TDigestQuantile, TDigestState}

/** Error-bound and shape tests for the t-digest Aggregator. Pure unit
  * tests against the Aggregator's own reduce/merge/finish (deterministic
  * seeded data), plus one Spark integration pass.
  */
class TDigestSpec extends SparkSuite {

  private def digestOf(td: TDigestQuantile, xs: Seq[Double], chunks: Int): TDigestState = {
    // fold in several chunks and merge, mimicking partial aggregation
    val parts = xs.grouped(math.max(1, xs.size / chunks)).toSeq
    parts.map(_.foldLeft(td.zero)(td.reduce)).reduce(td.merge)
  }

  test("rank error stays within 2% across the quantile range") {
    val rnd = new scala.util.Random(42)
    // log-normal: heavy right tail, the adversarial case for quantile sketches
    val xs = Seq.fill(20000)(math.exp(rnd.nextGaussian()))
    val sorted = xs.sorted
    val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val td = new TDigestQuantile(qs, 100.0)
    val est = td.finish(digestOf(td, xs, chunks = 16))
    qs.zip(est).foreach { case (q, e) =>
      val rank = sorted.count(_ <= e).toDouble / sorted.size
      assert(math.abs(rank - q) < 0.02, s"q=$q est=$e rank=$rank")
    }
  }

  test("state size is bounded by the compression parameter") {
    val rnd = new scala.util.Random(7)
    val xs = Seq.fill(50000)(rnd.nextDouble() * 1e6)
    val td = new TDigestQuantile(Seq(0.5), 100.0)
    val state = digestOf(td, xs, chunks = 32)
    val nCentroids = state.means.size + state.nPending
    // a single greedy k0 pass admits up to ~4*compression clusters (the
    // fully-compacted bound is ~2δ, reached only after repeated merges);
    // the essential property is O(compression), independent of n=50k
    assert(nCentroids <= 4 * 100 + TDigestQuantile.MaxPending,
      s"state grew to $nCentroids centroids for 50k rows")
  }

  test("merge order does not break the accuracy contract") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(10000)(rnd.nextGaussian())
    val td = new TDigestQuantile(Seq(0.5), 100.0)
    val sorted = xs.sorted
    Seq(2, 8, 64).foreach { chunks =>
      val e = td.finish(digestOf(td, xs, chunks))
      val rank = sorted.count(_ <= e.head).toDouble / sorted.size
      assert(math.abs(rank - 0.5) < 0.02, s"chunks=$chunks est=${e.head} rank=$rank")
    }
  }

  test("the declared query's accuracy booleans hold on the fixture") {
    val rows = SparkEntry.queries("agg_tdigest_quantiles")(spark, Sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_within_2pct"), r.toString)
      assert(r.getAs[Boolean]("p90_within_2pct"), r.toString)
    }
  }

  test("build -> persist -> merge keeps the rank-error contract (rollup pair)") {
    // the two-level pipeline: TDigestBuild finishes slice digests (pending
    // folded in), TDigestMergeQuantile folds the persisted states back to
    // quantiles — the merged estimate must keep the same 2% rank bound as
    // a digest built over the whole set in one pass
    val rnd = new scala.util.Random(29)
    val xs = Seq.fill(20000)(rnd.nextGaussian() * 50 + 700)
    val build = new TDigestBuild(100.0)
    val slices = xs.grouped(2500).map { slice =>
      build.finish(slice.foldLeft(build.zero)(build.reduce))
    }.toSeq
    // every persisted slice is canonical: pending buffer empty
    slices.foreach(st => assert(st.nPending == 0, st.nPending.toString))
    val mq = new TDigestMergeQuantile(Seq(0.1, 0.5, 0.9), 100.0)
    val est = mq.finish(slices.foldLeft(mq.zero)(mq.reduce))
    val sorted = xs.sorted
    Seq(0.1, 0.5, 0.9).zip(est).foreach { case (q, e) =>
      val rank = sorted.count(_ <= e).toDouble / sorted.size
      assert(math.abs(rank - q) < 0.02, s"q=$q est=$e rank=$rank")
    }
  }
}
