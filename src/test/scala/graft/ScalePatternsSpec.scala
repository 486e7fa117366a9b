package graft

import org.apache.spark.sql.functions._

/** Scale patterns that don't change results, only plans and data distribution:
  * skew salting, caching, console sink. Each is asserted equal to its
  * unsalted/uncached twin so the pattern is safe to apply at 100 TB.
  */
class ScalePatternsSpec extends SparkSuite {

  test("salted skew join equals the plain join") {
    import spark.implicits._
    // one hot key (every lineitem of flag 'N' piles onto its suppkey):
    // salt the probe side N ways, replicate the build side N times
    val salt = 8
    val li = Tables.lineitem(spark, Sf)
      .select(col("l_suppkey"), col("l_quantity"))
      .withColumn("salt", (rand(42) * salt).cast("int")) // rand only keys the split
    val sup = Tables.supplier(spark, Sf).select(col("s_suppkey"), col("s_name"))
    val salts = spark.range(salt).select(col("id").cast("int").as("salt"))
    val supSalted = sup.crossJoin(salts)
    val salted = li.join(supSalted,
        col("l_suppkey") === col("s_suppkey") && li("salt") === supSalted("salt"))
      .groupBy("s_suppkey", "s_name")
      .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
    val plain = Tables.lineitem(spark, Sf)
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_suppkey", "s_name")
      .agg(round(sum("l_quantity"), 2).as("qty"), count(lit(1)).as("n"))
    val a = salted.orderBy("s_suppkey").as[(Long, String, Double, Long)].collect().toSeq
    val b = plain.orderBy("s_suppkey").as[(Long, String, Double, Long)].collect().toSeq
    assert(a == b)
  }

  test("AQE splits a skewed join partition at runtime") {
    // The complementary mitigation to manual salting above: AQE's
    // OptimizeSkewedJoin detects an oversized shuffle partition AFTER the
    // map stage runs and splits it into sub-partitions, replicating the
    // matching build rows. Thresholds are lowered to make the toy fixture
    // register as skewed; at 100 TB the defaults (256 MB) do the same job.
    val keys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "24KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "12KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of lineitem piles onto one hot supplier key; the padding
      // column makes the hot partition's bytes cross the lowered threshold
      val li = Tables.lineitem(spark, Sf)
        // the toy file is a single scan task; AQE splits a skewed reduce
        // partition along MAPPER boundaries, so give the shuffle several
        // map outputs to split at (a real cluster always has them)
        .repartition(8)
        .select(
          when(col("l_orderkey") % 10 < 9, lit(1L)).otherwise(col("l_suppkey"))
            .as("k"),
          col("l_quantity"),
          concat_ws("", array_repeat(concat_ws(",", col("l_orderkey"),
            col("l_partkey"), col("l_extendedprice"), col("l_shipdate")), 8)).as("pad"))
      val sup = Tables.supplier(spark, Sf)
        .select(col("s_suppkey").as("k"), col("s_name"))
      val joined = li.join(sup, "k").groupBy("s_name")
        .agg(count(lit(1)).as("n"), sum(length(col("pad"))).as("bytes"))
      val rows = joined.collect()
      assert(rows.nonEmpty)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan)
      // AQEShuffleRead marks the split partitions "skewed"
      assert(plan.contains("skewed"), plan)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("runtime bloom filter prunes the big side of a selective join") {
    // Third join-scale lever beside salting and AQE skew split: Catalyst's
    // InjectRuntimeFilter builds a bloom filter from the SELECTIVE small
    // side and applies it to the big side's scan, cutting shuffle volume
    // before the join. Size thresholds are lowered for the toy fixture;
    // the defaults fire in exactly this plan shape at cluster scale.
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables.lineitem(spark, Sf).select("l_orderkey", "l_quantity")
      val hot = Tables.orders(spark, Sf)
        .filter(col("o_totalprice") > 400000) // selective creation side
        .select("o_orderkey")
      val joined = li.join(hot, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter") || optimized.contains("BloomFilter"),
        optimized)
      // and the filtered result is still exactly the unfiltered join's
      val plainConf = "spark.sql.optimizer.runtime.bloomFilter.enabled"
      val got = joined.head()
      spark.conf.set(plainConf, "false")
      val want = li.join(hot, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty")).head()
      assert(got == want, s"$got vs $want")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning skips fact partitions at runtime") {
    // The partition-level sibling of the bloom filter: a filter on the dim
    // side becomes a runtime subquery predicate on the fact's PARTITION
    // column, so unneeded partition directories are never read. Static
    // pruning (src_partitioned_pruned) covers literal predicates; this
    // covers predicates only discoverable through the join.
    import java.nio.file.Files
    val base = Files.createTempDirectory("graft_dpp_").toString
    Tables.events(spark, Sf)
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$base/events")
    val fact = spark.read.parquet(s"$base/events")
    // the dim filter column must round-trip through storage: written as an
    // expression over the join key, Catalyst would constant-fold it into a
    // STATIC partition filter (constraint propagation) and DPP would never
    // be needed — read back as opaque data, only a runtime subquery can
    // discover which partitions survive
    Tables.events(spark, Sf)
      .select("event_type").distinct()
      .withColumn("type_len", length(col("event_type")))
      .write.mode("overwrite").parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim")
    val joined = fact
      .join(dim.filter(col("type_len") === "purchase".length), "event_type")
      .agg(count(lit(1)).as("n"))
    val n = joined.head().getLong(0)
    val want = Tables.events(spark, Sf).filter(col("event_type") === "purchase").count()
    assert(n == want)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), plan)
  }

  test("persist() reuses the cached relation and preserves results") {
    val base = Tables.lineitem(spark, Sf)
      .filter(col("l_quantity") > 25)
      .select("l_orderkey", "l_extendedprice")
    val cached = base.persist()
    try {
      val n1 = cached.count()
      // second action over the same cached plan: InMemoryRelation in use
      val agg = cached.agg(count(lit(1))).head().getLong(0)
      assert(n1 == agg)
      assert(cached.queryExecution.withCachedData.toString.contains("InMemoryRelation"))
    } finally cached.unpersist()
  }

  test("console sink accepts the stream [REF A11]") {
    val q = streaming.RecordStream.generator(spark, rowsPerSecond = 2)
      .writeStream.outputMode("append")
      .format("console").option("numRows", "1")
      .start()
    assert(q.isActive)
    q.stop()
    q.awaitTermination(20000)
    assert(!q.isActive)
  }
}
