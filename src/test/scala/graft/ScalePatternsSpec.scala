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
