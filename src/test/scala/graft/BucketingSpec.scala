package graft

import org.apache.spark.sql.functions._

/** Bucketed tables: the co-located-join path (SURVEY.md "Partitioning &
  * shuffle" — pre-shuffle the big fact once at write time, then joins on
  * the bucket key need no Exchange). This is the 100 TB join strategy for
  * repeatedly-joined fact tables.
  */
class BucketingSpec extends SparkSuite {

  test("join of co-bucketed tables plans without a shuffle") {
    // default warehouse dir (static conf); tables dropped in finally
    Tables.orders(spark, Sf)
      .write.mode("overwrite")
      .bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, Sf)
      .write.mode("overwrite")
      .bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    try {
      // disable broadcast so the join would otherwise shuffle both sides
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      // bucketed scan satisfies the join's distribution: no Exchange below it
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange hashpartitioning(o_custkey"), p)
      assert(!p.contains("Exchange hashpartitioning(c_custkey"), p)
      // and results agree with the unbucketed join
      val expected = Tables.orders(spark, Sf)
        .join(Tables.customer(spark, Sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
