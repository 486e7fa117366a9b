package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** RocksDB state store provider: the scale path for streaming state (state
  * larger than executor heap spills to disk instead of OOMing). Needs its
  * own session because the provider is fixed per-query at start.
  */
class RocksDBStateSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-rocksdb-test")
    .withExtensions(new plans.GraftExtensions)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming aggregation runs on the RocksDB state store") {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_rocks_").toString
    (0 until 1000).map(i => (i % 7, 1L)).toDF("k", "v")
      .coalesce(1).write.parquet(s"$stage/in.parquet")
    val agg = spark.readStream.schema("k INT, v LONG").parquet(s"$stage/*")
      .groupBy("k").agg(sum("v").as("total"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("rocks_sink").start()
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.table("rocks_sink").as[(Int, Long)].collect().toMap
    assert(got.values.sum == 1000L)
    assert(got.keySet == (0 until 7).toSet)
    // the run actually used RocksDB (provider recorded in the query progress)
    val provider = q.lastProgress.stateOperators.headOption
      .map(_.customMetrics.toString).getOrElse("")
    assert(provider.toLowerCase.contains("rocksdb"), s"metrics: $provider")
  }
}
