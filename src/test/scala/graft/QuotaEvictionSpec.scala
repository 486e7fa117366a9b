package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout
import org.apache.spark.sql.types._

/** Pins the state-hygiene contract of [[streaming.StreamingQueries
  * .quotaEnforce]] (VERDICT r9 #1): a (user, day) budget key must be
  * PHYSICALLY PURGED from the state store once the watermark passes its
  * day's end — asserted by reading the checkpoint back with the batch
  * `statestore` source after the query stops — and must STAY evicted
  * across a restart: a late event for an evicted day is dropped by the
  * EventTimeTimeout late-row filter (the budget never re-opens), while
  * an on-time event for a fresh key is admitted normally.
  */
class QuotaEvictionSpec extends SparkSuite {

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def ts(iso: String) =
    java.sql.Timestamp.from(java.time.Instant.parse(iso))

  private def writeFile(dir: String, name: String, rows: Seq[Row]): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(rows.asJava, evSchema)
    val tmp = s"$dir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    Files.move(part, Paths.get(s"$dir/$name.parquet"))
    Files.walk(Paths.get(tmp)).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.deleteIfExists(p))
    Thread.sleep(5) // distinct mod times => deterministic batch order
  }

  /** Run the quota stream over inDir against ckpt and return every update
    * row emitted THIS run. foreachBatch, not the memory sink: memory-sink
    * queries refuse to recover from a checkpoint, and the restart leg is
    * the point of this spec.
    */
  private def runQuota(inDir: String, ckpt: String): Seq[Row] = {
    import spark.implicits._
    val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    val out = spark.readStream.schema(evSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*")
      .as[streaming.Ev]
      .withWatermark("ts", "0 seconds")
      .groupByKey(e => (e.user_id,
        java.time.Instant.ofEpochMilli(e.ts.getTime)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString))
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(
        streaming.StreamingQueries.quotaFold)
    val q = out.toDF().writeStream.outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = batch.collect()
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", ckpt).start()
    try q.processAllAvailable()
    finally { q.stop(); q.awaitTermination(20000) }
    buf.synchronized(buf.toSeq)
  }

  private def storeKeys(ckpt: String): Set[(Long, String)] =
    spark.read.format("statestore").load(ckpt)
      .select("key.*").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  /** The full eviction scenario (admission → watermark purge → restart
    * with a late row); returns the checkpoint dir so provider-specific
    * tests can inspect the physical state layout. Runs under whatever
    * state-store provider the session is configured with.
    */
  private def evictionScenario(): String = {
    val in = Scratch.dir("graft_quota_in_")
    val ckpt = Scratch.dir("graft_quota_ckpt_")
    // batch 0: 5 events each for users 1 and 2 on day 2024-01-01
    writeFile(in, "f0", (1 to 5).map(i =>
      Row(i.toLong, ts(f"2024-01-01T10:0$i%d:00Z"), 1L, "click", 1.0)) ++
      (6 to 10).map(i =>
        Row(i.toLong, ts(f"2024-01-01T11:0${i - 5}%d:00Z"), 2L, "click", 1.0)))
    // batches 1-2: far-future sentinels on distinct days — batch 1 lifts
    // the watermark past 2024, batch 2 is the batch whose timeout pass
    // purges the 2024 keys
    writeFile(in, "f1", Seq(Row(-1L, ts("2030-01-01T00:00:00Z"), -1L, "click", 0.0)))
    writeFile(in, "f2", Seq(Row(-2L, ts("2030-01-02T00:00:00Z"), -1L, "click", 0.0)))

    val sink1 = runQuota(in, ckpt)
    // admission happened before eviction: 3 of 5 admitted per user, and
    // the admitted ids are the first three by (ts, event_id)
    val got = sink1.filter(r => r.getLong(0) >= 0 && r.getLong(2) >= 0)
      .groupBy(_.getLong(0)).map { case (u, rs) =>
        u -> ((rs.map(_.getLong(2)).max, rs.map(_.getLong(3)).max,
          rs.map(_.getLong(4)).max))
      }
    assert(got(1L) == ((5L, 3L, 1L + 2L + 3L)), s"user1: ${got(1L)}")
    assert(got(2L) == ((5L, 3L, 6L + 7L + 8L)), s"user2: ${got(2L)}")
    // the store probe: every 2024 key is gone; only the not-yet-closable
    // sentinel day key may remain
    val keys1 = storeKeys(ckpt)
    assert(!keys1.exists(_._1 >= 0), s"evicted day keys survived: $keys1")

    // restart leg: a LATE event for the evicted (1, 2024-01-01) key — the
    // persisted watermark (2030-01-01) is far past it, so the row is
    // dropped and the budget does NOT re-open — plus an on-time event for
    // a fresh user/day, admitted normally
    writeFile(in, "f3",
      Seq(Row(100L, ts("2024-01-01T23:00:00Z"), 1L, "click", 1.0),
        Row(200L, ts("2030-01-05T08:00:00Z"), 3L, "click", 1.0)))
    val sink2 = runQuota(in, ckpt)
    val byUser = sink2.filter(_.getLong(2) >= 0)
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(!byUser.contains((1L, "2024-01-01")),
      s"late event re-opened an evicted budget: $byUser")
    assert(byUser.contains((3L, "2030-01-05")), s"fresh key not admitted: $byUser")
    val keys2 = storeKeys(ckpt)
    assert(!keys2.contains((1L, "2024-01-01")),
      s"evicted key resurrected after restart: $keys2")
    assert(keys2.contains((3L, "2030-01-05")), s"fresh key missing from store: $keys2")
    ckpt
  }

  test("watermark evicts closed day keys from the store; eviction survives restart") {
    evictionScenario()
    ()
  }

  test("the same eviction + restart contract holds on the RocksDB provider") {
    // QuotaEvictionSpec's default leg proves purge on the HDFS-backed
    // store; the 100 TB deployment runs RocksDB, whose timeout handling
    // (range scan over timestamps) and checkpoint format (changelog/zip,
    // not .delta files) are entirely different code paths — so the
    // contract is re-proven under that provider, not assumed
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt =
      try evictionScenario()
      finally prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    // physical proof the run actually used RocksDB: its checkpoint keeps
    // changelog/zip artifacts where the HDFS provider writes .delta files
    import scala.jdk.CollectionConverters._
    val stateFiles = java.nio.file.Files
      .walk(java.nio.file.Paths.get(ckpt, "state"))
      .iterator().asScala.map(_.getFileName.toString).toSeq
    assert(!stateFiles.exists(_.endsWith(".delta")),
      s"HDFS-provider .delta files in a RocksDB checkpoint: $stateFiles")
    assert(stateFiles.exists(f => f.endsWith(".changelog") || f.endsWith(".zip")),
      s"no RocksDB changelog/zip artifacts found: $stateFiles")
  }

  test("sentinel staging delivers every real fixture row in batch 0 (quota SET contract)") {
    // quotaEnforce's oracle equivalence needs per-batch sort == global
    // rank, i.e. all real events of a key in ONE batch; the staged layout
    // guarantees it by construction (one fixture file, sentinels in their
    // own later files) — this pin fails if the staging ever splits it
    val perBatch = scala.collection.mutable.Map[Long, Long]()
    // filesPerTrigger=2: the same delivery quotaEnforce uses
    val q = streaming.RecordStream.eventsStreamWithSentinels(spark, Sf, filesPerTrigger = 2)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        perBatch.synchronized {
          perBatch(id) = batch.filter(col("user_id") >= 0).count()
        }
        ()
      }.start()
    try q.processAllAvailable()
    finally { q.stop(); q.awaitTermination(20000) }
    val nReal = Tables.events(spark, Sf).count()
    assert(perBatch.getOrElse(0L, 0L) == nReal,
      s"batch 0 carried ${perBatch.get(0L)} of $nReal real rows: $perBatch")
    assert(perBatch.filterKeys(_ > 0L).values.forall(_ == 0L),
      s"real rows leaked into later batches: $perBatch")
  }
}
