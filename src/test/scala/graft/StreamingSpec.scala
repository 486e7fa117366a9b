package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.RecordStream

/** Streaming semantics tests (SURVEY.md §5.2/5.4): checkpointed
  * restart-recovery, watermark late-data drop, producer-format parity,
  * dead-letter accounting, graceful stop budget. All deterministic —
  * processAllAvailable / explicit sentinels, no sleeps for data timing.
  */
class StreamingSpec extends SparkSuite {

  test("restart from checkpoint resumes without loss [REF A10]") {
    val stage = Files.createTempDirectory("graft_ckpt_stage_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val out = "restart_sink"
    import spark.implicits._

    def writeBatch(name: String, from: Int, until: Int): Unit = {
      val tmp = s"$stage/_tmp_$name"
      (from until until).map(i => (i.toLong, s"p$i")).toDF("id", "payload")
        .coalesce(1).write.parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(s"$stage/$name.parquet")))
      dir.listFiles().foreach(_.delete()); dir.delete()
    }

    val outDir = Files.createTempDirectory("graft_ckpt_out_").toString

    def startQuery() = {
      val stream = spark.readStream
        .schema("id LONG, payload STRING")
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$stage/*")
      stream.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet") // file sink: supports checkpoint recovery, exactly-once
        .option("path", outDir)
        .start()
    }

    writeBatch("a", 0, 50)
    val q1 = startQuery()
    q1.processAllAvailable()
    assert(spark.read.parquet(outDir).count() == 50)
    q1.stop() // kill mid-stream (before later data arrives)

    writeBatch("b", 50, 80)
    val q2 = startQuery()
    q2.processAllAvailable()
    val ids = spark.read.parquet(outDir).select("id").as[Long].collect().toList
    q2.stop()
    // recovery from the offset log: nothing lost, nothing reprocessed
    assert(ids.size == 80, s"expected 80 rows after restart, got ${ids.size}")
    assert(ids.toSet == (0 until 80).map(_.toLong).toSet)
  }

  test("watermark drops data later than the delay [MANDATE late-data]") {
    val stage = Files.createTempDirectory("graft_late_").toString
    import spark.implicits._
    def file(name: String, rows: Seq[(java.sql.Timestamp, String)]): Unit = {
      val tmp = s"$stage/_t_$name"
      rows.toDF("ts", "k").coalesce(1).write.parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(s"$stage/$name.parquet")))
      dir.listFiles().foreach(_.delete()); dir.delete()
      Thread.sleep(5)
    }
    def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // Spark finalizes a window one batch *after* the watermark passes its
    // end (eviction happens at the commit where wm already covers it), so a
    // genuinely-droppable late row must arrive ≥2 batches after the head
    // that advanced the watermark. Sequence (10-min watermark):
    //   b0: 10:00 on-time + 10:30 head  → commit: wm = 10:20
    //   b1: 10:50 filler                → [10:00,10:10) finalized, wm = 10:40
    //   b2: 10:05 late                  → window gone, wm 10:40 → DROPPED
    //   b3: 12:00 sentinel              → flushes remaining windows
    file("b0", Seq((ts(10, 0), "on-time"), (ts(10, 30), "head")))
    file("b1", Seq((ts(10, 50), "filler")))
    file("b2", Seq((ts(10, 5), "late")))
    file("b3", Seq((ts(12, 0), "flush-sentinel")))
    val agg = spark.readStream
      .schema("ts TIMESTAMP, k STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$stage/*")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .count()
    val rows = RecordStream.runToMemory(spark, agg.toDF(), "late_sink", "append")
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("count"))
      .as[(String, Long)].collect().toMap
    // [10:00,10:10) finalized with ONLY the on-time row; the late one dropped
    assert(rows.get("10:00").contains(1L), s"late row leaked or on-time lost: $rows")
    assert(rows.get("10:30").contains(1L) && rows.get("10:50").contains(1L))
  }

  test("rate-source generator emits the reference payload format [REF A1]") {
    val gen = RecordStream.generator(spark, rowsPerSecond = 100)
    val q = gen.writeStream.outputMode("append")
      .format("memory").queryName("gen_sink").start()
    try {
      // rate source needs wall-clock to emit; bounded wait for >0 rows
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("gen_sink").isEmpty && System.currentTimeMillis() < deadline) {
        q.processAllAvailable()
      }
    } finally q.stop()
    val rows = spark.table("gen_sink")
    assert(!rows.isEmpty, "rate generator produced nothing in 15s")
    val decoded = RecordStream.decodePayload(rows)
    assert(decoded.filter(col("decode_error").isNotNull).count() == 0)
    val shards = decoded.select("shardId").distinct().collect().map(_.getString(0)).toSet
    assert(shards.subsetOf(Set("shardId-000000000000", "shardId-000000000001")))
    assert(decoded.filter(col("text").startsWith("testData-")).count() == rows.count())
    assert(decoded.filter(col("partitionKey").startsWith("partitionKey-")).count() == rows.count())
  }

  test("poison payloads go to the dead letter channel, good ones survive [REF A9]") {
    import spark.implicits._
    val payloads = Seq(
      "testData-2024-01-01T10:00:00.123",
      "testData-2024-01-01T10:00:01.456",
      "garbage-record",
      "testData-not-a-timestamp")
    val df = payloads.toDF("s").select(encode(col("s"), "UTF-8").as("data"))
    val (good, dead) = RecordStream.splitDeadLetter(RecordStream.decodePayload(df))
    assert(good.count() == 2)
    assert(dead.count() == 2)
    assert(dead.select("decode_error").as[String].collect().toSet == Set("bad-payload-format"))
    // the parsed struct carries the event-time for downstream watermarking
    assert(good.select(col("parsed.event_ts")).na.drop().count() == 2)
  }

  test("stateful aggregation recovers its state store across restart [REF A10]") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft_aggck_in_").toString
    val ckpt = Files.createTempDirectory("graft_aggck_").toString
    val out = "aggck_sink"
    def file(name: String, rows: Seq[(String, Int)]): Unit = {
      val tmp = s"$stage/_t_$name"
      rows.toDF("k", "v").coalesce(1).write.parquet(tmp)
      val dir = new java.io.File(tmp)
      val part = dir.listFiles().find(_.getName.endsWith(".parquet")).get
      assert(part.renameTo(new java.io.File(s"$stage/$name.parquet")))
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
    def startQuery() =
      spark.readStream.schema("k STRING, v INT").parquet(s"$stage/*")
        .groupBy("k").agg(sum("v").as("total"))
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(out).start()

    file("a", Seq(("x", 1), ("y", 10)))
    val q1 = startQuery()
    q1.processAllAvailable()
    q1.stop()
    file("b", Seq(("x", 2), ("z", 100)))
    val q2 = startQuery() // must resume with x=1,y=10 already in the store
    q2.processAllAvailable()
    val got = spark.table(out).as[(String, Long)].collect().toMap
    q2.stop()
    assert(got == Map("x" -> 3L, "y" -> 10L, "z" -> 100L), got.toString)
  }

  test("foreachBatch splits good/dead-letter with app-level retry [REF A9]") {
    import spark.implicits._
    val stage = Files.createTempDirectory("graft_feb_in_").toString
    val goodDir = Files.createTempDirectory("graft_feb_good_").toString
    val deadDir = Files.createTempDirectory("graft_feb_dead_").toString
    Seq("testData-2024-01-01T10:00:00.123", "garbage-1",
        "testData-2024-01-01T10:00:01.456", "garbage-2", "testData-not-a-ts")
      .toDF("s").coalesce(1).write.parquet(s"$stage/in.parquet")
    val failedOnce = new java.util.concurrent.atomic.AtomicBoolean(false)
    val q = spark.readStream.schema("s STRING").parquet(s"$stage/*")
      .select(encode(col("s"), "UTF-8").as("data"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val decoded = RecordStream.decodePayload(batch).cache()
        try {
          val (good, dead) = RecordStream.splitDeadLetter(decoded)
          // app-level retry policy [REF A9]: first attempt of the batch
          // fails, the retry succeeds — the batch must not be lost
          if (failedOnce.compareAndSet(false, true))
            throw new RuntimeException("transient sink failure")
          good.select(col("text")).write.mode("append").parquet(goodDir)
          dead.select(col("text"), col("decode_error")).write.mode("append").parquet(deadDir)
        } finally decoded.unpersist()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft_feb_ck_").toString)
      .start()
    // first attempt throws -> query fails; restart resumes the same epoch
    intercept[Exception] { q.processAllAvailable() }
    q.stop()
    val q2 = spark.readStream.schema("s STRING").parquet(s"$stage/*")
      .select(encode(col("s"), "UTF-8").as("data"))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        val (good, dead) = RecordStream.splitDeadLetter(RecordStream.decodePayload(batch))
        good.select(col("text")).write.mode("append").parquet(goodDir)
        dead.select(col("text"), col("decode_error")).write.mode("append").parquet(deadDir)
      }
      .option("checkpointLocation", Files.createTempDirectory("graft_feb_ck2_").toString)
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.read.parquet(goodDir).count() == 2)
    val dead = spark.read.parquet(deadDir)
    assert(dead.count() == 3)
    assert(dead.select("decode_error").as[String].collect().toSet ==
      Set("bad-payload-format"))
  }

  test("incremental sessionization folds state across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.streaming.{Ev, StreamingQueries}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    def ev(id: Long, uid: Long, min: Int) =
      Ev(id, uid, "click", 1.0, new java.sql.Timestamp(base + min * 60000L))
    val ms = MemoryStream[Ev]
    val sessions = StreamingQueries.sessionize(
      ms.toDS().withWatermark("ts", "0 seconds").as[Ev])
    val q = sessions.toDF().writeStream.outputMode("append")
      .format("memory").queryName("mb_sessions").start()
    try {
      // batch 1: user 1 opens a session (0,10); user 2 opens one (5)
      ms.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5))
      q.processAllAvailable()
      // batch 2: user 1 EXTENDS the open session (20 — within the 30-min
      // gap, must merge with batch 1's state); user 2 starts a second
      // session (50 — gap 45 min)
      ms.addData(ev(4, 1, 20), ev(5, 2, 50))
      q.processAllAvailable()
      // batch 3: user 1 starts a second session (120)
      ms.addData(ev(6, 1, 120))
      q.processAllAvailable()
      // two watermark-advancing sentinels: the first moves the watermark
      // past every real session, the second forces the batch in which the
      // last timeouts fire
      ms.addData(ev(7, -1, 100000))
      q.processAllAvailable()
      ms.addData(ev(8, -1, 100100))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("mb_sessions")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), date_format(col("session_start"), "HH:mm").as("s"),
        date_format(col("session_end"), "HH:mm").as("e"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    // sessions must be identical to a batch computation over all events:
    // state folded across three micro-batches, not per-batch
    assert(got == Set(
      (1L, "10:00", "10:20", 3L),
      (1L, "12:00", "12:00", 1L),
      (2L, "10:05", "10:05", 1L),
      (2L, "10:50", "10:50", 1L)), got.toString)
  }

  test("TWS sessionizer folds ListState + timers across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.{Ev, TwsSessionizer}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
      def ev(id: Long, uid: Long, min: Int) =
        Ev(id, uid, "click", 1.0, new java.sql.Timestamp(base + min * 60000L))
      val ms = MemoryStream[Ev]
      val sessions = ms.toDS().withWatermark("ts", "0 seconds").as[Ev]
        .groupByKey(_.user_id)
        .transformWithState(new TwsSessionizer, TimeMode.EventTime(), OutputMode.Append())
      val q = sessions.toDF().writeStream.outputMode("append")
        .format("memory").queryName("tws_mb_sessions").start()
      try {
        // same 3-batch split as the fMGWS test: extension across batches,
        // gap-separated second sessions, then two watermark sentinels so
        // the final timers fire
        ms.addData(ev(1, 1, 0), ev(2, 1, 10), ev(3, 2, 5))
        q.processAllAvailable()
        ms.addData(ev(4, 1, 20), ev(5, 2, 50))
        q.processAllAvailable()
        ms.addData(ev(6, 1, 120))
        q.processAllAvailable()
        ms.addData(ev(7, -1, 100000))
        q.processAllAvailable()
        ms.addData(ev(8, -1, 100100))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table("tws_mb_sessions")
        .filter(col("user_id") >= 0)
        .select(col("user_id"), date_format(col("session_start"), "HH:mm").as("s"),
          date_format(col("session_end"), "HH:mm").as("e"), col("n_events"))
        .as[(Long, String, String, Long)].collect().toSet
      assert(got == Set(
        (1L, "10:00", "10:20", 3L),
        (1L, "12:00", "12:00", 1L),
        (2L, "10:05", "10:05", 1L),
        (2L, "10:50", "10:50", 1L)), got.toString)
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("observed metrics surface per-batch counts (KCL CloudWatch analogue)") {
    // The reference's KCL publishes per-shard processing metrics to
    // CloudWatch (MetricsConfig, AmazonKinesisRecordConsumerSample.java:78);
    // the Spark-native analogue is Dataset.observe + the query-progress
    // stream: per-batch aggregates computed inside the running query, no
    // second pass over the data.
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, Double)]
    val observed = ms.toDF().toDF("id", "value")
      .observe("batch_metrics", count(lit(1)).as("n_rows"),
        sum("value").as("total_value"),
        count(when(col("value") < 0, 1)).as("n_negative"))
    val q = observed.writeStream.outputMode("append")
      .format("memory").queryName("observe_sink").start()
    try {
      ms.addData((1L, 1.5), (2L, -2.0), (3L, 3.0))
      q.processAllAvailable()
      val progress = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("batch_metrics"))).last
      assert(progress.getAs[Long]("n_rows") == 3L)
      assert(math.abs(progress.getAs[Double]("total_value") - 2.5) < 1e-9)
      assert(progress.getAs[Long]("n_negative") == 1L)
      // the state-free observation must not change the query result
      assert(spark.table("observe_sink").count() == 3L)
    } finally q.stop()
  }

  test("graceful stop completes within the 20s budget [REF A15]") {
    val q = RecordStream.generator(spark, rowsPerSecond = 2)
      .writeStream.outputMode("append")
      .format("memory").queryName("stop_sink")
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    val t0 = System.nanoTime()
    q.stop()
    q.awaitTermination(20000)
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(!q.isActive)
    assert(elapsedMs < 20000, s"stop took ${elapsedMs}ms")
  }
}
