package graft.streaming

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, MapState,
  OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

case class Ev(event_id: Long, user_id: Long, event_type: String,
    value: Double, ts: java.sql.Timestamp)
case class UserStats(user_id: Long, n_events: Long, total_value: Double,
    n_purchases: Long, last_ts: java.sql.Timestamp)
case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)
case class UserTypeStats(user_id: Long, event_type: String,
    n_events: Long, total_value: Double)
case class TypeAgg(n: Long, total: Double)
case class QuotaState(arrived: Long, admitted: Long, idsum: Long)
case class QuotaOut(user_id: Long, day: String, n_arrived: Long,
    n_admitted: Long, admitted_ids_sum: Long)

/** State-v2 (`transformWithState`) processor: per-user MapState keyed by
  * event type — the composite-state shape the v1 `GroupState` API forces
  * into one serialized blob (full rewrite per key per batch), while v2
  * persists each (user, type) entry as its own RocksDB key (point
  * reads/writes, no blob amplification at 10⁶-type scale). Emits the
  * updated (user, type) rows per batch.
  */
class UserTypeStatsProcessor extends StatefulProcessor[Long, Ev, UserTypeStats] {
  @transient private var byType: MapState[String, TypeAgg] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    byType = getHandle.getMapState[String, TypeAgg]("by_type",
      Encoders.STRING, Encoders.product[TypeAgg], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[UserTypeStats] = {
    val touched = scala.collection.mutable.LinkedHashSet.empty[String]
    rows.foreach { e =>
      val prev = if (byType.containsKey(e.event_type)) byType.getValue(e.event_type)
        else TypeAgg(0L, 0.0)
      byType.updateValue(e.event_type, TypeAgg(prev.n + 1, prev.total + e.value))
      touched += e.event_type
    }
    touched.toList.map { t =>
      val agg = byType.getValue(t)
      UserTypeStats(key, t, agg.n, agg.total)
    }.iterator
  }
}

/** (key, running count) row emitted by [[TtlCountProcessor]]. */
case class KeyCount(key: Long, n: Long)

/** State-v2 TTL demonstrator: a per-key counter in a ValueState configured
  * with a processing-time TTL — the bounded-state discipline a 100 TB
  * keyspace needs (abandoned keys age out of RocksDB instead of
  * accumulating forever; the reference's analogue is the per-shard
  * processor state dropped on lease loss,
  * AmazonKinesisApplicationSampleRecordProcessor.java:63-91). The TTL
  * contract — expired keys are PURGED from the store, not just hidden —
  * is pinned by RocksDBStateSpec's checkpoint probe: stop the query, read
  * the checkpoint back with the batch `statestore` source, assert the
  * aged-out key is gone.
  */
class TtlCountProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, (Long, Long), KeyCount] {
  @transient private var counts: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    counts = getHandle.getValueState[Long]("counts", Encoders.scalaLong,
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))
  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[KeyCount] = {
    val prev = if (counts.exists()) counts.get() else 0L
    val next = prev + rows.size
    counts.update(next)
    Iterator.single(KeyCount(key, next))
  }
}

/** Timestamp ⇄ epoch-µs conversions (millis would truncate the fixture's
  * microsecond event times).
  */
private[streaming] object TimeUs {
  def toUs(t: java.sql.Timestamp): Long = {
    val i = t.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  def fromUs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
}

/** State-v2 sessionizer: the same incremental interval-merge fold as
  * [[StreamingQueries.sessionize]] (fMGWS), re-expressed on
  * `transformWithState` — open intervals live in a ListState (v2 appends
  * are per-element RocksDB puts, not a read-modify-write of one state
  * blob), and closure is driven by EVENT-TIME TIMERS: after each batch the
  * key registers a timer at the earliest possible close (min open end +
  * gap), and `handleExpiredTimer` emits every interval the advancing
  * watermark has proven closed. A superseded timer that fires early finds
  * nothing closable and simply re-arms — timer callbacks are idempotent.
  */
class TwsSessionizer extends StatefulProcessor[Long, Ev, SessionOut] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState}
  private val gapUs = 30L * 60 * 1000 * 1000
  @transient private var open: ListState[SessionAcc] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    open = getHandle.getListState[SessionAcc]("open",
      Encoders.product[SessionAcc], TTLConfig.NONE)

  /** Merge sorted-by-start intervals whose gap is ≤ 30 min (same rule as
    * the batch oracle), then split at the watermark: emit what is provably
    * closed, keep the rest and arm a timer at its earliest possible close.
    */
  private def fold(key: Long, incoming: Seq[SessionAcc],
      wmUs: Long): Iterator[SessionOut] = {
    val all = (open.get().toSeq ++ incoming).sortBy(a => (a.startUs, a.endUs))
    val merged = all.foldLeft(List.empty[SessionAcc]) { (acc, cur) =>
      acc match {
        case head :: tail if cur.startUs - head.endUs <= gapUs =>
          SessionAcc(head.startUs, math.max(head.endUs, cur.endUs), head.n + cur.n) :: tail
        case _ => cur :: acc
      }
    }.reverse
    val (closed, stillOpen) = merged.partition(a => a.endUs + gapUs <= wmUs)
    open.clear()
    if (stillOpen.nonEmpty) {
      open.appendList(stillOpen.toArray)
      // CEIL to ms: retained ends satisfy end+gap > wm in µs, so the timer
      // lands strictly after the current watermark and cannot mis-fire now
      getHandle.registerTimer((stillOpen.map(_.endUs).min + gapUs + 999L) / 1000L)
    }
    closed.iterator.map(c =>
      SessionOut(key, TimeUs.fromUs(c.startUs), TimeUs.fromUs(c.endUs), c.n))
  }

  override def handleInputRows(key: Long, rows: Iterator[Ev],
      timerValues: TimerValues): Iterator[SessionOut] = {
    val incoming = rows.map(e => SessionAcc(TimeUs.toUs(e.ts), TimeUs.toUs(e.ts), 1L)).toSeq
    fold(key, incoming, timerValues.getCurrentWatermarkInMs() * 1000L)
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] =
    fold(key, Seq.empty, timerValues.getCurrentWatermarkInMs() * 1000L)
}

/** One still-open session interval (event times in epoch MICROseconds —
  * millis would truncate the fixture's µs timestamps).
  */
case class SessionAcc(startUs: Long, endUs: Long, n: Long)
/** Per-user fMGWS state: the open (not-yet-watermark-closed) intervals. */
case class SessionState(open: Seq[SessionAcc])

/** Structured Streaming operators (SURVEY.md §2 "Streaming"), each run as a
  * real streaming query (file source → transforms → memory sink, drained
  * synchronously) whose final table is oracle-checked against batch SQL
  * over the same events. Timestamps are rendered to µs strings; window
  * starts are epoch-floored so both engines agree on alignment.
  */
object StreamingQueries extends QueryModule {


  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val DTsFmt = "%Y-%m-%d %H:%M:%S.%f"

  /** Tumbling 1-hour windows by event type (complete mode). */
  def tumbling(s: SparkSession, dir: String): DataFrame = {
    val agg = RecordStream.eventsStream(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    RecordStream.runToMemory(s, agg, "stream_tumbling_sink", "complete")
      .select(date_format(col("w.start"), TsFmt).as("window_start"),
        col("event_type"), col("n"), col("total_value"))
      .orderBy("window_start", "event_type")
  }

  private val tumblingSql =
    s"""SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)), '$DTsFmt')
       |    AS window_start,
       |  event_type, CAST(count(*) AS BIGINT) AS n, round(sum(value), 2) AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin

  /** Streaming OHLC bars: 6-hour tumbling windows per event type with
    * open/close resolved by `min_by`/`max_by` on the event timestamp —
    * unlike the batch twin (`win_ohlc_bars`, edge row_numbers over a
    * sort), a streaming aggregation cannot sort its window, so the bar
    * edges must come from combinable aggregates. The arg-extrema key is
    * (ts, event_id) — event_id is unique, so open/close are well-defined
    * even if a future fixture has two same-type events on one timestamp
    * (keying on ts alone would make both engines nondeterministic there).
    * Spark orders the struct directly; the DuckDB twin encodes the same
    * total order as a zero-padded string since its arg_min takes only
    * scalar keys — with both fields biased by +2⁶² before padding, because
    * '%020d' of a NEGATIVE value (pre-1970 ts, negative id) pads as
    * "-000…" and sorts above all positives; the bias keeps every key in
    * [0, 2⁶³) (19 digits, inside the 20-char pad) so the lexicographic
    * order stays total for any epoch_us/id in ±2⁶² — i.e. any timestamp
    * within ±146k years. Complete mode, no watermark.
    */
  def ohlcBars(s: SparkSession, dir: String): DataFrame = {
    val agg = RecordStream.eventsStream(s, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max("value").as("high"), min("value").as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"))
    RecordStream.runToMemory(s, agg, "stream_ohlc_sink", "complete")
      .select(date_format(col("w.start"), TsFmt).as("bar_start"),
        col("event_type"), col("n_events"),
        col("open"), col("high"), col("low"), col("close"))
      .orderBy("bar_start", "event_type")
  }

  private val ohlcBarsSql =
    s"""SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)), '$DTsFmt')
       |    AS bar_start,
       |  event_type, CAST(count(*) AS BIGINT) AS n_events,
       |  arg_min(value, printf('%020d%020d',
       |    epoch_us(ts) + 4611686018427387904, event_id + 4611686018427387904)) AS open,
       |  max(value) AS high, min(value) AS low,
       |  arg_max(value, printf('%020d%020d',
       |    epoch_us(ts) + 4611686018427387904, event_id + 4611686018427387904)) AS close
       |FROM events GROUP BY 1, 2 ORDER BY bar_start, event_type""".stripMargin

  /** Top event types per 6-hour window, by count then total value: the
    * streaming aggregation drains into the NATIVE two-phase top-k
    * operator ([[graft.plans.GroupTopK]] — partial heaps bound the
    * shuffle at k·windows rows) rather than a row_number window over the
    * drained table. The composition is the production shape: stream →
    * windowed state → persisted micro-batch result → batch top-k report.
    */
  def windowedTopk(s: SparkSession, dir: String): DataFrame = {
    val agg = RecordStream.eventsStream(s, dir)
      .groupBy(window(col("ts"), "6 hours").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
          .as("val_c"))
    val drained = RecordStream
      .runToMemory(s, agg, "stream_wtopk_sink", "complete")
      .select(date_format(col("w.start"), TsFmt).as("window_start"),
        col("event_type"), col("n"), col("val_c"))
    graft.plans.GroupTopK(drained, 3, Seq("window_start"),
        Seq(desc("n"), desc("val_c"), asc("event_type")))
      .withColumnRenamed("gtk_rank", "rn")
      .select(col("window_start"), col("rn"), col("event_type"), col("n"),
        round(col("val_c") / 100.0, 2).as("total_value"))
      .orderBy("window_start", "rn")
  }

  private val windowedTopkSql =
    s"""WITH agg AS (
       |  SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT)), '$DTsFmt')
       |      AS window_start,
       |    event_type, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS val_c
       |  FROM events GROUP BY 1, 2)
       |SELECT window_start, CAST(rn AS INT) AS rn, event_type, n,
       |  round(val_c / 100.0, 2) AS total_value
       |FROM (
       |  SELECT *, row_number() OVER (PARTITION BY window_start
       |    ORDER BY n DESC, val_c DESC, event_type ASC) AS rn
       |  FROM agg)
       |WHERE rn <= 3 ORDER BY window_start, rn""".stripMargin

  /** Sliding 1-hour windows every 30 minutes (complete mode). */
  def sliding(s: SparkSession, dir: String): DataFrame = {
    val agg = RecordStream.eventsStream(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
    RecordStream.runToMemory(s, agg, "stream_sliding_sink", "complete")
      .select(date_format(col("w.start"), TsFmt).as("window_start"), col("n"))
      .orderBy("window_start")
  }

  private val slidingSql =
    s"""SELECT strftime(to_timestamp(ws), '$DTsFmt') AS window_start,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM (
       |  SELECT unnest([CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
       |                 CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800]) AS ws
       |  FROM events)
       |GROUP BY ws ORDER BY window_start""".stripMargin

  /** Session windows: 30-minute gap per user, append mode. Sessions only
    * emit once the watermark passes their end; the sentinel micro-batches
    * (RecordStream.eventsStreamWithSentinels) advance it deterministically.
    */
  def sessions(s: SparkSession, dir: String): DataFrame = {
    // 4 files per trigger → ONE data batch (fixture + all sentinels; its
    // commit advances the watermark past everything) + the engine's
    // watermark-advance flush batch — the minimum state-store commit rounds
    val agg = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    RecordStream.runToMemory(s, agg, "stream_sessions_sink", "append")
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        date_format(col("w.start"), TsFmt).as("session_start"),
        date_format(col("w.end"), TsFmt).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  private val sessionsSql =
    s"""WITH marked AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked)
       |SELECT user_id,
       |  strftime(min(ts), '$DTsFmt') AS session_start,
       |  strftime(max(ts) + INTERVAL 30 MINUTE, '$DTsFmt') AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM numbered GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Session windows with a DYNAMIC per-event gap: purchases hold a
    * session open 30 minutes, everything else 10 — the per-event-type
    * idle budget (checkout flows idle longer than browse flows), which
    * the fixed-gap [[sessions]] cannot express. Each event opens
    * [ts, ts+gap) and overlapping windows merge, so the oracle replays
    * the exact rule: a session breaks where ts clears the running max of
    * previous window ends (interval arithmetic on timestamps, never
    * epoch doubles), and the session end is the max end of its members.
    * Same sentinel-staged append-mode ceremony as [[sessions]].
    */
  def dynamicGapSessions(s: SparkSession, dir: String): DataFrame = {
    val gap = expr(
      "CASE WHEN event_type = 'purchase' THEN '30 minutes' ELSE '10 minutes' END")
    val agg = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "0 seconds")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
    RecordStream.runToMemory(s, agg, "stream_dyngap_sink", "append")
      .filter(col("user_id") >= 0)
      .select(col("user_id"),
        date_format(col("w.start"), TsFmt).as("session_start"),
        date_format(col("w.end"), TsFmt).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  private val dynamicGapSessionsSql =
    s"""WITH g AS (
       |  SELECT user_id, ts,
       |    ts + (CASE WHEN event_type = 'purchase' THEN 1800 ELSE 600 END)
       |      * INTERVAL 1 SECOND AS win_end
       |  FROM events),
       |m AS (
       |  SELECT user_id, ts, win_end,
       |    max(win_end) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
       |  FROM g),
       |sid AS (
       |  SELECT user_id, ts, win_end,
       |    sum(CASE WHEN prev_end IS NULL OR ts >= prev_end THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM m)
       |SELECT user_id, strftime(min(ts), '$DTsFmt') AS session_start,
       |  strftime(max(win_end), '$DTsFmt') AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM sid GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Streaming dedup on a key subset (dropDuplicates with the stream's
    * state store); output projected to the key so the surviving set is
    * deterministic.
    */
  def dedup(s: SparkSession, dir: String): DataFrame = {
    val dd = RecordStream.eventsStream(s, dir)
      .dropDuplicates("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    RecordStream.runToMemory(s, dd, "stream_dedup_sink", "append")
      .orderBy("user_id", "event_type")
  }

  private val dedupSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** dropDuplicatesWithinWatermark: dedup whose state expires with the
    * watermark instead of growing forever — the unbounded-stream-safe form.
    * Same output as exact dedup when all duplicates fall inside the
    * watermark horizon (here: one batch).
    */
  def dedupWithinWatermark(s: SparkSession, dir: String): DataFrame = {
    val dd = RecordStream.eventsStream(s, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    RecordStream.runToMemory(s, dd, "stream_dedup_wm_sink", "append")
      .orderBy("user_id", "event_type")
  }

  private val dedupWithinWatermarkSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Stream-static join: streaming events against the static customer dim
    * (broadcast — the static side is loaded per micro-batch).
    */
  def streamStaticJoin(s: SparkSession, dir: String): DataFrame = {
    val customers = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val joined = RecordStream.eventsStream(s, dir)
      .join(broadcast(customers), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    RecordStream.runToMemory(s, joined, "stream_static_join_sink", "complete")
      .orderBy("c_mktsegment", "event_type")
  }

  private val streamStaticJoinSql =
    """SELECT c_mktsegment, event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY 1, 2 ORDER BY c_mktsegment, event_type""".stripMargin

  /** Stream-static LEFT ANTI join — the streaming blocklist pass: events
    * whose user is on a (static, broadcast) blocklist never reach the
    * aggregation. The anti join runs per micro-batch against the static
    * side, so blocklist updates between restarts take effect without
    * state migration; no join state accumulates.
    */
  def streamStaticAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val blocked = Tables.customer(s, dir)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("user_id"))
    val kept = RecordStream.eventsStream(s, dir)
      .join(broadcast(blocked), Seq("user_id"), "left_anti")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    RecordStream.runToMemory(s, kept, "stream_static_anti_sink", "complete")
      .orderBy("event_type")
  }

  private val streamStaticAntiJoinSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM events WHERE user_id NOT IN (
      |  SELECT c_custkey FROM customer WHERE c_custkey % 7 = 0)
      |GROUP BY 1 ORDER BY event_type""".stripMargin

  /** Multi-source topology: two INDEPENDENT file-stream scans of the same
    * events (disjoint user halves) unioned into one aggregation — each
    * source keeps its own offsets in the checkpoint, the union is
    * partition-wise free (no shuffle), and the per-type rollup shuffles
    * once. The shape behind "merge N regional streams into one metric".
    */
  def streamUnion(s: SparkSession, dir: String): DataFrame = {
    val a = RecordStream.eventsStream(s, dir).filter(col("user_id") % 2 === 0)
    val b = RecordStream.eventsStream(s, dir).filter(col("user_id") % 2 =!= 0)
    val unioned = a.unionByName(b)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    RecordStream.runToMemory(s, unioned, "stream_union_sink", "complete")
      .orderBy("event_type")
  }

  private val streamUnionSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** State-store batch reader (Spark 4.x `statestore` source) — the
    * operational window into a running job's checkpoint: the streaming
    * aggregation's state is read back as an ordinary DataFrame, no
    * streaming machinery involved. This is how an operator inspects,
    * audits, or bulk-fixes state at 100 TB (the state lives in the
    * checkpoint, partitioned exactly like the shuffle that built it —
    * the reader emits one row per key per state partition). The declared
    * output re-derives the aggregate FROM THE STATE ALONE, so the oracle
    * (the plain batch aggregate) proves checkpointed state and recomputed
    * truth agree — the invariant that makes checkpoint recovery [REF A10]
    * trustworthy in the first place.
    */
  def stateStoreRead(s: SparkSession, dir: String): DataFrame = {
    val ckpt = graft.Scratch.dir("graft_ss_read_")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", RecordStream.StreamShufflePartitions)
    try {
      val agg = RecordStream.eventsStream(s, dir)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      val q = agg.writeStream.outputMode("complete").format("memory")
        .queryName("stream_ss_read_sink")
        .option("checkpointLocation", ckpt).start()
      try q.processAllAvailable() finally { q.stop(); q.awaitTermination(20000) }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    val state = s.read.format("statestore").load(ckpt)
      .select(col("key.event_type").as("event_type"), col("value.*"))
    // state buffer fields are named by the physical agg functions, not the
    // aliases — bind them by name pattern (count…/sum…) and fail fast on
    // anything else, so a Spark buffer-layout change can never silently
    // swap the two doubles
    val buf = state.columns.drop(1)
    val cntCol = buf.find(_.toLowerCase.startsWith("count")).getOrElse(
      sys.error(s"no count buffer in state schema: ${buf.mkString(", ")}"))
    val sumCol = buf.find(_.toLowerCase.startsWith("sum")).getOrElse(
      sys.error(s"no sum buffer in state schema: ${buf.mkString(", ")}"))
    state.select(col("event_type"),
        col(cntCol).cast("long").as("n_events"),
        round(col(sumCol), 2).as("total_value"))
      .orderBy("event_type")
  }

  private val stateStoreReadSql =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** foreachBatch incremental MERGE — the CDC-apply pattern: each
    * micro-batch's per-user deltas are merged (full-outer + coalesced
    * sums) into a versioned parquet target, `v{batchId}` derived from
    * `v{batchId-1}` — version-per-batch makes the apply IDEMPOTENT under
    * batch replay (a retried batch rewrites the same version rather than
    * double-counting, the exactly-once recipe foreachBatch requires of its
    * sink). Final answer = the latest version. Three batches exercise the
    * merge (fixture file, then two sentinel files); sentinel rows carry
    * user_id = −1 and are excluded from the declared output.
    */
  def foreachBatchMerge(s: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = graft.Scratch.dir("graft_fb_merge_")
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", RecordStream.StreamShufflePartitions)
    try {
      val q = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 1)
        .writeStream
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val delta = batch.groupBy("user_id")
            .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
          val merged = if (id == 0) delta
          else {
            val base = s.read.parquet(s"$target/v${id - 1}")
              .withColumnRenamed("n_events", "b_n").withColumnRenamed("total_value", "b_t")
            base.join(delta, Seq("user_id"), "full_outer")
              .select(col("user_id"),
                (coalesce(col("b_n"), lit(0L)) + coalesce(col("n_events"), lit(0L)))
                  .as("n_events"),
                (coalesce(col("b_t"), lit(0d)) + coalesce(col("total_value"), lit(0d)))
                  .as("total_value"))
          }
          merged.write.mode("overwrite").parquet(s"$target/v$id")
          ()
        }
        .start()
      try q.processAllAvailable()
      finally { q.stop(); q.awaitTermination(20000) }
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    val lastV = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(target)).iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("v")).map(_.drop(1).toInt).max
    }
    s.read.parquet(s"$target/v$lastV")
      .filter(col("user_id") >= 0)
      .select(col("user_id"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id")
  }

  private val foreachBatchMergeSql =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** Streaming per-key admission quota (rate limiting — the ingestion
    * guard every shared pipeline puts in front of expensive downstream
    * work): at most 3 events admitted per (user, day), the rest dropped,
    * enforced through `mapGroupsWithState` so the admitted count SURVIVES
    * across micro-batches (a stateless per-batch limit would re-admit 3
    * on every trigger). State hygiene is EVENT-TIME driven: each (user,
    * day) key arms `setTimeoutTimestamp` at its day's end, and when the
    * watermark passes it the timeout callback REMOVES the state — a day
    * key lives exactly as long as its day is open, so the store holds
    * O(active users), not O(users × history), at any corpus size. The
    * fixture run exercises the full lifecycle: the far-future sentinel
    * batches advance the watermark past every real day and evict every
    * real key (QuotaEvictionSpec reads the checkpoint back with the batch
    * `statestore` source and asserts they are physically gone). Under
    * EventTimeTimeout Spark also drops input rows older than the
    * watermark, so a late event for an already-evicted day is DROPPED,
    * never re-admitted — eviction does not re-open budgets.
    *
    * Determinism: rows reach a key in arbitrary partition order, so each
    * batch's buffer is sorted by (ts, event_id) before admission — the
    * admitted SET is pinned by the oracle via the sum of admitted event
    * ids, not just the count. Oracle equivalence of the SET additionally
    * requires every real event of a key to arrive in ONE batch (per-batch
    * sort = global rank); the sentinel staging delivers the fixture as a
    * single file = single batch, and StreamingSpec pins that delivery
    * contract. Update mode emits one row per touched key per batch, so
    * the sink read collapses to the LAST update per key — all three
    * counters are monotonic, so max() is that last update. Timed-out
    * groups emit a negative tombstone (mGWS must return a value), dropped
    * by the same filter that drops the sentinel keys. The day key is
    * derived in UTC explicitly (java.time, not the JVM default zone), so
    * the oracle's naive strftime agrees.
    */
  def quotaEnforce(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // filesPerTrigger=2 halves the micro-batch count (each batch is a
    // state-store commit): batch 0 = fixture + sentinel 1 (watermark still
    // 0 DURING the batch, so admission is unaffected and every real row
    // stays in batch 0 — QuotaEvictionSpec pins it), batch 1 = sentinels
    // 2+3, whose processing fires the eviction timeouts armed in batch 0
    val ds = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 2)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[Ev]
      .withWatermark("ts", "0 seconds")
    val out = ds.groupByKey(e => (e.user_id,
        java.time.Instant.ofEpochMilli(e.ts.getTime)
          .atZone(java.time.ZoneOffset.UTC).toLocalDate.toString))
      .mapGroupsWithState(GroupStateTimeout.EventTimeTimeout())(quotaFold)
    RecordStream.runToMemory(s, out.toDF(), "stream_quota_sink", "update")
      .filter(col("user_id") >= 0 && col("n_arrived") >= 0)
      .groupBy("user_id", "day")
      .agg(max("n_arrived").as("n_arrived"), max("n_admitted").as("n_admitted"),
        max("admitted_ids_sum").as("admitted_ids_sum"))
      .orderBy("user_id", "day")
  }

  /** The quota fold, shared with QuotaEvictionSpec's checkpointed run. */
  private[graft] val quotaFold:
      ((Long, String), Iterator[Ev], GroupState[QuotaState]) => QuotaOut = {
    (key: (Long, String), it: Iterator[Ev], state: GroupState[QuotaState]) =>
      if (state.hasTimedOut) {
        // the watermark has passed this day's end: no more admissible
        // events can arrive (later ones are late and dropped), so the
        // budget record is dead — purge it from the store
        state.remove()
        QuotaOut(key._1, key._2, -1L, -1L, -1L)
      } else {
        val prev = state.getOption.getOrElse(QuotaState(0L, 0L, 0L))
        val evs = it.toArray.sortBy(e => (e.ts.getTime, e.event_id))
        val room = math.max(0L, 3L - prev.admitted).toInt
        val adm = evs.take(room)
        val next = QuotaState(prev.arrived + evs.length,
          prev.admitted + adm.length, prev.idsum + adm.map(_.event_id).sum)
        state.update(next)
        // evict once the day closes (watermark ≥ next midnight UTC)
        state.setTimeoutTimestamp(java.time.LocalDate.parse(key._2).plusDays(1)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
        QuotaOut(key._1, key._2, next.arrived, next.admitted, next.idsum)
      }
  }

  private val quotaEnforceSql =
    """WITH ranked AS (
      |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS day, event_id,
      |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
      |      ORDER BY ts, event_id) AS rn
      |  FROM events)
      |SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_arrived,
      |  CAST(sum(CASE WHEN rn <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
      |  CAST(sum(CASE WHEN rn <= 3 THEN event_id ELSE 0 END) AS BIGINT)
      |    AS admitted_ids_sum
      |FROM ranked GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin

  /** Streaming t-digest quantiles: bounded-memory percentile monitoring
    * over the event stream through the SAME [[graft.functions
    * .TDigestQuantile]] Aggregator the batch side uses — per-group state
    * is O(compression) centroids regardless of stream length, the
    * streaming answer to "track p50/p90 live" that exact percentile state
    * (O(n) per group) cannot give at 100 TB. Complete-mode aggregation:
    * each trigger folds the new rows into the persisted digest state and
    * re-emits the estimates. Accuracy contract (same discipline as
    * [[graft.operators.AggQueries.tdigestQuantiles]], but RANK-error like
    * approx_percentile, since event values can sit near zero where
    * relative error is meaningless): the oracle-checkable columns are the
    * exact interpolated percentiles; one boolean per quantile asserts the
    * streamed estimate lies between the exact (q−0.02) and (q+0.02)
    * quantiles — ≥4× margin over the compression-100 digest's worst
    * mid-distribution rank error (k₀ bound: W·q(1−q)·4/δ ⇒ ≤0.5% at
    * q=0.5, tighter at 0.9).
    */
  def tdigestStream(s: SparkSession, dir: String): DataFrame = {
    val td = udaf(new graft.functions.TDigestQuantile(Seq(0.5, 0.9), 100.0),
      Encoders.scalaDouble)
    val stream = RecordStream.eventsStream(s, dir)
      .groupBy("event_type").agg(td(col("value")).as("td"))
    val streamed = RecordStream.runToMemory(s, stream, "stream_tdigest_sink", "complete")
    val probes = Tables.events(s, dir).groupBy("event_type")
      .agg(expr("percentile(value, array(0.48, 0.5, 0.52, 0.88, 0.9, 0.92))").as("x"))
    streamed.join(probes, Seq("event_type"))
      .select(col("event_type"),
        round(element_at(col("x"), 2), 4).as("exact_p50"),
        round(element_at(col("x"), 5), 4).as("exact_p90"),
        (element_at(col("td"), 1) >= element_at(col("x"), 1) &&
          element_at(col("td"), 1) <= element_at(col("x"), 3)).as("p50_rank_2pct"),
        (element_at(col("td"), 2) >= element_at(col("x"), 4) &&
          element_at(col("td"), 2) <= element_at(col("x"), 6)).as("p90_rank_2pct"))
      .orderBy("event_type")
  }

  private val tdigestStreamSql =
    """SELECT event_type,
      |  round(quantile_cont(value, 0.5), 4) AS exact_p50,
      |  round(quantile_cont(value, 0.9), 4) AS exact_p90,
      |  true AS p50_rank_2pct, true AS p90_rank_2pct
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Streaming daily-active-users with BOUNDED state: exact distinct
    * counting in a stream needs one state entry per (window, user) —
    * O(users·days), the state blow-up that kills long-running queries —
    * so this runs `approx_count_distinct` (HLL++) per tumbling day
    * window instead: O(2^p) registers per window regardless of user
    * count, and register-max merging is ORDER-INDEPENDENT, so the
    * estimate is deterministic however the micro-batches slice the data.
    * Accuracy contract (the `agg_approx_distinct` lesson, solved rather
    * than exempted: the raw HLL++ estimate can never hash-match DuckDB's
    * different sketch, so the CHECKABLE columns are the exact count and
    * a bound flag): exact per-day distincts from the batch twin, plus
    * one boolean asserting the streamed estimate lands within 5%
    * (rsd 0.02 ⇒ ≥2.5× margin).
    */
  def windowDistinct(s: SparkSession, dir: String): DataFrame = {
    val stream = RecordStream.eventsStream(s, dir)
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("apx"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"), col("apx"))
    val streamed = RecordStream.runToMemory(s, stream, "stream_wdist_sink", "complete")
    val exact = Tables.events(s, dir)
      .groupBy(to_date(col("ts")).as("d"))
      .agg(countDistinct("user_id").as("exact_users"))
      .select(date_format(col("d"), "yyyy-MM-dd").as("day"), col("exact_users"))
    streamed.join(exact, Seq("day"))
      .select(col("day"), col("exact_users"),
        (abs(col("apx").cast("double") - col("exact_users").cast("double"))
          / col("exact_users").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("day")
  }

  private val windowDistinctSql =
    """SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
      |  true AS within_5pct
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  /** Custom per-key state with mapGroupsWithState [REF A7/A10]: running
    * per-user counters, the rebuilt form of the reference's per-shard
    * processor state.
    *
    * State-size argument (why NoTimeout is correct here, unlike
    * [[quotaEnforce]]): the key is the USER, not (user, day) — lifetime
    * stats are the one state class that must never expire while the user
    * is alive, and the store holds exactly 5 longs per distinct user
    * (O(users), not O(users × time); ~80 MB per 10⁹ users on RocksDB —
    * [[TtlCountProcessor]] is the pattern to bolt on when a deployment
    * wants inactive users aged out anyway).
    */
  def statefulUserStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = RecordStream.eventsStream(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[Ev]
    val stats = ds.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[Ev], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(UserStats(uid, 0L, 0.0, 0L, new java.sql.Timestamp(0)))
          var n = prev.n_events
          var total = prev.total_value
          var purchases = prev.n_purchases
          var last = prev.last_ts
          events.foreach { e =>
            n += 1
            total += e.value
            if (e.event_type == "purchase") purchases += 1
            if (e.ts.after(last)) last = e.ts
          }
          val next = UserStats(uid, n, total, purchases, last)
          state.update(next)
          next
      }
    RecordStream.runToMemory(s, stats.toDF(), "stream_stateful_sink", "update")
      .select(col("user_id"), col("n_events"), round(col("total_value"), 2).as("total_value"),
        col("n_purchases"), date_format(col("last_ts"), TsFmt).as("last_ts"))
      .orderBy("user_id")
  }

  private val statefulUserStatsSql =
    s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |  round(sum(value), 2) AS total_value,
       |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchases,
       |  strftime(max(ts), '$DTsFmt') AS last_ts
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** State-v2 `transformWithState` [REF A7/A10]: per-(user, event_type)
    * running aggregates via [[UserTypeStatsProcessor]]'s MapState. Requires
    * the RocksDB provider (the only store implementing state v2) — set for
    * this query and restored after. The staged source delivers the fixture
    * in one data micro-batch, so update-mode emits each (user, type) row
    * exactly once and the memory sink is the final table (same contract as
    * [[statefulUserStats]]).
    */
  /** transformWithState only runs on the RocksDB store (the one provider
    * implementing state v2); set it for the wrapped query, restore after.
    */
  private def withRocksDB[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val clKey = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    val prev = s.conf.getOption(key)
    val prevCl = s.conf.getOption(clKey)
    s.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // Changelog checkpointing: commit uploads the per-batch delta instead
    // of a full RocksDB snapshot — the production setting for frequent
    // small commits, and measurably cheaper even at fixture scale.
    s.conf.set(clKey, "true")
    try body
    finally {
      (prev match {
        case Some(p) => s.conf.set(key, p)
        case None => s.conf.unset(key)
      })
      (prevCl match {
        case Some(p) => s.conf.set(clKey, p)
        case None => s.conf.unset(clKey)
      })
    }
  }

  def twsUserTypeStats(s: SparkSession, dir: String): DataFrame = withRocksDB(s) {
    import s.implicits._
    val ds = RecordStream.eventsStream(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[Ev]
    val stats = ds.groupByKey(_.user_id)
      .transformWithState(new UserTypeStatsProcessor, TimeMode.None(), OutputMode.Update())
    RecordStream.runToMemory(s, stats.toDF(), "stream_tws_sink", "update")
      .select(col("user_id"), col("event_type"), col("n_events"),
        round(col("total_value"), 2).as("total_value"))
      .orderBy("user_id", "event_type")
  }

  private val twsUserTypeStatsSql =
    """SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events,
      |  round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY user_id, event_type""".stripMargin

  /** State-v2 sessionization [REF A7/A10]: [[TwsSessionizer]] (ListState +
    * event-time timers) over the sentinel-staged stream; same output
    * contract — and same batch oracle — as the fMGWS [[statefulSessions]].
    * Multi-batch state folding is pinned by StreamingSpec's TWS 3-batch
    * MemoryStream test.
    */
  def twsSessions(s: SparkSession, dir: String): DataFrame = withRocksDB(s) {
    import s.implicits._
    // 4 files/trigger: fixture + all sentinels in ONE data batch (watermark
    // jumps past every session at its commit), then the engine's
    // watermark-advance batch fires all event-time timers — two RocksDB
    // commit rounds total instead of three. Multi-batch folding is pinned
    // separately by StreamingSpec's 3-batch MemoryStream test.
    val ds = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "0 seconds")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[Ev]
    val sessions = ds.groupByKey(_.user_id)
      .transformWithState(new TwsSessionizer, TimeMode.EventTime(), OutputMode.Append())
    RecordStream.runToMemory(s, sessions.toDF(), "stream_tws_sessions_sink", "append")
      .filter(col("user_id") >= 0) // drop watermark-sentinel sessions
      .select(col("user_id"),
        date_format(col("session_start"), TsFmt).as("session_start"),
        date_format(col("session_end"), TsFmt).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  /** The reference's full dataflow [REF A1→A8→A9→A11], replayed through
    * the NATIVE shard-ordered DataSourceV2 source (KinesisLikeProvider):
    * shard logs in the producer's payload format (with a deterministic
    * corruption for every 97th record), strict decode with error channel,
    * dead-letter split, per-shard accounting — the same per-shard totals
    * the reference's record processors would observe.
    */
  def payloadPipeline(s: SparkSession, dir: String): DataFrame = {
    val records = RecordStream.kinesisSource(s, dir)
    val decoded = RecordStream.decodePayload(records)
    val counted = decoded
      .groupBy("shardId")
      .agg(count(when(col("decode_error").isNull, 1)).as("n_good"),
        count(when(col("decode_error").isNotNull, 1)).as("n_dead_letter"))
    RecordStream.runToMemory(s, counted, "stream_payload_sink", "complete")
      .orderBy("shardId")
  }

  private val payloadPipelineSql =
    s"""SELECT concat('shardId-', lpad(CAST(user_id % ${RecordStream.NumShards} AS VARCHAR), 12, '0'))
       |    AS shardId,
       |  CAST(count(*) FILTER (WHERE event_id % 97 <> 0) AS BIGINT) AS n_good,
       |  CAST(count(*) FILTER (WHERE event_id % 97 = 0) AS BIGINT) AS n_dead_letter
       |FROM events GROUP BY 1 ORDER BY shardId""".stripMargin

  /** Custom sessionization with flatMapGroupsWithState (the general-state
    * sibling of session_window): a TRUE incremental fold. Per-user state is
    * the set of still-open session intervals; each micro-batch's events are
    * merged in (interval-merge within the 30-minute gap), and a session is
    * emitted only once the event-time watermark proves it closed
    * (`end + gap <= watermark`, via `EventTimeTimeout`). Input may arrive
    * split across any number of micro-batches — multi-batch correctness is
    * pinned by StreamingSpec's 3-batch MemoryStream test.
    */
  def sessionize(ds: org.apache.spark.sql.Dataset[Ev]): org.apache.spark.sql.Dataset[SessionOut] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.streaming.OutputMode
    val gapUs = 30L * 60 * 1000 * 1000
    // state/gap arithmetic in MICROseconds: Timestamp.getTime is millis and
    // would silently truncate the fixture's microsecond event times
    def toUs(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }
    def fromUs(us: Long): java.sql.Timestamp =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, events: Iterator[Ev], state: GroupState[SessionState]) =>
          val incoming = events.map(e => SessionAcc(toUs(e.ts), toUs(e.ts), 1L)).toSeq
          val all = (state.getOption.map(_.open).getOrElse(Seq.empty) ++ incoming)
            .sortBy(a => (a.startUs, a.endUs))
          // interval-merge: adjacent accs belong to one session iff the gap
          // between them is <= 30 min (same rule as the batch oracle)
          val merged = all.foldLeft(List.empty[SessionAcc]) { (acc, cur) =>
            acc match {
              case head :: tail if cur.startUs - head.endUs <= gapUs =>
                SessionAcc(head.startUs, math.max(head.endUs, cur.endUs), head.n + cur.n) :: tail
              case _ => cur :: acc
            }
          }.reverse
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (closed, open) = merged.partition(a => a.endUs + gapUs <= wmUs)
          if (open.nonEmpty) {
            state.update(SessionState(open))
            // earliest possible close, CEILed to ms: retained intervals have
            // end+gap > wm (µs), so the ceiling is strictly > watermark ms —
            // setTimeoutTimestamp rejects timestamps at or before the wm
            state.setTimeoutTimestamp((open.map(_.endUs).min + gapUs + 999L) / 1000L)
          } else {
            state.remove()
          }
          closed.iterator.map(c => SessionOut(uid, fromUs(c.startUs), fromUs(c.endUs), c.n))
      }
  }

  def statefulSessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // 4 files/trigger: one data batch + the watermark-advance batch (see
    // sessions above); multi-batch folding is pinned by StreamingSpec
    val ds = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "0 seconds")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[Ev]
    RecordStream.runToMemory(s, sessionize(ds).toDF(), "stream_fmgws_sink", "append")
      .filter(col("user_id") >= 0) // drop watermark-sentinel sessions
      .select(col("user_id"),
        date_format(col("session_start"), TsFmt).as("session_start"),
        date_format(col("session_end"), TsFmt).as("session_end"),
        col("n_events"))
      .orderBy("user_id", "session_start")
  }

  private val statefulSessionsSql =
    s"""WITH marked AS (
       |  SELECT user_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
       |), numbered AS (
       |  SELECT user_id, ts,
       |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |      ROWS UNBOUNDED PRECEDING) AS sid
       |  FROM marked)
       |SELECT user_id,
       |  strftime(min(ts), '$DTsFmt') AS session_start,
       |  strftime(max(ts), '$DTsFmt') AS session_end,
       |  CAST(count(*) AS BIGINT) AS n_events
       |FROM numbered GROUP BY user_id, sid
       |ORDER BY user_id, session_start""".stripMargin

  /** Stream-stream inner join: each purchase joined to the same user's
    * clicks in the preceding hour. Both sides carry watermarks and the
    * join has a time-range bound, so state for either side is dropped once
    * the watermark passes the range — bounded state at any scale.
    */
  def streamStreamJoin(s: SparkSession, dir: String): DataFrame = {
    // Same single-data-micro-batch staging as the left join: 4 files per
    // trigger puts the fixture plus all sentinels in ONE batch per side
    // (inner matches emit immediately; the watermark jump lets the join
    // state evict at commit instead of lingering until stop). Sentinel
    // rows can self-match (same user/ts) — dropped by the p_id filter.
    val purchases = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    // 4 shuffle partitions, not the stateful default 8: a stream-stream
    // join runs FOUR state stores per partition (left/right ×
    // keyToNumValues/keyWithIndexToValue) — per-batch commit overhead is
    // 4x an agg's, so halve the instance count at this state size
    RecordStream.runToMemory(s, joined.select("p_id", "c_id"), "stream_ss_join_sink", "append",
        shufflePartitions = "4")
      .filter(col("p_id") >= 0) // drop watermark-sentinel self-matches
      .orderBy("p_id", "c_id")
  }

  private val streamStreamJoinSql =
    """SELECT p.event_id AS p_id, c.event_id AS c_id
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin

  /** LEFT SEMI stream-stream join — existence without multiplicity:
    * purchases that had ≥1 click in the prior hour emit EXACTLY ONCE, as
    * soon as the first match arrives, and the matched left row's state
    * can drop immediately (the engine needs no match count) — cheaper
    * state than inner for the "did X happen before Y" question. Same
    * staging/watermark/shuffle treatment as the sibling joins.
    */
  def streamStreamSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val purchases = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_semi")
    RecordStream.runToMemory(s, joined.select(col("p_id"), col("p_user")),
        "stream_ss_semi_sink", "append", shufflePartitions = "4") // see streamStreamJoin
      .filter(col("p_id") >= 0) // drop watermark-sentinel self-matches
      .orderBy("p_id")
  }

  private val streamStreamSemiJoinSql =
    """SELECT p.event_id AS p_id, p.user_id AS p_user
      |FROM events p SEMI JOIN events c
      |  ON p.user_id = c.user_id AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |ORDER BY p_id""".stripMargin

  /** LEFT OUTER stream-stream join: purchases with no click in the prior
    * hour must still emit (with nulls) — but only once the watermark
    * proves no match can arrive. The sentinel micro-batches advance the
    * watermark past the fixture so every unmatched row is flushed
    * deterministically.
    */
  def streamStreamLeftJoin(s: SparkSession, dir: String): DataFrame = {
    // watermark BEFORE the type filter: the far-future sentinels are not
    // purchases/clicks, but they must still advance the event-time clock —
    // a filter upstream of withWatermark would starve it and unmatched
    // rows would never flush
    // 4 files per trigger → ONE data micro-batch (fixture + all sentinels;
    // inner matches emit, watermark jumps past the fixture at commit) plus
    // the engine's watermark-advance batch that flushes every unmatched
    // left row — the minimum number of state-store commit rounds
    val purchases = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
    RecordStream.runToMemory(s, joined.select(col("p_id"), col("c_id")),
        "stream_ss_left_sink", "append", shufflePartitions = "4") // see streamStreamJoin
      .filter(col("p_id") >= 0) // drop watermark-sentinel rows
      .groupBy("p_id")
      .agg(count(col("c_id")).as("n_clicks"))
      .orderBy("p_id")
  }

  private val streamStreamLeftJoinSql =
    """SELECT p.event_id AS p_id,
      |  CAST(count(c.event_id) AS BIGINT) AS n_clicks
      |FROM events p LEFT JOIN events c
      |  ON p.user_id = c.user_id AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id ORDER BY p_id""".stripMargin

  /** FULL OUTER stream-stream join — completes the family
    * (inner/left/semi/full): matches emit immediately; unmatched rows from
    * EITHER side emit with nulls once the watermark proves no partner can
    * arrive. State on both sides stays time-bounded by the watermark + the
    * join's time-range condition, exactly as for the other variants.
    */
  def streamStreamFullJoin(s: SparkSession, dir: String): DataFrame = {
    val purchases = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "full_outer")
    RecordStream.runToMemory(s, joined.select(col("p_id"), col("c_id")),
        "stream_ss_full_sink", "append", shufflePartitions = "4") // see streamStreamJoin
      // sentinel rows carry negative ids on whichever side they populate;
      // a null on either side is a REAL unmatched row and must survive
      .filter(coalesce(col("p_id"), lit(0L)) >= 0 &&
        coalesce(col("c_id"), lit(0L)) >= 0)
      .orderBy("p_id", "c_id")
  }

  private val streamStreamFullJoinSql =
    """WITH p AS (SELECT event_id AS p_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |     c AS (SELECT event_id AS c_id, user_id, ts FROM events
      |           WHERE event_type = 'click')
      |SELECT p.p_id, c.c_id
      |FROM p FULL JOIN c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |ORDER BY p_id, c_id""".stripMargin

  /** RIGHT OUTER stream-stream join — the mirror of
    * [[streamStreamLeftJoin]] preserving the CLICK side: every click
    * emits its count of qualifying purchases in the following hour, zero
    * included, once the watermark proves no purchase can still arrive.
    * Completes the outer-join family (inner/left/right/full/semi).
    */
  def streamStreamRightJoin(s: SparkSession, dir: String): DataFrame = {
    val purchases = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val clicks = RecordStream.eventsStreamWithSentinels(s, dir, filesPerTrigger = 4)
      .withWatermark("ts", "1 minute")
      .filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id").as("c_user"), col("ts").as("c_ts"))
    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "right_outer")
    RecordStream.runToMemory(s, joined.select(col("c_id"), col("p_id")),
        "stream_ss_right_sink", "append", shufflePartitions = "4") // see streamStreamJoin
      .filter(col("c_id") >= 0) // drop watermark-sentinel rows
      .groupBy("c_id")
      .agg(count(col("p_id")).as("n_purchases"))
      .orderBy("c_id")
  }

  private val streamStreamRightJoinSql =
    """SELECT c.event_id AS c_id,
      |  CAST(count(p.event_id) AS BIGINT) AS n_purchases
      |FROM events p RIGHT JOIN events c
      |  ON c.user_id = p.user_id AND p.event_type = 'purchase'
      | AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
      |WHERE c.event_type = 'click'
      |GROUP BY c.event_id ORDER BY c_id""".stripMargin

  /** Tumbling windowed counts per shard over the NATIVE shard-ordered
    * source — the reference's per-shard processing with event-time
    * windowing layered on top, end-to-end through the DataSourceV2 path.
    */
  /** Trigger.AvailableNow backfill through the native source [REF A6/A10]:
    * the production "process the whole backlog, rate-limited, then stop"
    * path. The source snapshots its shard tips at query start
    * (SupportsTriggerAvailableNow) and the per-shard admission-control cap
    * slices the backlog into bounded micro-batches — at sf0.1 this runs
    * ≥3 rate-limited batches before terminating on its own. Output is the
    * per-shard backlog accounting a KCL operator would reconcile against
    * the stream's tip after a catch-up run.
    */
  def availableNowBackfill(s: SparkSession, dir: String): DataFrame = {
    val records = RecordStream.kinesisSource(s, dir, maxRecordsPerShardPerBatch = 20000)
    // no DISTINCT aggregates on streams — backlog accounting sticks to
    // record counts, the seq range, and the poison-pill tally [REF A9]
    val agg = records.groupBy("shardId")
      .agg(count(lit(1)).as("n_records"),
        min("sequenceNumber").as("first_seq"),
        max("sequenceNumber").as("last_seq"),
        count(when(col("data").startsWith("garbage-"), 1)).as("n_poison"))
    RecordStream.runToMemory(s, agg, "stream_available_now_sink", "complete",
        availableNow = true)
      .orderBy("shardId")
  }

  private val availableNowBackfillSql =
    s"""SELECT concat('shardId-', lpad(CAST(user_id % ${RecordStream.NumShards} AS VARCHAR), 12, '0'))
       |    AS shardId,
       |  CAST(count(*) AS BIGINT) AS n_records,
       |  CAST(0 AS BIGINT) AS first_seq,
       |  CAST(count(*) - 1 AS BIGINT) AS last_seq,
       |  CAST(count(*) FILTER (event_id % 97 = 0) AS BIGINT) AS n_poison
       |FROM events GROUP BY 1 ORDER BY shardId""".stripMargin

  /** Backfill across a RESHARD [REF A14]: the fixture is staged mid-split
    * (shard 0's records before 2024-01-15 in the closed parent shard-000,
    * the rest in child shard-100, lineage in `_topology.txt`), and the
    * native source withholds the child until the parent is fully drained —
    * the KCL's parent-before-children order, pinned batch-by-batch in
    * NativeSourceSpec. The per-shard cap forces a multi-batch drain, so
    * the hold-back logic is on the timed path. Output is the per-shard
    * backlog accounting, now spanning three shard generations.
    */
  def reshardBackfill(s: SparkSession, dir: String): DataFrame = {
    val records = s.readStream
      .format(classOf[graft.streaming.source.KinesisLikeProvider].getName)
      .option("path", RecordStream.kinesisReshardFixture(s, dir))
      .option("maxRecordsPerShardPerBatch", "20000")
      .load()
    val agg = records.groupBy("shardId")
      .agg(count(lit(1)).as("n_records"),
        min("sequenceNumber").as("first_seq"),
        max("sequenceNumber").as("last_seq"),
        count(when(col("data").startsWith("garbage-"), 1)).as("n_poison"))
    RecordStream.runToMemory(s, agg, "stream_reshard_sink", "complete",
        availableNow = true)
      .orderBy("shardId")
  }

  private val reshardBackfillSql =
    s"""WITH shards AS (
       |  SELECT CASE
       |      WHEN user_id % ${RecordStream.NumShards} <> 0
       |        THEN concat('shardId-', lpad(CAST(user_id % ${RecordStream.NumShards} AS VARCHAR), 12, '0'))
       |      WHEN ts < TIMESTAMP '2024-01-15' THEN 'shardId-000000000000'
       |      ELSE 'shardId-000000000100' END AS shardId,
       |    event_id
       |  FROM events)
       |SELECT shardId,
       |  CAST(count(*) AS BIGINT) AS n_records,
       |  CAST(0 AS BIGINT) AS first_seq,
       |  CAST(count(*) - 1 AS BIGINT) AS last_seq,
       |  CAST(count(*) FILTER (event_id % 97 = 0) AS BIGINT) AS n_poison
       |FROM shards GROUP BY shardId ORDER BY shardId""".stripMargin

  def nativeWindowedCounts(s: SparkSession, dir: String): DataFrame = {
    val agg = RecordStream.kinesisSource(s, dir)
      .groupBy(window(col("arrivalTs"), "1 hour").as("w"), col("shardId"))
      .agg(count(lit(1)).as("n"))
    RecordStream.runToMemory(s, agg, "stream_native_win_sink", "complete")
      .select(date_format(col("w.start"), TsFmt).as("window_start"), col("shardId"), col("n"))
      .orderBy("window_start", "shardId")
  }

  private val nativeWindowedCountsSql =
    s"""SELECT strftime(to_timestamp(CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT)), '$DTsFmt')
       |    AS window_start,
       |  concat('shardId-', lpad(CAST(user_id % ${RecordStream.NumShards} AS VARCHAR), 12, '0'))
       |    AS shardId,
       |  CAST(count(*) AS BIGINT) AS n
       |FROM events GROUP BY 1, 2 ORDER BY window_start, shardId""".stripMargin

  /** Streaming count-min heavy hitters: which users dominate the event
    * stream, answered with BOUNDED state — the sketch-family streaming
    * completion next to [[tdigestStream]] (quantiles) and
    * [[windowDistinct]] (distincts). The CMS is held RELATIONALLY as
    * its 4×1024 cell grid (the [[graft.operators.AggQueries
    * .countMinHeavyHitters]] representation): a streaming complete-mode
    * aggregation over (row, md5-bucket) whose per-cell counts are
    * ADDITIVE integers, so the sketch is deterministic however the
    * micro-batches slice the data, and state is O(d·w) forever — the
    * exact per-user count state this replaces is O(users). The probe
    * side then reads the top-10 true heavy users from the batch twin
    * and takes min over their 4 cells. Every output column is exact
    * integer arithmetic on deterministic hashes, so the oracle is a
    * FULL hash-match (the batch CMS in DuckDB), not a weaker contract
    * boolean: min-cell ≥ true count is the classic CMS one-sided bound,
    * pinned per row in `bound_holds`.
    */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    def bucket(rCol: String, keyCol: String) =
      s"CAST(conv(substring(md5(CAST(concat('cms', CAST($rCol AS STRING), ':', " +
        s"$keyCol) AS BINARY)), 1, 8), 16, 10) AS BIGINT) % 1024"
    val cellsStream = RecordStream.eventsStream(s, dir)
      .select(col("user_id").cast("string").as("u"),
        explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket", expr(bucket("r", "u")))
      .groupBy("r", "bucket").agg(count(lit(1)).as("cell"))
    val cells = RecordStream.runToMemory(s, cellsStream, "stream_cms_sink", "complete")
    val top = Tables.events(s, dir)
      .groupBy(col("user_id").cast("string").as("u"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(desc("true_count"), asc("u")).limit(10)
    top.select(col("u"), col("true_count"), explode(expr("sequence(0, 3)")).as("r"))
      .withColumn("bucket", expr(bucket("r", "u")))
      .join(broadcast(cells), Seq("r", "bucket"))
      .groupBy("u", "true_count")
      .agg(min("cell").as("cms_estimate"))
      .select(col("u").as("user_id"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).as("overestimate"),
        (col("cms_estimate") >= col("true_count")).as("bound_holds"))
      .orderBy(desc("true_count"), asc("user_id"))
  }

  private val cmsHeavyHittersSql =
    """WITH ev AS (
      |  SELECT CAST(user_id AS VARCHAR) AS u FROM events),
      |hashed AS (
      |  SELECT u, r,
      |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || u), 1, 8))
      |      AS BIGINT) % 1024 AS bucket
      |  FROM ev, unnest(range(0, 4)) AS t(r)),
      |cells AS (
      |  SELECT r, bucket, CAST(count(*) AS BIGINT) AS cell
      |  FROM hashed GROUP BY 1, 2),
      |top AS (
      |  SELECT u, CAST(count(*) AS BIGINT) AS true_count
      |  FROM ev GROUP BY 1 ORDER BY true_count DESC, u LIMIT 10),
      |probe AS (
      |  SELECT top.u, top.true_count, r,
      |    CAST(('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || top.u), 1, 8))
      |      AS BIGINT) % 1024 AS bucket
      |  FROM top, unnest(range(0, 4)) AS t(r))
      |SELECT probe.u AS user_id, probe.true_count,
      |  CAST(min(cell) AS BIGINT) AS cms_estimate,
      |  CAST(min(cell) - probe.true_count AS BIGINT) AS overestimate,
      |  min(cell) >= probe.true_count AS bound_holds
      |FROM probe JOIN cells USING (r, bucket)
      |GROUP BY 1, 2
      |ORDER BY true_count DESC, user_id""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("stream_cms_heavy_hitters", cmsHeavyHitters, Some(cmsHeavyHittersSql)),
    QueryDef("stream_native_windowed", nativeWindowedCounts, Some(nativeWindowedCountsSql)),
    QueryDef("stream_available_now", availableNowBackfill, Some(availableNowBackfillSql)),
    QueryDef("stream_reshard_backfill", reshardBackfill, Some(reshardBackfillSql)),
    QueryDef("stream_stream_left_join", streamStreamLeftJoin, Some(streamStreamLeftJoinSql)),
    QueryDef("stream_stream_join", streamStreamJoin, Some(streamStreamJoinSql)),
    QueryDef("stream_stream_semi_join", streamStreamSemiJoin, Some(streamStreamSemiJoinSql)),
    QueryDef("stream_stream_full_join", streamStreamFullJoin, Some(streamStreamFullJoinSql)),
    QueryDef("stream_stream_right_join", streamStreamRightJoin, Some(streamStreamRightJoinSql)),
    QueryDef("stream_stateful_sessions", statefulSessions, Some(statefulSessionsSql)),
    // same closure contract, state-v2 realization → same batch oracle
    QueryDef("stream_tws_sessions", twsSessions, Some(statefulSessionsSql)),
    QueryDef("stream_tumbling_counts", tumbling, Some(tumblingSql)),
    QueryDef("stream_ohlc_bars", ohlcBars, Some(ohlcBarsSql)),
    QueryDef("stream_windowed_topk", windowedTopk, Some(windowedTopkSql)),
    QueryDef("stream_sliding_counts", sliding, Some(slidingSql)),
    QueryDef("stream_session_windows", sessions, Some(sessionsSql)),
    QueryDef("stream_dynamic_gap_sessions", dynamicGapSessions,
      Some(dynamicGapSessionsSql)),
    QueryDef("stream_dedup", dedup, Some(dedupSql)),
    QueryDef("stream_dedup_within_watermark", dedupWithinWatermark,
      Some(dedupWithinWatermarkSql)),
    QueryDef("stream_quota_enforce", quotaEnforce, Some(quotaEnforceSql)),
    QueryDef("stream_tdigest_quantiles", tdigestStream, Some(tdigestStreamSql)),
    QueryDef("stream_window_distinct", windowDistinct, Some(windowDistinctSql)),
    QueryDef("stream_state_store_read", stateStoreRead, Some(stateStoreReadSql)),
    QueryDef("stream_static_join", streamStaticJoin, Some(streamStaticJoinSql)),
    QueryDef("stream_static_anti_join", streamStaticAntiJoin, Some(streamStaticAntiJoinSql)),
    QueryDef("stream_union", streamUnion, Some(streamUnionSql)),
    QueryDef("stream_foreachbatch_merge", foreachBatchMerge, Some(foreachBatchMergeSql)),
    QueryDef("stream_stateful_user_stats", statefulUserStats, Some(statefulUserStatsSql)),
    QueryDef("stream_tws_user_type_stats", twsUserTypeStats, Some(twsUserTypeStatsSql)),
    QueryDef("stream_payload_pipeline", payloadPipeline, Some(payloadPipelineSql))
  )
}
