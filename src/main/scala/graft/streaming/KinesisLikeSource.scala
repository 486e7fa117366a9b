package graft.streaming.source

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{Column, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A native shard-ordered streaming source (DataSourceV2 MicroBatchStream),
  * rebuilt from the reference's consumer surface: a named stream of N
  * shards, each an ordered log of (partitionKey, data) records addressed
  * by per-shard sequence numbers, replayed in order with checkpointed
  * offsets (reference: AmazonKinesisRecordConsumerSample.java:70-84 — shard
  * discovery + per-shard iteration; AmazonKinesisApplicationSampleRecord
  * Processor.java:117-148 — sequence-number checkpointing).
  *
  * The physical log is one staged text file per shard
  * (`shard-NNN.txt`, lines `tsNanos\tpartitionKey\tpayload`); the line
  * number IS the sequence number. Offsets are `{shardId -> nextSeq}` maps,
  * serialized to the checkpoint log, so restart-recovery resumes each
  * shard exactly where it left off (exactly-once replay — pinned in
  * NativeSourceSpec). One InputPartition per shard per batch preserves
  * within-shard order end-to-end, the same contract the reference's
  * per-shard record processor provides.
  *
  * Scale shape: shards map 1:1 to input partitions, so parallelism = shard
  * count (exactly the reference's model); a production reader would keep a
  * byte-offset index per sequence number instead of skipping lines from the
  * head (the analogue of a shard iterator), which changes none of the
  * plumbing here.
  */
class KinesisLikeProvider extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  /** Short name for `spark.readStream.format("kinesis-like")` (registered
    * via META-INF/services).
    */
  override def shortName(): String = "kinesis-like"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisLikeSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KinesisLikeTable(opts.get("path"),
      Option(opts.get("maxRecordsPerShardPerBatch")).map(_.toLong)
        .getOrElse(Long.MaxValue),
      Option(opts.get("streamName")).getOrElse("graft-events"))
  }
  override def supportsExternalMetadata(): Boolean = false
}

object KinesisLikeSource {
  /** The reference record surface (SURVEY.md §1.3): payload bytes +
    * partition key + per-shard sequence number + shard id + arrival time.
    */
  val Schema: StructType = StructType(Seq(
    StructField("stream", StringType),
    StructField("shardId", StringType),
    StructField("partitionKey", StringType),
    StructField("sequenceNumber", LongType),
    StructField("data", BinaryType),
    StructField("arrivalTs", TimestampType)))

  def shardFiles(path: String): Seq[java.io.File] =
    new java.io.File(path).listFiles()
      .filter(f => f.getName.startsWith("shard-") && f.getName.endsWith(".txt"))
      .sortBy(_.getName).toSeq

  def shardIdOf(fileName: String): String =
    "shardId-" + fileName.stripPrefix("shard-").stripSuffix(".txt").reverse
      .padTo(12, '0').reverse
}

class KinesisLikeTable(path: String, maxPerBatch: Long, streamName: String)
    extends Table with SupportsRead {
  override def name(): String = s"kinesis_like($streamName)"
  // columns() uses the Table interface default, derived from schema()
  override def schema(): StructType = KinesisLikeSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = KinesisLikeSource.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new KinesisLikeMicroBatch(path, maxPerBatch, streamName)
      }
    }
}

/** Offset = next sequence number to read, per shard. JSON is a sorted-key
  * object so serialization is stable across runs.
  */
case class ShardOffsets(offsets: Map[String, Long]) extends Offset {
  override def json(): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (s, o) => s""""$s":$o""" }.mkString("{", ",", "}")
}

object ShardOffsets {
  private val Entry = """"([^"]+)":(\d+)""".r
  def fromJson(json: String): ShardOffsets =
    ShardOffsets(Entry.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
}

class KinesisLikeMicroBatch(path: String, maxPerBatch: Long, streamName: String)
    extends MicroBatchStream with SupportsAdmissionControl {

  private val files: Seq[java.io.File] = KinesisLikeSource.shardFiles(path)

  /** Total records per shard (the shard's end sequence number), computed
    * once — the analogue of the consumer's shard-end discovery [REF A14].
    */
  private lazy val shardEnds: Map[String, Long] = files.map { f =>
    val src = scala.io.Source.fromFile(f, "UTF-8")
    try KinesisLikeSource.shardIdOf(f.getName) -> src.getLines().size.toLong
    finally src.close()
  }.toMap

  override def initialOffset(): Offset =
    ShardOffsets(shardEnds.keys.map(_ -> 0L).toMap)

  /** Rate-limited advance from the engine-provided start — the
    * SupportsAdmissionControl form receives the restored start offset on
    * restart, so a resumed query continues from its checkpoint (the no-arg
    * latestOffset has no start and cannot express per-shard rate limits).
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = start.asInstanceOf[ShardOffsets].offsets
    ShardOffsets(shardEnds.map { case (s, end) =>
      val c = cur.getOrElse(s, 0L)
      // saturating add: maxPerBatch defaults to Long.MaxValue
      val capped = if (Long.MaxValue - maxPerBatch < c) Long.MaxValue else c + maxPerBatch
      s -> math.max(c, math.min(end, capped))
    })
  }

  /** Unreachable when SupportsAdmissionControl is implemented; report
    * everything available for safety.
    */
  override def latestOffset(): Offset = ShardOffsets(shardEnds)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[ShardOffsets].offsets
    val e = end.asInstanceOf[ShardOffsets].offsets
    files.flatMap { f =>
      val shard = KinesisLikeSource.shardIdOf(f.getName)
      val (from, until) = (s.getOrElse(shard, 0L), e.getOrElse(shard, 0L))
      if (until > from)
        Some(KinesisShardPartition(f.getAbsolutePath, shard, from, until, streamName))
      else None
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new KinesisShardReaderFactory

  override def deserializeOffset(json: String): Offset = ShardOffsets.fromJson(json)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** One shard slice: [fromSeq, untilSeq) of the shard's ordered log. */
case class KinesisShardPartition(file: String, shardId: String,
    fromSeq: Long, untilSeq: Long, streamName: String) extends InputPartition

class KinesisShardReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KinesisShardPartition]
    new PartitionReader[InternalRow] {
      private val reader = new java.io.BufferedReader(
        new java.io.InputStreamReader(
          new java.io.FileInputStream(p.file), java.nio.charset.StandardCharsets.UTF_8))
      private var seq = 0L
      locally { while (seq < p.fromSeq && reader.readLine() != null) seq += 1 }
      private var row: InternalRow = _

      override def next(): Boolean = {
        if (seq >= p.untilSeq) return false
        val line = reader.readLine()
        if (line == null) return false
        val Array(tsNanos, key, payload) = line.split("\t", 3)
        row = new GenericInternalRow(Array[Any](
          UTF8String.fromString(p.streamName),
          UTF8String.fromString(p.shardId),
          UTF8String.fromString(key),
          seq,
          payload.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          tsNanos.toLong / 1000L)) // nanos -> micros
        seq += 1
        true
      }
      override def get(): InternalRow = row
      override def close(): Unit = reader.close()
    }
  }
}
