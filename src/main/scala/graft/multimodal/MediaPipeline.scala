package graft.multimodal

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata. At 100 TB
  * the payload column stays opaque (never parsed by the optimizer) and the
  * metadata columns drive partition pruning / filtering.
  */
case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte],
    n_chars: Long,
    source: String)

/** One sampled frame of a video payload (frameSamples output row). */
case class FrameSample(
    doc_id: Long,
    frame_idx: Int,
    byte_offset: Int,
    frame_byte: Int)

/** Extracted features. `sample0..3` stand in for frame samples. */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    checksum: Long,
    sample0: Int,
    sample1: Int,
    sample2: Int,
    sample3: Int)

/** Multimodal-column plumbing (SURVEY.md §2 LLM extensions).
  *
  * Real pipelines decode image/audio/video with codec libraries inside a
  * partition-wise batch UDF. Those libraries are not in this container, so
  * `decode` below is a clearly-marked DETERMINISTIC STUB (byte arithmetic
  * standing in for pixel/sample decoding); everything around it — the
  * binary column, the typed metadata, the mapPartitions batch shape, the
  * schema of the feature output — is the real, tested plumbing. Swap the
  * stub body for e.g. a JNI codec without touching the plan.
  */
object MediaPipeline extends QueryModule {

  /** STUB: stands in for an image/audio decoder. Deterministic byte math:
    * length, modular checksum, and 4 evenly-spaced "frame samples".
    */
  def decode(payload: Array[Byte]): (Int, Long, Array[Int]) = {
    val n = payload.length
    var sum = 0L
    var i = 0
    while (i < n) { sum = (sum + (payload(i) & 0xff)) % 1000003L; i += 1 }
    val samples = Array.tabulate(4) { k =>
      if (n == 0) -1 else payload((k * n) / 4) & 0xff
    }
    (n, sum, samples)
  }

  /** Attach a synthetic media payload to each document (binary column +
    * typed metadata) — the fixture set has no real media files, so the
    * UTF-8 bytes of `text` play the role of the opaque blob.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars"),
        col("source"))

  /** Feature extraction via mapPartitions: one decoder instance per
    * partition, records streamed through it batch-wise (the Scala analogue
    * of a pandas-batch UDF). No driver collection; output is a typed
    * Dataset with a columnar-friendly schema.
    */
  def extractFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val (n, sum, samples) = decode(rec.payload)
          MediaFeatures(rec.doc_id, rec.media_type, n, sum,
            samples(0), samples(1), samples(2), samples(3))
        }
      }
      .toDF()
      .orderBy("doc_id")
  }

  // The oracle replays the stub's byte arithmetic in SQL: document text is
  // ASCII, so byte k of the UTF-8 payload is ascii(substr(text, k+1, 1)).
  private val extractFeaturesSql =
    """SELECT d.doc_id,
      |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  CAST(length(d.text) AS INT) AS n_bytes,
      |  CAST(list_sum(list_transform(range(0, length(d.text)),
      |    i -> CAST(ascii(substr(d.text, CAST(i AS INT) + 1, 1)) AS BIGINT))) % 1000003 AS BIGINT)
      |    AS checksum,
      |  CAST(ascii(substr(d.text, (0 * length(d.text)) // 4 + 1, 1)) AS INT) AS sample0,
      |  CAST(ascii(substr(d.text, (1 * length(d.text)) // 4 + 1, 1)) AS INT) AS sample1,
      |  CAST(ascii(substr(d.text, (2 * length(d.text)) // 4 + 1, 1)) AS INT) AS sample2,
      |  CAST(ascii(substr(d.text, (3 * length(d.text)) // 4 + 1, 1)) AS INT) AS sample3
      |FROM documents d
      |ORDER BY d.doc_id""".stripMargin

  /** Metadata-driven filtering/partitioning over the media table: the
    * optimizer prunes on typed metadata while the blob stays untouched —
    * verify payload size flows through without decoding.
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy("media_type", "source")
      .agg(count(lit(1)).as("n"),
        sum(length(col("payload")).cast("long")).as("total_bytes"),
        max("n_chars").as("max_chars"))
      .orderBy("media_type", "source")

  private val mediaStatsSql =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  source, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(length(text)) AS BIGINT) AS total_bytes,
      |  max(n_chars) AS max_chars
      |FROM documents
      |GROUP BY 1, 2 ORDER BY media_type, source""".stripMargin

  /** Frame sampling as a typed one-to-many expansion (`flatMap`): each
    * video row yields 8 evenly-spaced frame records — the per-frame
    * explosion every video pipeline runs before frame-level embedding.
    * The "frame grab" is the same deterministic byte stub as [[decode]];
    * the real part is the shape: metadata filter prunes to videos BEFORE
    * the expansion (never sample what you drop), the blob is read only
    * inside the executor-side lambda, and output is a typed,
    * columnar-friendly frame table keyed for a downstream frame-keyed
    * shuffle.
    */
  def frameSamples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .as[MediaRecord]
      .flatMap { rec =>
        val n = rec.payload.length
        (0 until 8).iterator.map { j =>
          val off = (j * n) / 8
          FrameSample(rec.doc_id, j, off, if (n == 0) -1 else rec.payload(off) & 0xff)
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  private val frameSamplesSql =
    """SELECT doc_id, CAST(j AS INT) AS frame_idx,
      |  CAST((j * length(text)) // 8 AS INT) AS byte_offset,
      |  CAST(ascii(substr(text, CAST((j * length(text)) // 8 AS INT) + 1, 1)) AS INT)
      |    AS frame_byte
      |FROM documents, unnest(range(0, 8)) AS u(j)
      |WHERE doc_id % 3 = 2
      |ORDER BY doc_id, frame_idx""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("multimodal_features", extractFeatures, Some(extractFeaturesSql)),
    QueryDef("multimodal_media_stats", mediaStats, Some(mediaStatsSql)),
    QueryDef("multimodal_frame_sample", frameSamples, Some(frameSamplesSql))
  )
}
