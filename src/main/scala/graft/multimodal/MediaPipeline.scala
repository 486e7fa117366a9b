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
  * partition-wise batch UDF. The IMAGE path here is a REAL codec path:
  * payloads are genuine PNG files (staged deterministically per doc, so
  * the lossless pixel values are known arithmetic both engines can
  * compute) decoded executor-side with `javax.imageio` — no new
  * dependencies, actual bytes→pixels work. Audio/video codecs are not in
  * this container, so their branch of `decode` remains a clearly-marked
  * DETERMINISTIC STUB (byte arithmetic standing in for sample decoding);
  * everything around it — the binary column, the typed metadata, the
  * mapPartitions batch shape, the schema of the feature output — is the
  * real, tested plumbing. Swap the stub branch for e.g. a JNI codec
  * without touching the plan.
  */
object MediaPipeline extends QueryModule {

  /** Pixel formula for the staged PNGs: an 8×8 8-bit grayscale image
    * whose sample at (x, y) is `(doc_id·31 + x·7 + y·13) mod 256`. PNG is
    * lossless, so decode(stage(doc_id)) recovers exactly these values —
    * which is what lets a SQL oracle check a real codec round-trip.
    */
  val ImgSide = 8
  def pixelValue(docId: Long, x: Int, y: Int): Int =
    ((docId * 31 + x * 7 + y * 13) % 256).toInt

  /** Stage the deterministic PNG payload for an image doc (executor-side;
    * ~100 bytes each, no files touched).
    */
  def pngPayload(docId: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgSide, ImgSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgSide) {
      var x = 0
      while (x < ImgSide) {
        raster.setSample(x, y, 0, pixelValue(docId, x, y)); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')

  /** Decoder. PNG payloads (magic-sniffed) take the REAL path: ImageIO
    * decode, features from actual pixels in raster order — n = pixel
    * count, modular checksum of gray values, 4 evenly-spaced samples.
    * Anything else takes the STUB path: the same shape computed by byte
    * arithmetic (stands in for an audio/video codec).
    */
  def decode(payload: Array[Byte]): (Int, Long, Array[Int]) = {
    if (payload.length > 4 && payload.take(4).sameElements(PngMagic)) {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      val (w, h) = (img.getWidth, img.getHeight)
      val raster = img.getRaster
      val n = w * h
      var sum = 0L
      var i = 0
      while (i < n) {
        sum = (sum + raster.getSample(i % w, i / w, 0)) % 1000003L; i += 1
      }
      val samples = Array.tabulate(4) { k =>
        val p = (k * n) / 4
        raster.getSample(p % w, p / w, 0)
      }
      (n, sum, samples)
    } else {
      val n = payload.length
      var sum = 0L
      var i = 0
      while (i < n) { sum = (sum + (payload(i) & 0xff)) % 1000003L; i += 1 }
      val samples = Array.tabulate(4) { k =>
        if (n == 0) -1 else payload((k * n) / 4) & 0xff
      }
      (n, sum, samples)
    }
  }

  /** Attach a media payload to each document (binary column + typed
    * metadata). Image rows carry a GENUINE PNG blob (staged executor-side
    * from the deterministic pixel formula — the fixture set ships no
    * media files); audio/video rows use the UTF-8 bytes of `text` as the
    * opaque blob. The staging UDF is the one deliberate non-codegen step:
    * it plays the part of the ingest system that produced the blobs, not
    * of the query engine.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val stagePng = udf((id: Long) => pngPayload(id))
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("media_type"),
        col("text"),
        col("n_chars"),
        col("source"))
      .withColumn("payload",
        when(col("media_type") === "image", stagePng(col("doc_id")))
          .otherwise(encode(col("text"), "UTF-8")))
      .drop("text")
  }

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

  // The oracle replays both decode branches in SQL. Image rows (real PNG
  // path): PNG is lossless, so the decoded 8×8 gray samples are exactly
  // the staging formula (doc_id·31 + x·7 + y·13) mod 256, raster order
  // i → (x, y) = (i % 8, i // 8); sample k sits at p = 16k → x = 0,
  // y = 2k. Audio/video rows (stub path): document text is ASCII, so byte
  // k of the UTF-8 payload is ascii(substr(text, k+1, 1)).
  private val extractFeaturesSql =
    """SELECT d.doc_id,
      |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  CASE WHEN d.doc_id % 3 = 0 THEN 64
      |       ELSE CAST(length(d.text) AS INT) END AS n_bytes,
      |  CASE WHEN d.doc_id % 3 = 0 THEN
      |    CAST(list_sum(list_transform(range(0, 64),
      |      i -> (d.doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256)) % 1000003 AS BIGINT)
      |  ELSE
      |    CAST(list_sum(list_transform(range(0, length(d.text)),
      |      i -> CAST(ascii(substr(d.text, CAST(i AS INT) + 1, 1)) AS BIGINT))) % 1000003 AS BIGINT)
      |  END AS checksum,
      |  CASE WHEN d.doc_id % 3 = 0 THEN CAST((d.doc_id * 31 + 13 * 0) % 256 AS INT)
      |       ELSE CAST(ascii(substr(d.text, (0 * length(d.text)) // 4 + 1, 1)) AS INT) END AS sample0,
      |  CASE WHEN d.doc_id % 3 = 0 THEN CAST((d.doc_id * 31 + 13 * 2) % 256 AS INT)
      |       ELSE CAST(ascii(substr(d.text, (1 * length(d.text)) // 4 + 1, 1)) AS INT) END AS sample1,
      |  CASE WHEN d.doc_id % 3 = 0 THEN CAST((d.doc_id * 31 + 13 * 4) % 256 AS INT)
      |       ELSE CAST(ascii(substr(d.text, (2 * length(d.text)) // 4 + 1, 1)) AS INT) END AS sample2,
      |  CASE WHEN d.doc_id % 3 = 0 THEN CAST((d.doc_id * 31 + 13 * 6) % 256 AS INT)
      |       ELSE CAST(ascii(substr(d.text, (3 * length(d.text)) // 4 + 1, 1)) AS INT) END AS sample3
      |FROM documents d
      |ORDER BY d.doc_id""".stripMargin

  /** Metadata-driven stats over the media table: the report reads ONLY
    * the typed metadata columns — column pruning must drop the blob from
    * the scan entirely (the whole point of typed metadata next to an
    * opaque payload: answer it without touching a byte of media).
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame =
    mediaTable(s, dir)
      .groupBy("media_type", "source")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("total_chars"),
        max("n_chars").as("max_chars"))
      .orderBy("media_type", "source")

  private val mediaStatsSql =
    """SELECT CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  source, CAST(count(*) AS BIGINT) AS n,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
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
