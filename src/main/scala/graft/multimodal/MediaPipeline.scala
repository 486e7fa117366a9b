package graft.multimodal

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

/** One sampled frame of a video payload (frameSamples output row): the
  * demuxer's frame index, the decoded frame's pixel checksum, and its
  * top-left pixel.
  */
case class FrameSample(
    doc_id: Long,
    frame_idx: Int,
    frame_no: Int,
    frame_checksum: Long,
    pixel0: Int)

/** Extracted features. `n_samples` counts DECODED samples (pixels for
  * stills and video, PCM samples for audio — NOT payload bytes);
  * `sample0..3` are evenly-spaced decoded samples.
  */
case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_samples: Int,
    checksum: Long,
    sample0: Int,
    sample1: Int,
    sample2: Int,
    sample3: Int)

/** Per-document windowed audio energy (audioEnergy output row): frame
  * energies are exact integers (Σ of centered-sample squares), peak RMS
  * is one IEEE sqrt of an exact integer — correctly rounded per IEEE-754,
  * so both engines emit the identical double.
  */
case class AudioEnergy(
    doc_id: Long,
    n_frames: Int,
    peak_frame: Int,
    peak_energy: Long,
    total_energy: Long,
    peak_rms: Double)

/** Multimodal-column plumbing (SURVEY.md §2 LLM extensions).
  *
  * Real pipelines decode image/audio/video with codec libraries inside a
  * partition-wise batch UDF. All three modalities here are REAL codec
  * paths built on what the JVM ships:
  *
  *   - image: genuine PNG files decoded with `javax.imageio`;
  *   - audio: genuine RIFF/WAVE files (8-bit unsigned PCM) decoded with
  *     `javax.sound.sampled.AudioSystem` (a real container-header parse);
  *   - video: a length-prefixed PNG-frame container ("GFV1" — the
  *     demux-then-per-frame-decode shape every MJPEG-style pipeline has),
  *     demuxed natively and frame-decoded with ImageIO. Frame sampling
  *     decodes ONLY the sampled frames; the demuxer skips the rest by
  *     length field, never decoding them.
  *
  * Payloads are staged deterministically per doc (the fixture ships no
  * media files), so the lossless decoded values are known arithmetic both
  * engines can compute — which is what lets a SQL oracle check real codec
  * round-trips. Unknown payload formats fall back to a clearly-marked
  * byte-arithmetic branch (the escape hatch for codecs a JVM does not
  * ship, e.g. H.264 via JNI) without touching the plan.
  */
object MediaPipeline extends QueryModule {

  /** Pixel formula for staged frames: an 8×8 8-bit grayscale image whose
    * sample at (x, y) is `(seed·31 + x·7 + y·13) mod 256`. For still
    * images the seed is the doc_id; for video frame f it is
    * `doc_id·1009 + f·101`. PNG is lossless, so decode(stage(seed))
    * recovers exactly these values.
    */
  val ImgSide = 8
  def pixelValue(seed: Long, x: Int, y: Int): Int =
    ((seed * 31 + x * 7 + y * 13) % 256).toInt

  /** Frames per staged video container. Deliberately not a multiple of
    * the 8-sample grid so the frame sampler exercises non-trivial
    * `(j·NFrames)/8` arithmetic.
    */
  val NFrames = 12

  /** PCM samples per staged audio clip; sample k is
    * `(doc_id·17 + k·5) mod 256` (8-bit unsigned).
    */
  val NSamples = 256

  /** Stage the deterministic PNG payload for a frame seed (executor-side;
    * ~100 bytes each, no files touched).
    */
  def pngPayload(seed: Long): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      ImgSide, ImgSide, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < ImgSide) {
      var x = 0
      while (x < ImgSide) {
        raster.setSample(x, y, 0, pixelValue(seed, x, y)); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // explicit heap-backed image stream: ImageIO's default is a DISK
    // cache file per call, which at ~40k tiny frames per sweep turns a
    // CPU-bound codec pass into small-file I/O (measured 2×); scoping it
    // here instead of ImageIO.setUseCache(false) leaves the process-global
    // default untouched for any other ImageIO user in the JVM
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try {
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("png").next()
      try { w.setOutput(ios); w.write(img) } finally w.dispose()
    } finally ios.close()
    bos.toByteArray
  }

  /** Stage the deterministic RIFF/WAVE payload (8-bit unsigned PCM mono):
    * a REAL .wav file produced by `AudioSystem`, not raw samples.
    */
  def wavPayload(docId: Long): Array[Byte] = {
    val data = Array.tabulate(NSamples)(k => ((docId * 17 + k * 5) % 256).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 8, 1, false, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, NSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Stage the deterministic video container: magic "GFV1", int32 frame
    * count, then per frame an int32 length + a complete PNG. The same
    * demux shape as an MJPEG stream — seekable by length field without
    * decoding.
    */
  def gfvPayload(docId: Long): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(GfvMagic)
    out.writeInt(NFrames)
    var f = 0
    while (f < NFrames) {
      val png = pngPayload(frameSeed(docId, f))
      out.writeInt(png.length)
      out.write(png)
      f += 1
    }
    out.flush()
    bos.toByteArray
  }

  def frameSeed(docId: Long, frame: Int): Long = docId * 1009 + frame * 101L

  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G')
  private val RiffMagic = "RIFF".getBytes("US-ASCII")
  private val GfvMagic = "GFV1".getBytes("US-ASCII")

  private def hasMagic(payload: Array[Byte], magic: Array[Byte]): Boolean =
    payload.length > magic.length && magic.indices.forall(i => payload(i) == magic(i))

  /** Gray samples of one decoded PNG in raster order (heap-backed image
    * stream — same rationale as the encoder).
    */
  private def pngPixels(png: Array[Byte]): Array[Int] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(png))
    // no close here: ImageIO.read(ImageInputStream) closes the stream
    // itself (its documented contract); a second close throws
    val img = javax.imageio.ImageIO.read(iis)
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    Array.tabulate(w * h)(i => raster.getSample(i % w, i / w, 0))
  }

  /** Demux the GFV container: (offset, length) of each frame's PNG —
    * header arithmetic only, no frame decoded.
    */
  private def gfvIndex(payload: Array[Byte]): Array[(Int, Int)] = {
    val buf = java.nio.ByteBuffer.wrap(payload)
    buf.position(GfvMagic.length)
    val n = buf.getInt
    Array.fill(n) {
      val len = buf.getInt
      val off = buf.position()
      buf.position(off + len)
      (off, len)
    }
  }

  private def decodedSamples(payload: Array[Byte]): Array[Int] = {
    // magic sniffing is a heuristic — a RIFF payload can be WebP/AVI, a
    // truncated container can underflow — so every codec branch that
    // fails to PARSE falls through to the byte-arithmetic branch instead
    // of killing the task: the documented contract is "fallback for
    // anything we cannot decode", not "crash on anything mislabeled"
    val viaCodec: Option[Array[Int]] =
      try {
        if (hasMagic(payload, PngMagic)) Option(pngPixels(payload))
        else if (hasMagic(payload, RiffMagic)) {
          // real WAV parse: AudioSystem reads the RIFF/fmt/data chunks and
          // hands back the PCM frames (1 byte each at 8-bit mono)
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(payload))
          Some(ais.readAllBytes().map(_ & 0xff))
        } else if (hasMagic(payload, GfvMagic)) {
          // demux, then decode every frame (the features pass wants them all)
          Some(gfvIndex(payload).flatMap { case (off, len) =>
            pngPixels(java.util.Arrays.copyOfRange(payload, off, off + len))
          })
        } else None
      } catch { case _: Exception => None }
    viaCodec.getOrElse(
      // formats the JVM has no codec for, or payloads whose container
      // lied: byte arithmetic standing in for sample decoding (swap for
      // a JNI codec without touching the plan)
      payload.map(_ & 0xff))
  }

  /** Decoder: dispatches on container magic (PNG still / RIFF-WAVE audio
    * / GFV1 video), returns (sample count, modular checksum, 4 evenly-
    * spaced samples) over the DECODED samples.
    */
  def decode(payload: Array[Byte]): (Int, Long, Array[Int]) = {
    val xs = decodedSamples(payload)
    val n = xs.length
    var sum = 0L
    var i = 0
    while (i < n) { sum = (sum + xs(i)) % 1000003L; i += 1 }
    val samples = Array.tabulate(4)(k => if (n == 0) -1 else xs((k * n) / 4))
    (n, sum, samples)
  }

  /** Attach a media payload to each document (binary column + typed
    * metadata): stills carry a genuine PNG, audio rows a genuine WAV,
    * video rows a GFV1 PNG-frame container — all staged executor-side
    * from the deterministic formulas (the fixture set ships no media
    * files). The staging UDF is the one deliberate non-codegen step: it
    * plays the part of the ingest system that produced the blobs, not of
    * the query engine.
    */
  def mediaTable(s: SparkSession, dir: String): DataFrame = {
    val stage = udf((id: Long, tpe: String) => tpe match {
      case "image" => pngPayload(id)
      case "audio" => wavPayload(id)
      case _ => gfvPayload(id)
    })
    Tables.documents(s, dir)
      .select(
        col("doc_id"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END")
          .as("media_type"),
        col("n_chars"),
        col("source"))
      .withColumn("payload", stage(col("doc_id"), col("media_type")))
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
      // materialize the decoded features before the declared sort
      // (optimization r17, guide §1/§2): the range sort samples its child
      // for partition boundaries, and without the checkpoint that sampling
      // pass re-ran the ENTIRE stage + decode chain a second time;
      // size-gated (r18): decoded media is corpus-sized
      .transform(f => graft.operators.Materialize.gated(
        Tables.documents(s, dir), f, "media-feats"))
      .orderBy("doc_id")
  }

  // The oracle replays all three decode paths in SQL — every codec is
  // lossless, so the decoded samples are exactly the staging formulas:
  //   image: 64 pixels, pixel i = (doc_id·31 + (i%8)·7 + (i/8)·13) % 256,
  //     4 samples at p = 16k → (x, y) = (0, 2k);
  //   audio: 256 PCM samples, sample k = (doc_id·17 + k·5) % 256,
  //     4 samples at 64k → (doc_id·17 + 320k) % 256;
  //   video: 12 frames × 64 pixels in frame-major raster order, pixel i =
  //     ((doc_id·1009 + (i/64)·101)·31 + ((i%64)%8)·7 + ((i%64)/8)·13) % 256,
  //     4 samples at i = 192k → frame 3k, pixel (0,0).
  private val extractFeaturesSql =
    """SELECT d.doc_id,
      |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END
      |    AS media_type,
      |  CASE CAST(d.doc_id % 3 AS INT) WHEN 0 THEN 64 WHEN 1 THEN 256 ELSE 768 END AS n_samples,
      |  CASE CAST(d.doc_id % 3 AS INT)
      |  WHEN 0 THEN
      |    CAST(list_sum(list_transform(range(0, 64),
      |      i -> (d.doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256)) % 1000003 AS BIGINT)
      |  WHEN 1 THEN
      |    CAST(list_sum(list_transform(range(0, 256),
      |      k -> (d.doc_id * 17 + k * 5) % 256)) % 1000003 AS BIGINT)
      |  ELSE
      |    CAST(list_sum(list_transform(range(0, 768),
      |      i -> ((d.doc_id * 1009 + (i // 64) * 101) * 31
      |            + ((i % 64) % 8) * 7 + ((i % 64) // 8) * 13) % 256)) % 1000003 AS BIGINT)
      |  END AS checksum,
      |  CASE CAST(d.doc_id % 3 AS INT)
      |    WHEN 0 THEN CAST((d.doc_id * 31 + 13 * 0) % 256 AS INT)
      |    WHEN 1 THEN CAST((d.doc_id * 17 + 320 * 0) % 256 AS INT)
      |    ELSE CAST(((d.doc_id * 1009 + 0 * 101) * 31) % 256 AS INT) END AS sample0,
      |  CASE CAST(d.doc_id % 3 AS INT)
      |    WHEN 0 THEN CAST((d.doc_id * 31 + 13 * 2) % 256 AS INT)
      |    WHEN 1 THEN CAST((d.doc_id * 17 + 320 * 1) % 256 AS INT)
      |    ELSE CAST(((d.doc_id * 1009 + 3 * 101) * 31) % 256 AS INT) END AS sample1,
      |  CASE CAST(d.doc_id % 3 AS INT)
      |    WHEN 0 THEN CAST((d.doc_id * 31 + 13 * 4) % 256 AS INT)
      |    WHEN 1 THEN CAST((d.doc_id * 17 + 320 * 2) % 256 AS INT)
      |    ELSE CAST(((d.doc_id * 1009 + 6 * 101) * 31) % 256 AS INT) END AS sample2,
      |  CASE CAST(d.doc_id % 3 AS INT)
      |    WHEN 0 THEN CAST((d.doc_id * 31 + 13 * 6) % 256 AS INT)
      |    WHEN 1 THEN CAST((d.doc_id * 17 + 320 * 3) % 256 AS INT)
      |    ELSE CAST(((d.doc_id * 1009 + 9 * 101) * 31) % 256 AS INT) END AS sample3
      |FROM documents d
      |ORDER BY d.doc_id""".stripMargin

  /** Metadata-driven stats over the media table: the report reads ONLY
    * the typed metadata columns — column pruning must drop the blob from
    * the scan entirely (the whole point of typed metadata next to an
    * opaque payload: answer it without touching a byte of media).
    */
  /** Windowed audio energy over the WAV payloads — the frame-level audio
    * feature (VAD/loudness-style) that [[extractFeatures]]' per-doc
    * aggregates can't express: real WAV decode (javax.sound, the same
    * path as extractFeatures), samples centered at the 8-bit midpoint and
    * framed into 4×64-sample windows, energy per frame as an EXACT
    * integer Σ(s−128)², peak frame by integer argmax (first index on
    * ties), peak RMS as one IEEE-correctly-rounded sqrt. The oracle
    * replays the lossless codec's staging formula
    * (sample k = (doc_id·17 + 5k) % 256) in SQL. Scale shape: per-row
    * mapPartitions decode (embarrassingly parallel), no shuffle except
    * the declared output sort.
    */
  def audioEnergy(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val FrameLen = 64
    mediaTable(s, dir)
      .filter(col("media_type") === "audio")
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val xs = decodedSamples(rec.payload)
          val energies = xs.grouped(FrameLen).map { fr =>
            fr.foldLeft(0L) { (a, v) => val c = v - 128L; a + c * c }
          }.toArray
          val peak = energies.indices.maxBy(i => (energies(i), -i))
          AudioEnergy(rec.doc_id, energies.length, peak, energies(peak),
            energies.sum, math.sqrt(energies(peak).toDouble / FrameLen))
        }
      }
      .toDF()
      .withColumn("peak_rms", round(col("peak_rms"), 4))
      // checkpoint-before-sort: same double-decode guard as
      // extractFeatures; size-gated (r18)
      .transform(f => graft.operators.Materialize.gated(
        Tables.documents(s, dir), f, "media-audio"))
      .orderBy("doc_id")
  }

  private val audioEnergySql =
    """WITH a AS (
      |  SELECT doc_id,
      |    list_transform(range(0, 4), f -> CAST(list_sum(list_transform(
      |      range(0, 64),
      |      j -> ((doc_id * 17 + (f * 64 + j) * 5) % 256 - 128)
      |         * ((doc_id * 17 + (f * 64 + j) * 5) % 256 - 128))) AS BIGINT))
      |      AS energies
      |  FROM documents WHERE doc_id % 3 = 1)
      |SELECT doc_id, CAST(4 AS INT) AS n_frames,
      |  CAST(list_position(energies, list_max(energies)) - 1 AS INT) AS peak_frame,
      |  list_max(energies) AS peak_energy,
      |  CAST(list_sum(energies) AS BIGINT) AS total_energy,
      |  round(sqrt(CAST(list_max(energies) AS DOUBLE) / 64), 4) AS peak_rms
      |FROM a ORDER BY doc_id""".stripMargin

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
    * The metadata filter prunes to videos BEFORE the expansion (never
    * sample what you drop); the demuxer seeks by length field and
    * ImageIO-decodes ONLY the 8 sampled frames of the 12 in the
    * container; output is a typed, columnar-friendly frame table keyed
    * for a downstream frame-keyed shuffle.
    */
  def frameSamples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "video")
      .as[MediaRecord]
      .flatMap { rec =>
        val idx = gfvIndex(rec.payload)
        (0 until 8).iterator.map { j =>
          val frameNo = (j * idx.length) / 8
          val (off, len) = idx(frameNo)
          val px = pngPixels(java.util.Arrays.copyOfRange(rec.payload, off, off + len))
          var sum = 0L
          var i = 0
          while (i < px.length) { sum = (sum + px(i)) % 1000003L; i += 1 }
          FrameSample(rec.doc_id, j, frameNo, sum, px(0))
        }
      }
      .toDF()
      // checkpoint-before-sort: same double-decode guard as
      // extractFeatures; size-gated (r18)
      .transform(f => graft.operators.Materialize.gated(
        Tables.documents(s, dir), f, "media-frames"))
      .orderBy("doc_id", "frame_idx")
  }

  private val frameSamplesSql =
    """SELECT doc_id, CAST(j AS INT) AS frame_idx,
      |  CAST((j * 12) // 8 AS INT) AS frame_no,
      |  CAST(list_sum(list_transform(range(0, 64), i ->
      |    ((doc_id * 1009 + ((j * 12) // 8) * 101) * 31
      |     + (i % 8) * 7 + (i // 8) * 13) % 256)) % 1000003 AS BIGINT) AS frame_checksum,
      |  CAST(((doc_id * 1009 + ((j * 12) // 8) * 101) * 31) % 256 AS INT) AS pixel0
      |FROM documents, unnest(range(0, 8)) AS u(j)
      |WHERE doc_id % 3 = 2
      |ORDER BY doc_id, frame_idx""".stripMargin

  /** Perceptual-hash image near-dup detection: each image payload is
    * decoded (REAL PNG codec, executor-side), reduced to the 64-bit
    * average hash (bit i set iff pixel i is strictly above the image
    * mean — the integer form pixel·64 > total avoids float thresholds),
    * and near-identical pairs are found by Hamming distance ≤ 3 via
    * 16-bit banded blocking — with 4 bands the pigeonhole guarantee is
    * COMPLETE exactly up to distance 3 (a ≤ 3-distance pair must agree
    * on ≥ 1 band; at distance 4 one flipped bit per band can evade every
    * bucket, so advertising ≤ 4 would overstate recall). Candidates are
    * STAR edges to each bucket's min-id representative — the MinHash
    * family's treatment — so fan-out is LINEAR in bucket size even when
    * a duplicate cluster grows with the corpus (the clique form is
    * quadratic and dies at 100 TB). The representative's hash rides the
    * same window that picks it (first_value over the bucket), so the
    * decode scan runs ONCE and only (doc_id, h0, h1) ever shuffles —
    * 3 longs per image, never pixels or payloads.
    */
  def imagePhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hashes = mediaTable(s, dir)
      .filter(col("media_type") === "image")
      .as[MediaRecord]
      .mapPartitions { it =>
        it.map { rec =>
          val px = pngPixels(rec.payload)
          val total = px.sum
          var h0 = 0L; var h1 = 0L
          var i = 0
          while (i < 64) {
            if (px(i) * 64 > total) {
              if (i < 32) h0 |= 1L << i else h1 |= 1L << (i - 32)
            }
            i += 1
          }
          (rec.doc_id, h0, h1)
        }
      }.toDF("doc_id", "h0", "h1")
    val banded = hashes.select(col("doc_id"), col("h0"), col("h1"),
        explode(array(
          struct(lit(0).as("band"), expr("h0 % 65536").as("key")),
          struct(lit(1).as("band"), expr("h0 div 65536").as("key")),
          struct(lit(2).as("band"), expr("h1 % 65536").as("key")),
          struct(lit(3).as("band"), expr("h1 div 65536").as("key")))).as("b"))
      .select(col("doc_id"), col("h0"), col("h1"),
        col("b.band").as("band"), col("b.key").as("key"))
    val wB = org.apache.spark.sql.expressions.Window.partitionBy("band", "key")
      .orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    banded
      .withColumn("rep", first("doc_id").over(wB))
      .withColumn("h0a", first("h0").over(wB))
      .withColumn("h1a", first("h1").over(wB))
      .filter(col("doc_id") =!= col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"),
        col("h0a"), col("h1a"), col("h0").as("h0b"), col("h1").as("h1b"))
      .distinct()
      .withColumn("hamming",
        expr("CAST(bit_count(h0a ^ h0b) + bit_count(h1a ^ h1b) AS INT)"))
      .filter(col("hamming") <= 3)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // the oracle replays the decode from the (lossless) staging formula,
  // then runs the identical integer hash/band/Hamming pipeline
  private val imagePhashSql =
    """WITH px AS (
      |  SELECT doc_id, list_transform(range(0, 64),
      |    i -> (doc_id * 31 + (i % 8) * 7 + (i // 8) * 13) % 256) AS p
      |  FROM documents WHERE doc_id % 3 = 0
      |), tot AS (
      |  SELECT doc_id, p, list_sum(p) AS s FROM px
      |), hs AS (
      |  SELECT doc_id,
      |    CAST(list_sum(list_transform(range(0, 32),
      |      i -> CASE WHEN p[i + 1] * 64 > s THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS h0,
      |    CAST(list_sum(list_transform(range(0, 32),
      |      i -> CASE WHEN p[i + 33] * 64 > s THEN (CAST(1 AS BIGINT) << i) ELSE 0 END)) AS BIGINT) AS h1
      |  FROM tot
      |), banded AS (
      |  SELECT doc_id, h0, h1, b.band,
      |    CASE b.band WHEN 0 THEN h0 % 65536 WHEN 1 THEN h0 // 65536
      |                WHEN 2 THEN h1 % 65536 ELSE h1 // 65536 END AS key
      |  FROM hs, (SELECT unnest(range(0, 4)) AS band) b
      |), star AS (
      |  SELECT DISTINCT rep AS doc_a, doc_id AS doc_b,
      |    h0a, h1a, h0 AS h0b, h1 AS h1b FROM (
      |    SELECT doc_id, h0, h1,
      |      first_value(doc_id) OVER w AS rep,
      |      first_value(h0) OVER w AS h0a,
      |      first_value(h1) OVER w AS h1a
      |    FROM banded
      |    WINDOW w AS (PARTITION BY band, key ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |  WHERE doc_id <> rep)
      |SELECT doc_a, doc_b,
      |  CAST(bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) AS INT) AS hamming
      |FROM star
      |WHERE bit_count(xor(h0a, h0b)) + bit_count(xor(h1a, h1b)) <= 3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Training-shard packing plan (the WebDataset/tar-shard step of every
    * multimodal pipeline): media records are packed in doc-id order into
    * ~8 KB shards by a DISTRIBUTED prefix sum — per-bucket exclusive
    * cumsum (window partitioned by `doc_id div 256`) plus a broadcast
    * running offset over the 1-row-per-bucket totals frame. The only
    * global window runs over bucket totals, never over records, so the
    * plan survives a corpus that no longer fits one partition's sort; the
    * shard assignment `prefix div target` is exact integer arithmetic.
    */
  def shardPlan(s: SparkSession, dir: String): DataFrame = {
    val target = 8192L
    val sized = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars").as("bytes"),
        expr("doc_id div 256").as("bucket"))
    val wIn = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wOff = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sized.groupBy("bucket").agg(sum("bytes").as("btot"))
      .withColumn("b_off", coalesce(sum("btot").over(wOff), lit(0L)))
      .select("bucket", "b_off")
    sized
      .withColumn("in_off", coalesce(sum("bytes").over(wIn), lit(0L)))
      .join(broadcast(offsets), "bucket")
      .withColumn("shard", expr(s"(b_off + in_off) div $target"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_items"), sum("bytes").as("shard_bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
      .orderBy("shard")
  }

  private val shardPlanSql =
    """WITH sized AS (
      |  SELECT doc_id, n_chars AS bytes, doc_id // 256 AS bucket
      |  FROM documents),
      |offs AS (
      |  SELECT bucket,
      |    coalesce(sum(btot) OVER (ORDER BY bucket
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS b_off
      |  FROM (SELECT bucket, sum(bytes) AS btot FROM sized GROUP BY 1) t),
      |pref AS (
      |  SELECT doc_id, bytes,
      |    (b_off + coalesce(sum(bytes) OVER (PARTITION BY sized.bucket
      |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
      |      0)) // 8192 AS shard
      |  FROM sized JOIN offs ON sized.bucket = offs.bucket)
      |SELECT CAST(shard AS BIGINT) AS shard,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(bytes) AS BIGINT) AS shard_bytes,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM pref GROUP BY 1 ORDER BY 1""".stripMargin

  /** Corpus-wide amplitude histogram over the decoded audio samples: 16
    * equal byte-value buckets (sample DIV 16) — the distribution check an
    * audio-curation pass runs before normalization/clipping decisions
    * (all-quiet or clipped shards show up as mass piled in the end
    * buckets). Real WAV decode per row in mapPartitions (embarrassingly
    * parallel); each task emits 16 partial counts so the only shuffle is
    * a 16-key merge — the histogram analogue of a map-side combine. The
    * oracle replays the lossless staging formula
    * (sample k = (doc_id·17 + 5k) % 256) in SQL.
    */
  def byteHistogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("media_type") === "audio")
      .as[MediaRecord]
      .mapPartitions { it =>
        val counts = new Array[Long](16)
        it.foreach { rec =>
          decodedSamples(rec.payload).foreach(v => counts(v / 16) += 1)
        }
        counts.indices.iterator.map(b => (b, counts(b)))
      }
      .toDF("bucket", "c")
      .groupBy("bucket").agg(sum("c").as("n_samples"))
      .filter(col("n_samples") > 0)
      .orderBy("bucket")
  }

  private val byteHistogramSql =
    """SELECT CAST(((doc_id * 17 + k * 5) % 256) // 16 AS INT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_samples
      |FROM (SELECT doc_id, unnest(range(0, 256)) AS k
      |      FROM documents WHERE doc_id % 3 = 1)
      |GROUP BY 1 HAVING count(*) > 0 ORDER BY 1""".stripMargin

  def defs: Seq[QueryDef] = Seq(
    QueryDef("multimodal_byte_histogram", byteHistogram, Some(byteHistogramSql)),
    QueryDef("multimodal_audio_energy", audioEnergy, Some(audioEnergySql)),
    QueryDef("multimodal_shard_plan", shardPlan, Some(shardPlanSql)),
    QueryDef("multimodal_features", extractFeatures, Some(extractFeaturesSql)),
    QueryDef("multimodal_media_stats", mediaStats, Some(mediaStatsSql)),
    QueryDef("multimodal_frame_sample", frameSamples, Some(frameSamplesSql)),
    QueryDef("multimodal_image_phash", imagePhash, Some(imagePhashSql))
  )
}
