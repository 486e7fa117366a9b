package graft

import graft.multimodal.MediaPipeline

/** The multimodal decode contract: all three modalities are REAL codec
  * round-trips on JVM-shipped codecs — PNG stills via ImageIO, RIFF/WAVE
  * audio via AudioSystem, and a length-prefixed PNG-frame video container
  * demuxed + frame-decoded via ImageIO. Unknown formats take the
  * documented byte-arithmetic fallback, and the metadata stats query must
  * never read a blob byte.
  */
class MediaPipelineSpec extends SparkSuite {

  test("png round-trip: decode recovers the staged pixels bit-exactly") {
    for (id <- Seq(0L, 3L, 42L, 999L, 123456L)) {
      val payload = MediaPipeline.pngPayload(id)
      // a real PNG file, not text bytes
      assert(payload.take(4).sameElements(
        Array[Byte](0x89.toByte, 'P', 'N', 'G')), s"doc $id: not a PNG")
      val (n, sum, samples) = MediaPipeline.decode(payload)
      assert(n == 64, s"doc $id: pixel count $n")
      val expectedSum = (0 until 64)
        .map(i => MediaPipeline.pixelValue(id, i % 8, i / 8).toLong)
        .sum % 1000003L
      assert(sum == expectedSum, s"doc $id: checksum $sum != $expectedSum")
      for (k <- 0 until 4) {
        val p = k * 16
        assert(samples(k) == MediaPipeline.pixelValue(id, p % 8, p / 8),
          s"doc $id sample $k")
      }
    }
  }

  test("wav round-trip: AudioSystem decode recovers the staged PCM samples") {
    for (id <- Seq(1L, 4L, 97L, 1000L)) {
      val payload = MediaPipeline.wavPayload(id)
      // a real RIFF/WAVE file with a parseable header
      assert(payload.take(4).sameElements("RIFF".getBytes("US-ASCII")), s"doc $id: not RIFF")
      assert(payload.slice(8, 12).sameElements("WAVE".getBytes("US-ASCII")), s"doc $id: not WAVE")
      val (n, sum, samples) = MediaPipeline.decode(payload)
      assert(n == MediaPipeline.NSamples, s"doc $id: sample count $n")
      val want = (0 until MediaPipeline.NSamples).map(k => (id * 17 + k * 5) % 256)
      assert(sum == want.sum % 1000003L, s"doc $id: checksum")
      for (k <- 0 until 4)
        assert(samples(k) == want((k * MediaPipeline.NSamples) / 4).toInt, s"doc $id sample $k")
    }
  }

  test("video round-trip: demux + per-frame decode recovers the staged frames") {
    for (id <- Seq(2L, 5L, 44L, 2026L)) {
      val payload = MediaPipeline.gfvPayload(id)
      assert(payload.take(4).sameElements("GFV1".getBytes("US-ASCII")), s"doc $id: not GFV1")
      val (n, sum, samples) = MediaPipeline.decode(payload)
      assert(n == MediaPipeline.NFrames * 64, s"doc $id: pixel count $n")
      val allPixels = (0 until MediaPipeline.NFrames).flatMap { f =>
        val seed = MediaPipeline.frameSeed(id, f)
        (0 until 64).map(i => MediaPipeline.pixelValue(seed, i % 8, i / 8).toLong)
      }
      assert(sum == allPixels.sum % 1000003L, s"doc $id: checksum")
      // samples land on frame boundaries: pixel (0,0) of frames 0,3,6,9
      for (k <- 0 until 4)
        assert(samples(k) == MediaPipeline.pixelValue(MediaPipeline.frameSeed(id, 3 * k), 0, 0),
          s"doc $id sample $k")
    }
  }

  test("unknown payload formats take the documented fallback branch") {
    val payload = "hello multimodal".getBytes("UTF-8")
    val (n, sum, samples) = MediaPipeline.decode(payload)
    assert(n == payload.length)
    assert(sum == payload.map(_ & 0xff).map(_.toLong).sum % 1000003L)
    assert(samples(0) == (payload(0) & 0xff))
  }

  test("media stats prunes the blob: scan reads metadata columns only") {
    val df = SparkEntry.queries("multimodal_media_stats")(spark, Sf)
    val p = df.queryExecution.executedPlan.toString
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    // neither the text column nor any binary column may survive pruning —
    // the stats come from typed metadata alone
    assert(!readSchema.contains("text"), readSchema)
    assert(readSchema.contains("n_chars"), readSchema)
  }
}
