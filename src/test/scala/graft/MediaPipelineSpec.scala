package graft

import graft.multimodal.MediaPipeline

/** The multimodal decode contract: the image branch is a REAL codec path
  * (ImageIO PNG decode of staged deterministic images), the audio/video
  * branch is the documented stub, and the metadata stats query must never
  * read a blob byte.
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

  test("non-png payloads take the stub branch") {
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
    // neither the text column (payload input) nor any binary column may
    // survive pruning — the stats come from typed metadata alone
    assert(!readSchema.contains("text"), readSchema)
    assert(readSchema.contains("n_chars"), readSchema)
  }
}
