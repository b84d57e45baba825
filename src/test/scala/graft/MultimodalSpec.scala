package graft

import graft.operators.Multimodal

import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (header decode is REAL —
  * PNG/JPEG/GIF/BMP magic bytes; pixel-level steps are documented
  * stubs; the schema/batching/null-handling is under test too). */
class MultimodalSpec extends GraftSpec {

  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdef".getBytes("UTF-8")),
    (2L, Array.fill[Byte](2048)(7)),
    (3L, null.asInstanceOf[Array[Byte]]),
    (4L, Array.emptyByteArray)
  ).toDF("media_id", "payload")

  // ── real header parsing ──

  /** Minimal valid PNG prefix: signature + IHDR with the given dims. */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(29)
    bb.put(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    bb.putInt(13).put("IHDR".getBytes("US-ASCII"))
    bb.putInt(w).putInt(h)
    bb.put(Array[Byte](8, 6, 0, 0, 0))
    bb.array()
  }

  /** Minimal JPEG: SOI, an APP0 segment to skip, then SOF0. */
  private def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 4 + 2 + 2 + 2 + 1 + 2 + 2)
    bb.put(Array(0xFF, 0xD8).map(_.toByte))            // SOI
    bb.put(Array(0xFF, 0xE0).map(_.toByte)).putShort(4) // APP0 len 4
      .putShort(0)                                      // APP0 payload
    bb.put(Array(0xFF, 0xC0).map(_.toByte)).putShort(9) // SOF0
    bb.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    bb.array()
  }

  private def gifBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes("US-ASCII"))
    bb.putShort(w.toShort).putShort(h.toShort)
    bb.put(Array[Byte](0, 0, 0))
    bb.array()
  }

  private def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(26)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("BM".getBytes("US-ASCII")).putInt(26).putInt(0).putInt(26)
    bb.putInt(40).putInt(w).putInt(-h) // negative height = top-down
    bb.array()
  }

  test("parseImageHeader reads real PNG/JPEG/GIF/BMP dimensions") {
    assert(Multimodal.parseImageHeader(pngBytes(640, 480))
      .contains((640, 480, "png")))
    assert(Multimodal.parseImageHeader(jpegBytes(1920, 1080))
      .contains((1920, 1080, "jpeg")))
    assert(Multimodal.parseImageHeader(gifBytes(320, 200))
      .contains((320, 200, "gif")))
    assert(Multimodal.parseImageHeader(bmpBytes(800, 600))
      .contains((800, 600, "bmp")))
    // corrupt/non-image payloads parse to None, never throw
    assert(Multimodal.parseImageHeader("not an image".getBytes).isEmpty)
    assert(Multimodal.parseImageHeader(Array.emptyByteArray).isEmpty)
    assert(Multimodal.parseImageHeader(pngBytes(1, 1).take(20)).isEmpty)
    assert(Multimodal.parseImageHeader(
      Array(0xFF, 0xD8, 0xFF, 0xC0, 0x00).map(_.toByte)).isEmpty) // truncated SOF
  }

  test("withMediaMeta default decoder reads real dimensions from PNG bytes") {
    val imgs = Seq(
      (1L, pngBytes(123, 45)),
      (2L, jpegBytes(77, 88)),
      (3L, "plain text".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val out = Multimodal.withMediaMeta(imgs, "payload")
      .select(col("media_id"), col("media.width").as("w"),
        col("media.height").as("h"), col("media.format").as("fmt"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), r.getString(3))).toMap
    assert(out(1L) == ((Some(123), Some(45), "png")))
    assert(out(2L) == ((Some(77), Some(88), "jpeg")))
    assert(out(3L) == ((None, None, "unknown"))) // nulls, not a crash
  }

  // ── stub double + plumbing ──

  test("withMediaMeta appends a typed metadata struct per row") {
    val out = Multimodal.withMediaMeta(media, "payload",
      decoder = Multimodal.decodeMetaStub)
    assert(out.schema("media").dataType == Multimodal.mediaMetaType)
    val byId = out.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val m1 = byId(1L).getAs[org.apache.spark.sql.Row]("media")
    assert(m1.getAs[Long]("byte_len") == 6L)
    assert(m1.getAs[Int]("width") == 7)   // 1 + 6 % 1024
    assert(m1.getAs[String]("format") == "png")
    val m2 = byId(2L).getAs[org.apache.spark.sql.Row]("media")
    assert(m2.getAs[Long]("byte_len") == 2048L)
    assert(m2.getAs[Int]("width") == 1 + 2048 % 1024)
    assert(byId(3L).getAs[org.apache.spark.sql.Row]("media") == null) // null-safe
    assert(byId(4L).getAs[org.apache.spark.sql.Row]("media").getAs[Long]("byte_len") == 0L)
  }

  test("batching covers partitions larger than one batch") {
    val big = spark.range(500)
      .select(col("id").as("media_id"),
        encode(concat(lit("payload-"), col("id")), "UTF-8").as("payload"))
      .repartition(2)
    val out = Multimodal.withMediaMeta(big, "payload", batchSize = 64)
    assert(out.count() == 500)
    assert(out.filter(col("media.byte_len") <= 0).count() == 0)
  }

  // ── real WAV decode ──

  /** Minimal valid PCM WAV: mono 16-bit, given rate, given samples. */
  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1)          // PCM, 1 channel
    bb.putInt(rate).putInt(rate * 2)    // sample rate, byte rate
    bb.putShort(2).putShort(16)         // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("decodeAudioMeta: header fields, rms/zcr from real PCM frames") {
    val samples = Array[Short](100, -100, 200, -200, 0, 300)
    val res = Multimodal.decodeAudioMeta(wavBytes(8000, samples))
    assert(res(1) == 1)      // channels
    assert(res(2) == 8000)   // sample_rate
    assert(res(3) == 16)     // bits
    assert(res(4) == 6L)     // n_samples
    val sumSq = samples.map(s => s.toLong * s).sum
    assert(res(6) == math.sqrt(sumSq.toDouble / 6))
    assert(res(7) == 4L)     // sign changes: +→-→+→-→+(0 counts as >=0)
  }

  test("decodeAudioMeta elements carry the EXACT JVM classes the Row encoder needs") {
    // Pin classes, not values: Seq(1L, 2, 3.0) numeric-widens to
    // Seq[Double] and 1.0 == 1 in Scala, so a value-only assertion
    // passes while the encoder throws INVALID_EXTERNAL_TYPE at runtime.
    val res = Multimodal.decodeAudioMeta(wavBytes(8000, Array[Short](1, -1)))
    assert(res(0).getClass == classOf[java.lang.Long],    "byte_len")
    assert(res(1).getClass == classOf[java.lang.Integer], "channels")
    assert(res(2).getClass == classOf[java.lang.Integer], "sample_rate")
    assert(res(3).getClass == classOf[java.lang.Integer], "bits")
    assert(res(4).getClass == classOf[java.lang.Long],    "n_samples")
    assert(res(5).getClass == classOf[java.lang.Long],    "duration_ms")
    assert(res(6).getClass == classOf[java.lang.Double],  "rms")
    assert(res(7).getClass == classOf[java.lang.Long],    "zcr")
  }

  test("withAudioMeta survives the Row encoder end-to-end (the widening trap)") {
    val df = Seq(
      (1L, wavBytes(16000, Array[Short](5, -5, 5, -5))),
      (2L, "not audio".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.withAudioMeta(df, "payload")
      .select(col("media_id"), col("audio.channels").as("ch"),
        col("audio.sample_rate").as("rate"), col("audio.n_samples").as("n"),
        col("audio.zcr").as("zcr"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("ch") == 1)
    assert(out(1L).getAs[Int]("rate") == 16000)
    assert(out(1L).getAs[Long]("n") == 4L)
    assert(out(1L).getAs[Long]("zcr") == 3L)
    assert(out(2L).get(1) == null) // non-WAV: null fields, no crash
    assert(out(3L).get(1) == null)
  }

  test("parseWavHeader rejects crafted chunk lengths without overflow") {
    val b = wavBytes(8000, Array[Short](1, 2))
    // corrupt the fmt chunk length to Int.MaxValue - 4: an Int bounds
    // check (i + 8 + len) would overflow negative and pass
    val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(16, Int.MaxValue - 4)
    assert(Multimodal.parseWavHeader(b).isEmpty) // no throw, no wrap-around
    assert(Multimodal.decodeAudioMeta(b)(1) == null)
  }

  test("frameSampleStub takes every stride-th 256-byte window") {
    val bytes = Array.tabulate[Byte](1024)(i => (i % 127).toByte)
    val frames = Multimodal.frameSampleStub(bytes, stride = 2)
    assert(frames.length == 2) // windows 0 and 2 of 4
    assert(frames.head.length == 256)
    assert(frames.head.sameElements(bytes.slice(0, 256)))
    assert(frames(1).sameElements(bytes.slice(512, 768)))
  }

  test("resized replaces payload with a deterministic stub transform") {
    val out = Multimodal.resized(media.filter(col("media_id") === 2L),
      "payload", w = 64, h = 64)
    val bytes = out.collect().head.getAs[Array[Byte]]("resized")
    assert(bytes.length == 64 * 64 / 64)
  }
}
