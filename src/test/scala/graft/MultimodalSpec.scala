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

  // ── real BMP pixel decode ──

  /** Well-formed 24-bpp BMP. `px` is row-major TOP-DOWN (r,g,b);
    * storage follows `topDown` (bottom-up rows unless negative height),
    * with spec-correct 4-byte row padding. */
  private def bmp24(w: Int, h: Int, topDown: Boolean,
                    px: Seq[(Int, Int, Int)]): Array[Byte] = {
    val rowBytes = (w * 3 + 3) & ~3
    val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
      .putInt(0).putInt(0).putInt(0).putInt(0)
    for (sy <- 0 until h; x <- 0 until w) {
      val y = if (topDown) sy else h - 1 - sy // storage row sy = image row y
      val (r, g, b) = px(y * w + x)
      bb.position(54 + sy * rowBytes + 3 * x)
      bb.put(b.toByte).put(g.toByte).put(r.toByte)
    }
    bb.array()
  }

  test("decodeBmpPixels: bottom-up and top-down storage yield the same top-down pixels") {
    // 2×2, all-distinct pixels; width 2 forces 2 pad bytes per row
    val px = Seq((10, 20, 30), (40, 50, 60), (70, 80, 90), (100, 110, 120))
    for (topDown <- Seq(false, true)) {
      val Some((w, h, out)) = Multimodal.decodeBmpPixels(bmp24(2, 2, topDown, px))
      assert((w, h) == ((2, 2)))
      val got = out.grouped(3).map(t =>
        ((t(2) & 0xFF), (t(1) & 0xFF), (t(0) & 0xFF))).toSeq // BGR → (r,g,b)
      assert(got == px, s"topDown=$topDown")
    }
  }

  test("decodeBmpPixels rejects everything that is not clean 24-bpp BI_RGB") {
    val good = bmp24(2, 2, topDown = false, Seq.fill(4)((1, 2, 3)))
    assert(Multimodal.decodeBmpPixels(good).isDefined)
    def mut(off: Int, v: Int): Array[Byte] = {
      val c = good.clone()
      java.nio.ByteBuffer.wrap(c).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(off, v)
      c
    }
    assert(Multimodal.decodeBmpPixels(mut(30, 1)).isEmpty)   // RLE compression
    assert(Multimodal.decodeBmpPixels(mut(18, 0)).isEmpty)   // zero width
    assert(Multimodal.decodeBmpPixels(mut(18, 1 << 20)).isEmpty) // dims beyond cap
    assert(Multimodal.decodeBmpPixels(mut(10, good.length)).isEmpty) // offset past end
    assert(Multimodal.decodeBmpPixels(good.take(53)).isEmpty) // truncated
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Multimodal.decodeBmpPixels(bpp8).isEmpty)          // palette depth
  }

  test("pixelStats: exact channel means + integer-luma bright count, boxed classes") {
    // two bright pixels (white-ish), two dark
    val px = Seq((255, 255, 255), (200, 200, 200), (10, 20, 30), (0, 0, 0))
    val res = Multimodal.pixelStats(bmp24(2, 2, topDown = false, px))
    assert(res(0) == 2 && res(1) == 2)
    assert(res(2) == (255 + 200 + 10 + 0).toDouble / 4)  // mean_r
    assert(res(3) == (255 + 200 + 20 + 0).toDouble / 4)  // mean_g
    assert(res(4) == (255 + 200 + 30 + 0).toDouble / 4)  // mean_b
    assert(res(5) == 2L)                                  // n_bright
    assert(res(0).getClass == classOf[java.lang.Integer])
    assert(res(2).getClass == classOf[java.lang.Double])
    assert(res(5).getClass == classOf[java.lang.Long])
    // undecodable payloads: all-null fields, never a throw
    assert(Multimodal.pixelStats("nope".getBytes).forall(_ == null))
  }

  test("resizeNearest 4×4 → 2×2 keeps the nearest-neighbor source pixels") {
    val px = (0 until 16).map(i => (i * 10, i * 10 + 1, i * 10 + 2))
    val resized = Multimodal.resizeNearest(
      bmp24(4, 4, topDown = false, px), 2, 2).get
    val Some((w, h, out)) = Multimodal.decodeBmpPixels(resized)
    assert((w, h) == ((2, 2)))
    val got = out.grouped(3).map(t =>
      ((t(2) & 0xFF), (t(1) & 0xFF), (t(0) & 0xFF))).toSeq
    // dst (x,y) ← src (x·4/2, y·4/2): pixels 0, 2, 8, 10
    assert(got == Seq(px(0), px(2), px(8), px(10)))
    // non-image falls back to None (resized() then uses the stub)
    assert(Multimodal.resizeNearest("nope".getBytes, 2, 2).isEmpty)
  }

  test("resizeNearest also consumes PNG/GIF input via the unified decode") {
    // 4×4 PNG checkerboard downsampled to 2×2 picks pixels 0, 2, 8, 10
    val rows = (0 until 4).map(y => (0 until 12).map(x => (y * 40 + (x / 3) * 10)))
    val png = pngEncode(4, 4, 2, rows, Seq(0, 0, 0, 0))
    val resized = Multimodal.resizeNearest(png, 2, 2).get
    val Some((w, h, out)) = Multimodal.decodeBmpPixels(resized)
    assert((w, h) == ((2, 2)))
    // source pixel (x,y) has all channels = y·40 + x·10
    val exp = Seq(0, 20, 80, 100)
    assert(out.grouped(3).map(_(0) & 0xFF).toSeq == exp)
  }

  test("lumaHistogram: all-white mass lands in the last bin, L2-normalized") {
    val white = bmp24(2, 2, topDown = false, Seq.fill(4)((255, 255, 255)))
    val hist = Multimodal.lumaHistogram(white, dim = 16).get
    assert(hist(15) == 1f && hist.take(15).forall(_ == 0f))
    val black = bmp24(2, 2, topDown = false, Seq.fill(4)((0, 0, 0)))
    val hb = Multimodal.lumaHistogram(black, dim = 16).get
    assert(hb(0) == 1f)
    assert(Multimodal.lumaHistogram("nope".getBytes).isEmpty)
  }

  test("resizeNearest: targets past the 64 MB pixel cap yield None, not overflow") {
    val good = bmp24(2, 2, topDown = false, Seq.fill(4)((1, 2, 3)))
    // 46341² ≈ Int.MaxValue/3: (dstW*3+3) and 54+rowBytes*dstH would both
    // wrap Int without the guard
    assert(Multimodal.resizeNearest(good, 46341, 46341).isEmpty)
    assert(Multimodal.resizeNearest(good, 1 << 16, 1 << 16).isEmpty)
    intercept[IllegalArgumentException](Multimodal.resizeNearest(good, 0, 4))
  }

  // ── real PNG pixel decode ──

  /** PNG chunk with a REAL CRC32 (the decoder deliberately ignores
    * CRCs, but well-formed fixtures keep the tests honest). */
  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val tb = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(tb); crc.update(data)
    java.nio.ByteBuffer.allocate(12 + data.length)
      .putInt(data.length).put(tb).put(data).putInt(crc.getValue.toInt)
      .array()
  }

  /** Real PNG encoder for fixtures: forward-applies the requested
    * per-row scanline filter (independent implementation of the filter
    * math the decoder must invert) and compresses with the stdlib
    * Deflater — a genuine zlib stream, not a stored block. `px` is h
    * rows of w*bpp channel values, top-down. */
  private def pngEncode(w: Int, h: Int, colorType: Int,
                        px: Seq[Seq[Int]], filters: Seq[Int],
                        palette: Array[Byte] = null,
                        interlaced: Boolean = false,
                        bitDepth: Int = 8): Array[Byte] = {
    // px rows carry w*bpp BYTE values (depth 16: big-endian byte pairs)
    val bpp = (colorType match {
      case 2 => 3; case 6 => 4; case 4 => 2; case _ => 1
    }) * (bitDepth / 8)
    def filterRows(rows: Seq[Seq[Int]], filts: Seq[Int]): Array[Byte] = {
      val strideP = rows.head.length
      val out = new Array[Byte]((strideP + 1) * rows.length)
      for (y <- rows.indices) {
        out(y * (strideP + 1)) = filts(y).toByte
        for (x <- 0 until strideP) {
          val left = if (x >= bpp) rows(y)(x - bpp) else 0
          val up = if (y > 0) rows(y - 1)(x) else 0
          val ul = if (x >= bpp && y > 0) rows(y - 1)(x - bpp) else 0
          val pred = filts(y) match {
            case 0 => 0
            case 1 => left
            case 2 => up
            case 3 => (left + up) >> 1
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            case _ => 0 // out-of-spec filter id: raw, for corrupt fixtures
          }
          out(y * (strideP + 1) + 1 + x) = ((rows(y)(x) - pred) & 0xFF).toByte
        }
      }
      out
    }
    val raw: Array[Byte] =
      if (!interlaced) filterRows(px, filters)
      else { // Adam7: each non-empty pass filtered as its own sub-image
        val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8),
          (2, 0, 4, 4), (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
        passes.flatMap { case (x0, y0, dx, dy) =>
          val ys = y0 until h by dy
          val xs = x0 until w by dx
          if (ys.isEmpty || xs.isEmpty) Seq.empty[Byte]
          else filterRows(
            ys.map(y => xs.flatMap(x => (0 until bpp).map(c => px(y)(x * bpp + c)))),
            ys.indices.map(i => filters(i % filters.length))).toSeq
        }.toArray
      }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](256)
    while (!defl.finished()) zout.write(buf, 0, defl.deflate(buf))
    defl.end()
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte)
      .put((if (interlaced) 1 else 0).toByte).array()
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A) ++
      pngChunk("IHDR", ihdr) ++
      (if (palette != null) pngChunk("PLTE", palette)
       else Array.emptyByteArray) ++
      pngChunk("IDAT", zout.toByteArray) ++
      pngChunk("IEND", Array.emptyByteArray)
  }

  test("decodePngPixels: Adam7 interlace reassembles display positions per pass") {
    // 9×9 RGB exercises all seven passes with non-trivial dimensions;
    // each pass filters against its OWN rows (mixed filter types), so
    // both the per-pass filter references and the scatter are
    // load-bearing for every pixel
    val px = (0 until 9).map(y => (0 until 27).map(x => (y * 61 + x * 23) % 256))
    val bytes = pngEncode(9, 9, colorType = 2, px,
      filters = Seq(0, 1, 2, 3, 4), interlaced = true)
    val Some((w, h, out)) = Multimodal.decodePngPixels(bytes)
    assert((w, h) == ((9, 9)))
    for (y <- 0 until 9; x <- 0 until 27)
      assert((out(y * 27 + x) & 0xFF) == px(y)(x), s"channel byte ($x,$y)")
    // grayscale + interlace: bpp=1 pass filtering
    val g = (0 until 8).map(y => (0 until 8).map(x => (y * 37 + x * 11) % 256))
    val gb = pngEncode(8, 8, colorType = 0, g,
      filters = Seq(4, 3, 2, 1, 0), interlaced = true)
    val Some((_, _, go)) = Multimodal.decodePngPixels(gb)
    for (y <- 0 until 8; x <- 0 until 8)
      assert((go(3 * (y * 8 + x)) & 0xFF) == g(y)(x), s"gray ($x,$y)")
  }

  test("decodePngPixels: 16-bit samples reduce to the high byte, filters at 2x bpp") {
    // 16-bit grayscale 4×3: sample k = (hi(k), lo(k)); the decoder must
    // invert the filters over BYTE pairs (bpp=2) and keep the high byte
    def hi(y: Int, x: Int) = (y * 73 + x * 31) % 256
    def lo(y: Int, x: Int) = (y * 11 + x * 57) % 256
    val g16 = (0 until 3).map(y =>
      (0 until 4).flatMap(x => Seq(hi(y, x), lo(y, x))))
    val gb = pngEncode(4, 3, colorType = 0, g16,
      filters = Seq(0, 1, 4), bitDepth = 16)
    val Some((w, h, out)) = Multimodal.decodePngPixels(gb)
    assert((w, h) == ((4, 3)))
    for (y <- 0 until 3; x <- 0 until 4) {
      val o = 3 * (y * 4 + x)
      assert((out(o) & 0xFF) == hi(y, x) && out(o) == out(o + 1) &&
        out(o + 1) == out(o + 2), s"16-bit gray ($x,$y)")
    }
    // 16-bit RGB 3×2: channel high bytes survive, low bytes drop
    val rgb16 = (0 until 2).map(y =>
      (0 until 9).flatMap(c => Seq((y * 41 + c * 19) % 256, (c * 7) % 256)))
    val Some((_, _, o2)) = Multimodal.decodePngPixels(
      pngEncode(3, 2, colorType = 2, rgb16, filters = Seq(2, 3), bitDepth = 16))
    for (y <- 0 until 2; c <- 0 until 9)
      assert((o2(y * 9 + c) & 0xFF) == (y * 41 + c * 19) % 256, s"rgb16 ($c,$y)")
    // gray+alpha (type 4, 8-bit): gray replicates, alpha drops
    val ga = (0 until 2).map(y => (0 until 6).map(i =>
      if (i % 2 == 0) (y * 50 + i * 13) % 256 else 200))
    val Some((_, _, o3)) = Multimodal.decodePngPixels(
      pngEncode(3, 2, colorType = 4, ga, filters = Seq(0, 1)))
    for (y <- 0 until 2; x <- 0 until 3) {
      val o = 3 * (y * 3 + x)
      assert((o3(o) & 0xFF) == (y * 50 + x * 2 * 13) % 256, s"gray+alpha ($x,$y)")
    }
    // 16-bit palette is out of spec
    val pal = Array.fill[Byte](768)(1)
    assert(Multimodal.decodePngPixels(pngEncode(3, 2, 3,
      (0 until 2).map(_ => (0 until 6).map(_ % 256)), Seq(0, 0),
      palette = pal, bitDepth = 16)).isEmpty)
  }

  test("decodePngPixels: 8-bit grayscale replicates and filters at bpp=1") {
    val px = (0 until 5).map(y => (0 until 4).map(x => (y * 71 + x * 37) % 256))
    val bytes = pngEncode(4, 5, colorType = 0, px, filters = Seq(0, 1, 2, 3, 4))
    val Some((w, h, out)) = Multimodal.decodePngPixels(bytes)
    assert((w, h) == ((4, 5)))
    for (y <- 0 until 5; x <- 0 until 4) {
      val o = 3 * (y * 4 + x)
      assert((out(o) & 0xFF) == px(y)(x) && out(o) == out(o + 1) &&
        out(o + 1) == out(o + 2), s"gray pixel ($x,$y)")
    }
  }

  test("decodePngPixels: palette color type maps indices through PLTE") {
    val pal = new Array[Byte](768)
    for (c <- 0 until 256) {
      pal(3 * c) = c.toByte; pal(3 * c + 1) = (255 - c).toByte
      pal(3 * c + 2) = (c ^ 0x5A).toByte
    }
    val px = (0 until 4).map(y => (0 until 4).map(x => (y * 67 + x * 41) % 256))
    val bytes = pngEncode(4, 4, colorType = 3, px,
      filters = Seq(0, 1, 2, 4), palette = pal)
    val Some((w, h, out)) = Multimodal.decodePngPixels(bytes)
    assert((w, h) == ((4, 4)))
    for (y <- 0 until 4; x <- 0 until 4) {
      val idx = px(y)(x); val o = 3 * (y * 4 + x)
      assert((out(o) & 0xFF) == idx && (out(o + 1) & 0xFF) == (255 - idx) &&
        (out(o + 2) & 0xFF) == (idx ^ 0x5A), s"palette pixel ($x,$y)")
    }
    // a palette image without PLTE, and a short palette with an
    // out-of-range index, decode to None
    assert(Multimodal.decodePngPixels(
      pngEncode(4, 4, 3, px, Seq(0, 0, 0, 0))).isEmpty)
    assert(Multimodal.decodePngPixels(pngEncode(4, 4, 3, px, Seq(0, 0, 0, 0),
      palette = Array[Byte](1, 2, 3))).isEmpty)
  }

  test("decodePngPixels inverts all five scanline filters on a real zlib stream") {
    // 4×5 RGB, one row per filter type; value pattern exercises carries
    val px = (0 until 5).map(y => (0 until 12).map(x => (y * 53 + x * 29) % 256))
    val bytes = pngEncode(4, 5, colorType = 2, px, filters = Seq(0, 1, 2, 3, 4))
    val Some((w, h, out)) = Multimodal.decodePngPixels(bytes)
    assert((w, h) == ((4, 5)))
    assert(out.map(_ & 0xFF).toSeq == px.flatten)
    // header parse agrees (q_media_headers path unaffected by pixels)
    assert(Multimodal.parseImageHeader(bytes).contains((4, 5, "png")))
  }

  test("decodePngPixels drops alpha for RGBA and rejects undecodable forms") {
    val rgba = (0 until 3).map(y => (0 until 8).map(x => (y * 91 + x * 37) % 256))
    val bytes = pngEncode(2, 3, colorType = 6, rgba, filters = Seq(0, 4, 2))
    val Some((w, h, out)) = Multimodal.decodePngPixels(bytes)
    assert((w, h) == ((2, 3)))
    val expected = rgba.flatMap(_.grouped(4).flatMap(_.take(3)))
    assert(out.map(_ & 0xFF).toSeq == expected)

    val good = pngEncode(2, 2, 2, Seq.fill(2)(Seq.fill(6)(7)), Seq(0, 0))
    assert(Multimodal.decodePngPixels(good).isDefined)
    def mut(off: Int, v: Byte): Array[Byte] = {
      val c = good.clone(); c(off) = v; c
    }
    assert(Multimodal.decodePngPixels(mut(24, 16)).isEmpty) // 16-bit depth
    assert(Multimodal.decodePngPixels(mut(25, 3)).isEmpty)  // palette type
    assert(Multimodal.decodePngPixels(mut(28, 1)).isEmpty)  // Adam7 interlace
    assert(Multimodal.decodePngPixels(mut(0, 'X'.toByte)).isEmpty) // bad signature
    assert(Multimodal.decodePngPixels(good.take(40)).isEmpty) // truncated IHDR
    assert(Multimodal.decodePngPixels(good.dropRight(20)).isEmpty) // truncated IDAT/IEND
    // undefined filter type 5 on the first scanline: corrupt, not a throw
    val badFilter = pngEncode(2, 2, 2, Seq.fill(2)(Seq.fill(6)(7)), Seq(5, 0))
    assert(Multimodal.decodePngPixels(badFilter).isEmpty)
  }

  // ── real GIF pixel decode ──

  /** LSB-first variable-width code packer — independent implementation
    * of the bit layout the LZW decoder must read. Codes are (value,
    * width) pairs; widths vary per code exactly as an encoder's would. */
  private def packLsb(codes: Seq[(Int, Int)]): Array[Byte] = {
    val bits = codes.map(_._2).sum
    val out = new Array[Byte]((bits + 7) / 8)
    var pos = 0
    for ((v, width) <- codes; k <- 0 until width) {
      if (((v >> k) & 1) != 0) out((pos >> 3)) = (out(pos >> 3) | (1 << (pos & 7))).toByte
      pos += 1
    }
    out
  }

  /** Minimal GIF87a fixture: grayscale 256-entry global color table
    * (palette i = (i,i,i)), one non-interlaced frame, caller-supplied
    * already-packed LZW data split into sub-blocks. */
  private def gifBytes(w: Int, h: Int, minCode: Int,
                       lzw: Array[Byte], paletteBits: Int = 7,
                       interlaced: Boolean = false): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write("GIF87a".getBytes("US-ASCII"))
    bb.write(Array[Byte](
      (w & 0xFF).toByte, (w >> 8).toByte, (h & 0xFF).toByte, (h >> 8).toByte,
      (0x80 | paletteBits).toByte, 0, 0)) // GCT present, 2^(bits+1) entries
    val n = 2 << paletteBits
    for (c <- 0 until n) { bb.write(c); bb.write(c); bb.write(c) }
    bb.write(0x2C)
    bb.write(Array[Byte](0, 0, 0, 0,
      (w & 0xFF).toByte, (w >> 8).toByte, (h & 0xFF).toByte, (h >> 8).toByte,
      if (interlaced) 0x40.toByte else 0))
    bb.write(minCode)
    lzw.grouped(255).foreach { blk => bb.write(blk.length); bb.write(blk) }
    bb.write(0) // sub-block terminator
    bb.write(0x3B)
    bb.toByteArray
  }

  /** Multi-frame GIF89a fixture: grayscale 256-entry GCT, each 4×4
    * frame preceded by a graphic-control extension with delay
    * 10 + frameNo centiseconds, literal-only 9-bit LZW per frame. */
  private def gifAnimatedBytes(frames: Seq[Seq[Int]]): Array[Byte] = {
    val bb = new java.io.ByteArrayOutputStream()
    bb.write("GIF89a".getBytes("US-ASCII"))
    bb.write(Array[Byte](4, 0, 4, 0, 0x87.toByte, 0, 0))
    for (c <- 0 until 256) { bb.write(c); bb.write(c); bb.write(c) }
    frames.zipWithIndex.foreach { case (pix, f) =>
      bb.write(Array[Byte](0x21, 0xF9.toByte, 4, 0,
        (10 + f).toByte, 0, 0, 0)) // GCE: delay 10+f, no transparency
      bb.write(0x2C)
      bb.write(Array[Byte](0, 0, 0, 0, 4, 0, 4, 0, 0))
      bb.write(8) // min code size
      val codes = ((256, 9) +: pix.map(v => (v, 9)) :+ ((257, 9))).toSeq
      val lzw = packLsb(codes)
      lzw.grouped(255).foreach { blk => bb.write(blk.length); bb.write(blk) }
      bb.write(0)
    }
    bb.write(0x3B)
    bb.toByteArray
  }

  test("decodeGifFrames walks every image descriptor with its GCE delay") {
    val f0 = (0 until 16).map(k => k * 3 % 256)
    val f1 = (0 until 16).map(k => (k * 7 + 1) % 256)
    val f2 = (0 until 16).map(k => 255 - k)
    val gif = gifAnimatedBytes(Seq(f0, f1, f2))
    val frames = Multimodal.decodeGifFrames(gif).get
    assert(frames.length == 3)
    frames.zip(Seq(f0, f1, f2)).zipWithIndex.foreach {
      case (((no, delay, w, h, rgb), pix), idx) =>
        assert(no == idx && delay == 10 + idx && w == 4 && h == 4)
        (0 until 16).foreach { k =>
          assert((rgb(3 * k) & 0xFF) == pix(k) &&
            (rgb(3 * k + 1) & 0xFF) == pix(k) &&
            (rgb(3 * k + 2) & 0xFF) == pix(k))
        }
    }
    // the single-frame decoder still reads frame 0 of an animation
    val Some((w1, h1, px1)) = Multimodal.decodeGifPixels(gif)
    assert((w1, h1) == ((4, 4)))
    assert(px1.grouped(3).map(_(0) & 0xFF).toSeq == f0)
    // truncation (lost trailer) and garbage decode to None
    assert(Multimodal.decodeGifFrames(gif.dropRight(2)).isEmpty)
    assert(Multimodal.decodeGifFrames(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("frameSampled explodes real GIF frames as BMP payloads with delays") {
    val f0 = (0 until 16).map(k => k * 5 % 256)
    val f1 = (0 until 16).map(_ => 7)
    val f2 = (0 until 16).map(k => (k * 11 + 2) % 256)
    val gif = gifAnimatedBytes(Seq(f0, f1, f2))
    val rows = Multimodal.frameSampled(
        Seq((1L, gif)).toDF("id", "payload"), "payload", stride = 2)
      .select("frame_no", "delay_cs", "frame").collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L), "keep frames 0, 2")
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 12L))
    rows.zip(Seq(f0, f2)).foreach { case (r, pix) =>
      val Some((w, h, rgb)) =
        Multimodal.decodePixelsRgb(r.getAs[Array[Byte]]("frame"))
      assert((w, h) == ((4, 4)))
      assert(rgb.grouped(3).map(_(0) & 0xFF).toSeq == pix)
    }
    // corrupt GIF (signature but truncated): zero frames, no fake stub
    val corrupt = gif.take(40)
    assert(Multimodal.frameSampled(
      Seq((1L, corrupt)).toDF("id", "payload"), "payload", 1).count() == 0)
    // non-GIF payloads keep the deterministic stub path, null delay
    val stubRows = Multimodal.frameSampled(
        Seq((1L, Array.fill[Byte](600)(7))).toDF("id", "payload"),
        "payload", stride = 2)
      .select("frame_no", "delay_cs").collect().sortBy(_.getLong(0))
    assert(stubRows.map(_.getLong(0)).toSeq == Seq(0L, 2L))
    assert(stubRows.forall(_.isNullAt(1)))
  }

  /** Minimal MJPEG AVI fixture: RIFF → hdrl (avih carrying μs/frame) +
    * movi with one tagged stream-data chunk per provided payload. */
  private def aviBytesTagged(usPerFrame: Long, nFrames: Int,
                             chunks: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def le32(v: Long): Unit =
      (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xFF).toInt))
    def s4(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    val moviSize = 4 + chunks.map { case (_, f) => 8 + f.length + (f.length & 1) }.sum
    val hdrlSize = 4 + 8 + 56
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    s4("RIFF"); le32(riffSize); s4("AVI ")
    s4("LIST"); le32(hdrlSize); s4("hdrl")
    s4("avih"); le32(56); le32(usPerFrame)
    le32(0); le32(0); le32(0) // maxBytesPerSec, padding, flags
    le32(nFrames) // dwTotalFrames
    le32(0); le32(0); le32(0) // initialFrames, streams, bufSize
    le32(8); le32(8) // dwWidth, dwHeight (fixture frames are 8×8)
    (0 until 16).foreach(_ => bos.write(0))
    s4("LIST"); le32(moviSize); s4("movi")
    chunks.foreach { case (tag, f) =>
      s4(tag); le32(f.length); bos.write(f)
      if ((f.length & 1) == 1) bos.write(0) // chunks pad to even
    }
    bos.toByteArray
  }

  private def aviBytes(usPerFrame: Long,
                       frames: Seq[Array[Byte]]): Array[Byte] =
    aviBytesTagged(usPerFrame, frames.length, frames.map(("00dc", _)))

  test("decodeAviFrames walks RIFF to every MJPEG chunk with the avih delay") {
    // flat DC-only 8×8 grayscale frames: quant 8 → pixel = 128 + dc
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val dcs = Seq(10, -20, 33)
    val jpegs = dcs.map(dc => jpegEncode(8, 8, 1, q, Seq(Seq(flat(dc)))))
    val avi = aviBytes(40000L, jpegs) // 25 fps → 4 cs per frame
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.length == 3)
    frames.zip(dcs).zipWithIndex.foreach {
      case (((no, delay, w, h, rgb), dc), idx) =>
        assert(no == idx && delay == 4 && w == 8 && h == 8)
        assert(rgb.forall(p => (p & 0xFF) == 128 + dc),
          s"frame $idx must be flat at ${128 + dc}")
    }
    // corruption: truncated container, or a video chunk that won't decode
    assert(Multimodal.decodeAviFrames(avi.dropRight(3)).isEmpty)
    val badChunk = aviBytes(40000L, Seq(Array.fill[Byte](16)(7)))
    assert(Multimodal.decodeAviFrames(badChunk).isEmpty)
    assert(Multimodal.decodeAviFrames("RIFFxxxxWAVE".getBytes).isEmpty)
  }

  test("decodeAviFrames locks onto the first video stream of a multi-stream AVI") {
    // stream 00 carries two decodable MJPEG frames; stream 01's chunks
    // are garbage — per-stream extraction must keep 00's frames with
    // contiguous frame_no and not null the container on 01 (r8 ADVICE)
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val j1 = jpegEncode(8, 8, 1, q, Seq(Seq(flat(10))))
    val j2 = jpegEncode(8, 8, 1, q, Seq(Seq(flat(33))))
    val junk = Array.fill[Byte](16)(7)
    val avi = aviBytesTagged(40000L, 2,
      Seq(("00dc", j1), ("01dc", junk), ("00dc", j2), ("01db", junk)))
    val frames = Multimodal.decodeAviFrames(avi).get
    assert(frames.length == 2)
    assert(frames.map(_._1) == Seq(0, 1), "frame_no is per-stream")
    assert(frames(0)._5.forall(p => (p & 0xFF) == 138) &&
      frames(1)._5.forall(p => (p & 0xFF) == 161))
    // the lock is onto the FIRST stream id seen, whatever it is
    val avi01 = aviBytesTagged(40000L, 1,
      Seq(("01dc", j1), ("00dc", junk)))
    val f01 = Multimodal.decodeAviFrames(avi01).get
    assert(f01.length == 1 && f01.head._5.forall(p => (p & 0xFF) == 138))
  }

  test("parseAviHeader rejects zero or out-of-range avih dims/frames") {
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val avi = aviBytes(40000L, Seq(jpegEncode(8, 8, 1, q, Seq(Seq(flat(1))))))
    // dwWidth at offset 12 (RIFF) + 8+4 (LIST hdrl) + 8 (avih hdr) + 32
    def patched(off: Int, v: Long): Array[Byte] = {
      val c = avi.clone()
      (0 until 4).foreach(i => c(off + i) = ((v >> (8 * i)) & 0xFF).toByte)
      c
    }
    val wOff = 12 + 12 + 8 + 32
    val nOff = 12 + 12 + 8 + 16
    assert(Multimodal.parseAviHeader(patched(wOff, 0L)).isEmpty,
      "zero width must not decode")
    assert(Multimodal.parseAviHeader(patched(wOff, 0xFFFFFFFFL)).isEmpty,
      ">= 2^31 width must not surface as a negative Int")
    assert(Multimodal.parseAviHeader(patched(nOff, 0x80000000L)).isEmpty,
      ">= 2^31 frame count must not surface as a negative Int")
    assert(Multimodal.parseAviHeader(avi).contains((8, 8, 1)),
      "the unpatched fixture still parses")
  }

  test("parseAviHeader surfaces avih dims and frame count via decodeMeta") {
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val avi = aviBytes(40000L,
      Seq(1, 2, 3).map(dc => jpegEncode(8, 8, 1, q, Seq(Seq(flat(dc))))))
    assert(Multimodal.parseAviHeader(avi).contains((8, 8, 3)))
    val meta = Multimodal.decodeMeta(avi)
    assert(meta._2 == 8 && meta._3 == 8 && meta._4 == 3 && meta._5 == "avi")
    assert(Multimodal.parseAviHeader("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.parseAviHeader(avi.take(30)).isEmpty)
  }

  test("frameSampled explodes MJPEG AVI frames like GIF ones") {
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val avi = aviBytes(100000L, // 10 fps → 10 cs
      Seq(5, 15, 25).map(dc => jpegEncode(8, 8, 1, q, Seq(Seq(flat(dc))))))
    val rows = Multimodal.frameSampled(
        Seq((1L, avi)).toDF("id", "payload"), "payload", stride = 2)
      .select("frame_no", "delay_cs", "frame").collect()
      .sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 2L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(10L, 10L))
    rows.zip(Seq(5, 25)).foreach { case (r, dc) =>
      val Some((w, h, rgb)) =
        Multimodal.decodePixelsRgb(r.getAs[Array[Byte]]("frame"))
      assert((w, h) == ((8, 8)))
      assert(rgb.forall(p => (p & 0xFF) == 128 + dc))
    }
  }

  test("decodeGifPixels: literal LZW stream through a grayscale palette") {
    // 4×2 frame, indices 0..7·17 (grayscale levels); minCode 8 → 9-bit
    // codes: clear, eight literals, end — no dictionary growth
    val idx = (0 until 8).map(_ * 17)
    val codes = (256, 9) +: idx.map(v => (v, 9)) :+ (257, 9)
    val Some((w, h, px)) = Multimodal.decodeGifPixels(
      gifBytes(4, 2, 8, packLsb(codes)))
    assert((w, h) == ((4, 2)))
    assert(px.grouped(3).map(_(0) & 0xFF).toSeq == idx) // r channel = gray
    assert(px.grouped(3).forall(t => t(0) == t(1) && t(1) == t(2)))
  }

  test("decodeGifPixels: four-pass interlace restores display row order") {
    // 4×8 interlaced: pass rows 0,8.. then 4.. then 2,6 then odd —
    // stored order for h=8 is [0, 4, 2, 6, 1, 3, 5, 7]. Encode the
    // target rows (row y = constant y*30) in that stored order and
    // expect the decoder to put each back at its display position.
    val stored = Seq(0, 4, 2, 6, 1, 3, 5, 7)
    val idx = stored.flatMap(y => Seq.fill(4)(y * 30))
    val codes = (256, 9) +: idx.map(v => (v, 9)) :+ ((257, 9))
    val Some((w, h, px)) = Multimodal.decodeGifPixels(
      gifBytes(4, 8, 8, packLsb(codes), interlaced = true))
    assert((w, h) == ((4, 8)))
    for (y <- 0 until 8; x <- 0 until 4)
      assert((px(3 * (y * 4 + x)) & 0xFF) == y * 30, s"pixel ($x,$y)")
  }

  test("decodeGifPixels: dictionary reuse and the KwKwK special case") {
    // [0,1,0,1]: clear, 0, 1, then code 6 = the just-defined "0 1".
    // Reading code 6 defines entry 7 → nextCode hits 8 → the END code
    // must arrive at the grown 4-bit width
    val reuse = packLsb(Seq((4, 3), (0, 3), (1, 3), (6, 3), (5, 4)))
    val Some((_, _, px1)) = Multimodal.decodeGifPixels(
      gifBytes(4, 1, 2, reuse, paletteBits = 1))
    assert(px1.grouped(3).map(_(0) & 0xFF).toSeq == Seq(0, 1, 0, 1))
    // [0,0,0]: clear, 0, then code 6 BEFORE it is defined (KwKwK) = "0 0"
    val kwk = packLsb(Seq((4, 3), (0, 3), (6, 3), (5, 3)))
    val Some((_, _, px2)) = Multimodal.decodeGifPixels(
      gifBytes(3, 1, 2, kwk, paletteBits = 1))
    assert(px2.grouped(3).map(_(0) & 0xFF).toSeq == Seq(0, 0, 0))
  }

  test("decodeGifPixels: code width grows with the dictionary") {
    // minCode 2 → 3-bit codes; after the third literal the dictionary
    // reaches code 8 and width must bump to 4 bits mid-stream. Encoder
    // mirror: each code AFTER the first defines one entry, the width
    // grows when nextCode reaches 2^width — the decoder must track it.
    val lits = Seq(0, 1, 2, 3, 0, 2)
    val codes = scala.collection.mutable.ArrayBuffer((4, 3)) // clear
    var next = 6; var width = 3
    var first = true
    for (v <- lits) {
      codes += ((v, width))
      if (!first) {
        if (next < 4096) next += 1
        if (next == (1 << width) && width < 12) width += 1
      }
      first = false
    }
    codes += ((5, width)) // end
    val Some((_, _, px)) = Multimodal.decodeGifPixels(
      gifBytes(6, 1, 2, packLsb(codes.toSeq), paletteBits = 1))
    assert(px.grouped(3).map(_(0) & 0xFF).toSeq == lits)
  }

  test("decodeGifPixels rejects corrupt and unsupported forms") {
    val idx = (0 until 8).map(_ * 17)
    val codes = (256, 9) +: idx.map(v => (v, 9)) :+ (257, 9)
    val good = gifBytes(4, 2, 8, packLsb(codes))
    assert(Multimodal.decodeGifPixels(good).isDefined)
    val interlaced = good.clone()
    // image-descriptor packed byte: 6 (header) + 7 (LSD) + 768 (GCT) + 9.
    // h=2 interlaces to stored order [0, 1] — identity — so the flag
    // alone must not change the output (interlace is SUPPORTED now;
    // row re-ordering is pinned by the four-pass test above)
    interlaced(6 + 7 + 768 + 9) = 0x40.toByte
    val Some((wi, hi, pi)) = Multimodal.decodeGifPixels(interlaced)
    val Some((_, _, pg)) = Multimodal.decodeGifPixels(good)
    assert((wi, hi) == ((4, 2)) && java.util.Arrays.equals(pi, pg))
    assert(Multimodal.decodeGifPixels(good.dropRight(5)).isEmpty) // truncated
    assert(Multimodal.decodeGifPixels("GIF89a".getBytes).isEmpty)
    // end code missing: bitstream exhausts without terminating
    val noEnd = gifBytes(4, 2, 8, packLsb((256, 9) +: idx.map(v => (v, 9))))
    assert(Multimodal.decodeGifPixels(noEnd).isEmpty)
    // code beyond the dictionary
    val wild = gifBytes(2, 1, 2, packLsb(Seq((4, 3), (0, 3), (7, 3), (5, 3))),
      paletteBits = 1)
    assert(Multimodal.decodeGifPixels(wild).isEmpty)
    // palette overrun: index 3 with a 2-entry local... (2-color palette,
    // literal 3 is within code space but beyond the table)
    val overrun = gifBytes(2, 1, 2, packLsb(Seq((4, 3), (3, 3), (0, 3), (5, 3))),
      paletteBits = 0)
    assert(Multimodal.decodeGifPixels(overrun).isEmpty)
  }

  // ── real JPEG pixel decode ──

  /** Canonical-Huffman code assignment (symbol → (code, length)) —
    * independent implementation of the layout the decoder must invert. */
  private def huffCodes(counts: Array[Int], syms: Seq[Int]): Map[Int, (Int, Int)] = {
    var code = 0; var k = 0
    val m = scala.collection.mutable.Map[Int, (Int, Int)]()
    for (l <- 1 to 16) {
      for (_ <- 0 until counts(l - 1)) { m(syms(k)) = (code, l); code += 1; k += 1 }
      code <<= 1
    }
    m.toMap
  }

  /** MSB-first bit writer with JPEG 0xFF byte stuffing; pads the final
    * byte with 1-bits as the spec prescribes. */
  private final class JpegBitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0; private var n = 0
    def put(code: Int, len: Int): Unit =
      for (i <- (len - 1) to 0 by -1) {
        acc = (acc << 1) | ((code >> i) & 1); n += 1
        if (n == 8) { out.write(acc); if (acc == 0xFF) out.write(0); acc = 0; n = 0 }
      }
    def flush(): Array[Byte] = {
      if (n > 0) { while (n < 8) { acc = (acc << 1) | 1; n += 1 }
        out.write(acc); if (acc == 0xFF) out.write(0); acc = 0; n = 0 }
      val r = out.toByteArray; out.reset(); r // drain: flush may be called per restart
    }
  }

  // multi-length tables so the canonical build is genuinely exercised
  // (layouts chosen to be canonically exact: each length's codes fit)
  private val dcCounts = Array(0, 2, 2, 4, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val dcSyms = Seq(0, 1, 2, 3, 4, 5, 6, 7)
  private val acCounts = Array(0, 2, 2, 3, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val acSyms = Seq(0x00, 0x01, 0x02, 0x11, 0x03, 0x21, 0xF0, 0x04, 0x31)

  private def cat(v: Int): Int = { var n = 0; var a = math.abs(v); while (a > 0) { n += 1; a >>= 1 }; n }
  private def magBits(v: Int, n: Int): Int = if (v >= 0) v else v + (1 << n) - 1

  /** Encode blocks of QUANTIZED coefficients (zig-zag order, one 64-long
    * array per data unit, MCU-interleaved) into a baseline JPEG.
    * Grayscale (1 comp) or color (3 comps), with per-component sampling
    * factors (default all 1×1 = 4:4:4); each MCU's blocks arrive in the
    * spec's component-then-raster order. `q` is the quant table in
    * zig-zag order. */
  private def jpegEncode(w: Int, h: Int, nComp: Int, q: Array[Int],
                         mcus: Seq[Seq[Array[Int]]],
                         restartInterval: Int = 0,
                         sampling: Seq[(Int, Int)] = Nil): Array[Byte] = {
    val samp = if (sampling.nonEmpty) sampling else Seq.fill(nComp)((1, 1))
    val mcuCompOrder =
      (0 until nComp).flatMap(c => Seq.fill(samp(c)._1 * samp(c)._2)(c))
    val dc = huffCodes(dcCounts, dcSyms)
    val ac = huffCodes(acCounts, acSyms)
    val bw = new JpegBitWriter
    val dcPred = new Array[Int](nComp)
    var mcuIdx = 0
    val entropy = new java.io.ByteArrayOutputStream()
    for (mcu <- mcus) {
      if (restartInterval > 0 && mcuIdx > 0 && mcuIdx % restartInterval == 0) {
        entropy.write(bw.flush()) // byte-align, then RSTn
        entropy.write(0xFF); entropy.write(0xD0 + ((mcuIdx / restartInterval - 1) % 8))
        java.util.Arrays.fill(dcPred, 0)
      }
      for ((blk, c) <- mcu.zip(mcuCompOrder)) {
        val diff = blk(0) - dcPred(c); dcPred(c) = blk(0)
        val t = cat(diff)
        val (dcode, dlen) = dc(t)
        bw.put(dcode, dlen); if (t > 0) bw.put(magBits(diff, t), t)
        var k = 1
        var lastNz = 63
        while (lastNz > 0 && blk(lastNz) == 0) lastNz -= 1
        while (k <= lastNz) {
          var run = 0
          while (blk(k) == 0) { run += 1; k += 1 }
          while (run >= 16) { val (zc, zl) = ac(0xF0); bw.put(zc, zl); run -= 16 }
          val s = cat(blk(k))
          val (acode, alen) = ac((run << 4) | s)
          bw.put(acode, alen); bw.put(magBits(blk(k), s), s)
          k += 1
        }
        if (lastNz < 63) { val (ec, el) = ac(0x00); bw.put(ec, el) }
      }
      mcuIdx += 1
    }
    entropy.write(bw.flush())
    def seg(marker: Int, payload: Array[Int]): Array[Byte] =
      (Seq(0xFF, marker, (payload.length + 2) >> 8, (payload.length + 2) & 0xFF)
        ++ payload.toSeq).map(_.toByte).toArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8)
    out.write(seg(0xDB, Array(0x00) ++ q))
    if (restartInterval > 0)
      out.write(seg(0xDD, Array(restartInterval >> 8, restartInterval & 0xFF)))
    val comps = (0 until nComp).flatMap(c =>
      Seq(c + 1, (samp(c)._1 << 4) | samp(c)._2, 0))
    out.write(seg(0xC0, Array(8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, nComp) ++ comps))
    out.write(seg(0xC4, Array(0x00) ++ dcCounts ++ dcSyms))
    out.write(seg(0xC4, Array(0x10) ++ acCounts ++ acSyms))
    val sos = (0 until nComp).flatMap(c => Seq(c + 1, 0x00))
    out.write(seg(0xDA, Array(nComp) ++ sos ++ Seq(0, 63, 0)))
    out.write(entropy.toByteArray)
    out.write(0xFF); out.write(0xD9)
    out.toByteArray
  }

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  test("progressive JPEG: DC successive approximation + EOB-only AC scans") {
    // 8×8 grayscale, 4 scans: DC first at Al=1 (cat-6 one-code table),
    // DC refinement bit, then AC first/refinement scans that are a
    // single EOB each. Final DC = (d<<1)|bit = v, quant 8 → flat 128+v.
    for (v <- Seq(64, 65, 100, 127)) {
      val d = v >> 1
      val jpeg = hexBytes(
        "FFD8" +
          "FFDB0043" + "00" + "08" * 64 +
          "FFC2000B" + "08" + "0008" + "0008" + "01" + "011100" +
          "FFC40014" + "00" + "01" + "00" * 15 + "06" +
          "FFC40014" + "10" + "01" + "00" * 15 + "00" +
          "FFDA0008" + "01" + "0100" + "000001" + f"${d * 2}%02X" +
          "FFDA0008" + "01" + "0100" + "000010" + (if ((v & 1) == 1) "80" else "00") +
          "FFDA0008" + "01" + "0100" + "013F01" + "00" +
          "FFDA0008" + "01" + "0100" + "013F10" + "00" +
          "FFD9")
      val Some((w, h, px)) = Multimodal.decodeJpegPixels(jpeg)
      assert((w, h) == ((8, 8)))
      assert(px.forall(p => (p & 0xFF) == 128 + v), s"flat ${128 + v} for v=$v")
    }
    // truncation and a missing scan decode to None
    assert(Multimodal.decodeJpegPixels(hexBytes(
      "FFD8" + "FFDB0043" + "00" + "08" * 64 +
        "FFC2000B" + "08" + "0008" + "0008" + "01" + "011100" + "FFD9")).isEmpty)
  }

  test("progressive JPEG: AC spectral band with refinement correction bits") {
    // one 8×8 block, quant all 1: DC scan codes 10 (cat 4); AC first
    // scan (band 1..5, Al=1) codes +1 at k=1 (stored 2); the AC
    // refinement scan (Al=0) sends a correction bit turning 2 into 3
    // AND introduces -1 at k=3 after skipping one zero-history slot.
    val jpeg = hexBytes(
      "FFD8" +
        "FFDB0043" + "00" + "01" * 64 +
        "FFC2000B" + "08" + "0008" + "0008" + "01" + "011100" +
        "FFC40014" + "00" + "01" + "00" * 15 + "04" + // DC: one code → cat 4
        "FFDA0008" + "01" + "0100" + "000000" + "50" + // DC scan: 0,1010 → 10
        "FFC40015" + "10" + "02" + "00" * 15 + "0001" + // AC: '0'→EOB, '1'→(0,1)
        "FFDA0008" + "01" + "0100" + "010501" + "C0" + // 1,1,0: +1@k1, EOB
        "FFC40015" + "10" + "02" + "00" * 15 + "0011" + // AC: '0'→EOB, '1'→(1,1)
        "FFDA0008" + "01" + "0100" + "010510" + "A0" + // 1,0,1,0: see above
        "FFD9")
    val Some((w, h, px)) = Multimodal.decodeJpegPixels(jpeg)
    assert((w, h) == ((8, 8)))
    val natural = new Array[Int](64)
    natural(0) = 10
    natural(jpegZigzag(1)) = 3
    natural(jpegZigzag(3)) = -1
    val expected = refIdct(natural)
    assert(px.grouped(3).map(_(0) & 0xFF).toSeq == expected.toSeq)
  }

  test("progressive JPEG: DC prediction and EOB runs span blocks") {
    // 16×8 grayscale, two blocks, quant 1. DC scan: 10 then diff 10 →
    // 20. AC first scan: +2 at k=1 of block 1, then EOB1 with appended
    // bit 0 → the EOB run covers block 2 entirely.
    val jpeg = hexBytes(
      "FFD8" +
        "FFDB0043" + "00" + "01" * 64 +
        "FFC2000B" + "08" + "0008" + "0010" + "01" + "011100" + // 16 wide
        "FFC40014" + "00" + "01" + "00" * 15 + "04" +
        "FFDA0008" + "01" + "0100" + "000000" + "5280" + // 0,1010,0,1010
        "FFC40015" + "10" + "01" + "01" + "00" * 14 + "0210" + // '0'→(0,2), '10'→EOB1
        "FFDA0008" + "01" + "0100" + "013F00" + "50" + // 0,10,10,0
        "FFD9")
    val Some((w, h, px)) = Multimodal.decodeJpegPixels(jpeg)
    assert((w, h) == ((16, 8)))
    val n1 = new Array[Int](64); n1(0) = 10; n1(jpegZigzag(1)) = 2
    val n2 = new Array[Int](64); n2(0) = 20
    val e1 = refIdct(n1); val e2 = refIdct(n2)
    for (y <- 0 until 8; x <- 0 until 16) {
      val got = px(3 * (y * 16 + x)) & 0xFF
      val want = if (x < 8) e1(y * 8 + x) else e2(y * 8 + (x - 8))
      assert(got == want, s"pixel ($x,$y)")
    }
  }

  /** Reference IDCT: the direct quadruple-sum definition (independent
    * of the decoder's separable form), same rounding/level-shift. */
  private def refIdct(coefNatural: Array[Int]): Array[Int] =
    Array.tabulate(64) { i =>
      val x = i % 8; val y = i / 8
      var s = 0.0
      for (u <- 0 until 8; v <- 0 until 8) {
        val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
        val cv = if (v == 0) 1.0 / math.sqrt(2.0) else 1.0
        s += cu * cv * coefNatural(v * 8 + u) / 4.0 *
          math.cos((2 * x + 1) * u * math.Pi / 16.0) *
          math.cos((2 * y + 1) * v * math.Pi / 16.0)
      }
      val r = math.round(s).toInt + 128
      if (r < 0) 0 else if (r > 255) 255 else r
    }

  private val jpegZigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  test("decodeJpegPixels: grayscale blocks with AC coefficients match the reference IDCT") {
    // 16×8: two blocks, DC prediction across them (negative diff), AC
    // terms with short runs and a ZRL-spanning 18-zero run
    // values avoid exact .5 IDCT sums: the decoder's separable form and
    // the reference's direct sum agree to ~1e-13, which only matters if
    // a pixel lands exactly on a rounding boundary
    val q = Array.fill(64)(0) // zig-zag quant table
    q(0) = 8; q(1) = 4; q(2) = 5; q(5) = 2; q(21) = 5
    val b1 = new Array[Int](64); b1(0) = 90; b1(1) = 5; b1(5) = -1
    val b2 = new Array[Int](64); b2(0) = 70; b2(2) = -1; b2(21) = 1 // run 18 → ZRL + (2,1)
    val bytes = jpegEncode(16, 8, 1, q.map(v => if (v == 0) 1 else v),
      Seq(Seq(b1), Seq(b2)))
    val Some((w, h, px)) = Multimodal.decodeJpegPixels(bytes)
    assert((w, h) == ((16, 8)))
    // expected: dequantize in zig-zag, scatter to natural order, ref IDCT
    def expectBlock(zz: Array[Int]): Array[Int] = {
      val nat = new Array[Int](64)
      for (k <- 0 until 64)
        nat(jpegZigzag(k)) = zz(k) * (if (q(k) == 0) 1 else q(k))
      refIdct(nat)
    }
    val e1 = expectBlock(b1); val e2 = expectBlock(b2)
    for (y <- 0 until 8; x <- 0 until 8) {
      assert((px(3 * (y * 16 + x)) & 0xFF) == e1(y * 8 + x), s"blk1 ($x,$y)")
      assert((px(3 * (y * 16 + 8 + x)) & 0xFF) == e2(y * 8 + x), s"blk2 ($x,$y)")
    }
    assert(px.grouped(3).forall(t => t(0) == t(1) && t(1) == t(2)))
  }

  test("decodeJpegPixels: 4:4:4 color converts YCbCr to RGB; DRI restarts reset predictors") {
    val q = Array.fill(64)(1); q(0) = 8
    // DC-only planes with q(0)=8: a DC coefficient c dequantizes to 8c,
    // the IDCT spreads it flat as c, level shift gives 128 + c exactly
    def dcBlock(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val y = dcBlock(11); val cb = dcBlock(2); val cr = dcBlock(-2)
    val bytes = jpegEncode(8, 8, 3, q, Seq(Seq(y, cb, cr)))
    val Some((_, _, px)) = Multimodal.decodeJpegPixels(bytes)
    val yv = 128 + 11; val cbv = 128 + 2 - 128; val crv = 128 - 2 - 128
    val er = math.round(yv + 1.402 * crv).toInt
    val eg = math.round(yv - 0.344136 * cbv - 0.714136 * crv).toInt
    val eb = math.round(yv + 1.772 * cbv).toInt
    assert(px.grouped(3).forall(t =>
      (t(0) & 0xFF) == er && (t(1) & 0xFF) == eg && (t(2) & 0xFF) == eb))
    // DRI: two grayscale MCUs with a restart between; second block's DC
    // is absolute again (predictor reset) — wrong reset → wrong level
    val g1 = dcBlock(40); val g2 = dcBlock(40)
    val rbytes = jpegEncode(16, 8, 1, q, Seq(Seq(g1), Seq(g2)), restartInterval = 1)
    val Some((_, _, rpx)) = Multimodal.decodeJpegPixels(rbytes)
    assert(rpx.grouped(3).forall(t => (t(0) & 0xFF) == 128 + 40))
  }

  test("decodeJpegPixels: 4:2:0 subsampled color — quadrant luma, upsampled chroma") {
    // one 16×16 MCU: 4 Y blocks (DC 10/20/30/40 → quadrant levels
    // 138..168), 1 Cb (DC +4), 1 Cr (DC −4); q(0)=8 makes every level
    // exact. Chroma covers the whole MCU via 2× nearest upsampling.
    val q = Array.fill(64)(1); q(0) = 8
    def dcBlock(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val bytes = jpegEncode(16, 16, 3, q,
      Seq(Seq(dcBlock(10), dcBlock(20), dcBlock(30), dcBlock(40),
        dcBlock(4), dcBlock(-4))),
      sampling = Seq((2, 2), (1, 1), (1, 1)))
    val Some((w, h, px)) = Multimodal.decodeJpegPixels(bytes)
    assert((w, h) == ((16, 16)))
    def expected(yLevel: Int): (Int, Int, Int) = {
      val yv = 128 + yLevel; val cb = 4.0; val cr = -4.0
      (math.round(yv + 1.402 * cr).toInt,
        math.round(yv - 0.344136 * cb - 0.714136 * cr).toInt,
        math.round(yv + 1.772 * cb).toInt)
    }
    for (y <- 0 until 16; x <- 0 until 16) {
      val quadrant = (y / 8) * 2 + (x / 8) // raster order of the Y blocks
      val (er, eg, eb) = expected(Seq(10, 20, 30, 40)(quadrant))
      val o = 3 * (y * 16 + x)
      assert((px(o) & 0xFF) == er && (px(o + 1) & 0xFF) == eg &&
        (px(o + 2) & 0xFF) == eb, s"($x,$y)")
    }
    // 4:2:2 (2×1 luma): two Y blocks side by side, chroma row-stretched
    val b422 = jpegEncode(16, 8, 3, q,
      Seq(Seq(dcBlock(10), dcBlock(20), dcBlock(0), dcBlock(0))),
      sampling = Seq((2, 1), (1, 1), (1, 1)))
    val Some((_, _, p422)) = Multimodal.decodeJpegPixels(b422)
    assert((p422(3 * 4) & 0xFF) == 138 && (p422(3 * 12) & 0xFF) == 148)
  }

  test("decodeJpegPixels rejects non-baseline and corrupt forms") {
    val q = Array.fill(64)(1)
    def dcBlock(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val good = jpegEncode(8, 8, 1, q, Seq(Seq(dcBlock(10))))
    assert(Multimodal.decodeJpegPixels(good).isDefined)
    val progressive = good.clone()
    // find the SOF0 marker and flip it to SOF2
    val sofAt = good.indices.find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0).get
    progressive(sofAt + 1) = 0xC2.toByte
    assert(Multimodal.decodeJpegPixels(progressive).isEmpty)
    val subsampled = good.clone()
    subsampled(sofAt + 11) = 0x33.toByte // sampling factor 3: unsupported
    assert(Multimodal.decodeJpegPixels(subsampled).isEmpty)
    val deep = good.clone()
    deep(sofAt + 4) = 12.toByte // 12-bit precision
    assert(Multimodal.decodeJpegPixels(deep).isEmpty)
    assert(Multimodal.decodeJpegPixels(good.dropRight(6)).isEmpty) // truncated scan
    assert(Multimodal.decodeJpegPixels(Array[Byte](0xFF.toByte, 0xD8.toByte)).isEmpty)
  }

  test("pixel decoders never throw: mutation fuzz over valid fixtures") {
    // the defensive-None contract is the load-bearing property for a
    // pipeline decode: seeded byte-level mutations of VALID files reach
    // deep decoder states (mid-Huffman, mid-LZW, mid-inflate) that
    // random bytes never would — every outcome must be a clean Option
    val rnd = new scala.util.Random(20260813L)
    val png = pngEncode(4, 5, 2,
      (0 until 5).map(y => (0 until 12).map(x => (y * 53 + x * 29) % 256)),
      Seq(0, 1, 2, 3, 4))
    val gif = gifBytes(4, 2, 8,
      packLsb((256, 9) +: (0 until 8).map(v => (v * 17, 9)) :+ (257, 9)))
    val q = Array.fill(64)(1); q(0) = 8
    def dcBlock(v: Int) = { val a = new Array[Int](64); a(0) = v; a }
    val jpg = jpegEncode(16, 8, 1, q, Seq(Seq(dcBlock(40)), Seq(dcBlock(90))))
    val bmp = bmp24(2, 2, topDown = false, Seq.fill(4)((9, 8, 7)))
    for (fixture <- Seq(png, gif, jpg, bmp); _ <- 0 until 400) {
      val m = fixture.clone()
      // 1-3 random byte corruptions, occasionally a truncation
      for (_ <- 0 to rnd.nextInt(3))
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      val payload = if (rnd.nextInt(4) == 0) m.take(rnd.nextInt(m.length)) else m
      Multimodal.decodePixelsRgb(payload) match {
        case Some((w, h, px)) => assert(px.length == w * h * 3)
        case None => ()
      }
    }
    // pure-noise payloads, varied lengths
    for (_ <- 0 until 400) {
      val noise = Array.fill(rnd.nextInt(200))(rnd.nextInt(256).toByte)
      Multimodal.decodePixelsRgb(noise)
    }
  }

  test("pixelStats and lumaHistogram see PNG pixels through decodePixelsRgb") {
    // 2×2 RGB PNG: two bright, two dark — same fixture as the BMP test,
    // so the two container formats must produce identical stats
    val px = Seq(Seq(255, 255, 255, 200, 200, 200), Seq(10, 20, 30, 0, 0, 0))
    val bytes = pngEncode(2, 2, 2, px, filters = Seq(1, 2))
    val res = Multimodal.pixelStats(bytes)
    assert(res(0) == 2 && res(1) == 2)
    assert(res(2) == (255 + 200 + 10 + 0).toDouble / 4)
    assert(res(3) == (255 + 200 + 20 + 0).toDouble / 4)
    assert(res(4) == (255 + 200 + 30 + 0).toDouble / 4)
    assert(res(5) == 2L)
    val white = pngEncode(2, 2, 2, Seq.fill(2)(Seq.fill(6)(255)), Seq(0, 0))
    val hist = Multimodal.lumaHistogram(white, dim = 16).get
    assert(hist(15) == 1f && hist.take(15).forall(_ == 0f))
  }

  test("withPixelStats end-to-end: real stats for BMP rows, nulls otherwise") {
    val df = Seq(
      (1L, bmp24(2, 2, topDown = false,
        Seq((255, 255, 255), (255, 255, 255), (0, 0, 0), (0, 0, 0)))),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])
    ).toDF("media_id", "payload")
    val out = Multimodal.withPixelStats(df, "payload")
      .select(col("media_id"), col("pix.width").as("w"),
        col("pix.mean_r").as("mr"), col("pix.n_bright").as("nb"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Int]("w") == 2)
    assert(out(1L).getAs[Double]("mr") == 127.5)
    assert(out(1L).getAs[Long]("nb") == 2L)
    assert(out(2L).get(1) == null)
    assert(out(3L).get(1) == null)
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

  /** Minimal valid IEEE-float WAV: mono 32-bit float (format 3). */
  /** G.711 WAV fixture: format 6 (A-law) or 7 (μ-law), 1 channel,
    * one encoded byte per sample. */
  private def wavG711Bytes(fmt: Int, rate: Int,
                           encoded: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44 + encoded.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + encoded.length)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(fmt.toShort).putShort(1)
    bb.putInt(rate).putInt(rate)
    bb.putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(encoded.length)
    encoded.foreach(v => bb.put((v & 0xFF).toByte))
    bb.array()
  }

  test("decodeAudioMeta expands G.711 mu-law and A-law to linear") {
    // μ-law: 0x80 is the positive max (+32124), 0x00 its negative,
    // 0xFF/0x7F the two zeros — the ITU reference values
    val u = Multimodal.decodeAudioMeta(
      wavG711Bytes(7, 8000, Array(0x80, 0x00, 0xFF, 0x7F)))
    assert(u(3) == 8 && u(4) == 4L)
    // rms² · n = Σs² = 2 · 32124²
    val sumSqU = math.pow(u(6).asInstanceOf[Double], 2) * 4
    assert(math.abs(sumSqU - 2.0 * 32124 * 32124) < 1e-3)
    assert(u(7) == 2L) // + → − → 0(≥0) counts one change each way
    // A-law: 0xAA is the positive max (+32256), 0x2A its negative;
    // 0xD5 decodes to +8 (the smallest magnitude), 0x55 to −8
    val a = Multimodal.decodeAudioMeta(
      wavG711Bytes(6, 8000, Array(0xAA, 0x2A, 0xD5, 0x55)))
    val sumSqA = math.pow(a(6).asInstanceOf[Double], 2) * 4
    assert(math.abs(sumSqA - (2.0 * 32256 * 32256 + 2.0 * 8 * 8)) < 1e-3)
    assert(a(7) == 3L) // + − + −
  }

  private def wavF32Bytes(rate: Int, samples: Array[Float]): Array[Byte] = {
    val dataLen = samples.length * 4
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(3).putShort(1)          // IEEE float, 1 channel
    bb.putInt(rate).putInt(rate * 4)    // sample rate, byte rate
    bb.putShort(4).putShort(32)         // block align, bits
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putFloat)
    bb.array()
  }

  test("decodeAudioMeta: IEEE-float WAV (format 3) decodes sample statistics") {
    // ±0.5 alternating: rms exactly 0.5, one sign change per step
    val res = Multimodal.decodeAudioMeta(
      wavF32Bytes(8000, Array(0.5f, -0.5f, 0.5f, -0.5f)))
    assert(res(1) == 1 && res(2) == 8000 && res(3) == 32)
    assert(res(4) == 4L && res(6) == 0.5 && res(7) == 3L)
    assert(res(6).getClass == classOf[java.lang.Double])
    // unsupported float depth (format 3 but 64-bit) → nulls, no throw
    val b64 = wavF32Bytes(8000, Array(1f, -1f))
    b64(34) = 64 // bits-per-sample field
    assert(Multimodal.decodeAudioMeta(b64)(1) == null)
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

  test("dHash of gridBmp equals the arithmetic replay of the cell grid") {
    for (seed <- Seq(0L, 1L, 7L, 123L, 99999L)) {
      // the oracle's short way: bits straight from the cell formula
      var want = 0L
      for (gy <- 0 until 8; gx <- 0 until 8)
        if (Multimodal.cellValue(seed, gx, gy) <
          Multimodal.cellValue(seed, gx + 1, gy)) want |= 1L << (gy * 8 + gx)
      // the engine's long way: encode → real BMP decode → pool → bits
      val got = Multimodal.dHash(Multimodal.gridBmp(seed))
      assert(got.contains(want), s"seed=$seed got=$got want=$want")
    }
  }

  test("dHash: equal payloads hash equal; undecodable payloads hash None") {
    assert(Multimodal.dHash(Multimodal.gridBmp(5L)) ==
      Multimodal.dHash(Multimodal.gridBmp(5L)))
    assert(Multimodal.dHash("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("withDHash attaches signatures; hammingNearDups finds all <=3-bit pairs") {
    val rnd = new scala.util.Random(7)
    // base random signatures plus perturbed twins within 0..3 bit flips
    val base = (0L until 40L).map(i => i -> rnd.nextLong()).toMap
    val twins = (0L until 40L by 4L).map { i =>
      var s = base(i)
      val flips = (i / 4 % 4).toInt
      (0 until flips).foreach(_ => s ^= 1L << rnd.nextInt(64))
      (i + 1000L) -> s
    }.toMap
    val all = base ++ twins
    val sigs = all.toSeq.toDF("id", "sig")
    val got = graft.operators.Dedup
      .hammingNearDups(sigs, "id", "sig", maxHamming = 3,
        maxBucketSize = Int.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2).toLong).toMap
    val want = (for {
      (ia, sa) <- all.toSeq; (ib, sb) <- all.toSeq if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib) -> h.toLong).toMap
    assert(got == want,
      s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
  }

  test("hamming table: incremental pairs == brute force; append feeds later batches") {
    val rnd = new scala.util.Random(11)
    val corpus = (0L until 30L).map(i => i -> rnd.nextLong()).toMap
    val b1 = Map(1000L -> corpus(0L),            // exact dup of corpus 0
      1001L -> (corpus(5L) ^ 3L),                // 2 bits off corpus 5
      1002L -> rnd.nextLong())                   // fresh
    val dir = java.nio.file.Files.createTempDirectory("hamtab").toString
    graft.operators.Dedup.writeHammingTable(
      corpus.toSeq.toDF("id", "sig"), "id", "sig", dir,
      maxHamming = 3, maxBucketSize = 1000)
    val got = graft.operators.Dedup.hammingNearDupsIncremental(
      spark, dir, b1.toSeq.toDF("id", "sig"), "id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val want = (for {
      (bi, bs) <- b1.toSeq; (ci, cs) <- corpus.toSeq
      h = java.lang.Long.bitCount(bs ^ cs) if h <= 3
    } yield (bi, ci) -> h).toMap
    assert(got == want, s"missing=${want.keySet -- got.keySet} extra=${got.keySet -- want.keySet}")
    // append batch 1; a batch-2 copy of a batch-1 signature must now pair
    graft.operators.Dedup.appendToHammingTable(
      spark, dir, b1.toSeq.toDF("id", "sig"), "id", "sig")
    val got2 = graft.operators.Dedup.hammingNearDupsIncremental(
      spark, dir, Seq((2000L, b1(1002L))).toDF("id", "sig"), "id", "sig")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(got2.contains((2000L, 1002L)) && got2((2000L, 1002L)) == 0)
  }

  test("hammingIngest: store rejects, clusters collapse, matched clusters reject whole") {
    val rnd = new scala.util.Random(23)
    val corpus = (0L until 20L).map(i => i -> rnd.nextLong()).toMap
    val dir = java.nio.file.Files.createTempDirectory("hamingest").toString
    graft.operators.Dedup.writeHammingTable(
      corpus.toSeq.toDF("id", "sig"), "id", "sig", dir,
      maxHamming = 3, maxBucketSize = 1000)
    val fresh1 = rnd.nextLong(); val fresh2 = rnd.nextLong()
    val b1 = Seq(
      100L -> corpus(3L),      // corpus copy → rejected
      101L -> fresh1,          // fresh → survives
      102L -> fresh1,          // twin of 101 → collapses (101 wins)
      103L -> corpus(7L),      // corpus copy, clustered with 104 and…
      104L -> (corpus(7L) ^ 7L), // …3 bits off 103 (also a direct match)
      // 6 bits from the store — rejected ONLY through the 104 chain
      // (hamming(105, 104) = 3): the pure-transitive cluster rule
      105L -> (corpus(7L) ^ 7L ^ 56L))
    val s1 = graft.operators.Dedup.hammingIngest(
      spark, dir, b1.toDF("id", "sig"), "id", "sig")
      .select("id").as[Long].collect().toSet
    assert(s1 == Set(101L), s"got $s1")
    // batch 2: a copy of batch-1's survivor must now be rejected
    // TRANSITIVELY (through the append), a fresh one passes
    val s2 = graft.operators.Dedup.hammingIngest(
      spark, dir, Seq(200L -> fresh1, 201L -> fresh2).toDF("id", "sig"),
      "id", "sig")
      .select("id").as[Long].collect().toSet
    assert(s2 == Set(201L), s"got $s2")
  }

  test("gridGif round-trips through the real GIF decoder with mix-chain pixels") {
    val frames = Multimodal.decodeGifFrames(Multimodal.gridGif(9L, 6, 2)).get
    assert(frames.length == 6)
    for ((n, delay, w, h, px) <- frames) {
      assert(w == 4 && h == 4 && delay == 10 + n)
      for (k <- 0 until 16) {
        val v = Multimodal.mixValue(9L, (n / 2).toLong * 16 + k + 4000L, 256L).toInt
        assert((px(3 * k) & 0xFF) == v && (px(3 * k + 1) & 0xFF) == v &&
          (px(3 * k + 2) & 0xFF) == v, s"frame $n pixel $k")
      }
    }
  }

  test("sceneCuts: within-shot hamming 0; shot_no constant inside a shot") {
    val withBin = Seq(1L, 2L).toDF("doc_id").as[Long]
      .map(id => (id, Multimodal.gridGif(id, 6, 2))).toDF("doc_id", "payload")
    val rows = Multimodal.sceneCuts(withBin, "doc_id", "payload", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (Option(r.getAs[Integer]("hamming_prev")).map(_.toInt),
          r.getLong(3))).toMap
    assert(rows.size == 12)
    for (id <- Seq(1L, 2L)) {
      assert(rows((id, 0))._1.isEmpty && rows((id, 0))._2 == 0L)
      for (f <- Seq(1, 3, 5)) {
        // odd frames repeat their shot's first frame byte-for-byte
        assert(rows((id, f))._1.contains(0), s"f=$f hamming")
        assert(rows((id, f))._2 == rows((id, f - 1))._2, s"f=$f shot")
      }
    }
  }

  test("frameDHashes opens MJPEG-AVI too: flat frames hash flat (all-zero bits)") {
    // flat DC-only frames: every pixel identical → every adjacent-cell
    // comparison false → dHash 0 for each frame regardless of DC level
    val q = Array.fill(64)(0); q(0) = 8
    def flat(dc: Int) = { val b = new Array[Int](64); b(0) = dc; b }
    val jpegs = Seq(10, -20, 33).map(dc =>
      jpegEncode(8, 8, 1, q, Seq(Seq(flat(dc)))))
    val fh = Multimodal.frameDHashes(aviBytes(40000L, jpegs)).get
    assert(fh.map(f => (f._1, f._2, f._3)) ==
      Seq((0, 4, 0L), (1, 4, 0L), (2, 4, 0L)))
  }

  test("audioEnergyHash of toneWav equals the arithmetic replay of window amplitudes") {
    for (seed <- Seq(0L, 3L, 42L, 12345L)) {
      var want = 0L
      for (k <- 0 until 64)
        if (Multimodal.mixValue(seed, 1000L + k, 30000L) <
          Multimodal.mixValue(seed, 1001L + k, 30000L)) want |= 1L << k
      val got = Multimodal.audioEnergyHash(Multimodal.toneWav(seed))
      assert(got.contains(want), s"seed=$seed got=$got want=$want")
    }
  }

  test("audioEnergyHash: non-WAV payloads hash None; float PCM quantizes exactly") {
    assert(Multimodal.audioEnergyHash("RIFFgarbage".getBytes("US-ASCII")).isEmpty)
    // the float fixture carries the SAME window amplitudes as the
    // 16-bit fixture (a(k)/2^15 is exact in float32), so the two
    // formats must hash IDENTICALLY — the engine-exactness proof of
    // the quantize-then-integer-sum path
    for (seed <- Seq(0L, 3L, 42L, 12345L)) {
      val int16 = Multimodal.audioEnergyHash(Multimodal.toneWav(seed))
      val f32 = Multimodal.audioEnergyHash(Multimodal.toneWavF32(seed))
      assert(int16.nonEmpty && f32 == int16, s"seed=$seed $f32 != $int16")
    }
    // NaN samples quantize to 0 and out-of-range samples clamp — no
    // crash, a defined hash
    val n = 130
    val bb = java.nio.ByteBuffer.allocate(44 + 4 * n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 4 * n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(3).putShort(1).putInt(8000).putInt(32000)
      .putShort(4).putShort(32)
    bb.put("data".getBytes("US-ASCII")).putInt(4 * n)
    (0 until n).foreach { i =>
      bb.putFloat(if (i % 3 == 0) Float.NaN
        else if (i % 3 == 1) 1e30f else Float.PositiveInfinity)
    }
    assert(Multimodal.audioEnergyHash(bb.array()).nonEmpty)
    // 64-bit float depth stays unsupported → None
    val b2 = java.nio.ByteBuffer.allocate(44 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.put("RIFF".getBytes("US-ASCII")).putInt(36 + 8)
      .put("WAVE".getBytes("US-ASCII"))
    b2.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(3).putShort(1).putInt(8000).putInt(64000)
      .putShort(8).putShort(64)
    b2.put("data".getBytes("US-ASCII")).putInt(8)
    b2.putDouble(0.5)
    assert(Multimodal.audioEnergyHash(b2.array()).isEmpty)
  }

  test("audioEnergyHash: G.711 mu-law payload hashes (integer expansion path)") {
    // constant-amplitude mu-law windows: silence (0x7F encodes ~0)
    // vs loud (0x00 encodes max magnitude) in alternate thirds
    val n = 195
    val bb = java.nio.ByteBuffer.allocate(44 + n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + n)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(7).putShort(1).putInt(8000).putInt(8000)
      .putShort(1).putShort(8)
    bb.put("data".getBytes("US-ASCII")).putInt(n)
    (0 until n).foreach(i => bb.put(if ((i / 65) % 2 == 0) 0x7F.toByte else 0x00.toByte))
    val h = Multimodal.audioEnergyHash(bb.array())
    assert(h.nonEmpty)
  }

  test("resized replaces payload with a deterministic stub transform") {
    val out = Multimodal.resized(media.filter(col("media_id") === 2L),
      "payload", w = 64, h = 64)
    val bytes = out.collect().head.getAs[Array[Byte]]("resized")
    assert(bytes.length == 64 * 64 / 64)
  }
}
