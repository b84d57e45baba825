package graft

import graft.operators.Multimodal

import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (decode is a documented stub;
  * the schema/batching/null-handling is what's under test). */
class MultimodalSpec extends GraftSpec {

  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdef".getBytes("UTF-8")),
    (2L, Array.fill[Byte](2048)(7)),
    (3L, null.asInstanceOf[Array[Byte]]),
    (4L, Array.emptyByteArray)
  ).toDF("media_id", "payload")

  test("withMediaMeta appends a typed metadata struct per row") {
    val out = Multimodal.withMediaMeta(media, "payload")
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
