package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-at-a-time inside
  * `mapPartitions` (the Scala analogue of `mapInPandas`: bounded
  * batches, columnar-ish access, one decode context per batch instead
  * of per row).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs,
  * so `decodeMetaStub` / `resizeStub` / `frameSampleStub` compute
  * deterministic fakes from the raw bytes. The Spark-side plumbing —
  * schema, batch shape, partition-level processing, null handling — is
  * real and is what these operators exercise. A production build swaps
  * the stub bodies for javax.imageio / ffmpeg bindings without touching
  * any Spark code.
  */
object Multimodal {

  /** Typed metadata produced by "decoding" a media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("byte_len", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("format", StringType)))

  /** STUB: deterministic fake decode. Real impl: ImageIO.read /
    * ffprobe over `bytes`. Kept total and pure so plumbing tests are
    * reproducible. */
  def decodeMetaStub(bytes: Array[Byte]): (Long, Int, Int, Int, String) = {
    val len = bytes.length.toLong
    (len,
      1 + (len % 1024).toInt,
      1 + (len % 768).toInt,
      1 + (len % 30).toInt,
      if (len % 2 == 0) "png" else "jpeg")
  }

  /** STUB: fake resize — real impl would re-encode at (w,h); the fake
    * truncates/pads deterministically so output size is w-h-dependent. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(1, (w * h) / 64)
    java.util.Arrays.copyOf(bytes, target)
  }

  /** STUB: fake frame sampling — every `stride`-th 256-byte window. */
  def frameSampleStub(bytes: Array[Byte], stride: Int): Seq[Array[Byte]] =
    bytes.grouped(256).zipWithIndex.collect {
      case (frame, i) if i % stride == 0 => frame
    }.toSeq

  /** Shared plumbing for every binary-column operator: extend the
    * schema with `newFields`, process each partition in bounded batches
    * (one decoder context per batch — Arrow-batch shape), and append
    * `perRow(bytes)`'s field values to the input row: zero results drop
    * the row, several explode it. The payload reaches `perRow` as-is
    * (possibly null) so each operator states its own null contract. */
  private def mapBinary(df: DataFrame, binCol: String, batchSize: Int,
      newFields: Seq[StructField])(
      perRow: Array[Byte] => Iterator[Seq[Any]]): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ newFields)
    val binIdx = inSchema.fieldIndex(binCol)
    val outEnc = Encoders.row(outSchema)
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "decoder context" per batch (stub: nothing to init)
        batch.iterator.flatMap { r =>
          perRow(r.getAs[Array[Byte]](binIdx))
            .map(vals => Row.fromSeq(r.toSeq ++ vals))
        }
      }
    }(outEnc).toDF(outSchema.fieldNames: _*)
  }

  /** Attach decoded metadata to a binary column. Batched decode inside
    * mapPartitions: the per-partition iterator is processed in bounded
    * batches (`batchSize`), mirroring Arrow-batch shape — a real codec
    * would amortize its decoder/context across each batch. */
  def withMediaMeta(df: DataFrame, binCol: String,
                    batchSize: Int = 64): DataFrame =
    mapBinary(df, binCol, batchSize,
      Seq(StructField("media", mediaMetaType))) { bytes =>
      val meta =
        if (bytes == null) null
        else {
          val (l, w, h, f, fmt) = decodeMetaStub(bytes)
          Row(l, w, h, f, fmt)
        }
      Iterator.single(Seq(meta))
    }

  /** STUB: fake feature extraction — an L2-normalized `dim`-bin byte
    * histogram of the payload. Real impl: a vision/audio encoder over
    * the decoded media. Total, pure and deterministic, so the plumbing
    * (schema, batching, downstream ANN compatibility) is testable. */
  def featuresStub(bytes: Array[Byte], dim: Int = 64): Array[Float] = {
    val h = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xFF) % dim) += 1f
      i += 1
    }
    var ss = 0.0
    var j = 0
    while (j < dim) { ss += h(j).toDouble * h(j); j += 1 }
    val inv = if (ss > 0) (1.0 / math.sqrt(ss)).toFloat else 0f
    j = 0
    while (j < dim) { h(j) *= inv; j += 1 }
    h
  }

  /** Attach an embedding column extracted from a binary media column
    * (stub encoder, real batched plumbing). The output `Array[Float]`
    * column is directly consumable by the [[Similarity]] operators —
    * binary corpus → features → ANN / near-dup is the full multimodal
    * retrieval pipeline. */
  def withFeatures(df: DataFrame, binCol: String, dim: Int = 64,
                   outCol: String = "features", batchSize: Int = 64): DataFrame = {
    require(dim > 0, "dim must be > 0")
    mapBinary(df, binCol, batchSize,
      Seq(StructField(outCol, ArrayType(FloatType, containsNull = false)))) { bytes =>
      Iterator.single(Seq(
        if (bytes == null) null else featuresStub(bytes, dim).toSeq))
    }
  }

  /** Explode a (video) binary column into sampled frame rows: one
    * output row per kept frame, keeping every `stride`-th frame.
    * `frame_no` is the frame's index in the ORIGINAL frame sequence
    * (0, stride, 2·stride, …), so downstream ops can reason about
    * timestamps; `frame` holds the frame payload.
    *
    * Row-explosion happens inside mapPartitions (no shuffle); output
    * cardinality is rows × frames/stride — partition sizing guidance
    * is the same as for any explode. */
  def frameSampled(df: DataFrame, binCol: String, stride: Int,
                   batchSize: Int = 64): DataFrame = {
    require(stride > 0, "stride must be > 0")
    mapBinary(df, binCol, batchSize,
      Seq(StructField("frame_no", LongType), StructField("frame", BinaryType))) { bytes =>
      if (bytes == null) Iterator.empty
      else frameSampleStub(bytes, stride).iterator.zipWithIndex.map {
        case (frame, ord) => Seq(ord.toLong * stride, frame)
      }
    }
  }

  /** Resize a binary media column (stub transform, real plumbing). */
  def resized(df: DataFrame, binCol: String, w: Int, h: Int,
              outCol: String = "resized", batchSize: Int = 64): DataFrame =
    mapBinary(df, binCol, batchSize, Seq(StructField(outCol, BinaryType))) { bytes =>
      Iterator.single(Seq(if (bytes == null) null else resizeStub(bytes, w, h)))
    }
}
