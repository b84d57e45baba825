package graft.operators

import graft.plans.VectorKernels

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom-pruned semi join: build a bloom filter over the dimension's
  * join keys (distributed aggregation, map-side partials OR'd), prune
  * the fact side with a codegen'd membership probe pushed into the
  * scan stage, then close with an exact semi join so false positives
  * never leak into the result.
  *
  * Result is EXACTLY `fact LEFT SEMI JOIN dim` — the bloom has no
  * false negatives, and the exact join removes the false positives.
  * The win is shuffle volume: at scale, the fact side entering the
  * exact join is already reduced to ~selectivity + fpp of its rows.
  *
  * When to use (the niche between two built-ins):
  *  - dim small enough to broadcast → a broadcast semi join already
  *    ships only the keys; bloom adds nothing.
  *  - dim huge but its KEYSET's bloom fits in tens of MB (1e8 keys at
  *    1% fpp ≈ 120 MB, 1e7 ≈ 12 MB) → bloom prunes the fact shuffle
  *    that a shuffle-hash semi join would pay in full. This is the
  *    100 TB case: Spark's own runtime row-level bloom (AQE
  *    `spark.sql.optimizer.runtime.bloomFilter.*`) makes the same
  *    trade automatically when stats allow; this operator makes it
  *    explicit and deterministic.
  *
  * The filter itself is built ON EXECUTORS (one byte[] per partition,
  * OR-merged), and only the final bitset returns to the driver to be
  * embedded into the probe expression — the dim ROWS never move.
  */
object BloomJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Power-of-two bitset size and hash count for n keys at fpp.
    * Classic formulas m = -n·ln p / ln²2, k = (m/n)·ln 2; m rounded UP
    * to a power of two so the probe masks instead of mod'ing.
    *
    * The bitset is capped at 2^31 bits = 256 MB (beyond that it
    * shouldn't ride a closure anyway). When the cap binds, the
    * requested fpp is NOT met — the effective rate (1−e^(−kn/m))^k is
    * logged so the degradation is visible instead of silently eroding
    * the pruning; past ~2e8 distinct keys at fpp=0.01, prefer Spark's
    * AQE runtime bloom or pre-bucket the dim side. */
  private[graft] def parameters(n: Long, fpp: Double): (Int, Int) = {
    require(n > 0, "bloom build side must be non-empty")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val mExact = math.ceil(-n.toDouble * math.log(fpp) / (math.log(2) * math.log(2)))
    val capBits = 1L << 31
    val mBits = {
      var m = 64L
      while (m < mExact && m < capBits) m <<= 1
      m
    }
    val k = math.max(1, math.round(mBits.toDouble / n.toDouble * math.log(2)).toInt)
    if (mExact > capBits) {
      val effFpp = math.pow(
        1.0 - math.exp(-k.toDouble * n.toDouble / mBits.toDouble), k.toDouble)
      log.warn(
        s"bloom bitset capped at 256 MB: $n keys want ${mExact.toLong} bits " +
          f"for fpp=$fpp; effective fpp is ~$effFpp%.4f — pruning degrades " +
          "accordingly (consider AQE runtime bloom filters at this keyset size)")
    }
    ((mBits / 8).toInt, k)
  }

  /** Distributed bloom build: byte[] buffer per partition, bits set
    * in place, partials OR-merged. Input is the xxhash64 of the key. */
  private final class BloomAgg(mBytes: Int, k: Int)
      extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](mBytes)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = {
      VectorKernels.bloomSet(b, h, k); b
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build a bloom bitset over `dim`'s (non-null, distinct-hashed) join
    * keys. Exposed for tests; `semiJoin` is the operator. */
  private[graft] def buildBloom(
      dim: DataFrame, dimKey: String, fpp: Double): (Array[Byte], Int) = {
    // n drives sizing; distinct because duplicate dim keys don't widen
    // the keyset (count is one partial-aggregated job over key hashes).
    // persist the hash projection: it feeds both the sizing count and
    // the build pass — without it the dim side is scanned twice
    val keyHashes = dim
      .filter(col(dimKey).isNotNull)
      .select(xxhash64(col(dimKey)).as("__kh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = keyHashes.distinct().count()
      val (mBytes, k) = parameters(math.max(n, 1L), fpp)
      val agg = udaf(new BloomAgg(mBytes, k), Encoders.scalaLong)
      val bits = keyHashes.select(agg(col("__kh"))).head().getAs[Array[Byte]](0)
      (bits, k)
    } finally keyHashes.unpersist()
  }

  /** `fact LEFT SEMI JOIN dim ON fact(factKey) = dim(dimKey)`, bloom-
    * pruned. See class doc for when this beats the plain semi join.
    *
    * Key types must MATCH exactly: the bloom compares xxhash64 of the
    * raw values, and Spark hashes e.g. INT 5 and BIGINT 5 differently —
    * a silent type coercion that the exact join would absorb becomes a
    * false NEGATIVE here (true matches pruned). Cast one side first. */
  def semiJoin(
      fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      fpp: Double = 0.01): DataFrame = {
    val ft = fact.schema(factKey).dataType
    val dt = dim.schema(dimKey).dataType
    require(ft == dt,
      s"bloom semi join key types must match exactly (got $factKey: ${ft.sql} " +
        s"vs $dimKey: ${dt.sql}); xxhash64 is type-sensitive, so a mismatch " +
        "would prune true matches — cast one side before joining")
    val (bits, k) = buildBloom(dim, dimKey, fpp)
    val pruned = fact.filter(
      col(factKey).isNotNull &&
        graft.plans.native.bloomMightContain(xxhash64(col(factKey)), bits, k))
    // semi join dedupes build keys itself — no extra distinct shuffle
    pruned.join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")
  }
}
