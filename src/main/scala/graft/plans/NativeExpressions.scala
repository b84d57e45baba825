package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.GraftShim
import org.apache.spark.sql.types._

/** Custom Catalyst expressions (SURVEY.md §7.3 "optional later" —
  * promoted to required once the bench showed interpreted higher-order
  * functions dominating the dedup/similarity queries).
  *
  * Each is a thin codegen'd call into [[VectorKernels]]: `doGenCode`
  * emits a single static invocation, so the expression lives inside
  * whole-stage codegen like any built-in, and the per-element loops run
  * as monomorphic JVM code instead of interpreted lambda dispatch.
  */

/** string text → array<long> distinct word n-gram shingle hashes. */
case class ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"ShingleHashesExpr: n must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.shingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.shingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** array<string> lower-cased tokens → string language code. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.langId(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}

/** string text → array<long> occurrence-expanded word n-gram shingle
  * hashes (the k-th occurrence of a gram hashes distinctly, so plain
  * set Jaccard over these equals WEIGHTED multiset Jaccard — see
  * VectorKernels.shingleHashesWeighted). */
case class WeightedShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"WeightedShingleHashesExpr: n must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.shingleHashesWeighted(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.shingleHashesWeighted($c, $n)")
  override protected def withNewChildInternal(
      newChild: Expression): WeightedShingleHashesExpr =
    copy(child = newChild)
}

/** array<long> shingle hashes → array<long> MinHash signature. */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.minhash(input.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.minhash($c, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** array<string> tokens → long SimHash. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** string text → array<string> word n-grams (single-space joined). */
case class WordNgramsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"WordNgramsExpr: n must be positive, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.wordNgramStrings(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.wordNgramStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNgramsExpr =
    copy(child = newChild)
}

/** string text → array<long> [nTokens, totalGrams, distinctGrams] of
  * word n-grams (exact distinctness — see VectorKernels.repetitionStats). */
case class RepetitionStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"RepetitionStatsExpr: n must be positive, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.repetitionStats(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.repetitionStats($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** (array<long>, array<long>) → int count of agreeing positions. */
case class SigEqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.eqCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.eqCount($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigEqCount =
    copy(left = newLeft, right = newRight)
}

/** (long num, long den) → long fixed-point log2(num/den) in units of
  * 2⁻³⁰ — the exact-integer squaring algorithm (VectorKernels.log2Fix),
  * bit-reproducible on any engine, which is what lets log-domain
  * scores into the hash-compared oracle gates. */
case class Log2Fix(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.log2Fix(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorKernels.log2Fix($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Log2Fix =
    copy(left = newLeft, right = newRight)
}

/** (array<float|double>, array<float|double>) → double cosine. Each
  * side's element accessor is dispatched on ITS OWN static type (mixed
  * float/double pairs are valid); dimension mismatch throws. */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.cosine(
      a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.VectorKernels.cosine($a, ${isFloat(left)}, $b, ${isFloat(right)})")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** array<float|double> → long hyperplane-LSH signature. `seed` picks an
  * independent plane set (seed 0 = the original planes), letting callers
  * draw several independent ≤64-bit signatures per vector. */
case class HyperplaneSig(child: Expression, bits: Int, seed: Long)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hyperplaneSig(input.asInstanceOf[ArrayData], bits, isFloat, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.hyperplaneSig($c, $bits, $isFloat, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

/** array<float|double> vector → int 1-based id of its max-cosine
  * centroid (ties → smallest id). The centroid matrix travels inside
  * the expression as a flattened row-major double[] reference object
  * (k × dim, rows L2-normalized at construction — see
  * [[VectorKernels.nearestCentroid]]), the same transport
  * [[BloomMightContain]] uses for its bitset: broadcast once with the
  * serialized plan, probed via one codegen'd static call — the
  * expression stays k-independent in code SIZE, so whole-stage codegen
  * survives centroid counts in the hundreds or thousands. */
case class NearestCentroid(child: Expression, cents: Array[Double], k: Int)
    extends UnaryExpression {
  require(k > 0, s"NearestCentroid: k must be positive, got $k")
  require(cents.nonEmpty && cents.length % k == 0,
    s"NearestCentroid: ${cents.length} matrix values do not tile k=$k rows")
  override def dataType: DataType = IntegerType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroid(cents, k, input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftCentroids", cents, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.nearestCentroid($centsRef, $k, $c, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
}

/** array<float|double> → array<double> unit-normalized (zero vectors
  * cast through unchanged). One fused codegen'd pass. */
case class L2NormalizeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.l2Normalize(input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.l2Normalize($c, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): L2NormalizeExpr =
    copy(child = newChild)
}

/** array<float|double> vector → array<int> of m 1-based PQ codes
  * (L2-nearest sub-centroid per contiguous subspace). The codebook
  * travels as a flattened reference object like [[NearestCentroid]]'s
  * matrix — m·k·subDim doubles broadcast once with the plan. */
case class PqEncodeExpr(child: Expression, cents: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(m > 0 && k > 0, s"PqEncodeExpr: m and k must be positive, got m=$m k=$k")
  require(cents.nonEmpty && cents.length % (m * k) == 0,
    s"PqEncodeExpr: ${cents.length} codebook values do not tile m=$m × k=$k rows")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncode(cents, m, k, input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftPqCodebook", cents, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.pqEncode($centsRef, $m, $k, $c, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** array<float|double> vector → long: all m 4-bit PQ codes packed in
  * one word (k ≤ 16, m ≤ 16) — the 8-byte scan/shuffle format for the
  * code table at scale. */
case class PqEncodePackedExpr(child: Expression, cents: Array[Double], m: Int, k: Int)
    extends UnaryExpression {
  require(m > 0 && m <= 16 && k > 0 && k <= 16,
    s"PqEncodePackedExpr: packed codes need 1 <= m,k <= 16, got m=$m k=$k")
  require(cents.nonEmpty && cents.length % (m * k) == 0,
    s"PqEncodePackedExpr: ${cents.length} codebook values do not tile m=$m × k=$k rows")
  override def dataType: DataType = LongType
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.pqEncodePacked(cents, m, k, input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftPqCodebook", cents, "double[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.pqEncodePacked($centsRef, $m, $k, $c, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncodePackedExpr =
    copy(child = newChild)
}

/** (long packed codes, array<float|double> probe) → double ADC dot. */
case class PqAdcPackedExpr(left: Expression, right: Expression,
    cents: Array[Double], m: Int, k: Int) extends BinaryExpression {
  require(m > 0 && m <= 16 && k > 0 && k <= 16,
    s"PqAdcPackedExpr: packed codes need 1 <= m,k <= 16, got m=$m k=$k")
  require(cents.nonEmpty && cents.length % (m * k) == 0,
    s"PqAdcPackedExpr: ${cents.length} codebook values do not tile m=$m × k=$k rows")
  override def dataType: DataType = DoubleType
  private def probeFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(packed: Any, probe: Any): Any =
    VectorKernels.pqAdcPacked(cents, m, k, packed.asInstanceOf[Long],
      probe.asInstanceOf[ArrayData], probeFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftPqCodebook", cents, "double[]")
    defineCodeGen(ctx, ev, (c, p) =>
      s"graft.plans.VectorKernels.pqAdcPacked($centsRef, $m, $k, $c, $p, $probeFloat)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcPackedExpr =
    copy(left = newLeft, right = newRight)
}

/** (array<int> PQ codes, array<float|double> probe) → double
  * asymmetric-distance dot product against the same broadcast
  * codebook the codes were produced with. */
case class PqAdcExpr(left: Expression, right: Expression,
    cents: Array[Double], m: Int, k: Int) extends BinaryExpression {
  require(m > 0 && k > 0, s"PqAdcExpr: m and k must be positive, got m=$m k=$k")
  require(cents.nonEmpty && cents.length % (m * k) == 0,
    s"PqAdcExpr: ${cents.length} codebook values do not tile m=$m × k=$k rows")
  override def dataType: DataType = DoubleType
  private def probeFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(codes: Any, probe: Any): Any =
    VectorKernels.pqAdc(cents, m, k, codes.asInstanceOf[ArrayData],
      probe.asInstanceOf[ArrayData], probeFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftPqCodebook", cents, "double[]")
    defineCodeGen(ctx, ev, (c, p) =>
      s"graft.plans.VectorKernels.pqAdc($centsRef, $m, $k, $c, $p, $probeFloat)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}

/** array<float|double> vector → array<int> of its `nprobe` nearest
  * centroid ids, best-first (the multi-assignment form of
  * [[NearestCentroid]], same flattened-matrix transport). */
case class NearestCentroids(child: Expression, cents: Array[Double],
    k: Int, nprobe: Int) extends UnaryExpression {
  require(k > 0, s"NearestCentroids: k must be positive, got $k")
  require(nprobe > 0, s"NearestCentroids: nprobe must be positive, got $nprobe")
  require(cents.nonEmpty && cents.length % k == 0,
    s"NearestCentroids: ${cents.length} matrix values do not tile k=$k rows")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.nearestCentroids(cents, k, nprobe,
      input.asInstanceOf[ArrayData], isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("graftCentroids", cents, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorKernels.nearestCentroids($centsRef, $k, $nprobe, $c, $isFloat)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
}

/** string → Unicode-normalized string. `form`: "NFC" | "NFD" | "NFKC"
  * | "NFKD". Normalization-sensitive operators (dedup, fingerprinting,
  * token counting) must run on normalized text or visually-identical
  * documents hash apart; Spark ships no normalizer built-in. */
case class UnicodeNormalize(child: Expression, form: String) extends UnaryExpression {
  private val formCode: Int = form match {
    case "NFC" => 0
    case "NFD" => 1
    case "NFKC" => 2
    case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"UnicodeNormalize: form must be NFC|NFD|NFKC|NFKD, got '$other'")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.normalize(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], formCode)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.normalize($c, $formCode)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** string text → double deflate compression ratio (compressed/raw;
  * empty → 1.0). Ordinal quality signal — see
  * VectorKernels.deflateRatio. */
case class DeflateRatioExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.deflateRatio(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.deflateRatio($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateRatioExpr =
    copy(child = newChild)
}

/** array<long> non-negative values → long Z-order (Morton) interleave
  * of the low `bits` bits of each. */
case class ZValueExpr(child: Expression, bits: Int) extends UnaryExpression {
  require(bits > 0 && bits <= 63, s"ZValueExpr: bits must be in 1..63, got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.zValue(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.zValue($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): ZValueExpr =
    copy(child = newChild)
}

/** long key-hash → boolean bloom membership. The bitset travels inside
  * the expression (broadcast to executors with the serialized plan, the
  * same transport a broadcast-hash-join bitmap uses) and is probed via
  * a codegen'd static call — no per-row allocation, no UDF. */
case class BloomMightContain(child: Expression, bits: Array[Byte], k: Int)
    extends UnaryExpression {
  require(bits.nonEmpty && (bits.length & (bits.length - 1)) == 0,
    s"BloomMightContain: bitset length must be a power of two, got ${bits.length}")
  require(k > 0, s"BloomMightContain: k must be positive, got $k")
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.bloomMightContain(bits, input.asInstanceOf[Long], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("graftBloomBits", bits, "byte[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.bloomMightContain($bitsRef, $c, $k)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** string → array<int> hashed adjacent-token bigram feature buckets
  * (DSIR). The poly-31 code-point hash is engine-mirrorable — see
  * [[VectorKernels.hashedBigramBuckets]] for the exact contract the
  * SQL oracle replays. */
case class HashedBigramBucketsExpr(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets > 0, s"HashedBigramBucketsExpr: buckets must be positive, got $buckets")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.hashedBigramBuckets(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.hashedBigramBuckets($c, $buckets)")
  override protected def withNewChildInternal(newChild: Expression): HashedBigramBucketsExpr =
    copy(child = newChild)
}

/** array<float|double> → array<double> sign random projection
  * (Johnson–Lindenstrauss); bit-reproducible across engines — see
  * [[VectorKernels.signProject]] for the exact contract. */
case class SignProjectExpr(child: Expression, outDim: Int, seed: Long)
    extends UnaryExpression {
  require(outDim > 0, s"SignProjectExpr: outDim must be positive, got $outDim")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }
  override def nullSafeEval(input: Any): Any =
    VectorKernels.signProject(input.asInstanceOf[ArrayData], outDim, seed, isFloat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.signProject($c, $outDim, ${seed}L, $isFloat)")
  override protected def withNewChildInternal(newChild: Expression): SignProjectExpr =
    copy(child = newChild)
}

/** string → array<string> all char-n-gram substrings per whitespace
  * word (subword-vocab training candidates). */
case class CharNgramsByWordExpr(child: Expression, minLen: Int, maxLen: Int)
    extends UnaryExpression {
  require(1 <= minLen && minLen <= maxLen,
    s"CharNgramsByWordExpr: need 1 <= minLen <= maxLen, got [$minLen, $maxLen]")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.charNgramsByWord(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], minLen, maxLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.charNgramsByWord($c, $minLen, $maxLen)")
  override protected def withNewChildInternal(newChild: Expression): CharNgramsByWordExpr =
    copy(child = newChild)
}

/** string → array<string> greedy longest-match subword tokens. The
  * vocabulary travels as a reference object with the plan (the
  * [[NearestCentroid]] transport); per-executor it is interned into a
  * hash set once. */
case class GreedySubTokensExpr(child: Expression, vocab: Array[String])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.greedySubTokens(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], vocab)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("graftSubwordVocab", vocab, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.greedySubTokens($c, $vocabRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): GreedySubTokensExpr =
    copy(child = newChild)
}

/** string word → -joined per-code-point BPE symbol state. */
case class BpeInitSymbolsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.bpeInitSymbols(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.bpeInitSymbols($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeInitSymbolsExpr =
    copy(child = newChild)
}

/** One BPE merge round (pair (a, b) → a||b, leftmost-greedy) over a
  * -joined symbol string. */
case class BpeMergeStepExpr(child: Expression, a: String, b: String)
    extends UnaryExpression {
  require(a.nonEmpty && b.nonEmpty, "BPE merge pair symbols must be non-empty")
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    VectorKernels.bpeMergeStep(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("graftBpeA", a, "java.lang.String")
    val bRef = ctx.addReferenceObj("graftBpeB", b, "java.lang.String")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.bpeMergeStep($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergeStepExpr =
    copy(child = newChild)
}

/** string text → array<string> BPE subtokens under a TRAINED merge
  * list (flattened pairs ride the plan as a reference object). */
case class BpeApplyExpr(child: Expression, mergePairs: Array[String])
    extends UnaryExpression {
  require(mergePairs.length % 2 == 0,
    s"mergePairs must be flattened (a, b) pairs; got ${mergePairs.length} entries")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.bpeApplyAll(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], mergePairs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pairsRef = ctx.addReferenceObj("graftBpeMerges", mergePairs, "java.lang.String[]")
    defineCodeGen(ctx, ev,
      c => s"graft.plans.VectorKernels.bpeApplyAll($c, $pairsRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeApplyExpr =
    copy(child = newChild)
}

/** (long id, string text) → string with deterministically-dropped
  * words ([[VectorKernels.wordDropout]]). */
case class WordDropoutExpr(left: Expression, right: Expression,
    threshold: Long, seed: Long) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(id: Any, text: Any): Any =
    VectorKernels.wordDropout(id.asInstanceOf[Long],
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], threshold, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (i, t) =>
      s"graft.plans.VectorKernels.wordDropout($i, $t, ${threshold}L, ${seed}L)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordDropoutExpr =
    copy(left = newLeft, right = newRight)
}

/** (long id, string text) → corrupted-text  target under the
  * block-deterministic span-corruption contract
  * ([[VectorKernels.spanCorrupt]]). */
case class SpanCorruptExpr(left: Expression, right: Expression,
    blockLen: Int, threshold: Long, seed: Long) extends BinaryExpression {
  require(blockLen >= 1, s"SpanCorruptExpr: blockLen must be >= 1, got $blockLen")
  override def dataType: DataType = StringType
  override def nullSafeEval(id: Any, text: Any): Any =
    VectorKernels.spanCorrupt(id.asInstanceOf[Long],
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      blockLen, threshold, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (i, t) =>
      s"graft.plans.VectorKernels.spanCorrupt($i, $t, $blockLen, ${threshold}L, ${seed}L)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCorruptExpr =
    copy(left = newLeft, right = newRight)
}

/** string text → array<long> winnowing fingerprints, each packed as
  * pos·2^31 + poly31hash (see VectorKernels.winnow). */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0, s"WinnowExpr: k must be positive, got $k")
  require(w > 0, s"WinnowExpr: w must be positive, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.winnow(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.VectorKernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** string → array<string> FastSS deletion neighborhood (≤ maxDist
  * code-point deletions, incl. the string itself, distinct — see
  * VectorKernels.deletionVariants). */
case class DeletionVariantsExpr(child: Expression, maxDist: Int)
    extends UnaryExpression {
  require(maxDist >= 0, s"DeletionVariantsExpr: maxDist must be >= 0, got $maxDist")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    VectorKernels.deletionVariants(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], maxDist)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.VectorKernels.deletionVariants($c, $maxDist)")
  override protected def withNewChildInternal(
      newChild: Expression): DeletionVariantsExpr = copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
object native {
  private def c(e: Expression): Column = GraftShim.column(e)
  private def e(col: Column): Expression = GraftShim.expression(col)

  def shingleHashes(text: Column, n: Int): Column =
    c(ShingleHashesExpr(e(text), n))
  def shingleHashesWeighted(text: Column, n: Int): Column =
    c(WeightedShingleHashesExpr(e(text), n))
  def langId(tokens: Column): Column = c(LangIdExpr(e(tokens)))
  def minhashSig(shingleHashes: Column, numPerm: Int): Column =
    c(MinHashSig(e(shingleHashes), numPerm))
  def simhash64(tokens: Column): Column = c(SimHash64(e(tokens)))
  def repetitionStats(text: Column, n: Int): Column =
    c(RepetitionStatsExpr(e(text), n))
  def wordNgrams(text: Column, n: Int): Column =
    c(WordNgramsExpr(e(text), n))
  def sigEqCount(a: Column, b: Column): Column =
    c(SigEqCount(e(a), e(b)))
  def log2Fix(num: Column, den: Column): Column =
    c(Log2Fix(e(num), e(den)))
  def cosineSim(a: Column, b: Column): Column = c(CosineSim(e(a), e(b)))
  def hyperplaneSig(v: Column, bits: Int, seed: Long = 0L): Column =
    c(HyperplaneSig(e(v), bits, seed))
  def bloomMightContain(keyHash: Column, bits: Array[Byte], k: Int): Column =
    c(BloomMightContain(e(keyHash), bits, k))
  def nearestCentroid(v: Column, cents: Array[Double], k: Int): Column =
    c(NearestCentroid(e(v), cents, k))
  def nearestCentroids(v: Column, cents: Array[Double], k: Int, nprobe: Int): Column =
    c(NearestCentroids(e(v), cents, k, nprobe))
  def l2Normalize(v: Column): Column = c(L2NormalizeExpr(e(v)))
  def pqEncode(v: Column, cents: Array[Double], m: Int, k: Int): Column =
    c(PqEncodeExpr(e(v), cents, m, k))
  def pqAdc(codes: Column, probe: Column, cents: Array[Double], m: Int, k: Int): Column =
    c(PqAdcExpr(e(codes), e(probe), cents, m, k))
  def pqEncodePacked(v: Column, cents: Array[Double], m: Int, k: Int): Column =
    c(PqEncodePackedExpr(e(v), cents, m, k))
  def pqAdcPacked(packed: Column, probe: Column, cents: Array[Double], m: Int, k: Int): Column =
    c(PqAdcPackedExpr(e(packed), e(probe), cents, m, k))
  def unicodeNormalize(text: Column, form: String): Column =
    c(UnicodeNormalize(e(text), form))
  def zValue(vals: Column, bits: Int): Column = c(ZValueExpr(e(vals), bits))
  def deflateRatio(text: Column): Column = c(DeflateRatioExpr(e(text)))
  def hashedBigramBuckets(text: Column, buckets: Int): Column =
    c(HashedBigramBucketsExpr(e(text), buckets))
  def signProject(v: Column, outDim: Int, seed: Long = 0L): Column =
    c(SignProjectExpr(e(v), outDim, seed))
  def charNgramsByWord(text: Column, minLen: Int, maxLen: Int): Column =
    c(CharNgramsByWordExpr(e(text), minLen, maxLen))
  def bpeInitSymbols(word: Column): Column = c(BpeInitSymbolsExpr(e(word)))
  def bpeMergeStep(state: Column, a: String, b: String): Column =
    c(BpeMergeStepExpr(e(state), a, b))
  def bpeApply(text: Column, mergePairs: Array[String]): Column =
    c(BpeApplyExpr(e(text), mergePairs))
  def wordDropout(id: Column, text: Column, threshold: Long, seed: Long): Column =
    c(WordDropoutExpr(e(id), e(text), threshold, seed))
  def spanCorrupt(id: Column, text: Column, blockLen: Int,
      threshold: Long, seed: Long): Column =
    c(SpanCorruptExpr(e(id), e(text), blockLen, threshold, seed))
  def greedySubTokens(text: Column, vocab: Array[String]): Column =
    c(GreedySubTokensExpr(e(text), vocab))
  def winnow(text: Column, k: Int, w: Int): Column =
    c(WinnowExpr(e(text), k, w))
  def deletionVariants(text: Column, maxDist: Int): Column =
    c(DeletionVariantsExpr(e(text), maxDist))
}
