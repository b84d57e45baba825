package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction

/** Typed UDAF surface (SURVEY.md §2.11): custom aggregations as
  * `Aggregator`s registered through `functions.udaf`. Aggregators get
  * map-side partial aggregation for free (reduce/merge are the
  * combiner), so a custom aggregate shuffles one buffer per partition
  * per group — the same scale shape as a built-in `sum`.
  *
  * Accumulation is exact (`BigDecimal`, unlimited precision); only the
  * final quotient drops to IEEE double, so results are deterministic
  * across partitionings and cluster sizes — required for the driver's
  * hash-compare against DuckDB.
  */
object Udafs {

  /** Exact-sum buffer: Σ(x·w), Σw, and the count of non-null products
    * (SQL `sum` over zero non-null terms is NULL, not 0 — the count
    * lets finish() reproduce that). */
  case class WSum(sum: BigDecimal, wsum: BigDecimal, nx: Long)

  /** Weighted arithmetic mean Σ(x·w)/Σw; null on zero total weight.
    * Inputs arrive as decimals (cast upstream) so the per-row product
    * and both running sums are exact.
    *
    * Null semantics mirror the SQL composition `sum(x*w)/sum(w)`: a
    * null x drops the product from the numerator but its (non-null)
    * weight still counts in the denominator; a null w drops the row
    * entirely. This keeps the aggregate bit-identical to any engine
    * evaluating the SQL form on data with nulls — EXCEPT when the
    * total weight is exactly zero (weights that are zero or cancel):
    * there this aggregate returns NULL, following DuckDB/standard-SQL
    * division semantics, whereas Spark's own double division of the
    * composition would yield ±Infinity or NaN. Callers needing Spark's
    * IEEE behavior on zero total weight must use the raw composition. */
  object WeightedMean extends Aggregator[(BigDecimal, BigDecimal), WSum, Option[Double]] {
    override def zero: WSum = WSum(BigDecimal(0), BigDecimal(0), 0L)
    override def reduce(b: WSum, a: (BigDecimal, BigDecimal)): WSum = {
      val (x, w) = a
      if (w == null) b
      else if (x == null) WSum(b.sum, b.wsum + w, b.nx)
      else WSum(b.sum + x * w, b.wsum + w, b.nx + 1)
    }
    override def merge(b1: WSum, b2: WSum): WSum =
      WSum(b1.sum + b2.sum, b1.wsum + b2.wsum, b1.nx + b2.nx)
    override def finish(r: WSum): Option[Double] =
      // nx == 0 → SQL sum(x*w) is NULL → NULL result (not 0/Σw);
      // otherwise IEEE double division of two exactly-accumulated
      // values: any engine summing the same decimals gets the
      // identical bit pattern
      if (r.wsum.signum == 0 || r.nx == 0) None
      else Some(r.sum.toDouble / r.wsum.toDouble)
    override def bufferEncoder: Encoder[WSum] = Encoders.product[WSum]
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Column-API handle: `wavg(x, w)` inside `.agg(...)`. */
  val wavg: UserDefinedFunction = udaf(WeightedMean)

  /** Element-wise sum of double vectors — the aggregate form of the
    * k-means mean-update (and any per-group embedding centroid): one
    * dim-length buffer per partition per group travels the shuffle,
    * where the `posexplode → groupBy(group, pos)` composition first
    * multiplies the input by `dim` rows (at 10⁹ × 1024-dim vectors
    * that explode is 10¹² rows of pure CPU churn before the partial
    * agg even starts). Null vectors are skipped; ragged dimensions
    * throw (same contract as the cosine kernel); zero contributing
    * rows yield NULL, mirroring SQL `sum`. */
  object VecSum extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
    override def zero: Array[Double] = Array.empty
    private def add(b: Array[Double], v: Seq[Double]): Array[Double] =
      if (b.isEmpty) v.toArray
      else {
        require(b.length == v.length,
          s"vecSum: dimension mismatch (${b.length} vs ${v.length})")
        var i = 0
        while (i < b.length) { b(i) += v(i); i += 1 }
        b
      }
    override def reduce(b: Array[Double], v: Seq[Double]): Array[Double] =
      if (v == null) b else add(b, v)
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] =
      if (a.isEmpty) b else if (b.isEmpty) a else add(a, b.toSeq)
    override def finish(r: Array[Double]): Seq[Double] =
      if (r.isEmpty) null else r.toSeq
    override def bufferEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `vecSum(vec)` handle inside `.agg(...)`. */
  val vecSum: UserDefinedFunction = udaf(VecSum)

  /** Misra-Gries buffer: at most `k` counters. */
  case class MG(counters: Map[String, Long])

  /** Misra-Gries heavy-hitter sketch over a string column: at most `k`
    * counters per partial; any item occurring more than n/(k+1) times
    * is GUARANTEED present in the result, and every reported count is
    * an under-estimate by at most n/(k+1). One pass, fixed memory,
    * map-side partials — the sketch answer to "top keys" when the
    * domain is unbounded and [[graft.operators.Stats.keyHistogram]]'s
    * exact groupBy would produce more distinct keys than fits.
    *
    * EXACT REGIME: with fewer than `k` distinct values the sketch never
    * evicts, so counts are exact and deterministic (this is what the
    * correctness gate checks); in the approximate regime the counts
    * depend on merge order — treat them as lower bounds (property
    * test: planted heavy hitters are always found).
    *
    * Result: (item, count) pairs, count desc / item asc. */
  final class TopKSketch(k: Int) extends Aggregator[String, MG, Seq[(String, Long)]] {
    require(k > 0, "k must be > 0")
    override def zero: MG = MG(Map.empty)
    override def reduce(b: MG, item: String): MG = {
      if (item == null) b
      else b.counters.get(item) match {
        case Some(c) => MG(b.counters.updated(item, c + 1))
        case None if b.counters.size < k => MG(b.counters.updated(item, 1L))
        case None =>
          // decrement all; drop zeros (the classic MG step)
          MG(b.counters.collect {
            case (i, c) if c > 1 => i -> (c - 1)
          })
      }
    }
    override def merge(a: MG, b: MG): MG = {
      val sum = b.counters.foldLeft(a.counters) { case (acc, (i, c)) =>
        acc.updated(i, acc.getOrElse(i, 0L) + c)
      }
      if (sum.size <= k) MG(sum)
      else {
        // keep the k largest after subtracting the (k+1)-th count
        // (Agarwal et al.'s mergeable-summaries rule)
        val cut = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        MG(sum.collect { case (i, c) if c > cut => i -> (c - cut) })
      }
    }
    override def finish(r: MG): Seq[(String, Long)] =
      r.counters.toSeq.sortBy { case (i, c) => (-c, i) }
    override def bufferEncoder: Encoder[MG] = Encoders.product[MG]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `topk(col)` handle with `k` counters. */
  def topkSketch(k: Int): UserDefinedFunction = udaf(new TopKSketch(k))

  /** Count-Min sketch row index for `keyHash` in row `r`: an
    * independent XXH64 draw per row, folded into [0, width). Shared by
    * the aggregator and the query helper so estimates read the cells
    * the build wrote. */
  private def cmsIdx(keyHash: Long, r: Int, width: Int): Int =
    java.lang.Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(keyHash, 0x9E3779B97F4A7C15L * (r + 1)),
      width.toLong).toInt

  /** Count-Min sketch (Cormode & Muthukrishnan 2005) over a hashed
    * key column: `depth` rows × `width` counters; every occurrence
    * increments one cell per row, a point query reads the MINIMUM of
    * its cells. Guarantees (deterministic for fixed hashes):
    * estimate ≥ true count always (cells only over-count), and
    * estimate ≤ true + 2N/width with probability ≥ 1 − 2^(−depth)
    * per key. The MERGEABLE frequency sketch for unbounded key
    * domains: partials are element-wise sums (map-side combined, one
    * depth×width buffer per partition per group), so a 100 TB
    * frequency profile travels as a few KB per partition where the
    * exact groupBy would shuffle every distinct key. Complements
    * [[TopKSketch]]: MG answers "which keys are heavy", CMS answers
    * "how often does THIS key occur" for any key, without storing
    * keys at all. */
  final class CountMinSketch(depth: Int, width: Int)
      extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(depth > 0 && depth <= 16, s"depth must be in 1..16, got $depth")
    require(width > 0, s"width must be > 0, got $width")
    override def zero: Array[Long] = new Array[Long](depth * width)
    override def reduce(b: Array[Long], keyHash: Long): Array[Long] = {
      var r = 0
      while (r < depth) {
        b(r * width + cmsIdx(keyHash, r, width)) += 1L
        r += 1
      }
      b
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(r: Array[Long]): Seq[Long] = r.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** `countMin(xxhash64(col))` handle inside `.agg(...)`. */
  def countMin(depth: Int, width: Int): UserDefinedFunction =
    udaf(new CountMinSketch(depth, width))

  /** Point query against a built sketch (driver- or executor-side):
    * min over the key's `depth` cells. */
  def cmsEstimate(sketch: Seq[Long], depth: Int, width: Int,
      keyHash: Long): Long = {
    require(sketch.length == depth * width,
      s"cmsEstimate: sketch length ${sketch.length} != $depth×$width")
    var est = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + cmsIdx(keyHash, r, width))
      if (c < est) est = c
      r += 1
    }
    est
  }
}
