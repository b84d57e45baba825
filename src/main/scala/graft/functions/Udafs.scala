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
}
