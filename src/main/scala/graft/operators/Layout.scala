package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical data layout for scan efficiency at scale: range-clustered
  * writes (so parquet row-group min/max statistics prune range
  * predicates) and small-file compaction.
  *
  * The reference's only layout tool is the in-memory sorted Index
  * (reference csvplus.go:707-738 — sort once, binary-search many);
  * this is its durable, distributed analogue: the sort lives in the
  * FILES, and "binary search" becomes footer-statistics pruning that
  * skips whole row groups / files without reading them.
  */
object Layout {

  /** Write `df` as parquet range-clustered on `clusterCols`:
    * `repartitionByRange` makes each output file own a disjoint key
    * range, `sortWithinPartitions` orders rows inside the file so
    * every parquet row group covers a narrow min/max band. A later
    * range or point predicate on the cluster columns then prunes at
    * THREE levels — partition-file statistics, row-group statistics,
    * page statistics — turning a full scan into a handful of reads.
    *
    * This is the single-dimension (or lexicographic multi-column)
    * clustering; it concentrates pruning power on the LEADING column.
    * For genuinely multi-dimensional workloads interleave a Z-value
    * column and cluster on that instead.
    *
    * `numFiles` sizes the output: at 100 TB aim for ~0.5-1 GB per
    * file (the shuffle is one pass; range boundaries come from a
    * lightweight sample driven by the range partitioner).
    */
  def writeClustered(
      df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    require(numFiles > 0, "numFiles must be > 0")
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Z-order (Morton) value over `cols`: the low `bits` bits of each
    * column interleaved — a lexicographic sort on this single value
    * is a space-filling-curve sort balanced across ALL the columns,
    * where [[writeClustered]]'s lexicographic multi-column clustering
    * concentrates pruning power on the leading column only. Columns
    * must be non-negative integers (offset/bucket upstream);
    * cols.size × bits ≤ 63. Native codegen'd expression. */
  def zValue(cols: Seq[org.apache.spark.sql.Column], bits: Int = 16)
      : org.apache.spark.sql.Column = {
    require(cols.nonEmpty, "zValue needs at least one column")
    graft.plans.native.zValue(array(cols.map(_.cast("long")): _*), bits)
  }

  /** Write `df` parquet Z-ORDER-clustered on `clusterCols`: rows are
    * range-partitioned and sorted by the interleaved Z-value, so a
    * predicate on ANY clustered column maps to a bounded set of
    * Z-ranges and parquet min/max statistics on the ORIGINAL columns
    * prune most files/row groups — the multi-dimensional analogue of
    * [[writeClustered]] (Delta/Iceberg expose the same operation as
    * OPTIMIZE ZORDER BY). The Z column is computed for the shuffle
    * and sort, then dropped: the layout benefit lives in file
    * organization, not in a stored column. Values must be
    * non-negative; pass `bits` per the columns' value range. */
  def writeZOrdered(
      df: DataFrame, path: String, clusterCols: Seq[String],
      numFiles: Int, bits: Int = 16): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    require(numFiles > 0, "numFiles must be > 0")
    df.withColumn("__graft_z", zValue(clusterCols.map(col), bits))
      .repartitionByRange(numFiles, col("__graft_z"))
      .sortWithinPartitions(col("__graft_z"))
      .drop("__graft_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Compact a directory of many small parquet files into `numFiles`
    * larger ones WITHOUT a shuffle: `coalesce` glues existing
    * partitions together, preserving any clustering the data already
    * has file-locally. The standard answer to the small-files problem
    * a streaming sink or over-parallel write leaves behind — metadata
    * pressure and per-file open cost dominate scans long before data
    * volume does. */
  def compact(df: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles > 0, "numFiles must be > 0")
    df.coalesce(numFiles).write.mode("overwrite").parquet(path)
  }

  /** [[writeClustered]] committed through the [[Store]] layer: the
    * same range-clustered layout, with the manifest recording each
    * file's `[min,max]` for the cluster (and every other top-level
    * int/long) column — so range/point pruning moves from parquet
    * footer statistics (paid per query, per file OPEN) to MANIFEST
    * statistics evaluated driver-side before the scan is planned, with
    * zero file opens, and the relation gains the store's atomic
    * generation maintenance (`Store.append`/`rewrite`/
    * `rewriteWithRetry` for compaction without readers ever seeing a
    * half-written state). Read it back with [[Store.read]];
    * `numFiles = 0` lets the planner size the files (AQE advisory
    * bytes). */
  def writeClusteredStore(
      df: DataFrame, relRoot: String, clusterCols: Seq[String],
      numFiles: Int = 0): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    Store.create(df, relRoot, clusterBy = clusterCols, numFiles = numFiles)
  }

  /** [[writeZOrdered]] committed through the [[Store]] layer: rows are
    * clustered by the interleaved Z-value, so each file covers a small
    * RECTANGLE of the key space and the manifest's per-file `[min,max]`
    * on EVERY original column is narrow — a predicate on ANY clustered
    * dimension prunes files driver-side, no file opens, which is the
    * multi-dimensional file-skipping Iceberg/Delta get from Z-ordered
    * stats. Unlike [[writeZOrdered]] the Z column IS stored (as
    * `__graft_z`): 8 bytes/row buys maintenance rewrites
    * ([[Store.rewriteWithRetry]] compactions) that re-cluster on it
    * without recomputing the interleave, and keeps the layout contract
    * inspectable. Values must be non-negative ints; `bits` per the
    * columns' range. */
  def writeZOrderedStore(
      df: DataFrame, relRoot: String, clusterCols: Seq[String],
      numFiles: Int = 0, bits: Int = 16): Unit = {
    require(clusterCols.nonEmpty, "clusterCols must not be empty")
    val withZ =
      df.withColumn("__graft_z", zValue(clusterCols.map(col), bits))
    Store.create(withZ, relRoot, clusterBy = Seq("__graft_z"),
      numFiles = numFiles,
      splits = Some(zSnappedSplits(withZ, clusterCols.size)))
  }

  /** Quantile split points over the Z column, SNAPPED to the curve's
    * own block boundaries: a Z-curve's natural units are multiples of
    * 2^(dims·j) — whole 2^j-wide hyper-rectangles — so each split is
    * moved to the coarsest such boundary within half an ideal file's
    * Z-width. Files then cover WHOLE rectangles (their per-dimension
    * [min,max] is as tight as the row count allows) instead of
    * rectangles clipped one row past a boundary, which is what raw
    * quantiles (or the range partitioner's sample) produce and what
    * costs an extra touched file per slab query. One narrow aggregate
    * over the Z column; no sampling pass over the full rows. */
  private def zSnappedSplits(
      withZ: DataFrame, dims: Int): Store.RangeSplits =
    Store.RangeSplits { n =>
      if (n <= 1) (lit(0), 1)
      else {
        val ps = (1 until n).map(_.toDouble / n).toArray
        // accuracy max(2000, 4n) (rank error ≤ N/accuracy): split
        // points only need to land within the snap tolerance of half an
        // ideal file's Z-width — the default 10000 pays a visibly
        // costlier QuantileSummaries compress per row for precision the
        // snap immediately rounds away. Scaling with the split count
        // keeps rank error well under one ideal file's row width
        // (N/(4n) < N/n), so adjacent quantiles cannot collide and be
        // silently dropped by the downstream .distinct when n
        // approaches the fixed accuracy (ADVICE r15).
        val row = withZ
          .select(
            percentile_approx(col("__graft_z"), lit(ps),
              lit(math.max(2000, 4 * n))).as("q"),
            min(col("__graft_z")).as("lo"), max(col("__graft_z")).as("hi"))
          .head()
        if (row.isNullAt(0)) (lit(0), 1)
        else {
          val raw = row.getSeq[Long](0)
          val tol = math.max(1L, (row.getLong(2) - row.getLong(1)) / (2L * n))
          def snap(s: Long): Long = {
            var j = 62 / dims
            while (j >= 1) {
              val a = 1L << (dims * j)
              if (a > 0) {
                val snapped = math.round(s.toDouble / a) * a
                if (math.abs(snapped - s) <= tol) return snapped
              }
              j -= 1
            }
            s
          }
          val pts = raw.map(snap).distinct.sorted.toArray
          if (pts.isEmpty) (lit(0), 1)
          else Store.pointSplits(col("__graft_z"), pts).pid(n)
        }
      }
    }
}
