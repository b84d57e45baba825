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
}
