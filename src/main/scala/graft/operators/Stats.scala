package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution diagnostics and robust-statistics transforms.
  *
  * [[keyHistogram]] is the operational answer to "is this join/agg key
  * skewed?" — the question every 100 TB pipeline asks before choosing
  * between a plain, salted ([[Pipe.joinSalted]]) or AQE-skew join.
  * [[winsorize]] clips a numeric column to per-group discrete
  * percentile bounds — the standard outlier guard before training-data
  * statistics.
  */
object Stats {

  /** Per-key frequency histogram with share-of-total and rank: the
    * top-`topN` heaviest keys, their counts, and the exact fraction of
    * all rows they hold.
    *
    * Scale shape: one map-side-combined groupBy over the keys (the only
    * pass over the data); the total and the global rank are computed on
    * the COUNTS relation, whose size is the number of distinct keys —
    * the single-partition window ranking touches that small relation,
    * never the input. Share = count/total is one correctly-rounded IEEE
    * division (hash-stable across engines).
    *
    * @return key columns + (n, share, rnk), rnk 1..topN by (n desc,
    *         keys asc — fully deterministic)
    */
  def keyHistogram(df: DataFrame, keys: Seq[String], topN: Int): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    require(topN > 0, "topN must be > 0")
    // non-key input columns don't survive the groupBy, so only the key
    // names can collide with the output columns
    Seq("n", "share", "rnk", "__total").foreach { c =>
      require(!keys.contains(c), s"key column may not be named $c")
    }
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
    val withTotal = counts.crossJoin(
      broadcast(counts.agg(sum(col("n")).as("__total"))))
    val ordering = col("n").desc +: keys.map(k => col(k).asc)
    withTotal
      .withColumn("share", col("n").cast("double") / col("__total").cast("double"))
      .withColumn("rnk", row_number().over(Window.orderBy(ordering: _*)))
      .filter(col("rnk") <= topN)
      .drop("__total")
  }

  /** Winsorize: clip `valueCol` to its group's [pLo, pHi] DISCRETE
    * percentile values (the bound is always an actual data value —
    * exact, no interpolation, so decimal inputs stay hash-exact).
    *
    * Bound definition: the value at 1-based rank ceil(p·n) of the
    * group's ascending value order (n = group size, rank floored at 1)
    * — values only, so equal-value tie order can't change the bound.
    *
    * Scale shape: one shuffle by group for the rank/count windows; the
    * per-group bounds relation (2 values per group) broadcasts back
    * onto the same partitioning. A group's rows must fit a partition's
    * window sort — same contract as any per-group window function;
    * for the degenerate one-giant-group case, sample-based
    * approxQuantile is the escape hatch.
    *
    * @return input columns + (lo, hi, clipped)
    */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pLo <= 1 && pHi >= 0 && pHi <= 1 && pLo <= pHi,
      s"need 0 <= pLo <= pHi <= 1, got ($pLo, $pHi)")
    Seq("lo", "hi", "clipped", "__g").foreach { n =>
      require(!df.columns.contains(n),
        s"input already has a column named $n")
    }
    val ranked = df
      .filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
      .withColumn("__r", row_number().over(
        Window.partitionBy(col("__g")).orderBy(col("__v").asc)))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
    def rankFor(p: Double): Column =
      greatest(ceil(lit(p) * col("__n")).cast("long"), lit(1L))
    val bounds = ranked
      .groupBy(col("__g"))
      .agg(
        min(when(col("__r") === rankFor(pLo), col("__v"))).as("lo"),
        min(when(col("__r") === rankFor(pHi), col("__v"))).as("hi"))
    // null-safe condition: bounds ARE computed for the NULL group key
    // (groupBy treats NULL as a group), so its rows must join back too —
    // with === they would silently pass through unclipped with NULL lo/hi
    df.join(broadcast(bounds), df(groupCol) <=> bounds("__g"), "left")
      .drop("__g")
      .withColumn("clipped",
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("lo")), col("hi"))))
  }
}
