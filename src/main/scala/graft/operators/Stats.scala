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

  /** One-pass column profile: for each named column — row count, null
    * count, exact distinct count, and min/max of the STRING rendering
    * (one shared output type across heterogeneous columns; the caller
    * casts to a lexicographic-safe form first if numeric ordering
    * matters).
    *
    * Shape: columns are profiled in BATCHES of `colsPerScan` (default
    * 8). Within a batch, the columns stack into (col_name, value) rows
    * via one bounded explode — a ≤ colsPerScan Expand factor per scan —
    * then phase 1 is a map-side-combined groupBy on (col_name, value)
    * (the shuffle carries one row per distinct value per partition) and
    * phase 2 folds those into one profile row per column. Wide profiles
    * therefore issue ceil(ncols / colsPerScan) scans instead of one per
    * column (the r7-flagged linear job-launch overhead), while the
    * bounded batch keeps the stack far from the all-columns Expand that
    * doubled the ncols × nrows shuffle (the 3rd most expensive plan in
    * the r5 suite — do NOT revert to that). The per-value
    * pre-aggregation is the form that survives 100 TB: no row crosses
    * the wire twice, and a hot value collapses map-side.
    *
    * EMPTY input still yields one row per profiled column (n_rows = 0,
    * null min/max — the batch's name list is left-joined against the
    * aggregate, so a column missing from the data still reports) — the
    * more useful contract, pinned by ProfileLayoutSpec.
    *
    * @return (col_name, n_rows, n_nulls, n_distinct, min_v, max_v)
    */
  def profile(df: DataFrame, cols: Seq[String],
              colsPerScan: Int = 8): DataFrame = {
    require(cols.nonEmpty, "cols must not be empty")
    require(colsPerScan > 0, "colsPerScan must be > 0")
    import df.sparkSession.implicits._
    cols.grouped(colsPerScan).map { batch =>
      val stacked = df.select(explode(array(batch.map { c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))
      }: _*)).as("s"))
        .select(col("s.col_name").as("col_name"), col("s.v").as("v"))
      val agg = stacked
        .groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("col_name"))
        .agg(
          sum(col("cnt")).as("n_rows"),
          coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(col("v")).as("n_distinct"),
          min(col("v")).as("min_v"),
          max(col("v")).as("max_v"))
      batch.toDF("col_name").join(broadcast(agg), Seq("col_name"), "left")
        .select(col("col_name"),
          coalesce(col("n_rows"), lit(0L)).as("n_rows"),
          coalesce(col("n_nulls"), lit(0L)).as("n_nulls"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("min_v"), col("max_v"))
    }.reduce(_.unionAll(_))
  }

  /** Equi-width histogram of a numeric column: `nBins` bins spanning
    * [min, max], each output row = (bin, bin_lo, bin_hi, n). Empty bins
    * are absent (no row), bin `nBins-1` is closed on the right (the max
    * value lands in the last bin, not a phantom overflow bin).
    *
    * Every float step — width = (hi−lo)/nBins, bin = floor((v−lo)/width),
    * edges = lo + i·width — is a single correctly-rounded IEEE op, so
    * the histogram is bit-identical on any engine that evaluates the
    * same expressions (the hash-compare property). Degenerate all-equal
    * input (width 0) maps everything to bin 0.
    *
    * Shape: one tiny min/max aggregate broadcast back onto the scan,
    * then one map-side-combined groupBy on the bin id — two passes over
    * the data, shuffle bounded by nBins.
    */
  def numericHistogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins > 0, "nBins must be > 0")
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast("double").as("__v"))
    val mm = vals.agg(min(col("__v")).as("__lo"), max(col("__v")).as("__hi"))
    val width = (col("__hi") - col("__lo")) / lit(nBins.toDouble)
    vals.crossJoin(broadcast(mm))
      .withColumn("bin",
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(floor((col("__v") - col("__lo")) / width),
            lit((nBins - 1).toLong))))
      .groupBy(col("bin"), col("__lo"), col("__hi"))
      .agg(count(lit(1)).as("n"))
      .select(col("bin"),
        (col("__lo") + col("bin") * width).as("bin_lo"),
        (col("__lo") + (col("bin") + lit(1L)) * width).as("bin_hi"),
        col("n"))
  }

  /** Median-absolute-deviation outlier flags, per group: a row is an
    * outlier when |v − median| > k·mad, with median and mad both the
    * DISCRETE per-group order statistic at rank ceil(n/2) (actual data
    * values — exact on decimal inputs, same bound rule as
    * [[winsorize]]). The classic robust alternative to z-scores: one
    * extreme value shifts a mean/stddev fence, but not this one.
    *
    * The comparison is evaluated in double (dev > k·mad after one cast
    * each) — correctly-rounded and engine-independent given the same
    * expression; with ≤2-decimal inputs the gap between distinct
    * thresholds (0.01) is astronomically wider than a double ulp, so
    * the flag is hash-stable.
    *
    * Scale shape: two window/aggregate rounds keyed by group (ranks for
    * the median, then ranks for the deviation median), each bounds-
    * relation broadcast back — same contract as [[winsorize]].
    *
    * @return input columns + (med, mad, is_outlier); NULL values get
    *         NULL flags
    */
  def madOutliers(
      df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, "k must be > 0")
    Seq("med", "mad", "is_outlier", "__g", "__dev").foreach { n =>
      require(!df.columns.contains(n),
        s"input already has a column named $n")
    }
    def discreteMedian(in: DataFrame, vCol: String): DataFrame = {
      val ranked = in
        .withColumn("__r", row_number().over(
          Window.partitionBy(col("__g")).orderBy(col(vCol).asc)))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(col("__g"))))
      ranked.groupBy(col("__g")).agg(
        min(when(col("__r") ===
          greatest(ceil(lit(0.5) * col("__n")).cast("long"), lit(1L)),
          col(vCol))).as("__m"))
    }
    val vals = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).as("__g"), col(valueCol).as("__v"))
    val med = discreteMedian(vals, "__v")
      .select(col("__g"), col("__m").as("med"))
    // every internal group join must be null-safe too — a NULL group
    // key is a real group (same reasoning as the final bounds join)
    val devs = vals
      .join(broadcast(med.withColumnRenamed("__g", "__g2")),
        col("__g") <=> col("__g2"))
      .drop("__g2")
      .withColumn("__dev", abs(col("__v") - col("med")))
    val mad = discreteMedian(devs, "__dev")
      .select(col("__g"), col("__m").as("mad"))
    val bounds = med
      .join(mad.withColumnRenamed("__g", "__g2"), col("__g") <=> col("__g2"))
      .drop("__g2")
    df.join(broadcast(bounds), df(groupCol) <=> bounds("__g"), "left")
      .drop("__g")
      .withColumn("is_outlier",
        when(col(valueCol).isNull, lit(null).cast("boolean"))
          .otherwise(
            abs(col(valueCol) - col("med")).cast("double") >
              lit(k) * col("mad").cast("double")))
  }

  /** Per-group Pearson correlation with EXACT distributed moments: the
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are decimal
    * sums — associative, overflow-checked, and independent of partition
    * count or merge order — and only the closing formula
    * (n·Σxy − Σx·Σy) / (√(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²))
    * drops to double, where every step is one correctly-rounded IEEE
    * op. The result is therefore bit-identical on ANY engine given the
    * same inputs — unlike a running-covariance implementation (Welford/
    * `corr()`), whose float accumulation order varies with partitioning.
    *
    * Inputs should be decimal (or exactly-representable) — the moment
    * products square the scale, so give the cast headroom:
    * decimal(s,2) inputs need Σx² precision ≥ 2s+rows-digits.
    *
    * Rows where either value is NULL are excluded (pairwise-complete,
    * same as SQL `corr`). Groups with zero variance on either side
    * return NULL (division by zero → NULL in both Spark and DuckDB
    * non-ANSI... here guarded explicitly with `when`).
    *
    * One map-side-combined shuffle keyed by group; output is one row
    * per group.
    *
    * @return (`groupCol`, n, corr)
    */
  def pearson(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol)
    val y = col(yCol)
    val m = df.filter(x.isNotNull && y.isNotNull)
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"), sum(y * y).as("syy"))
    val nD = col("n").cast("double")
    val cov = nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val vx = nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val vy = nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    m.select(col(groupCol), col("n"),
      when(vx > 0d && vy > 0d, cov / (sqrt(vx) * sqrt(vy)))
        .otherwise(lit(null).cast("double")).as("corr"))
  }

  /** Two-sample Kolmogorov–Smirnov distance per group, in EXACT
    * rational arithmetic — the distribution-drift monitor for snapshot
    * pairs (old vs new crawl, batch vs batch): D = max_x |F_A(x) −
    * F_B(x)| computed as `max |i·m − j·n|` over the merged sample
    * (i, j = cumulative counts, n, m = sample sizes), so the statistic
    * is bit-reproducible on any engine; the single final division to a
    * double is IEEE-exact. Rows where `sideCol` is true form sample B.
    * Groups with an empty side are omitted (D is undefined there).
    *
    * Scale shape: one map-side-combined `groupBy(group, value)` (ties
    * collapse before any sort), one window sorted WITHIN each group
    * (distributed across groups — no global sort), one final groupBy
    * max. Skewed group sizes parallelize per group like any windowed
    * aggregation.
    *
    * @return (group, n_a, n_b, d_num, d) with d = d_num / (n_a·n_b)
    */
  def ksDrift(
      df: DataFrame, groupCol: String, valueCol: String,
      sideCol: Column): DataFrame = {
    val perValue = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"), col(valueCol).as("v"))
      .agg(
        sum(when(sideCol, 0L).otherwise(1L)).as("ca"),
        sum(when(sideCol, 1L).otherwise(0L)).as("cb"))
    val w = Window.partitionBy(col("grp")).orderBy(col("v"))
    val wAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // both windows share the grp partitioning — one exchange, reused
    val cum = perValue.select(col("grp"),
      sum(col("ca")).over(w).as("ia"),
      sum(col("cb")).over(w).as("jb"),
      sum(col("ca")).over(wAll).as("n_a"),
      sum(col("cb")).over(wAll).as("n_b"))
    cum
      .groupBy(col("grp"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        max(abs(col("ia") * col("n_b") - col("jb") * col("n_a"))).as("d_num"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
      .select(col("grp").as(groupCol), col("n_a"), col("n_b"), col("d_num"),
        (col("d_num").cast("double") /
          (col("n_a") * col("n_b")).cast("double")).as("d"))
  }

  /** Per-(group, bin, side) histogram counts on a fixed [lo, hi) grid
    * with clamped edge bins — the INCREMENTALLY-AGGREGATABLE half of
    * [[histDrift]] (state is one row per occupied (group, bin), so the
    * same aggregation runs as a bounded-state streaming query; see
    * EventStreams.histDriftCountsStreamed).
    *
    * @return (grp, bin, ca, cb)
    */
  def histDriftCounts(
      df: DataFrame, groupCol: String, valueCol: String, sideCol: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo,
      s"need nBins >= 1 and hi > lo, got nBins=$nBins lo=$lo hi=$hi")
    val width = (hi - lo) / nBins
    val bin = least(greatest(
      floor((col(valueCol).cast("double") - lit(lo)) / lit(width)), lit(0d)),
      lit((nBins - 1).toDouble)).cast("int")
    // NaN is excluded EXPLICITLY: floor(NaN) stays NaN through the
    // clamp, and NaN→int is engine-divergent (Spark 0, DuckDB error) —
    // a poisoned value must not silently land in bin 0
    df.filter(col(valueCol).isNotNull && !isnan(col(valueCol).cast("double")))
      .groupBy(col(groupCol).as("grp"), bin.as("bin"))
      .agg(
        sum(when(sideCol, 0L).otherwise(1L)).as("ca"),
        sum(when(sideCol, 1L).otherwise(0L)).as("cb"))
  }

  /** Finalize [[histDriftCounts]] into a per-group χ² drift score —
    * runs equally on the batch counts or on a streaming query's
    * materialized state. Exact-arithmetic contract: with per-group
    * totals nₐ, n_b, each bin contributes
    * `(ca·n_b − cb·nₐ)² / ((nₐ·n_b) · (ca·n_b + cb·nₐ))`
    * (the proportion-difference χ² with every subtraction exact in
    * integers), and the bin terms are summed IN BIN ORDER, so the
    * score is bit-reproducible on any engine. Groups with an empty
    * side are omitted. */
  def finalizeHistDrift(counts: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    // totals via a whole-partition window, NOT a self-join: one
    // exchange on grp, and it stays valid on a streaming memory-sink
    // view (whose self-join trips Spark's attribute dedup)
    val wAll = Window.partitionBy(col("grp"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withTot = counts
      .select(col("grp"), col("bin"), col("ca"), col("cb"),
        sum(col("ca")).over(wAll).as("n_a"),
        sum(col("cb")).over(wAll).as("n_b"))
      .filter(col("n_a") > 0L && col("n_b") > 0L)
    val diff = col("ca").cast(dec) * col("n_b").cast(dec) -
      col("cb").cast(dec) * col("n_a").cast(dec)
    // every product stays exact in DECIMAL(38,0); only the two final
    // factors and the division are floating-point (each one correctly
    // rounded, so the term is bit-deterministic)
    val term = (diff * diff).cast("double") /
      ((col("n_a").cast(dec) * col("n_b").cast(dec)).cast("double") *
        (col("ca").cast(dec) * col("n_b").cast(dec) +
          col("cb").cast(dec) * col("n_a").cast(dec)).cast("double"))
    withTot
      .select(col("grp"), col("n_a"), col("n_b"), col("bin"), term.as("term"))
      .groupBy(col("grp"))
      .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
        count(lit(1)).as("n_bins_hit"),
        aggregate(sort_array(collect_list(struct(col("bin"), col("term")))),
          lit(0d), (acc, x) => acc + x.getField("term")).as("chi2"))
  }

  /** Binned-histogram distribution drift per group (χ² distance
    * between the side-A and side-B bin proportions) — the
    * streaming-friendly companion of [[ksDrift]]: KS needs the full
    * order statistics, the histogram form needs only (group, bin)
    * counts, which is exactly what a watermark-free streaming
    * aggregation can maintain with bounded state.
    *
    * @return (group, n_a, n_b, n_bins_hit, chi2)
    */
  def histDrift(
      df: DataFrame, groupCol: String, valueCol: String, sideCol: Column,
      lo: Double, hi: Double, nBins: Int): DataFrame =
    finalizeHistDrift(
      histDriftCounts(df, groupCol, valueCol, sideCol, lo, hi, nBins))
      .select(col("grp").as(groupCol), col("n_a"), col("n_b"),
        col("n_bins_hit"), col("chi2"))
}
