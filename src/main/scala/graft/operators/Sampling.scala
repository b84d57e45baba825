package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / batching operators for training-data pipelines. */
object Sampling {

  private def tempCol(df: DataFrame, name: String): String = {
    require(!df.columns.contains(name),
      s"input already has a column named $name")
    name
  }

  /** Deterministic stratified sample: the k rows per group with the
    * smallest md5(id) — reproducible across runs, engines and cluster
    * sizes (no RNG in the plan; md5 order is uniform-ish and stable).
    * One shuffle on the group key; rank stays inside codegen. */
  def deterministicSample(df: DataFrame, groupCols: Seq[String],
                          idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val rn = tempCol(df, "__graft_rn")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Deterministic per-domain downsampling (domain mixing): keep each
    * row with probability `rates(domain)` (else `defaultRate`), decided
    * by an md5-derived uniform on the row id — no RNG in the plan, so
    * the kept set is reproducible across runs, engines and cluster
    * sizes, and is a pure per-row filter (no shuffle at all; the scan
    * parallelism is the only thing that matters at 100 TB).
    * The uniform is the first 8 md5 hex digits scaled by 2⁻³²∈[0,1). */
  def weightedKeep(df: DataFrame, domainCol: String, idCol: String,
                   rates: Map[String, Double],
                   defaultRate: Double = 1.0): DataFrame = {
    (rates.values ++ Seq(defaultRate)).foreach(r =>
      require(r >= 0 && r <= 1, s"rate out of [0,1]: $r"))
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296d)
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (dom, r)) =>
      when(col(domainCol) === dom, lit(r)).otherwise(acc)
    }
    df.filter(u < rate)
  }

  /** Deterministic train/val/test assignment: each row gets a split
    * label decided by its md5-derived uniform against the cumulative
    * weight boundaries — the leak-proof way to split training corpora
    * (membership is a pure function of the id: re-runs, engine changes
    * and late-arriving data can never move a document across splits,
    * which WOULD leak eval data into training).
    *
    * Pure per-row projection — no shuffle, no RNG; at 100 TB this is
    * scan-speed. Weights are normalized to sum 1; boundaries are
    * half-open [lo, hi) so every non-null id gets exactly one label.
    * A NULL id gets a NULL label — "no id" must surface as "no split",
    * never silently land in one bucket (an eval split quietly absorbing
    * every unkeyed row is a data leak); filter or fail upstream.
    *
    * @param splits ordered (label, weight); e.g. Seq(("train", 0.98),
    *               ("val", 0.01), ("test", 0.01))
    */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)],
                  outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "splits must not be empty")
    splits.foreach { case (_, w) =>
      require(w > 0, s"split weights must be positive, got $w") }
    require(splits.map(_._1).distinct.size == splits.size,
      "split labels must be unique")
    tempCol(df, outCol)
    val total = splits.map(_._2).sum
    val u = conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296d)
    // fold from the LAST split backwards so earlier boundaries win
    val cumUpper = splits.map(_._2).scanLeft(0.0)(_ + _).tail.map(_ / total)
    val labelled = splits.zip(cumUpper).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((label, _), hi)) =>
        when(u < hi, lit(label)).otherwise(acc)
      }
    df.withColumn(outCol,
      when(col(idCol).isNull, lit(null).cast("string")).otherwise(labelled))
  }

  /** Token-budget domain mixing — the pretraining mixture knob
    * expressed in TOKENS, not documents: each domain keeps documents
    * in deterministic md5 order until its token budget fills (the
    * first document that would not fit, and everything after it, is
    * dropped; a document is kept iff the tokens BEFORE it in its
    * domain's order are under budget, so one oversized early document
    * cannot starve the domain of its first pick). [[weightedKeep]]
    * mixes by document RATE; this mixes by token SHARE, which is what
    * a training recipe actually specifies.
    *
    * Scale shape: one per-domain window over md5 order (distributes
    * across domains; within a domain the running sum is the same
    * prefix-scan every pack/batch operator here uses). No RNG, no
    * global sort — assignment is a pure function of (id, domain),
    * reproducible across engines and re-runs.
    *
    * @param budgets token budget per domain; domains absent from the
    *                map get `defaultBudget` (0 = drop unlisted
    *                domains entirely)
    * @return the kept rows, original columns unchanged
    */
  def tokenBudgetMix(
      df: DataFrame, domainCol: String, idCol: String, tokensCol: String,
      budgets: Map[String, Long], defaultBudget: Long = 0L): DataFrame = {
    require(budgets.values.forall(_ >= 0) && defaultBudget >= 0,
      "token budgets must be non-negative")
    val budgetExpr = budgets.foldLeft(lit(defaultBudget)) {
      case (acc, (dom, b)) =>
        when(col(domainCol) === dom, lit(b)).otherwise(acc)
    }
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("__graft_prior",
        coalesce(sum(col(tokensCol).cast("long")).over(ord), lit(0L)))
      .filter(col("__graft_prior") < budgetExpr)
      .drop("__graft_prior")
  }

  /** LEAKAGE-SAFE [[splitByHash]]: assignment is keyed on a GROUP
    * representative instead of the row id, so an entire group — in
    * practice a near-duplicate component from
    * [[Dedup.connectedComponents]] — lands in ONE split. Splitting by
    * row id leaks: two near-identical documents hash independently
    * and routinely straddle train/test, which inflates eval scores
    * exactly the way benchmark contamination does (dedup-then-split
    * is the standard fix; this keys the split ON the dedup structure
    * so no document is dropped).
    *
    * `groups` maps member id → group key (rows absent from it are
    * singletons and key on their own id, matching the min-label CC
    * convention where a singleton's component IS its id). Broadcast
    * or shuffle of the groups table only — the corpus keeps its
    * partitioning; assignment itself stays the pure md5 function of
    * the key, reproducible across engines and re-runs. */
  def splitByHashGrouped(
      df: DataFrame, idCol: String,
      groups: DataFrame, groupIdCol: String, groupKeyCol: String,
      splits: Seq[(String, Double)], outCol: String = "split"): DataFrame = {
    val g = groups.select(col(groupIdCol).as(idCol),
      col(groupKeyCol).as("__graft_gkey"))
    val keyed = df.join(g, Seq(idCol), "left")
      .withColumn("__graft_skey",
        coalesce(col("__graft_gkey"), col(idCol)))
    splitByHash(keyed, "__graft_skey", splits, outCol)
      .drop("__graft_gkey", "__graft_skey")
  }

  /** Keep the top `fraction` of each group by score — the
    * quality-quantile filter (FineWeb-style curation keeps the best
    * q% per dump/domain rather than a global absolute threshold,
    * which one strong domain would otherwise monopolize). Keeps rows
    * ranked ≤ ⌈fraction · |group|⌉ by (score desc, tieCol asc) — the
    * ceiling guarantees every non-empty group keeps at least one row,
    * and the explicit tie column makes the cut deterministic when
    * scores collide (discrete-valued quality scores collide often).
    * Two windows over the same group partitioning — one shuffle. */
  def keepTopFraction(
      df: DataFrame, groupCol: String, scoreCol: String, tieCol: String,
      fraction: Double): DataFrame = {
    require(fraction > 0 && fraction <= 1,
      s"fraction must be in (0, 1], got $fraction")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val cnt = org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))
    df.withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_n", count(lit(1)).over(cnt))
      .filter(col("__graft_rn") <=
        ceil(col("__graft_n").cast("double") * lit(fraction)))
      .drop("__graft_rn", "__graft_n")
  }

  /** Deterministic round-robin domain interleaving — the data-loader
    * ORDER for mixed-domain training: position r·nDomains + d for the
    * r-th document (md5 order) of domain d, so consecutive positions
    * cycle through domains and no domain forms long runs (which bias
    * gradient batches exactly like unshuffled data). A pure function
    * of (id, domain): reproducible, resumable, and computed WITHOUT a
    * global sort — one per-domain window plus a broadcast of the
    * (tiny) domain list; the materialized order is then a clustered
    * write on `outCol` ([[Layout.writeClustered]]).
    *
    * Positions are dense per domain but the interleave is exhausted
    * domains' slots stay empty (a domain smaller than the largest
    * stops contributing; consumers read position order, not
    * contiguity — same contract as a strided sampler). */
  def interleaveByDomain(
      df: DataFrame, domainCol: String, idCol: String,
      outCol: String = "global_pos", maxDomains: Int = 100000): DataFrame = {
    tempCol(df, outCol)
    Seq("__dom", "__didx").foreach { n =>
      require(!df.columns.contains(n),
        s"input already has a column named $n")
    }
    // the domain list is collected to the driver — only sound for a
    // DOMAIN-cardinality column. A high-cardinality key (URL, doc id)
    // must fail loudly here, not OOM the driver: probe one row beyond
    // the cap instead of collecting everything first (the
    // [[temperatureMix]] guard).
    val domains = df.select(col(domainCol).cast("string").as("__dom"))
      .filter(col("__dom").isNotNull)
      .distinct()
      .limit(maxDomains + 1)
      .collect().map(_.getString(0)).sorted
    require(domains.nonEmpty, "interleaveByDomain: no non-null domains")
    require(domains.length <= maxDomains,
      s"interleaveByDomain saw more than $maxDomains distinct '$domainCol' " +
        "values — this operator drives a driver-held domain index and is " +
        "meant for domain-cardinality keys; raise maxDomains only if the " +
        "driver can hold the index")
    val nd = domains.length
    // the domain index joins in as a BROADCAST relation, not a
    // per-domain when-chain: a chain of `nd` cases is O(nd) expression
    // nodes evaluated per row — at domain cardinalities in the
    // thousands that bloats the plan and the codegen; the broadcast
    // hash join is O(1) per row at any guarded cardinality
    val spark = df.sparkSession
    import scala.jdk.CollectionConverters._
    val idx = spark.createDataFrame(
      domains.zipWithIndex.map { case (d, i) =>
        org.apache.spark.sql.Row(d, i.toLong)
      }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__dom",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__didx",
          org.apache.spark.sql.types.LongType))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.join(broadcast(idx),
        col(domainCol).cast("string") === col("__dom"), "left")
      .withColumn(outCol,
        (row_number().over(w).cast("long") - 1L) * nd + col("__didx"))
      .drop("__dom", "__didx")
  }

  /** Equal-size length buckets — SQL `ntile(n) OVER (ORDER BY orderCol,
    * tieCol)` semantics WITHOUT the global single-partition window
    * (which funnels every row through one task — the classic 100 TB
    * scale-killer).
    *
    * Shape: (1) per-value counts (`groupBy(orderCol)` — map-side
    * combined, output is |distinct values| rows, not |rows|);
    * (2) exclusive prefix-sum + grand total over that SMALL table (its
    * windows are single-partition, but over the aggregate, which for a
    * length distribution is thousands of rows at any corpus size);
    * (3) broadcast the offsets back and rank WITHIN each value group by
    * `tieCol` — a window partitioned by the value, so it distributes;
    * (4) global rank = offset + within-rank, bucket = closed-form ntile
    * arithmetic (first N mod n buckets get one extra row).
    *
    * Exactly matches `ntile` output for non-null `orderCol` values (the
    * driver oracle pins this). A pathologically hot single value still
    * concentrates its within-value ranking on one key; if that is a
    * real risk, bucket ties don't matter and the tie rank can be salted.
    *
    * @return input columns + (`outCol`: int in [1, n])
    */
  def ntileBuckets(df: DataFrame, orderCol: String, tieCol: String,
                   n: Int, outCol: String = "bucket"): DataFrame = {
    require(n > 0, "n must be > 0")
    tempCol(df, outCol)
    val counts = df.groupBy(col(orderCol).as("__k"))
      .agg(count(lit(1)).as("__c"))
    val wPre = Window.orderBy(col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__c")).over(wPre), lit(0L)))
      .withColumn("__N", sum(col("__c")).over(wAll))
      .select(col("__k"), col("__off"), col("__N"))
    val rn = tempCol(df, "__graft_rn")
    val wIn = Window.partitionBy(col(orderCol)).orderBy(col(tieCol).asc)
    val ranked = df
      .withColumn(rn, row_number().over(wIn).cast("long"))
      .join(broadcast(offsets), col(orderCol) <=> col("__k"))
      .withColumn(rn, col("__off") + col(rn))
    // ntile(n) over N rows: q = N div n, rem = N mod n; the first rem
    // buckets hold q+1 rows, the rest q. All-integer (`div`, not `/` —
    // Spark's `/` is fractional) → engine-exact at any N. The ELSE
    // branch's `div q` is only reached when r > rem·(q+1), which
    // requires q ≥ 1, so the q=0 (N < n) case never divides by zero
    // (CASE evaluates lazily).
    val bucket = expr(
      s"""CASE WHEN `$rn` <= (__N % ${n}L) * ((__N div ${n}L) + 1L)
         |  THEN (`$rn` - 1L) div ((__N div ${n}L) + 1L) + 1L
         |  ELSE (__N % ${n}L)
         |       + (`$rn` - (__N % ${n}L) * ((__N div ${n}L) + 1L) - 1L)
         |         div (__N div ${n}L) + 1L
         |END""".stripMargin)
    ranked
      .withColumn(outCol, bucket.cast("int"))
      .drop(rn, "__k", "__off", "__N")
  }

  /** Cumulative-weight BANDING of rows into batches: batch_id =
    * exclusive-prefix-sum(weight) div budget, per group in `orderCol`
    * order. This is the scan-friendly (one window, no sequential state)
    * batching used for context-window packing — with approximate
    * semantics, stated precisely:
    *  - a batch's total may EXCEED the budget by up to one item's
    *    weight (the straddling item joins the earlier batch);
    *  - an item heavier than the budget shares its batch with the
    *    items immediately before it, then forces a gap;
    *  - batch ids within a group are increasing but may skip values.
    * For hard per-batch caps, post-process per batch (they are small)
    * or use a per-group sequential pass (`flatMapGroups`) — at the cost
    * of losing whole-stage codegen. Exact integer arithmetic (`div`),
    * so results are engine-exact at any cumulative weight. */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
                   weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val before = tempCol(df, "__graft_before")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(before,
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L)))
      .withColumn("batch_id", expr(s"$before div ${budget}L"))
      .drop(before)
  }

  /** Deterministic pseudo-random shard assignment for training-data
    * layout: every row gets a `shard` in [0, nShards) and a dense
    * `pos` within its shard, both fully determined by the id — the
    * "global shuffle then split into shards" step of a training
    * pipeline, with no RNG in the plan (reruns, engines and cluster
    * sizes all agree).
    *
    * The shuffle key is a Knuth multiplicative hash computed in exact
    * 64-bit integer arithmetic: `h = (id mod 2^31) · 2654435761 mod
    * 2^32` (the product is < 2^63, so it never overflows, and the
    * identical expression is computable in any SQL engine — unlike
    * xxhash/md5-prefix keys that need engine-specific hex plumbing).
    * Shards are `h mod nShards`; `pos` is the rank of `(h, id)` within
    * the shard.
    *
    * Scale shape: one hash-partitioned exchange on `shard` and one
    * window per shard — each shard is ranked by exactly the task that
    * will write it, which is the natural parallelism of sharded output
    * (nShards concurrent writers). No global sort, no global window,
    * no driver state. Pick nShards so a shard's rows fit one task
    * (100 TB / 4096 shards ≈ 25 GB — size accordingly).
    *
    * Contract: ids must be UNIQUE and non-null — a duplicated id ties
    * the (hash, id) order and makes `pos` run-dependent between the
    * copies; a null id hashes to null and collects in one null shard.
    * Dedup/filter upstream (the repo's other id-keyed operators share
    * this contract).
    *
    * @return input columns + (shard: int, pos: long)
    */
  /** Temperature-based domain mixing (the multilingual-corpus sampling
    * rule: pick domain d with probability ∝ share_d^α, α < 1 flattens
    * the head): selects exactly `total` documents (fewer only if a
    * flattened quota exceeds a domain's size) with per-domain quotas
    * allocated by largest-remainder rounding of `total·w_d / Σw`,
    * w_d = n_d^α. α is expressed as `1 / 2^sqrtTimes` — sqrt is the
    * ONE power function IEEE guarantees correctly rounded, so with
    * α ∈ {1, ½, ¼, …} the whole allocation (including tie-breaks) is
    * bit-reproducible on any engine; arbitrary-α `pow` is not.
    *
    * Within each domain, membership is the rank under the md5-derived
    * order — a pure function of the id, so re-runs and late data never
    * swap selected documents (the [[splitByHash]] leak-proofing
    * argument).
    *
    * Scale shape: the count table is domain-sized (a bounded driver
    * collect, like a vocabulary); selection is one per-domain window
    * rank — no global sort, no RNG.
    *
    * @return the selected rows of `df`, unchanged schema
    */
  def temperatureMix(
      df: DataFrame, domainCol: String, idCol: String,
      total: Long, sqrtTimes: Int, maxDomains: Int = 100000): DataFrame = {
    require(total >= 0, s"total must be >= 0, got $total")
    require(sqrtTimes >= 0 && sqrtTimes <= 6,
      s"sqrtTimes must be in [0, 6] (alpha = 1/2^k), got $sqrtTimes")
    // the count table is collected to the driver — that is only sound
    // for a DOMAIN-cardinality column. A high-cardinality key (URL,
    // doc id) must fail loudly here, not OOM the driver: probe one row
    // beyond the cap instead of counting everything first.
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol).cast("string").as("dom"))
      .agg(count(lit(1)).as("n"))
      .limit(maxDomains + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    require(counts.length <= maxDomains,
      s"temperatureMix saw more than $maxDomains distinct '$domainCol' " +
        "values — this operator drives a driver-held quota table and is " +
        "meant for domain-cardinality keys; raise maxDomains only if the " +
        "driver can hold the table")
    if (counts.isEmpty) return df.limit(0)
    // the exact arithmetic the SQL oracle replays: sqrt chain, the
    // Σw fold in domain-ascending order, (total·w)/W left-to-right
    val w = counts.map { case (d, n) =>
      (d, n, (0 until sqrtTimes).foldLeft(n.toDouble)((x, _) => math.sqrt(x)))
    }
    val bigW = w.foldLeft(0.0)((acc, x) => acc + x._3)
    val ideal = w.map { case (d, n, wd) => (d, n, total.toDouble * wd / bigW) }
    val based = ideal.map { case (d, n, i) =>
      (d, n, math.floor(i).toLong, i - math.floor(i))
    }
    val rem = total - based.map(_._3).sum
    val bump = based.sortBy { case (d, _, _, frac) => (-frac, d) }
      .zipWithIndex
      .map { case ((d, n, base, _), idx) =>
        d -> math.min(base + (if (idx < rem) 1L else 0L), n)
      }.toMap
    // the quota table joins in as a BROADCAST relation, not a
    // per-domain when-chain (the interleaveByDomain rationale: a
    // guarded-but-large domain count would otherwise bloat the plan
    // and codegen O(nDomains) per row; the hash join is O(1))
    Seq("__dom", "__quota").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a column named $c")
    }
    import scala.jdk.CollectionConverters._
    val quotaDf = df.sparkSession.createDataFrame(
      bump.toSeq.sortBy(_._1).map { case (d, q) =>
        org.apache.spark.sql.Row(d, q)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__dom",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("__quota",
          org.apache.spark.sql.types.LongType))))
    val rnk = row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col(domainCol))
        .orderBy(md5(col(idCol).cast("string")), col(idCol)))
    df.filter(col(domainCol).isNotNull)
      .join(broadcast(quotaDf),
        col(domainCol).cast("string") === col("__dom"))
      .withColumn("__graft_rnk", rnk)
      .filter(col("__graft_rnk") <= col("__quota"))
      .drop("__graft_rnk", "__dom", "__quota")
  }

  def shardAssign(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos"),
      "input already has a shard/pos column — rename it first " +
        "(shardAssign appends both)")
    val h = tempCol(df, "__graft_shard_hash")
    val w = Window.partitionBy(col("shard"))
      .orderBy(col(h).asc, col(idCol).asc)
    df.withColumn(h,
        pmod(pmod(col(idCol).cast("long"), lit(2147483648L)) *
          lit(2654435761L), lit(4294967296L)))
      .withColumn("shard", pmod(col(h), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w).cast("long") - 1L)
      .drop(h)
  }
}
