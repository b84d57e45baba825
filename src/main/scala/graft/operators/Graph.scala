package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics (PageRank) in DETERMINISTIC fixed-point
  * arithmetic.
  *
  * Why fixed-point: float PageRank is summation-order-dependent — two
  * runs (or two engines) produce last-ulp-different ranks, which makes
  * results non-reproducible and un-oracle-able. Here rank mass is an
  * integer multiple of 1/`scale`, every step is integer add / multiply
  * / floor-divide, so the result is bit-identical on ANY engine and
  * ANY partitioning: floor division is applied per-edge BEFORE the
  * contribution sum, and integer addition is associative. The rounding
  * the floors introduce is ≤ outdeg/scale per node per round — at the
  * default scale = 10^12, noise in the 12th decimal digit.
  *
  * Scale shape: the per-round cost is one hash join of the rank table
  * (N rows) onto the edge table (E rows, pre-joined with out-degrees
  * ONCE) plus a map-side-combined `groupBy(dst)` — the textbook
  * distributed PageRank round. Ranks are `localCheckpoint`ed per round
  * so the plan stays flat across iterations instead of growing a
  * 5-round join tree. Nothing collects to the driver except the node
  * count (one scalar).
  */
object Graph {

  /** Fixed-point PageRank over a directed edge list.
    *
    * Contract (replayed verbatim by the SQL oracle):
    * {{{
    * base        = scale div N                 // N = |distinct nodes|
    * teleport    = (base · (dampDen − dampNum)) div dampDen
    * r₀[v]       = base
    * r_{t+1}[v]  = teleport +
    *               (dampNum · Σ_{u→v} (r_t[u] div outdeg[u])) div dampDen
    * }}}
    * Dangling nodes (no out-edges) contribute nothing — their mass
    * leaks, the standard simplified variant; nodes with no in-edges
    * settle at `teleport`. All divisions are floor divisions on
    * non-negative integers.
    *
    * @param edges (srcCol, dstCol) directed edges; duplicates count as
    *              parallel edges (dedupe upstream if unwanted)
    * @return (node, rank_fp) — rank_fp ≈ rank · scale, LongType
    */
  def pageRankFixedPoint(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 4): DataFrame = {
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(scale > 0 && dampNum > 0 && dampDen >= dampNum,
      s"need scale > 0 and 0 < dampNum <= dampDen, got " +
        s"scale=$scale dampNum=$dampNum dampDen=$dampDen")
    require(scale <= Long.MaxValue / dampNum,
      s"scale * dampNum must fit a signed 64-bit integer " +
        s"(total mass times the damping numerator): scale=$scale dampNum=$dampNum")
    // materialize the edge list ONCE — nodes and out-degrees both
    // derive from it, and without this the upstream edge construction
    // (often a join) would execute once per derivation
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty graph")
    val base = scale / n
    val teleport = base * (dampDen - dampNum) / dampDen
    // out-degrees ride the edge table once — the per-round join then
    // only moves the N-row rank table, not a second E-row relation
    val eDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(true)
    var ranks = nodes.select(col("node"), lit(base).as("r"))
    for (k <- 1 to iters) {
      val contrib = eDeg
        .join(ranks, eDeg("src") === ranks("node"))
        .select(col("dst"), expr("r div outdeg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("c"))
      ranks = nodes
        .join(contrib, nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"${dampNum}L * coalesce(c, 0L) div ${dampDen}L")).as("r"))
      // lineage truncation every few rounds, not every round: an eager
      // materialization per round is pure fixed cost at small N, and a
      // handful of stacked join rounds is a fine plan depth — the
      // checkpoint exists so a 50-round run cannot accrete a 50-deep
      // tree, not to flush each round
      if (k % checkpointEvery == 0 && k < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("node"), col("r").as("rank_fp"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — community
    * detection over an undirected graph, the structure-aware
    * complement of [[graft.operators.Dedup.connectedComponents]]
    * (which only answers reachability: one bridge edge merges two
    * dense communities; LPA keeps them apart unless the vote crosses).
    *
    * Made DETERMINISTIC the same way PageRank was made fixed-point —
    * the published algorithm breaks vote ties randomly and updates
    * asynchronously, both of which are un-oracle-able; here every
    * round is a simultaneous update and ties break (count DESC, label
    * ASC), so the result is bit-identical on any engine and any
    * partitioning:
    * {{{
    * l₀[v]     = v
    * l_{t+1}[v] = the label most frequent among v's neighbours at
    *              time t (each edge counted once per direction;
    *              parallel edges = heavier votes), smallest label on
    *              a tied count; isolated vertices keep l_t[v]
    * }}}
    * Fixed `iters` rounds, no convergence test: synchronous LPA can
    * oscillate with period 2 (classically on bipartite graphs), so a
    * fixed-round contract is both reproducible and honest. Labels are
    * the node ids themselves — a community's label is one of its
    * member ids, NOT necessarily the minimum.
    *
    * Scale shape: per round, one hash join of the N-row label table
    * onto the symmetrised edge table plus ONE map-side-combined
    * groupBy — the vote argmax is `min(struct(-count, label))`, an
    * ordinary partial aggregate, never a per-node window sort.
    * Labels are `localCheckpoint`ed on the PageRank cadence so the
    * plan stays flat across rounds.
    *
    * @param edges undirected edges, each stored once in either
    *              orientation; both directions are derived internally
    * @return (node, label) — LongType node ids and labels
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val half = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    // symmetrise once; nodes derive from the same materialization
    val e = half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    for (k <- 1 to iters) {
      val vote = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        // argmax by (count DESC, label ASC) as one partial-aggregable
        // min over a sortable struct — no per-node window
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("negc"), col("lbl"))).as("win"))
        .select(col("dst"), col("win.lbl").as("newLbl"))
      labels = labels
        .join(vote, labels("node") === vote("dst"), "left")
        .select(col("node"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
      if (k % checkpointEvery == 0 && k < iters)
        labels = labels.localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("label"))
  }
}
