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

  /** Broadcast-hint `df` when an exact, already-paid row count says it
    * fits the session's broadcast threshold (conservative 64 B/row for
    * two-long rows plus hash-relation overhead); otherwise leave the
    * planner's choice. The iterative operators need this because their
    * N-row rank/label/vote tables sit behind localCheckpoint +
    * aggregates, whose size ESTIMATES are unknown — the planner then
    * broadcasts the E-ROW EDGE table instead (its parquet-derived
    * estimate is visible), rebuilding an edge-sized hash relation
    * every materialized round (measured: the q_label_prop plan
    * broadcast the symmetrised 2E-row edge RDD each of 4 rounds while
    * the 33k-row label table went through a sort-merge join). With the
    * hint the N-row side broadcasts and the edge table is the streamed
    * side — scanned in place, never shuffled, never broadcast. Above
    * the threshold (honest 100 TB posture: N can be billions) nothing
    * is hinted and the planner's shuffle join stands. */
  private[operators] def broadcastIfSmall(
      df: DataFrame, rows: Long): DataFrame = {
    val thr = df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    // bytes/row from the schema, not a constant (ADVICE r15): the
    // iterative operators pass narrow fixed-width frames where the old
    // flat 64 B/row was right (2 longs ≈ 16 B data + hash-relation
    // overhead ≈ 64), but a future caller with wide rows (string
    // labels) would force-broadcast oversized relations. 4× the
    // schema's defaultSize keeps the original margin on two-long rows
    // (4·16 = 64) and scales with the actual row width; floor 64 so a
    // single-column frame never gets a looser threshold than before.
    val bytesPerRow = math.max(64L, 4L * df.schema.defaultSize)
    if (thr > 0 && rows >= 0 && rows <= thr / bytesPerRow) broadcast(df) else df
  }

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
      checkpointEvery: Int = 4): DataFrame =
    pageRankCore(edges, srcCol, dstCol, None, iters, scale,
      dampNum, dampDen, checkpointEvery)

  /** PERSONALIZED fixed-point PageRank: all teleport mass returns to
    * the `seeds` set instead of spreading uniformly — importance
    * relative to a trusted slice (seed domains, curated documents),
    * the standard curation/recommendation form. Same integer contract
    * as [[pageRankFixedPoint]] with the teleport vector concentrated:
    * {{{
    * S           = seeds ∩ graph nodes (distinct), must be non-empty
    * base        = scale div |S|
    * tpSeed      = (base · (dampDen − dampNum)) div dampDen
    * r₀[v]       = base if v ∈ S else 0
    * r_{t+1}[v]  = (tpSeed if v ∈ S else 0) +
    *               (dampNum · Σ_{u→v} (r_t[u] div outdeg[u])) div dampDen
    * }}}
    * Nodes unreachable from S settle at exactly 0 — the property that
    * makes the personalized form a TRUST metric rather than a
    * popularity one. Seeds not present in the graph are ignored.
    *
    * @param seeds one column of node ids (first column is used)
    */
  def personalizedPageRank(
      edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, iters: Int, scale: Long = 1000000000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 4): DataFrame =
    pageRankCore(edges, srcCol, dstCol, Some(seeds), iters, scale,
      dampNum, dampDen, checkpointEvery)

  private def pageRankCore(
      edges: DataFrame, srcCol: String, dstCol: String,
      seedsOpt: Option[DataFrame], iters: Int, scale: Long,
      dampNum: Long, dampDen: Long, checkpointEvery: Int): DataFrame = {
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
    // (often a join) would execute once per derivation. LAZY
    // checkpoints: the plan is truncated at once, and the node-count
    // aggregate below is a full scan that materializes both frames in
    // the SAME job — eager here cost one whole extra job each (r15
    // verdict #6: per-call fixed driver actions were the measured
    // cost on the small per-gate graphs)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint(false)
    // seed membership rides the node table as a flag so the per-round
    // teleport is a codegen'd CASE, not a per-round join
    val nodesPlain = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nodes = (seedsOpt match {
      case None => nodesPlain.select(col("node"), lit(true).as("isSeed"))
      case Some(seeds) =>
        val sd = seeds.select(seeds.columns.head).toDF("node").distinct()
        nodesPlain.join(sd.select(col("node"), lit(true).as("isSeed")),
          Seq("node"), "left")
          .select(col("node"), coalesce(col("isSeed"), lit(false)).as("isSeed"))
    }).localCheckpoint(false)
    // ONE fused pre-loop job: materializes e + nodes (full-scan
    // aggregate over the lazy checkpoints) and returns the seed-mass
    // and node counts together — formerly five separate driver actions
    // (two eager checkpoints, two counts, the eDeg checkpoint)
    val cnts = nodes.agg(
      count(when(col("isSeed"), lit(1))).as("m"),
      count(lit(1)).as("n")).head()
    val nMass = cnts.getLong(0)
    require(nMass > 0, seedsOpt.fold("pageRank needs a non-empty graph")(
      _ => "personalizedPageRank needs at least one seed present in the graph"))
    // exact node count — gates the per-round broadcast hints below
    val nNodes = cnts.getLong(1)
    val base = scale / nMass
    val teleport = base * (dampDen - dampNum) / dampDen
    // out-degrees ride the edge table once — the per-round join then
    // only moves the N-row rank table, not a second E-row relation.
    // Lazy: the first round's execution materializes it once; every
    // later round reads the checkpointed blocks
    val eDeg = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(false)
    val tpCol = when(col("isSeed"), lit(teleport)).otherwise(lit(0L))
    var ranks = nodes.select(col("node"), col("isSeed"),
      when(col("isSeed"), lit(base)).otherwise(lit(0L)).as("r"))
    for (k <- 1 to iters) {
      // rank table (N rows, exact count known) broadcasts when small:
      // the E-row edge table is then the streamed side — never
      // shuffled, never built into a hash relation ([[broadcastIfSmall]])
      val rb = broadcastIfSmall(ranks, nNodes)
      val contrib = eDeg
        .join(rb, eDeg("src") === rb("node"))
        .select(col("dst"), expr("r div outdeg").as("share"))
        .groupBy(col("dst")).agg(sum(col("share")).as("c"))
      val cb = broadcastIfSmall(contrib, nNodes)
      ranks = nodes
        .join(cb, nodes("node") === cb("dst"), "left")
        .select(col("node"), col("isSeed"),
          (tpCol +
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
    *              a tied count
    * }}}
    * The node set is derived from the edge list, so ONLY edge-incident
    * nodes appear in the output — an isolated vertex (no edges) is
    * never returned at all. (The no-vote coalesce below is defensive;
    * on symmetrised input every derived node receives ≥ 1 vote.)
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
    * Labels are `localCheckpoint`ed EVERY round (checkpointEvery = 1,
    * the Pregel posture): the label table is O(N) rows — tiny next to
    * the O(E) vote shuffle — while an un-truncated round tree grows
    * superlinearly (measured on the q_label_prop gate graph at sf0.1,
    * fresh JVMs: marginal round cost 3.0/0.5/2.5/3.8 s for rounds
    * 1-4 un-checkpointed; 4 rounds take 17.7 s at the old cadence-4
    * default — which never fired for iters ≤ 4 — vs 12.0 s at
    * cadence 1. PageRank keeps cadence 4: its 5-round tree already
    * truncates once and measured 12.5 vs 12.2 s — noise).
    *
    * @param edges undirected edges, each stored once in either
    *              orientation; both directions are derived internally
    * @return (node, label) — LongType node ids and labels
    */
  def labelPropagation(
      edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, checkpointEvery: Int = 1): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(checkpointEvery >= 1,
      s"checkpointEvery must be >= 1, got $checkpointEvery")
    val half = edges.select(
      col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    // symmetrise once; nodes derive from the same materialization.
    // Lazy checkpoints + one count: the count's full scan materializes
    // e AND nodes in a single job where two eager checkpoints plus the
    // count paid three (r15 verdict #6 — fixed per-call driver actions)
    val e = half.unionByName(
        half.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node")).distinct()
      .localCheckpoint(false)
    // exact node count — gates the per-round broadcast hints below
    val nNodes = nodes.count()
    var labels = nodes.select(col("node"), col("node").as("lbl"))
    for (k <- 1 to iters) {
      // label table (N rows, exact count known) broadcasts when small:
      // the symmetrised 2E-row edge table is then the streamed side —
      // never shuffled, never built into a per-round hash relation
      val lb = broadcastIfSmall(labels, nNodes)
      val vote = e.join(lb, e("src") === lb("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        // argmax by (count DESC, label ASC) as one partial-aggregable
        // min over a sortable struct — no per-node window
        .groupBy(col("dst"))
        .agg(min(struct((-col("c")).as("negc"), col("lbl"))).as("win"))
        .select(col("dst"), col("win.lbl").as("newLbl"))
      val vb = broadcastIfSmall(vote, nNodes)
      labels = labels
        .join(vb, labels("node") === vb("dst"), "left")
        .select(col("node"), coalesce(col("newLbl"), col("lbl")).as("lbl"))
      if (k % checkpointEvery == 0 && k < iters)
        labels = labels.localCheckpoint(true)
    }
    labels.select(col("node"), col("lbl").as("label"))
  }

  /** Exact per-node triangle counts over an undirected graph — the
    * degree-ordered wedge-check algorithm (Cohen 2009 / the
    * node-iterator++ family): orient every edge from its lower
    * (degree, id) endpoint to the higher, enumerate wedges as a
    * self-join of the oriented list on the source, and close each
    * wedge against the oriented edge between its endpoints. Each
    * triangle materializes exactly once (its vertices are totally
    * ordered by (degree, id)), and the orientation bounds the wedge
    * fan-out: an oriented out-neighbour has degree ≥ its source's, so
    * out-degree ≤ O(√E) on any graph — THE property that makes the
    * wedge join survive hub vertices (a raw neighbour self-join on a
    * degree-d hub enumerates d², oriented it enumerates at most 2E).
    *
    * Input edges are normalized first (self-loops dropped, duplicate /
    * reversed copies collapsed — a simple graph). Output: (node,
    * n_tri) for nodes in ≥ 1 triangle, all-integer.
    *
    * `maxOutDeg` is the loud guard on residual skew (a clique of size
    * k still has oriented out-degree k/2): the default fails the job
    * with the offending count, same contract as the dedup family's
    * `maxBucketSize`. */
  def triangleCounts(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxOutDeg: Int = 10000): DataFrame = {
    require(maxOutDeg > 0, s"maxOutDeg must be > 0, got $maxOutDeg")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .dropDuplicates("a", "b")
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    // orient toward the higher (degree, id) endpoint; carry the dst's
    // key so wedge endpoints can be ordered without another join
    val o = und
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("src"), col("b").as("dst"),
            struct(col("db").as("d"), col("b").as("n")).as("dk")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"),
            struct(col("da").as("d"), col("a").as("n")).as("dk"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dk").as("dk"))
    // the oriented list feeds THREE consumers (both wedge sides and the
    // closing join) — truncate its lineage once so the deg joins (and
    // the guard's window+assert, when active) run once, not three times
    val guarded = (if (maxOutDeg == Int.MaxValue) o else {
      val sized = o.withColumn("__od",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("src"))))
      sized.filter(assert_true(col("__od") <= maxOutDeg,
        concat(lit("triangleCounts: a node has oriented out-degree "),
          col("__od"),
          lit(s" (> maxOutDeg = $maxOutDeg) — the wedge join would " +
            "enumerate that count squared; raise maxOutDeg or thin " +
            "the graph"))).isNull)
        .drop("__od")
    }).localCheckpoint(true)
    val wedges = guarded
      .select(col("src"), col("dst").as("v"), col("dk").as("vk"))
      .join(guarded.select(col("src"), col("dst").as("w"),
        col("dk").as("wk")), "src")
      .filter(col("vk") < col("wk"))
    val closed = wedges.join(
      guarded.select(col("src").as("v"), col("dst").as("w")),
      Seq("v", "w"))
    closed
      .select(explode(array(col("src"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
  }

  /** The k-core of an undirected graph: the maximal subgraph in which
    * every vertex has degree ≥ k, computed by iterative peeling —
    * delete all vertices of degree < k simultaneously, recompute
    * degrees, repeat. Deterministic by construction (the simultaneous
    * peel has no tie to break — unlike LPA no vote, unlike the
    * published asynchronous variants no order dependence), so the
    * result is engine-exact. The standard graph-cleaning primitive:
    * peeling a near-dup or co-occurrence graph to its 3-core strips
    * incidental pairings before community or centrality analysis.
    *
    * `maxRounds` bounds the peel (each round removes ≥ 1 vertex or
    * stops, so N rounds always suffice; real graphs converge in a
    * handful). A bound too small to reach the fixed point FAILS
    * LOUDLY rather than returning a silently-unstable subgraph.
    *
    * Scale shape: each round is one degree groupBy over surviving
    * edges plus two semi-joins to drop incident edges — linear in
    * surviving E, shrinking monotonically; every round eagerly
    * localCheckpoints (its count gates the loop AND its rows feed the
    * next peel — the connectedComponents pattern).
    *
    * @return (node, degree) for the k-core's vertices with their
    *         IN-CORE degrees; empty when no k-core exists
    */
  def kCore(
      edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      maxRounds: Int = 20): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(maxRounds >= 1, s"maxRounds must be >= 1, got $maxRounds")
    val und = edges.select(
        least(col(srcCol), col(dstCol)).cast("long").as("a"),
        greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull &&
        col("a") =!= col("b"))
      .dropDuplicates("a", "b")
    // every round is consumed twice (its count gates the loop, its
    // rows feed the next peel), so each is materialized by its own
    // count — the Dedup.connectedComponents pattern: a LAZY checkpoint
    // whose full-scan count materializes it in the same job (eager +
    // count was two driver actions per round, r15 verdict #6)
    var cur = und.localCheckpoint(false)
    var nCur = cur.count()
    var done = nCur == 0L
    var round = 0
    while (!done && round < maxRounds) {
      round += 1
      val deg = cur.select(col("a").as("node"))
        .unionByName(cur.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("d"))
      // surviving-node table ≤ 2·|surviving edges| rows (an exact bound
      // from the count the loop already pays) — broadcast it when small
      // so the edge table streams through both semi-joins unshuffled
      val keep = broadcastIfSmall(
        deg.filter(col("d") >= k).select(col("node")), 2L * nCur)
      val next = cur
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(false)
      val nNext = next.count()
      if (nNext == nCur || nNext == 0L) done = true
      cur = next
      nCur = nNext
    }
    require(done,
      s"kCore did not converge within maxRounds = $maxRounds rounds — " +
        "raise maxRounds (each round peels at least one vertex, so " +
        "N rounds always suffice)")
    cur.select(col("a").as("node"))
      .unionByName(cur.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }
}
