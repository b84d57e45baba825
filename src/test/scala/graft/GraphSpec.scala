package graft

import graft.operators.Graph

import org.apache.spark.sql.functions._

class GraphSpec extends GraftSpec {

  import spark.implicits._

  /** Plain-Scala replay of the fixed-point contract. */
  private def refPageRank(
      edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val base = scale / nodes.size
    val tp = base * 15L / 100L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .groupBy(_._2)
        .view.mapValues(_.map { case (u, _) => r(u) / outdeg(u) }.sum)
        .toMap
      r = nodes.map(v => v -> (tp + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("pageRankFixedPoint == scala reference on a seeded random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (1 to 60).map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(df, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refPageRank(edges, 4)
    assert(got == want)
    // bit-determinism: a second run is identical (integer arithmetic
    // has no summation-order sensitivity)
    val again = Graph.pageRankFixedPoint(df, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("two-node cycle is a fixed point at rank scale/2") {
    val df = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(df, "src", "dst", iters = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("star: center outranks leaves; leaves settle at teleport; dangling mass leaks") {
    // b, c, d → a; a has no out-edges (dangling)
    val df = Seq((2L, 1L), (3L, 1L), (4L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankFixedPoint(df, "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val base = 1000000000000L / 4
    val tp = base * 15L / 100L
    assert(got(2L) == tp && got(3L) == tp && got(4L) == tp,
      "no-in-edge nodes settle at the teleport mass")
    assert(got(1L) == tp + 85L * (3L * tp) / 100L,
      "after round 1 the leaves hold tp, so the center converges to tp + 0.85·3·tp")
    assert(got(1L) > got(2L))
    // dangling: total mass strictly below scale (a redistributes nothing)
    assert(got.values.sum < 1000000000000L)
  }

  test("parameter guards reject bad damping / scale") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](
      Graph.pageRankFixedPoint(df, "src", "dst", iters = -1))
    intercept[IllegalArgumentException](
      Graph.pageRankFixedPoint(df, "src", "dst", iters = 1, dampNum = 101L))
    intercept[IllegalArgumentException](
      Graph.pageRankFixedPoint(df, "src", "dst", iters = 1,
        scale = Long.MaxValue, dampNum = 85L))
  }

  /** Plain-Scala replay of the deterministic LPA contract: symmetrise,
    * vote by neighbour labels, tie → smallest label, simultaneous
    * update, no-vote keeps the old label. */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val sym = edges ++ edges.map(_.swap)
    val nodes = sym.map(_._1).distinct
    var l = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      val votes = sym.groupBy(_._1).view.mapValues { nbrs =>
        nbrs.map { case (_, u) => l(u) }
          .groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (lbl, c) => (-c, lbl) }._1
      }.toMap
      l = nodes.map(v => v -> votes.getOrElse(v, l(v))).toMap
    }
    l
  }

  test("labelPropagation == scala reference on a seeded random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 80).map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .filter { case (a, b) => a != b }
    val df = edges.toDF("src", "dst")
    for (k <- Seq(0, 1, 3, 5)) {
      val got = Graph.labelPropagation(df, "src", "dst", iters = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refLpa(edges, k), s"iters=$k")
    }
    // bit-determinism across runs
    val a = Graph.labelPropagation(df, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.labelPropagation(df, "src", "dst", iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("labelPropagation separates two triangles that CC would merge across a bridge") {
    // triangles {1,2,3} and {10,11,12} joined by one bridge 3–10
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, "src", "dst", iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L).map(out)
    val right = Set(10L, 11L, 12L).map(out)
    assert(left.size == 1 && right.size == 1, s"each triangle one label: $out")
    assert(left != right, "the bridge must not merge the communities")
    // CC on the same graph yields ONE component — the contrast claim
    val cc = graft.operators.Dedup.connectedComponents(
      edges, "src", "dst").select("component").distinct().count()
    assert(cc == 1L)
  }

  test("labelPropagation: synchronous K2 oscillates with period 2 (documented)") {
    val df = Seq((1L, 2L)).toDF("src", "dst")
    def run(k: Int) = Graph.labelPropagation(df, "src", "dst", iters = k)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) == Map(1L -> 2L, 2L -> 1L))
    assert(run(2) == Map(1L -> 1L, 2L -> 2L))
  }

  /** Plain-Scala replay of the personalized fixed-point contract. */
  private def refPpr(
      edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int,
      scale: Long = 1000000000000L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val s = nodes.filter(seeds).toSet
    val base = scale / s.size
    val tp = base * 15L / 100L
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(v => v -> (if (s(v)) base else 0L)).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2)
        .view.mapValues(_.map { case (u, _) => r(u) / outdeg(u) }.sum).toMap
      r = nodes.map(v => v ->
        ((if (s(v)) tp else 0L) + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    r
  }

  test("personalizedPageRank == scala reference; unreachable nodes settle at 0") {
    val rnd = new scala.util.Random(17)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(16).toLong, rnd.nextInt(16).toLong))
      .filter { case (a, b) => a != b } ++
      Seq((100L, 101L)) // a component no seed can reach
    val seeds = Set(1L, 4L, 9L)
    val got = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      "src", "dst", seeds.toSeq.toDF("node"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPpr(edges, seeds, 4))
    assert(got(100L) == 0L && got(101L) == 0L)
    // seeds absent from the graph are ignored; none present fails loudly
    val withGhost = Graph.personalizedPageRank(edges.toDF("src", "dst"),
      "src", "dst", (seeds + 9999L).toSeq.toDF("node"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withGhost == got)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges.toDF("src", "dst"), "src", "dst",
        Seq(9999L).toDF("node"), iters = 1)
    }
  }

  /** Plain-Scala per-node triangle counts by brute enumeration. */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val simple = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct.toSet
    val nodes = simple.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tri = for {
      (u, i) <- nodes.zipWithIndex; v <- nodes.drop(i + 1)
      if simple((u, v)); w <- nodes.dropWhile(_ <= v)
      if simple((u, w)) && simple((v, w))
    } yield (u, v, w)
    tri.flatMap { case (u, v, w) => Seq(u, v, w) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
  }

  test("triangleCounts == brute-force enumeration on a seeded random graph") {
    val rnd = new scala.util.Random(13)
    val edges = (1 to 120).map(_ =>
      (rnd.nextInt(18).toLong, rnd.nextInt(18).toLong))
    // duplicates, reversed copies and self-loops included on purpose —
    // the operator normalizes to a simple graph first
    val got = Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refTriangles(edges)
    assert(want.nonEmpty, "fixture must contain triangles")
    assert(got == want)
  }

  /** Plain-Scala iterative peel. */
  private def refKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
    var simple = edges.filter(e => e._1 != e._2)
      .map(e => (e._1 min e._2, e._1 max e._2)).distinct
    var stable = false
    while (!stable) {
      val deg = (simple.map(_._1) ++ simple.map(_._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      val next = simple.filter(e => keep(e._1) && keep(e._2))
      stable = next.size == simple.size
      simple = next
    }
    (simple.map(_._1) ++ simple.map(_._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= k)
  }

  test("kCore == scala peel reference; chain strips, clique survives, loud non-convergence") {
    val rnd = new scala.util.Random(23)
    val edges = (1 to 70).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong)) ++
      Seq((50L, 51L), (51L, 52L), (52L, 53L)) // a pendant chain
    val df = edges.toDF("src", "dst")
    for (k <- Seq(1, 2, 3, 4)) {
      val got = Graph.kCore(df, "src", "dst", k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refKCore(edges, k), s"k=$k")
    }
    // the 2-core of a pure chain is empty
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Graph.kCore(chain, "src", "dst", 2).count() == 0L)
    // K5 is its own 4-core: every node at degree 4
    val k5 = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b))
    assert(Graph.kCore(k5.toDF("src", "dst"), "src", "dst", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      (1L to 5L).map(_ -> 4L).toMap)
    // a maxRounds too small to converge fails loudly, never silently
    val long = (1L to 12L).sliding(2).map(s => (s(0), s(1))).toSeq
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(long.toDF("src", "dst"), "src", "dst", 2, maxRounds = 2)
    }
    assert(e.getMessage.contains("maxRounds"))
  }

  test("triangleCounts: K4 gives 3 per node; guard trips on a wide clique") {
    val k4 = (for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b))
    val got = Graph.triangleCounts(k4.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val k12 = (for (a <- 1L to 12L; b <- (a + 1) to 12L) yield (a, b))
    val e = intercept[Throwable] {
      Graph.triangleCounts(k12.toDF("src", "dst"), "src", "dst",
        maxOutDeg = 4).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("maxOutDeg")))
    // uncapped escape hatch
    assert(Graph.triangleCounts(k12.toDF("src", "dst"), "src", "dst",
      maxOutDeg = Int.MaxValue).agg(sum("n_tri")).head().getLong(0) ==
      3L * 220) // C(12,3) triangles × 3 vertices
  }
}
