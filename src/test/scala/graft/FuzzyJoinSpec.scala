package graft

import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** Deletion-neighborhood fuzzy join: exact agreement with a
  * brute-force Levenshtein cross join (the soundness claim — FastSS
  * candidates must contain EVERY pair within maxDist), the d=2 case,
  * and the loud hot-key guard. */
class FuzzyJoinSpec extends GraftSpec {
  import spark.implicits._

  private def bruteForce(
      ls: Seq[(Long, String)], rs: Seq[(Long, String)], d: Int) =
    (for {
      (li, lstr) <- ls; (ri, rstr) <- rs
      dist = levDist(lstr, rstr) if dist <= d
    } yield (li, ri, dist)).toSet

  private def levDist(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private val names = Seq(
    1L -> "amelia smith", 2L -> "amelia smyth", 3L -> "oliver jones",
    4L -> "olivier jones", 5L -> "jack wilson", 6L -> "jak wilson",
    7L -> "harry evans", 8L -> "completely different")
  private val dirty = Seq(
    10L -> "amelia smith", 11L -> "amelia simth", 12L -> "oliver jnes",
    13L -> "jack wilsonn", 14L -> "harry evan", 15L -> "zzz qqq")

  test("d=1 matches brute-force Levenshtein exactly") {
    val got = FuzzyJoin.fuzzyJoin(
      names.toDF("id", "s"), "id", "s",
      dirty.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("l_id", "r_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(got == bruteForce(names, dirty, 1))
    assert(got.contains((1L, 10L, 0)) && got.contains((2L, 10L, 1)))
  }

  test("d=2 matches brute-force (substitution+transposition-ish pairs)") {
    val got = FuzzyJoin.fuzzyJoin(
      names.toDF("id", "s"), "id", "s",
      dirty.toDF("id", "s"), "id", "s", maxDist = 2)
      .select("l_id", "r_id", "dist").as[(Long, Long, Int)].collect().toSet
    val want = bruteForce(names, dirty, 2)
    assert(got == want)
    assert(want.exists(_._3 == 2), "fixture should exercise dist-2 pairs")
  }

  test("NULL and empty strings never match") {
    val l = Seq((1L, "abc"), (2L, null), (3L, "")).toDF("id", "s")
    val r = Seq((9L, "abc")).toDF("id", "s")
    val got = FuzzyJoin.fuzzyJoin(l, "id", "s", r, "id", "s", 1)
      .select("l_id").as[Long].collect().toSet
    assert(got == Set(1L))
  }

  test("hot variant key fails loudly by default, drops quietly on opt-in") {
    val hot = (1L to 50L).map(i => (i, "aaaa")).toDF("id", "s")
    val e = intercept[Exception] {
      FuzzyJoin.fuzzyJoin(hot, "id", "s", hot, "id", "s",
        maxDist = 1, maxBucketSize = 10).count()
    }
    assert(e.getMessage.contains("maxBucketSize"))
    val dropped = FuzzyJoin.fuzzyJoin(hot, "id", "s", hot, "id", "s",
      maxDist = 1, maxBucketSize = 10, dropHotKeys = true).count()
    assert(dropped == 0L)
  }

  test("fuzzyJoinStreamed == fuzzyJoin on the same relation (stream ≡ batch)") {
    val dir = java.nio.file.Files.createTempDirectory("fuzzy_stream").toString
    dirty.toDF("id", "s").write.mode("overwrite").parquet(dir)
    val batch = FuzzyJoin.fuzzyJoin(
      names.toDF("id", "s"), "id", "s",
      dirty.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("l_id", "r_id", "dist").as[(Long, Long, Int)].collect().toSet
    val streamed = FuzzyJoin.fuzzyJoinStreamed(
      spark, dir, "id", "s",
      names.toDF("id", "s"), "id", "s", maxDist = 1)
      .select("l_id", "r_id", "dist").distinct()
      .as[(Long, Long, Int)].collect().toSet
    assert(streamed == batch)
  }

  test("maxDist above the combinatorial envelope fails loudly") {
    val df = names.toDF("id", "s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.fuzzyJoin(df, "id", "s", df, "id", "s", maxDist = 4)
    }
    assert(e.getMessage.contains("O(|s|^maxDist)"))
  }

  test("candidate join is an equi-join, never a cartesian") {
    val p = FuzzyJoin.fuzzyJoin(
      names.toDF("id", "s"), "id", "s",
      dirty.toDF("id", "s"), "id", "s", maxDist = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  /** Brute-force sorted-neighborhood reference: global (key, id) sort,
    * all pairs within `w` positions, levenshtein <= d. */
  private def snReference(rows: Seq[(Long, String)], w: Int, d: Int) = {
    val ranked = rows.sortBy { case (id, k) => (k, id) }.zipWithIndex
    (for {
      ((ida, ka), ra) <- ranked; ((idb, kb), rb) <- ranked
      if rb > ra && rb - ra <= w - 1 && levDist(ka, kb) <= d
    } yield (ida, idb, levDist(ka, kb))).toSet
  }

  test("sortedNeighborhood matches the brute-force rank-window reference") {
    // 40 keys over few prefixes so bucket boundaries, block boundaries
    // and dense same-prefix runs are all exercised
    val rows = (0 until 40).map { i =>
      (i.toLong, f"name${i / 3}%03d v${i % 3}")
    } ++ Seq(100L -> "zz last", 101L -> "zz lasT", 102L -> "aa first")
    for ((w, bc) <- Seq((2, 1), (5, 2), (10, 3), (50, 2))) {
      val got = FuzzyJoin.sortedNeighborhood(
        rows.toDF("id", "k"), "id", "k", window = w, maxDist = 2,
        bucketChars = bc)
        .select("id_a", "id_b", "dist").as[(Long, Long, Int)]
        .collect()
      assert(got.length == got.toSet.size, s"duplicate pairs at w=$w")
      assert(got.toSet == snReference(rows, w, 2), s"w=$w bucketChars=$bc")
    }
  }

  test("sortedNeighborhood: boundary pairs, empty/null keys, window recall miss") {
    val rows = Seq(
      (1L, "alpha"), (2L, "alphb"), (3L, "beta"), (4L, "betb"),
      (5L, null.asInstanceOf[String]), (6L, ""),
      // first-char typo: sorts far away, a 2-window cannot see it
      (7L, "zeta"), (8L, "aeta"))
    val got = FuzzyJoin.sortedNeighborhood(
      rows.toDF("id", "k"), "id", "k", window = 2, maxDist = 1,
      bucketChars = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)) && got.contains((3L, 4L)))
    assert(!got.exists { case (a, b) => Set(a, b).intersect(Set(5L, 6L)).nonEmpty })
    // (7,8) within dist 1 but ranks far apart — the documented miss
    assert(!got.contains((8L, 7L)) && !got.contains((7L, 8L)))
    // pair order is by (key, id) rank, not id: "aeta" (8) ranks first
    val wide = FuzzyJoin.sortedNeighborhood(
      rows.toDF("id", "k"), "id", "k", window = 8, maxDist = 1,
      bucketChars = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(wide.contains((8L, 7L)))
  }

  test("multi-pass: the reverse pass recovers the first-char typo; pairs dedupe across passes") {
    // no key may sort between "aeta" and "zeta" in REVERSE ("atea" <
    // "atez"), or the 2-window cannot pair them in the reverse pass
    val rows = Seq((1L, "alpha"), (2L, "alphb"),
      (7L, "zeta"), (8L, "aeta"))
    val df = rows.toDF("id", "k")
    val got = FuzzyJoin.sortedNeighborhoodMultiPass(
      df, "id", "k", Seq(col("k"), reverse(col("k"))),
      window = 2, maxDist = 1, bucketChars = 1)
      .select("id_a", "id_b", "dist").as[(Long, Long, Int)].collect()
    assert(got.length == got.toSet.size, "cross-pass duplicates leaked")
    val pairs = got.map { case (a, b, _) => (a, b) }.toSet
    // (1,2) found by both passes (once); (7,8) only by the reverse
    // pass ("atez"/"atea" sort adjacent); orientation is id-normalized
    assert(pairs.contains((1L, 2L)) && pairs.contains((7L, 8L)))
    // reference: union of both passes' rank-window relations
    val ref = (snReference(rows, 2, 1) ++
      snReference(rows.map { case (i, k) => (i, k.reverse) }, 2, 1))
      .map { case (a, b, _) => (math.min(a, b), math.max(a, b)) }
    val refWithDist = ref.map { case (a, b) =>
      (a, b, levDist(rows.toMap.apply(a), rows.toMap.apply(b))) }
      .filter(_._3 <= 1)
    assert(got.toSet == refWithDist)
  }
}
