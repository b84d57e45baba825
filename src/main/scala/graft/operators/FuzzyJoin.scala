package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-string (edit-distance) equi-join — entity resolution /
  * record linkage over dirty keys, the fuzzy counterpart of the
  * reference's exact-key `Join` (csvplus.go:539).
  *
  * Candidate generation is the FastSS / SymSpell deletion-neighborhood
  * scheme (public algorithm): every string expands to the set of
  * variants reachable by deleting ≤ `maxDist` characters, and two
  * strings within Levenshtein distance d ≤ maxDist always share at
  * least one variant (each edit is covered by deleting the touched
  * position on one or both sides). Candidates therefore come from an
  * EQUI-join on the variant key — never a cartesian — and the exact
  * `levenshtein` verify runs only on candidate pairs.
  *
  * Scale shape:
  *  - neighborhood size is O(|s|^maxDist) per row (|s|+1 for d=1),
  *    generated inside the row by codegen-friendly built-ins
  *    (`transform`/`flatten`/`array_distinct`) — no UDF;
  *  - the only shuffle is the variant-key equi-join; a hot key
  *    (shared boilerplate values) makes it quadratic in that key's
  *    occupancy, so the same loud `maxBucketSize` contract as the LSH
  *    dedup family applies: default FAILS the job with the offending
  *    count, `dropHotKeys = true` opts into documented truncation;
  *  - verify + pair-dedup group by the candidate pair, map-side
  *    partial.
  *
  * `maxDist` ≤ 2 is the practical envelope (d=2 on a 20-char string is
  * ~200 variants/row); beyond that use the n-gram/LSH similarity
  * stack instead.
  */
object FuzzyJoin {

  /** All strings reachable from `s` by deleting up to `maxDist`
    * characters (including `s` itself), distinct. */
  private[operators] def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist >= 0, "maxDist must be >= 0")
    def dels(strs: Column): Column = // one deletion applied to each element
      flatten(transform(strs, v =>
        transform(sequence(lit(1), length(v)), i =>
          concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v) - i)))))
    var acc = array(s)
    var frontier = array(s)
    for (_ <- 1 to maxDist) {
      frontier = array_distinct(dels(frontier))
      acc = concat(acc, frontier)
    }
    array_distinct(acc)
  }

  /** Fuzzy inner join of `left` and `right` on Levenshtein distance
    * ≤ `maxDist` between `leftStr` and `rightStr`. Output: one row per
    * matching (id, id) pair — `l_id`, `r_id`, `l_str`, `r_str`,
    * `dist`. NULL or empty strings never match (a NULL key matches
    * nothing, as in the exact join).
    *
    * `maxBucketSize` bounds a single variant key's occupancy per side;
    * see the object doc for the loud-failure contract. */
  def fuzzyJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      maxDist: Int = 1, maxBucketSize: Int = 10000,
      dropHotKeys: Boolean = false): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1 (use an exact join for 0)")
    require(maxBucketSize > 0, "maxBucketSize must be > 0")

    def side(df: DataFrame, id: String, str: String, tag: String): DataFrame = {
      val vs = df.filter(col(str).isNotNull && length(col(str)) > 0)
        .select(col(id).as(s"${tag}_id"), col(str).as(s"${tag}_str"),
          explode(deletionVariants(col(str), maxDist)).as("variant"))
      guardHotVariants(vs, maxBucketSize, dropHotKeys)
    }

    val lv = side(left, leftId, leftStr, "l")
    val rv = side(right, rightId, rightStr, "r")

    lv.join(rv, "variant")
      .select(col("l_id"), col("r_id"), col("l_str"), col("r_str"))
      .distinct()
      .withColumn("dist", levenshtein(col("l_str"), col("r_str")))
      .filter(col("dist") <= maxDist)
  }

  /** Same hot-key contract as Dedup.guardHotGrams: the occupancy count
    * runs as a window over the join key (no extra shuffle beyond the
    * one the join pays anyway), and `assert_true` stays inside a
    * `filter` so pruning cannot elide it. */
  private def guardHotVariants(
      vs: DataFrame, maxBucketSize: Int, dropHotKeys: Boolean): DataFrame = {
    if (maxBucketSize == Int.MaxValue) vs
    else {
      val sized = vs.withColumn("__n",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("variant"))))
      if (dropHotKeys) sized.filter(col("__n") <= maxBucketSize).drop("__n")
      else sized.filter(assert_true(col("__n") <= maxBucketSize,
        concat(lit("fuzzyJoin: a deletion variant is shared by "), col("__n"),
          lit(s" rows (> maxBucketSize = $maxBucketSize) — the candidate " +
            "join would be quadratic in that count; raise maxBucketSize, " +
            "set dropHotKeys = true, or pre-dedup the join keys"))).isNull)
        .drop("__n")
    }
  }
}
