package graft

import graft.functions.Udafs

import org.apache.spark.sql.functions._

class UdafsSpec extends GraftSpec {

  import spark.implicits._

  test("wavg: exact weighted mean, null on zero weight, partition-stable") {
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 3.0),          // (1·1+2·3)/4 = 1.75
      ("b", 10.0, 0.0), ("b", 20.0, 0.0),        // zero total weight → null
      ("c", 0.1, 2.0), ("c", 0.3, 2.0)           // 0.2
    ).toDF("g", "x", "w")

    def run(d: org.apache.spark.sql.DataFrame) = d
      .groupBy($"g")
      .agg(Udafs.wavg($"x".cast("decimal(18,2)"), $"w".cast("decimal(18,2)")).as("m"))
      .collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    val got = run(df)
    assert(got("a").contains(1.75))
    assert(got("b").isEmpty, "zero total weight must yield null, not NaN/0")
    assert(got("c").contains(0.2))
    // merge path: same result regardless of partitioning (map-side
    // partials combined associatively)
    assert(run(df.repartition(7)) == got)
  }

  test("vecSum: element-wise sums, null vectors skipped, partition-stable") {
    val df = Seq(
      ("a", Some(Seq(1.0, 2.0))), ("a", Some(Seq(10.0, 20.0))),
      ("a", None), // skipped, not zeroed
      ("b", Some(Seq(0.5, -0.5))),
      ("c", None) // no contributing rows → null, mirroring SQL sum
    ).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) = d
      .groupBy($"g").agg(Udafs.vecSum($"v").as("s"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getSeq[Double](1))))
      .toMap
    val got = run(df)
    assert(got("a").contains(Seq(11.0, 22.0)))
    assert(got("b").contains(Seq(0.5, -0.5)))
    assert(got("c").isEmpty, "all-null group must yield null, not empty")
    // merge path: identical across partitionings (one dim-length
    // buffer per partition per group is the whole point)
    assert(run(df.repartition(5)) == got)
    // ragged dimensions fail loudly, same contract as the cosine kernel
    val ragged = Seq(("a", Seq(1.0)), ("a", Seq(1.0, 2.0))).toDF("g", "v")
    intercept[org.apache.spark.SparkException] {
      ragged.groupBy($"g").agg(Udafs.vecSum($"v")).collect()
    }
  }

  test("wavg nulls follow the SQL sum(x*w)/sum(w) composition") {
    val df = Seq(
      (Some(1.0), Some(1.0)), (None, Some(9.0)), (Some(3.0), None), (Some(5.0), Some(1.0))
    ).toDF("x", "w")
    val m = df.agg(
      Udafs.wavg($"x".cast("decimal(18,2)"), $"w".cast("decimal(18,2)")).as("m"))
      .head().getDouble(0)
    // null x keeps its weight in the denominator (like sum(w));
    // null w drops the row: (1·1 + 5·1) / (1 + 9 + 1)
    assert(m == 6.0 / 11.0)
    // and that equals the SQL composition evaluated by Spark itself
    val sql = df.agg(
      (sum($"x".cast("decimal(18,2)") * $"w".cast("decimal(18,2)")).cast("double")
        / sum($"w".cast("decimal(18,2)")).cast("double")).as("m"))
      .head().getDouble(0)
    assert(m == sql)
    // all-null x: SQL sum(x*w) is NULL → NULL result, not 0/Σw
    val allNull = Seq((Option.empty[Double], Some(2.0)), (None, Some(3.0)))
      .toDF("x", "w")
      .agg(Udafs.wavg($"x".cast("decimal(18,2)"), $"w".cast("decimal(18,2)")).as("m"))
      .head()
    assert(allNull.isNullAt(0), "all-null x must yield null like SQL")
  }

  test("countMin: estimates bound true counts from above, exact when collision-free") {
    import org.apache.spark.sql.functions.{col, xxhash64}
    val depth = 4; val width = 1024
    // 3 distinct keys with known counts, far fewer than width:
    // collisions across all 4 rows are as good as impossible, so the
    // min-of-rows estimate is EXACT
    val data = (Seq.fill(50)("alpha") ++ Seq.fill(20)("beta") ++ Seq.fill(3)("gamma"))
      .toDF("k").repartition(8) // exercise partial-buffer merging
    val sketch = data
      .agg(Udafs.countMin(depth, width)(xxhash64(col("k"))).as("sk"))
      .head().getSeq[Long](0)
    assert(sketch.length == depth * width)
    assert(sketch.sum == 73L * depth) // every occurrence hits one cell per row
    def est(k: String): Long = {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(k)
      val kh = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      Udafs.cmsEstimate(sketch, depth, width, kh)
    }
    assert(est("alpha") == 50L)
    assert(est("beta") == 20L)
    assert(est("gamma") == 3L)
    // an absent key can only read over-counts: estimate ≥ 0 and ≤ the
    // worst single-cell load, never negative or structurally wrong
    assert(est("never-seen") >= 0L)
  }
}
