package graft

import graft.operators.Sampling

import org.apache.spark.sql.functions._

class SamplingSpec extends GraftSpec {

  import spark.implicits._

  test("deterministicSample: exactly k per group, stable across runs") {
    val a = Sampling.deterministicSample(people, Seq("name"), "id", 3)
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("id"))).toSet
    val b = Sampling.deterministicSample(people.repartition(7), Seq("name"), "id", 3)
      .collect().map(r => (r.getAs[String]("name"), r.getAs[String]("id"))).toSet
    assert(a == b, "sample must not depend on partitioning")
    assert(a.groupBy(_._1).forall(_._2.size == 3))
    assert(a.size == 30) // 10 names × 3
  }

  test("packByBudget: batch sums stay within budget; oversized items isolated") {
    val items = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 200L), ("s1", 3L, 250L), // 100+200 ≤ 400, 250 next
      ("s1", 4L, 900L),                                      // oversized → own batch
      ("s1", 5L, 50L),
      ("s2", 1L, 400L), ("s2", 2L, 400L)
    ).toDF("source", "doc_id", "n_tokens")
    val packed = Sampling.packByBudget(items, "source", "doc_id", "n_tokens", 400L)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getAs[Long]("batch_id")).toMap
    assert(packed(("s1", 1L)) == 0 && packed(("s1", 2L)) == 0)
    assert(packed(("s1", 3L)) == 0)   // prefix 300 < 400 → still batch 0 (greedy approx)
    assert(packed(("s1", 4L)) == 1)   // prefix 550 // 400 = 1
    assert(packed(("s1", 5L)) == 3)   // prefix 1450 // 400 = 3 — oversized item isolated
    assert(packed(("s2", 1L)) == 0 && packed(("s2", 2L)) == 1)
  }
}
