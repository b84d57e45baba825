package graft

import graft.operators.Index

import org.apache.spark.sql.Row

/** Randomized duplicate-resolution property, ported from the
  * reference's 1000-iteration TestResolver (csvplus_test.go:695-752):
  * inject one random row n∈[1,100] extra times at random positions; the
  * resolver must be invoked EXACTLY once, with a group of exactly n+1
  * identical rows; singleton groups must bypass it. Call counting is an
  * accumulator because the resolver runs inside executor tasks. */
class ResolverSpec extends GraftSpec {

  test("resolver sees exactly one group of exactly n+1 rows (20 seeded rounds)") {
    val rng = new scala.util.Random(7)
    for (round <- 1 to 20) {
      val n = 1 + rng.nextInt(100)
      val victim = Fixtures.peopleData(rng.nextInt(Fixtures.peopleData.length))
      val extra = Seq.fill(n)(victim)
      val rows = rng.shuffle(Fixtures.peopleData ++ extra).map(p =>
        Row(p.id, p.name, p.surname, p.born))
      val df = spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        people.schema)

      val calls = spark.sparkContext.longAccumulator(s"resolverCalls$round")
      val groupSizes = spark.sparkContext.collectionAccumulator[Int](s"groupSizes$round")

      val resolved = Index.indexOn(df, "id").resolveDuplicates { group =>
        calls.add(1)
        groupSizes.add(group.size)
        Some(group.head)
      }
      assert(resolved.iterate.count() == Fixtures.peopleData.length,
        s"round $round: dedup must restore original cardinality")
      assert(calls.value == 1, s"round $round: resolver called ${calls.value} times, want 1")
      assert(groupSizes.value.size == 1 && groupSizes.value.get(0) == n + 1,
        s"round $round: group size ${groupSizes.value} want ${n + 1}")
    }
  }
}
