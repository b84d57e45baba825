package graft

import graft.operators.{Index, Pipe}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Order-dependent prefix operators over a declared order — the
  * reference's sorted-iteration pagination tests
  * (csvplus_test.go:454-514): first block all "Amelia"; after DropWhile
  * all "Ava"; Drop(10).Top(10) lands on a known surname block. */
class OrderOpsSpec extends GraftSpec {

  private def sortedPeople = Pipe(Index.indexOn(people, "name", "surname").iterate)
    .orderBy(col("name"), col("surname"))

  test("top(n) returns the first block in index order — all Amelias") {
    val got = sortedPeople.top(12).df.collect()
    assert(got.length == 12)
    assert(got.forall(_.getAs[String]("name") == "Amelia"))
  }

  test("drop(10).top(10) straddles the Amelia→Ava boundary deterministically") {
    val got = sortedPeople.drop(10).top(10).df
      .collect().map(_.getAs[String]("name"))
    // names sorted: Amelia(12) then Ava(12): rows 10..19 = 2 Amelias + 8 Avas
    assert(got.count(_ == "Amelia") == 2 && got.count(_ == "Ava") == 8)
  }

  test("takeWhile keeps the strict prefix before the first violation (latching)") {
    // order by id numeric-as-string is lexicographic; use born as payload:
    // order people by (name,surname); take while name != "Emily".
    // Sorted names: Amelia, Ava, Charlie, Emily, ... → prefix = 36 rows.
    val got = sortedPeople.takeWhile(col("name") =!= "Emily").df.collect()
    assert(got.length == 36)
    assert(got.map(_.getAs[String]("name")).toSet == Set("Amelia", "Ava", "Charlie"))
  }

  test("takeWhile latches: later matching rows after the cutoff are NOT re-admitted") {
    // predicate true again after first violation: name != Emily is true for
    // Harry etc., but they must stay dropped.
    val got = sortedPeople.takeWhile(col("name") =!= "Emily").df
    assert(got.filter(col("name") === "Harry").count() == 0)
  }

  test("dropWhile emits everything from the first violation on (csvplus_test.go:480-491)") {
    val got = sortedPeople.dropWhile(col("name") =!= "Emily").df
    assert(got.count() == 120 - 36)
    // first surviving block is all Emilys
    val first = sortedPeople.dropWhile(col("name") =!= "Emily").top(12).df.collect()
    assert(first.forall(_.getAs[String]("name") == "Emily"))
  }

  test("takeWhile with an always-true predicate keeps everything") {
    assert(sortedPeople.takeWhile(lit(true)).df.count() == 120)
    assert(sortedPeople.dropWhile(lit(true)).df.count() == 0)
  }

  test("takeWhile/dropWhile partition the stream for arbitrary predicates (property)") {
    // for any predicate p: takeWhile(p) ⊎ dropWhile(p) == input, disjoint
    val preds = Seq(
      col("name") =!= "Emily",
      col("born").cast("int") < 1950,           // violated early and often
      col("surname") > "A",                     // never violated → take all
      col("name") === "NOBODY",                 // violated immediately → drop all
      col("born").cast("int") % 2 === 0)        // oscillating
    preds.foreach { p =>
      val taken = sortedPeople.takeWhile(p).df.collect().map(_.toSeq).toSeq
      val dropped = sortedPeople.dropWhile(p).df.collect().map(_.toSeq).toSeq
      assert(taken.size + dropped.size == 120, s"partition for $p")
      assert(taken.toSet.intersect(dropped.toSet).isEmpty, s"disjoint for $p")
    }
  }

  test("order-dependent ops without a declared order fail fast") {
    intercept[IllegalArgumentException] { Pipe(people).top(5) }
    intercept[IllegalArgumentException] { Pipe(people).takeWhile(lit(true)) }
  }

  private def descPeople = Pipe(people)
    .orderBy(col("name").desc, col("surname").desc)

  test("takeWhile honors a DESCENDING declared order") {
    // names desc: Olivia, Oliver, Jacob, Jack, ... → prefix before the
    // first Jacob = 12 Olivias + 12 Olivers
    val got = descPeople.takeWhile(col("name") =!= "Jacob").df.collect()
    assert(got.length == 24)
    assert(got.map(_.getAs[String]("name")).toSet == Set("Olivia", "Oliver"))
  }

  test("dropWhile under descending order starts at the first violation") {
    val got = descPeople.dropWhile(col("name") =!= "Jacob").df
    assert(got.count() == 120 - 24)
    val first = descPeople.dropWhile(col("name") =!= "Jacob").top(12).df.collect()
    assert(first.forall(_.getAs[String]("name") == "Jacob"))
  }

  test("takeWhile agrees with top/drop for mixed asc/desc orders (property)") {
    // mixed spec: name desc, surname asc — same order fed to top() (which
    // uses df.orderBy directly) must yield the same prefix as takeWhile
    val mixed = Pipe(people).orderBy(col("name").desc, col("surname"))
    val preds = Seq(
      col("name") =!= "Jack",
      col("surname") =!= "Lewis",
      col("born").cast("int") % 2 === 0)
    preds.foreach { p =>
      val taken = mixed.takeWhile(p).df.collect().map(_.toSeq).toSeq
      val dropped = mixed.dropWhile(p).df.collect().map(_.toSeq).toSeq
      assert(taken.size + dropped.size == 120, s"partition for $p")
      assert(taken.toSet.intersect(dropped.toSet).isEmpty, s"disjoint for $p")
      // prefix length k ⇒ takeWhile == top(k) row set under the same order
      val topK = mixed.top(taken.size).df.collect().map(_.toSeq).toSet
      assert(taken.toSet == topK, s"takeWhile == top(k) for $p")
    }
  }

  test("takeWhile sorts nulls per the declared null ordering") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val spark = SparkTestSession.spark
    val rows = Seq(Row("a", "1"), Row(null, "2"), Row("b", "3"), Row(null, "4"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("k", StringType), StructField("v", StringType))))
    // asc default = nulls FIRST: prefix while k is null = the two null rows
    val asc = Pipe(df).orderBy(col("k"), col("v")).takeWhile(col("k").isNull)
    assert(asc.df.collect().map(_.getAs[String]("v")).sorted.toSeq == Seq("2", "4"))
    // desc default = nulls LAST: prefix while k not null = a/b rows
    val desc = Pipe(df).orderBy(col("k").desc, col("v")).takeWhile(col("k").isNotNull)
    assert(desc.df.collect().map(_.getAs[String]("v")).sorted.toSeq == Seq("1", "3"))
  }
}
