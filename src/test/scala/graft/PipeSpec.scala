package graft

import graft.functions.{Preds, RowFunctions}
import graft.operators.Pipe

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Projections / filters / transforms / validation — reference
  * semantics from csvplus_test.go:49-170, 808-958. */
class PipeSpec extends GraftSpec {

  test("selectColumns keeps exactly the named columns") {
    val got = Pipe(people).selectColumns("name", "surname").df
    assert(got.columns.toSeq == Seq("name", "surname"))
    assert(got.count() == 120)
  }

  test("selectColumns on a missing column fails (reference: missing column %q)") {
    val e = intercept[IllegalArgumentException] {
      Pipe(people).selectColumns("name", "nope")
    }
    assert(e.getMessage == """missing column "nope"""")
  }

  test("selectColumns with empty list panics (reference parity)") {
    val e = intercept[IllegalArgumentException] { Pipe(people).selectColumns() }
    assert(e.getMessage == "no columns specified in SelectColumns()")
  }

  test("dropColumns removes listed, ignores absent, rejects empty list") {
    val got = Pipe(people).dropColumns("born", "not_there").df
    assert(got.columns.toSeq == Seq("id", "name", "surname"))
    val e = intercept[IllegalArgumentException] { Pipe(people).dropColumns() }
    assert(e.getMessage == "no columns specified in DropColumns()")
  }

  test("filter + map pipeline matches ground truth (csvplus_test.go:153-170)") {
    // all Amelias, surname upper-cased
    val got = Pipe(people)
      .filter(Preds.like(Map[String, Any]("name" -> "Amelia")))
      .mapColumns("surname" -> upper(col("surname")))
      .df.collect().map(r => (r.getString(1), r.getString(2))).toSet
    val want = Fixtures.peopleData.filter(_.name == "Amelia")
      .map(p => ("Amelia", p.surname.toUpperCase)).toSet
    assert(got == want)
  }

  test("like predicate rejects empty match row (reference panic)") {
    val e = intercept[IllegalArgumentException] { Preds.like(Map.empty[String, Any]) }
    assert(e.getMessage.contains("empty match row"))
  }

  test("all/any combinators reject empty predicate lists") {
    intercept[IllegalArgumentException] { Preds.all() }
    intercept[IllegalArgumentException] { Preds.any() }
  }

  test("transformRows: 0/1 fan-out drops rows and reshapes schema") {
    val outSchema = StructType(Seq(
      StructField("id", StringType), StructField("born_i", IntegerType)))
    val got = Pipe(people).transformRows(outSchema) { r =>
      val born = r.getAs[String]("born").toInt
      if (born > 1970) Some(Row(r.getAs[String]("id"), born)) else None
    }.df
    val want = Fixtures.peopleData.filter(_.born.toInt > 1970)
    assert(got.count() == want.length)
    assert(got.columns.toSeq == Seq("id", "born_i"))
  }

  test("validate aborts on first violating row (reference Validate)") {
    val e = intercept[Exception] {
      Pipe(people)
        .validate(col("born").cast("int") < 2000,
          format_string("person %s born too late", col("id")))
        .df.count()
    }
    assert(e.getMessage.contains("born too late"))
  }

  test("validateRows (arbitrary Scala) aborts the run on error") {
    intercept[Exception] {
      Pipe(people).validateRows { r =>
        if (r.getAs[String]("name") == "Emily") sys.error("no Emilys allowed")
      }.df.count()
    }
  }

  test("valueAsInt casts and raises the reference error text on garbage") {
    val ok = people.select(
      RowFunctions.valueAsInt(col("born"), "born").as("b"))
    assert(ok.agg(min(col("b"))).head().getLong(0) >= 1916)

    val e = intercept[Exception] {
      people.select(
        RowFunctions.valueAsInt(col("name"), "name").as("b")).collect()
    }
    assert(e.getMessage.contains("""column "name": cannot convert "Amelia" to integer"""))
  }

  test("safeGet substitutes for null (reference SafeGetValue)") {
    val df = people.withColumn("maybe",
      when(col("name") === "Amelia", lit(null: String)).otherwise(col("name")))
    val got = df.select(RowFunctions.safeGet(col("maybe"), "?").as("v"))
      .filter(col("v") === "?").count()
    assert(got == 12) // 12 Amelias
  }

  test("union preserves multiset semantics") {
    val a = Pipe(people).filter(col("name") === "Amelia")
    val b = Pipe(people).filter(col("name") === "Olivia")
    assert(a.union(b).df.count() == 24)
  }

  test("observe: metrics are computed during the action, no second pass") {
    val obs = new org.apache.spark.sql.Observation("kept")
    val rows = Pipe(people)
      .filter(col("name") === "Amelia")
      .observe(obs, count(lit(1)).as("n_kept"),
        max(col("surname")).as("max_surname"))
      .toRows
    val m = obs.get
    assert(rows.size == 12)
    assert(m("n_kept") == 12L)
    assert(m("max_surname") == rows.map(_.getAs[String]("surname")).max)
  }
}
