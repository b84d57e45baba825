package graft

import graft.operators.{Index, Pipe}

import org.apache.spark.sql.functions._

/** Join / Except semantics — csvplus_test.go:248-452, 573-693. */
class JoinSpec extends GraftSpec {

  private lazy val custIdx = Index.uniqueIndexOn(
    people.withColumnRenamed("id", "cust_id"), "cust_id")
  private lazy val prodIdx = Index.uniqueIndexOn(
    stock, "prod_id")

  test("join merges index ∪ probe columns, probe order/values intact (csvplus_test.go:368-452)") {
    val joined = Pipe(orders).join(custIdx, "cust_id").df
    // 5 order cols + 3 people cols (cust_id collides, probe wins)
    assert(joined.columns.toSet ==
      Set("order_id", "cust_id", "prod_id", "qty", "ts", "name", "surname", "born"))
    assert(joined.count() == Fixtures.numOrders) // unique FK → 1:1
    // field-level ground truth: every joined row's name/surname match the FK
    val peopleById = Fixtures.peopleData.map(p => p.id -> p).toMap
    joined.collect().foreach { r =>
      val p = peopleById(r.getAs[String]("cust_id"))
      assert(r.getAs[String]("name") == p.name)
      assert(r.getAs[String]("surname") == p.surname)
    }
  }

  test("natural join (no probe columns) joins on the index key names") {
    val joined = Pipe(orders).join(prodIdx).df
    assert(joined.count() == Fixtures.numOrders)
    val priceByProd = Fixtures.stockData.map(s => s.prodId -> s.price).toMap
    joined.collect().foreach { r =>
      assert(r.getAs[String]("price") == priceByProd(r.getAs[String]("prod_id")))
    }
  }

  test("two-hop join chain sums per-customer qty like the reference (csvplus_test.go:429-451)") {
    val joined = Pipe(orders).join(custIdx, "cust_id").join(prodIdx).df
    val got = joined.groupBy(col("cust_id"))
      .agg(sum(col("qty").cast("long")).as("total"))
      .collect().map(r => r.getAs[String]("cust_id") -> r.getAs[Long]("total")).toMap
    val want = Fixtures.ordersData.groupBy(_.custId)
      .view.mapValues(_.map(_.qty.toLong).sum).toMap
    assert(got == want)
  }

  test("prefix join: fewer probe columns than index key gives 1:N (range) semantics") {
    // index people on (name, surname); probe a name column only
    val nameIdx = Index.indexOn(people, "name", "surname")
    val probe = Pipe(stock.withColumn("name", lit("Amelia")))
    val out = probe.join(nameIdx, "name").df
    assert(out.count() == 8 * 12) // every stock row × 12 Amelias
  }

  test("too many probe columns panics (reference parity)") {
    val e = intercept[IllegalArgumentException] {
      Pipe(orders).join(Index.indexOn(people, "id"), "cust_id", "prod_id")
    }
    assert(e.getMessage == "too many source columns in Join()")
  }

  test("collision rule: probe (source) value wins (csvplus.go:571-583)") {
    val probe = Pipe(orders).mapColumns("born" -> lit("FROM_PROBE"))
    val out = probe.join(custIdx, "cust_id").df
    assert(out.select("born").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("FROM_PROBE"))
  }

  test("except: anti-join drops every order of the excluded key set (csvplus_test.go:651-693)") {
    val emilies = Index.indexOn(
      people.filter(col("name") === "Emily").withColumnRenamed("id", "cust_id"),
      "cust_id")
    val kept = Pipe(orders).except(emilies, "cust_id").df
    assert(kept.columns.toSeq == orders.columns.toSeq) // probe unchanged
    val emilyIds = Fixtures.peopleData.filter(_.name == "Emily").map(_.id).toSet
    val wantCount = Fixtures.ordersData.count(o => !emilyIds.contains(o.custId))
    assert(kept.count() == wantCount)
    assert(kept.filter(col("cust_id").isin(emilyIds.toSeq: _*)).count() == 0)
  }

  test("self-join via subIndex (csvplus_test.go:601-624)") {
    val idx = Index.indexOn(people, "name", "surname")
    val sub = idx.subIndex("Amelia") // keyed by surname now
    val probe = Pipe(people.filter(col("name") === "Olivia"))
    val out = probe.join(sub, "surname").df
    assert(out.count() == 12) // each Olivia surname matches exactly one Amelia
  }

  test("joinSalted produces exactly the same rows as join") {
    val plain = Pipe(orders).join(custIdx, "cust_id").df
      .collect().map(_.toSeq).toSeq.sorted(RowOrd)
    val salted = Pipe(orders).joinSalted(custIdx, 8, "cust_id").df
      .collect().map(_.toSeq).toSeq.sorted(RowOrd)
    assert(plain == salted)
  }

  private object RowOrd extends Ordering[Seq[Any]] {
    def compare(a: Seq[Any], b: Seq[Any]): Int =
      a.map(String.valueOf(_)).mkString("")
        .compareTo(b.map(String.valueOf(_)).mkString(""))
  }

  test("resolveDuplicates: typed resolver picks per-group, declarative twin agrees") {
    val idx = Index.indexOn(people, "name")
    val typed = idx.resolveDuplicates { rows =>
      Some(rows.minBy(_.getAs[String]("surname")))
    }
    val decl = idx.resolveDuplicatesBy(col("surname").asc)
    val a = typed.iterate.select("name", "surname").collect().map(_.toSeq).toSet
    val b = decl.iterate.select("name", "surname").collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.size == 10) // one per name
    // dropping whole groups: resolver returning None
    val dropped = idx.resolveDuplicates(_ => None)
    assert(dropped.iterate.count() == 0) // every name group has 12 dups
  }
}
