package graft

import graft.operators.Temporal

import org.apache.spark.sql.functions._

/** As-of join semantics on hand-built rows. */
class TemporalSpec extends GraftSpec {

  import spark.implicits._

  private lazy val trades = Seq(
    (1L, "A", 100L), (2L, "A", 205L), (3L, "B", 50L), (4L, "C", 10L)
  ).toDF("trade_id", "sym", "t")

  private lazy val quotes = Seq(
    (10L, "A", 90L), (11L, "A", 100L), (12L, "A", 200L),
    (13L, "B", 60L) // after B's only trade
  ).toDF("quote_id", "sym", "qt")

  test("asof join picks the latest right row at-or-before each left row") {
    val out = Temporal.asofJoin(trades, quotes, "sym", "sym", "t", "qt",
      Map("quote_id" -> "quote_id", "qt" -> "quote_time"))
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(out(1L) == Some(11L)) // tie at t=100 is inclusive
    assert(out(2L) == Some(12L)) // 200 < 205, latest prior
    assert(out(3L) == None)      // only quote is later
    assert(out(4L) == None)      // no quotes for key C
  }

  test("forward asof picks the earliest right row at-or-after each left row") {
    val out = Temporal.asofJoin(trades, quotes, "sym", "sym", "t", "qt",
      Map("quote_id" -> "quote_id"), direction = "forward")
      .collect().map(r => r.getAs[Long]("trade_id") ->
        Option(r.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
    assert(out(1L) == Some(11L)) // tie at t=100 is inclusive
    assert(out(2L) == None)      // no quote at/after 205
    assert(out(3L) == Some(13L)) // next quote at 60 >= 50
    assert(out(4L) == None)      // no quotes for key C
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, "sym", "sym", "t", "qt",
        Map("quote_id" -> "quote_id"), direction = "sideways")
    }
  }

  test("null times: null-time left rows match nothing; null-time right rows are ignored") {
    val l = Seq((1L, "A", Some(100L)), (2L, "A", Option.empty[Long]))
      .toDF("trade_id", "sym", "t")
    val r = Seq((10L, "A", Some(90L)), (11L, "A", Option.empty[Long]))
      .toDF("quote_id", "sym", "qt")
    for (d <- Seq("backward", "forward")) {
      val out = Temporal.asofJoin(l, r, "sym", "sym", "t", "qt",
        Map("quote_id" -> "quote_id"), direction = d)
        .collect().map(x => x.getAs[Long]("trade_id") ->
          Option(x.getAs[java.lang.Long]("quote_id")).map(_.toLong)).toMap
      assert(out(2L).isEmpty, s"null probe time must match nothing ($d)")
      // the null-time quote is never attached
      assert(out(1L) == (if (d == "backward") Some(10L) else None), s"dir=$d: $out")
    }
  }

  test("duplicate (key, time) right rows resolve deterministically (struct-greatest)") {
    val dupQuotes = Seq(
      (11L, "A", 100L), (12L, "A", 100L) // same sym, same time
    ).toDF("quote_id", "sym", "qt")
    val picks = (1 to 5).map { _ =>
      Temporal.asofJoin(trades.filter(col("trade_id") === 1L), dupQuotes,
        "sym", "sym", "t", "qt", Map("quote_id" -> "quote_id"))
        .collect().head.getAs[Long]("quote_id")
    }
    assert(picks.distinct.size == 1 && picks.head == 12L)
  }

  test("internal temp-column collisions are rejected up front") {
    val clash = trades.withColumnRenamed("t", "__t")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(clash, quotes, "sym", "sym", "__t", "qt",
        Map("quote_id" -> "quote_id"))
    }
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(trades, quotes, "sym", "sym", "t", "qt",
        Map("quote_id" -> "__c"))
    }
  }

  test("all attached columns come from the same right row") {
    val out = Temporal.asofJoin(trades, quotes, "sym", "sym", "t", "qt",
      Map("quote_id" -> "quote_id", "qt" -> "quote_time"))
      .filter(col("trade_id") === 2L).collect().head
    assert(out.getAs[Long]("quote_id") == 12L)
    assert(out.getAs[Long]("quote_time") == 200L)
  }
}
