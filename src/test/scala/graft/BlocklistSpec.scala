package graft

import graft.operators.Blocklist

import org.apache.spark.sql.functions._

/** Aho–Corasick blocklist matching: fuzz-oracled against a naive
  * every-start-position counter, plus the overlap/nesting edge cases
  * and the loud broadcast-size guards. */
class BlocklistSpec extends GraftSpec {

  import spark.implicits._

  /** Naive oracle: count of every start position (overlaps included). */
  private def naiveCount(text: String, pat: String): Long = {
    var n = 0L
    var i = 0
    while (i + pat.length <= text.length) {
      if (text.regionMatches(i, pat, 0, pat.length)) n += 1
      i += 1
    }
    n
  }

  private def naiveMask(text: String, pats: Seq[String]): (String, Long) = {
    val cover = new Array[Boolean](text.length)
    for (p <- pats; i <- 0 to text.length - p.length
         if text.regionMatches(i, p, 0, p.length); j <- i until i + p.length)
      cover(j) = true
    val masked = text.indices.map(i => if (cover(i)) '*' else text.charAt(i)).mkString
    (masked, cover.count(identity).toLong)
  }

  test("countAll matches the naive oracle on random corpora (overlaps, nesting)") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abc"
    for (_ <- 1 to 60) {
      val pats = (1 to (1 + rnd.nextInt(5))).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString).distinct
      val ac = Blocklist.compile(pats)
      val text = (1 to (5 + rnd.nextInt(60))).map(_ => alphabet(rnd.nextInt(3))).mkString
      val got = ac.countAll(text).map { case (pi, n) => ac.patterns(pi.toInt) -> n }.toMap
      val want = pats.map(p => p -> naiveCount(text, p)).filter(_._2 > 0).toMap
      assert(got == want, s"text=$text pats=$pats")
      // positions agree with the naive every-start scan
      val gotPos = ac.matchEnds(text)
        .map { case (pi, e) => (ac.patterns(pi), e - ac.patterns(pi).length + 1) }
        .sorted
      val wantPos = (for {
        p <- pats; i <- 0 to text.length - p.length
        if text.regionMatches(i, p, 0, p.length)
      } yield (p, i)).sorted
      assert(gotPos == wantPos, s"pos text=$text pats=$pats")
      assert(ac.containsAny(text) == want.nonEmpty)
      val (gm, gn) = ac.maskCovered(text)
      val (wm, wn) = naiveMask(text, pats)
      assert(gm == wm && gn == wn, s"mask text=$text pats=$pats")
    }
  }

  test("a pattern nested inside another is reported independently") {
    val ac = Blocklist.compile(Seq("scan", "scan scan"))
    val got = ac.countAll("scan scan scan").map {
      case (pi, n) => ac.patterns(pi.toInt) -> n }.toMap
    assert(got == Map("scan" -> 3L, "scan scan" -> 2L))
  }

  test("matchCounts / filterClean / maskCovered / annotate over a DataFrame") {
    val docs = Seq(
      (1L, "aaa bcd aa"), (2L, "xbcdy aaa"), (3L, "clean doc"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val pats = Seq("aa", "bcd").toDF("pattern")

    val mc = Blocklist.matchCounts(docs, "doc_id", "text", pats)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(mc == Map((1L, "aa") -> 3L, (1L, "bcd") -> 1L,
      (2L, "aa") -> 2L, (2L, "bcd") -> 1L))

    val clean = Blocklist.filterClean(docs, "text", pats)
      .select("doc_id").as[Long].collect().toSet
    assert(clean == Set(3L, 4L)) // NULL text passes — nothing to match

    val masked = Blocklist.maskCovered(docs, "doc_id", "text", pats)
      .collect().map(r => r.getLong(0) ->
        (Option(r.getString(1)), r.getLong(2))).toMap
    assert(masked(1L) == (Some("*** *** **"), 8L))
    assert(masked(2L) == (Some("x***y ***"), 6L))
    assert(masked(3L) == (Some("clean doc"), 0L))
    assert(masked(4L) == (None, 0L))

    val ann = Blocklist.annotate(docs, "text", pats)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_blocked"), r.getAs[Int]("n_blocked_patterns"))).toMap
    assert(ann == Map(1L -> ((4L, 2)), 2L -> ((3L, 2)),
      3L -> ((0L, 0)), 4L -> ((0L, 0))))
  }

  test("guards: empty pattern, oversized pattern table, empty list") {
    intercept[IllegalArgumentException](Blocklist.compile(Seq("a", "")))
    intercept[IllegalArgumentException](Blocklist.compile(Nil))
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val pats = (1 to 10).map(i => s"p$i").toDF("pattern")
    val e = intercept[IllegalArgumentException](
      Blocklist.matchCounts(docs, "doc_id", "text", pats, maxPatterns = 5))
    assert(e.getMessage.contains("maxPatterns"))
    val e2 = intercept[IllegalArgumentException](
      Blocklist.matchCounts(docs, "doc_id", "text", pats, maxPatternChars = 3L))
    assert(e2.getMessage.contains("maxPatternChars"))
  }

  test("duplicate patterns collapse instead of double-counting") {
    val ac = Blocklist.compile(Seq("ab", "ab"))
    assert(ac.patterns.length == 1)
    assert(ac.countAll("abab").values.sum == 2L)
  }

  test("annotateStreamed drains a landing dir and equals the batch form") {
    val base = java.nio.file.Files.createTempDirectory("bl_stream").toString
    val docs = Seq((1L, "aaa bcd aa"), (2L, "xbcdy aaa"), (3L, "clean doc"))
      .toDF("doc_id", "text")
    val pats = Seq("aa", "bcd").toDF("pattern")
    // several files → several micro-batches
    docs.repartition(3).write.parquet(s"$base/landing")
    Blocklist.annotateStreamed(spark, s"$base/landing", "text", s"$base/out",
      pats, checkpointDir = Some(s"$base/ckpt"))
    val streamed = spark.read.parquet(s"$base/out")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocked"), r.getAs[Int]("n_blocked_patterns"))).toMap
    val batch = Blocklist.annotate(docs, "text", pats)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_blocked"), r.getAs[Int]("n_blocked_patterns"))).toMap
    assert(streamed == batch)
  }
}
