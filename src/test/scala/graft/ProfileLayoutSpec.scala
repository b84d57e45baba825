package graft

import graft.operators.{Dedup, Layout, Stats}

import org.apache.spark.sql.functions._

/** Round-4 operators: column profiling, equi-width histograms, MAD
  * outlier flags, paragraph-level dedup, clustered writes/compaction. */
class ProfileLayoutSpec extends GraftSpec {

  import spark.implicits._

  // ── column profile ──

  test("profile reports rows, nulls, distincts, min/max per column") {
    val df = Seq(
      (Some("b"), Some(1L)), (Some("a"), Some(2L)),
      (Some("a"), None), (None, Some(2L))
    ).toDF("s", "n")
    val p = Stats.profile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(p("s") == ((4L, 1L, 2L, Some("a"), Some("b"))))
    assert(p("n") == ((4L, 1L, 2L, Some("1"), Some("2"))))
    intercept[IllegalArgumentException](Stats.profile(df, Seq.empty))
  }

  test("profile of an empty input still names every column (n_rows=0)") {
    val df = Seq.empty[(String, Option[Long])].toDF("s", "n")
    val p = Stats.profile(df, Seq("s", "n"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          Option(r.getString(4)), Option(r.getString(5))))).toMap
    assert(p.keySet == Set("s", "n"))
    assert(p.values.forall(_ == ((0L, 0L, 0L, None, None))))
  }

  test("profile batches wide inputs: 32 columns read the input in 4 scans") {
    val wide = spark.range(0L, 50L)
      .select((0 until 32).map(i => (col("id") * i).as(s"c$i")): _*)
    val prof = Stats.profile(wide, (0 until 32).map(i => s"c$i"))
    // correctness on the wide frame: every column reports, c0 is the
    // constant 0 (1 distinct), c1 is the id itself (50 distinct)
    val p = prof.collect().map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(3)))).toMap
    assert(p.size == 32)
    assert(p("c0") == ((50L, 1L)) && p("c1") == ((50L, 50L)))
    // plan pin: ceil(32/8) = 4 scans of the input, not one per column
    // (the r7-flagged linear job overhead) — and never one giant Expand
    val scans = prof.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Range => r
    }.size
    assert(scans == 4, s"expected 4 batched scans of the Range input, got $scans")
  }

  // ── equi-width histogram ──

  test("numericHistogram bins span [min,max] with the max in the last bin") {
    val df = (0 to 100).map(_.toDouble).toDF("v")
    val h = Stats.numericHistogram(df, "v", 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(h.length == 10)
    assert(h.head._2 == 0.0 && h.last._3 == 100.0)
    // bins 0..8 hold 10 values each ([0,10), [10,20)…), bin 9 holds 11
    // (90..100 — right edge closed on the last bin)
    assert(h.dropRight(1).forall(_._4 == 10L) && h.last._4 == 11L)
  }

  test("numericHistogram degenerate all-equal input lands in bin 0") {
    val h = Seq(5.0, 5.0, 5.0).toDF("v")
    val out = Stats.numericHistogram(h, "v", 4).collect()
    assert(out.length == 1 && out.head.getLong(0) == 0L && out.head.getLong(3) == 3L)
  }

  // ── MAD outliers ──

  test("madOutliers flags far points but not a shifted-median cluster") {
    // group g: 1..9 plus one wild point. median = 5 (10 values → rank
    // ceil(5.0)=5), devs are 0..4 and 9995; mad = 3 (rank 5 of
    // 0,1,1,2,2,3,3,4,4,9995) → fence 9; only 10000 is out
    val df = ((1 to 9).map(v => ("g", v.toLong)) :+ (("g", 10000L)))
      .toDF("grp", "v")
    val out = Stats.madOutliers(df, "grp", "v", k = 3.0)
      .collect().map(r => r.getAs[Long]("v") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(out(10000L), "wild point must be flagged")
    assert((1 to 9).forall(v => !out(v.toLong)), "cluster points are inliers")
  }

  test("madOutliers handles NULL group keys and NULL values") {
    val df = Seq((Option.empty[String], Some(1L)), (None, Some(2L)),
      (None, Some(1000L)), (Some("g"), None)).toDF("grp", "v")
    val rows = Stats.madOutliers(df, "grp", "v", k = 3.0).collect()
    val nullGrp = rows.filter(_.isNullAt(0)).map(r =>
      r.getAs[Long]("v") -> r.getAs[Boolean]("is_outlier")).toMap
    assert(nullGrp(1000L), "NULL-group rows get their own group's fence")
    assert(!nullGrp(1L) && !nullGrp(2L))
    assert(rows.filter(r => !r.isNullAt(0)).forall(_.isNullAt(rows.head.length - 1)),
      "NULL value rows have NULL flag")
  }

  // ── pearson ──

  test("pearson: perfect, inverse, and degenerate correlations") {
    val df = Seq(
      ("up", 1.0, 2.0), ("up", 2.0, 4.0), ("up", 3.0, 6.0),
      ("down", 1.0, 3.0), ("down", 2.0, 2.0), ("down", 3.0, 1.0),
      ("flat", 1.0, 5.0), ("flat", 2.0, 5.0)
    ).toDF("g", "x", "y")
      .select(col("g"), col("x").cast("decimal(10,2)").as("x"),
        col("y").cast("decimal(10,2)").as("y"))
    val out = Stats.pearson(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out("up")._2.exists(c => math.abs(c - 1.0) < 1e-12))
    assert(out("down")._2.exists(c => math.abs(c + 1.0) < 1e-12))
    assert(out("flat")._2.isEmpty, "zero y-variance must be NULL, not NaN")
  }

  test("ksDrift: exact D for hand-computed samples; empty sides omitted") {
    // group g1: A = {1, 2, 3}, B = {2, 3, 4} → ECDFs diverge by exactly
    // 1/3 at every step: D_num = max|i·m − j·n| = 3 over n·m = 9
    // group g2: identical samples → D = 0
    // group g3: only side A → omitted
    val df = Seq(
      ("g1", 1.0, false), ("g1", 2.0, false), ("g1", 3.0, false),
      ("g1", 2.0, true), ("g1", 3.0, true), ("g1", 4.0, true),
      ("g2", 5.0, false), ("g2", 7.0, false),
      ("g2", 5.0, true), ("g2", 7.0, true),
      ("g3", 9.0, false)
    ).toDF("g", "v", "b")
    val out = Stats.ksDrift(df, "g", "v", col("b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out("g1") == ((3L, 3L, 3L, 3.0 / 9.0)))
    assert(out("g2") == ((2L, 2L, 0L, 0.0)))
    assert(!out.contains("g3"), "a group with an empty side has no D")
    // disjoint supports: D = 1 exactly
    val disj = Stats.ksDrift(
      Seq(("g", 1.0, false), ("g", 2.0, false), ("g", 10.0, true))
        .toDF("g", "v", "b"), "g", "v", col("b"))
      .collect().head
    assert(disj.getLong(3) == 2L && disj.getDouble(4) == 1.0)
  }

  test("histDrift: exact χ² for hand-computed bins; clamping; zero when identical") {
    // one group, [0,40) in 2 bins (width 20):
    // A = {1, 1, 30}  → bins (0,0,1) → ca = (2,1), n_a = 3
    // B = {1, 30, 30} → bins (0,1,1) → cb = (1,2), n_b = 3
    // per bin: |ca·n_b − cb·n_a| = 3 → term = 9 / (9 · 9) = 1/9 each
    val df = Seq(
      ("g", 1.0, false), ("g", 1.0, false), ("g", 30.0, false),
      ("g", 1.0, true), ("g", 30.0, true), ("g", 30.0, true)
    ).toDF("g", "v", "b")
    val out = Stats.histDrift(df, "g", "v", col("b"), 0.0, 40.0, 2)
      .collect().head
    assert(out.getLong(1) == 3L && out.getLong(2) == 3L && out.getLong(3) == 2L)
    assert(out.getDouble(4) == 1.0 / 9.0 + 1.0 / 9.0, s"chi2 = ${out.getDouble(4)}")
    // identical sides → exactly zero drift
    val same = Stats.histDrift(
      Seq(("g", 5.0, false), ("g", 5.0, true)).toDF("g", "v", "b"),
      "g", "v", col("b"), 0.0, 40.0, 4).collect().head
    assert(same.getDouble(4) == 0.0)
    // out-of-range values clamp into the edge bins instead of dropping
    val clamped = Stats.histDrift(
      Seq(("g", -99.0, false), ("g", 999.0, true)).toDF("g", "v", "b"),
      "g", "v", col("b"), 0.0, 40.0, 4).collect().head
    assert(clamped.getLong(3) == 2L, "both outliers must land in (clamped) bins")
    intercept[IllegalArgumentException](
      Stats.histDrift(df, "g", "v", col("b"), 40.0, 0.0, 4))
  }

  // ── paragraph dedup ──

  test("paragraphDedup keeps first corpus-wide occurrence and reassembles in order") {
    val docs = Seq(
      (1L, "intro\nshared-banner\nbody one"),
      (2L, "shared-banner\nbody two"),
      (3L, "shared-banner") // loses its only paragraph → dropped
    ).toDF("id", "txt")
    val out = Dedup.paragraphDedup(docs, "id", "txt")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "intro\nshared-banner\nbody one", "first doc intact")
    assert(out(2L) == "body two", "repeated banner removed")
    assert(!out.contains(3L), "fully-deduplicated doc is dropped")
  }

  test("paragraphDedup collapses duplicate paragraphs within one document") {
    val docs = Seq((7L, "x\ny\nx\nz")).toDF("id", "txt")
    val out = Dedup.paragraphDedup(docs, "id", "txt").collect()
    assert(out.head.getString(1) == "x\ny\nz")
  }

  test("removeBoilerplateLines drops every occurrence of high-df lines") {
    val docs = Seq(
      (1L, "banner\nunique one\nbanner"), // internal repeat counts ONCE
      (2L, "banner\nunique two"),
      (3L, "banner\nunique three"),
      (4L, "only unique"),
      (5L, "banner") // all lines boilerplate → "" (cardinality kept)
    ).toDF("id", "txt")
    val out = Dedup.removeBoilerplateLines(docs, "id", "txt", minDocs = 3)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique one", "both banner copies removed, df counted per doc")
    assert(out(2L) == "unique two" && out(3L) == "unique three")
    assert(out(4L) == "only unique", "untouched doc passes through")
    assert(out(5L) == "", "fully-boilerplate doc kept as empty text")
    assert(out.size == 5)
    // below the threshold nothing is removed (banner df = 4 < 5)
    val keep = Dedup.removeBoilerplateLines(docs, "id", "txt", minDocs = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keep(1L) == "banner\nunique one\nbanner")
    intercept[IllegalArgumentException](
      Dedup.removeBoilerplateLines(docs, "id", "txt", minDocs = 1))
  }

  // ── layout ──

  test("writeClustered round-trips content and produces range-disjoint files") {
    val df = (1 to 1000).map(i => (i.toLong, s"r$i")).toDF("k", "s")
    val out = Scratch.path("layout_clustered")
    Layout.writeClustered(df, out, Seq("k"), numFiles = 4)
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("k"))).head().getLong(0) == 500500L)
    // each file owns a disjoint k-range (clustering actually happened):
    // per-file [min,max] intervals must not overlap
    val ranges = back
      .select(col("k"), input_file_name().as("f"))
      .groupBy(col("f")).agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple files")
    assert(ranges.sliding(2).forall {
      case Array((_, hi1), (lo2, _)) => hi1 < lo2
      case _                         => true
    }, s"file ranges overlap: ${ranges.mkString(",")}")
  }

  test("compact merges small files without losing rows") {
    val df = (1 to 100).map(i => (i.toLong, s"r$i")).toDF("k", "s")
    val manyOut = Scratch.path("layout_many")
    df.repartition(20).write.mode("overwrite").parquet(manyOut)
    val compactOut = Scratch.path("layout_compact")
    Layout.compact(spark.read.parquet(manyOut), compactOut, numFiles = 2)
    val files = new java.io.File(compactOut).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(files.length == 2, s"expected 2 files, got ${files.length}")
    assert(spark.read.parquet(compactOut).count() == 100)
  }

  test("zValue interleaves bits exactly (exhaustive 16×16 grid vs reference)") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long = {
      var z = 0L
      for (b <- 0 until bits) {
        z |= ((x >>> b) & 1L) << (2 * b)
        z |= ((y >>> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val grid = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.operators.Layout.zValue(Seq(col("x"), col("y")), bits = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    grid.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y, 4), s"($x,$y)")
    }
    // the 256 grid z-values are a permutation of 0..255 (bijectivity)
    assert(got.values.toSeq.sorted == (0L until 256L))
  }

  test("zValue rejects negatives and over-wide configurations") {
    import spark.implicits._
    assertThrows[Exception] {
      Seq((-1L, 2L)).toDF("x", "y")
        .select(graft.operators.Layout.zValue(Seq(col("x"), col("y")), 4))
        .collect()
    }
    assertThrows[Exception] {
      Seq((1L, 2L)).toDF("x", "y")
        .select(graft.operators.Layout.zValue(Seq(col("x"), col("y")), 32))
        .collect()
    }
  }

  test("writeZOrdered preserves content and clusters the box query into few files") {
    import spark.implicits._
    val rows = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val out = graft.Scratch.path("zorder_spec")
    graft.operators.Layout.writeZOrdered(rows, out, Seq("x", "y"),
      numFiles = 16, bits = 6)
    val back = spark.read.parquet(out)
    assert(back.count() == 64 * 64)
    assert(back.columns.toSet == Set("x", "y")) // the z column is dropped
    // content identical
    assert(back.select("x", "y").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toSet)
    // locality: a 8×8 box (1/64 of the space) must touch a bounded
    // subset of the 16 z-range files — with lexicographic-on-x
    // clustering a y-box would touch EVERY file; the z-curve keeps a
    // square box inside a few z-ranges (≤ 4 of 16 here, exact by
    // construction for power-of-two-aligned boxes)
    val withFile = back.withColumn("__f", input_file_name())
      .filter(col("x") >= 16 && col("x") < 24 && col("y") >= 16 && col("y") < 24)
    val nFiles = withFile.select("__f").distinct().count()
    assert(nFiles <= 4, s"aligned 8×8 box touched $nFiles of 16 z-range files")
  }

  private def scannedFiles(q: org.apache.spark.sql.DataFrame): Long =
    q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.head.selectedPartitions.totalNumberOfFiles

  test("writeClusteredStore: manifest-stat pruning bounds a range scan, " +
    "no file opens") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_lcs_").toString
    val rel = s"$dir/rel"
    Layout.writeClusteredStore(
      (0L until 8000L).map(i => (i, i % 5)).toDF("k", "v"),
      rel, Seq("k"), numFiles = 16)
    // a 500-wide range over 500-wide clustered files: ≤ 2 files of 16,
    // decided by the FileIndex from the manifest's recorded [min,max]
    // BEFORE the scan plans — not by parquet footers at execution
    val q = graft.operators.Store.read(spark, rel)
      .filter(col("k") >= 2000L && col("k") < 2500L)
    assert(scannedFiles(q) <= 2L)
    assert(q.count() == 500L)
  }

  test("writeZOrderedStore: a predicate on EITHER dimension prunes " +
    "files from the manifest stats") {
    import spark.implicits._
    val rows = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_lzs_").toString
    val rel = s"$dir/rel"
    Layout.writeZOrderedStore(rows, rel, Seq("x", "y"),
      numFiles = 16, bits = 6)
    val back = graft.operators.Store.read(spark, rel)
    assert(back.count() == 64 * 64)
    // the z column is STORED (maintenance rewrites re-cluster on it)
    assert(back.columns.toSet == Set("x", "y", "__graft_z"))
    // each z-range file covers a small rectangle, so its manifest
    // [min,max] on BOTH original columns is narrow: a 16-wide slab in
    // x prunes most files, and so does one in y — the multi-dim
    // skipping lexicographic clustering cannot give the trailing column
    val qx = back.filter(col("x") >= 16 && col("x") < 32)
    val qy = back.filter(col("y") >= 16 && col("y") < 32)
    assert(scannedFiles(qx) <= 8L,
      s"x-slab touched ${scannedFiles(qx)} of 16 z-range files")
    assert(scannedFiles(qy) <= 8L,
      s"y-slab touched ${scannedFiles(qy)} of 16 z-range files")
    assert(qx.count() == 16 * 64 && qy.count() == 16 * 64)
  }
}
