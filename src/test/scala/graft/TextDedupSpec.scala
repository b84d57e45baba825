package graft

import graft.functions.TextFunctions
import graft.operators.Dedup

import org.apache.spark.sql.functions._

/** Text analysis + dedup operators over planted fixtures. */
class TextDedupSpec extends GraftSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 0
    (2L, "a completely different document about apples bananas oranges pears and plums"),
    (3L, "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 0
    (4L, "der hund läuft nicht zu dem haus und die katze ist auf dem dach mit vogel"),
    (5L, "le chat est dans la maison et les oiseaux sont dans les arbres pour la nuit"),
    (6L, "short"),
    (7L, "")
  ).toDF("doc_id", "text")

  test("tokenCount / tokenChars / fingerprint basics") {
    val r = docs.select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.fingerprint(col("text")).as("fp"))
      .collect().map(x => x.getLong(0) -> (x.getInt(1), x.getLong(2))).toMap
    assert(r(6L)._1 == 1)
    assert(r(7L)._1 == 0)
    assert(r(0L)._1 == 14)
    assert(r(0L)._2 == r(3L)._2) // identical docs → identical fingerprint
    assert(r(0L)._2 != r(1L)._2)
  }

  test("langId classifies by stopword hits; 'und' with no hits") {
    val r = docs.select(col("doc_id"), TextFunctions.langId(col("text")).as("l"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(0L) == "en")
    assert(r(4L) == "de")
    assert(r(5L) == "fr")
    assert(r(7L) == "und")
  }

  test("qualityScore is in [0,1] and favors natural text over fragments") {
    val r = docs.select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.values.forall(q => q >= 0.0 && q <= 1.0))
    assert(r(0L) > r(6L)) // real sentence beats "short"
    assert(r(7L) == 0.0)
  }

  test("chunks: windowed token chunks with overlap, short docs yield one chunk") {
    val r = docs.select(col("doc_id"),
      explode(TextFunctions.chunks(col("text"), 10, 2)).as("c"))
      .select(col("doc_id"), col("c.chunk_start"), col("c.chunk_text"))
      .collect().groupBy(_.getLong(0))
    // doc 0 has 14 tokens → starts 0, 8 (step = 10 - 2)
    assert(r(0L).map(_.getInt(1)).sorted.toSeq == Seq(0, 8))
    val chunk0 = r(0L).find(_.getInt(1) == 0).get.getString(2)
    assert(chunk0.split(" ").length == 10)
    val chunk8 = r(0L).find(_.getInt(1) == 8).get.getString(2)
    assert(chunk8.split(" ").length == 6) // tail chunk, tokens 9..14
    // overlap: last 2 tokens of chunk0 = first 2 of chunk8
    assert(chunk0.split(" ").takeRight(2).toSeq == chunk8.split(" ").take(2).toSeq)
    // single-token and empty docs yield exactly one chunk
    assert(r(6L).length == 1 && r(6L).head.getString(2) == "short")
    assert(r(7L).length == 1 && r(7L).head.getString(2) == "")
  }

  test("exact dedup groups identical texts, keeps min id") {
    val out = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(out(0L) == 2) // docs 0 and 3
    assert(!out.contains(3L))
    assert(out.size == 7) // 8 docs, one collapsed pair
  }

  test("minhash LSH finds the near-dup pair and not unrelated docs") {
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleLen = 2, numPerm = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dups
    assert(!pairs.exists { case (a, b) => Set(a, b).contains(2L) })
  }

  test("minhash multiProbe: superset of the plain candidates, identical estimates, gated recall lift") {
    def run(mp: Boolean) = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleLen = 2, numPerm = 64, bands = 16, threshold = 0.5,
      multiProbe = mp)
      .collect().map(r =>
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("est_jaccard")).toMap
    val plain = run(false)
    val probed = run(true)
    // multi-probe only ADDS candidates; the est_jaccard verify is the
    // same expression over the same signatures, so shared pairs carry
    // bit-identical estimates
    plain.foreach { case (pair, est) =>
      assert(probed.get(pair).contains(est), pair)
    }
    // the planted relations still hold (no spurious unrelated pairs:
    // a leave-one-out collision still needs 3 of 4 band rows to agree)
    assert(probed.contains((0L, 3L)))
    assert(!probed.exists { case ((a, b), _) => Set(a, b).contains(2L) })
    // rowsPerBand = 1 would wildcard every document into one bucket
    assertThrows[IllegalArgumentException] {
      Dedup.minHashNearDups(docs, "doc_id", "text",
        shingleLen = 2, numPerm = 64, bands = 64, multiProbe = true)
    }
  }

  test("exact n-gram Jaccard confirms candidates with true similarity") {
    val pairs = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      shingleLen = 2, threshold = 0.8)
      .collect().map(r =>
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 3L)) == 1.0)
    assert(pairs.get((0L, 1L)).exists(j => j > 0.8 && j < 1.0))
  }

  test("exactNgramJaccard (posting-join, no crossJoin) agrees with the LSH-confirmed pairs") {
    val exact = Dedup.exactNgramJaccard(docs, "doc_id", "text",
      n = 2, threshold = 0.5)
      .collect().map(r =>
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    // exact baseline must contain everything the LSH+verify path found
    // at the same threshold, with identical jaccard values
    val lsh = Dedup.ngramJaccardNearDups(docs, "doc_id", "text",
      shingleLen = 2, threshold = 0.5)
      .collect().map(r =>
        (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) -> r.getAs[Double]("jaccard")).toMap
    lsh.foreach { case (pair, j) => assert(exact.get(pair).contains(j), pair) }
    assert(exact((0L, 3L)) == 1.0)
    // no pair below the threshold leaks through
    assert(exact.values.forall(_ >= 0.5))
    // unrelated doc 2 shares no 2-gram with the dup cluster
    assert(!exact.keySet.exists { case (a, b) => Set(a, b).contains(2L) })
  }

  test("allPairsJaccard equals exactNgramJaccard at every threshold (prefix/size/positional filters lose nothing)") {
    // richer corpus than the fixture: deterministic mutations of three
    // base sentences (word swap, truncation, append, shuffle-free) so
    // thresholds slice the pair space at many distinct jaccard values
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet cyan magenta black white gray")
    val mutated = for {
      (b, bi) <- bases.zipWithIndex
      k <- 0 until 12
    } yield {
      val w = b.split(" ")
      val t = k match {
        case 0 => w
        case 1 => w.updated(k % w.length, "swapped")
        case 2 => w.take(w.length - 2)
        case 3 => w ++ Array("extra", "tail")
        case 4 => w.updated(0, "head").updated(w.length - 1, "tail")
        case _ => w.take(4 + k % 8) ++ w.drop(k % 3)
      }
      (bi * 100L + k, t.mkString(" "))
    }
    val d = mutated.toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8, 1.0)) {
      val ref = Dedup.exactNgramJaccard(d, "doc_id", "text", n = 2,
        threshold = t, maxDocsPerGram = Int.MaxValue)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val ap = Dedup.allPairsJaccard(d, "doc_id", "text", n = 2, threshold = t)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(ap == ref, s"threshold $t: allPairs ${ap.size} pairs vs posting ${ref.size}")
      assert(t > 0.9 || ref.nonEmpty, s"vacuous fixture at threshold $t")
    }
  }

  test("allPairsJaccard guard measures prefix postings; duplicates still pair under the guard") {
    // 30 exact copies: identical gram sets share their whole prefix, so
    // prefix df = 30 — the guard counts THAT, not raw gram df
    val copies = (0L until 30L).map(i => (i, "same text everywhere again and again"))
      .toDF("doc_id", "text")
    val out = Dedup.allPairsJaccard(copies, "doc_id", "text", n = 2,
      threshold = 0.9, maxDocsPerGram = 1000)
    assert(out.count() == 30L * 29 / 2)
    val e = intercept[Throwable] {
      Dedup.allPairsJaccard(copies, "doc_id", "text", n = 2,
        threshold = 0.9, maxDocsPerGram = 10).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("maxDocsPerGram")),
      s"diagnostic must name the guard, got: ${messages(e)}")
    // dropHotGrams trims the gram space instead of failing
    assert(Dedup.allPairsJaccard(copies, "doc_id", "text", n = 2,
      threshold = 0.9, maxDocsPerGram = 10, dropHotGrams = true).count() == 0L)
  }

  test("jaccardTopK: exact scores, rank ties to smaller doc_id, k cap, guard trips") {
    val corpus = Seq(
      (10L, "a b c d"),   // grams(2): {a b, b c, c d}
      (11L, "a b c x"),   // {a b, b c, c x}
      (12L, "a b y z"),   // {a b, b y, y z}
      (13L, "p q r s")    // no overlap with the query — must be absent
    ).toDF("doc_id", "text")
    val query = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.jaccardTopK(corpus, "doc_id", "text",
      query, "doc_id", "text", n = 2, k = 3)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        (r.getAs[Long]("shared"), r.getAs[Double]("jaccard"),
          r.getAs[Int]("rnk")))).toMap
    assert(out(10L) == ((3L, 1.0, 1)), "exact copy ranks first at 1.0")
    assert(out(11L) == ((2L, 0.5, 2)), "2 shared / (3+3-2) = 0.5")
    assert(out(12L) == ((1L, 0.2, 3)), "1 shared / (3+3-1) = 0.2")
    assert(!out.contains(13L), "zero-overlap docs never materialize")
    // k caps the list and the zero-overlap doc cannot back-fill it
    val k2 = Dedup.jaccardTopK(corpus, "doc_id", "text",
      query, "doc_id", "text", n = 2, k = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(k2 == Set(10L, 11L))
    // the shared hot-gram guard sees the query side too: "a b" lives in
    // 3 corpus + 1 query docs, so a cap of 3 must fail loudly...
    val boom = intercept[Throwable] {
      Dedup.jaccardTopK(corpus, "doc_id", "text",
        query, "doc_id", "text", n = 2, k = 3, maxDocsPerGram = 3)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(boom).exists(_.contains("jaccardTopK")),
      s"diagnostic must name the caller, got: ${messages(boom)}")
    // ...and dropHotGrams = true downgrades it to documented truncation
    val dropped = Dedup.jaccardTopK(corpus, "doc_id", "text",
      query, "doc_id", "text", n = 2, k = 3, maxDocsPerGram = 3,
      dropHotGrams = true)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("shared")).toMap
    assert(dropped(10L) == 2L, "the hot gram no longer counts as shared")
  }

  test("simhash: identical docs hamming 0; near-dups within 3; unrelated far") {
    val sig = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(3L))
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(1L)) <= 8)
    assert(java.lang.Long.bitCount(sig(0L) ^ sig(2L)) > 8)
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("simhashNearDups banding stays complete for any maxHamming (recall vs exact)") {
    // ground truth: all pairs within Hamming d of each other, computed
    // exactly on the driver — banded candidate generation must find ALL
    // of them (pigeonhole over maxHamming+1 bands), for radii beyond the
    // old fixed 4-band split's guarantee of 3
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (d <- Seq(4, 8, 15)) {
      val expected = (for {
        a <- sigs.keys; b <- sigs.keys if a < b
        if java.lang.Long.bitCount(sigs(a) ^ sigs(b)) <= d
      } yield (a, b)).toSet
      val got = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = d)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
      assert(got == expected, s"maxHamming=$d")
    }
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 16)
    }
  }

  test("simhashNearDups maxBucketSize drops a boilerplate spike, never blows up") {
    // 40 identical docs: one bucket of 40 in every band. Under the cap
    // the full 40·39/2 pair set appears; over it the spike leaves
    // candidate generation (documented recall loss on the pathological
    // density where the PAIR form itself is quadratic by construction)
    val spike = (1 to 40).map(i =>
      (i.toLong, "the same boilerplate banner text on every single page"))
      .toDF("doc_id", "text")
    assert(Dedup.simhashNearDups(spike, "doc_id", "text").count() == 40L * 39 / 2)
    assert(Dedup.simhashNearDups(spike, "doc_id", "text",
      maxBucketSize = 10).count() == 0)
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(spike, "doc_id", "text", maxBucketSize = 0)
    }
  }

  test("decontaminate: hash-prefiltered result == plain string-join semantics") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated content with no overlap here at all"),
      (3L, "said the quick brown fox jumps over the lazy dog again"),
      (4L, "   \t  "), // token-free: shares the empty gram with bench doc 102
      (5L, "short text")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (101L, "xx the quick brown fox jumps over the lazy dog yy"),
      (102L, " ")
    ).toDF("bench_id", "text")
    val got = Dedup.decontaminate(docs, "doc_id", "text", bench, "text", n = 8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // 1 and 3 share the 8-gram 'the quick ... dog'; 4 shares the empty
    // gram of the whitespace-only benchmark doc; 2 and 5 survive
    assert(got == Set(2L, 5L))
  }

  test("repetitionStats kernel == HOF wordNgrams formula (incl. edge cases)") {
    import spark.implicits._
    val texts = Seq(
      "a b c a b c a b c",           // heavy 3-gram repetition
      "the quick brown fox",          // all distinct
      "x",                            // fewer tokens than n → 1 partial gram
      "  \t \n ",                     // whitespace only → single empty gram
      "",                             // empty
      "a a a a a a a a",              // one distinct gram
      "α β γ α β γ α β",              // multi-byte UTF-8
      "a aa a aa a"                   // interning must not merge 'a'/'aa'
    ).toDF("text")
    val n = 3
    val grams = TextFunctions.wordNgramsHof(col("text"), n)
    // native gram strings == HOF gram strings, element for element
    texts.select(TextFunctions.wordNgrams(col("text"), n).as("k"), grams.as("h"))
      .collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"kernel ${r.getSeq[String](0)} != hof ${r.getSeq[String](1)}")
      }
    val rows = texts.select(
      TextFunctions.repetitionStats(col("text"), n).as("st"),
      TextFunctions.tokenCount(col("text")).as("nt"),
      size(grams).as("total"),
      size(array_distinct(grams)).as("dist"),
      TextFunctions.repetitionRatio(col("text"), n).as("ratio")).collect()
    rows.foreach { r =>
      val st = r.getSeq[Long](0)
      assert(st(0) == r.getInt(1).toLong, s"nTokens: $st vs ${r.getInt(1)}")
      assert(st(1) == r.getInt(2).toLong, s"total: $st vs ${r.getInt(2)}")
      assert(st(2) == r.getInt(3).toLong, s"distinct: $st vs ${r.getInt(3)}")
      assert(r.getDouble(4) == 1d - st(2).toDouble / st(1).toDouble)
    }
  }

  // ── span-level exact substring dedup ──

  private lazy val spanDocs = Seq(
    (0L, "a0 a1 a2 a3 a4 a5 x0 x1 x2 x3 x4 x5 b0 b1 b2 b3"), // 6-run shared with doc 1 at 7..12
    (1L, "c0 c1 x0 x1 x2 x3 x4 x5 d0 d1 d2 d3 d4 d5 d6 d7"), // same run at 3..8
    (2L, "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9"), // unique
    (3L, "f0 f1 f2"), // shorter than k
    (4L, null.asInstanceOf[String]),
    (5L, "r0 r1 r2 r3 r4 z0 r0 r1 r2 r3 r4"), // within-doc repeat
    (6L, "g0 g1 g2 g3 g4 g5 g6 g7"),
    (7L, "g0 g1 g2 g3 g4 g5 g6 g7") // exact copy of 6
  ).toDF("doc_id", "text")

  test("duplicatedSpans finds and merges maximal duplicated runs") {
    val spans = Dedup.duplicatedSpans(spanDocs, "doc_id", "text", k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(spans == Set(
      (0L, 7L, 12L, 6L), // two overlapping windows merged into one span
      (1L, 3L, 8L, 6L),
      (5L, 1L, 5L, 5L), (5L, 7L, 11L, 5L), // within-doc repeat: two islands
      (6L, 1L, 8L, 8L), (7L, 1L, 8L, 8L))) // whole-doc copies
  }

  test("removeDuplicatedSpans keeps first occurrence, rebuilds the rest") {
    val out = Dedup.removeDuplicatedSpans(spanDocs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.size == 7, s"cardinality: $out")
    assert(out(0L) == "a0 a1 a2 a3 a4 a5 x0 x1 x2 x3 x4 x5 b0 b1 b2 b3",
      "first occurrence untouched")
    assert(out(1L) == "c0 c1 d0 d1 d2 d3 d4 d5 d6 d7")
    assert(out(2L) == "e0 e1 e2 e3 e4 e5 e6 e7 e8 e9")
    assert(out(3L) == "f0 f1 f2")
    assert(out(5L) == "r0 r1 r2 r3 r4 z0", "within-doc second run removed")
    assert(out(6L) == "g0 g1 g2 g3 g4 g5 g6 g7")
    assert(out(7L) == "", "fully-covered doc becomes empty string, not dropped")
  }

  test("duplicatedSpans k=2 edge: self-overlapping runs merge into one span") {
    val docs = Seq(
      (0L, "a a a a b"),  // windows "a a" ×3 overlap → one span 1..4
      (1L, "c d e c d"),  // "c d" twice within doc → spans 1..2, 4..5
      (2L, "f g")         // unique single window
    ).toDF("doc_id", "text")
    val spans = Dedup.duplicatedSpans(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(spans == Set((0L, 1L, 4L), (1L, 1L, 2L), (1L, 4L, 5L)))
    intercept[IllegalArgumentException] {
      Dedup.duplicatedSpans(docs, "doc_id", "text", k = 1)
    }
  }

  test("contaminationScore counts distinct-gram overlap fractions") {
    val bench = Seq((900L, "x y z w")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b x y z c"), // grams(3): {a b x, b x y, x y z, y z c} → 1/4
      (1L, "p q r s"),     // no overlap → 0/2
      (2L, "x y z w"),     // exact copy of the bench doc → 2/2
      (3L, "x y"),         // partial gram "x y" ∉ bench grams → 0/1
      (4L, null.asInstanceOf[String]) // excluded
    ).toDF("doc_id", "text")
    val got = Dedup.contaminationScore(docs, "doc_id", "text", bench, "text",
      n = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    assert(got(0L) == ((4L, 1L, 0.25)))
    assert(got(1L) == ((2L, 0L, 0.0)))
    assert(got(2L) == ((2L, 2L, 1.0)))
    assert(got(3L) == ((1L, 0L, 0.0)))
  }

  test("contaminationScore > 0 iff decontaminate drops the document") {
    // cross-operator invariant: the score's numerator counts exactly
    // the gram overlap decontaminate thresholds on, so score > 0 must
    // coincide with removal — on synthetic data with known overlap
    val bench = Seq((900L, "x y z w"), (901L, "m n o")).toDF("doc_id", "text")
    val docs = Seq(
      (0L, "a b x y z c"), (1L, "p q r s"), (2L, "m n o"),
      (3L, "q r s t u v"), (4L, "z w m")
    ).toDF("doc_id", "text")
    val scores = Dedup.contaminationScore(docs, "doc_id", "text",
      bench, "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val kept = Dedup.decontaminate(docs, "doc_id", "text", bench, "text",
      n = 3)
      .collect().map(_.getLong(0)).toSet
    scores.foreach { case (id, s) =>
      assert((s > 0.0) == !kept(id),
        s"doc $id: score $s vs kept=${kept(id)}")
    }
  }

  test("duplicatedSpans honors minOccurrences") {
    // every duplicated gram in the fixture occurs exactly twice
    val spans3 = Dedup
      .duplicatedSpans(spanDocs, "doc_id", "text", k = 5, minOccurrences = 3)
      .collect()
    assert(spans3.isEmpty)
  }

  test("decontaminateFuzzy removes paraphrase-level leaks exact overlap misses") {
    val bench = Seq(
      "what is the capital of france the answer is paris of course today").toDF("text")
    val corpus = Seq(
      // 0: one-token edit of the bench item — NO shared 8-gram run of
      // the exact kind after the early edit, but Jaccard >> 0.8
      (0L, "what is the capital of france the answer is paris of course tonight"),
      // 1: unrelated
      (1L, "a completely different document about apples bananas oranges pears and plums"),
      // 2: exact copy
      (2L, "what is the capital of france the answer is paris of course today"),
      // 3: token-free (no signature — must survive the fuzzy filter)
      (3L, "   ")
    ).toDF("doc_id", "text")
    val surv = Dedup.decontaminateFuzzy(corpus, "doc_id", "text",
      bench, "text", shingleLen = 3, numPerm = 64, bands = 32,
      threshold = 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(surv == Set(1L, 3L), s"survivors $surv")
    // exact decontaminate keeps the near-paraphrase when the shared
    // 8-gram runs are broken (complementary filters)
    val exactSurv = Dedup.decontaminate(
      corpus.filter(col("doc_id") === 0L), "doc_id", "text",
      bench, "text", n = 14)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactSurv == Set(0L))
  }

  test("compressionRatio orders redundancy and is deterministic") {
    val rep = "the cat sat " * 80
    val prose = "A different idea appears in every clause of this sentence, " +
      "naming fresh objects, colors, verbs, and numbers like seventeen."
    // chained MD5 hex — genuinely high-entropy over a 16-symbol alphabet
    val md = java.security.MessageDigest.getInstance("MD5")
    val hexy = Iterator.iterate("seed")(s =>
      md.digest(s.getBytes).map("%02x".format(_)).mkString)
      .drop(1).take(16).mkString
    val r = Seq((0L, rep), (1L, prose), (2L, hexy), (3L, ""))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.compressionRatio(col("t")).as("cr"))
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(0L) < 0.1, s"repetition ${r(0L)}")         // collapses
    assert(r(1L) > r(0L), "prose above repetition")
    assert(r(2L) > r(0L) && r(2L) > 0.4, s"hex noise resists: ${r(2L)}")
    assert(r(3L) == 1.0)                                 // empty convention
    // deterministic across evaluations (per-thread Deflater reuse)
    val again = Seq((0L, rep)).toDF("id", "t")
      .select(TextFunctions.compressionRatio(col("t"))).head().getDouble(0)
    assert(again == r(0L))
  }

  // ── weighted (multiset) Jaccard ──

  test("weighted shingle hashes: distinct, multiplicity-expanded, set-consistent") {
    val t = "a b c a b c a b d"
    val r = Seq((0L, t)).toDF("doc_id", "text")
      .select(Dedup.shingleHashes(col("text"), 2).as("s"),
        Dedup.shingleHashesWeighted(col("text"), 2).as("w"))
      .head()
    val s = r.getSeq[Long](0)
    val w = r.getSeq[Long](1)
    // 8 bigrams total, 4 distinct ("a b" ×3, "b c" ×2, "c a" ×2, "b d")
    assert(s.size == 4)
    assert(w.size == 8)
    assert(w.distinct.size == 8) // occurrence expansion never collides
  }

  test("weighted Jaccard punishes self-repetition where set Jaccard cannot") {
    val base = "the quick brown fox jumps over the lazy dog"
    val rep = Seq.fill(5)(base).mkString(" ")
    val d = Seq((0L, base), (1L, rep)).toDF("doc_id", "text")
    val setJ = Dedup.exactNgramJaccard(d, "doc_id", "text",
      n = 3, threshold = 0.1, maxDocsPerGram = Int.MaxValue)
      .head().getAs[Double]("jaccard")
    // repetition introduces only the wrap-around grams, so the SET
    // measure stays near 1 — it cannot see the 5× duplication
    assert(setJ > 0.5, s"set jaccard $setJ")
    val wJ = Dedup.exactWeightedJaccard(d, "doc_id", "text",
      n = 3, threshold = 0.1, maxDocsPerGram = Int.MaxValue)
      .head().getAs[Double]("wjaccard")
    // bags: ~7 shared min-counts vs ~39 max-counts → far below setJ
    assert(wJ < 0.3, s"weighted jaccard $wJ should expose the repetition")
    assert(wJ < setJ)
  }

  test("exactWeightedJaccard matches a hand-computed bag Jaccard") {
    // bigrams of A: {xy:2, yx:1, yz:1} (x y x y z); B: {xy:1, yz:2, zy:1}
    // (x y z y z)... compute expected directly instead: n=2
    val d = Seq((0L, "x y x y z"), (1L, "x y z y z")).toDF("doc_id", "text")
    // A bigrams: xy, yx, xy, yz → {xy:2, yx:1, yz:1}, tot 4
    // B bigrams: xy, yz, zy, yz → {xy:1, yz:2, zy:1}, tot 4
    // smin = min(2,1) + min(1,2) = 2; wJ = 2 / (4 + 4 - 2) = 1/3
    val wJ = Dedup.exactWeightedJaccard(d, "doc_id", "text",
      n = 2, threshold = 0.1, maxDocsPerGram = Int.MaxValue)
      .head().getAs[Double]("wjaccard")
    assert(math.abs(wJ - 1.0 / 3.0) < 1e-12, s"got $wJ")
  }

  test("minHashNearDupsWeighted: exact copies estimate 1.0; repetition scores below the set estimate") {
    val pairs = Dedup.minHashNearDupsWeighted(docs, "doc_id", "text",
      shingleLen = 3, numPerm = 64, bands = 16, threshold = 0.5)
      .collect().map(r => ((r.getAs[Long]("id_a"), r.getAs[Long]("id_b")),
        r.getAs[Double]("est_jaccard"))).toMap
    assert(pairs((0L, 3L)) == 1.0) // exact copies: identical bags
    assert(pairs.contains((0L, 1L))) // near-dup still surfaces
    // a self-repeated doc: weighted estimate must drop well below the
    // set estimate (which stays ≈ 1)
    val base = "the quick brown fox jumps over the lazy dog"
    val rep = Seq.fill(5)(base).mkString(" ")
    val d2 = Seq((0L, base), (1L, rep)).toDF("doc_id", "text")
    // single-row bands (256 bands × 1 hash) make candidate generation
    // near-certain at any Jaccard, so the assertions see the ESTIMATE,
    // not LSH collision luck
    val est = Dedup.minHashNearDupsWeighted(d2, "doc_id", "text",
      shingleLen = 3, numPerm = 256, bands = 256, threshold = 0.01)
      .collect()
    val w = if (est.isEmpty) 0.0 else est.head.getAs[Double]("est_jaccard")
    val s = Dedup.minHashNearDups(d2, "doc_id", "text",
      shingleLen = 3, numPerm = 256, bands = 256, threshold = 0.01)
      .head().getAs[Double]("est_jaccard")
    assert(s > 0.6, s"set estimate $s")
    assert(w < s - 0.2, s"weighted estimate $w vs set $s")
  }

  test("wordDropout: deterministic, rate endpoints, measured rate near target") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val doc = (1 to 2000).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, doc)).toDF("doc_id", "text")
    def kept(rate: Double, seed: Long): Seq[String] =
      df.select(TextFunctions.wordDropout(col("doc_id"), col("text"), rate, seed))
        .collect().head.getString(0).split(" ").toSeq.filter(_.nonEmpty)
    assert(kept(0.0, 1L).size == 2000, "rate 0 keeps everything")
    assert(kept(1.0, 1L).isEmpty, "rate 1 drops everything")
    val k = kept(0.3, 11L)
    assert(math.abs(k.size / 2000.0 - 0.7) < 0.05,
      s"kept fraction ${k.size / 2000.0} should be ≈ 0.7")
    assert(k == kept(0.3, 11L), "same seed → identical output")
    assert(k != kept(0.3, 12L), "different seed → different draw")
    // survivors keep their original relative order
    val idx = k.map(w => w.drop(1).toInt)
    assert(idx == idx.sorted)
  }

  test("spanCorrupt: corrupted+target reconstructs the original token stream") {
    import spark.implicits._
    import graft.functions.TextFunctions
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m"),
      (2L, "one two three"),
      (3L, "   "), // token-free
      (4L, (1 to 300).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pair = TextFunctions.spanCorrupt(
      col("doc_id"), col("text"), blockLen = 3, rate = 0.5, seed = 2L)
    val rows = docs.select(col("doc_id"),
      pair.getField("corrupted").as("c"), pair.getField("target").as("t"),
      col("text")).collect()
    var sawMask = false
    rows.foreach { r =>
      val (c, t, orig) = (r.getString(1), r.getString(2), r.getString(3))
      // parse target into sentinel → tokens
      val tgt = scala.collection.mutable.Map[String, Seq[String]]()
      var cur: String = null
      t.split(" ").filter(_.nonEmpty).foreach { tok =>
        if (tok.startsWith("<extra_id_")) { cur = tok; tgt(cur) = Seq() }
        else tgt(cur) = tgt(cur) :+ tok
      }
      if (tgt.nonEmpty) sawMask = true
      val rebuilt = c.split(" ").filter(_.nonEmpty).flatMap { tok =>
        if (tok.startsWith("<extra_id_")) tgt(tok) else Seq(tok)
      }.toSeq
      val norm = orig.split("\\s+").toSeq.filter(_.nonEmpty)
      assert(rebuilt == norm, s"doc ${r.getLong(0)}: $rebuilt vs $norm")
    }
    assert(sawMask, "rate 0.5 must mask at least one block somewhere")
  }

  test("winnowNearDups: exact copies share all fingerprints, partial overlap detected, guard trips") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val wd = Seq(
      (0L, base + " tonight under the bright moon and the quiet stars"),
      (1L, base + " tonight under the bright moon and the quiet stars"), // exact copy
      (2L, "totally unrelated content about apples bananas oranges pears plums kiwi"),
      (3L, "prefix chatter first " + base + " then entirely different tail words here")
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.winnowNearDups(
      wd, "doc_id", "text", k = 6, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "exact copies must pair")
    assert(pairs.contains((0L, 3L)) && pairs.contains((1L, 3L)),
      "the long shared substring must pair despite different prefix/suffix")
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L),
      "unrelated doc must not pair")
    // copy shares EVERY fingerprint hash with its original
    val shared01 = graft.operators.Dedup.winnowNearDups(
      wd, "doc_id", "text", k = 6, w = 4, minShared = 1)
      .filter(col("id_a") === 0L && col("id_b") === 1L)
      .select("shared").head().getLong(0)
    val nFp0 = wd.filter(col("doc_id") === 0L)
      .select(explode(TextFunctions.winnowFingerprints(col("text"), 6, 4)))
      .select((col("col") % 2147483648L).as("h")).distinct().count()
    assert(shared01 == nFp0)
    // hot-fingerprint guard fails loudly by default
    val hot = (1L to 40L).map(i => (i, base)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.operators.Dedup.winnowNearDups(
        hot, "doc_id", "text", k = 6, w = 4, minShared = 1,
        maxDocsPerGram = 10).count()
    }
    assert(e.getMessage.contains("maxDocsPerGram"))
  }

  test("winnowNearDupsLsh: near-dup pairs surface with EXACT shared counts; shared counts agree with the posting form") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog near the river bank"
    val wd = Seq(
      (0L, base + " tonight under the bright moon and the quiet stars"),
      (1L, base + " tonight under the bright moon and the quiet stars"), // exact copy
      (2L, "totally unrelated content about apples bananas oranges pears plums kiwi"),
      (3L, base + " tonight under the bright moon and the quiet MOON")  // near copy
    ).toDF("doc_id", "text")
    val lsh = graft.operators.Dedup.winnowNearDupsLsh(
      wd, "doc_id", "text", k = 6, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // identical fp sets → identical signatures → guaranteed candidates
    assert(lsh.contains((0L, 1L)), "exact copies must surface")
    assert(lsh.contains((0L, 3L)), "high-overlap near copy must surface")
    assert(!lsh.keys.exists(p => p._1 == 2L || p._2 == 2L),
      "unrelated doc must not pair")
    // shared is EXACT on every surfaced pair: must equal the posting
    // form's count for the same pair
    val posting = graft.operators.Dedup.winnowNearDups(
      wd, "doc_id", "text", k = 6, w = 4, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    lsh.foreach { case (pair, shared) =>
      assert(posting(pair) == shared, s"pair $pair: lsh=$shared posting=${posting(pair)}")
    }
    // surfaced relation is a SUBSET of the exhaustive posting relation
    assert(lsh.keySet.subsetOf(posting.keySet))
  }

  test("normalizeTerms: plan-literal dictionary maps tokens, re-joins canonical") {
    val rs = Seq((1L, "the table  is a table"), (2L, ""), (3L, "tables a"))
      .toDF("id", "t")
      .select(col("id"), TextFunctions.normalizeTerms(col("t"),
        Map("table" -> "tbl", "a" -> "@")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rs(1L) == "the tbl is @ tbl") // double space folds via re-join
    assert(rs(2L) == "")
    assert(rs(3L) == "tables @") // exact-token match only, no substrings
    intercept[IllegalArgumentException](
      TextFunctions.normalizeTerms(col("t"), Map.empty))
  }

  test("htmlToText: blocks drop, tags strip, entities decode (&amp; LAST), ws folds") {
    val html = "<html><body><script>var a = '<p>';</script>" +
      "<style>x{}</style><!-- c --><h1>T</h1><p>a  b</p>" +
      "<p>&amp;lt; &lt;b&gt; &nbsp;&#39;</p><br>tail  </body></html>"
    val r = Seq(html).toDF("h")
      .select(TextFunctions.htmlToText(col("h")).as("t")).head.getString(0)
    // '&amp;lt;' yields literal '&lt;' (decode order), '&lt;b&gt;'
    // yields literal '<b>' AFTER tag stripping (no re-scan), block
    // closers become newlines, double spaces fold, ends trim
    // '</p><br>' = closer + break → TWO newlines (a paragraph break;
    // only runs of ≥3 collapse)
    assert(r == "T\na b\n&lt; <b> '\n\ntail", s"got: ${r.replace("\n", "\\n")}")
  }

  test("htmlToText: script block containing '<p>' markup is dropped whole") {
    val r = Seq("<p>keep</p><script type=\"x\">if (1<2) { '<p>no</p>' }</script>done")
      .toDF("h").select(TextFunctions.htmlToText(col("h")).as("t")).head.getString(0)
    assert(r == "keep\ndone", s"got: ${r.replace("\n", "\\n")}")
  }
}
