package graft

import graft.plans.VectorKernels

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded-fuzz equivalence of the native text kernels against a plain
  * Scala reference implementation — pure JVM, no Spark session, so
  * thousands of cases run in milliseconds. The reference mirrors the
  * HOF contract exactly: split on \s+, drop empties, shorter-than-n
  * docs yield one partial gram, token-free text yields one empty gram. */
class KernelPropertySpec extends AnyFunSuite {

  private def refTokens(text: String): Seq[String] =
    text.split("\\s+").toSeq.filter(_.nonEmpty)

  private def refGrams(text: String, n: Int): Seq[String] = {
    val toks = refTokens(text)
    if (toks.isEmpty) Seq("")
    else (0 to math.max(toks.size - n, 0)).map(i => toks.slice(i, i + n).mkString(" "))
  }

  private val alphabet =
    "ab α⋅ \t\n\f\r xyz0"  // few distinct tokens → real collisions

  private def randomText(rnd: scala.util.Random): String =
    (0 until rnd.nextInt(60)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString

  test("wordNgramStrings == reference on 2000 seeded random strings") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 2000; n <- Seq(1, 2, 3, 8)) {
      val s = randomText(rnd)
      val got = VectorKernels.wordNgramStrings(UTF8String.fromString(s), n)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == refGrams(s, n), s"text=${s.replace("\n", "\\n")} n=$n")
    }
  }

  test("repetitionStats == reference on 2000 seeded random strings") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000; n <- Seq(1, 2, 3, 8)) {
      val s = randomText(rnd)
      val grams = refGrams(s, n)
      val got = VectorKernels.repetitionStats(UTF8String.fromString(s), n)
      val want = Seq(refTokens(s).size.toLong, grams.size.toLong, grams.distinct.size.toLong)
      assert((0 until 3).map(got.getLong) == want, s"text=${s.replace("\n", "\\n")} n=$n")
    }
  }

  test("nearestCentroid == argmax of cosine on 500 seeded random cases") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 500) {
      val dim = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      // occasional zero centroid / zero vector exercise the 0-score path
      def vec(): Array[Double] =
        if (rnd.nextInt(10) == 0) Array.fill(dim)(0.0)
        else Array.fill(dim)(rnd.nextGaussian())
      val cents = IndexedSeq.fill(k)(vec())
      val v = vec()
      val flat = cents.flatMap { cv =>
        val n = math.sqrt(cv.map(x => x * x).sum)
        if (n > 0) cv.map(_ / n) else cv
      }.toArray
      // reference: max cosine, ties → smallest 1-based id
      val cos = cents.map { cv =>
        val dot = cv.zip(v).map { case (a, b) => a * b }.sum
        val d = math.sqrt(cv.map(x => x * x).sum) * math.sqrt(v.map(x => x * x).sum)
        if (d > 0) dot / d else 0.0
      }
      val want = cos.zipWithIndex.minBy { case (c, i) => (-c, i) }._2 + 1
      val got = VectorKernels.nearestCentroid(
        flat, k, new GenericArrayData(v), isFloat = false)
      // dot-on-normalized vs cosine can diverge only within float ulps
      // of an exact tie; accept either side of a <1e-12 gap
      val gotCos = cos(got - 1)
      assert(got == want || math.abs(gotCos - cos(want - 1)) < 1e-12,
        s"dim=$dim k=$k got=$got want=$want cos=$cos")
    }
  }

  test("eqCount counts agreeing positions") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 500) {
      val n = rnd.nextInt(65)
      val a = Array.fill(n)(rnd.nextInt(4).toLong)
      val b = Array.fill(n)(rnd.nextInt(4).toLong)
      val want = a.zip(b).count { case (x, y) => x == y }
      assert(VectorKernels.eqCount(
        new GenericArrayData(a), new GenericArrayData(b)) == want)
    }
  }

  test("pqEncode == per-subspace L2 argmin; pqAdc == dot with the reconstruction (500 cases)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 500) {
      val m = 1 + rnd.nextInt(4)
      val subDim = 1 + rnd.nextInt(4)
      val k = 1 + rnd.nextInt(8)
      val dim = m * subDim
      val cents = Array.fill(m * k * subDim)(rnd.nextGaussian())
      val v = Array.fill(dim)(rnd.nextGaussian())
      val got = VectorKernels.pqEncode(cents, m, k, new GenericArrayData(v), isFloat = false)
      // reference argmin per subspace (ties → smallest code)
      val want = (0 until m).map { mi =>
        val d2 = (0 until k).map { c =>
          val off = (mi * k + c) * subDim
          (0 until subDim).map { j =>
            val diff = v(mi * subDim + j) - cents(off + j); diff * diff
          }.sum
        }
        d2.zipWithIndex.minBy { case (d, i) => (d, i) }._2 + 1
      }
      assert((0 until m).map(got.getInt) == want, s"m=$m k=$k subDim=$subDim")
      // ADC(probe, codes) must equal ⟨probe, reconstruction(codes)⟩
      val probe = Array.fill(dim)(rnd.nextGaussian())
      val recon = (0 until dim).map { i =>
        val mi = i / subDim
        cents((mi * k + got.getInt(mi) - 1) * subDim + (i % subDim))
      }
      val wantDot = probe.zip(recon).map { case (a, b) => a * b }.sum
      val gotDot = VectorKernels.pqAdc(cents, m, k, got,
        new GenericArrayData(probe), probeFloat = false)
      assert(math.abs(gotDot - wantDot) < 1e-9, s"adc $gotDot vs $wantDot")
      // the packed form agrees bit-for-bit when k,m fit 4 bits
      if (k <= 16 && m <= 16) {
        val packed = VectorKernels.pqEncodePacked(cents, m, k,
          new GenericArrayData(v), isFloat = false)
        (0 until m).foreach { mi =>
          assert(((packed >>> (4 * mi)) & 0xF) == got.getInt(mi) - 1)
        }
        val packedDot = VectorKernels.pqAdcPacked(cents, m, k, packed,
          new GenericArrayData(probe), probeFloat = false)
        assert(packedDot == gotDot)
      }
    }
  }

  test("l2Normalize: unit norm, direction preserved, zero passthrough (500 cases)") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(37)
    for (_ <- 1 to 500) {
      val dim = 1 + rnd.nextInt(32)
      val v =
        if (rnd.nextInt(10) == 0) Array.fill(dim)(0.0)
        else Array.fill(dim)(rnd.nextGaussian() * math.pow(10, rnd.nextInt(6) - 3))
      val got = VectorKernels.l2Normalize(new GenericArrayData(v), isFloat = false)
      val out = (0 until dim).map(got.getDouble).toArray
      val norm = math.sqrt(v.map(x => x * x).sum)
      if (norm == 0) assert(out.sameElements(v))
      else {
        assert(math.abs(math.sqrt(out.map(x => x * x).sum) - 1.0) < 1e-12)
        // direction: out ∝ v with a positive factor
        val i = v.indexWhere(_ != 0.0)
        val ratio = out(i) / v(i)
        assert(ratio > 0)
        v.indices.foreach(j =>
          assert(math.abs(out(j) - v(j) * ratio) < 1e-9 * math.max(1.0, math.abs(v(j)))))
      }
    }
  }

  test("shingleHashesWeighted: distinct expansion whose dedup cardinality matches the gram bag (2000 strings)") {
    val rnd = new scala.util.Random(41)
    for (_ <- 1 to 2000; n <- Seq(1, 2, 3)) {
      val s = randomText(rnd)
      val grams = refGrams(s, n)
      if (refTokens(s).nonEmpty) {
        val got = VectorKernels.shingleHashesWeighted(UTF8String.fromString(s), n)
        val hashes = (0 until got.numElements()).map(got.getLong)
        assert(hashes.size == grams.size, s"total multiplicity text=$s n=$n")
        assert(hashes.distinct.size == hashes.size, "occurrence expansion must be collision-free")
        // weighted-Jaccard identity on the SAME string: expansion of s
        // vs itself intersects fully
        val again = VectorKernels.shingleHashesWeighted(UTF8String.fromString(s), n)
        assert((0 until again.numElements()).map(again.getLong) == hashes)
      }
    }
  }

  test("zValue: bijective on the 2^2b grid and matches the reference interleave") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(43)
    for (_ <- 1 to 500) {
      val bits = 1 + rnd.nextInt(8)
      val x = rnd.nextInt(1 << bits).toLong
      val y = rnd.nextInt(1 << bits).toLong
      var want = 0L
      for (b <- 0 until bits) {
        want |= ((x >>> b) & 1L) << (2 * b)
        want |= ((y >>> b) & 1L) << (2 * b + 1)
      }
      assert(VectorKernels.zValue(new GenericArrayData(Array(x, y)), bits) == want)
    }
  }

  test("hashedBigramBuckets == poly-31 reference on 2000 seeded random strings") {
    def poly(s: String, buckets: Int): Int = {
      var h = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = (h * 31L + cp) % 2147483648L
        i += Character.charCount(cp)
      }
      (h % buckets).toInt
    }
    def ref(text: String, buckets: Int): Seq[Int] = {
      val toks = refTokens(text)
      toks.zip(toks.drop(1)).map { case (a, b) => poly(a + " " + b, buckets) }
    }
    val rnd = new scala.util.Random(91)
    for (_ <- 1 to 2000; buckets <- Seq(2, 97, 512)) {
      val s = randomText(rnd)
      val got = VectorKernels.hashedBigramBuckets(UTF8String.fromString(s), buckets)
      val gotSeq = (0 until got.numElements()).map(got.getInt)
      assert(gotSeq == ref(s, buckets), s"text=${s.replace("\n", "\\n")} buckets=$buckets")
    }
  }

  test("charNgramsByWord == per-word substring reference on 2000 seeded strings") {
    def ref(text: String, minLen: Int, maxLen: Int): Seq[String] =
      refTokens(text).flatMap { w =>
        val cps = w.codePoints().toArray
        for {
          p <- 0 until cps.length
          l <- minLen to maxLen if p + l <= cps.length
        } yield new String(cps, p, l)
      }
    val rnd = new scala.util.Random(29)
    for (_ <- 1 to 2000) {
      val s = randomText(rnd)
      val got = VectorKernels.charNgramsByWord(UTF8String.fromString(s), 2, 6)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == ref(s, 2, 6), s"text=${s.replace("\n", "\\n")}")
    }
  }

  test("greedySubTokens == greedy reference; concatenation restores each word") {
    def refGreedy(text: String, vocab: Set[String]): Seq[String] = {
      val maxLen = (vocab.map(g => g.codePointCount(0, g.length)) + 1).max
      refTokens(text).flatMap { w =>
        val cps = w.codePoints().toArray
        val out = scala.collection.mutable.ArrayBuffer[String]()
        var p = 0
        while (p < cps.length) {
          val l = (math.min(maxLen, cps.length - p) to 1 by -1)
            .find(l => vocab(new String(cps, p, l))).getOrElse(1)
          out += new String(cps, p, l)
          p += l
        }
        out.toSeq
      }
    }
    val rnd = new scala.util.Random(31)
    for (_ <- 1 to 1000) {
      val s = randomText(rnd)
      // random small vocab drawn from the text's own substrings + noise
      val grams = (0 until 6).map { _ =>
        val t = randomText(rnd).replaceAll("\\s", "")
        if (t.isEmpty) "z" else t.substring(0, math.min(t.length, 1 + rnd.nextInt(4)))
      }.toSet
      val got = VectorKernels.greedySubTokens(
        UTF8String.fromString(s), grams.toArray)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == refGreedy(s, grams), s"text=$s vocab=$grams")
      // lossless: concatenating the subtokens restores the tokens
      assert(gotSeq.mkString == refTokens(s).mkString)
    }
  }

  test("bpeMergeStep == leftmost-greedy reference on 2000 seeded symbol strings") {
    val sep = '\u0001'
    def refMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(47)
    val alpha = Seq("a", "b", "ab", "ba", "aa", "x")
    for (_ <- 1 to 2000) {
      val syms = (0 until 1 + rnd.nextInt(12)).map(_ => alpha(rnd.nextInt(alpha.length)))
      val a = alpha(rnd.nextInt(alpha.length))
      val b = alpha(rnd.nextInt(alpha.length))
      val got = VectorKernels.bpeMergeStep(
        UTF8String.fromString(syms.mkString(sep.toString)), a, b).toString
      assert(got.split(sep).toSeq == refMerge(syms, a, b),
        s"syms=$syms pair=($a,$b) got=${got.split(sep).toSeq}")
    }
    // init: per code point
    assert(VectorKernels.bpeInitSymbols(UTF8String.fromString("abc")).toString
      == s"a${sep}b${sep}c")
  }

  test("bpeApplyAll == init + sequential bpeMergeStep folds on 1000 seeded cases") {
    val sep = '\u0001'
    val rnd = new scala.util.Random(53)
    val alpha = "aabbx "
    for (_ <- 1 to 1000) {
      val text = (0 until rnd.nextInt(24)).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      val merges = (0 until rnd.nextInt(4)).map { _ =>
        val g = () => (0 until 1 + rnd.nextInt(2)).map(_ => alpha.trim()(rnd.nextInt(4))).mkString
        (g(), g())
      }
      val pairs = merges.flatMap { case (a, b) => Seq(a, b) }.toArray
      val got = VectorKernels.bpeApplyAll(UTF8String.fromString(text), pairs)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      val want = text.split("\\s+").toSeq.filter(_.nonEmpty).flatMap { w =>
        var st = VectorKernels.bpeInitSymbols(UTF8String.fromString(w))
        merges.foreach { case (a, b) =>
          st = VectorKernels.bpeMergeStep(st, a, b)
        }
        st.toString.split(sep).toSeq
      }
      assert(gotSeq == want, s"text=$text merges=$merges got=$gotSeq want=$want")
    }
  }

  test("signProject == ascending-order ±1 reference on 500 seeded random vectors") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def sign(i: Int, j: Int, seed: Long): Double = {
      var h = (i.toLong * 1315423911L + j.toLong * 2654435761L +
        seed * 2246822519L + 12345L) % 2147483647L
      h = (h * h + h + 41L) % 2147483647L
      h = (h * h + h + 41L) % 2147483647L
      if (h < 1073741824L) 1.0 else -1.0
    }
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 500) {
      val dim = rnd.nextInt(64) // zero-length vectors included
      val outDim = 1 + rnd.nextInt(12)
      val seed = rnd.nextInt(1000).toLong
      val xs = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val want = (0 until outDim).map { j =>
        var acc = 0.0
        for (i <- 0 until dim) acc += sign(i, j, seed) * xs(i).toDouble
        acc / math.sqrt(outDim.toDouble)
      }
      val got = VectorKernels.signProject(
        new GenericArrayData(xs), outDim, seed, isFloat = true)
      assert((0 until outDim).map(got.getDouble) == want,
        s"dim=$dim outDim=$outDim seed=$seed")
    }
  }

  test("winnow == quadratic rightmost-min reference on 2000 seeded strings") {
    // reference: O(m·w) literal transcription of the paper's selection
    def refWinnow(s: String, k: Int, w: Int): Seq[Long] = {
      val cps = s.codePoints().toArray
      val m = cps.length - k + 1
      if (m <= 0) return Seq.empty
      val hs = (0 until m).map { i =>
        (0 until k).foldLeft(0L)((h, j) => (h * 31L + cps(i + j)) % 2147483648L)
      }
      val ww = math.min(w, m)
      (0 to m - ww).flatMap { s0 =>
        val win = hs.slice(s0, s0 + ww)
        val minv = win.min
        val p = s0 + win.lastIndexOf(minv) // rightmost
        Some((p + 1).toLong * 2147483648L + minv)
      }.distinct.sorted
    }
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000; (k, w) <- Seq((3, 4), (6, 8), (12, 16))) {
      val s = randomText(rnd)
      val got = VectorKernels.winnow(UTF8String.fromString(s), k, w)
      val gotSeq = (0 until got.numElements()).map(got.getLong)
      assert(gotSeq == refWinnow(s, k, w), s"k=$k w=$w text=${s.take(60)}")
    }
    // substring-match guarantee: docs sharing a (w+k-1)-cp substring
    // share a fingerprint HASH
    for (_ <- 1 to 200) {
      val shared = (0 until 12 + 16 - 1).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val a = randomText(rnd) + shared + randomText(rnd)
      val b = randomText(rnd) + shared + randomText(rnd)
      def hashes(s: String) = {
        val fp = VectorKernels.winnow(UTF8String.fromString(s), 12, 16)
        (0 until fp.numElements()).map(i => fp.getLong(i) % 2147483648L).toSet
      }
      assert(hashes(a).intersect(hashes(b)).nonEmpty,
        s"guarantee violated for shared=$shared")
    }
  }

  test("deletionVariants == BFS code-point reference on 2000 seeded strings") {
    // reference mirrors the HOF contract: per-level distinct deletion
    // sets, final first-occurrence dedup, deletions by CODE POINT
    def cps(s: String): Vector[Int] = {
      val b = Vector.newBuilder[Int]
      var o = 0
      while (o < s.length) {
        val cp = s.codePointAt(o); b += cp; o += Character.charCount(cp)
      }
      b.result()
    }
    def mk(v: Vector[Int]): String = {
      val sb = new java.lang.StringBuilder(); v.foreach(sb.appendCodePoint); sb.toString
    }
    def ref(s: String, maxDist: Int): Seq[String] = {
      var acc = Vector(s)
      var frontier = Vector(cps(s))
      for (_ <- 1 to maxDist) {
        frontier = frontier
          .flatMap(v => v.indices.map(i => v.patch(i, Nil, 1)))
          .map(mk).distinct.map(cps)
        acc = acc ++ frontier.map(mk)
      }
      acc.distinct
    }
    val rnd = new scala.util.Random(97)
    // code-point units: few distinct → real dedup collisions; 𝄞 is a
    // surrogate PAIR (deletion must remove both UTF-16 chars)
    val units = Seq("a", "b", "α", "𝄞", " ")
    for (_ <- 1 to 2000; d <- Seq(0, 1, 2)) {
      val s = (0 until rnd.nextInt(10))
        .map(_ => units(rnd.nextInt(units.length))).mkString
      val got = VectorKernels.deletionVariants(UTF8String.fromString(s), d)
      val gotSeq = (0 until got.numElements()).map(got.getUTF8String(_).toString)
      assert(gotSeq == ref(s, d), s"s=$s d=$d")
    }
  }

  test("log2Fix: within 31 ulps-of-2^-30 of true log2, exact on powers of two, monotone (2000 cases)") {
    val rnd = new scala.util.Random(97)
    // each of the 30 squaring steps truncates < 2^-30 of the remaining
    // fraction, so |fix/2^30 − log2(num/den)| < 31·2^-30
    val tol = 31.0 / (1L << 30).toDouble
    var i = 0
    while (i < 2000) {
      val den = 1L + rnd.nextInt(1 << 30)
      val num = 1L + (rnd.nextLong() % den + den) % den
      val got = VectorKernels.log2Fix(num, den).toDouble / (1L << 30).toDouble
      val want = math.log(num.toDouble / den.toDouble) / math.log(2.0)
      assert(math.abs(got - want) < tol, s"$num/$den got $got want $want")
      i += 1
    }
    // exactly representable points carry no truncation at all
    assert(VectorKernels.log2Fix(1, 1) == 0L)
    assert(VectorKernels.log2Fix(1, 2) == -(1L << 30))
    assert(VectorKernels.log2Fix(1, 1024) == -10L * (1L << 30))
    assert(VectorKernels.log2Fix(3, 4) ==
      VectorKernels.log2Fix(6, 8)) // same rational, same bits
    // monotone in the ratio across a shared denominator
    val ds = (1L to 999L).map(n => VectorKernels.log2Fix(n, 1000L))
    assert(ds == ds.sorted)
    // wide-count path (den beyond the Long shift fast path) agrees
    // with the BigInt reference
    val bigDen = (1L << 40) + 12345L
    val bigNum = (1L << 39) + 999L
    var e = 0L
    var n = BigInt(bigNum)
    while (n < bigDen) { n <<= 1; e -= 1 }
    var m = ((n << 31) / BigInt(bigDen)).toLong
    var f = 0L
    var k = 0
    while (k < 30) {
      val m2 = (m * m) >>> 31; val b = m2 >>> 32; m = m2 >> b
      f = (f << 1) | b; k += 1
    }
    assert(VectorKernels.log2Fix(bigNum, bigDen) == e * (1L << 30) + f)
    assertThrows[IllegalArgumentException](VectorKernels.log2Fix(0, 5))
    assertThrows[IllegalArgumentException](VectorKernels.log2Fix(6, 5))
  }
}
