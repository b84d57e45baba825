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
}
