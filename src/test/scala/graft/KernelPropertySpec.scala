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
