package graft

import graft.operators.Classifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch-perceptron training: exact trajectory vs an in-memory
  * reference implementation, convergence on separable data, and the
  * loud-NULL contract. */
class ClassifierSpec extends GraftSpec {
  import spark.implicits._

  // (y, x) rows; features = (bias, a, b)
  private def df(rows: Seq[(Int, Long, Long)]): DataFrame =
    rows.toDF("y", "a", "b")
      .select(col("y"), lit(1L).as("bias"), col("a"), col("b"))

  /** Driver-side reference: same batch update, plain loops. */
  private def reference(
      rows: Seq[(Int, Array[Long])], rounds: Int): Seq[(Long, Array[Long])] = {
    val dim = rows.head._2.length
    val w = Array.fill(dim)(0L)
    (1 to rounds).map { _ =>
      val mis = rows.filter { case (y, x) =>
        y.toLong * x.zip(w).map { case (xi, wi) => xi * wi }.sum <= 0L
      }
      for (i <- 0 until dim; (y, x) <- mis) w(i) += y.toLong * x(i)
      (mis.size.toLong, w.clone())
    }
  }

  test("trajectory matches the in-memory reference exactly") {
    val rows = Seq((1, 4L, 1L), (1, 7L, 3L), (-1, 1L, 6L), (-1, 2L, 9L),
      (1, 5L, 2L), (-1, 0L, 4L))
    val model = Classifier.trainPerceptron(
      df(rows), "y", Seq("bias", "a", "b"), rounds = 5)
    val want = reference(
      rows.map { case (y, a, b) => (y, Array(1L, a, b)) }, rounds = 5)
    assert(model.rounds.size == 5)
    model.rounds.zip(want).foreach { case (got, (nErr, w)) =>
      assert(got.nErrors == nErr, s"round ${got.round} errors")
      assert(got.weights.toSeq == w.toSeq, s"round ${got.round} weights")
    }
  }

  test("converges to zero errors on linearly separable data") {
    // y = sign(a - b): separable with margin through the origin
    val rows = (1 to 40).map { i =>
      val a = (i * 7 % 13).toLong; val b = (i * 5 % 11).toLong
      (if (a > b) 1 else -1, a + 10, b + (if (a > b) 0 else 10))
    }
    val model = Classifier.trainPerceptron(
      df(rows), "y", Seq("bias", "a", "b"), rounds = 30)
    assert(model.rounds.exists(_.nErrors == 0L),
      s"should converge: ${model.rounds.map(_.nErrors)}")
    // and once converged the weights are a fixed point
    val zero = model.rounds.dropWhile(_.nErrors > 0L)
    assert(zero.map(_.weights.toSeq).distinct.size == 1)
  }

  test("applyPerceptron margins agree with training's own error count") {
    val rows = Seq((1, 4L, 1L), (1, 7L, 3L), (-1, 1L, 6L), (-1, 2L, 9L))
    val d = df(rows)
    val model = Classifier.trainPerceptron(d, "y", Seq("bias", "a", "b"), 4)
    // errors counted in a hypothetical round 5 == rows with y*margin <= 0
    val scored = Classifier.applyPerceptron(d, Seq("bias", "a", "b"), model.weights)
    val nBad = scored.filter(col("y") * col("margin") <= 0L).count()
    val next = Classifier.trainPerceptron(d, "y", Seq("bias", "a", "b"), 5)
    assert(next.rounds(4).nErrors == nBad)
  }

  test("NULL features fail loudly, not silently") {
    val d = Seq((Some(1), Some(2L)), (Some(-1), None: Option[Long]))
      .toDF("y", "a").select(col("y"), lit(1L).as("bias"), col("a"))
    val e = intercept[Exception] {
      Classifier.trainPerceptron(d, "y", Seq("bias", "a"), 1)
    }
    assert(e.getMessage.contains("NULL label or feature"))
  }
}
