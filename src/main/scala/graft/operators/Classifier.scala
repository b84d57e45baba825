package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed training of a linear quality classifier — the batch
  * (parallel) perceptron, the trained-model counterpart of the
  * rule-based `TextFunctions.qualityScore` (reference-analogue: the
  * predicate layer, csvplus.go:1240 — a learned predicate instead of a
  * hand-written one).
  *
  * Algorithm (classic batch perceptron): weights start at zero; each
  * round computes, in ONE distributed aggregate over the feature
  * table, the number of misclassified rows under the current weights
  * and the summed gradient Σ yᵢ·xᵢ over exactly those rows, then the
  * driver applies the update w ← w + Σ yᵢ·xᵢ. Everything is 64-bit
  * INTEGER arithmetic (features, labels, weights, margins), so the
  * trained trajectory is exactly replayable by any engine — no
  * learning-rate float, no transcendental, no summation-order
  * nondeterminism (integer addition is associative).
  *
  * Scale shape: each round is one scan + one map-side-partial
  * aggregate producing a single (dim+1)-wide row; the weight vector is
  * driver-held and rides the next round's plan as literals (bounded:
  * dim longs — the same regime as k-means centroids). Cost = rounds ×
  * scan; there is no join and no shuffle wider than the one-row
  * aggregate exchange. Callers train on a FEATURIZED table (cheap,
  * projection-only) and should cache it across rounds.
  *
  * Overflow: margins are Σⱼ wⱼ·xⱼ in Long. |w| grows at most by
  * Σᵢ|xᵢⱼ| per round, so rounds·N·maxₓ must stay < 2⁶³ / (dim·maxₓ) —
  * at N = 10⁹ docs, maxₓ = 10⁴, dim = 8, rounds = 10 the margin bound
  * is ~10¹⁸·8·10⁴ ≫ 2⁶³; for such corpora pre-scale features into
  * coarse buckets (the accuracy loss is the usual feature-binning
  * one, not a training artifact). [[trainPerceptron]] fails loudly on
  * Long overflow (`Math.addExact`) rather than wrapping silently.
  */
object Classifier {

  /** One training round's audit row: errors counted UNDER the
    * incoming weights, and the weights AFTER the update. */
  final case class PerceptronRound(round: Int, nErrors: Long, weights: Array[Long])

  final case class PerceptronModel(rounds: Seq[PerceptronRound]) {
    def weights: Array[Long] = rounds.last.weights

    /** Margin w·x as a Column (Long) over the same feature columns. */
    def margin(featureCols: Seq[Column]): Column =
      Classifier.margin(weights, featureCols)
  }

  private def margin(w: Array[Long], featureCols: Seq[Column]): Column =
    featureCols.zip(w).map { case (c, wi) => c * lit(wi) }
      .reduce(_ + _)

  /** Train `rounds` batch-perceptron rounds over integer feature
    * columns `featureCols` (include an explicit all-ones bias column)
    * against `labelCol` ∈ {+1, −1}. Rows with a NULL label or feature
    * are the caller's bug — they would silently vanish from the
    * aggregate — so they fail loudly instead. */
  def trainPerceptron(
      feats: DataFrame, labelCol: String, featureCols: Seq[String],
      rounds: Int): PerceptronModel = {
    require(rounds > 0, "rounds must be > 0")
    require(featureCols.nonEmpty, "featureCols must be non-empty")
    val dim = featureCols.size
    val y = col(labelCol)
    val xs = featureCols.map(col)
    val guarded = feats.filter(assert_true(
      y.isNotNull && xs.map(_.isNotNull).reduce(_ && _),
      lit("trainPerceptron: NULL label or feature — featurize with " +
        "explicit defaults before training")).isNull)

    val w = Array.fill(dim)(0L)
    val out = Seq.newBuilder[PerceptronRound]
    for (r <- 1 to rounds) {
      val m = margin(w, xs)
      val mis = y * m <= 0L
      val aggs =
        count(when(mis, 1)).as("n_err") +:
          xs.zipWithIndex.map { case (x, i) =>
            coalesce(sum(when(mis, y * x)), lit(0L)).as(s"g_$i")
          }
      val row = guarded.agg(aggs.head, aggs.tail: _*).head()
      val nErr = row.getLong(0)
      for (i <- 0 until dim)
        w(i) = Math.addExact(w(i), row.getLong(i + 1))
      out += PerceptronRound(r, nErr, w.clone())
    }
    PerceptronModel(out.result())
  }

  /** Score `df` with trained weights: margin (Long) and the ±1
    * prediction (margin 0 predicts −1, matching the training rule's
    * "≤ 0 is misclassified as positive" convention). Projection-only
    * — shuffle-free, codegen'd. */
  def applyPerceptron(
      df: DataFrame, featureCols: Seq[String], weights: Array[Long],
      marginName: String = "margin", predName: String = "pred"): DataFrame = {
    require(featureCols.size == weights.length,
      s"got ${featureCols.size} feature columns for ${weights.length} weights")
    val m = margin(weights, featureCols.map(col))
    df.withColumn(marginName, m)
      .withColumn(predName,
        when(col(marginName) > 0L, 1).otherwise(-1))
  }
}
