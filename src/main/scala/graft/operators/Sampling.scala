package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / batching operators for training-data pipelines. */
object Sampling {

  private def tempCol(df: DataFrame, name: String): String = {
    require(!df.columns.contains(name),
      s"input already has a column named $name")
    name
  }

  /** Deterministic stratified sample: the k rows per group with the
    * smallest md5(id) — reproducible across runs, engines and cluster
    * sizes (no RNG in the plan; md5 order is uniform-ish and stable).
    * One shuffle on the group key; rank stays inside codegen. */
  def deterministicSample(df: DataFrame, groupCols: Seq[String],
                          idCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be > 0")
    val rn = tempCol(df, "__graft_rn")
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= k)
      .drop(rn)
  }

  /** Cumulative-weight BANDING of rows into batches: batch_id =
    * exclusive-prefix-sum(weight) div budget, per group in `orderCol`
    * order. This is the scan-friendly (one window, no sequential state)
    * batching used for context-window packing — with approximate
    * semantics, stated precisely:
    *  - a batch's total may EXCEED the budget by up to one item's
    *    weight (the straddling item joins the earlier batch);
    *  - an item heavier than the budget shares its batch with the
    *    items immediately before it, then forces a gap;
    *  - batch ids within a group are increasing but may skip values.
    * For hard per-batch caps, post-process per batch (they are small)
    * or use a per-group sequential pass (`flatMapGroups`) — at the cost
    * of losing whole-stage codegen. Exact integer arithmetic (`div`),
    * so results are engine-exact at any cumulative weight. */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
                   weightCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be > 0")
    val before = tempCol(df, "__graft_before")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn(before,
        coalesce(sum(col(weightCol).cast("long")).over(w), lit(0L)))
      .withColumn("batch_id", expr(s"$before div ${budget}L"))
      .drop(before)
  }
}
