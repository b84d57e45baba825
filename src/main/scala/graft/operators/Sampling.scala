package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / batching operators for training-data pipelines. */
object Sampling {

  /** Deterministic stratified sample: the k rows per group with the
    * smallest md5(id) — reproducible across runs, engines and cluster
    * sizes (no RNG in the plan; md5 order is uniform-ish and stable).
    * One shuffle on the group key; rank stays inside codegen. */
  def deterministicSample(df: DataFrame, groupCols: Seq[String],
                          idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Token-budget sequence packing: assign rows (docs/chunks) to
    * consecutive batches so each batch's total `weightCol` stays at or
    * under `budget` (greedy in `orderCol` order within each group —
    * batch_id = floor(exclusive-prefix-sum / budget), the standard
    * scan-friendly approximation of bin packing; an item larger than
    * the budget gets its own batch).
    * Integer window arithmetic only: deterministic and engine-exact. */
  def packByBudget(df: DataFrame, groupCol: String, orderCol: String,
                   weightCol: String, budget: Long): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(col(weightCol)).over(w), lit(0L))
    df.withColumn("batch_id", (before / lit(budget)).cast("long"))
  }
}
