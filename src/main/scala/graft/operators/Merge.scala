package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert / slowly-changing-dimension operators — the warehouse
  * maintenance half of an ETL engine (the reference's Index resolves
  * WITHIN one dataset; these reconcile ACROSS dataset versions).
  */
object Merge {

  /** Upsert (MERGE semantics without a table format): rows of `target`
    * whose key matches an update are REPLACED by the update row; update
    * rows with new keys are APPENDED; everything else passes through.
    *
    * Plan shape: one anti join + a union. With `broadcastUpdates`
    * (default — the usual incremental-load case where updates are a
    * small delta) the update KEYS broadcast and the target is never
    * shuffled; for full-refresh merges where the updates side is itself
    * huge, pass `broadcastUpdates = false` to let a shuffle anti join
    * plan instead of OOMing the driver on the broadcast. With a
    * transactional table format this becomes MERGE INTO; the dataflow
    * here is exactly what those formats execute for a
    * not-matched-by-source=keep merge.
    *
    * Updates must be key-unique (enforce upstream with
    * [[Index.uniqueIndexOn]] / `dropDuplicates`): duplicate update keys
    * would both survive, which is MERGE's own ambiguity error case. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             broadcastUpdates: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    require(target.columns.sameElements(updates.columns),
      s"target and updates must share a schema: " +
        s"${target.columns.mkString(",")} vs ${updates.columns.mkString(",")}")
    val updateKeys = updates.select(keys.map(col): _*)
    val build = if (broadcastUpdates) broadcast(updateKeys) else updateKeys
    target.join(build, keys, "left_anti")
      .unionByName(updates)
  }

  /** SCD-2 interval construction from a change log: (key, ts, attrs…)
    * change events become validity intervals [valid_from, valid_to)
    * per key, with `valid_to` NULL on each key's current row. Interval
    * end = next change's timestamp (lead over the per-key time order).
    *
    * One shuffle on the key; the lead window reuses that partitioning.
    * `orderCols` breaks same-timestamp ties deterministically (pass a
    * unique column — e.g. the event id). */
  def scd2Intervals(
      changes: DataFrame, keyCol: String, tsCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    val ordering = (col(tsCol).asc +: tieCols.map(col(_).asc))
    val w = Window.partitionBy(col(keyCol)).orderBy(ordering: _*)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }
}
