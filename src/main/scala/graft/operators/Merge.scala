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

  /** Table diff (CDC between two snapshots): classify every key as
    * `added` (only in `next`), `removed` (only in `prev`), `changed`
    * (in both, any non-key column differs) or `unchanged`. Comparison
    * is null-safe per column (NULL equals NULL, unlike `=`).
    *
    * One full-outer join on the keys — the canonical snapshot-diff
    * dataflow; both sides shuffle once on the key (co-partitioned
    * writes/bucketing remove even that). Output: key columns +
    * `change_type`.
    *
    * Keys must be unique per side (it's a snapshot diff, not a bag
    * diff): duplicate keys would cross-join within the key group. */
  def diff(prev: DataFrame, next: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "keys must not be empty")
    require(prev.columns.sameElements(next.columns),
      s"snapshots must share a schema: " +
        s"${prev.columns.mkString(",")} vs ${next.columns.mkString(",")}")
    require(!prev.columns.contains("change_type"),
      "input already has a column named change_type")
    val attrs = prev.columns.filterNot(keys.contains)
    val p = prev.select(
      keys.map(col) :+ struct(attrs.map(col): _*).as("__pattrs") :+
        lit(1).as("__pside"): _*)
    val n = next.select(
      keys.map(col) :+ struct(attrs.map(col): _*).as("__nattrs") :+
        lit(1).as("__nside"): _*)
    // struct <=> struct is a single null-safe comparison of all attrs
    p.join(n, keys, "full_outer")
      .withColumn("change_type",
        when(col("__pside").isNull, lit("added"))
          .when(col("__nside").isNull, lit("removed"))
          .when(col("__pattrs") <=> col("__nattrs"), lit("unchanged"))
          .otherwise(lit("changed")))
      .select(keys.map(col) :+ col("change_type"): _*)
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
