package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators (beyond-reference). */
object Temporal {

  /** As-of join: for every left row, attach the single right row with
    * the greatest `rightTime` ≤ `leftTime` within the same key ("most
    * recent prior observation"); `direction = "forward"` flips it to
    * the smallest `rightTime` ≥ `leftTime` ("next observation").
    *
    * Spark-first plan: NOT an inequality join (which Catalyst can only
    * execute as a broadcast-nested-loop / cartesian at scale). Instead
    * union the two sides tagged, hash-shuffle ONCE on the key, sort
    * within partitions by (time, side), and carry the latest right row
    * forward with `last_value(ignoreNulls)` over the ordered window.
    * Cost = one shuffle + one sort, same as a sort-merge join; no
    * quadratic blow-up on hot keys.
    *
    * Ties (`rightTime == leftTime`) are INCLUSIVE (right sorts before
    * left at equal time). When several right rows share the selected
    * (key, time), the attached row is the one with the GREATEST payload
    * struct (field order as given in `rightCols`) — a deterministic,
    * documented pick; DuckDB's `ASOF JOIN` leaves this case unspecified,
    * so oracles must emulate with an explicit `ORDER BY time, payload`.
    * Left rows with no prior right row survive with nulls (left outer).
    *
    * @param rightCols right-side payload columns to attach (renamed as
    *                  given in the map: rightName → outputName)
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      rightCols: Map[String, String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")

    Seq("__k", "__t", "__side", "__r", "__c").foreach { n =>
      require(!left.columns.contains(n),
        s"left input already has a column named $n")
      require(!rightCols.values.exists(_ == n),
        s"right output column may not be named $n")
    }
    val leftOut = left.columns.toSeq
    // unified layout: key, t, side (0=right sorts first on ties), left
    // payload (null on right rows), and the right payload as ONE struct
    // (so all attached columns provably come from the same right row)
    val rStruct = struct(rightCols.toSeq.map { case (rc, o) => col(rc).as(o) }: _*)
    val lTagged = left.select(
      (Seq(col(leftKey).as("__k"), col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftOut.map(col) :+
        lit(null).cast(right.select(rStruct).schema.head.dataType).as("__r")): _*)
    // null-time right rows can satisfy neither inequality (SQL
    // comparison with NULL is never true) — drop them up front
    val rTagged = right.filter(col(rightTime).isNotNull).select(
      (Seq(col(rightKey).as("__k"), col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftOut.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        rStruct.as("__r")): _*)

    // deterministic tie-break when several right rows share (key, time):
    // order by the payload struct itself when its type is orderable, so
    // the carried row is always the struct-greatest of the tied set
    val rOrderable = org.apache.spark.sql.catalyst.expressions.RowOrdering
      .isOrderable(right.select(rStruct).schema.head.dataType)
    // forward = "earliest right row with rightTime >= leftTime": the
    // SAME carry-last-right-forward plan traversed in descending time
    // (right still sorts before left on ties -> equality stays inclusive)
    // null-time left rows must sort BEFORE any right row in BOTH
    // traversals (no carried match for an undefined probe time); a bare
    // .desc would put nulls last and attach a spurious "next" row
    val tOrd =
      if (direction == "backward") col("__t").asc_nulls_first
      else col("__t").desc_nulls_first
    val ordering =
      if (rOrderable) Seq(tOrd, col("__side").asc, col("__r").asc_nulls_first)
      else Seq(tOrd, col("__side").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    lTagged.unionByName(rTagged)
      .withColumn("__c", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftOut.map(col) ++
        rightCols.values.toSeq.map(o => col("__c").getField(o).as(o)): _*)
  }
}
