package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Predicate combinators mirroring the reference's `All` / `Any` /
  * `Not` / `Like` (/root/reference/csvplus.go:1240-1293), re-expressed
  * as [[Column]] algebra so Catalyst can push the combined predicate
  * into the scan (the reference can only evaluate them row-at-a-time in
  * user code; here `all(...)`/`like(...)` participate in predicate
  * pushdown, partition pruning and whole-stage codegen for free).
  */
object Preds {

  /** Conjunction; reference `All` (csvplus.go:1240-1252). */
  def all(preds: Column*): Column = {
    require(preds.nonEmpty, "empty list of predicates")
    preds.reduce(_ && _)
  }

  /** Disjunction; reference `Any` (csvplus.go:1254-1266). */
  def any(preds: Column*): Column = {
    require(preds.nonEmpty, "empty list of predicates")
    preds.reduce(_ || _)
  }

  /** Negation; reference `Not` (csvplus.go:1268-1272). */
  def not(pred: Column): Column = !pred

  /** Conjunction of column equalities against a match "row"; reference
    * `Like` (csvplus.go:1274-1293) — panics on empty match there,
    * IllegalArgumentException here.
    */
  def like(matchRow: Map[String, Any]): Column = {
    require(matchRow.nonEmpty, "empty match row")
    matchRow.toSeq
      .sortBy(_._1) // deterministic plan regardless of map iteration order
      .map { case (name, value) => col(name) === lit(value) }
      .reduce(_ && _)
  }

  def like(first: (String, Any), rest: (String, Any)*): Column =
    like((first +: rest).toMap)
}
