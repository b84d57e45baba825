package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Per-cell helpers mirroring the reference's `Row` methods
  * (SURVEY.md §2.9), expressed as codegen-friendly [[Column]]
  * expressions — no UDFs, so they stay inside whole-stage codegen.
  */
object RowFunctions {

  /** Reference `SafeGetValue(col, subst)` (csvplus.go:67-75): missing
    * column value → substitute. Missing-in-Spark = null.
    */
  def safeGet(c: Column, subst: String): Column = coalesce(c, lit(subst))

  /** Reference `ValueAsInt` (csvplus.go:163-183): per-cell checked cast
    * with a descriptive error naming the column and offending value.
    * Non-parsable non-null input raises; null stays null (absent column
    * semantics).
    */
  def valueAsInt(c: Column, name: String): Column = {
    val casted = c.try_cast(LongType) // ANSI-safe: null on bad parse, then raise with reference text
    when(
      c.isNotNull && casted.isNull,
      raise_error(
        format_string(s"""column "$name": cannot convert "%s" to integer""", c)
      ).cast(LongType)
    ).otherwise(casted)
  }

  /** Reference `ValueAsFloat64` (csvplus.go:185-205). */
  def valueAsDouble(c: Column, name: String): Column = {
    val casted = c.try_cast(DoubleType)
    when(
      c.isNotNull && casted.isNull,
      raise_error(
        format_string(s"""column "$name": cannot convert "%s" to float""", c)
      ).cast(DoubleType)
    ).otherwise(casted)
  }

  /** Reference `Row.String` canonical rendering (csvplus.go:89-104):
    * `{ "k" : "v", ... }` with keys sorted — used verbatim in the
    * unique-index duplicate error. Driver-side, over a collected row.
    */
  def renderRow(row: org.apache.spark.sql.Row): String =
    renderRow(row, row.schema.fieldNames.toSeq)

  /** Same canonical rendering restricted to a subset of columns (the
    * reference's `SelectExisting(columns...).String`). */
  def renderRow(row: org.apache.spark.sql.Row, names: Seq[String]): String =
    names.sorted
      .map(f => s""""$f" : "${String.valueOf(row.getAs[Any](f))}"""")
      .mkString("{ ", ", ", " }")
}
