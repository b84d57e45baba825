package graft

/** Error model mirroring the reference's semantics (SURVEY.md §2.12).
  *
  * The reference wraps every scan error in `DataSourceError{Line; Err}`
  * with message `row %d: %s` and a 1-based line number
  * (/root/reference/csvplus.go:1229-1238). API misuse (empty column
  * lists, duplicate names, too many join values) is a `panic` there —
  * here it is [[IllegalArgumentException]] raised at plan-build time on
  * the driver, which is the Spark-native analogue (fails before any
  * cluster work is scheduled).
  */
final class DataSourceException(val line: Long, message: String, cause: Throwable)
    extends RuntimeException(s"row $line: $message", cause) {
  def this(line: Long, message: String) = this(line, message, null)
}

