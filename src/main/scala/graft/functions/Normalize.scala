package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar normalization functions (reference F1/F2/F3) expressed as pure
  * `Column => Column` compositions of codegen'd built-ins — no UDFs, so the
  * whole normalize stage stays inside WholeStageCodegen and is
  * oracle-SQL-expressible for the DuckDB compare.
  *
  * Reference semantics being reproduced:
  *  - `parse_datetime` (main.py:87-105): lenient, never-throwing timestamp
  *    parse with sentinel nulls, fractional-second truncation and
  *    single-digit-hour zero-padding.
  *  - sentinel-null normalization for non-datetime columns (main.py:165).
  */
object Normalize {

  /** Python `str.strip()` whitespace class = `str.isspace()`: ASCII
    * `[ \t\n\x0B\f\r]` plus the C1 separators `\x1c-\x1f`, NEL ``,
    * and the Unicode Zs spaces (incl. non-breaking NBSP/figure/narrow).
    * Java regex `\s` covers only the ASCII part, so the class is spelled
    * out explicitly. */
  private val pyWsClass =
    "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a" +
      "\\u2028\\u2029\\u202f\\u205f\\u3000]"
  private val stripRe = s"^$pyWsClass+|$pyWsClass+$$"

  /** F3 — Python-compatible strip (Spark's `trim` only strips ASCII space). */
  def pyStrip(c: Column): Column = regexp_replace(c, stripRe, "")

  /** F2 — sentinel-null normalization for string columns (main.py:165).
    * Case-SENSITIVE, no trim — deliberately different from the datetime
    * path (F1), matching the reference exactly. */
  def nullIfSentinels(c: Column): Column =
    when(c.isNull || c.isin("", "null", "None"), lit(null)).otherwise(c)

  /** F1 — lenient datetime parse (`parse_datetime`, main.py:87-105), as
    * the single-pass [[graft.expressions.ParseAfTimestamp]] expression
    * (three regex passes + a format parse replaced by one character walk;
    * semantics property-tested equal to [[parseAfTimestampComposed]]). */
  def parseAfTimestamp(c: Column): Column = {
    ExprColumns.register(org.apache.spark.sql.SparkSession.active)
    call_function("graft_parse_af_ts", c.cast("string"))
  }

  /** F1 as pure built-ins (the oracle-SQL-expressible rendering kept for
    * the equivalence property test):
    *  1. strip (Python whitespace set)                       main.py:90
    *  2. case-insensitive '', 'null', 'none', 'n/a' -> NULL  main.py:91
    *  3. truncate at the first '.' (drops fractional seconds
    *     AND anything after it)                              main.py:93-95
    *  4. zero-pad a single-digit hour                        main.py:96-100
    *  5. strict `yyyy-MM-dd HH:mm:ss` parse; anything else
    *     -> NULL, never an exception                         main.py:101-105
    *
    * `try_to_timestamp` keeps step 5 non-throwing under ANSI mode; the
    * rlike guard reproduces the reference's strict regex gate (so e.g.
    * `2024-1-2 03:04:05` is rejected even though Spark's parser might
    * accept it leniently).
    */
  def parseAfTimestampComposed(c: Column): Column = {
    val stripped = pyStrip(c.cast("string"))
    val truncated = substring_index(stripped, ".", 1)
    val padded = regexp_replace(
      truncated, "^(\\d{4}-\\d{2}-\\d{2}) (\\d):", "$1 0$2:")
    when(c.isNull || lower(stripped).isin("", "null", "none", "n/a"),
      lit(null).cast("timestamp"))
    .when(padded.rlike("^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$"),
      try_to_timestamp(padded, lit("yyyy-MM-dd HH:mm:ss")))
    .otherwise(lit(null).cast("timestamp"))
  }
}
