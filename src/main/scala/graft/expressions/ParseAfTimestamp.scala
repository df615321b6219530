package graft.expressions

import java.time.LocalDateTime

import org.apache.spark.sql.catalyst.expressions.{Expression, TimeZoneAwareExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `parse_datetime` (main.py:87-105) as one single-pass
  * expression — the hot path of the 49-column normalize stage (7 datetime
  * columns per row):
  *
  *  1. strip with Python's whitespace set (main.py:90);
  *  2. case-insensitive '', 'null', 'none', 'n/a' -> NULL (main.py:91);
  *  3. truncate at the first '.' (main.py:93-95);
  *  4. zero-pad a single-digit hour (main.py:96-100);
  *  5. strict `yyyy-MM-dd HH:mm:ss` parse in the session timezone;
  *     anything invalid -> NULL, never an exception (main.py:101-105).
  *
  * Semantics are identical to the composed-built-ins form kept as
  * [[graft.functions.Normalize.parseAfTimestampComposed]] (equivalence
  * property-tested in NormalizeSpec); this form replaces three regex
  * passes + a format parse per value with one character walk.
  */
case class ParseAfTimestamp(child: Expression,
                            timeZoneId: Option[String] = None)
    extends UnaryExpression with TimeZoneAwareExpression with CodegenFallback {

  override def dataType: DataType = TimestampType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"parse_af_timestamp needs string, got ${t.sql}")
    }

  override def withTimeZone(timeZoneId: String): TimeZoneAwareExpression =
    copy(timeZoneId = Option(timeZoneId))

  // Python str.strip() whitespace = str.isspace() chars: Java's
  // Character.isWhitespace set (ASCII ws, \x1c-\x1f, breaking Zs) plus
  // NEL \u0085 and the non-breaking Zs chars Java deliberately excludes
  // (\u00a0 NBSP, \u2007 figure space, \u202f narrow NBSP)
  private def isPyWs(c: Char): Boolean =
    Character.isWhitespace(c) ||
      c == '\u0085' || c == '\u00a0' || c == '\u2007' || c == '\u202f'

  private def digit(s: String, i: Int): Boolean = {
    val c = s.charAt(i); c >= '0' && c <= '9'
  }

  private def int2(s: String, i: Int): Int =
    (s.charAt(i) - '0') * 10 + (s.charAt(i + 1) - '0')

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // 1. strip
    var a = 0
    var b = raw.length
    while (a < b && isPyWs(raw.charAt(a))) a += 1
    while (b > a && isPyWs(raw.charAt(b - 1))) b -= 1
    var s = raw.substring(a, b)
    // 2. sentinels (case-insensitive)
    val low = s.toLowerCase(java.util.Locale.ROOT)
    if (low == "" || low == "null" || low == "none" || low == "n/a") return null
    // 3. truncate at first '.'
    val dot = s.indexOf('.')
    if (dot >= 0) s = s.substring(0, dot)
    // 4. zero-pad single-digit hour: ^(\d{4}-\d{2}-\d{2}) (\d): -> "0$2"
    if (s.length >= 13 &&
        digit(s, 0) && digit(s, 1) && digit(s, 2) && digit(s, 3) &&
        s.charAt(4) == '-' && digit(s, 5) && digit(s, 6) &&
        s.charAt(7) == '-' && digit(s, 8) && digit(s, 9) &&
        s.charAt(10) == ' ' && digit(s, 11) && s.charAt(12) == ':')
      s = s.substring(0, 11) + "0" + s.substring(11)
    // 5. strict yyyy-MM-dd HH:mm:ss gate + ranged parse, never throwing
    if (s.length != 19) return null
    var i = 0
    while (i < 19) {
      val ok =
        if (i == 4 || i == 7) s.charAt(i) == '-'
        else if (i == 10) s.charAt(i) == ' '
        else if (i == 13 || i == 16) s.charAt(i) == ':'
        else digit(s, i)
      if (!ok) return null
      i += 1
    }
    try {
      val ldt = LocalDateTime.of(
        int2(s, 0) * 100 + int2(s, 2), int2(s, 5), int2(s, 8),
        int2(s, 11), int2(s, 14), int2(s, 17))
      val instant = ldt.atZone(zoneId).toInstant
      instant.getEpochSecond * 1000000L + instant.getNano / 1000L
    } catch {
      case _: java.time.DateTimeException => null // e.g. month 13, Feb 30
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ParseAfTimestamp =
    copy(child = newChild)
}
