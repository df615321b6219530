package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for web-crawl cleaning — the step a
  * training-data pipeline runs before tokenization/dedup so that
  * byte-distinct but canonically-equal strings (composed vs decomposed
  * accents, width/compat variants) collapse to one form.
  *
  * Modes:
  *  - `nfc`  / `nfkc`: canonical / compatibility composition
  *    (java.text.Normalizer — the JDK's Unicode implementation, matching
  *    DuckDB's `nfc_normalize` for NFC);
  *  - `strip_accents`: NFD-decompose then drop combining marks
  *    (`\p{M}`), recomposing nothing — 'é' -> 'e', like DuckDB's
  *    `strip_accents`;
  *  - `casefold`: root-locale lowercase (locale-independent, so executor
  *    default locales can never change results).
  *
  * One pass per value, no regex compilation per row (the mark-strip scans
  * code points directly). Null-intolerant scalar, safe for ANSI mode.
  */
case class NormalizeText(child: Expression, mode: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType if NormalizeText.modes.contains(mode) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text mode must be one of ${NormalizeText.modes.mkString(", ")}, got $mode")
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text needs string, got ${t.sql}")
    }

  private def stripAccents(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    val out = new java.lang.StringBuilder(d.length)
    var i = 0
    while (i < d.length) {
      val cp = d.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK &&
          t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        out.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    out.toString
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val r = mode match {
      case "nfc"  => Normalizer.normalize(s, Normalizer.Form.NFC)
      case "nfkc" => Normalizer.normalize(s, Normalizer.Form.NFKC)
      case "strip_accents" => stripAccents(s)
      case "casefold" => s.toLowerCase(java.util.Locale.ROOT)
    }
    UTF8String.fromString(r)
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  val modes: Set[String] = Set("nfc", "nfkc", "strip_accents", "casefold")
}
