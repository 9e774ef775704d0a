package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Canonical text normalization — the preprocessing stage every hash-based operator
 * downstream (exact dedup, MinHash/SimHash, window dedup, fingerprints) silently
 * assumes: the SAME content must produce the SAME bytes before it is hashed. Web
 * text fails that three ways, each fixed here in a fixed order:
 *
 *  1. **Unicode form** — 'é' arrives both precomposed (U+00E9) and decomposed
 *     (e + U+0301 combining acute) from different OCR engines and editors; NFC
 *     (java.text.Normalizer, mirrored by DuckDB's nfc_normalize) picks one form.
 *  2. **Whitespace zoo** — NBSP, ideographic/typographic spaces (Zs), zero-width
 *     space, tabs/newlines all render as "space" but hash differently; every run
 *     collapses to one ASCII space, then ends are trimmed.
 *  3. **Case** — lowercased AFTER NFC so precomposed/decomposed pairs fold the
 *     same way.
 *
 * The three steps are deliberately the SAME primitives DuckDB exposes
 * (nfc_normalize / regexp_replace 'g' / trim / lower), so the operator is
 * oracle-verifiable byte-for-byte; the whitespace class is written with escapes
 * both regex engines (java.util.regex, RE2) read identically. Normalization is
 * idempotent (asserted in TextNormalizeSpec by property), so re-running a
 * pipeline over already-normalized text is a no-op rather than a drift source.
 */
object TextNormalizeImpl {

  /** One-or-more of: ASCII whitespace, Unicode space separators (Zs, includes
    * NBSP U+00A0), or zero-width space U+200B (category Cf, so not in Zs). */
  private val WsRun: Pattern = Pattern.compile("[\\t\\n\\x0B\\f\\r \\p{Zs}\\x{200B}]+")

  /** SIMPLE (1:1 codepoint) lowercase — deliberately NOT String.toLowerCase:
    * Java's String.toLowerCase applies FULL case mapping (SpecialCasing.txt:
    * 'İ' U+0130 -> "i" + combining dot U+0307, word-final 'Σ' -> 'ς'), while
    * DuckDB's lower() (utf8proc) applies the UnicodeData simple mapping
    * ('İ' -> 'i', every 'Σ' -> 'σ'). Character.toLowerCase(int) IS the simple
    * mapping, so this folds identically to the oracle on every codepoint —
    * the divergence-prone characters sit in TextAnalysis.UnicodeNoise so the
    * driver gate itself would catch a regression. */
  private def lowerSimple(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(Character.toLowerCase(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  def normalize(text: UTF8String): UTF8String = {
    val nfc = java.text.Normalizer.normalize(text.toString, java.text.Normalizer.Form.NFC)
    val collapsed = WsRun.matcher(nfc).replaceAll(" ")
    UTF8String.fromString(lowerSimple(collapsed.strip))
  }
}

/** `normalize_text(text)`: NFC -> whitespace canonicalization -> trim -> lower,
  * inside whole-stage codegen (static call, no UDF boxing). */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def nullSafeEval(input: Any): Any =
    TextNormalizeImpl.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNormalizeImpl.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object NormalizeTextExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(NormalizeTextExpr(ColumnBridge.expression(text)))
}
