package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Boilerpipe-style main-content classifier for `kind='text'` spans, implemented entirely
 * as Catalyst expressions (regexp_extract_all / regexp_replace / length) so the text
 * branch stays inside whole-stage codegen — only the OCR island breaks it, exactly as the
 * reference's C++ island is the only non-Python code (SURVEY.md §2.8, §4.2).
 *
 * Heuristics (Kohlschütter-style, simplified to a deterministic contract):
 *  - link density = len(anchor text) / len(all visible text); a span whose link density
 *    exceeds 0.5 is boilerplate and classifies to the EMPTY string (empty-stays-empty,
 *    reference uiucprescon/ocr/reader2.cpp:37-39 semantics carried over);
 *  - otherwise the main content is the concatenation of paragraph block contents —
 *    nav / heading / anchor / footer text is stripped.
 */
object TextClassifier {

  /** Total visible text (all tags stripped). */
  def visibleText(raw: Column): Column = regexp_replace(raw, "<[^>]*>", "")

  /** Concatenated anchor-text of the span. */
  def linkText(raw: Column): Column =
    array_join(regexp_extract_all(raw, lit("<a [^>]*>([^<]*)</a>"), lit(1)), "")

  /** Link density numerator/denominator comparison without division (exact integers,
    * no float threshold ambiguity): boilerplate iff 2*len(link) > len(visible). */
  def isBoilerplate(raw: Column): Column =
    length(linkText(raw)) * 2 > length(visibleText(raw))

  /** Paragraph-block contents joined with a single space. */
  def paragraphText(raw: Column): Column =
    array_join(regexp_extract_all(raw, lit("<p>([^<]*)</p>"), lit(1)), " ")

  /** Declarative (3-regex) form — kept as the differential-testing and documentation
    * reference; the DuckDB oracle mirrors THIS formulation independently. */
  def classifyDeclarative(raw: Column): Column =
    when(isBoilerplate(raw), lit("")).otherwise(paragraphText(raw))

  /** The classified main content of a text span. Never null: boilerplate => "".
    * Production path: the single-pass codegen'd native expression
    * [[graft.functions.BoilerplateExtract]] (one scan instead of three regex passes;
    * BoilerplateSpec asserts bit-equality with [[classifyDeclarative]]). */
  def classify(raw: Column): Column = graft.functions.BoilerplateExtract(raw)
}
