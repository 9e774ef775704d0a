package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * PDF content-stream builder + layout parser — the "PDF/layout parse" leg of the
 * north rule's main-content extraction triad, built exactly like the hOCR/ALTO pair
 * ([[HocrAlto]]): the builder is pure Catalyst struct manipulation serializing the
 * words the OCR engine already computes (reference word loop,
 * uiucprescon/ocr/reader2.cpp:43-55), the parser is a native codegen'd one-pass
 * scanner ([[ParsePdfExpr]]) with a declarative regex form retained as the
 * differential-test reference.
 *
 * Page geometry is DETERMINISTIC so the DuckDB oracle can predict it independently
 * of the build->parse round-trip: word i sits on line i/4 at column i%4, i.e.
 * x = 40 + 90*(i%4), y = 720 - 16*(i/4) (PDF user space is y-UP: line 0 is the TOP
 * of the page at the largest y). The builder emits one BT..ET text object per line
 * — `Tm` positions the first word absolutely, `Td` steps the rest relatively — and
 * emits the line blocks in REVERSE physical order: recovering the text requires
 * actual layout reconstruction from geometry (sort y desc, x asc), not trusting
 * stream order, which is exactly what real PDF generators force a parser to do.
 */
object PdfLayout {

  /** Words per line / geometry constants — mirrored by the oracle SQL. */
  val WordsPerLine = 4
  val X0 = 40
  val XStep = 90
  val YTop = 720
  val YStep = 16

  /** Build a PDF content stream from the engine page text ("ocr:<lang> w1 w2 ..."). */
  def toPdf(pageText: Column): Column = {
    val words = slice(split(pageText, " "), 2, 100000) // drop the "ocr:<lang>" prefix
    val nLines = ceil(size(words) / lit(WordsPerLine.toDouble)).cast("int")
    val lineBlocks = transform(
      sequence(lit(0), greatest(nLines - 1, lit(0))), l => {
        val lineWords = slice(words, l * WordsPerLine + 1, lit(WordsPerLine))
        val y = (lit(YTop) - l * YStep).cast("string")
        val runs = transform(lineWords, (w, j) =>
          concat(
            when(j === 0,
              concat(lit(s"1 0 0 1 $X0 "), y, lit(" Tm ")))
              .otherwise(lit(s"$XStep 0 Td ")),
            lit("("), w, lit(") Tj ")))
        concat(lit("BT /F1 12 Tf "), array_join(runs, ""), lit("ET"))
      })
    // physical emission order deliberately scrambled (reversed)
    array_join(reverse(lineBlocks), "\n")
  }

  /** Parse + layout-reconstruct a content stream into reading-ordered
    * array<struct<word, line, col, x, y>> — the native one-pass scanner
    * ([[PdfLayoutOps.parsePdf]]). */
  def parsePdf(pdf: Column): Column = ParsePdfExpr(pdf)

  /** Declarative regex form — differential-test reference, shaped to the BUILDER's
    * stream (one text object per built line, uniform Td step): extracts raw runs
    * (word, x, y) in STREAM order, no layout. The differential test reconstructs
    * reading order from these runs independently and compares with the native
    * scanner's output. */
  def parsePdfRunsRegex(pdf: Column): Column = {
    val blocks = split(pdf, "\n")
    flatten(transform(blocks, b => {
      val x0 = regexp_extract(b, "1 0 0 1 (-?[0-9]+) (-?[0-9]+) Tm", 1).cast("int")
      val y = regexp_extract(b, "1 0 0 1 (-?[0-9]+) (-?[0-9]+) Tm", 2).cast("int")
      val words = regexp_extract_all(b, lit("\\(([^)]*)\\) Tj"), lit(1))
      val step = coalesce(
        regexp_extract(b, "(-?[0-9]+) -?[0-9]+ Td", 1).cast("int"), lit(0))
      transform(words, (w, j) => struct(
        w.as("word"), (x0 + j * step).as("x"), y.as("y")))
    }))
  }
}
