package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * hOCR / ALTO page-markup builders and parsers — builders as pure Catalyst struct
 * manipulation (transform + concat, no UDF), parsers as native codegen'd one-pass
 * scanner EXPRESSIONS ([[ParseHocrExpr]]/[[ParseAltoExpr]]; the original
 * regexp_extract_all + zip_with forms are kept as differential references), per the
 * engine's north star ("an hOCR/ALTO parser implemented as Catalyst-friendly struct
 * manipulation rather than opaque UDFs"). The reference's word loop produces exactly
 * the data hOCR carries — word text + confidence (uiucprescon/ocr/reader2.cpp:43-55,
 * discarded there) — so these are the serialization formats of what the engine
 * already computes.
 *
 * Word geometry/confidence are DETERMINISTIC functions of word index and content:
 *   x0 = idx * 10,  x1 = idx * 10 + 8,  bbox height 12,
 *   conf = 50 + 3 * hexVal(first char of the word).
 * Build->parse is therefore verifiable against an independent direct computation.
 *
 * Everything here whole-stage-codegens except regexp evaluation itself; at scale the
 * parse is embarrassingly parallel and shuffle-free.
 */
object HocrAlto {

  /** 0-based hex digit value of a single-char column ('0'..'f'). */
  private def hexVal(c: Column): Column =
    (instr(lit("0123456789abcdef"), c) - 1).cast("int")

  private def confOf(word: Column): Column = lit(50) + lit(3) * hexVal(substring(word, 1, 1))

  /** Build an hOCR line from the engine page text ("ocr:<lang> w1 w2 ...").
    * One ocr_line span containing one ocrx_word span per word. */
  def toHocr(pageText: Column): Column = {
    val words = slice(split(pageText, " "), 2, 100000) // drop the "ocr:<lang>" prefix
    val wordSpans = transform(words, (w, i) =>
      concat(
        lit("<span class='ocrx_word' title='bbox "), (i * 10).cast("string"),
        lit(" 0 "), (i * 10 + 8).cast("string"), lit(" 12; x_wconf "),
        confOf(w).cast("string"), lit("'>"), w, lit("</span>")))
    concat(lit("<span class='ocr_line'>"), array_join(wordSpans, ""), lit("</span>"))
  }

  /** Parse hOCR into array<struct<word, x0, y0, x1, y1, conf>> — the native one-pass
    * scanner ([[HocrAltoOps.parseHocr]]); value-identical to [[parseHocrRegex]] on
    * every builder-produced page (HocrAltoSpec differential). */
  def parseHocr(hocr: Column): Column = ParseHocrExpr(hocr)

  /** Declarative regex form of [[parseHocr]] — retained as the differential-test
    * reference implementation (two regexp_extract_all passes + five regexp_extract
    * per word; the native scanner replaced it in the hot path, VERDICT r2 #4). */
  def parseHocrRegex(hocr: Column): Column = {
    val words = regexp_extract_all(hocr, lit("<span class='ocrx_word'[^>]*>([^<]*)</span>"), lit(1))
    val titles = regexp_extract_all(hocr, lit("title='([^']*)'"), lit(1))
    zip_with(words, titles, (w, t) => struct(
      w.as("word"),
      regexp_extract(t, "bbox ([0-9]+) ([0-9]+) ([0-9]+) ([0-9]+)", 1).cast("int").as("x0"),
      regexp_extract(t, "bbox ([0-9]+) ([0-9]+) ([0-9]+) ([0-9]+)", 2).cast("int").as("y0"),
      regexp_extract(t, "bbox ([0-9]+) ([0-9]+) ([0-9]+) ([0-9]+)", 3).cast("int").as("x1"),
      regexp_extract(t, "bbox ([0-9]+) ([0-9]+) ([0-9]+) ([0-9]+)", 4).cast("int").as("y1"),
      regexp_extract(t, "x_wconf ([0-9]+)", 1).cast("int").as("conf")))
  }

  /** Build an ALTO TextLine from the engine page text. */
  def toAlto(pageText: Column): Column = {
    val words = slice(split(pageText, " "), 2, 100000)
    val strings = transform(words, (w, i) =>
      concat(
        lit("<String CONTENT=\""), w,
        lit("\" HPOS=\""), (i * 10).cast("string"),
        lit("\" VPOS=\"0\" WIDTH=\"8\" HEIGHT=\"12\" WC=\""),
        confOf(w).cast("string"), lit("\"/>")))
    concat(lit("<TextLine>"), array_join(strings, ""), lit("</TextLine>"))
  }

  /** Parse ALTO into array<struct<word, hpos, vpos, width, height, wc>> — the native
    * one-pass scanner ([[HocrAltoOps.parseAlto]]); value-identical to
    * [[parseAltoRegex]] on every builder-produced page (HocrAltoSpec). */
  def parseAlto(alto: Column): Column = ParseAltoExpr(alto)

  /** Declarative regex form of [[parseAlto]] — differential-test reference. */
  def parseAltoRegex(alto: Column): Column = {
    val elems = regexp_extract_all(alto, lit("<String ([^/]*)/>"), lit(1))
    transform(elems, e => struct(
      regexp_extract(e, "CONTENT=\"([^\"]*)\"", 1).as("word"),
      regexp_extract(e, "HPOS=\"([0-9]+)\"", 1).cast("int").as("hpos"),
      regexp_extract(e, "VPOS=\"([0-9]+)\"", 1).cast("int").as("vpos"),
      regexp_extract(e, "WIDTH=\"([0-9]+)\"", 1).cast("int").as("width"),
      regexp_extract(e, "HEIGHT=\"([0-9]+)\"", 1).cast("int").as("height"),
      regexp_extract(e, "WC=\"([0-9]+)\"", 1).cast("int").as("wc")))
  }
}
