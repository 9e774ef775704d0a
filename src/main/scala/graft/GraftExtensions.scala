package graft

import graft.functions.{BoilerplateExtract, DotLong, FingerprintExpr, MinHashBandsExpr, ParseAltoExpr, ParseHocrExpr, ParsePdfExpr, NormalizeTextExpr, SimHash64, WindowHashesExpr}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension entry point registering the engine's native Catalyst expressions as
 * SQL functions — attach with
 * `spark.sql.extensions=graft.GraftExtensions`
 * and `SELECT boilerplate_extract(markup)`, `SELECT simhash64(text)` work from plain
 * SQL (and from any SQL-speaking client), with full whole-stage codegen.
 *
 * This is the (c)-tier extension mechanism of the build rules (custom Expression
 * registered via SparkSessionExtensions); no custom LogicalPlan/Strategy is injected
 * because nothing in the engine's semantics requires plan surgery (SURVEY.md §4.2).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("boilerplate_extract"),
      new ExpressionInfo(classOf[BoilerplateExtract].getName, "boilerplate_extract"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "boilerplate_extract(markup) takes one argument")
        BoilerplateExtract(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash64(text) takes one argument")
        SimHash64(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("dot_long"),
      new ExpressionInfo(classOf[DotLong].getName, "dot_long"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_long(a, b) takes two array<bigint> arguments")
        DotLong(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBandsExpr].getName, "minhash_bands"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "minhash_bands(text) takes one argument")
        MinHashBandsExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("doc_fingerprint"),
      new ExpressionInfo(classOf[FingerprintExpr].getName, "doc_fingerprint"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "doc_fingerprint(text) takes one argument")
        FingerprintExpr(args.head)
      }))
    // the three page-format scanners: parse hOCR / ALTO / PDF-content-stream pages
    // from plain SQL (each returns an array of word structs; the PDF form is
    // reading-ordered — see PdfLayoutOps)
    ext.injectFunction((
      FunctionIdentifier("parse_hocr"),
      new ExpressionInfo(classOf[ParseHocrExpr].getName, "parse_hocr"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "parse_hocr(page) takes one argument")
        ParseHocrExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("parse_alto"),
      new ExpressionInfo(classOf[ParseAltoExpr].getName, "parse_alto"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "parse_alto(page) takes one argument")
        ParseAltoExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("parse_pdf"),
      new ExpressionInfo(classOf[ParsePdfExpr].getName, "parse_pdf"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "parse_pdf(content_stream) takes one argument")
        ParsePdfExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("normalize_text"),
      new ExpressionInfo(classOf[NormalizeTextExpr].getName, "normalize_text"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "normalize_text(text) takes one argument")
        NormalizeTextExpr(args.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("window_hashes"),
      new ExpressionInfo(classOf[WindowHashesExpr].getName, "window_hashes"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "window_hashes(text) takes one argument")
        WindowHashesExpr(args.head)
      }))
  }
}
