package graft

import graft.functions.PdfLayout
import graft.operators.ExtractPipeline
import graft.sources.Interleave
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * PDF content-stream scanner + layout reconstruction
 * ([[graft.functions.PdfLayoutOps]]): differential gate against the declarative
 * regex reference (raw runs, stream order) with an independent reading-order
 * reconstruction, plus adversarial content-stream fragments (escapes, nested
 * parens, unknown operators, unterminated literals). The DuckDB oracle
 * additionally pins reading-order words + geometry against a direct computation
 * from the word model (OracleSql.pdfWords), so the parser and the layout
 * arithmetic are each verified twice, independently.
 */
class PdfLayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def okPages: DataFrame =
    ExtractPipeline.extractFlat(Interleave.docs(spark, sfDir))
      .filter(col("kind") === "image" && col("ok"))
      .select(col("doc_id"), col("offset"), col("text"))

  test("native parse+layout == regex runs re-ordered independently, every corpus page") {
    val pages = okPages.withColumn("pdf", PdfLayout.toPdf(col("text")))
    // independent reading-order reconstruction over the regex reference's raw runs:
    // sort (y desc, x asc) declaratively, then compare word sequences
    val native = pages.withColumn("got",
      transform(PdfLayout.parsePdf(col("pdf")), r => r.getField("word")))
    val ref = pages.withColumn("want",
      transform(
        array_sort(PdfLayout.parsePdfRunsRegex(col("pdf")), (l, r) =>
          when(l.getField("y") =!= r.getField("y"),
            r.getField("y") - l.getField("y"))
            .otherwise(l.getField("x") - r.getField("x"))),
        r => r.getField("word")))
    val diff = native.select(col("doc_id"), col("offset"), col("got"))
      .join(ref.select(col("doc_id"), col("offset"), col("want")),
        Seq("doc_id", "offset"))
      .filter(not(col("got") === col("want")))
    assert(diff.count() === 0)
    assert(native.select(sum(size(col("got")))).head.getLong(0) > 1000)
  }

  test("reading order survives the scrambled stream: parse(toPdf(text)) == the words") {
    val pages = okPages.limit(50)
      .withColumn("words", slice(split(col("text"), " "), 2, 100000))
      .withColumn("parsed",
        transform(PdfLayout.parsePdf(PdfLayout.toPdf(col("text"))),
          r => r.getField("word")))
    val bad = pages.filter(not(col("words") === col("parsed")))
    assert(bad.count() === 0)
  }

  test("property fuzz: scala-built streams parse back to the exact word sequence") {
    import org.apache.spark.unsafe.types.UTF8String
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // reference formulation of the builder (plain Scala mirror of PdfLayout.toPdf)
    def build(words: Seq[String]): String =
      words.grouped(PdfLayout.WordsPerLine).zipWithIndex.map { case (lw, l) =>
        val y = PdfLayout.YTop - l * PdfLayout.YStep
        val runs = lw.zipWithIndex.map { case (w, j) =>
          val pos = if (j == 0) s"1 0 0 1 ${PdfLayout.X0} $y Tm "
                    else s"${PdfLayout.XStep} 0 Td "
          s"$pos($w) Tj "
        }.mkString
        s"BT /F1 12 Tf ${runs}ET"
      }.toSeq.reverse.mkString("\n")
    def parsed(s: String): Seq[(String, Int, Int)] = {
      val arr = graft.functions.PdfLayoutOps
        .parsePdf(UTF8String.fromString(s))
      (0 until arr.numElements()).map { i =>
        val r = arr.getStruct(i, 5)
        (r.getUTF8String(0).toString, r.getInt(3), r.getInt(4))
      }
    }
    val word = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val wordsGen = Gen.nonEmptyListOf(word).map(_.take(40))
    (0 until 200).foreach { i =>
      wordsGen(Gen.Parameters.default, Seed(0x9d7a6e11L + i)).foreach { ws =>
        val got = parsed(build(ws))
        assert(got.map(_._1) === ws) // reading order == original word order
        got.zipWithIndex.foreach { case ((_, x, y), k) =>
          assert(x === PdfLayout.X0 + PdfLayout.XStep * (k % PdfLayout.WordsPerLine))
          assert(y === PdfLayout.YTop - PdfLayout.YStep * (k / PdfLayout.WordsPerLine))
        }
      }
    }
    // regression (found by the byte-noise fuzz below): stray delimiter bytes outside
    // a literal used to match a zero-length operator token and never advance the
    // scan position — an infinite loop on one malformed page. They must be consumed
    // (dropping pending operands) and the rest of the stream still parse.
    Seq(")", "]", ">", "[", "<", ")))", "75 700 ] Td (w) Tj").foreach { s =>
      graft.functions.PdfLayoutOps.parsePdf(UTF8String.fromString(s))
    }
    assert(parsed("BT 1 0 0 1 72 700 Tm ) (w) Tj ET").map(_._1) === Seq("w"))

    // robustness: arbitrary byte noise never throws, just yields runs or nothing
    val noise = Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray)
    (0 until 200).foreach { i =>
      noise(Gen.Parameters.default, Seed(0x5eedf00dL + i)).foreach { bs =>
        graft.functions.PdfLayoutOps.parsePdf(UTF8String.fromBytes(bs))
      }
    }
  }

  test("adversarial content streams: tolerant scanning, exact positioning") {
    import spark.implicits._
    def parse(s: String): Seq[(String, Int, Int, Int, Int)] =
      Seq(s).toDF("pdf")
        .select(explode(PdfLayout.parsePdf(col("pdf"))).as("r"))
        .select(col("r.word"), col("r.line"), col("r.col"), col("r.x"), col("r.y"))
        .as[(String, Int, Int, Int, Int)].collect().toSeq

    // escapes and nested parens in string literals (PDF 32000-1 §7.3.4.2)
    assert(parse("""BT 1 0 0 1 5 9 Tm (a\(b\)c) Tj ET""") ===
      Seq(("a(b)c", 0, 0, 5, 9)))
    assert(parse("""BT 1 0 0 1 5 9 Tm (a(nested)b) Tj ET""") ===
      Seq(("a(nested)b", 0, 0, 5, 9)))
    assert(parse("""BT 1 0 0 1 5 9 Tm (back\\slash) Tj ET""") ===
      Seq(("back\\slash", 0, 0, 5, 9)))
    // Td accumulates relative to Tm; negative + fractional coordinates truncate
    assert(parse("BT 1 0 0 1 100 50 Tm (a) Tj -10 -20 Td (b) Tj ET") ===
      Seq(("a", 0, 0, 100, 50), ("b", 1, 0, 90, 30)))
    assert(parse("BT 1 0 0 1 10.7 20.9 Tm (w) Tj ET") === Seq(("w", 0, 0, 10, 20)))
    // unknown operators are skipped WITH their operands (no stack pollution)
    assert(parse("BT /F3 8 Tf 2 TL 7 7 7 7 7 7 q (x) Tj ET") ===
      Seq(("x", 0, 0, 0, 0))) // Tj with no positioning: BT origin
    // Tj without a pending string, string without Tj: both no-ops
    assert(parse("BT 1 0 0 1 1 1 Tm Tj (orphan) ET") === Seq.empty)
    // unterminated literal at EOF is dropped
    assert(parse("BT 1 0 0 1 1 1 Tm (never closed") === Seq.empty)
    // same y, x decides order; distinct y groups lines top (large y) first
    assert(parse(
      "BT 1 0 0 1 50 10 Tm (low) Tj ET BT 1 0 0 1 9 90 Tm (b) Tj ET " +
        "BT 1 0 0 1 2 90 Tm (a) Tj ET") ===
      Seq(("a", 0, 0, 2, 90), ("b", 0, 1, 9, 90), ("low", 1, 0, 50, 10)))
    assert(parse("") === Seq.empty)
  }
}
