package graft

import graft.functions.TextNormalizeImpl
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/**
 * Canonical text normalization ([[TextNormalizeImpl]] / `normalize_text`). The
 * contract that matters downstream: hash-equal inputs after normalization — NFC
 * folds decomposed/precomposed forms, the whitespace zoo collapses to single ASCII
 * spaces, case folds — and normalization is IDEMPOTENT (re-running a pipeline over
 * already-normalized text is a no-op, not a drift source).
 */
class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def norm(s: String): String =
    TextNormalizeImpl.normalize(UTF8String.fromString(s)).toString

  test("NFC folds decomposed and precomposed forms to the same bytes") {
    assert(norm("Café") === norm("Café"))
    assert(norm("Café") === "café")
  }

  test("whitespace zoo collapses to single ASCII spaces; ends trimmed") {
    assert(norm("a b　c d\te  f\r\ng") === "a b c d e f g")
    assert(norm(" ​ x   ") === "x")
    assert(norm("zero​width") === "zero width")
  }

  test("case folds after NFC; plain ASCII text is untouched") {
    assert(norm("MiXeD CASE") === "mixed case")
    assert(norm("already normal text") === "already normal text")
  }

  test("SIMPLE case mapping, matching DuckDB lower(): U+0130 and final sigma") {
    // full mapping (String.toLowerCase) would emit 'i'+U+0307 and final-form 'ς';
    // DuckDB's utf8proc lower() is the UnicodeData SIMPLE mapping — so are we
    assert(norm("\u0130stanbul") === "istanbul")
    assert(norm("\u039F\u03A3") === "\u03BF\u03C3") // never final-form U+03C2
  }

  test("normalization makes case/whitespace variants exact-dedup-able") {
    // the composition that motivates the operator: a doc re-serialized with NBSP
    // separators and different casing is the SAME content, but exact dedup only
    // sees it after normalization
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val variants = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 600000).as("doc_id"),
        upper(regexp_replace(col("text"), lit(" "), lit("  "))).as("text"))
    val widened = docs.unionByName(variants)
    val nVariants = variants.count()
    assert(nVariants > 0)

    def dupCount(df: org.apache.spark.sql.DataFrame): Long =
      graft.operators.Dedup.exact(df).filter(col("is_dup") === 1).count()

    // raw bytes: the variants are invisible to content-hash dedup
    assert(dupCount(widened) === 0L)
    // normalized bytes: every variant collapses onto its original
    val normed = TextAnalysis.normalizeText(widened)
      .select(col("doc_id"), col("norm_text").as("text"))
    assert(dupCount(normed) === nVariants)
  }

  test("idempotent over the real corpus + injected unicode noise") {
    val noised = TextAnalysis.withUnicodeNoise(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val once = TextAnalysis.normalizeText(noised)
    val twice = once.select(col("doc_id"), col("norm_text").as("text"))
    val reNormChanged = TextAnalysis.normalizeText(twice)
      .filter(col("changed") === 1).count()
    assert(reNormChanged === 0L, "normalize(normalize(x)) must equal normalize(x)")
    // every noised doc is flagged changed; its normalized form drops the noise
    // except the canonical residue
    val changedIds = once.filter(col("changed") === 1)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(changedIds.exists(_ >= 500000L))
  }
}
