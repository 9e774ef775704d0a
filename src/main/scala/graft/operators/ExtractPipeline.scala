package graft.operators

import graft.model._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * The flagship operator: interleaved documents -> extracted span sequences.
 *
 * Plan shape (all declarative except the OCR island):
 *
 * {{{
 *   docs(doc_id, lang, spans)
 *     |- explode(spans)
 *     |- kind='image' --> typed mapPartitions over per-executor EnginePool  (OCR island)
 *     |- kind='text'  --> TextClassifier (pure Catalyst, whole-stage codegen)
 *     \- unionByName --> [optional salted re-assembly agg]
 * }}}
 *
 * Scale notes (designed for 10^12 docs / 1000 executors, tested on local[32]):
 *  - The branch split means two scans of the input; with nested-schema pruning
 *    (spark.sql.optimizer.nestedSchemaPruning.enabled, on by default) the media branch
 *    reads only (doc_id, lang, spans.kind, spans.media_ref, spans.offset) and the text
 *    branch only (..., spans.text, spans.offset) — each scan is narrower than one fused
 *    row-mapper pass would be, and the text branch keeps whole-stage codegen which a
 *    fused mapPartitions over all spans would forfeit.
 *  - The flat form has NO shuffle: explode, filter, mapPartitions and union are all
 *    narrow. The only shuffles in the doc form are the re-assembly aggregation (salted,
 *    two-stage, see [[reassemble]]) and any final repartitionByRange for balanced output.
 *  - `lang` rides through the typed boundary inside the task row, so no join is needed
 *    to restore document metadata after OCR.
 *  - Engine init happens once per (executor JVM, language) via [[EnginePool]], mirroring
 *    the reference's one TessBaseAPI::Init per Reader (uiucprescon/ocr/reader2.cpp:16).
 */
object ExtractPipeline {

  /** Salt fan-out for the re-assembly of skewed (multi-page) documents. */
  val SaltBuckets = 8

  /** Flat extraction: one row per span, schema
    * (doc_id, lang, offset, kind, text, media_ref, ok, error). */
  def extractFlat(docs: DataFrame, config: EngineConfig = EngineConfig.default): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val exploded = docs
      .select(col("doc_id"), col("lang"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("lang"), col("s.kind"), col("s.text"),
        col("s.media_ref"), col("s.offset"))

    // ---- media branch: the OCR island -------------------------------------------
    val mediaTasks: Dataset[MediaTaskL] = exploded
      .filter(col("kind") === "image")
      .select(col("doc_id"), col("lang"), col("offset"), col("media_ref"))
      .as[MediaTaskL]

    val ocrResults: Dataset[OcrSpanWithLang] = mediaTasks.mapPartitions { it =>
      // decode memo: load-once/read-many within a partition, the distributed analogue of
      // Reader.read_image vs Reader.read (uiucprescon/ocr/reader.py:52-75).
      val memo = new java.util.LinkedHashMap[String, Either[String, Array[Byte]]](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, Either[String, Array[Byte]]]): Boolean = size > 256
      }
      it.map(t => ocrOne(t, config, memo))
    }

    val mediaOut = ocrResults.toDF()
      .select(col("doc_id"), col("lang"), col("offset"), col("kind"), col("text"),
        col("media_ref"), col("ok"), col("error"), col("n_words"), col("conf_sum"))

    // ---- text branch: pure Catalyst ----------------------------------------------
    val textOut = exploded
      .filter(col("kind") === "text")
      .select(
        col("doc_id"), col("lang"), col("offset"), col("kind"),
        TextClassifier.classify(col("text")).as("text"),
        col("media_ref"),
        lit(true).as("ok"),
        lit(null).cast("string").as("error"),
        lit(0).as("n_words"),
        lit(0.0).as("conf_sum"))

    mediaOut.unionByName(textOut)
  }

  /** OCR one media task. Decode runs BEFORE the engine-goodness check, mirroring
    * Reader2::get_ocr = load THEN get_ocr_from_image (uiucprescon/ocr/reader2.cpp:31-34):
    * a bad file errors even when the engine is bad. */
  private def ocrOne(
      t: MediaTaskL,
      config: EngineConfig,
      memo: java.util.Map[String, Either[String, Array[Byte]]]): OcrSpanWithLang = {
    val eng = EnginePool.get(t.lang, config)
    memo.computeIfAbsent(t.media_ref, StandardMediaDecoder.decode(_)) match {
      case Left(err) =>
        OcrSpanWithLang(t.doc_id, t.lang, t.offset, "image", "", t.media_ref,
          ok = false, err, 0, 0.0)
      case Right(payload) =>
        if (!eng.isGood)
          OcrSpanWithLang(t.doc_id, t.lang, t.offset, "image", "", t.media_ref,
            ok = false, "engine not initialized: " + t.lang, 0, 0.0)
        else {
          val page = eng.recognize(payload)
          OcrSpanWithLang(t.doc_id, t.lang, t.offset, "image", page.text, t.media_ref,
            ok = true, null, page.wordConfidences.length, page.wordConfidences.sum)
        }
    }
  }

  /**
   * Re-assemble the flat span stream into per-document span sequences
   * (doc_id, spans, ok, error, n_spans).
   *
   * Two-stage salted aggregation: stage 1 groups on (doc_id, salt) collecting partial
   * span lists, stage 2 merges partials and array_sorts by offset. The salt spreads a
   * pathological document (10^5+ spans at web scale; the synthetic tail is every 37th
   * doc) across [[SaltBuckets]] reducers so no single task materializes a giant
   * collect_list in one pass — AQE cannot split a single aggregation key, salting is the
   * only remedy. The salt is derived from the span offset (dense per doc), so spans
   * spread evenly and correctness never depends on bucket placement: stage 2 re-sorts by
   * offset. `salted=false` gives the single-shuffle plan for skew-free inputs.
   */
  def reassemble(flat: DataFrame, salted: Boolean = true): DataFrame = {
    val spanStruct = struct(
      col("offset"), col("kind"),
      coalesce(col("text"), lit("")).as("text"),
      col("media_ref"))
    val errStruct = struct(col("offset"), col("error"))

    if (!salted) {
      flat.groupBy(col("doc_id")).agg(
        array_sort(collect_list(spanStruct)).as("spans"),
        min(col("ok")).as("ok"),
        array_sort(collect_list(when(col("error").isNotNull, errStruct))).as("errs"),
        count(lit(1)).as("n_spans")
      ).select(
        col("doc_id"), col("spans"), col("ok"),
        get(col("errs"), lit(0)).getField("error").as("error"), col("n_spans"))
    } else {
      flat
        .withColumn("salt", pmod(col("offset"), lit(SaltBuckets)))
        .groupBy(col("doc_id"), col("salt"))
        .agg(
          collect_list(spanStruct).as("part"),
          min(col("ok")).as("ok_p"),
          collect_list(when(col("error").isNotNull, errStruct)).as("errs_p"),
          count(lit(1)).as("n_p"))
        .groupBy(col("doc_id"))
        .agg(
          array_sort(flatten(collect_list(col("part")))).as("spans"),
          min(col("ok_p")).as("ok"),
          array_sort(flatten(collect_list(col("errs_p")))).as("errs"),
          sum(col("n_p")).as("n_spans"))
        .select(
          col("doc_id"), col("spans"), col("ok"),
          get(col("errs"), lit(0)).getField("error").as("error"), col("n_spans"))
    }
  }
}

/** Typed unit of work for the OCR island, with document lang riding along. */
final case class MediaTaskL(doc_id: String, lang: String, offset: Int, media_ref: String)

/** OCR result carrying lang through the typed boundary (no re-join needed). */
final case class OcrSpanWithLang(
    doc_id: String,
    lang: String,
    offset: Int,
    kind: String,
    text: String,
    media_ref: String,
    ok: Boolean,
    error: String,
    n_words: Int,
    conf_sum: Double)
