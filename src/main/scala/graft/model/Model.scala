package graft.model

/**
 * Core data model of the extraction engine.
 *
 * The input table shape is fixed by the engine contract (see BASELINE.json `input_hint`):
 *
 * {{{
 *   doc_id: string
 *   spans:  array<struct<kind:string, text:string, media_ref:string, offset:int>>
 * }}}
 *
 * This lifts the reference's "one image file -> one text string" unit of work
 * (reference: uiucprescon/ocr/reader.py:64-75, uiucprescon/ocr/reader2.cpp:36-58) to
 * "one interleaved document -> one reconstructed span sequence". A `Span` with
 * `kind='image'` plays the role of the reference's image file path argument; a span with
 * `kind='text'` is raw markup the classifier strips (engine-new capability, the reference
 * has no HTML path).
 */
final case class Span(
    kind: String,      // 'text' | 'image'
    text: String,      // raw markup for kind='text'; null for media spans
    media_ref: String, // payload reference for kind='image'; null for text spans
    offset: Int        // position of the span within the document
)

/** One row of the input table. `lang` is carried as document metadata used for engine
  * routing (the reference routes via `Engine.get_reader(lang)`,
  * uiucprescon/ocr/engine.py:47-60); it is a superset of the minimal input shape. */
final case class Doc(doc_id: String, lang: String, spans: Seq[Span])

/**
 * One extracted span. Field order matters: `offset` first so that
 * `array_sort(collect_list(struct(...)))` restores document order without a comparator
 * lambda (keeps the aggregate codegen-friendly).
 *
 * Error-channel semantics (lifted from the reference, NOT task failures):
 *  - bad engine (unavailable language): `text=""`, `ok=false`,
 *    `error="engine not initialized: <lang>"` — the reference returns `""` from a bad
 *    reader rather than raising (uiucprescon/ocr/reader2.cpp:37-39, guarded by the
 *    FileNotFoundError pre-check at uiucprescon/ocr/reader.py:19-30).
 *  - unresolvable media_ref: `text=""`, `ok=false`, `error="Unable to load <ref>"` —
 *    mirrors TesseractGlueException("Unable to load "+filename)
 *    (uiucprescon/ocr/ImageLoaderStrategies.cpp:11-13); at table scale a bad document
 *    must never kill the job, so the exception becomes a row-level error value.
 *  - boilerplate-only text span: `text=""`, `ok=true` — empty string, never null
 *    (empty-stays-empty invariant, uiucprescon/ocr/reader2.cpp:37-39).
 */
final case class ExtractedSpan(
    doc_id: String,
    offset: Int,
    kind: String,
    text: String,
    media_ref: String,
    ok: Boolean,
    error: String
)

/** Typed unit of work crossing the mapPartitions boundary into the OCR engine pool. */
final case class MediaTask(
    doc_id: String,
    lang: String,
    offset: Int,
    media_ref: String
)

/** OCR result for one media span, metrics included. The reference computes per-word
  * confidences and then discards them (uiucprescon/ocr/reader2.cpp:43-55); we keep them
  * for the lineage/metrics table only — they never enter the golden span output. */
final case class OcrSpanResult(
    doc_id: String,
    offset: Int,
    kind: String,
    text: String,
    media_ref: String,
    ok: Boolean,
    error: String,
    n_words: Int,
    conf_sum: Double
)

/** Re-assembled output document (golden shape, FIXTURES.md §2). */
final case class DocExtracted(
    doc_id: String,
    spans: Seq[OutSpan],
    ok: Boolean,
    error: String
)

/** Span struct inside the re-assembled output array (offset-first for array_sort). */
final case class OutSpan(offset: Int, kind: String, text: String, media_ref: String)
