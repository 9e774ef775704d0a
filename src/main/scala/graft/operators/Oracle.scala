package graft.operators

import graft.model._
import scala.util.matching.Regex

/**
 * Single-threaded, Spark-free golden oracle: an independent implementation of the
 * extraction contract, standing in for the reference's pytest-observed behavior
 * (SURVEY.md §5.2). The distributed pipeline must match this for every document,
 * regardless of partitioning, salting or scheduling — that is the north-rule invariant
 * (span-sequence equality on (kind, text, media_ref, order)).
 *
 * Deliberately written with a different idiom than the pipeline (regex pulls + plain
 * string building, no shared helpers beyond the engine itself) so a bug in the pipeline's
 * Catalyst expressions cannot be mirrored here.
 */
object Oracle {

  private val anchorRe: Regex = "<a [^>]*>([^<]*)</a>".r
  private val paraRe: Regex = "<p>([^<]*)</p>".r
  private val tagRe: Regex = "<[^>]*>".r

  /** Extract one document. Returns spans ordered by offset. */
  def extract(doc: Doc, config: EngineConfig = EngineConfig.default): DocExtracted = {
    val out = doc.spans.sortBy(_.offset).map { sp =>
      sp.kind match {
        case "text" =>
          val visible = tagRe.replaceAllIn(sp.text, "")
          val link = anchorRe.findAllMatchIn(sp.text).map(_.group(1)).mkString
          val content =
            if (2 * link.length > visible.length) ""
            else paraRe.findAllMatchIn(sp.text).map(_.group(1)).mkString(" ")
          (OutSpan(sp.offset, "text", content, null), true, null: String)
        case "image" =>
          if (sp.media_ref == null || sp.media_ref.startsWith("missing-"))
            (OutSpan(sp.offset, "image", "", sp.media_ref), false,
              "Unable to load " + sp.media_ref)
          else if (!config.osdAvailable || !config.availableLangs.contains(doc.lang))
            (OutSpan(sp.offset, "image", "", sp.media_ref), false,
              "engine not initialized: " + doc.lang)
          else {
            val hex = DeterministicOcrEngine.md5Hex("payload:" + sp.media_ref)
            val n = 8 + 2 * DeterministicOcrEngine.hexVal(hex.charAt(0))
            val words = (0 until n)
              .map(i => DeterministicOcrEngine.md5Hex(hex + ":" + i).substring(0, 6))
            (OutSpan(sp.offset, "image", "ocr:" + doc.lang + " " + words.mkString(" "),
              sp.media_ref), true, null: String)
          }
        case other =>
          (OutSpan(sp.offset, other, "", sp.media_ref), false, "unknown span kind: " + other)
      }
    }
    val firstErr = out.collectFirst { case (_, false, e) => e }
    DocExtracted(doc.doc_id, out.map(_._1), firstErr.isEmpty, firstErr.orNull)
  }

  /** Synthesize the interleaved doc for one documents.parquet row — mirror of
    * [[graft.sources.Interleave]] in plain Scala, for Spark-free golden tests. */
  def synthesize(docId: Long, text: String, lang: String, source: String, nChars: Long): Doc = {
    val kt = (2 + docId % 3).toInt
    val km = (1 + docId % 4 + (if (docId % 37 == 0) 24 else 0)).toInt
    val cl = math.max(1L, math.floor(nChars.toDouble / kt).toLong).toInt
    val tspans = (0 until kt).map { i =>
      val start = (i * cl).toInt // 0-based
      val raw = text.substring(math.min(start, text.length),
        math.min(start + cl, text.length))
      val markup =
        if (i == kt - 1 && docId % 23 == 0)
          s"""<ul><a href="u0">$raw</a><a href="u1">nav menu</a></ul>"""
        else
          s"""<nav>menu $source</nav><h1>s$i</h1><p>$raw</p><a href="u$docId">more</a><footer>(c) $source</footer>"""
      Span("text", markup, null, i * 2)
    }
    val mspans = (0 until km).map { j =>
      val ref = if (docId % 41 == 0 && j == 0) s"missing-$docId" else s"m-$docId-$j"
      Span("image", null, ref, j * 2 + 1)
    }
    Doc(f"doc-$docId%013d", lang, tspans ++ mspans)
  }
}
