package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

/**
 * The extraction-engine contract, lifted from the reference's `Reader2`
 * (uiucprescon/ocr/reader2.h:7-19, reader2.cpp:12-58):
 *
 *  - construction = expensive model init; failure leaves the engine constructed but
 *    `good=false` (reader2.cpp:16-24);
 *  - a bad engine recognizes to the EMPTY STRING, it does not raise
 *    (reader2.cpp:37-39, asserted by tests/test_basic.cpp:31-42);
 *  - recognition iterates words producing (text, confidence) pairs
 *    (reader2.cpp:43-55) and returns the full-page text (GetUTF8Text, reader2.cpp:56-58).
 *
 * No native tesseract exists in this environment, so the engine is a deterministic
 * pure-JVM implementation of the same contract: page text is derived word-by-word from
 * the media payload bytes. Determinism is total — same payload, same lang => same text
 * and confidences — which is what makes the whole distributed pipeline verifiable by a
 * single-threaded oracle regardless of partitioning.
 */
trait OcrEngine {
  /** Mirror of `Reader2::isGood` (reader2.cpp:26-28). */
  def isGood: Boolean
  /** Mirror of `Reader2::get_ocr_from_image` — bad engine => OcrPage("", empty). */
  def recognize(payload: Array[Byte]): OcrPage
  /** Mirror of `tesseract_version` (uiucprescon/ocr/utils.cpp:4-6). */
  def version: String
}

/** Full-page recognition result: page text + per-word confidences (metrics-only). */
final case class OcrPage(text: String, wordConfidences: Array[Double])

/**
 * Engine-pool configuration, broadcast by value into executor closures (it is tiny).
 * `availableLangs` models the `<lang>.traineddata` existence check and `osdAvailable`
 * the mandatory `osd.traineddata` check (uiucprescon/ocr/reader.py:19-30): if osd is
 * missing NO reader can be constructed, whatever the language.
 */
final case class EngineConfig(
    availableLangs: Set[String],
    osdAvailable: Boolean = true
) extends Serializable

object EngineConfig {
  /** Default model inventory for the synthetic corpus: 'zh' deliberately has no
    * traineddata, exercising the bad-engine path on real rows. */
  val default: EngineConfig = EngineConfig(Set("en", "fr", "de", "es", "ita", "eng"))
}

/**
 * Deterministic OCR engine. One page = `nWords(payload)` words; word i is a hex slice of
 * md5(payloadHex ++ ":" ++ i), prefixed with the language tag. Word count and per-word
 * confidence are functions of payload bytes only. This is honest computed output (each
 * word requires an md5 round), not a canned string — the per-span CPU cost scales with
 * page "size" the way real OCR does.
 */
final class DeterministicOcrEngine(lang: String, config: EngineConfig) extends OcrEngine {
  val isGood: Boolean = config.osdAvailable && config.availableLangs.contains(lang)
  val version: String = DeterministicOcrEngine.Version

  def recognize(payload: Array[Byte]): OcrPage = {
    if (!isGood) return OcrPage("", Array.empty) // "" not null: reader2.cpp:37-39
    import DeterministicOcrEngine._
    val hex = hexOf(payload)
    val n = nWords(hex)
    // Allocation-lean hot loop (the per-word page model IS the throughput-critical
    // path, like Recognize+ResultIterator in the reference): one reused ThreadLocal
    // MessageDigest, digest input streamed via update() (no concat strings), and only
    // the 3 hash bytes that surface in the output converted to hex. Emits EXACTLY
    // md5(hex:i).substring(0,6) + the confidence digit at hex position 6.
    val md = threadMd5.get()
    val hexAscii = hex.getBytes(StandardCharsets.US_ASCII)
    val confs = new Array[Double](n)
    val sb = new java.lang.StringBuilder(4 + lang.length + n * 7)
    sb.append("ocr:").append(lang)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(hexAscii)
      md.update(':'.toByte)
      md.update(Integer.toString(i).getBytes(StandardCharsets.US_ASCII))
      val d = md.digest()
      sb.append(' ')
      var b = 0
      while (b < 3) { // 6 hex chars = first 3 digest bytes
        val v = d(b) & 0xff
        sb.append(HexChars(v >>> 4)).append(HexChars(v & 0xf))
        b += 1
      }
      // hex char 6 = high nibble of digest byte 3
      confs(i) = 55.0 + (((d(3) & 0xff) >>> 4) * 40.0) / 15.0
      i += 1
    }
    OcrPage(sb.toString, confs)
  }
}

object DeterministicOcrEngine {
  val Version = "graft-ocr/1.0 (contract: tesseract 4.1.1)"
  private[operators] val HexChars = "0123456789abcdef".toCharArray

  /** One digest instance per thread — getInstance per word costs ~3x. */
  private[graft] val threadMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def md5Bytes(s: String): Array[Byte] =
    MessageDigest.getInstance("MD5").digest(s.getBytes(StandardCharsets.UTF_8))

  def md5Hex(s: String): String = hexOf(md5Bytes(s))

  def hexOf(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = HexChars(b >>> 4)
      out(2 * i + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  def hexVal(c: Char): Int = if (c <= '9') c - '0' else c - 'a' + 10

  /** Words per page: 8 + 2*firstHexDigit in [8, 38]. */
  def nWords(payloadHex: String): Int = 8 + 2 * hexVal(payloadHex.charAt(0))
}

/**
 * Media decode strategy — the analogue of the reference's pluggable loader
 * (abcImageLoaderStrategy, uiucprescon/ocr/ImageLoaderStrategies.h:12-17, with the
 * test-injectable dummy at tests/test_basic.cpp:61-72). The standard decoder synthesizes
 * the payload deterministically from the ref (no filesystem reads at 10^12-doc scale);
 * an unresolvable ref yields Left, the row-level form of
 * TesseractGlueException("Unable to load "+filename) (ImageLoaderStrategies.cpp:11-13).
 */
trait MediaDecoder extends Serializable {
  def decode(mediaRef: String): Either[String, Array[Byte]]
}

object StandardMediaDecoder extends MediaDecoder {
  def decode(mediaRef: String): Either[String, Array[Byte]] =
    if (mediaRef == null || mediaRef.startsWith("missing-"))
      Left("Unable to load " + mediaRef)
    else
      Right(DeterministicOcrEngine.md5Bytes("payload:" + mediaRef))
}

/**
 * Per-executor engine pool. The reference amortizes one expensive `TessBaseAPI::Init`
 * across all `get_ocr` calls by holding the API as a member (reader2.h:10,
 * reader2.cpp:16); at cluster scale the same amortization is one lazily-initialized
 * engine per (executor JVM, language) — NEVER per row, never per task. The pool is a
 * JVM-global singleton so concurrent tasks on the same executor share engines; engines
 * here are immutable after init so no per-call locking is needed.
 */
object EnginePool {
  private val pool = new ConcurrentHashMap[(EngineConfig, String), DeterministicOcrEngine]()
  // AtomicLong, not a @volatile var: first-inits for DIFFERENT keys run their
  // computeIfAbsent mapping functions concurrently, and a read-modify-write on a
  // volatile loses updates — undercounting would mask a per-row-init regression
  // in the very assertion this counter exists for
  private val inits = new java.util.concurrent.atomic.AtomicLong(0L)

  def get(lang: String, config: EngineConfig): DeterministicOcrEngine =
    pool.computeIfAbsent((config, lang), { kc: (EngineConfig, String) =>
      inits.incrementAndGet()
      new DeterministicOcrEngine(kc._2, kc._1)
    })

  /** Observability hook for tests: proves init count stays O(langs), not O(rows). */
  def initCount: Long = inits.get()
  def reset(): Unit = { pool.clear(); inits.set(0L) }
}
