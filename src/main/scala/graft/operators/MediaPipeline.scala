package graft.operators

import graft.operators.DeterministicOcrEngine.{hexOf, hexVal, md5Bytes, md5Hex}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One row of the synthesized media catalog: an opaque binary payload + typed metadata.
  * This is the engine's multimodal column convention — media is ALWAYS an opaque
  * `binary` column plus scalar metadata, never a decoded object in a column (the decoded
  * form stays executor-local inside the codec island, exactly as the reference keeps the
  * Leptonica `Pix` on the C++ side of the pybind boundary, uiucprescon/ocr/Image.h:9-18). */
final case class MediaRaw(media_ref: String, mime: String, payload: Array[Byte])

/** Decode result: metadata out, payload summarized as its content DIGEST — neither
  * the binary nor any hex expansion of it ever re-enters the relational plane after
  * the island (round 1 shipped a payload_hex string column through the row, 2x the
  * payload bytes serialized per row on a pipeline measured DRAM-bandwidth-bound; the
  * digest is 32 bytes flat). Error channel mirrors the loader contract (row-level
  * error value, job never dies: ImageLoaderStrategies.cpp:11-13). */
final case class MediaDecoded(
    media_ref: String,
    mime: String,
    ok: Boolean,
    error: String,
    n_bytes: Int,
    w: Int,
    h: Int,
    duration_ms: Int,
    n_frames: Int,
    payload_md5: String)

/** Per-media features from the byte stream: exact-integer byte statistics + an 8-dim
  * stride-sum "embedding" (f0..f7 = sum of bytes at positions ≡ r mod 8). */
final case class MediaFeatures(
    media_ref: String,
    n_bytes: Int,
    byte_sum: Long,
    byte_min: Int,
    byte_max: Int,
    f0: Long, f1: Long, f2: Long, f3: Long,
    f4: Long, f5: Long, f6: Long, f7: Long)

/**
 * Pluggable decoder for the media island — the multimodal analogue of the reference's
 * image-loader Strategy (abcImageLoaderStrategy, uiucprescon/ocr/ImageLoaderStrategies.h:12-17).
 */
trait MediaCodec extends Serializable {
  def decode(mime: String, payload: Array[Byte]): (Int, Int, Int, Int) // (w,h,duration_ms,n_frames)
}

/**
 * STUB CODEC — no image/audio/video libraries exist in this sandbox, so the decode is a
 * deterministic function of the payload bytes. Everything AROUND it is real: the binary
 * column schema, the typed mapPartitions batch shape, the per-row error channel, and the
 * Catalyst post-processing are exactly what a real libjpeg/ffmpeg-backed codec would
 * plug into (swap this object; nothing else changes).
 */
object StubMediaCodec extends MediaCodec {
  def decode(mime: String, p: Array[Byte]): (Int, Int, Int, Int) = {
    def b(i: Int) = p(i) & 0xff
    mime match {
      case "image/png" => (64 + b(0), 64 + b(1), 0, 1)
      case "audio/wav" => (0, 0, (b(2) << 8) | b(3), 0)
      case _           => (64 + b(0), 64 + b(1), (b(2) << 8) | b(3), 1 + b(4) % 16)
    }
  }
}

/**
 * Multimodal media pipeline over the interleaved corpus's media references:
 * catalog synthesis -> decode island -> Catalyst-side frame sampling / resize planning /
 * feature extraction.
 *
 * Scale notes:
 *  - the catalog is derived from the spans table with one `distinct` (the only shuffle;
 *    at 10^12 docs this is the global media-dedup step and is hash-partitioned on the
 *    ref — uniform by construction);
 *  - payload synthesis and decode run fused in ONE mapPartitions pass (no binary column
 *    is ever shuffled; payload bytes live only inside the task, total per-task memory =
 *    one row's payload at a time from the iterator);
 *  - frame sampling and resize planning are pure Catalyst over the decoded metadata —
 *    codegen'd, no second island crossing.
 */
object MediaPipeline {

  /** Deterministic payload for a resolvable ref: 2 + (h0 % 4) chained md5 blocks
    * (32..80 bytes). Mirrored in SQL by the oracle (OracleSqlMedia). */
  def payloadFor(ref: String): Array[Byte] = {
    val h = md5Hex(ref)
    val nBlocks = 2 + hexVal(h.charAt(0)) % 4
    val out = new Array[Byte](16 * nBlocks)
    var i = 0
    while (i < nBlocks) {
      System.arraycopy(md5Bytes(ref + ":" + i), 0, out, 16 * i, 16)
      i += 1
    }
    out
  }

  /** Mime routing: second hex digit of md5(ref) mod 3. */
  def mimeFor(ref: String): String =
    hexVal(md5Hex(ref).charAt(1)) % 3 match {
      case 0 => "image/png"
      case 1 => "audio/wav"
      case _ => "video/mp4"
    }

  /** Distinct media refs of the corpus (resolvable AND missing ones). */
  def refs(docs: DataFrame): DataFrame =
    docs.select(explode(col("spans")).as("s"))
      .filter(col("s.kind") === "image")
      .select(col("s.media_ref").as("media_ref"))
      .distinct()

  /** Synthesize + decode in one typed island pass. */
  def decodeAll(docs: DataFrame, codec: MediaCodec = StubMediaCodec): Dataset[MediaDecoded] = {
    val spark = docs.sparkSession
    import spark.implicits._
    refs(docs).as[String].mapPartitions { it =>
      it.map { ref =>
        if (ref == null || ref.startsWith("missing-"))
          MediaDecoded(ref, "application/octet-stream", ok = false,
            "Unable to decode " + ref, 0, 0, 0, 0, 0, md5Hex(""))
        else {
          val payload = payloadFor(ref)
          val mime = mimeFor(ref)
          val (w, h, dur, nf) = codec.decode(mime, payload)
          // digest of the HEX form (oracle parity: md5(ph) over the SQL-reconstructed
          // hex string) — computed here so only the 32-char digest leaves the island
          MediaDecoded(ref, mime, ok = true, null, payload.length, w, h, dur, nf,
            md5Hex(hexOf(payload)))
        }
      }
    }
  }

  /** Decode surface: metadata + payload content hash (no raw bytes leave the island). */
  def decode(docs: DataFrame): DataFrame =
    decodeAll(docs).toDF()
      .select(col("media_ref"), col("mime"), col("ok").cast("int").as("ok"),
        col("error"), col("n_bytes"), col("w"), col("h"), col("duration_ms"),
        col("n_frames"), col("payload_md5"))
      .orderBy(col("media_ref"))

  /** Frame sampling for videos — pure Catalyst explode over decoded metadata. */
  def frames(docs: DataFrame): DataFrame =
    decodeAll(docs).toDF()
      .filter(col("ok") && col("mime") === "video/mp4")
      .select(col("media_ref"), col("duration_ms"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("media_ref"), col("frame_idx"),
        floor(col("frame_idx") * col("duration_ms") / col("n_frames"))
          .cast("int").as("t_ms"),
        md5(concat(col("media_ref"), lit(":f:"), col("frame_idx"))).as("frame_md5"))
      .orderBy(col("media_ref"), col("frame_idx"))

  /** Resize planning for visual media — target = half resolution, floor, min 1. */
  def resizePlan(docs: DataFrame): DataFrame =
    decodeAll(docs).toDF()
      .filter(col("ok") && col("mime").isin("image/png", "video/mp4"))
      .select(col("media_ref"), col("w"), col("h"),
        greatest(lit(1), floor(col("w") / 2)).cast("int").as("out_w"),
        greatest(lit(1), floor(col("h") / 2)).cast("int").as("out_h"))
      .withColumn("resized_md5",
        md5(concat(col("media_ref"), lit(":resize:"), col("out_w"), lit("x"), col("out_h"))))
      .orderBy(col("media_ref"))

  /** Feature extraction inside the island (second pass, fused synth+extract). */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val out = refs(docs).as[String]
      .filter((r: String) => r != null && !r.startsWith("missing-"))
      .mapPartitions { it =>
        it.map { ref =>
          val p = payloadFor(ref)
          val strides = new Array[Long](8)
          var sum = 0L; var mn = 255; var mx = 0
          var i = 0
          while (i < p.length) {
            val b = p(i) & 0xff
            sum += b; if (b < mn) mn = b; if (b > mx) mx = b
            strides(i % 8) += b
            i += 1
          }
          MediaFeatures(ref, p.length, sum, mn, mx,
            strides(0), strides(1), strides(2), strides(3),
            strides(4), strides(5), strides(6), strides(7))
        }
      }
    out.toDF().orderBy(col("media_ref"))
  }
}
