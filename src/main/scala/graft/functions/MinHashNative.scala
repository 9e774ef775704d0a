package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native one-pass forms of the shingle->md5 reductions used by MinHash dedup and
 * document fingerprinting. The declarative equivalents
 * (`array_min(transform(shingles(text, n), s => md5(...)))` per permutation) evaluate
 * interpreted — a lambda closure + digest per shingle PER PERMUTATION — while these
 * walk the token array once and reuse one thread-local digest. Outputs are
 * value-identical (the DuckDB oracles are unchanged and still pass), only the
 * evaluation strategy differs.
 *
 * Shingle semantics mirror [[graft.operators.TextAnalysis.shingles]] exactly:
 * whitespace split keeping empties, k = max(0, tokens-n) + 1 shingles, shingle i =
 * tokens[i, i+n) joined with ' ' (clamped at the end like `slice`).
 */
object MinHashOps {

  val NumPerms = 8
  val BandWidth = 2

  /** Permutation prefixes "0|".."7|" as reusable ASCII bytes. */
  private val PrefixBytes: Array[Array[Byte]] =
    Array.tabulate(NumPerms)(p => s"$p|".getBytes("US-ASCII"))

  private val HexAscii: Array[Byte] = "0123456789abcdef".getBytes("US-ASCII")

  /**
   * Byte-diet core (the pipeline is DRAM-bandwidth-bound, BENCH/BASELINE.md): all
   * shingle work runs on the UTF8String's raw bytes with ZERO per-shingle String or
   * Char materialization.
   *
   *  - 0x20 never occurs inside a UTF-8 multibyte sequence, so byte-splitting equals
   *    `split(" ", -1)`;
   *  - tokens joined with ' ' reconstruct the ORIGINAL byte span (split is
   *    separator-exact), so shingle i of width n is just the byte range
   *    [starts(i), starts(min(i+n, nTok)) - 1) — no join allocation at all;
   *  - md5 digests are compared as unsigned byte arrays, which orders identically to
   *    comparing their lowercase-hex strings (the nibble -> hex-char map is monotone),
   *    so only the winning digests are ever hexified.
   *
   * Values are bit-identical to the string formulation (DuckDB oracles unchanged).
   */
  private def tokenStarts(bytes: Array[Byte]): (Array[Int], Int) = {
    var n = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(n) = bytes.length + 1 // sentinel: shingle end = starts(j) - 1
    (starts, n)
  }

  /** a < b over 16-byte digests, unsigned lexicographic (== hex-string order). */
  private def digestLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hexAsciiOf(d: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      val b = d(i) & 0xff
      out(2 * i) = HexAscii(b >>> 4)
      out(2 * i + 1) = HexAscii(b & 0xf)
      i += 1
    }
    out
  }

  /** Min md5 digest over n-gram shingles, with an optional digest-input prefix. */
  private def minShingleDigest(
      bytes: Array[Byte], starts: Array[Int], nTok: Int, n: Int,
      prefix: Array[Byte]): Array[Byte] = {
    val md = graft.operators.DeterministicOcrEngine.threadMd5.get()
    val count = math.max(0, nTok - n) + 1
    var best: Array[Byte] = null
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(math.min(i + n, nTok)) - 1
      md.reset()
      if (prefix != null) md.update(prefix)
      md.update(bytes, from, until - from)
      val d = md.digest()
      if (best == null || digestLess(d, best)) best = d
      i += 1
    }
    best
  }

  /** (band, band_hash) rows: per-permutation lexicographic-min md5 of "p|shingle",
    * then md5 of each band's concatenated (hex) signature pair. */
  def minhashBands(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val (starts, nTok) = tokenStarts(bytes)
    val mins = new Array[Array[Byte]](NumPerms)
    var p = 0
    while (p < NumPerms) {
      mins(p) = minShingleDigest(bytes, starts, nTok, 3, PrefixBytes(p))
      p += 1
    }
    val md = graft.operators.DeterministicOcrEngine.threadMd5.get()
    val rows = new Array[Any](NumPerms / BandWidth)
    var b = 0
    while (b < NumPerms / BandWidth) {
      md.reset()
      md.update(hexAsciiOf(mins(2 * b)))
      md.update(hexAsciiOf(mins(2 * b + 1)))
      rows(b) = InternalRow(b, UTF8String.fromString(
        graft.operators.DeterministicOcrEngine.hexOf(md.digest())))
      b += 1
    }
    new GenericArrayData(rows)
  }

  /** All n-gram window md5 hex digests in document order, duplicates preserved
    * (callers distinct). Same byte-diet walk as [[minShingleDigest]], but keeping
    * every window hash instead of reducing to the min — the substring-level dedup
    * primitive ([[graft.operators.Dedup.windowDup]]). */
  def windowHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val (starts, nTok) = tokenStarts(bytes)
    val md = graft.operators.DeterministicOcrEngine.threadMd5.get()
    val count = math.max(0, nTok - n) + 1
    val out = new Array[Any](count)
    var i = 0
    while (i < count) {
      val from = starts(i)
      val until = starts(math.min(i + n, nTok)) - 1
      md.reset()
      md.update(bytes, from, until - from)
      out(i) = UTF8String.fromString(
        graft.operators.DeterministicOcrEngine.hexOf(md.digest()))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (fp, n_shingles): lexicographic-min md5 over 5-gram shingles. */
  def fingerprint(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val (starts, nTok) = tokenStarts(bytes)
    val best = minShingleDigest(bytes, starts, nTok, 5, null)
    val count = math.max(0, nTok - 5) + 1
    InternalRow(UTF8String.fromString(
      graft.operators.DeterministicOcrEngine.hexOf(best)), count.toLong)
  }
}

case class MinHashBandsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("band_hash", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "minhash_bands"
  override def nullSafeEval(input: Any): Any =
    MinHashOps.minhashBands(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps.minhashBands($c)")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandsExpr =
    copy(child = newChild)
}

object MinHashBandsExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(MinHashBandsExpr(ColumnBridge.expression(text)))
}

/** array<string> of every [[WindowHashesExpr.WindowN]]-token window's md5 hex —
  * the per-document expansion behind substring-window dedup. Window length and
  * join semantics match [[FingerprintExpr]]'s 5-gram shingles (fingerprint is the
  * min-reduction of exactly this array). */
case class WindowHashesExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "window_hashes"
  override def nullSafeEval(input: Any): Any =
    MinHashOps.windowHashes(input.asInstanceOf[UTF8String], WindowHashesExpr.WindowN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashOps.windowHashes($c, ${WindowHashesExpr.WindowN})")
  override protected def withNewChildInternal(newChild: Expression): WindowHashesExpr =
    copy(child = newChild)
}

object WindowHashesExpr {
  /** Window length in tokens; shared with the fingerprint reduction. */
  val WindowN = 5
  def apply(text: Column): Column =
    ColumnBridge.column(WindowHashesExpr(ColumnBridge.expression(text)))
}

case class FingerprintExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("n_shingles", LongType, nullable = false)))
  override def prettyName: String = "doc_fingerprint"
  override def nullSafeEval(input: Any): Any =
    MinHashOps.fingerprint(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashOps.fingerprint($c)")
  override protected def withNewChildInternal(newChild: Expression): FingerprintExpr =
    copy(child = newChild)
}

object FingerprintExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(FingerprintExpr(ColumnBridge.expression(text)))
}
