package graft.functions

import graft.operators.DeterministicOcrEngine
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 64-bit SimHash of whitespace-tokenized text as a native Catalyst expression with
 * `doGenCode` — stays inside whole-stage codegen (the generated code calls the static
 * [[SimHashImpl.simhash64]] directly; no Row boxing, no UDF serialization penalty).
 *
 * 64 bits (not 32): at 10^9+ documents a 32-bit signature has birthday collisions long
 * before the corpus does — 64 bits is the standard web-dedup width (Manku et al.,
 * WWW'07 near-duplicate detection), and it supports exact Hamming<=3 pairing via four
 * 16-bit block tables ([[graft.operators.Dedup.simhashPairs]]).
 *
 * Bit k of the signature is set iff the sum over tokens of (2*bit_k(md5(token)) - 1)
 * is >= 0, where bit_k is the k-th bit of the digest read MSB-first within each byte
 * (equivalently: hex digit k/4, bit 3-k%4 of that digit — the arithmetic mirrored
 * digit-by-digit in [[OracleSqlDedup]]'s portable SQL, which is what makes the
 * operator oracle-verifiable).
 *
 * Byte-diet: tokenization walks the UTF8String's bytes directly (split on 0x20 — a
 * byte that never occurs inside a UTF-8 multibyte sequence, so byte-split == string
 * split) and each token's md5 is computed over the byte slice. No String or Char
 * materialization per token; the pipeline was measured DRAM-bandwidth-bound
 * (BENCH/BASELINE.md), so bytes not touched are the cheapest bytes.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column-level entry point. */
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
}

/** Static implementation target for both interpreted eval and generated code. */
object SimHashImpl {

  def simhash64(text: UTF8String): Long = {
    val bytes = text.getBytes
    val sums = new Array[Int](64)
    val md = DeterministicOcrEngine.threadMd5.get()
    var start = 0
    var i = 0
    val n = bytes.length
    // one pass over the bytes; token = [start, i) at each 0x20 or end (keeps empties:
    // parity with split(' ', -1) / DuckDB string_split)
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var k = 0
        while (k < 64) {
          val bit = (d(k >> 3) >> (7 - (k & 7))) & 1
          sums(k) += 2 * bit - 1
          k += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var k = 0
    while (k < 64) {
      if (sums(k) >= 0) out |= 1L << k // k=63 sets the sign bit, intentionally
      k += 1
    }
    out
  }
}
