package graft.functions

import graft.operators.DeterministicOcrEngine.md5Hex
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

  def shingleStrings(text: UTF8String, n: Int): Array[String] = {
    val toks = text.toString.split(" ", -1)
    val count = math.max(0, toks.length - n) + 1
    val out = new Array[String](count)
    var i = 0
    while (i < count) {
      val end = math.min(toks.length, i + n)
      out(i) = toks.slice(i, end).mkString(" ")
      i += 1
    }
    out
  }

  /** (band, band_hash) rows: per-permutation lexicographic-min md5 of "p|shingle",
    * then md5 of each band's concatenated signature pair. */
  def minhashBands(text: UTF8String): ArrayData = {
    val sh = shingleStrings(text, 3)
    val mins = new Array[String](NumPerms)
    var p = 0
    while (p < NumPerms) {
      var best: String = null
      var i = 0
      while (i < sh.length) {
        val h = md5Hex(p.toString + "|" + sh(i))
        if (best == null || h < best) best = h
        i += 1
      }
      mins(p) = best
      p += 1
    }
    val rows = new Array[Any](NumPerms / BandWidth)
    var b = 0
    while (b < NumPerms / BandWidth) {
      rows(b) = InternalRow(b,
        UTF8String.fromString(md5Hex(mins(2 * b) + mins(2 * b + 1))))
      b += 1
    }
    new GenericArrayData(rows)
  }

  /** (fp, n_shingles): lexicographic-min md5 over 5-gram shingles. */
  def fingerprint(text: UTF8String): InternalRow = {
    val sh = shingleStrings(text, 5)
    var best: String = null
    var i = 0
    while (i < sh.length) {
      val h = md5Hex(sh(i))
      if (best == null || h < best) best = h
      i += 1
    }
    InternalRow(UTF8String.fromString(best), sh.length.toLong)
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
