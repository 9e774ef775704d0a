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
 * Native one-pass character-trigram TERM-FREQUENCY expression — the hot inner loop
 * of the LM scoring surface (`lm_score`, `dsir_weights`).
 *
 * The declarative form (`explode(transform(sequence(1, len-2), i => substr(text,
 * i, 3)))` followed by counting) evaluates an interpreted lambda per POSITION,
 * materializes one 3-char string per OCCURRENCE, and feeds |chars| rows per
 * document into the aggregation. This expression walks the text bytes once,
 * counts occurrences into a per-document hash map, and emits the already-reduced
 * (tri, cnt) array — the aggregation downstream sees |distinct trigrams| rows per
 * document instead of |chars|, and per-occurrence work is one boundary-sliced
 * probe with zero String/Char materialization.
 *
 * Semantics are EXACTLY the declarative form's: trigram i = characters [i, i+3)
 * (UTF-8 character boundaries, matching Spark's character-based substr), all
 * occurrences counted, texts shorter than 3 characters yield an empty array.
 * Σ cnt over the output == the declarative occurrence count, so every consumer's
 * arithmetic — and the DuckDB oracles — are unchanged (TextModelPropertySpec pins
 * the equivalence on adversarial strings).
 */
object TrigramOps {

  /** Character start offsets: UTF-8 continuation bytes are 0b10xxxxxx. */
  private def charStarts(bytes: Array[Byte]): Array[Int] = {
    var n = 0
    var i = 0
    while (i < bytes.length) { if ((bytes(i) & 0xc0) != 0x80) n += 1; i += 1 }
    val starts = new Array[Int](n + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xc0) != 0x80) { starts(c) = i; c += 1 }
      i += 1
    }
    starts(n) = bytes.length
    starts
  }

  def trigramTf(text: UTF8String): ArrayData = {
    val raw = text.getBytes
    // defensive copy: the emitted UTF8String slices alias this array, and getBytes
    // MAY return a Spark-internal buffer when the string exactly spans it
    val bytes = java.util.Arrays.copyOf(raw, raw.length)
    val starts = charStarts(bytes)
    val nChars = starts.length - 1
    if (nChars < 3) return new GenericArrayData(Array.empty[Any])
    val counts = new java.util.HashMap[UTF8String, Array[Long]]()
    var i = 0
    while (i + 3 <= nChars) {
      val s = UTF8String.fromBytes(bytes, starts(i), starts(i + 3) - starts(i))
      val c = counts.get(s)
      if (c == null) counts.put(s, Array(1L)) else c(0) += 1
      i += 1
    }
    val keys = new Array[UTF8String](counts.size())
    val it = counts.keySet().iterator()
    var k = 0
    while (it.hasNext) { keys(k) = it.next(); k += 1 }
    // deterministic output order (binary == lowercase-hex-style lexicographic)
    java.util.Arrays.sort(keys, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    val rows = new Array[Any](keys.length)
    k = 0
    while (k < keys.length) {
      rows(k) = InternalRow(keys(k), counts.get(keys(k))(0))
      k += 1
    }
    new GenericArrayData(rows)
  }
}

/** array<struct<tri: string, cnt: long>> of per-document trigram counts. */
case class TrigramTfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tri", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "trigram_tf"
  override def nullSafeEval(input: Any): Any =
    TrigramOps.trigramTf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramOps.trigramTf($c)")
  override protected def withNewChildInternal(newChild: Expression): TrigramTfExpr =
    copy(child = newChild)
}

object TrigramTfExpr {
  def apply(text: Column): Column =
    ColumnBridge.column(TrigramTfExpr(ColumnBridge.expression(text)))
}
