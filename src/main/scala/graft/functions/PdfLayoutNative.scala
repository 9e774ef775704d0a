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
 * Native one-pass PDF content-stream scanner + layout reconstruction — the
 * "PDF/layout parse" leg of the north rule's main-content extraction triad (HTML
 * boilerplate strip / PDF layout parse / DOM heuristics), same evaluation strategy
 * as [[HocrAltoOps]]: walk the UTF8String bytes once, no regex machinery, then a
 * small per-page sort.
 *
 * Grammar accepted — the text-showing subset of the PDF content-stream language
 * (PDF 32000-1 §9.4), tolerant of everything else:
 *
 *  - `a b c d e f Tm`  sets the text matrix; the run position becomes (e, f);
 *  - `tx ty Td`        translates the current position by (tx, ty);
 *  - `(string) Tj`     shows `string` at the current position. String literals
 *                      honor backslash escapes (`\(`, `\)`, `\\`) and BALANCED
 *                      nested parentheses, per the spec;
 *  - `BT` / `ET`       begin/end a text object; BT resets the position to (0, 0).
 *  - numbers may be signed and fractional (coordinates land as truncated ints);
 *  - any other operator (`Tf`, `TL`, `/F1` names, graphics ops, …) is SKIPPED with
 *    its operands — unknown syntax never throws, mirroring the hOCR/ALTO scanners'
 *    skip-on-malformed contract. An unterminated string literal at EOF is dropped.
 *
 * LAYOUT: collected runs are re-ordered into READING order — PDF pages are y-up,
 * and the physical emission order of text objects is arbitrary (real generators
 * emit columns, footers, or compression-reordered blocks out of visual order; the
 * builder deliberately emits line blocks REVERSED to make stream order useless).
 * Runs sort by (y descending, x ascending); each distinct y after the sort is one
 * line (the deterministic builder emits exact y's — a real-world variant would
 * cluster by y-proximity, same algorithm with a tolerance). Output rows carry
 * (word, line, col, x, y) in reading order, so `posexplode` positions downstream
 * are reading-order word indices.
 */
object PdfLayoutOps {

  private final class Run(val word: UTF8String, val x: Int, val y: Int, val idx: Int)

  /** One-pass content-stream scan + reading-order layout:
    * array<struct<word,line,col,x,y>>. */
  def parsePdf(page: UTF8String): ArrayData = {
    val b = page.getBytes
    val runs = new java.util.ArrayList[Run](16)

    // operand stack (PDF operators take postfix operands); clears on every operator
    val st = new Array[Double](8)
    var nSt = 0
    var x = 0.0
    var y = 0.0
    var pendingFrom = -1
    var pendingUntil = -1

    def clear(): Unit = { nSt = 0; pendingFrom = -1; pendingUntil = -1 }

    var i = 0
    val n = b.length
    while (i < n) {
      val c = b(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        i += 1
      } else if (c == '(') {
        // string literal: balanced parens, backslash escapes; unterminated -> drop
        var depth = 1
        var j = i + 1
        val from = j
        var until = -1
        while (until < 0 && j < n) {
          val cj = b(j)
          if (cj == '\\') j += 2
          else if (cj == '(') { depth += 1; j += 1 }
          else if (cj == ')') { depth -= 1; if (depth == 0) until = j else j += 1 }
          else j += 1
        }
        if (until < 0) { i = n } // unterminated at EOF: drop and stop
        else { pendingFrom = from; pendingUntil = until; i = until + 1 }
      } else if (c == '/') {
        // name object (e.g. /F1): skip the token
        i += 1
        while (i < n && !isDelim(b(i))) i += 1
      } else if (c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        val (v, after) = parseNumber(b, i)
        if (nSt < st.length) { st(nSt) = v; nSt += 1 }
        else { // overflowing operand run: keep the most recent window
          System.arraycopy(st, 1, st, 0, st.length - 1); st(st.length - 1) = v
        }
        i = after
      } else if (isDelim(c)) {
        // stray delimiter outside a literal (`)`, `<`, `>`, `[`, `]`): not the start
        // of any token we accept — consume the byte and drop pending operands, or the
        // operator scan below would match a zero-length token and never advance
        i += 1
        clear()
      } else {
        // operator token
        val from = i
        while (i < n && !isDelim(b(i))) i += 1
        val len = i - from
        if (len == 2 && b(from) == 'T' && b(from + 1) == 'm') {
          if (nSt >= 6) { x = st(nSt - 2); y = st(nSt - 1) }
          clear()
        } else if (len == 2 && b(from) == 'T' && b(from + 1) == 'd') {
          if (nSt >= 2) { x += st(nSt - 2); y += st(nSt - 1) }
          clear()
        } else if (len == 2 && b(from) == 'T' && b(from + 1) == 'j') {
          if (pendingFrom >= 0)
            runs.add(new Run(unescape(b, pendingFrom, pendingUntil),
              x.toInt, y.toInt, runs.size()))
          clear()
        } else if (len == 2 && b(from) == 'B' && b(from + 1) == 'T') {
          x = 0.0; y = 0.0; clear()
        } else {
          clear() // ET and every unknown operator: operands dropped
        }
      }
    }

    val arr = runs.toArray(new Array[Run](0))
    java.util.Arrays.sort(arr, (l: Run, r: Run) =>
      if (l.y != r.y) Integer.compare(r.y, l.y) // y DESC: top of page first
      else if (l.x != r.x) Integer.compare(l.x, r.x)
      else Integer.compare(l.idx, r.idx))
    val out = new Array[Any](arr.length)
    var line = -1
    var colIdx = 0
    var prevY = Int.MinValue
    var k = 0
    while (k < arr.length) {
      val r = arr(k)
      if (r.y != prevY) { line += 1; colIdx = 0; prevY = r.y } else colIdx += 1
      out(k) = InternalRow(r.word, line, colIdx, r.x, r.y)
      k += 1
    }
    new GenericArrayData(out)
  }

  private def isDelim(c: Byte): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' ||
      c == '(' || c == ')' || c == '/' || c == '<' || c == '>' ||
      c == '[' || c == ']'

  /** Signed, optionally fractional decimal at `pos`; returns (value, posAfter). */
  private def parseNumber(b: Array[Byte], pos: Int): (Double, Int) = {
    var i = pos
    var neg = false
    if (b(i) == '-') { neg = true; i += 1 }
    var v = 0.0
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0'); i += 1
    }
    if (i < b.length && b(i) == '.') {
      i += 1
      var scale = 0.1
      while (i < b.length && b(i) >= '0' && b(i) <= '9') {
        v += (b(i) - '0') * scale; scale /= 10; i += 1
      }
    }
    (if (neg) -v else v, i)
  }

  /** Resolve `\(`, `\)`, `\\` escapes in a string-literal body. */
  private def unescape(b: Array[Byte], from: Int, until: Int): UTF8String = {
    var i = from
    var hasEscape = false
    while (i < until && !hasEscape) { if (b(i) == '\\') hasEscape = true; i += 1 }
    if (!hasEscape) return UTF8String.fromBytes(b, from, until - from)
    val out = new Array[Byte](until - from)
    var o = 0
    i = from
    while (i < until) {
      if (b(i) == '\\' && i + 1 < until) { out(o) = b(i + 1); o += 1; i += 2 }
      else { out(o) = b(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out, 0, o)
  }
}

case class ParsePdfExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("word", StringType, nullable = false),
    StructField("line", IntegerType, nullable = false),
    StructField("col", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "parse_pdf"
  override def nullSafeEval(input: Any): Any =
    PdfLayoutOps.parsePdf(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PdfLayoutOps.parsePdf($c)")
  override protected def withNewChildInternal(newChild: Expression): ParsePdfExpr =
    copy(child = newChild)
}

object ParsePdfExpr {
  def apply(page: Column): Column =
    ColumnBridge.column(ParsePdfExpr(ColumnBridge.expression(page)))
}
