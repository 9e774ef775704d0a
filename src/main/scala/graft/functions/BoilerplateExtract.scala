package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expression for the boilerplate classifier's hot path: ONE scan of the
 * markup replaces the three regex evaluations of the declarative form
 * ([[graft.operators.TextClassifier]] — visible-text strip, anchor-text extraction,
 * paragraph extraction), with `doGenCode` so it stays inside whole-stage codegen.
 *
 * The semantics are BIT-IDENTICAL to the regex form (asserted differentially in
 * BoilerplateSpec, and independently by the DuckDB oracle, which still uses regexes):
 *
 *  - visible length = code points left after removing every `<[^>]*>` match
 *    (an unclosed `<` with no later `>` stays visible, as with the regex);
 *  - link length = code points captured by `<a [^>]*>([^<]*)</a>`, leftmost-first
 *    with restart at start+1 on a failed candidate, exactly like a regex engine;
 *  - paragraphs = captures of `<p>([^<]*)</p>` joined with a single space;
 *  - boilerplate iff 2*linkLen > visibleLen (exact integers) => empty string, never
 *    null (reference empty-stays-empty semantics, uiucprescon/ocr/reader2.cpp:37-39).
 */
case class BoilerplateExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "boilerplate_extract"

  override def nullSafeEval(input: Any): Any =
    BoilerplateOps.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BoilerplateOps.extract($c)")

  override protected def withNewChildInternal(newChild: Expression): BoilerplateExtract =
    copy(child = newChild)
}

object BoilerplateExtract {
  /** Column-level entry point. */
  def apply(raw: Column): Column =
    ColumnBridge.column(BoilerplateExtract(ColumnBridge.expression(raw)))
}

/** Static single-pass scanner (Java-callable from generated code).
  *
  * Byte-level, like the sibling native scanners: every marker is ASCII (so it can
  * never match inside a UTF-8 continuation sequence), a code point is "a byte not
  * in 0x80..0xBF", and paragraph captures are byte-range copies of the original
  * UTF-8 — no UTF-16 transcode of every span in the classifier's hot path (the
  * String form paid an O(n) decode + allocation before scanning even began). */
object BoilerplateOps {

  private val ATag = "<a ".getBytes("UTF-8")
  private val AClose = "</a>".getBytes("UTF-8")
  private val POpen = "<p>".getBytes("UTF-8")
  private val PClose = "</p>".getBytes("UTF-8")

  @inline private def isCodePointStart(x: Byte): Boolean = (x & 0xc0) != 0x80

  private def find(b: Array[Byte], pat: Array[Byte], from: Int): Int = {
    var i = if (from < 0) 0 else from
    val last = b.length - pat.length
    while (i <= last) {
      var j = 0
      while (j < pat.length && b(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  private def findByte(b: Array[Byte], c: Byte, from: Int): Int = {
    var i = from
    while (i < b.length) { if (b(i) == c) return i; i += 1 }
    -1
  }

  private def startsWith(b: Array[Byte], pat: Array[Byte], at: Int): Boolean = {
    if (at + pat.length > b.length) return false
    var j = 0
    while (j < pat.length) { if (b(at + j) != pat(j)) return false; j += 1 }
    true
  }

  def extract(u: UTF8String): UTF8String = {
    if (u == null) return null
    val b = u.getBytes
    val n = b.length

    // visible code points after removing <[^>]*> (leftmost-first, like replaceAll)
    var visible = 0L
    var i = 0
    while (i < n) {
      if (b(i) == '<') {
        val j = findByte(b, '>', i + 1)
        if (j < 0) {
          while (i < n) { if (isCodePointStart(b(i))) visible += 1; i += 1 }
        } else i = j + 1
      } else {
        if (isCodePointStart(b(i))) visible += 1
        i += 1
      }
    }

    // anchor-text code points: <a [^>]*>([^<]*)</a>, leftmost-first, restart at +1
    var link = 0L
    var from = 0
    while (from >= 0 && from < n) {
      val i0 = find(b, ATag, from)
      if (i0 < 0) from = -1
      else {
        val j = findByte(b, '>', i0 + 3)
        if (j < 0) from = -1
        else {
          val m = findByte(b, '<', j + 1)
          if (m >= 0 && startsWith(b, AClose, m)) {
            var k = j + 1
            while (k < m) { if (isCodePointStart(b(k))) link += 1; k += 1 }
            from = m + 4
          } else from = i0 + 1
        }
      }
    }

    if (2 * link > visible) return UTF8String.EMPTY_UTF8

    // paragraph captures of <p>([^<]*)</p>, joined with ' ' — byte-range copies
    val out = new java.io.ByteArrayOutputStream(64)
    var firstPar = true
    from = 0
    while (from >= 0 && from < n) {
      val i0 = find(b, POpen, from)
      if (i0 < 0) from = -1
      else {
        val k = i0 + 3
        val m = findByte(b, '<', k)
        if (m >= 0 && startsWith(b, PClose, m)) {
          if (!firstPar) out.write(' ')
          out.write(b, k, m - k)
          firstPar = false
          from = m + 4
        } else from = i0 + 1
      }
    }
    UTF8String.fromBytes(out.toByteArray)
  }
}
