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

/** Static single-pass scanner (Java-callable from generated code). */
object BoilerplateOps {

  def extract(u: UTF8String): UTF8String = {
    if (u == null) return null
    val s = u.toString
    val n = s.length

    // visible code points after removing <[^>]*> (leftmost-first, like replaceAll)
    var visible = 0L
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        val j = s.indexOf('>', i + 1)
        if (j < 0) {
          while (i < n) { if (!Character.isLowSurrogate(s.charAt(i))) visible += 1; i += 1 }
        } else i = j + 1
      } else {
        if (!Character.isLowSurrogate(c)) visible += 1
        i += 1
      }
    }

    // anchor-text code points: <a [^>]*>([^<]*)</a>, leftmost-first, restart at +1
    var link = 0L
    var from = 0
    while (from >= 0 && from < n) {
      val i0 = s.indexOf("<a ", from)
      if (i0 < 0) from = -1
      else {
        val j = s.indexOf('>', i0 + 3)
        if (j < 0) from = -1
        else {
          val m = s.indexOf('<', j + 1)
          if (m >= 0 && s.startsWith("</a>", m)) {
            var k = j + 1
            while (k < m) { if (!Character.isLowSurrogate(s.charAt(k))) link += 1; k += 1 }
            from = m + 4
          } else from = i0 + 1
        }
      }
    }

    if (2 * link > visible) return UTF8String.EMPTY_UTF8

    // paragraph captures of <p>([^<]*)</p>, joined with ' '
    val sb = new java.lang.StringBuilder
    var firstPar = true
    from = 0
    while (from >= 0 && from < n) {
      val i0 = s.indexOf("<p>", from)
      if (i0 < 0) from = -1
      else {
        val k = i0 + 3
        val m = s.indexOf('<', k)
        if (m >= 0 && s.startsWith("</p>", m)) {
          if (!firstPar) sb.append(' ')
          sb.append(s, k, m)
          firstPar = false
          from = m + 4
        } else from = i0 + 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
