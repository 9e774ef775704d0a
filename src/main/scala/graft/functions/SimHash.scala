package graft.functions

import graft.operators.DeterministicOcrEngine
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * 32-bit SimHash of whitespace-tokenized text as a native Catalyst expression with
 * `doGenCode` — stays inside whole-stage codegen (the generated code calls the static
 * [[SimHashImpl.simhash32]] directly; no Row boxing, no UDF serialization penalty).
 *
 * Bit k of the signature is set iff the sum over tokens of (2*bit_k(md5(token)) - 1) is
 * >= 0, where bit_k reads the k-th bit of the first 8 hex digits (big-endian within each
 * digit). The exact same arithmetic is expressible in portable SQL (see
 * [[OracleSql.simhashExpr]]), which is what makes the operator oracle-verifiable.
 */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHashImpl.simhash32(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashImpl.simhash32($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

object SimHash32 {
  /** Column-level entry point. */
  def simhash32(c: Column): Column =
    ColumnBridge.column(SimHash32(ColumnBridge.expression(c)))
}

/** Static implementation target for both interpreted eval and generated code. */
object SimHashImpl {
  def simhash32(text: UTF8String): Long = {
    val tokens = text.toString.split(" ", -1) // keep empties: parity with string_split
    val sums = new Array[Int](32)
    var ti = 0
    while (ti < tokens.length) {
      val h = DeterministicOcrEngine.md5Hex(tokens(ti))
      var k = 0
      while (k < 32) {
        val dv = DeterministicOcrEngine.hexVal(h.charAt(k / 4))
        val bit = (dv >> (3 - k % 4)) & 1
        sums(k) += 2 * bit - 1
        k += 1
      }
      ti += 1
    }
    var out = 0L
    var k = 0
    while (k < 32) {
      if (sums(k) >= 0) out |= 1L << k
      k += 1
    }
    out
  }
}
