package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Fused 16-bit SimHash over a words array: ONE md5 per token and ONE
  * pass accumulating all 16 signed bit counters, versus the composed
  * higher-order-function form ([[graft.ops.Dedup.simhash16FromHashes]])
  * which walks the hash array 16 times through interpreted lambdas.
  *
  * Bit-identical to the composed form and the DuckDB oracle: bit `b`
  * reads hex digit `b/4 + 1` (1-based) of the token's md5 hex string —
  * i.e. the high/low nibble of digest byte `(b/4)/2` — and adds +1 when
  * bit `b%4` of that nibble is set, else −1; bit `b` of the result is
  * set when the sum is positive. A null token contributes −1 to every
  * bit — exactly what the composed form yields (md5(null) is null, so
  * every `when` falls to its −1 branch); the equality spec covers the
  * null-token case explicitly.
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(ws: Any): Any =
    Simhash16.compute(ws.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Simhash16.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Simhash16 {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Primitive kernel, called from generated code. */
  def compute(ws: ArrayData): Long = {
    val n = ws.numElements()
    val sums = new Array[Int](16)
    val md = digests.get()
    var i = 0
    while (i < n) {
      val s = ws.getUTF8String(i)
      if (s == null) {
        // composed-form parity: md5(null) is null, so every bit's
        // `when` takes the -1 branch
        var b = 0
        while (b < 16) { sums(b) -= 1; b += 1 }
      } else {
        md.reset()
        md.update(s.getBytes)
        val d = md.digest()
        var b = 0
        while (b < 16) {
          // hex digit b/4 + 1 (1-based) = nibble of digest byte (b/4)/2
          val digitIdx = b / 4 // 0-based hex digit index
          val byte = d(digitIdx / 2) & 0xff
          val nibble = if (digitIdx % 2 == 0) byte >>> 4 else byte & 0xf
          sums(b) += (if (((nibble >> (b % 4)) & 1) == 1) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (sums(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }
}
