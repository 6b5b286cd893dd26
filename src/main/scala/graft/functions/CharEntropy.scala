package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon character entropy (bits/char) as a codegen'd expression —
  * the cheap gibberish/boilerplate detector of the Gopher/C4 quality
  * family: random base64 blobs score near 6 bits, natural prose sits
  * around 4.1–4.3, and `aaaa…` spam collapses toward 0. One pass per
  * row, zero shuffle — at 100 TB this runs inside the scan's
  * projection, unlike the explode→groupBy formulation whose char-level
  * shuffle would be ~300× the corpus.
  *
  * Exactness contract with the q114 DuckDB oracle: both engines
  * compute `(ln(n) − (Σ round(cᵢ·ln(cᵢ)·1e6))/1e6/n) / ln(2)` where
  * `cᵢ` are per-codepoint counts. The inner sum is over INTEGERS, so
  * any accumulation order gives identical results, and the 1e6
  * rounding absorbs cross-libm ulp differences in `ln`.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    CharEntropy.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharEntropy.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {

  /** Kernel, called from generated code. Counts Unicode code points
    * (ASCII fast path in a flat array, supplementary planes in a
    * fallback map); empty strings define to 0.0. */
  def compute(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0d
    val ascii = new Array[Int](128)
    var other: java.util.HashMap[Integer, Array[Int]] = null
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (other == null) other = new java.util.HashMap[Integer, Array[Int]]()
        val cell = other.computeIfAbsent(cp, _ => new Array[Int](1))
        cell(0) += 1
      }
      n += 1
      i += Character.charCount(cp)
    }
    var scaled = 0L // Σ round(c·ln(c)·1e6) — integer, order-free
    var j = 0
    while (j < 128) {
      val c = ascii(j)
      if (c > 1) scaled += Math.round(c * Math.log(c.toDouble) * 1e6)
      j += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c = it.next()(0)
        if (c > 1) scaled += Math.round(c * Math.log(c.toDouble) * 1e6)
      }
    }
    (Math.log(n.toDouble) - (scaled / 1e6) / n) / Math.log(2.0d)
  }

  /** Column API over the native expression (mirrors [[NfcNormalize]]). */
  def apply(c: Column): Column = {
    SparkSession.getActiveSession.foreach(GraftExtensions.ensureRegistered)
    call_function("char_entropy", c)
  }
}
