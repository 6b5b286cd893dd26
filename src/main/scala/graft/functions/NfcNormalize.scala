package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd expression — the first
  * stage of corpus text canonicalization (é as one codepoint and é as
  * e+combining-acute must dedup to the same document). Spark ships no
  * normalizer function; DuckDB's `nfc_normalize` and `java.text
  * .Normalizer` implement the same Unicode normalization spec, so the
  * q103 oracle gate proves the engines agree byte-for-byte.
  *
  * Cost discipline: an all-ASCII string (numBytes == numChars) IS NFC
  * by construction and returns the input buffer untouched — on typical
  * web corpora the Normalizer call runs only for the non-ASCII
  * minority; already-normalized non-ASCII takes the cheaper
  * `isNormalized` scan instead of a rebuild. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Kernel, called from generated code. */
  def compute(s: UTF8String): UTF8String = {
    if (s.numBytes == s.numChars) return s // all-ASCII is NFC already
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Column API over the native expression, resolved through the
    * function registry (mirrors [[CosineSimilarity.apply]]). */
  def apply(c: Column): Column = {
    SparkSession.getActiveSession.foreach(GraftExtensions.ensureRegistered)
    call_function("nfc_normalize", c)
  }
}
