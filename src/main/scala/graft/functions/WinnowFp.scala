package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Fused winnowing fingerprint (Schleimer/Wilkerson/Aiken SIGMOD'03)
  * over a text column: every character `k`-gram is md5'd once, window
  * minima (width `w`) are taken in one pass, and the sorted distinct
  * minima fold into the summary digest — all inside a single primitive
  * kernel. The composed form ([[graft.ops.Dedup.winnowFingerprint]])
  * walks interpreted higher-order lambdas that allocate an array per
  * window; this emits one static call per row.
  *
  * Bit-identical to the composed form and the DuckDB oracle: the k-gram
  * hash is the first 48 bits of md5 of the k-CHARACTER substring
  * (UTF8String.substring is codepoint-based, like `substr` in both
  * engines), and the summary is md5 of the sorted distinct minima
  * joined by ','  in decimal. Returns `(fp_count: long, winnow_fp:
  * string-or-null)`; empty texts yield `(0, null)`.
  */
case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("fp_count", LongType, nullable = false),
    StructField("winnow_fp", StringType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    WinnowFp.compute(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFp.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Sorted distinct winnow minima as an array — the exploded-search form
  * of [[WinnowFp]] (overlap pairs equi-join on individual minima, so
  * they need the values, not the summary digest). Same kernel math. */
case class WinnowMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_mins expects string, got ${other.catalogString}")
  }

  override protected def nullSafeEval(text: Any): Any =
    WinnowFp.computeMins(text.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowFp.computeMins($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 3, "winnow_mins(text, k, w)")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"winnow_mins $what must be an integer literal, got $other")
    }
    WinnowMins(children.head, lit(children(1), "k"), lit(children(2), "w"))
  }
}

object WinnowFp {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  private val hexChars = "0123456789abcdef".toCharArray

  /** Shared minima pipeline: k-gram 48-bit md5 hashes → width-`w`
    * window minima → sorted distinct. */
  private[functions] def minsOf(text: UTF8String, k: Int, w: Int): Array[Long] = {
    val len = text.numChars()
    val m = len - (k - 1)
    val md = digests.get()
    val hs = new Array[Long](math.max(m, 0))
    var i = 0
    while (i < m) {
      md.reset()
      md.update(text.substring(i, i + k).getBytes)
      val d = md.digest()
      var h = 0L; var b = 0
      while (b < 6) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      hs(i) = h
      i += 1
    }
    val wins: Array[Long] =
      if (m <= 0) Array.emptyLongArray
      else if (m <= w) { var mn = hs(0); var j = 1; while (j < m) { if (hs(j) < mn) mn = hs(j); j += 1 }; Array(mn) }
      else {
        val out = new Array[Long](m - w + 1)
        var j = 0
        while (j <= m - w) {
          var mn = hs(j); var x = j + 1
          while (x < j + w) { if (hs(x) < mn) mn = hs(x); x += 1 }
          out(j) = mn
          j += 1
        }
        out
      }
    java.util.Arrays.sort(wins)
    var distinct = 0
    var j = 0
    while (j < wins.length) {
      if (j == 0 || wins(j) != wins(j - 1)) { wins(distinct) = wins(j); distinct += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(wins, distinct)
  }

  /** Array-form kernel for [[WinnowMins]]. */
  def computeMins(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(minsOf(text, k, w))

  /** Primitive kernel, called from generated code. */
  def compute(text: UTF8String, k: Int, w: Int): InternalRow = {
    val mins = minsOf(text, k, w)
    if (mins.length == 0)
      return new GenericInternalRow(Array[Any](0L, null))
    val sb = new java.lang.StringBuilder(mins.length * 16)
    var j = 0
    while (j < mins.length) {
      if (j > 0) sb.append(',')
      sb.append(mins(j))
      j += 1
    }
    val md = digests.get()
    md.reset()
    md.update(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val d = md.digest()
    val hex = new Array[Char](32)
    j = 0
    while (j < 16) {
      hex(2 * j) = hexChars((d(j) >> 4) & 0xf)
      hex(2 * j + 1) = hexChars(d(j) & 0xf)
      j += 1
    }
    new GenericInternalRow(Array[Any](mins.length.toLong,
      UTF8String.fromString(new String(hex))))
  }

  /** Registry builder: `winnow_fp(text, k, w)` with literal ints. */
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 3, "winnow_fp(text, k, w)")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"winnow_fp $what must be an integer literal, got $other")
    }
    WinnowFp(children.head, lit(children(1), "k"), lit(children(2), "w"))
  }
}
