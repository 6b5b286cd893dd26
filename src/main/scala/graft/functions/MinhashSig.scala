package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/** Fused MinHash signature over a words array: builds every word
  * `k`-shingle, md5s it ONCE, splits the digest into two 48-bit halves
  * `(h1, h2)` and folds all `numHashes` Carter-Wegman minima
  * (`min over shingles of h1 + i·h2`) in a single primitive pass.
  *
  * Exists because Spark's higher-order functions (`transform` /
  * `aggregate`) are interpreted per element — the composed form in
  * [[graft.ops.Dedup.shingleHashPairs]] pays lambda dispatch + boxing
  * for every shingle × hash. This expression emits one static-call per
  * row from codegen and loops in primitives.
  *
  * Bit-identical to the composed form AND the DuckDB oracle: shingle
  * bytes are the words joined by a single space (= `concat_ws(" ", …)`),
  * md5 is md5, and the 48-bit halves equal
  * `conv(substr(hex, 1|13, 12), 16, 10)` /
  * `('0x' || substr(md5(s), 1|13, 12))::BIGINT`.
  *
  * Returns NULL when the doc has fewer than `shingleK` words.
  */
case class MinhashSig(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(ws: Any): Any =
    MinhashSig.compute(ws.asInstanceOf[ArrayData], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.MinhashSig.compute($c, $shingleK, $numHashes);
         |if ($res == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $res;
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {

  private val digests = ThreadLocal.withInitial[MessageDigest](
    () => MessageDigest.getInstance("MD5"))

  /** Primitive-loop kernel, called from generated code. Returns null
    * for docs with fewer than `k` words. */
  def compute(ws: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = ws.numElements()
    val m = n - (k - 1)
    if (m < 1) return null
    val words = new Array[Array[Byte]](n)
    var w = 0
    while (w < n) {
      val s = ws.getUTF8String(w)
      words(w) = if (s == null) Array.emptyByteArray else s.getBytes
      w += 1
    }
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = digests.get()
    var i = 0
    while (i < m) {
      md.reset()
      var j = 0
      while (j < k) {
        if (j > 0) md.update(' '.toByte)
        md.update(words(i + j))
        j += 1
      }
      val d = md.digest()
      var h1 = 0L; var h2 = 0L; var b = 0
      while (b < 6) { h1 = (h1 << 8) | (d(b) & 0xffL); b += 1 }
      while (b < 12) { h2 = (h2 << 8) | (d(b) & 0xffL); b += 1 }
      var t = 0
      while (t < numHashes) {
        val v = h1 + t * h2
        if (v < mins(t)) mins(t) = v
        t += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Registry builder: `minhash_sig(words, k, numHashes)` with literal
    * int parameters. */
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 3,
      "minhash_sig(wordsArray, shingleK, numHashes)")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig $what must be an integer literal, got $other")
    }
    MinhashSig(children.head, lit(children(1), "shingleK"),
      lit(children(2), "numHashes"))
  }
}
