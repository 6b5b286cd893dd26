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
  * `family` selects the shingle hash: "md5" (default — cross-engine
  * oracle-reproducible) or "xxhash64" (one seeded XXH64 pass PER hash
  * function — no digest allocation, still ~3× less CPU than one md5;
  * the production choice when no second engine needs to recompute the
  * values). The xxhash64 family is strictly MORE independent than the
  * Carter-Wegman `h1 + i·h2` fold: affine families correlate the
  * bands whenever one shingle draws an exceptionally small h2 (it then
  * minimizes every i ≥ 1 simultaneously), while per-seed hashes keep
  * each band an independent minwise trial.
  *
  * Returns NULL when the doc has fewer than `shingleK` words.
  */
case class MinhashSig(child: Expression, shingleK: Int, numHashes: Int,
    family: String = "md5")
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<string>, got ${other.catalogString}")
  }

  private val useXx: Boolean = family match {
    case "md5" => false
    case "xxhash64" => true
    case other => throw new IllegalArgumentException(
      s"minhash_sig family must be md5 or xxhash64, got $other")
  }

  override protected def nullSafeEval(ws: Any): Any =
    MinhashSig.compute(ws.asInstanceOf[ArrayData], shingleK, numHashes, useXx)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $res =
         |  graft.functions.MinhashSig.compute($c, $shingleK, $numHashes, $useXx);
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
    * for docs with fewer than `k` words. `useXx` selects one seeded
    * XXH64 per hash function over the md5 Carter-Wegman fold. */
  def compute(ws: ArrayData, k: Int, numHashes: Int,
      useXx: Boolean = false): ArrayData = {
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
    val md = if (useXx) null else digests.get()
    var buf: Array[Byte] = if (useXx) new Array[Byte](64) else null
    var i = 0
    while (i < m) {
      if (useXx) {
        // assemble the shingle bytes once, then one seeded XXH64 per
        // hash function — no digest object, no hex, no per-shingle
        // allocation, and every band is an independent minwise trial
        var len = 0
        var j = 0
        while (j < k) {
          val wb = words(i + j)
          val need = len + wb.length + 1
          if (need > buf.length) {
            buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          }
          if (j > 0) { buf(len) = ' '.toByte; len += 1 }
          System.arraycopy(wb, 0, buf, len, wb.length); len += wb.length
          j += 1
        }
        var t = 0
        while (t < numHashes) {
          val v = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
            buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, t.toLong)
          if (v < mins(t)) mins(t) = v
          t += 1
        }
      } else {
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
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Registry builder: `minhash_sig(words, k, numHashes[, family])`
    * with literal parameters. */
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 3 || children.length == 4,
      "minhash_sig(wordsArray, shingleK, numHashes[, family])")
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"minhash_sig $what must be an integer literal, got $other")
    }
    val family = if (children.length < 4) "md5" else children(3) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"minhash_sig family must be a string literal, got $other")
    }
    MinhashSig(children.head, lit(children(1), "shingleK"),
      lit(children(2), "numHashes"), family)
  }
}
