package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Bloom-filter membership probe — the codegen'd replacement for
  * the Scala UDF [[graft.ops.Dedup.bloomPrefilteredAntiJoin]] shipped
  * with in round 6 (VERDICT r6 item 3): a scalar UDF in the batch
  * scan's hot path cuts whole-stage codegen exactly where the engine's
  * own discipline (r5's [[StrictViolations]]) demands a kernel.
  *
  * Args: `bloom_might_contain(key, filterBytes)` where `filterBytes` is
  * a FOLDABLE binary literal holding the `writeTo` serialization of an
  * [[org.apache.spark.util.sketch.BloomFilter]]. The filter
  * deserializes ONCE at plan time (`@transient lazy`, the
  * [[StrictViolations]] schema-DDL pattern) and ships to generated code
  * as a reference object — never re-read per row.
  *
  * Key-type contract (VERDICT r6 ADVICE): `DataFrameStatFunctions
  * .bloomFilter` inserts STRING columns as their UTF-8 bytes and
  * integral columns as native longs — two incompatible hash domains.
  * The probe therefore branches on the key's type (string → UTF-8
  * bytes probe, byte/short/int/long → long probe) and REJECTS anything
  * else at analysis time, instead of letting an implicit cast silently
  * hash the wrong representation and report every true member as
  * "definitely new".
  *
  * Null semantics match the UDF it replaces: a null key is `false`
  * ("definitely not in state"), so null-keyed rows pass through the
  * definite-new branch instead of paying the exact join.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_, r) if r != BinaryType || !right.foldable =>
        TypeCheckResult.TypeCheckFailure(
          "bloom_might_contain: filter bytes must be a foldable binary literal")
      case (StringType | ByteType | ShortType | IntegerType | LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, _) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain: key must be string or integral (the two " +
          s"domains stat.bloomFilter builds over), got ${l.catalogString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(right.eval().asInstanceOf[Array[Byte]])

  /** Kernels, called from generated code. */
  def testString(s: UTF8String): Boolean = bloom.mightContainBinary(s.getBytes)
  def testLong(v: Long): Boolean = bloom.mightContainLong(v)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = left.eval(input)
    if (v == null) false
    else left.dataType match {
      case StringType => testString(v.asInstanceOf[UTF8String])
      case ByteType => testLong(v.asInstanceOf[Byte].toLong)
      case ShortType => testLong(v.asInstanceOf[Short].toLong)
      case IntegerType => testLong(v.asInstanceOf[Int].toLong)
      case _ => testLong(v.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = left.genCode(ctx)
    val ref = ctx.addReferenceObj("bloomProbe", this,
      classOf[BloomMightContain].getName)
    val call = left.dataType match {
      case StringType => s"$ref.testString(${childGen.value})"
      case _ => s"$ref.testLong((long) ${childGen.value})"
    }
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.value} = false;
      if (!${childGen.isNull}) { ${ev.value} = $call; }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "bloom_might_contain(key, filterBytes) takes exactly 2 arguments")
    BloomMightContain(children(0), children(1))
  }
}
