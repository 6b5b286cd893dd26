package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native strict-mapping validator: the violation paths of a JSON doc
  * against a declared mapping (`graft.sink.StrictSchema` semantics),
  * as a codegen'd expression so sink-edge validation stays inside
  * whole-stage codegen (VERDICT r5 item 8) — the previous Scala UDF
  * paid the catalyst↔Scala serialization boundary per document and cut
  * the codegen span at the sink projection.
  *
  * `from_json(FAILFAST)` cannot replace this: Spark's JSON reader
  * silently IGNORES undeclared fields, and rejecting those is the core
  * of `dynamic: "strict"`. Hence a kernel in the repo's established
  * native-expression style ([[Simhash16]], [[MinhashSig]]), walking the
  * parsed tree once per doc directly over the UTF8String's bytes.
  *
  * Args: `strict_violations(doc STRING, schemaDdl STRING)` where
  * `schemaDdl` is a foldable literal (`StructType.toDDL`), parsed once
  * at plan time and shipped to generated code as a reference object —
  * never re-parsed per row.
  */
case class StrictViolations(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        "strict_violations: schema DDL must be a foldable literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"strict_violations expects (string, string), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val schema: StructType =
    StructType.fromDDL(right.eval().asInstanceOf[UTF8String].toString)

  override protected def nullSafeEval(doc: Any, ddl: Any): Any =
    StrictViolations.compute(doc.asInstanceOf[UTF8String], schema)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val schemaRef =
      ctx.addReferenceObj("strictSchema", schema, classOf[StructType].getName)
    nullSafeCodeGen(ctx, ev, (doc, _) =>
      s"${ev.value} = graft.functions.StrictViolations.compute($doc, $schemaRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object StrictViolations {

  /** Kernel, called from generated code: parse straight from the
    * UTF8String's bytes (no intermediate java.lang.String). */
  def compute(doc: UTF8String, schema: StructType): ArrayData = {
    val viols = graft.sink.StrictSchema.violationsBytes(doc.getBytes, schema)
    new GenericArrayData(viols.map(v => UTF8String.fromString(v): Any).toArray)
  }

  def fromFunctionArgs(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "strict_violations(doc, schemaDdl) takes exactly 2 arguments")
    StrictViolations(children(0), children(1))
  }
}
