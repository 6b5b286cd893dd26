package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, EqualTo, Expression, ExpressionInfo, If, Literal, Size}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.types.NullType

/** Postgres-dialect functions the reference's user view SQL relies on
  * (reference: tests/fixtures/person_mv.sql, course_mv.sql), mapped onto
  * Catalyst expressions so the SQL runs unchanged on this engine:
  *
  *  - `json_build_object('k1', v1, 'k2', v2, …)` → a named struct. JSON
  *    objects stay STRUCTS through the plan (nested calls compose as
  *    nested structs); the pipeline serializes the top-level doc once at
  *    the sink edge with `to_json` — matching how the reference's JSON
  *    only ever materializes at the MV boundary.
  *  - `json_agg(x)` → `collect_list(x)`, but NULL for empty groups:
  *    Postgres json_agg over zero rows is NULL, Spark's collect_list is
  *    `[]` — the wrapper restores reference semantics (the golden course
  *    doc with no enrollments expects `"enrollments": null`).
  */
object PgCompat {

  private[functions] val functions = Seq(
    (new FunctionIdentifier("json_build_object"),
      new ExpressionInfo(classOf[CreateNamedStruct].getName, "json_build_object"),
      (children: Seq[Expression]) => CreateNamedStruct(children)),
    (new FunctionIdentifier("json_agg"),
      new ExpressionInfo(classOf[CollectList].getName, "json_agg"),
      (children: Seq[Expression]) => {
        val agg = CollectList(children.head).toAggregateExpression()
        If(EqualTo(Size(agg), Literal(0)), Literal(null, NullType), agg)
      }))
}
