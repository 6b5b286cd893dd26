package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, CreateNamedStruct, EqualTo, Explode, Expression, ExpressionInfo, If, JsonToStructs, LambdaFunction, Literal, Size, UnresolvedNamedLambdaVariable}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
import org.apache.spark.sql.types.{MapType, NullType, StringType}

/** Postgres-dialect functions the reference's user view SQL relies on
  * (reference: tests/fixtures/person_mv.sql, course_mv.sql), mapped onto
  * Catalyst expressions so the SQL runs unchanged on this engine:
  *
  *  - `json_build_object('k1', v1, 'k2', v2, …)` → a named struct. JSON
  *    objects stay STRUCTS through the plan (nested calls compose as
  *    nested structs); the pipeline serializes the top-level doc once at
  *    the sink edge with `to_json` — matching how the reference's JSON
  *    only ever materializes at the MV boundary.
  *  - `json_agg(x)` → `collect_list`, with two Postgres fidelity fixes:
  *    NULL for empty groups (Postgres json_agg over zero rows is NULL,
  *    collect_list is `[]` — the golden course doc with no enrollments
  *    expects `"enrollments": null`), and NULL ELEMENTS preserved
  *    (collect_list drops nulls; Postgres keeps them) by collecting a
  *    single-field struct wrapper and unwrapping with `transform`.
  */
object PgCompat {

  private[functions] val functions = Seq(
    (new FunctionIdentifier("json_build_object"),
      new ExpressionInfo(classOf[CreateNamedStruct].getName, "json_build_object"),
      (children: Seq[Expression]) => CreateNamedStruct(children)),
    (new FunctionIdentifier("json_agg"),
      new ExpressionInfo(classOf[CollectList].getName, "json_agg"),
      (children: Seq[Expression]) => {
        // struct wrapper is never null even when the element is, so
        // collect_list keeps null elements; unwrap after aggregation
        val wrapped = CreateNamedStruct(Seq(Literal("v"), children.head))
        val agg = CollectList(wrapped).toAggregateExpression()
        val x = UnresolvedNamedLambdaVariable(Seq("x"))
        val unwrapped = ArrayTransform(agg,
          LambdaFunction(UnresolvedExtractValue(x, Literal("v")), Seq(x)))
        If(EqualTo(Size(agg), Literal(0)), Literal(null, NullType), unwrapped)
      }),
    // jsonb_each_text(col) → (key, value) rows (B11): a GENERATOR, used
    // as `SELECT jsonb_each_text(props)` or `LATERAL VIEW
    // jsonb_each_text(props) kv AS key, value` (Spark has no Postgres
    // implicit-lateral comma join; reference:
    // tests/test_parse_schema_tables.py:76)
    (new FunctionIdentifier("jsonb_each_text"),
      new ExpressionInfo(classOf[Explode].getName, "jsonb_each_text"),
      (children: Seq[Expression]) => Explode(JsonToStructs(
        MapType(StringType, StringType),
        // FAILFAST: Postgres raises on malformed jsonb; permissive mode
        // would silently drop the row from the view instead
        Map("mode" -> "FAILFAST"),
        children.head))))
}
