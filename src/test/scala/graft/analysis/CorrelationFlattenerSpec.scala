package graft.analysis

import org.apache.spark.sql.catalyst.expressions.ScalarSubquery
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

import graft.SparkSpec

/** Unit coverage for the pre-analysis nested-correlation rewrite: what
  * it flattens (lookups under aggregate arguments), what it must leave
  * alone (uncorrelated locals, relation-name collisions, non-aggregate
  * subqueries Spark plans natively). */
class CorrelationFlattenerSpec extends SparkSpec {

  private def parse(sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  /** Count ScalarSubquery expressions anywhere, including inside other
    * subqueries' plans (plan.foreach does not descend there). */
  private def countSubqueries(p: LogicalPlan): Int = {
    var n = 0
    p.foreach { node =>
      node.expressions.foreach(_.foreach {
        case ss: ScalarSubquery => n += 1 + countSubqueries(ss.plan)
        case _ =>
      })
    }
    n
  }

  test("lookup inside json_agg flattens to a join; plan keeps no in-agg subquery") {
    val plan = parse(
      """select id, (select json_agg((select name from person where person.id = person_id))
        |            from student where student.course_id = course.id) as doc
        |from course""".stripMargin)
    val flat = CorrelationFlattener.flatten(plan)
    // the outer (enrollments-style) subquery survives — Spark handles
    // one level of correlation; the INNER person lookup folded into it
    countSubqueries(plan) shouldBe 2
    countSubqueries(flat) shouldBe 1
  }

  test("uncorrelated local-predicate subquery is left for Spark") {
    val plan = parse(
      """select id, (select json_agg((select max(x) from t where t.a = t.b))
        |            from student where student.course_id = course.id) as doc
        |from course""".stripMargin)
    val flat = CorrelationFlattener.flatten(plan)
    countSubqueries(flat) shouldBe countSubqueries(plan)
  }

  test("relation-name collision bails instead of mis-binding") {
    // lookup reads `student`, which is already the aggregate's FROM
    val plan = parse(
      """select id, (select json_agg((select name from student where student.id = buddy_id))
        |            from student where student.course_id = course.id) as doc
        |from course""".stripMargin)
    val flat = CorrelationFlattener.flatten(plan)
    countSubqueries(flat) shouldBe countSubqueries(plan)
  }

  test("subqueries outside aggregate arguments are untouched") {
    val plan = parse(
      """select id, (select name from person where person.id = person_id) as doc
        |from course""".stripMargin)
    val flat = CorrelationFlattener.flatten(plan)
    flat.toString shouldBe plan.toString
  }
}
