package graft.analysis

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAlias, UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Alias, EqualTo, Expression, NamedExpression, ScalarSubquery, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, JoinHint, LogicalPlan, Project, SubqueryAlias}

/** Pre-analysis rewrite that lets the reference's deepest view SQL run
  * VERBATIM (reference: tests/fixtures/course_mv.sql:1-26).
  *
  * Spark 4.1 decorrelates nested correlated scalar subqueries in plain
  * projections (the `teacher -> person` branch works as written), but a
  * correlated scalar LOOKUP inside an AGGREGATE function argument —
  * `json_agg(json_build_object(..., (select ... from student where
  * student.id = student_id)))` — fails planning ("Unexpected operator"
  * in the decorrelation rewrite). This transformer rewrites exactly
  * that shape: a scalar subquery of the form
  *
  * {{{ (SELECT <expr> FROM <rel> WHERE <a> = <b>) }}}
  *
  * appearing inside an aggregate function's argument is replaced by
  * `<expr>` with `<rel>` LEFT-JOINed under the enclosing query on
  * `<a> = <b>` — the textbook decorrelation, run to a fixpoint so
  * transitively nested lookups (enrollment → student → person) each
  * fold in.
  *
  * Aggregate-ness is decided at parse time from the Postgres-dialect
  * surface this compiler accepts (json_agg/array_agg/... — the
  * analyzer's knowledge isn't available pre-analysis), and subqueries
  * NOT under an aggregate are left for Catalyst, which handles them.
  *
  * Semantics: a LEFT join keeps rows with no match (the subquery's
  * NULL) and preserves the aggregate's input cardinality as long as
  * the lookup key matches at most one row — the reference guarantees
  * that with the mandatory unique index on id
  * (src/sinker/query_templates.py:12); where Postgres would error on a
  * multi-row scalar subquery, the flattened form duplicates instead.
  * Conservative bail-outs: only single-conjunct equality filters, and
  * only when the lookup's relation names don't collide with names
  * already in the enclosing FROM (a collision would make unqualified
  * references ambiguous — analysis would throw rather than silently
  * mis-bind, so the original subquery is left in place).
  */
object CorrelationFlattener {

  /** Aggregate functions of the accepted Postgres dialect (+ their
    * Spark spellings), lowercase. */
  private val aggFunctions = Set(
    "json_agg", "jsonb_agg", "array_agg", "string_agg",
    "collect_list", "collect_set",
    "count", "sum", "avg", "min", "max", "bool_and", "bool_or")

  def flatten(plan: LogicalPlan): LogicalPlan = plan.transformUp { case node =>
    val withFlatSubplans = node.transformExpressions {
      case sq: SubqueryExpression => sq.withNewPlan(flatten(sq.plan))
    }
    withFlatSubplans match {
      case p: Project =>
        flattenExprs(p.projectList, p.child)
          .map { case (es, c) => Project(es, c) }.getOrElse(p)
      case a: Aggregate =>
        flattenExprs(a.aggregateExpressions, a.child)
          .map { case (es, c) => Aggregate(a.groupingExpressions, es, c) }
          .getOrElse(a)
      case other => other
    }
  }

  /** Table/alias names visible in a FROM subtree (for collision bail). */
  private def relationNames(p: LogicalPlan): Set[String] = {
    val buf = scala.collection.mutable.Set[String]()
    p.foreach {
      case r: UnresolvedRelation => buf += r.multipartIdentifier.last
      case a: SubqueryAlias => buf += a.alias
      case _ =>
    }
    buf.toSet
  }

  private def unwrap(ne: Expression): Expression = ne match {
    case a: Alias => a.child
    case u: UnresolvedAlias => u.child
    case e => e
  }

  /** `(SELECT <e> FROM <rel> WHERE <a> = <b>)` → (e, cond, rel). Only
    * when the equality plausibly CORRELATES to the enclosing query: a
    * condition whose both sides are qualified with the subquery's own
    * relation names is a local predicate — Spark plans that subquery
    * natively, and flattening it would change semantics (the join would
    * multiply instead of erroring on >1 match). */
  private def lookupShape(ss: ScalarSubquery): Option[(Expression, Expression, LogicalPlan)] =
    ss.plan match {
      case Project(Seq(proj), Filter(cond @ EqualTo(l, r), rel))
          if relationNames(rel).nonEmpty &&
            !(isLocalQualified(l, rel) && isLocalQualified(r, rel)) =>
        Some((unwrap(proj), cond, rel))
      case _ => None
    }

  private def isLocalQualified(e: Expression, rel: LogicalPlan): Boolean =
    e match {
      case a: UnresolvedAttribute =>
        a.nameParts.length > 1 &&
          relationNames(rel).contains(a.nameParts.dropRight(1).last)
      case _ => false
    }

  /** First lookup-shaped subquery under an aggregate function argument
    * in `e` (pre-order; `inAgg` tracks whether an aggregate call is on
    * the ancestor path). Does not descend into nested subquery plans —
    * those were flattened by the recursion already. */
  private def findInAgg(e: Expression, inAgg: Boolean): Option[ScalarSubquery] =
    e match {
      case ss: ScalarSubquery =>
        if (inAgg && lookupShape(ss).isDefined) Some(ss) else None
      case f: UnresolvedFunction
          if aggFunctions.contains(f.nameParts.last.toLowerCase) =>
        f.children.iterator.map(findInAgg(_, inAgg = true)).collectFirst {
          case Some(ss) => ss
        }
      case other =>
        other.children.iterator.map(findInAgg(_, inAgg)).collectFirst {
          case Some(ss) => ss
        }
    }

  /** Fixpoint: inline each in-aggregate lookup's projection and join
    * its relation below the enclosing query. Returns None if nothing
    * changed. */
  private def flattenExprs(exprs0: Seq[NamedExpression], child0: LogicalPlan)
      : Option[(Seq[NamedExpression], LogicalPlan)] = {
    var exprs = exprs0
    var child = child0
    var changed = false
    var progress = true
    while (progress) {
      progress = false
      val found = exprs.iterator.map(findInAgg(_, inAgg = false)).collectFirst {
        case Some(ss) => ss
      }
      found.foreach { ss =>
        val (e, cond, rel) = lookupShape(ss).get
        if (relationNames(rel).intersect(relationNames(child)).isEmpty) {
          child = Join(child, rel, LeftOuter, Some(cond), JoinHint.NONE)
          exprs = exprs.map(_.transform {
            case s if s eq ss => e
          }.asInstanceOf[NamedExpression])
          changed = true
          progress = true
        }
      }
    }
    if (changed) Some((exprs, child)) else None
  }
}
