package graft.analysis

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnresolvedWith}

/** SQL analysis for pipeline registration: which source tables does a
  * user-supplied denormalization view query read, and which of them is
  * the "parent" (driving) table whose deletes proxy document deletes?
  *
  * Port of the reference's sqlglot-based `parse_schema_tables`
  * (reference: src/sinker/utils.py:7-20) onto Spark's own SQL parser:
  * `sparkSession.sessionState.sqlParser.parsePlan` → collect
  * `UnresolvedRelation` leaves (including those inside scalar/EXISTS
  * subquery expressions), subtract CTE aliases, and take the outermost
  * FROM relation as the parent — the same result sqlglot's BFS
  * `find(Table)` produces on the reference's fixtures
  * (reference: tests/test_parse_schema_tables.py:4-98).
  *
  * The reference's view SQL is Postgres dialect; [[normalize]] shims the
  * three Postgres-isms Spark's parser rejects (`DISTINCT ON (...)`,
  * trailing commas in call argument lists, trailing `;`). Double-quoted
  * identifiers are handled natively via
  * `spark.sql.ansi.doubleQuotedIdentifiers` (set by GraftSession).
  */
object ViewAnalyzer {

  /** Parse-only Postgres→Spark dialect shim. Text-level, so a string
    * literal containing `,)` or `DISTINCT ON (` would be mangled — fine
    * for table-extraction analysis, not for execution. */
  def normalize(sql: String): String =
    sql.trim
      .stripSuffix(";")
      .replaceAll("(?is)\\bDISTINCT\\s+ON\\s*\\([^)]*\\)", "")
      .replaceAll(",(\\s*)\\)", "$1)")

  /** @return (parentTable, all referenced source tables). Names are the
    *         last identifier part (schema-qualified `public."Notes"` →
    *         `Notes`), matching the reference's `table.name`. */
  def parseSchemaTables(spark: SparkSession, viewSelectQuery: String): (String, Set[String]) = {
    val plan = spark.sessionState.sqlParser.parsePlan(normalize(viewSelectQuery))
    // CTE aliases are subtracted GLOBALLY (including aliases defined in
    // nested subqueries) — deliberately unscoped, matching the
    // reference's sqlglot behavior exactly (`tables - ctes`,
    // utils.py:17-19): a real table shadowed by an inner CTE alias is
    // treated as a CTE, same as upstream.
    val cteAliases = collectCteAliases(plan)
    val tables = collectRelationNames(plan).filter(_.nonEmpty).toSet -- cteAliases
    val parent = firstFromRelation(plan, cteAliases)
      .getOrElse(throw new IllegalArgumentException("No table found in the query"))
    (parent, tables)
  }

  /** All UnresolvedRelation names anywhere in the plan, including inside
    * subquery expressions and CTE definitions (CTE defs are
    * `innerChildren` of UnresolvedWith, which `TreeNode.foreach` skips —
    * traversed explicitly). */
  private def collectRelationNames(plan: LogicalPlan): Seq[String] = {
    val buf = mutable.ArrayBuffer[String]()
    plan.foreach { node =>
      node match {
        case r: UnresolvedRelation => buf += r.multipartIdentifier.last
        case w: UnresolvedWith =>
          w.cteRelations.foreach(cte => buf ++= collectRelationNames(cte._2))
        case _ =>
      }
      node.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => buf ++= collectRelationNames(sq.plan)
        case _ =>
      })
    }
    buf.toSeq
  }

  private def collectCteAliases(plan: LogicalPlan): Set[String] = {
    val buf = mutable.Set[String]()
    plan.foreach { node =>
      node match {
        case w: UnresolvedWith =>
          buf ++= w.cteRelations.map(_._1)
          w.cteRelations.foreach(cte => buf ++= collectCteAliases(cte._2))
        case _ =>
      }
      node.expressions.foreach(_.foreach {
        case sq: SubqueryExpression => buf ++= collectCteAliases(sq.plan)
        case _ =>
      })
    }
    buf.toSet
  }

  /** Breadth-first over the operator tree of the MAIN query only — CTE
    * definitions and expression subqueries are not descended into — so
    * the outermost FROM clause's relation wins, exactly like sqlglot's
    * BFS `find(Table)` on the reference fixtures. CTE self-references
    * are skipped (they aren't source tables). */
  private def firstFromRelation(plan: LogicalPlan, cteAliases: Set[String]): Option[String] = {
    val queue = mutable.Queue[LogicalPlan](plan)
    while (queue.nonEmpty) {
      queue.dequeue() match {
        case r: UnresolvedRelation =>
          val name = r.multipartIdentifier.last
          if (name.nonEmpty && !cteAliases.contains(name)) return Some(name)
        case w: UnresolvedWith => queue.enqueue(w.child)
        case node => node.children.foreach(queue.enqueue)
      }
    }
    None
  }
}
