package graft.views

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.analysis.ViewAnalyzer
import graft.functions.GraftExtensions

/** Compiles a user-supplied Postgres-dialect denormalization query (the
  * reference's `<view>.sql` files — README.md:131-183) into the
  * pipeline's compute function, so a sinker user can bring their SQL
  * unchanged:
  *
  *  - [[ViewAnalyzer.normalize]] shims the parse-level Postgres-isms
  *    and the session provides double-quoted identifiers;
  *  - `json_build_object`/`json_agg` resolve via [[GraftExtensions]]
  *    (structs in-plan, reference NULL-for-empty aggregation);
  *  - correlated scalar subqueries decorrelate in Catalyst (B4/B5),
  *    including nested projection lookups; the one shape Spark 4.1
  *    cannot plan — a correlated lookup inside an aggregate argument —
  *    is rewritten to a left join pre-analysis by
  *    [[graft.analysis.CorrelationFlattener]], so the reference's
  *    3-deep course_mv.sql runs verbatim (SqlViewE2ESpec);
  *  - the result must be the mandatory 2-column `(id, doc)` shape
  *    (reference: src/sinker/query_templates.py:11); a struct doc is
  *    serialized once with `to_json` (`ignoreNullFields=false` to match
  *    `json_build_object`'s explicit nulls).
  */
object SqlView {

  private val jsonOpts = Map("ignoreNullFields" -> "false")

  /** Serializes temp-view registration + analysis across concurrent
    * refreshes: views resolve bare table names in the shared session
    * catalog (the reference's tables are equally global in one Postgres
    * schema), and the returned DataFrame is fully ANALYZED inside the
    * lock, so later re-registration can't redirect an in-flight plan. */
  private val registrationLock = new Object

  /** @param sources current-state accessor per source table name (the
    *                Postgres tables in the reference)
    * @param tablesHint source tables if the caller already parsed the
    *                   SQL (avoids a second parse)
    * @return the recompute closure for a [[graft.pipeline.Pipeline]] */
  def compile(spark: SparkSession, viewSql: String,
      sources: Map[String, () => DataFrame],
      tablesHint: Option[Set[String]] = None): () => DataFrame = {
    GraftExtensions.ensureRegistered(spark)
    val tables = tablesHint.getOrElse(
      ViewAnalyzer.parseSchemaTables(spark, viewSql)._2)
    val missing = tables.filterNot(sources.contains)
    require(missing.isEmpty, s"no source registered for table(s): $missing")
    val normalized = ViewAnalyzer.normalize(viewSql)
    () => {
      val df = registrationLock.synchronized {
        tables.foreach(t => sources(t)().createOrReplaceTempView(t))
        // parse -> flatten nested-in-aggregate correlation -> analyze:
        // lets the reference's course_mv.sql run verbatim (see
        // CorrelationFlattener); a plan without that shape passes
        // through unchanged, so this is spark.sql plus one rewrite
        val parsed = spark.sessionState.sqlParser.parsePlan(normalized)
        org.apache.spark.sql.graftshim.PlanRunner.ofRows(
          spark, graft.analysis.CorrelationFlattener.flatten(parsed))
      }
      require(df.columns.length == 2,
        s"view query must produce (id, doc), got ${df.columns.mkString(", ")}")
      val Array(idName, docName) = df.columns
      val docIsComplex = df.schema(docName).dataType match {
        case _: StructType | _: org.apache.spark.sql.types.ArrayType |
             _: org.apache.spark.sql.types.MapType => true
        case _ => false
      }
      df.select(
        col(idName).cast("string").as("id"),
        (if (docIsComplex) to_json(col(docName), jsonOpts)
         else col(docName).cast("string")).as("doc"))
    }
  }
}
