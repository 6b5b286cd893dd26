package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Access shim: `classic.Dataset.ofRows` is `private[sql]`, and running
  * a REWRITTEN logical plan (graft.analysis.CorrelationFlattener) needs
  * it — there is no public "analyze this plan" entry point. This object
  * lives in the `org.apache.spark.sql` package tree solely to re-export
  * that one call; no Spark internals are modified. */
object PlanRunner {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
