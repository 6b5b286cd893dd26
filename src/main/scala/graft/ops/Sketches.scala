package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus statistics at 100 TB (SURVEY §7.6):
  * fixed-size sketch state instead of exact distinct/sort state, so
  * memory stays O(sketch) per group no matter the cardinality.
  *
  *  - [[distinctStats]] — HyperLogLog++ distinct counts
  *    (`approx_count_distinct`, default rsd 5%); the exact variant
  *    shuffles every distinct value, the sketch ships ~1.5 KB per group.
  *  - [[quantiles]] — `approx_percentile` (t-digest-style): percentile
  *    summaries without a global sort.
  *
  * Approximation quality is spec-asserted against exact answers (these
  * sketches are engine-specific, so they're not DuckDB-oracle-gated).
  */
object Sketches {

  /** Per-group cardinality estimates alongside row counts. */
  def distinctStats(df: DataFrame, groupCol: String, valueCol: String,
      rsd: Double = 0.05): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Approximate percentiles of `valueCol` per group. */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      percentiles: Seq[Double], accuracy: Int = 10000): DataFrame = {
    val pArr = array(percentiles.map(lit): _*)
    df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy))
        .as("quantiles"))
  }
}
