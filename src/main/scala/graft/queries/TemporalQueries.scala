package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Temporal

/** Temporal join operators under the CORRECTNESS gate: as-of join
  * (latest-preceding-row semantics DuckDB spells `ASOF JOIN`) and a
  * keyless time-range join. The Spark sides use the scale shapes from
  * [[graft.ops.Temporal]] — union-and-carry for as-of, bucketed
  * equi-join for range — while the oracles use DuckDB's native
  * temporal-join operators, so the gate proves the re-expression exact.
  */
object TemporalQueries {

  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------- q46
  /** For every click, the user's latest purchase at or before it
    * (attribution join). Purchases are deduped to one row per
    * (user, ts) first — ASOF leaves that tie unspecified. */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    Temporal.asOfJoin(clicks, purchases, "user_id", "ts", "ts",
      Seq("event_id", "value"), "p_")
  }
  private val q46Sql =
    """WITH p AS (
      |  SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase'
      |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
      |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click')
      |SELECT c.event_id, c.user_id, c.ts,
      |       p.event_id AS p_event_id, p.value AS p_value, p.ts AS p_ts
      |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts""".stripMargin

  // --------------------------------------------------------- q47
  /** For every error event, how many clicks (from ANY user — no equi
    * key) landed within ±60 s: burst correlation as a pure time-range
    * join, bucketed so it never degenerates to a cross join. */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
    Temporal.rangeCountJoin(errors, clicks, "event_id", "ts", "ts", 60L, 60L)
  }
  private val q47Sql =
    """WITH e AS (SELECT event_id, ts FROM events WHERE event_type='error'),
      |c AS (SELECT ts FROM events WHERE event_type='click')
      |SELECT e.event_id, e.ts, count(c.ts) AS n_matches
      |FROM e LEFT JOIN c
      |  ON c.ts >= e.ts - INTERVAL 60 SECONDS AND c.ts <= e.ts + INTERVAL 60 SECONDS
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- q58
  /** q46 with bounded staleness: a click only attributes to a purchase
    * within the last hour (pandas merge_asof `tolerance`). The oracle
    * runs the same ASOF join and nulls stale matches with CASE — the
    * engine folds the same predicate into the carry projection. */
  private val TolSec = 3600L
  private def q58(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val w = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(col("event_id").desc)
    val purchases = ev.filter(col("event_type") === "purchase")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    Temporal.asOfJoin(clicks, purchases, "user_id", "ts", "ts",
      Seq("event_id", "value"), "p_", toleranceSec = Some(TolSec))
  }
  private val q58Sql =
    s"""WITH p AS (
       |  SELECT user_id, ts, event_id, value FROM events WHERE event_type='purchase'
       |  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1),
       |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type='click')
       |SELECT c.event_id, c.user_id, c.ts,
       |  CASE WHEN c.ts - p.ts <= INTERVAL $TolSec SECONDS THEN p.event_id END AS p_event_id,
       |  CASE WHEN c.ts - p.ts <= INTERVAL $TolSec SECONDS THEN p.value END AS p_value,
       |  CASE WHEN c.ts - p.ts <= INTERVAL $TolSec SECONDS THEN p.ts END AS p_ts
       |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND p.ts <= c.ts""".stripMargin

  val queries: Map[String, Q] = Map(
    "q46_asof_join" -> q46 _,
    "q47_range_join" -> q47 _,
    "q58_asof_tolerance" -> q58 _)

  val oracles: Map[String, String] = Map(
    "q46_asof_join" -> q46Sql,
    "q47_range_join" -> q47Sql,
    "q58_asof_tolerance" -> q58Sql)
}
