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

  // --------------------------------------------------------- q95
  /** Peak concurrency per event type ([[Temporal.sweepMaxConcurrent]]):
    * every event opens a 5-minute interval; the sweep-line (+1/−1
    * points, one keyed running sum) finds the max simultaneously-open
    * count — capacity planning without a self-join or range join. The
    * oracle replays the identical sweep in SQL; half-open intervals
    * (−1 sorts before +1 at an equal timestamp) keep the tie semantics
    * engine-independent. */
  private val ConcWindowSec = 300L
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(s, dir).select(col("event_type"),
      col("ts").as("start_ts"),
      (col("ts") + expr(s"INTERVAL $ConcWindowSec SECONDS")).as("end_ts"))
    Temporal.sweepMaxConcurrent(iv, "event_type", "start_ts", "end_ts")
  }
  private val q95Sql =
    s"""WITH pts AS (
       |  SELECT event_type, ts AS t, 1 AS delta FROM events
       |  UNION ALL
       |  SELECT event_type, ts + INTERVAL $ConcWindowSec SECOND AS t, -1 AS delta
       |  FROM events),
       |run AS (SELECT event_type,
       |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
       |      ROWS UNBOUNDED PRECEDING) AS c
       |  FROM pts)
       |SELECT event_type, CAST(MAX(c) AS BIGINT) AS peak
       |FROM run GROUP BY event_type""".stripMargin

  // --------------------------------------------------------- q99
  /** Union-coverage accounting ([[Temporal.sweepCoverage]]): total time
    * covered by the union of each type's 5-minute activity intervals —
    * overlaps count once. Exact integer microseconds; the oracle
    * replays the identical sweep + segment sum. */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    val iv = Tables.events(s, dir).select(col("event_type"),
      col("ts").as("start_ts"),
      (col("ts") + expr(s"INTERVAL $ConcWindowSec SECONDS")).as("end_ts"))
    Temporal.sweepCoverage(iv, "event_type", "start_ts", "end_ts")
  }
  private val q99Sql =
    s"""WITH pts AS (
       |  SELECT event_type, ts AS t, 1 AS delta FROM events
       |  UNION ALL
       |  SELECT event_type, ts + INTERVAL $ConcWindowSec SECOND AS t, -1 AS delta
       |  FROM events),
       |run AS (SELECT event_type, t, delta,
       |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
       |      ROWS UNBOUNDED PRECEDING) AS c,
       |    LEAD(t) OVER (PARTITION BY event_type ORDER BY t, delta) AS nxt
       |  FROM pts)
       |SELECT event_type,
       |  CAST(SUM(CASE WHEN c > 0 AND nxt IS NOT NULL
       |    THEN date_diff('microsecond', t, nxt) ELSE 0 END) AS BIGINT)
       |    AS covered_us
       |FROM run GROUP BY event_type""".stripMargin

  // --------------------------------------------------------- q100
  /** Cohort retention matrix ([[Temporal.cohortRetention]]): users by
    * first active day × days-since-first-activity, distinct-counted.
    * Output bounded by cohorts × horizon, never by event volume. */
  private def q100(s: SparkSession, dir: String): DataFrame =
    Temporal.cohortRetention(Tables.events(s, dir), "user_id", "ts")
  private val q100Sql =
    """WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      |             FROM events),
      |coh AS (SELECT user_id, MIN(d) AS d0 FROM act GROUP BY 1)
      |SELECT d0 AS cohort_day,
      |  CAST(date_diff('day', d0, d) AS BIGINT) AS day_k,
      |  CAST(COUNT(DISTINCT act.user_id) AS BIGINT) AS n_users
      |FROM act JOIN coh ON act.user_id = coh.user_id
      |GROUP BY 1, 2""".stripMargin

  // --------------------------------------------------------- q101
  /** Keyed interval-overlap join ([[Temporal.intervalOverlapJoin]]):
    * click attribution windows (5 min) overlapping purchase windows
    * (2 min) per user. The oracle is the PLAIN overlap join — the
    * bucket rewrite must be semantically invisible, the q87/q94
    * contract applied to range joins. */
  private val RightSpanSec = 120L
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("c_start"),
        (col("ts") + expr(s"INTERVAL $ConcWindowSec SECONDS")).as("c_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("p_start"),
        (col("ts") + expr(s"INTERVAL $RightSpanSec SECONDS")).as("p_end"))
    Temporal.intervalOverlapJoin(clicks, purchases, "user_id",
      "click_id", "c_start", "c_end",
      "purchase_id", "p_start", "p_end", RightSpanSec)
  }
  private val q101Sql =
    s"""WITH c AS (SELECT event_id AS click_id, user_id, ts AS ls,
       |             ts + INTERVAL $ConcWindowSec SECOND AS le
       |           FROM events WHERE event_type = 'click'),
       |p AS (SELECT event_id AS purchase_id, user_id, ts AS rs,
       |        ts + INTERVAL $RightSpanSec SECOND AS re
       |      FROM events WHERE event_type = 'purchase')
       |SELECT c.user_id, click_id, purchase_id,
       |  CAST(date_diff('microsecond', greatest(ls, rs), least(le, re))
       |    AS BIGINT) AS overlap_us
       |FROM c JOIN p ON c.user_id = p.user_id AND ls < re AND rs < le""".stripMargin

  // --------------------------------------------------------- q102
  /** Rolling 7-day distinct actives ([[Temporal.rollingActiveUsers]]):
    * windowed COUNT DISTINCT via the contribution explode (no
    * frame-window distinct exists at scale); the oracle is the direct
    * range-join formulation — the rewrite must match it exactly. */
  private def q102(s: SparkSession, dir: String): DataFrame =
    Temporal.rollingActiveUsers(Tables.events(s, dir), "user_id", "ts", 7)
  private val q102Sql =
    """WITH act AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS d
      |             FROM events),
      |days AS (SELECT DISTINCT d FROM act)
      |SELECT days.d AS day, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
      |FROM days JOIN act a ON a.d BETWEEN days.d - INTERVAL 6 DAY AND days.d
      |GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q124
  /** Trailing-7-day volume anomaly ([[Temporal.countAnomaly]]): each
    * event type's daily count z-scored against its previous 7 observed
    * days — the ingest-drop/spike monitor. Exact integer moments
    * (n, Σ, Σ²) in the window, ONE double expression for z (both
    * engines evaluate the identical tree), null below 2 observations
    * or at zero variance. */
  private def q124(s: SparkSession, dir: String): DataFrame =
    Temporal.countAnomaly(Tables.events(s, dir), "event_type", "ts", 7, 2)
  private val q124Sql =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |w AS (
      |  SELECT event_type, day, cnt,
      |    CAST(COUNT(cnt) OVER tw AS BIGINT) AS n,
      |    CAST(SUM(cnt) OVER tw AS BIGINT) AS s,
      |    CAST(SUM(cnt * cnt) OVER tw AS BIGINT) AS ss
      |  FROM daily
      |  WINDOW tw AS (PARTITION BY event_type ORDER BY day
      |                ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
      |SELECT event_type, day, cnt,
      |  CASE WHEN n >= 2 AND n * ss - s * s > 0
      |    THEN round((cnt - CAST(s AS DOUBLE) / n) /
      |           sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) /
      |                (n - 1)), 6)
      |    ELSE NULL END AS zscore
      |FROM w""".stripMargin

  // --------------------------------------------------------- q155
  /** Exponentially time-decayed per-user activity (recency-weighted
    * engagement, τ = 7 days): score_u = Σ exp(−Δt/τ) over the user's
    * events, anchored at the corpus max timestamp (a 1-row broadcast).
    * Each term rounds to a 1e-9-scaled long BEFORE the sum — long
    * addition is associative, so any partitioning or engine produces
    * identical bits (the q130 scaled-integer discipline); exp's
    * argument is one exact-integer microsecond difference over an
    * exact constant, the same IEEE tree in both engines. One user-keyed
    * aggregation; nothing driver-side. */
  private val DecayTauUs = 7.0 * 86400.0 * 1e6
  private def q155(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val anchor = ev.agg(max(col("ts")).as("tmax"))
    ev.crossJoin(broadcast(anchor))
      .select(col("user_id"),
        round(exp((unix_micros(col("tmax")) - unix_micros(col("ts")))
            .cast("double") / lit(-DecayTauUs)) * lit(1e9), 0)
          .cast("long").as("c"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("sc"))
      .select(col("user_id"), col("n_events"),
        round(col("sc").cast("double") / lit(1e9), 6).as("decay_score"))
  }
  private val q155Sql =
    s"""WITH anchor AS (SELECT max(ts) AS tmax FROM events),
       |c AS (SELECT user_id,
       |    CAST(round(exp(CAST(epoch_us(tmax) - epoch_us(ts) AS DOUBLE)
       |      / ${-DecayTauUs}) * 1e9) AS BIGINT) AS c
       |  FROM events CROSS JOIN anchor)
       |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       |  round(CAST(SUM(c) AS BIGINT)::DOUBLE / 1e9, 6) AS decay_score
       |FROM c GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q157
  /** Per-type inter-event gap profile: count, exact mean, and exact
    * interpolated p50/p90 of the microsecond gaps between consecutive
    * events of the same type — the arrival-process fingerprint an
    * ingest monitor baselines before alerting on it (q124 flags
    * volume anomalies; this profiles cadence). Deterministic lag order
    * is (ts, event_id); gaps are exact BIGINT microseconds, the mean
    * divides two exact integers once, and the percentile pairing
    * (Spark `percentile` ↔ DuckDB `quantile_cont`, both linear
    * interpolation on the sorted set) is the q93-proven one. One keyed
    * window + one keyed aggregation. */
  private def q157(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(col("event_type"),
        (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap_us"))
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap_us")).as("sum_us"),
        expr("percentile(gap_us, 0.5D)").as("p50_us"),
        expr("percentile(gap_us, 0.9D)").as("p90_us"))
      .select(col("event_type"), col("n_gaps"),
        round(col("sum_us").cast("double") / col("n_gaps") / lit(1e6), 6)
          .as("mean_gap_s"),
        round(col("p50_us") / lit(1e6), 6).as("p50_gap_s"),
        round(col("p90_us") / lit(1e6), 6).as("p90_gap_s"))
  }
  private val q157Sql =
    """WITH g AS (
      |  SELECT event_type,
      |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
      |      PARTITION BY event_type ORDER BY ts, event_id)) AS gap_us
      |  FROM events QUALIFY gap_us IS NOT NULL)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |  round(CAST(SUM(gap_us) AS BIGINT)::DOUBLE / COUNT(*) / 1e6, 6)
      |    AS mean_gap_s,
      |  round(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_gap_s,
      |  round(quantile_cont(gap_us, 0.9) / 1e6, 6) AS p90_gap_s
      |FROM g GROUP BY 1""".stripMargin

  // --------------------------------------------------------- q163
  /** Per-type daily burstiness (Fano factor — variance over mean of
    * the daily counts): the dispersion diagnostic next to q124 (flags
    * single-day anomalies) and q157 (profiles gaps) — a Poisson-like
    * ingest sits near 1, batchy/bursty feeds blow past it. Daily
    * counts are exact BIGINTs; n/Σ/Σ² make both moments in one more
    * aggregation, and the Fano value is ONE fixed double expression
    * over exact integers (the q124 z-score discipline). Needs ≥ 2
    * observed days and nonzero mass. */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("cnt")).as("s"),
        sum(col("cnt") * col("cnt")).as("ss"))
      .filter(col("n_days") >= 2 && col("s") > 0)
      .select(col("event_type"), col("n_days"), col("s").as("n_events"),
        round(((col("ss") - col("s").cast("double") * col("s").cast("double") /
          col("n_days")) / (col("n_days") - 1)) /
          (col("s").cast("double") / col("n_days")), 6).as("fano"))
  }
  private val q163Sql =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |        CAST(SUM(cnt) AS BIGINT) AS s,
      |        CAST(SUM(cnt * cnt) AS BIGINT) AS ss
      |      FROM daily GROUP BY 1)
      |SELECT event_type, n_days, s AS n_events,
      |  round(((ss - s::DOUBLE * s::DOUBLE / n_days) / (n_days - 1)) /
      |        (s::DOUBLE / n_days), 6) AS fano
      |FROM m WHERE n_days >= 2 AND s > 0""".stripMargin

  // --------------------------------------------------------- q164
  /** Cross-type user-overlap matrix: Jaccard of the DISTINCT user sets
    * between every pair of event types — the co-engagement diagnostic
    * (do purchasers also click?) and the same inclusion–exclusion
    * shape a cross-dataset contamination check runs on user ids. One
    * distinct pass, one user-keyed self-join that only pairs
    * type_a < type_b, two |types|-sized broadcast joins; Jaccard is
    * one double division over exact integers. */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val sets = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sets.groupBy(col("event_type"))
      .agg(count(lit(1)).as("sz"))
    val inter = sets.select(col("event_type").as("type_a"), col("user_id"))
      .join(sets.select(col("event_type").as("type_b"), col("user_id")),
        Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("sz").as("sz_a"))), Seq("type_a"))
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("sz").as("sz_b"))), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_common"),
        round(col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")), 6).as("jaccard"))
  }
  private val q164Sql =
    """WITH sets AS (SELECT DISTINCT event_type, user_id FROM events),
      |sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS sz
      |          FROM sets GROUP BY 1),
      |inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_common
      |  FROM sets a JOIN sets b ON a.user_id = b.user_id
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n_common,
      |  round(n_common::DOUBLE / (sa.sz + sb.sz - n_common), 6) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.event_type = type_a
      |JOIN sizes sb ON sb.event_type = type_b""".stripMargin

  val queries: Map[String, Q] = Map(
    "q46_asof_join" -> q46 _,
    "q47_range_join" -> q47 _,
    "q58_asof_tolerance" -> q58 _,
    "q95_peak_concurrency" -> q95 _,
    "q99_interval_coverage" -> q99 _,
    "q100_cohort_retention" -> q100 _,
    "q101_interval_overlap" -> q101 _,
    "q102_rolling_actives" -> q102 _,
    "q124_count_anomaly" -> q124 _,
    "q155_decay_activity" -> q155 _,
    "q157_interevent_gaps" -> q157 _,
    "q163_burstiness" -> q163 _,
    "q164_user_overlap" -> q164 _)

  val oracles: Map[String, String] = Map(
    "q46_asof_join" -> q46Sql,
    "q47_range_join" -> q47Sql,
    "q58_asof_tolerance" -> q58Sql,
    "q95_peak_concurrency" -> q95Sql,
    "q99_interval_coverage" -> q99Sql,
    "q100_cohort_retention" -> q100Sql,
    "q101_interval_overlap" -> q101Sql,
    "q102_rolling_actives" -> q102Sql,
    "q124_count_anomaly" -> q124Sql,
    "q155_decay_activity" -> q155Sql,
    "q157_interevent_gaps" -> q157Sql,
    "q163_burstiness" -> q163Sql,
    "q164_user_overlap" -> q164Sql)
}
