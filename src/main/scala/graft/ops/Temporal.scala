package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively, re-expressed in the
  * shapes that survive 100 TB:
  *
  *  - [[asOfJoin]] — "latest right row at or before each left row" per
  *    key. The naive formulation is a range join + per-row argmax
  *    (quadratic within key); this one is the union-and-carry trick:
  *    tag both sides, union, ONE window partitioned by key carries the
  *    latest right payload forward — a single shuffle on the key,
  *    linear work, no pair blow-up regardless of how many right rows
  *    precede a left row.
  *
  *  - [[rangeCountJoin]] — "right rows within [ts−before, ts+after] of
  *    each left row" with NO equi key. The naive form is a cross join
  *    with a range filter; here time is quantized into buckets at least
  *    as wide as the window span, the left side explodes to the (≤ 2)
  *    buckets its interval covers, the right side keeps its single home
  *    bucket, and the join is an equi-join on the bucket with the exact
  *    range predicate as a residual filter. Each right row lives in
  *    exactly one bucket, so no post-join dedup is needed. Work scales
  *    with true temporal locality (rows per bucket), never |L|×|R|.
  */
object Temporal {

  /** As-of join: for every left row, the latest right row of the same
    * `key` with `right.rightTs <= left.leftTs` (inclusive — ties on the
    * timestamp match, like DuckDB's `ASOF JOIN ... ON r.ts <= l.ts`).
    * Left rows with no preceding right row survive with nulls (left
    * outer semantics).
    *
    * Right rows should be unique per (key, rightTs); with duplicates
    * the greatest payload struct wins deterministically (DuckDB leaves
    * that tie unspecified — dedup first when oracle-matching).
    *
    * `toleranceSec` bounds staleness (pandas `merge_asof` tolerance): a
    * carried match older than the tolerance is nulled out, so a left
    * row only attributes to a right row within the window. For
    * TIMESTAMP columns the unit is seconds; for numeric timestamp
    * columns it's the column's own unit. Costs one more projection —
    * the shuffle shape is unchanged.
    *
    * Output: every left column, then `rightVals` renamed with `prefix`,
    * then the matched right timestamp as `<prefix><rightTs>`.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, rightVals: Seq[String],
      prefix: String = "r_", toleranceSec: Option[Long] = None): DataFrame = {
    val reserved = Set("__key", "__ts", "__side", "__r", "__l", "__match")
    require(!(left.columns ++ right.columns).exists(reserved),
      s"asOfJoin inputs must not use reserved columns ${reserved.mkString(", ")}")
    val leftCols = left.columns.toSeq
    val rPayloadCols = rightTs +: rightVals
    val rPayloadType = right
      .select(struct(rPayloadCols.map(col): _*).as("p")).schema("p").dataType
    val lPayloadType = left
      .select(struct(leftCols.map(col): _*).as("p")).schema("p").dataType
    val rSide = right.select(
      col(key).as("__key"),
      col(rightTs).as("__ts"),
      lit(0).as("__side"),
      struct(rPayloadCols.map(col): _*).as("__r"),
      lit(null).cast(lPayloadType).as("__l"))
    val lSide = left.select(
      col(key).as("__key"),
      col(leftTs).as("__ts"),
      lit(1).as("__side"),
      lit(null).cast(rPayloadType).as("__r"),
      struct(leftCols.map(col): _*).as("__l"))
    // right rows sort before left rows at the same timestamp so the
    // carry is inclusive; __r last so duplicate right timestamps break
    // ties deterministically (greatest payload)
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedAll = rSide.unionByName(lSide)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val carried = toleranceSec match {
      case None => carriedAll
      case Some(tol) =>
        val isTimestamp = left.schema(leftTs).dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType => true
          case _ => false
        }
        val matchTs = col("__match").getField(rightTs)
        val fresh =
          if (isTimestamp)
            unix_micros(col("__ts")) - unix_micros(matchTs) <= tol * 1000000L
          else col("__ts") - matchTs <= tol
        carriedAll.withColumn("__match",
          when(col("__match").isNotNull && fresh, col("__match")))
    }
    val outLeft = leftCols.map(c => col("__l").getField(c).as(c))
    val outRight = rightVals.map(c => col("__match").getField(c).as(s"$prefix$c")) :+
      col("__match").getField(rightTs).as(s"$prefix$rightTs")
    carried.select(outLeft ++ outRight: _*)
  }

  /** Keyless time-range count join: for each left row, the number of
    * right rows with `rightTs` in `[leftTs − beforeSec, leftTs +
    * afterSec]`. Bucket width = the window span (so a left interval
    * covers at most 2 buckets); the bucket equi-join carries the exact
    * range predicate as a residual, and left-outer semantics keep
    * zero-match left rows. `leftId` must be unique per left row.
    *
    * Output: (leftId, leftTs, n_matches).
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, leftId: String,
      leftTs: String, rightTs: String,
      beforeSec: Long, afterSec: Long): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && beforeSec + afterSec > 0,
      "rangeCountJoin needs a non-empty window")
    val bucketUs = (beforeSec + afterSec) * 1000000L
    // bucket key = the bucket's start microsecond (x − x mod width):
    // pure integer arithmetic, no float division at any timestamp
    def bucketOf(c: Column): Column = c - pmod(c, lit(bucketUs))
    val l = left.select(col(leftId), col(leftTs).as("__lts"),
        unix_micros(col(leftTs)).as("__lus"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__lus") - lit(beforeSec * 1000000L)),
        bucketOf(col("__lus") + lit(afterSec * 1000000L)),
        lit(bucketUs))))
    val r = right.select(unix_micros(col(rightTs)).as("__rus"))
      .withColumn("__bucket", bucketOf(col("__rus")))
    l.join(r,
        l("__bucket") === r("__bucket") &&
          col("__rus") >= col("__lus") - lit(beforeSec * 1000000L) &&
          col("__rus") <= col("__lus") + lit(afterSec * 1000000L),
        "left_outer")
      .groupBy(col(leftId))
      .agg(first(col("__lts")).as(leftTs),
        count(col("__rus")).as("n_matches"))
  }

  /** Keyed INTERVAL-OVERLAP join: pairs of left/right rows of the same
    * `key` whose half-open intervals `[ls, le)` and `[rs, re)` overlap
    * (`ls < re AND rs < le`) — attribution windows, ad-session overlap,
    * conflict detection. The naive form is a range join (quadratic per
    * key); here right intervals are bounded by `maxRightSpanSec` and
    * anchored at their START's time bucket (width = the span bound),
    * the left side explodes to the buckets where an overlapping right
    * START can live (`[ls − span, le]`), and the exact overlap
    * predicate rides as a residual on the `(key, bucket)` equi-join.
    * Each right row lives in exactly ONE bucket, so no post-join dedup.
    * The span contract is enforced per row with a codegen'd
    * `assert_true` — a violating right row fails the job loudly instead
    * of silently losing matches.
    *
    * Work ∝ rows per (key, bucket) — true temporal locality — never
    * |L|×|R|; left explode factor is `(left span / span bound) + 2`.
    * Output: (key, leftId, rightId, overlap_us). */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftStart: String, leftEnd: String,
      rightId: String, rightStart: String, rightEnd: String,
      maxRightSpanSec: Long): DataFrame = {
    require(maxRightSpanSec > 0, "maxRightSpanSec must be positive")
    val w = maxRightSpanSec * 1000000L
    def bucketOf(c: Column): Column = c - pmod(c, lit(w))
    val l = left.select(col(key), col(leftId),
        unix_micros(col(leftStart)).as("__ls"),
        unix_micros(col(leftEnd)).as("__le"))
      .withColumn("__bucket", explode(sequence(
        bucketOf(col("__ls") - lit(w)), bucketOf(col("__le")), lit(w))))
    val r = right.select(col(key).as("__rkey"), col(rightId),
        unix_micros(col(rightStart)).as("__rs"),
        unix_micros(col(rightEnd)).as("__re"))
      // filter on assert_true (null on success → isNull keeps the row):
      // an unused projected column would be PRUNED and never evaluated
      .filter(assert_true(col("__re") - col("__rs") <= w,
        lit(s"intervalOverlapJoin: right interval exceeds maxRightSpanSec=$maxRightSpanSec"))
        .isNull)
      .withColumn("__bucket", bucketOf(col("__rs")))
    l.join(r,
        col(key) === col("__rkey") && l("__bucket") === r("__bucket") &&
          col("__ls") < col("__re") && col("__rs") < col("__le"))
      .select(col(key), col(leftId), col(rightId),
        (least(col("__le"), col("__re")) -
          greatest(col("__ls"), col("__rs"))).as("overlap_us"))
  }

  /** Rolling `windowDays`-day distinct actives per observed day — the
    * WAU/MAU-style engagement series. Windowed COUNT DISTINCT doesn't
    * fit a frame-based window function at scale; the scale shape is the
    * contribution explode: each distinct (user, day) activity
    * contributes to the `windowDays` window-end days it can count
    * toward, then one distinct-count per day. Explode factor =
    * `windowDays` over the (already day-deduped) activity table —
    * bounded and small, and the output is bounded by the day horizon.
    * Only days observed in the data are emitted. Output: (day — the
    * day-truncated TIMESTAMP — n_active). */
  def rollingActiveUsers(df: DataFrame, idCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    val act = df.select(col(idCol).as("uid"),
      date_trunc("day", col(tsCol)).as("d")).distinct()
    val days = act.select(col("d").as("day")).distinct()
    val contrib = act.withColumn("day", explode(sequence(
      col("d"), col("d") + expr(s"INTERVAL ${windowDays - 1} DAYS"),
      expr("INTERVAL 1 DAY"))))
    contrib.join(days, Seq("day"))
      .groupBy(col("day"))
      .agg(count_distinct(col("uid")).as("n_active"))
  }

  /** Peak number of concurrently-open intervals per `key` — the
    * sweep-line classic (capacity planning, session-overlap audits,
    * rate-limit sizing). Each interval `[start, end)` contributes a +1
    * point at `start` and a −1 at `end`; one running sum per key over
    * the time-ordered points is the live-interval count, and its max is
    * the peak. Half-open semantics: an interval ending exactly when
    * another starts does NOT overlap it (the −1 sorts before the +1 at
    * an equal timestamp).
    *
    * Determinism under ties: rows tied on `(t, delta)` carry EQUAL
    * deltas, so any intra-tie order produces the same multiset of
    * running sums — the per-key max is order-independent even though a
    * ROWS frame over duplicate sort keys is not.
    *
    * Scale shape: a 2× row explode (narrow), then exactly one shuffle
    * (partition by key) and a single window pass — the same cost as any
    * keyed window; never a self-join, never a range join. Output:
    * (key, peak). */
  def sweepMaxConcurrent(df: DataFrame, key: String,
      startCol: String, endCol: String): DataFrame = {
    val pts = df.select(col(key), explode(array(
        struct(col(startCol).as("t"), lit(1).as("delta")),
        struct(col(endCol).as("t"), lit(-1).as("delta")))).as("p"))
      .select(col(key), col("p.t").as("t"), col("p.delta").as("delta"))
    val w = Window.partitionBy(col(key))
      .orderBy(col("t").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("c", sum(col("delta")).over(w))
      .groupBy(col(key))
      .agg(max(col("c")).cast("long").as("peak"))
  }

  /** Total time covered by the UNION of intervals per `key` (uptime /
    * listening-time / coverage accounting — overlaps must count once).
    * Same sweep as [[sweepMaxConcurrent]], read differently: between
    * consecutive sweep points the live count `c` is constant, so the
    * union length is the sum of segment widths where `c > 0`.
    *
    * Deterministic under ties for the same reason as the peak: only the
    * LAST row of a tie group gets a nonzero segment width, and its
    * running sum is the full prefix through that timestamp — invariant
    * to intra-tie order on any engine.
    *
    * `startCol`/`endCol` must be TIMESTAMP columns; the result is exact
    * integer microseconds (`covered_us`) — no second-truncation edge
    * cases between engines. One shuffle, two functions over one window
    * sort. Output: (key, covered_us). */
  def sweepCoverage(df: DataFrame, key: String,
      startCol: String, endCol: String): DataFrame = {
    val pts = df.select(col(key), explode(array(
        struct(col(startCol).as("t"), lit(1).as("delta")),
        struct(col(endCol).as("t"), lit(-1).as("delta")))).as("p"))
      .select(col(key), col("p.t").as("t"), col("p.delta").as("delta"))
    val ord = Window.partitionBy(col(key))
      .orderBy(col("t").asc, col("delta").asc)
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts
      .withColumn("c", sum(col("delta")).over(run))
      .withColumn("nxt", lead(col("t"), 1).over(ord))
      .groupBy(col(key))
      .agg(sum(when(col("c") > 0 && col("nxt").isNotNull,
          unix_micros(col("nxt")) - unix_micros(col("t")))
        .otherwise(0L)).as("covered_us"))
  }

  /** Cohort retention matrix: users bucketed by their FIRST active day,
    * counted per (cohort, days-since-first-activity) cell — the
    * engagement report every event pipeline ships. Two keyed
    * aggregations (distinct activity days, first day per user) and one
    * keyed join; the output is bounded by cohorts × horizon, never by
    * events. Output: (cohort_day — the day-truncated TIMESTAMP, kept a
    * timestamp for engine-portable dtypes — day_k, n_users). */
  def cohortRetention(df: DataFrame, idCol: String, tsCol: String): DataFrame = {
    val act = df.select(col(idCol).as("uid"),
      date_trunc("day", col(tsCol)).as("d")).distinct()
    val coh = act.groupBy(col("uid")).agg(min(col("d")).as("d0"))
    act.join(coh, "uid")
      .groupBy(col("d0").as("cohort_day"),
        datediff(col("d"), col("d0")).cast("long").as("day_k"))
      .agg(count_distinct(col("uid")).as("n_users"))
  }

  /** Trailing-window count-anomaly detection: each (key, day)'s event
    * count z-scored against the `trailing` PRECEDING observed days —
    * the drop/spike monitor every ingest pipeline runs over its own
    * volumes. The frame is ROWS-based over observed days (gaps
    * collapse, which is what volume monitoring wants: "the last 7
    * reports", not calendar positions).
    *
    * Determinism discipline: the window accumulates exact INTEGER
    * moments (n, Σcnt, Σcnt²) — associative, any partial order gives
    * identical bits — and the z-score `(cnt − s/n) / √((ss − s²/n) /
    * (n−1))` (sample std) is ONE double expression over them, rounded
    * once. A naive windowed avg/stddev sums doubles in frame order and
    * is not portable bit-for-bit across engines. Days with fewer than
    * `minPrev` trailing observations, or zero variance, report a null
    * z-score rather than NaN/∞.
    *
    * Scale shape: one keyed aggregation (events → daily counts, output
    * ∝ keys × days) and one keyed window over that small frame — the
    * raw event table never enters a window. Output: (keyCol, day —
    * day-truncated TIMESTAMP, cnt, zscore). */
  def countAnomaly(df: DataFrame, keyCol: String, tsCol: String,
      trailing: Int = 7, minPrev: Int = 2): DataFrame = {
    require(trailing >= 2, s"trailing must be >= 2, got $trailing")
    require(minPrev >= 2, s"minPrev must be >= 2 (a std needs 2 points)")
    val daily = df
      .groupBy(col(keyCol), date_trunc("day", col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val tw = Window.partitionBy(col(keyCol)).orderBy(col("day"))
      .rowsBetween(-trailing, -1)
    daily
      .withColumn("__n", count(col("cnt")).over(tw))
      .withColumn("__s", sum(col("cnt")).over(tw))
      .withColumn("__ss", sum(col("cnt") * col("cnt")).over(tw))
      .select(col(keyCol), col("day"), col("cnt"),
        when(col("__n") >= minPrev &&
            col("__n") * col("__ss") - col("__s") * col("__s") > 0,
          round((col("cnt") - col("__s").cast("double") / col("__n")) /
            sqrt((col("__ss").cast("double") -
              col("__s").cast("double") * col("__s") / col("__n")) /
              (col("__n") - 1)), 6))
          .otherwise(lit(null).cast("double")).as("zscore"))
  }
}
