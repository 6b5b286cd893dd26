package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit semantics for the temporal joins: the as-of carry (inclusive
  * ties, null when nothing precedes, latest-of-many wins) and the
  * bucketed range join checked against a brute-force cross join —
  * including rows that straddle bucket boundaries, the case the
  * bucketing must not double-count or drop. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin: latest preceding right row, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // before any right row
      (2L, 10L, ts("2024-01-01 12:00:00")), // equals a right ts (inclusive)
      (3L, 10L, ts("2024-01-01 15:00:00")), // after two right rows
      (4L, 99L, ts("2024-01-01 15:00:00"))  // key with no right rows
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 12:00:00"), 100L, 1.0),
      (10L, ts("2024-01-01 13:00:00"), 101L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")

    val out = Temporal.asOfJoin(left, right, "user_id", "ts", "ts",
        Seq("event_id", "value"), "p_")
      .orderBy("event_id")
      .collect()

    out.map(_.getLong(0)) shouldBe Array(1L, 2L, 3L, 4L)
    out(0).isNullAt(3) shouldBe true               // nothing precedes
    out(1).getLong(3) shouldBe 100L                // tie matches (<=)
    out(2).getLong(3) shouldBe 101L                // latest of two wins
    out(2).getDouble(4) shouldBe 2.0
    out(2).getTimestamp(5) shouldBe ts("2024-01-01 13:00:00")
    out(3).isNullAt(3) shouldBe true               // unmatched key
  }

  test("asOfJoin tolerance nulls stale matches, keeps fresh ones") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 12:30:00")), // 30 min after a purchase: fresh
      (2L, 10L, ts("2024-01-01 14:30:00")), // 90 min after the latest: stale
      (3L, 99L, ts("2024-01-01 14:30:00"))  // no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, ts("2024-01-01 12:00:00"), 100L, 1.0),
      (10L, ts("2024-01-01 13:00:00"), 101L, 2.0)
    ).toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.asOfJoin(left, right, "user_id", "ts", "ts",
        Seq("event_id", "value"), "p_", toleranceSec = Some(3600L))
      .orderBy("event_id").collect()
    out(0).getLong(3) shouldBe 100L     // within the hour
    out(1).isNullAt(3) shouldBe true    // carried match too old: nulled
    out(1).isNullAt(4) shouldBe true
    out(1).isNullAt(5) shouldBe true    // matched ts nulled too
    out(2).isNullAt(3) shouldBe true    // no match stays no match

    // numeric timestamp columns: tolerance in the column's own units
    val ln = Seq((1L, 1L, 100L), (2L, 1L, 250L)).toDF("id", "k", "t")
    val rn = Seq((1L, 90L, 7L)).toDF("k", "t", "v")
    val outN = Temporal.asOfJoin(ln, rn, "k", "t", "t", Seq("v"), "r_",
        toleranceSec = Some(50L))
      .orderBy("id").collect()
    outN(0).getLong(3) shouldBe 7L      // 100-90=10 <= 50
    outN(1).isNullAt(3) shouldBe true   // 250-90=160 > 50
  }

  test("asOfJoin matches the brute-force argmax on random data") {
    val n = 300
    val left = (1 to n).map(i =>
        (i.toLong, (i % 7).toLong, new Timestamp(1700000000000L + i * 7919L % 100000 * 1000L)))
      .toDF("event_id", "user_id", "ts")
    val right = (1 to n).map(i =>
        ((i % 7).toLong, new Timestamp(1700000000000L + i * 104729L % 100000 * 1000L), i.toLong, i * 1.5))
      .toDF("user_id", "ts", "event_id", "value")
      // unique (key, ts): keep max event_id, like the q46 discipline
      .groupBy("user_id", "ts")
      .agg(max(struct(col("event_id"), col("value"))).as("s"))
      .select(col("user_id"), col("ts"),
        col("s.event_id").as("event_id"), col("s.value").as("value"))

    val fast = Temporal.asOfJoin(left, right, "user_id", "ts", "ts",
      Seq("event_id", "value"), "p_")

    val brute = left.as("l")
      .join(right.as("r"),
        col("l.user_id") === col("r.user_id") && col("r.ts") <= col("l.ts"),
        "left_outer")
      .groupBy(col("l.event_id").as("event_id"), col("l.user_id").as("user_id"),
        col("l.ts").as("ts"))
      .agg(max(struct(col("r.ts"), col("r.event_id"), col("r.value"))).as("m"))
      .select(col("event_id"), col("user_id"), col("ts"),
        col("m.event_id").as("p_event_id"), col("m.value").as("p_value"),
        col("m.ts").as("p_ts"))

    fast.exceptAll(brute).count() shouldBe 0
    brute.exceptAll(fast).count() shouldBe 0
  }

  test("rangeCountJoin matches the brute-force cross join across bucket boundaries") {
    val base = 1700000000000000L // µs
    // left rows land near bucket edges for width 120s
    val left = Seq(1L, 2L, 3L, 4L, 5L).map(i =>
        (i, new Timestamp((base + i * 119000000L + i) / 1000)))
      .toDF("event_id", "ts")
    val right = (0 until 500).map(i =>
        Tuple1(new Timestamp((base + i.toLong * 1234567L) / 1000)))
      .toDF("ts")

    val fast = Temporal.rangeCountJoin(left, right, "event_id", "ts", "ts", 60L, 60L)

    val brute = left.crossJoin(right.select(col("ts").as("rts")))
      .groupBy("event_id")
      .agg(
        first(col("ts")).as("ts"),
        count(when(
          unix_micros(col("rts")).between(
            unix_micros(col("ts")) - 60000000L,
            unix_micros(col("ts")) + 60000000L), 1)).as("n_matches"))

    fast.exceptAll(brute).count() shouldBe 0
    brute.exceptAll(fast).count() shouldBe 0
  }

  test("sweepMaxConcurrent: overlap counted, touching intervals are not") {
    // key A: [0,10) [5,15) [10,20) — peak 2 ([5,10) holds two; the
    // interval ending at 10 does NOT overlap the one starting at 10)
    // key B: three copies of [0,5) — peak 3
    // key C: [0,1) [2,3) — disjoint, peak 1
    val iv = Seq(
      ("A", 0L, 10L), ("A", 5L, 15L), ("A", 10L, 20L),
      ("B", 0L, 5L), ("B", 0L, 5L), ("B", 0L, 5L),
      ("C", 0L, 1L), ("C", 2L, 3L))
      .toDF("k", "s", "e")
    val got = Temporal.sweepMaxConcurrent(iv, "k", "s", "e")
      .as[(String, Long)].collect().toMap
    got shouldBe Map("A" -> 2L, "B" -> 3L, "C" -> 1L)
  }

  test("sweepCoverage: overlapping intervals count once, gaps excluded") {
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // A: [0,10) ∪ [5,15) ∪ [20,25) -> 15 + 5 = 20 s
    // B: [0,5) three times -> 5 s
    // C: [0,1), [1,2) touching -> 2 s (no double count, no gap)
    val iv = Seq(
      ("A", ts(0), ts(10)), ("A", ts(5), ts(15)), ("A", ts(20), ts(25)),
      ("B", ts(0), ts(5)), ("B", ts(0), ts(5)), ("B", ts(0), ts(5)),
      ("C", ts(0), ts(1)), ("C", ts(1), ts(2)))
      .toDF("k", "s", "e")
    val got = Temporal.sweepCoverage(iv, "k", "s", "e")
      .as[(String, Long)].collect().toMap
    got shouldBe Map(
      "A" -> 20000000L, "B" -> 5000000L, "C" -> 2000000L)
  }

  test("intervalOverlapJoin matches the brute-force overlap join") {
    def t(sec: Long) = new Timestamp(sec * 1000L)
    val rnd = new scala.util.Random(7)
    val left = (1 to 200).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong % 5, i.toLong, t(s), t(s + 1 + rnd.nextInt(600)))
    }.toDF("k", "lid", "ls", "le")
    val right = (1 to 200).map { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong % 5, i.toLong, t(s), t(s + 1 + rnd.nextInt(120)))
    }.toDF("k", "rid", "rs", "re")
    val fast = Temporal.intervalOverlapJoin(left, right, "k",
        "lid", "ls", "le", "rid", "rs", "re", maxRightSpanSec = 120L)
      .select("k", "lid", "rid", "overlap_us")
    val brute = left.join(right.withColumnRenamed("k", "k2"),
        col("k") === col("k2") && col("ls") < col("re") && col("rs") < col("le"))
      .select(col("k"), col("lid"), col("rid"),
        (unix_micros(least(col("le"), col("re"))) -
          unix_micros(greatest(col("ls"), col("rs")))).as("overlap_us"))
    fast.exceptAll(brute).count() shouldBe 0
    brute.exceptAll(fast).count() shouldBe 0
    fast.count() should be > 0L
    // span-contract violations fail loudly, not silently
    val bad = Seq((1L, 1L, t(0), t(500))).toDF("k", "rid", "rs", "re")
    val e = intercept[Exception] {
      Temporal.intervalOverlapJoin(left, bad, "k",
        "lid", "ls", "le", "rid", "rs", "re", maxRightSpanSec = 120L).count()
    }
    e.getMessage should include("maxRightSpanSec")
  }

  test("rollingActiveUsers: window counts each user once, observed days only") {
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 09:00:00")
    val ev = Seq(
      (1L, ts(1)), (1L, ts(2)),   // u1 active days 1,2
      (2L, ts(1)),                // u2 day 1
      (3L, ts(10)))               // u3 far later: day 10 window excludes 1-2
      .toDF("user_id", "ts")
    val got = Temporal.rollingActiveUsers(ev, "user_id", "ts", windowDays = 7)
      .as[(Timestamp, Long)].collect()
      .map { case (d, n) => (d.toString.take(10), n) }.toMap
    // observed days only: 1, 2, 10
    got shouldBe Map(
      "2024-01-01" -> 2L,  // u1, u2
      "2024-01-02" -> 2L,  // u1 (counted once despite 2 active days), u2 within window
      "2024-01-10" -> 1L)  // only u3
  }

  test("cohortRetention: first-day cohorts with distinct-user cells") {
    def ts(day: Int, hour: Int) =
      Timestamp.valueOf(f"2024-01-${day}%02d $hour%02d:00:00")
    val ev = Seq(
      (1L, ts(1, 9)), (1L, ts(1, 17)), (1L, ts(3, 9)),   // u1: day0, day2
      (2L, ts(1, 12)),                                    // u2: day0 only
      (3L, ts(2, 8)), (3L, ts(3, 8)))                     // u3: cohort day2, k0+k1
      .toDF("user_id", "ts")
    val got = Temporal.cohortRetention(ev, "user_id", "ts")
      .as[(Timestamp, Long, Long)].collect()
      .map { case (d, k, n) => (d.toString.take(10), k, n) }.toSet
    got shouldBe Set(
      ("2024-01-01", 0L, 2L), ("2024-01-01", 2L, 1L),
      ("2024-01-02", 0L, 1L), ("2024-01-02", 1L, 1L))
  }

  test("countAnomaly: hand-computed z, nulls below minPrev and at zero variance") {
    def ts(day: Int, i: Int) =
      Timestamp.valueOf(f"2024-01-${day}%02d 00:${i / 60}%02d:${i % 60}%02d")
    // daily counts for key "a": 10, 10, 16, 4
    val ev = (
      (0 until 10).map(i => ("a", ts(1, i))) ++
      (0 until 10).map(i => ("a", ts(2, i))) ++
      (0 until 16).map(i => ("a", ts(3, i))) ++
      (0 until 4).map(i => ("a", ts(4, i)))).toDF("k", "ts")
    val got = Temporal.countAnomaly(ev, "k", "ts", trailing = 7, minPrev = 2)
      .as[(String, Timestamp, Long, Option[Double])].collect()
      .map { case (_, d, c, z) => (d.toString.take(10), c, z) }.toSet
    // day1: no history; day2: one point (< minPrev); day3: prev {10,10}
    // has zero variance; day4: prev {10,10,16} -> mean 12, sample
    // var (456-432)/2 = 12 -> z = (4-12)/sqrt(12) = -2.309401
    got shouldBe Set(
      ("2024-01-01", 10L, None),
      ("2024-01-02", 10L, None),
      ("2024-01-03", 16L, None),
      ("2024-01-04", 4L, Some(-2.309401)))
  }
}
