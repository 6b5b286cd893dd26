package graft.core

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Storage-drift regression: the driver regenerates /root/testdata between
  * rounds and has already shipped `events.ts` in two physical encodings
  * (TIMESTAMP(NANOS) surfaced as long under the legacy flag, then
  * TIMESTAMP(MICROS)/NTZ). Round 7 lost 28 queries to a loader hard-coded
  * to the first encoding; this spec is the build-time alarm that would
  * have caught it — it opens every real testdata table through [[Tables]]
  * AND exercises each `ts` encoding arm against synthesized fixtures.
  */
class TablesDriftSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("every testdata table opens through Tables and is non-empty") {
    Tables.names.foreach { n =>
      val df = Tables.table(spark, sf, n)
      withClue(s"table $n: ") { df.limit(1).count() shouldBe 1L }
    }
  }

  test("events.ts surfaces as session TimestampType whatever the parquet encoding") {
    val df = Tables.events(spark, sf)
    df.schema("ts").dataType shouldBe TimestampType
    // analysis must succeed for a temporal expression — the exact failure
    // mode of round 7 was DATATYPE_MISMATCH at analysis time
    df.select(window(col("ts"), "1 hour")).limit(1).count() shouldBe 1L
  }

  test("loader adapts: long-nanos encoding converts, micros instant is preserved") {
    // 2024-03-01T12:34:56.789012Z as epoch values
    val micros = 1709296496789012L
    val dir = Files.createTempDirectory("events_nanos").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    // Legacy arm: ts physically a long holding NANOSECONDS — what
    // nanosAsLong=true surfaces for TIMESTAMP(NANOS) parquet.
    spark.range(1).select(
        lit(micros * 1000L).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val legacy = Tables.events(spark, path)
    legacy.schema("ts").dataType shouldBe TimestampType
    val got = legacy.select(unix_micros(col("ts"))).head().getLong(0)
    got shouldBe micros

    // NTZ arm: ts written as TIMESTAMP_NTZ — what a plain pyarrow
    // timestamp[us] column (isAdjustedToUTC=false) surfaces as.
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val ntz = Tables.events(spark, path)
    ntz.schema("ts").dataType shouldBe TimestampType
    // session tz is UTC (GraftSession) so the NTZ→TZ cast is value-identical
    ntz.select(unix_micros(col("ts"))).head().getLong(0) shouldBe micros

    // TZ arm: ts written as plain TimestampType (isAdjustedToUTC=true)
    // passes through untouched.
    spark.range(1).select(
        timestamp_micros(lit(micros)).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val tz = Tables.events(spark, path)
    tz.schema("ts").dataType shouldBe TimestampType
    tz.select(unix_micros(col("ts"))).head().getLong(0) shouldBe micros
  }

  test("NTZ arm preserves the instant in a NON-UTC session (no silent shift)") {
    // an embedding application's own session may run in a local zone; a
    // bare NTZ→TZ cast would shift every event by the zone offset there
    val micros = 1709296496789012L
    val dir = Files.createTempDirectory("events_tz").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      val got = Tables.events(spark, path)
        .select(unix_micros(col("ts"))).head().getLong(0)
      got shouldBe micros
    } finally spark.conf.set(tzKey, saved)
  }

  test("loader rejects an unconvertible ts encoding loudly") {
    val dir = Files.createTempDirectory("events_bad").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath
    spark.range(1).select(lit("2024-01-01").as("ts"), lit(1L).as("event_id"))
      .write.mode("overwrite").parquet(s"$path/events.parquet")
    an[IllegalStateException] should be thrownBy Tables.events(spark, path)
  }
}
