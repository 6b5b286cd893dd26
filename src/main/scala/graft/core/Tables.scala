package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * Every query in the engine reads through here so that, at cluster scale,
  * swapping the storage layer (path layout, bucketed tables, a catalog)
  * means changing one function. Parquet scans get Catalyst's column
  * pruning + predicate pushdown for free as long as callers keep their
  * filters/selects declarative.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` column has shipped in two physical encodings:
    * TIMESTAMP(NANOS) (surfaced as long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`, set at session build —
    * GraftSession) and TIMESTAMP(MICROS) with isAdjustedToUTC=false
    * (surfaced as TIMESTAMP_NTZ). A loader hard-coded to one encoding
    * breaks every downstream query when the data lake re-encodes, so
    * branch on the schema Spark actually read and normalize both arms to
    * TimestampType holding the instant whose UTC wall clock equals the
    * stored naive value — matching the DuckDB oracle's naive timestamps.
    * The NTZ arm routes through `convert_timezone('UTC', sessionTz, ts)`
    * before the cast so the result is correct in ANY session timezone
    * (a bare NTZ→TZ cast interprets the wall clock in the session zone:
    * identical under GraftSession's UTC, silently shifted by hours in an
    * embedding application's local-zone session — and the nanos arm's
    * `timestamp_micros` is already zone-independent, so the two arms
    * would otherwise disagree exactly when sessions go non-UTC).
    *
    * Nanos arm: floor to microseconds — the same truncation DuckDB/pandas
    * apply when downcasting ns→µs. Integer `div` (not `/`) because
    * ~1.7e18 ns exceeds double precision. */
  private def eventsDf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // idempotent guard for sessions not built via GraftSession (an
    // embedding application's own session): the conf only ever moves
    // false->true and nothing in the engine needs it false, so this is
    // not the order-dependent mutation the round-1 review flagged
    if (!s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"))
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$d/events.parquet")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // CONTRACT: the session timezone must be stable between this
        // load and any action on the returned frame. The zone is read
        // HERE (construction time), but the trailing NTZ→TIMESTAMP
        // cast resolves the session zone at execution — changing
        // spark.sql.session.timeZone in between would shift every
        // instant by the zone delta. GraftSession pins UTC, so this
        // only concerns embedding applications that mutate the conf
        // mid-query; DST-ambiguous wall clocks in non-UTC sessions
        // round-trip per convert_timezone's documented resolution.
        val sessionTz = s.conf.get("spark.sql.session.timeZone",
          java.util.TimeZone.getDefault.getID)
        df.withColumn("ts",
          org.apache.spark.sql.functions.convert_timezone(
            org.apache.spark.sql.functions.lit("UTC"),
            org.apache.spark.sql.functions.lit(sessionTz),
            col("ts")).cast(TimestampType))
      case TimestampType    => df
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet-surfaced type $other (expected LONG nanos, TIMESTAMP, or TIMESTAMP_NTZ)")
    }
  }

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = eventsDf(s, d)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Register all tables as temp views so `spark.sql` text queries work. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => table(spark, dir, n).createOrReplaceTempView(n))
}
