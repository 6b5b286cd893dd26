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
    * the session TimestampType — the session timezone is UTC
    * (GraftSession), making the NTZ→TZ cast value-identical and keeping
    * the engine's results aligned with the DuckDB oracle's naive
    * timestamps.
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
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
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
