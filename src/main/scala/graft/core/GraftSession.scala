package graft.core

import org.apache.spark.sql.SparkSession

/** Single place where engine-level SparkSession settings live.
  *
  * All entry points (Verify, Bench, tests, the runner) build their session
  * through here so behavior-affecting confs are consistent:
  *
  *  - `spark.sql.caseSensitive=true` — the reference's view SQL uses quoted
  *    mixed-case identifiers ("EmailAddress", "personId"; reference:
  *    tests/test_parse_schema_tables.py:10) whose fidelity requires
  *    case-sensitive resolution (SURVEY §2B B18).
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` — the driver's
  *    events.parquet carries TIMESTAMP(NANOS); set once at build time
  *    instead of mutating session state inside a reader (order-dependent
  *    side effect under concurrent queries).
  *  - shuffle partitions sized for the local[32] harness; a real cluster
  *    deployment overrides via spark-submit conf, and AQE coalesces
  *    post-shuffle partitions either way.
  */
object GraftSession {
  def builder(cores: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.caseSensitive", "true")
      // Postgres-style "quoted identifiers" in user view SQL (B18);
      // single-quoted strings stay literals.
      .config("spark.sql.ansi.doubleQuotedIdentifiers", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")

  /** Default session for mains: core count from SPARK_GRAFT_CPUS. */
  def get(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
