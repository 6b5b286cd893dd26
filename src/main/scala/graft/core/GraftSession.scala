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
      // Let AQE rewrite a planned sort-merge join to a shuffled hash
      // join when EVERY post-shuffle partition of the build side is
      // under this many bytes (default 0 = never). Unlike a static
      // preferSortMergeJoin=false this decision is made from RUNTIME
      // partition sizes, so it is scale-adaptive by construction: the
      // many key-bounded joins of the dedup/verify/index read paths
      // skip their sorts, while a genuinely large join (any partition
      // ≥ 64 MB — the realistic case at cluster scale) keeps
      // sort-merge's graceful spill. Measured at sf0.1: −8–15 % across
      // the join-heavy gate families, no regressions (OPTIMIZATION_r19).
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        "67108864")
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
