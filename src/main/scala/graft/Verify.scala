package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. A failed query
  * leaves a `<name>._error` marker and an entry in errors.json — a
  * swallowed failure would otherwise simply VANISH from the driver's
  * CORRECTNESS file (it compares only queries that wrote parquet), which
  * is how round 7's 28-query breakage masqueraded as all-green. */
object Verify {

  /** Runs every query, dumps results + oracle SQL + error summary under
    * `outDir`. Factored out of main so the output layout (including the
    * failure path) is unit-testable without stopping the shared session.
    * Returns the failed-query map (name → message). */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => DataFrame],
      oracleSql: Map[String, String]): Map[String, String] = {
    new java.io.File(outDir).mkdirs()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
        System.err.println(s"[verify] $name failed: $msg")
        errors(name) = msg
        Files.writeString(Paths.get(s"$outDir/$name._error"), msg)
      }
      // queries that persist intermediates (LSH band keys) would pin
      // them for the whole session otherwise
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Summary of failed queries (empty object when all ran) so the driver
    // can record `err` rows instead of silently omitting broken queries.
    val errJson = errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} queries FAILED: ${errors.keys.mkString(", ")}")
    errors.toMap
  }

  /** args: sfDir outDir [comma-separated query-name filter]. The filter
    * is a local-iteration convenience (tools/check.py on a subset); the
    * driver always runs the full surface. */
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val keep: Map[String, (SparkSession, String) => DataFrame] =
      if (args.length > 2) {
        val names = args(2).split(",").toSet
        SparkEntry.queries.view.filterKeys(names).toMap
      } else SparkEntry.queries
    val spark = graft.core.GraftSession.get()
    run(spark, sfDir, outDir, keep,
      SparkEntry.oracleSql.view.filterKeys(keep.keySet).toMap)
    spark.stop()
  }
}
