package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cdc.WalDecoder
import graft.core.Tables

/** CORRECTNESS-gate queries that exercise the pipeline engine's own
  * operators (SURVEY §2A) as batch dataflows over the driver's tables,
  * so the DuckDB oracle can validate them. */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  // --------------------------------------------------------- q24
  /** A2/A3 CDC decode: synthesize test_decoding WAL lines from customer
    * rows, then decode them with the engine's SLOT_RE-equivalent
    * (reference: src/sinker/bulk_action_generator.py:15-19,39-45).
    * Per-row regexp_extract — codegen'd, shuffle-free, scale-safe. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val wal = Tables.customer(s, dir).select(
      col("c_custkey").cast("long").as("xid"),
      concat(lit("0/"), col("c_custkey")).as("lsn"),
      concat(
        lit("table public.customer: INSERT: id[text]:'c-"), col("c_custkey"),
        lit("' doc[json]:'{\"name\": \""), col("c_name"), lit("\"}'"))
        .as("data"))
    WalDecoder.decodeDf(wal).select(
      col("schema").as("schema_name"),
      col("table").as("table_name"),
      col("op"),
      col("id"),
      get_json_object(col("doc"), "$.name").as("doc_name"))
  }
  // The oracle rebuilds the same WAL text and re-extracts with DuckDB's
  // RE2 regexp_extract — same groups, same pattern.
  private val q24Sql = {
    val pat = WalDecoder.SlotPattern.replace("'", "''")
    s"""WITH wal AS (
       |  SELECT 'table public.customer: INSERT: id[text]:''c-' || c_custkey ||
       |         ''' doc[json]:''{"name": "' || c_name || '"}''' AS data
       |  FROM customer
       |)
       |SELECT regexp_extract(data, '$pat', 1) AS schema_name,
       |       regexp_extract(data, '$pat', 2) AS table_name,
       |       regexp_extract(data, '$pat', 3) AS op,
       |       regexp_extract(data, '$pat', 4) AS id,
       |       json_extract_string(replace(split_part(data, 'doc[json]:', 2), '''', ''), '$$.name') AS doc_name
       |FROM wal""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q24_cdc_decode" -> q24 _)

  val oracles: Map[String, String] = Map(
    "q24_cdc_decode" -> q24Sql)
}
