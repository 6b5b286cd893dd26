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

  // --------------------------------------------------------- q25
  /** A9 diff refresh: old vs new snapshot → upsert/delete actions via
    * the engine's DiffRefresher (anti-joins on (id, xxhash64(doc))).
    * New snapshot deterministically drops custkey%10==0 (→ deletes) and
    * rewrites the segment of custkey%7==0 (→ changed-doc upserts); the
    * oracle states the expected action set relationally. */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    def snap(df: DataFrame, seg: org.apache.spark.sql.Column): DataFrame =
      df.select(concat(lit("c-"), col("c_custkey")).as("id"),
        to_json(struct(col("c_name").as("name"), seg.as("segment"))).as("doc"))
    val oldSnap = snap(cust, col("c_mktsegment"))
    val newSnap = snap(
      cust.filter(col("c_custkey") % 10 =!= 0),
      when(col("c_custkey") % 7 === 0, lit("CHANGED"))
        .otherwise(col("c_mktsegment")))
    graft.refresh.DiffRefresher.diff(oldSnap, newSnap)
      .select(col("op"), col("id"),
        get_json_object(col("doc"), "$.name").as("doc_name"))
  }
  private val q25Sql =
    """SELECT 'index' AS op, 'c-' || CAST(c_custkey AS VARCHAR) AS id, c_name AS doc_name
      |FROM customer WHERE c_custkey % 10 <> 0 AND c_custkey % 7 = 0
      |UNION ALL
      |SELECT 'delete' AS op, 'c-' || CAST(c_custkey AS VARCHAR) AS id, NULL AS doc_name
      |FROM customer WHERE c_custkey % 10 = 0""".stripMargin

  val queries: Map[String, Q] = Map(
    "q24_cdc_decode" -> q24 _,
    "q25_snapshot_diff" -> q25 _)

  val oracles: Map[String, String] = Map(
    "q24_cdc_decode" -> q24Sql,
    "q25_snapshot_diff" -> q25Sql)
}
