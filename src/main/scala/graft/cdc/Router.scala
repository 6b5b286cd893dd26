package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A4/A5/A6: route decoded change events into sink actions.
  *
  * Reference semantics (src/sinker/bulk_action_generator.py:44-58):
  *   - (table ∈ views→indices) ∧ op=INSERT  → `index` action (full-doc
  *     idempotent upsert by id);
  *   - (table ∈ parentTables→indices) ∧ op=DELETE → `delete` action by
  *     id (MV delete WAL rows carry no id — sinker.py:110-119 — so the
  *     parent table's deletes are the proxy);
  *   - everything else (other tables, MV DELETEs, non-matching WAL
  *     traffic) is dropped.
  *
  * Routing tables are a handful of entries, so they become literal map
  * expressions (`element_at`) — per-row, codegen'd, no shuffle, no
  * driver round-trips; scale-safe at any event volume.
  */
object Router {

  /** @param events decoded events (schema of [[WalDecoder.decodeDf]])
    * @return actions (op: "index"|"delete", index, id, doc) */
  def route(
      events: DataFrame,
      viewsToIndices: Map[String, String],
      parentTablesToIndices: Map[String, String]): DataFrame = {
    val viewIdx = element_at(typedlit(viewsToIndices), col("table"))
    val parentIdx = element_at(typedlit(parentTablesToIndices), col("table"))
    events
      .withColumn("action_op",
        when(viewIdx.isNotNull && col("op") === "INSERT", lit("index"))
          .when(parentIdx.isNotNull && col("op") === "DELETE", lit("delete")))
      .filter(col("action_op").isNotNull)
      .select(
        col("action_op").as("op"),
        when(col("action_op") === "index", viewIdx).otherwise(parentIdx)
          .as("index"),
        col("id"),
        when(col("action_op") === "index", col("doc")).as("doc"),
        col("lsn"),
        col("xid"))
  }
}
