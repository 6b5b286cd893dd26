package graft.cdc

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One decoded logical-replication change row (A2/A3).
  *
  * Mirrors what the reference extracts from a `test_decoding` WAL text
  * line (reference: src/sinker/bulk_action_generator.py:15-19 SLOT_RE +
  * :39-45 doc split): the table coordinates, the trigger op, the string
  * document key, and — for materialized-view INSERTs — the JSON doc
  * payload. `lsn` is the stream offset, `xid` the transaction id.
  */
case class ChangeEvent(
    schema: String,
    table: String,
    op: String,
    id: String,
    doc: Option[String],
    lsn: String,
    xid: Long)

/** Parser for `test_decoding`-format WAL lines, usable both as a plain
  * Scala function (unit-level, driver-side) and as codegen'd DataFrame
  * columns (`regexp_extract`, scale path — per-row, no shuffle).
  */
object WalDecoder {

  /** Same pattern as the reference's SLOT_RE
    * (bulk_action_generator.py:15-19): matches
    * `table public."Foo": DELETE: id[text]:'a-1'` and unquoted forms.
    * Lines without a text id (BEGIN/COMMIT, `(no-tuple-data)` MV
    * deletes) don't match and are dropped — exactly the reference's
    * filter semantics. */
  val SlotPattern: String =
    """table\s"?([\w-]+)"?\."?([\w-]+)"?:\s([A-Z]+):\sid\[text]:'([\w-]+)'"""

  private val SlotRe = SlotPattern.r.unanchored
  private val DocMarker = "doc[json]:"

  /** Driver-side decode of one WAL line. */
  def decode(xid: Long, lsn: String, data: String): Option[ChangeEvent] =
    SlotRe.findFirstMatchIn(data).map { m =>
      val doc =
        if (m.group(3) == "INSERT" && data.contains(DocMarker))
          // reference: data.split("doc[json]:")[1].replace("'", "")
          // (bulk_action_generator.py:41) — [1] of an UNLIMITED split,
          // i.e. the segment between the first and second marker, with
          // ALL single quotes stripped. Mirrored exactly (and by the
          // DataFrame path + the DuckDB oracle's split_part).
          Some(data.split(java.util.regex.Pattern.quote(DocMarker))(1)
            .replace("'", ""))
        else None
      ChangeEvent(m.group(1), m.group(2), m.group(3), m.group(4), doc, lsn, xid)
    }

  /** Distributed decode: input DataFrame with (xid LONG, lsn STRING,
    * data STRING) → (schema, table, op, id, doc, lsn, xid), non-matching
    * rows dropped. All expressions are codegen'd built-ins. */
  def decodeDf(walDf: DataFrame): DataFrame = {
    val d = col("data")
    walDf
      .filter(d.rlike(SlotPattern))
      .select(
        regexp_extract(d, SlotPattern, 1).as("schema"),
        regexp_extract(d, SlotPattern, 2).as("table"),
        regexp_extract(d, SlotPattern, 3).as("op"),
        regexp_extract(d, SlotPattern, 4).as("id"),
        docColumn(d).as("doc"),
        col("lsn"),
        col("xid"))
  }

  /** The JSON payload column: the segment after the FIRST `doc[json]:`
    * marker (before any further marker occurrence — split_part
    * semantics, matching the scalar [[decode]] and the reference's
    * unlimited `split(...)[1]`), single quotes stripped; NULL when
    * absent or not an INSERT. */
  def docColumn(data: Column): Column =
    when(
      regexp_extract(data, SlotPattern, 3) === "INSERT" &&
        data.contains(DocMarker),
      translate(
        element_at(split(data, java.util.regex.Pattern.quote(DocMarker)), 2),
        "'", ""))
}
