package graft.cdc

/** [[SlotConnection]] carried over the `psql` CLI instead of JDBC —
  * for environments where a Postgres is reachable but no JDBC driver
  * jar can be deployed (air-gapped clusters, driver-less sandboxes).
  * The WAL lines this returns are REAL `test_decoding` output from a
  * real server; psql is only the transport, so [[WalDecoder]] and
  * [[graft.pipeline.PgSlotFeed]] behave identically over either
  * connection (LivePgE2ESpec proves it against a live server).
  *
  * Wire format: `psql -At` with the ASCII unit separator (0x1f) as the
  * field separator and the record separator (0x1e) for rows, so WAL
  * text containing commas, pipes, or embedded newlines round-trips.
  * `test_decoding` lines themselves never contain 0x1e/0x1f.
  *
  * Reference parity: the SQL issued here is byte-identical to
  * [[JdbcSlotConnection]]'s (same `pg_create_logical_replication_slot
  * (slot, 'test_decoding')` / `pg_logical_slot_{peek,get}_changes` /
  * `pg_replication_slot_advance` templates, reference
  * src/sinker/query_templates.py:1-3,34).
  */
class PsqlSlotConnection(
    host: String,
    port: Int,
    db: String = "postgres",
    user: String = "postgres") extends SlotConnection {

  private val FieldSep = '\u001f'
  private val RecSep = '\u001e'

  private def psql(sql: String): Seq[Seq[String]] = {
    val cmd = Seq("psql", "-h", host, "-p", port.toString, "-U", user,
      "-d", db, "-v", "ON_ERROR_STOP=1", "-qAt",
      "-F", FieldSep.toString, "-R", RecSep.toString, "-c", sql)
    val out = new java.lang.StringBuilder
    val err = new java.lang.StringBuilder
    import scala.sys.process._
    val rc = cmd ! ProcessLogger(l => { out.append(l).append('\n') },
      l => { err.append(l).append('\n') })
    // records are 0x1e-separated; ProcessLogger re-adds the newlines it
    // split on, which is correct for WAL values containing newlines
    // (psql never emits bare \n between -R records)
    require(rc == 0, s"psql failed (rc=$rc): ${err.toString.take(500)}")
    out.toString.split(RecSep).toSeq
      .map(_.stripSuffix("\n"))
      .filter(_.nonEmpty)
      .map(_.split(FieldSep).toSeq)
  }

  private def quoteLit(s: String): String = "'" + s.replace("'", "''") + "'"

  override def slotExists(slot: String): Boolean =
    psql(s"SELECT count(*) FROM pg_replication_slots WHERE slot_name=${quoteLit(slot)}")
      .head.head.trim.toLong > 0

  override def createSlot(slot: String): Unit =
    psql(s"SELECT pg_create_logical_replication_slot(${quoteLit(slot)}, 'test_decoding')")

  override def dropSlot(slot: String): Unit =
    psql(s"SELECT pg_drop_replication_slot(${quoteLit(slot)})")

  private def changes(fn: String, slot: String): Seq[WalLine] =
    psql(s"SELECT xid, lsn, data FROM $fn(${quoteLit(slot)}, NULL, NULL)")
      .map { r =>
        require(r.length >= 3, s"malformed WAL record: $r")
        WalLine(r(0).trim.toLong, r(1), r.drop(2).mkString(FieldSep.toString))
      }

  override def peekChanges(slot: String): Seq[WalLine] =
    changes("pg_logical_slot_peek_changes", slot)

  override def getChanges(slot: String): Seq[WalLine] =
    changes("pg_logical_slot_get_changes", slot)

  override def advance(slot: String, lsn: String): Unit =
    psql(s"SELECT pg_replication_slot_advance(${quoteLit(slot)}, ${quoteLit(lsn)}::pg_lsn)")

  override def close(): Unit = ()
}
