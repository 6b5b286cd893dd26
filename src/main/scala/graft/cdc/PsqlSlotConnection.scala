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
  * text containing commas, pipes, or embedded newlines (including
  * `\r`/`\r\n`, read RAW from the child's stdout — no line
  * reassembly) round-trips. Framing limitation (inherent to any
  * in-band separator): a USER VALUE containing the 0x1e/0x1f bytes
  * themselves cannot be distinguished from the frame, and the FINAL
  * record's trailing newline is psql's own artifact, so a LAST value
  * ending in '\n' loses exactly that one byte — only the final
  * record: interior values keep trailing newlines because the frame
  * strips once on the whole output, never per record (ADVICE r10).
  * psql's `test_decoding` framing never emits the separator bytes,
  * but such bytes inside column data would mis-frame. The JDBC transport
  * ([[JdbcSlotConnection]]) has no such limitation; prefer it when a
  * driver jar is deployable.
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
    // stdout is read RAW (readAllBytes, no line splitting), so \r and
    // \r\n bytes inside WAL values survive byte-for-byte — a
    // ProcessLogger would split on any line terminator and rejoin
    // with '\n' (ADVICE r9). stderr drains on its own thread so a
    // chatty child can't deadlock the pipe buffer.
    val p = new java.lang.ProcessBuilder(cmd: _*).start()
    p.getOutputStream.close()
    val errBuf = new java.util.concurrent.atomic.AtomicReference[String]("")
    val errT = new Thread(() => errBuf.set(
      new String(p.getErrorStream.readAllBytes,
        java.nio.charset.StandardCharsets.UTF_8)))
    errT.setDaemon(true)
    errT.start()
    val out = new String(p.getInputStream.readAllBytes,
      java.nio.charset.StandardCharsets.UTF_8)
    val rc = p.waitFor()
    errT.join(10000L)
    require(rc == 0, s"psql failed (rc=$rc): ${errBuf.get.take(500)}")
    // psql terminates the FINAL record with one trailing newline; strip
    // it once from the whole output BEFORE splitting so an interior WAL
    // value that legitimately ends in '\n' right at a record boundary
    // survives (stripping per-piece truncated those — ADVICE r10)
    out.stripSuffix("\n").split(RecSep).toSeq
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
