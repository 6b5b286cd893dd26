package graft.cdc

/** One raw logical-replication line as Postgres returns it:
  * `(xid, lsn, data)` (reference: src/sinker/query_templates.py:34
  * `SELECT xid, lsn, data FROM pg_logical_slot_get_changes(...)`). */
case class WalLine(xid: Long, lsn: String, data: String)

/** Minimal connection surface for a logical-replication slot — just
  * what the reference touches (slot lifecycle runner.py:56-64, drain
  * bulk_action_generator.py:28-38), plus the non-destructive
  * peek/advance pair that lets [[graft.pipeline.PgSlotFeed]] defer the
  * offset commit until the batch is known-processed.
  *
  * Abstracted so the full pipeline is integration-testable without a
  * Postgres in the environment: tests drive a queue-backed stub through
  * source → decode → route → refresh → sink.
  */
trait SlotConnection extends AutoCloseable {
  def slotExists(slot: String): Boolean
  def createSlot(slot: String): Unit
  def dropSlot(slot: String): Unit

  /** Non-destructive read of everything after the confirmed LSN
    * (`pg_logical_slot_peek_changes`). */
  def peekChanges(slot: String): Seq[WalLine]

  /** Destructive read — truncates the slot as a side effect
    * (`pg_logical_slot_get_changes`, the reference's read:
    * bulk_action_generator.py:34-36). */
  def getChanges(slot: String): Seq[WalLine]

  /** Commit the offset: move the slot's confirmed LSN past `lsn`
    * (`pg_replication_slot_advance`). */
  def advance(slot: String, lsn: String): Unit
}

/** JDBC implementation against a real Postgres. Uses only `java.sql` —
  * the driver class is resolved at runtime from the cluster classpath.
  * SQL mirrors the reference's templates
  * (src/sinker/query_templates.py:1-3,34) with the same
  * `test_decoding` output plugin, so [[WalDecoder]] sees identical
  * line shapes. */
class JdbcSlotConnection(url: String, props: java.util.Properties)
    extends SlotConnection {

  private lazy val conn: java.sql.Connection =
    java.sql.DriverManager.getConnection(url, props)

  private def quoteLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private def query(sql: String): Seq[Seq[AnyRef]] = {
    val st = conn.createStatement()
    try {
      val rs = st.executeQuery(sql)
      val n = rs.getMetaData.getColumnCount
      val buf = scala.collection.mutable.ArrayBuffer[Seq[AnyRef]]()
      while (rs.next()) buf += (1 to n).map(rs.getObject)
      buf.toSeq
    } finally st.close()
  }

  override def slotExists(slot: String): Boolean =
    query(s"SELECT count(*) FROM pg_replication_slots WHERE slot_name=${quoteLit(slot)}")
      .head.head.asInstanceOf[Number].longValue() > 0

  override def createSlot(slot: String): Unit =
    query(s"SELECT pg_create_logical_replication_slot(${quoteLit(slot)}, 'test_decoding')")

  override def dropSlot(slot: String): Unit =
    query(s"SELECT pg_drop_replication_slot(${quoteLit(slot)})")

  private def changes(fn: String, slot: String): Seq[WalLine] =
    query(s"SELECT xid, lsn, data FROM $fn(${quoteLit(slot)}, NULL, NULL)")
      .map(r => WalLine(
        r(0).asInstanceOf[Number].longValue(), String.valueOf(r(1)), String.valueOf(r(2))))

  override def peekChanges(slot: String): Seq[WalLine] =
    changes("pg_logical_slot_peek_changes", slot)

  override def getChanges(slot: String): Seq[WalLine] =
    changes("pg_logical_slot_get_changes", slot)

  override def advance(slot: String, lsn: String): Unit =
    query(s"SELECT pg_replication_slot_advance(${quoteLit(slot)}, ${quoteLit(lsn)}::pg_lsn)")

  override def close(): Unit = conn.close()
}
