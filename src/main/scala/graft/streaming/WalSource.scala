package graft.streaming

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.cdc.{JdbcSlotConnection, SlotConnection, WalLine}

/** DataSource V2 `MicroBatchStream` over a Postgres logical-replication
  * slot (SURVEY §2A.A2's preferred shape; VERDICT r8 item 7): raw
  * `test_decoding` lines surface as a STREAMING DataFrame
  * `(xid LONG, lsn STRING, data STRING)` — exactly what
  * [[graft.pipeline.StreamingRunner]] consumes — with the slot's LSN
  * as a first-class offset in the SPARK CHECKPOINT instead of
  * engine-managed feed state.
  *
  * Offset/commit discipline (the [[graft.pipeline.PgSlotFeed]]
  * deferred-commit contract made native):
  *
  *   - `latestOffset` PEEKs the slot (non-destructive) and proposes a
  *     batch end; the slot is never truncated by a read.
  *   - `commit(end)` — called by Spark only AFTER the batch's offset
  *     is durably in the checkpoint (concretely: when the NEXT batch
  *     constructs, via `cleanUpLastExecutedMicroBatch`, so the slot
  *     advance TRAILS by one batch — the same deferred-commit shape
  *     [[graft.pipeline.PgSlotFeed]] implements by hand) — ADVANCEs
  *     the slot's confirmed LSN. A crash mid-batch therefore leaves
  *     the slot untouched and the replayed batch re-peeks the same
  *     lines: at-least-once, converging through the idempotent diff
  *     refresh (§2C). The checkpointed start offset, not the slot's
  *     confirmed LSN, bounds every batch, so the trailing advance
  *     never re-delivers a checkpoint-committed line.
  *   - Batch ends always align to a TRANSACTION-COMMIT-LSN boundary:
  *     a transaction's lines never split across batches, and batch
  *     membership keys on each xid's COMMIT lsn (its max line lsn),
  *     not per-line lsns. Live servers share one lsn across a COMMIT
  *     record and the next transaction's first lines (the 87b8755
  *     at-least-once bug), so lines sharing an lsn MAY land in
  *     different batches when they belong to different transactions —
  *     a txn is in the batch iff its commit lsn is in
  *     (startLsn, endLsn], mirroring how
  *     `pg_replication_slot_advance` skips whole transactions.
  *
  * Admission control: `maxLinesPerBatch` caps how many staged lines
  * one micro-batch carries (default 10000), rounded DOWN to the last
  * complete TRANSACTION — except that the first transaction always
  * ships whole (progress guarantee). A replication slot is a SERIAL log —
  * there is no key to parallelize the read on — so each batch is one
  * input partition staged through the driver, the same wire shape as
  * the reference's single-connection drain
  * (src/sinker/bulk_action_generator.py:28-38); parallelism belongs
  * to the downstream refresh, not the tail.
  *
  * Connection wiring: option `url` (+ `user`/`password`) opens a
  * [[JdbcSlotConnection]]; option `handle` looks up a live
  * [[SlotConnection]] registered via [[WalSource.register]] — the
  * injection path for embedding applications and the stub-backed
  * suite. Option `slot` names the replication slot (required).
  */
object WalSource {
  val Schema: StructType = StructType(Seq(
    StructField("xid", LongType),
    StructField("lsn", StringType),
    StructField("data", StringType)))

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, SlotConnection]()

  /** Inject a live connection under `handle` (tests, embedders). */
  def register(handle: String, conn: SlotConnection): Unit =
    registry.put(handle, conn)

  def unregister(handle: String): Unit = registry.remove(handle)

  private[streaming] def connect(opts: CaseInsensitiveStringMap): SlotConnection = {
    val handle = opts.get("handle")
    if (handle != null) {
      val c = registry.get(handle)
      require(c != null, s"graft-wal: no SlotConnection registered under handle '$handle'")
      c
    } else {
      val url = opts.get("url")
      require(url != null, "graft-wal: one of `handle` or `url` is required")
      val props = new java.util.Properties()
      Seq("user", "password").foreach { k =>
        val v = opts.get(k); if (v != null) props.setProperty(k, v)
      }
      new JdbcSlotConnection(url, props)
    }
  }

  /** "X/Y" hex LSN → one orderable long (the wire format's own split:
    * high 32 bits / low 32 bits). */
  def lsnValue(lsn: String): Long = {
    val i = lsn.indexOf('/')
    require(i > 0, s"graft-wal: malformed LSN '$lsn'")
    (java.lang.Long.parseLong(lsn.substring(0, i), 16) << 32) |
      java.lang.Long.parseLong(lsn.substring(i + 1), 16)
  }
}

/** Checkpointed position: everything with `lsnValue(lsn) <=` this is
  * consumed. `0/0` = nothing consumed yet. */
case class WalOffset(lsn: String) extends Offset {
  override def json(): String = s"""{"lsn":"$lsn"}"""
  def value: Long = WalSource.lsnValue(lsn)
}
object WalOffset {
  val Zero: WalOffset = WalOffset("0/0")
  private val Re = """\{"lsn":"([0-9a-fA-F]+/[0-9a-fA-F]+)"\}""".r
  def parse(json: String): WalOffset = json.trim match {
    case Re(lsn) => WalOffset(lsn)
    case other => throw new IllegalArgumentException(
      s"graft-wal: unparseable offset json '$other'")
  }
}

class WalSourceProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    WalSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new WalTable(new CaseInsensitiveStringMap(properties))
}

class WalTable(opts: CaseInsensitiveStringMap) extends Table with SupportsRead {
  override def name(): String = s"graft-wal(${opts.get("slot")})"
  override def schema(): StructType = WalSource.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan {
      override def build(): Scan = this
      override def readSchema(): StructType = WalSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream = {
        val slot = options.get("slot")
        require(slot != null, "graft-wal: option `slot` is required")
        new WalMicroBatchStream(WalSource.connect(options), slot,
          options.getInt("maxLinesPerBatch", 10000))
      }
    }
}

class WalMicroBatchStream(conn: SlotConnection, slot: String, maxLines: Int)
    extends MicroBatchStream with SupportsAdmissionControl {
  require(maxLines >= 1, s"maxLinesPerBatch must be >= 1, got $maxLines")

  // The staged window: lines peeked past the slot's confirmed LSN.
  // Refreshed on every latestOffset; planInputPartitions re-peeks if a
  // checkpoint-recovery replay asks for a range the cache predates.
  private var cache: Seq[WalLine] = Nil

  override def initialOffset(): Offset = WalOffset.Zero
  override def deserializeOffset(json: String): Offset = WalOffset.parse(json)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxLines.toLong)

  /** Not reachable: Spark routes sources implementing
    * SupportsAdmissionControl through latestOffset(start, limit). */
  override def latestOffset(): Offset = throw new UnsupportedOperationException(
    "graft-wal implements SupportsAdmissionControl; use latestOffset(start, limit)")

  /** Per-transaction end position: the max lsn among the xid's lines
    * (test_decoding serializes txns in commit order, so that is the
    * COMMIT record's lsn). Batch membership keys on THIS, not the
    * per-line lsn: on a real server a COMMIT record and the NEXT
    * transaction's first lines share an lsn (observed live —
    * LivePgE2ESpec), so a `line.lsn > start` filter silently drops the
    * next transaction's rows. Keying on the txn-commit lsn mirrors the
    * slot's own semantics exactly: `pg_replication_slot_advance(lsn)`
    * skips transactions whose commit lsn is <= the confirmed position
    * and replays everything after — a txn is in the batch iff the
    * advance for that batch would consume it. */
  private def txnEnds(lines: Seq[WalLine]): Map[Long, Long] =
    lines.groupBy(_.xid).map { case (x, ls) =>
      x -> ls.map(l => WalSource.lsnValue(l.lsn)).max
    }

  override def latestOffset(startOffset: Offset, limit: ReadLimit): Offset = synchronized {
    val start = WalOffset.parse(startOffset.json())
    cache = conn.peekChanges(slot)
    // the slot's confirmed LSN may LAG the Spark checkpoint (a crash
    // between checkpoint-commit and advance): count only TRANSACTIONS
    // past the checkpointed start, never behind it
    val ends = txnEnds(cache)
    val pending = cache.filter(l => ends(l.xid) > start.value)
    if (pending.isEmpty) return start
    val cap = limit match {
      case r: ReadMaxRows => math.min(r.maxRows(), Int.MaxValue.toLong).toInt
      case _              => maxLines // allAvailable / composite: option cap
    }
    // cap, then align to a whole-TRANSACTION boundary — unless that
    // would stall (first txn alone >= cap): txns ship whole, because
    // `advance` confirms whole transactions and a mid-txn cut would
    // drop the txn's tail on the next peek
    val capIdx = math.min(cap, pending.size) - 1
    val cutXid = pending(capIdx).xid
    var i = capIdx
    while (i + 1 < pending.size && pending(i + 1).xid == cutXid) i += 1
    if (i > capIdx) { // cap split a txn: prefer ending BEFORE it
      var j = capIdx
      while (j >= 0 && pending(j).xid == cutXid) j -= 1
      if (j >= 0) i = j // else: oversized first txn, keep it whole
    }
    WalOffset(pending(i).lsn)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val (s, e) = (WalOffset.parse(start.json()).value, WalOffset.parse(end.json()).value)
    // recovery replay: the cache of a fresh instance starts empty — the
    // slot still holds the batch (commit never ran for a replayed
    // batch), so a re-peek reproduces it
    if (cache.isEmpty) cache = conn.peekChanges(slot)
    val ends = txnEnds(cache)
    val lines = cache.filter { l =>
      val v = ends(l.xid); v > s && v <= e
    }
    Array(WalInputPartition(lines))
  }

  override def createReaderFactory(): PartitionReaderFactory = new WalReaderFactory

  override def commit(end: Offset): Unit = synchronized {
    val e = WalOffset.parse(end.json())
    if (e.value > 0L) {
      conn.advance(slot, e.lsn)
      // evict whole consumed transactions (same keying as the batch
      // membership filter — a txn straddling the advance lsn would
      // otherwise be half-dropped)
      val ends = txnEnds(cache)
      cache = cache.filter(l => ends(l.xid) > e.value)
    }
  }

  override def stop(): Unit = ()
}

case class WalInputPartition(lines: Seq[WalLine]) extends InputPartition

class WalReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val it = partition.asInstanceOf[WalInputPartition].lines.iterator
    new PartitionReader[InternalRow] {
      private var cur: WalLine = _
      override def next(): Boolean = { val h = it.hasNext; if (h) cur = it.next(); h }
      override def get(): InternalRow = InternalRow(
        cur.xid, UTF8String.fromString(cur.lsn), UTF8String.fromString(cur.data))
      override def close(): Unit = ()
    }
  }
}
