package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.cdc.WalDecoder

/** Structured Streaming front-end for the runner (A2/A14/A17):
  * backfill-then-tail over a stream of raw WAL-text change rows
  * `(xid LONG, lsn STRING, data STRING)`.
  *
  * Each micro-batch is decoded with [[WalDecoder.decodeDf]], the set of
  * changed tables drives dirty-view refresh (same coalescing semantics
  * as [[Runner.iterate]] — one refresh per view per batch regardless of
  * row volume), and offsets commit in the Spark checkpoint — the
  * replication slot's role in the reference (A17; reference:
  * src/sinker/runner.py:56-64). A replayed batch after a crash re-runs
  * the refresh; the diff against the committed snapshot makes that a
  * no-op or a re-send, converging via idempotent upserts (§2C
  * at-least-once).
  *
  * The reference's 10s poll interval (settings.py:20) maps to
  * `Trigger.ProcessingTime`; tests use the default micro-batch trigger
  * with `processAllAvailable()`.
  */
class StreamingRunner(
    spark: SparkSession,
    pipelines: Seq[Pipeline],
    checkpointDir: String,
    maxScopedEvents: Int = 10000) {

  /** Drop stale offsets — the reference's slot drop/create on startup
    * (runner.py:56-64): after setup's backfill, only post-setup changes
    * matter. */
  def resetCheckpoint(): Unit = {
    val p = new Path(checkpointDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Start tailing. `walStream` must be a STREAMING DataFrame of raw
    * change rows. One streaming query serves all pipelines (they share
    * the feed; each filters to its own tables), the A13 analogue of
    * one-thread-per-view. */
  def start(walStream: DataFrame,
      trigger: Trigger = Trigger.ProcessingTime(
        graft.core.GraftSettings.fromEnv.triggerIntervalMs)): StreamingQuery =
    walStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // First pass: per-table counts (tiny result) size the batch and
        // give the dirty-table set. Small batches (≤ maxScopedEvents
        // decoded rows) then come to the driver as ChangeEvents so
        // pipelines can KEY-SCOPE the refresh — work ∝ change volume,
        // same as Runner.iterate. Larger batches never re-decode for
        // row events (bounded driver memory) and full-refresh:
        // recompute-and-diff beats per-key scoping once a batch touches
        // a large fraction of the view anyway.
        val decoded = WalDecoder.decodeDf(batch)
        val tableCounts = decoded.groupBy("table").count().collect()
        val dirtyTables = tableCounts.map(_.getString(0)).toSet
        val total = tableCounts.map(_.getLong(1)).sum
        val events: Option[Seq[graft.cdc.ChangeEvent]] =
          if (total > maxScopedEvents) None
          // name-based encoder: stays correct under decodeDf column
          // reordering (positional Row access would silently mis-bind)
          else Some(decoded.as(org.apache.spark.sql.Encoders
            .product[graft.cdc.ChangeEvent]).collect().toSeq)
        if (dirtyTables.nonEmpty) {
          // A13 on the streaming path, via the SAME dispatch as
          // Runner.iterate (reference: src/sinker/runner.py:91-99): a
          // raised error fails the batch; checkpoint replay retries it
          // (idempotent refresh).
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.global
          Runner.dispatch(pipelines, events, dirtyTables)
        }
        ()
      }
      .start()
}
