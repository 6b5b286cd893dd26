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
        // small batches (≤ maxScopedEvents decoded rows) come to the
        // driver as ChangeEvents so pipelines can KEY-SCOPE the refresh
        // — work ∝ change volume, same as Runner.iterate. A batch past
        // the bound keeps only the dirty-table set (bounded driver
        // memory) and full-refreshes: recompute-and-diff beats per-key
        // scoping once a batch touches a large fraction of the view.
        val decoded = WalDecoder.decodeDf(batch)
        val sample = decoded.limit(maxScopedEvents + 1).collect()
        val events: Option[Seq[graft.cdc.ChangeEvent]] =
          if (sample.length > maxScopedEvents) None
          else Some(sample.toSeq.map(r => graft.cdc.ChangeEvent(
            r.getString(0), r.getString(1), r.getString(2), r.getString(3),
            Option(r.getString(4)), r.getString(5), r.getLong(6))))
        val dirtyTables = events match {
          case Some(es) => es.map(_.table).toSet
          case None => decoded.select("table").distinct()
            .collect().map(_.getString(0)).toSet
        }
        if (dirtyTables.nonEmpty) {
          val dirty = pipelines.filter(
            _.sourceTables.intersect(dirtyTables).nonEmpty)
          // A13 on the streaming path: fan dirty-view refreshes out in
          // parallel and re-raise the first failure — the same
          // Future+result semantics as Runner.iterate (reference:
          // src/sinker/runner.py:91-99). A raised error fails the batch;
          // checkpoint replay then retries it (idempotent refresh).
          // ALL futures are awaited before re-raising, so no straggler
          // refresh can overlap the replayed batch on the same store.
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          implicit val ec: ExecutionContext = ExecutionContext.global
          val settled = Await.result(
            Future.sequence(dirty.map { p =>
              val work = events match {
                case Some(es) => () => p.refreshScoped(
                  es.filter(e => p.sourceTables.contains(e.table)))
                case None => () => p.refresh()
              }
              Future(work()).transform(scala.util.Success(_))
            }),
            Duration.Inf)
          settled.collectFirst { case scala.util.Failure(e) => throw e }
        }
        ()
      }
      .start()
}
