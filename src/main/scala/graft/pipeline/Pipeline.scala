package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.refresh.{DiffRefresher, SnapshotStore}
import graft.sink.DocumentSink

/** One sync'd view: the unit the reference calls a `Sinker`
  * (reference: src/sinker/sinker.py:27-135). Owns the view
  * recomputation, the keyed snapshot, and the document sink.
  *
  * `compute` re-evaluates the user's denormalization query against the
  * CURRENT source tables and must return `(id, doc-json-string)` — the
  * reference's mandatory 2-column MV shape
  * (reference: src/sinker/query_templates.py:11).
  */
class Pipeline(
    val view: String,
    val parentTable: String,
    val sourceTables: Set[String],
    compute: () => DataFrame,
    store: SnapshotStore,
    val sink: DocumentSink) {

  /** A1/A8: materialize the initial snapshot and bulk-load the sink —
    * the reference's `setup` + backfill via server-side cursor
    * (reference: src/sinker/sinker.py:52-72). Returns #docs loaded. */
  def backfill(): Long = {
    store.commit(store.stage(compute()))
    val snap = store.read()
    sink.applyActions(
      snap.select(lit("index").as("op"), col("id"), col("doc")))
    snap.count()
  }

  /** A9: `REFRESH ... CONCURRENTLY` equivalent — recompute, stage the
    * new snapshot, diff old vs new FROM STORAGE (the view query runs
    * exactly once), push only the delta to the sink, then commit the
    * new snapshot. Returns #actions applied.
    *
    * Failure ordering: the snapshot pointer moves only after the sink
    * accepted the batch, so a sink failure leaves the old snapshot
    * committed and the next refresh re-diffs and re-sends — at-least-
    * once delivery converging via idempotent upserts (SURVEY §2C). */
  def refresh(): Long = {
    val v = store.stage(compute())
    val actions = DiffRefresher.diff(store.read(), store.readVersion(v)).cache()
    try {
      val n = actions.count()
      if (n > 0) sink.applyActions(actions)
      store.commit(v)
      n
    } finally actions.unpersist()
  }
}
