package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.cdc.ChangeEvent

/** Change detection over file-backed source tables (A2/A10 for the
  * standalone CLI): a table is dirty when its file/directory
  * modification time advanced since the last drain. The moral
  * equivalent of the reference's row triggers for sources that are
  * replaced wholesale (parquet drops from an upstream job); per-row CDC
  * feeds plug into [[ChangeFeed]] the same way.
  *
  * Emits one table-level event per dirty table (id = "*"): the runner's
  * scoped refresh can't key on it, so these batches take the full
  * recompute-and-diff path — correct at any granularity. */
class FileWatchFeed(spark: SparkSession, tables: Map[String, String])
    extends ChangeFeed {

  private val lastSeen = scala.collection.mutable.Map[String, Long]()
  private val pending = scala.collection.mutable.Set[String]()

  private def mtime(p: String): Long = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) 0L
    else {
      val st = fs.getFileStatus(path)
      if (st.isDirectory)
        Option(fs.listStatus(path)).toSeq.flatten
          .map(_.getModificationTime).maxOption.getOrElse(st.getModificationTime)
      else st.getModificationTime
    }
  }

  /** Record current mtimes WITHOUT marking anything dirty — call after
    * backfill so only post-setup changes trigger refreshes (the
    * reference creates its slot after setup — runner.py:56-64). */
  def mark(): Unit = synchronized {
    tables.foreach { case (t, p) => lastSeen(t) = mtime(p) }
  }

  override def drain(): Seq[ChangeEvent] = synchronized {
    tables.foreach { case (t, p) =>
      val m = mtime(p)
      if (m > lastSeen.getOrElse(t, 0L)) { pending += t; lastSeen(t) = m }
    }
    val out = pending.toSeq.sorted.map(t =>
      ChangeEvent("public", t, "UPDATE", "*", None, s"mtime", 0L))
    pending.clear()
    out
  }

  override def requeue(events: Seq[ChangeEvent]): Unit = synchronized {
    pending ++= events.map(_.table)
  }
}
