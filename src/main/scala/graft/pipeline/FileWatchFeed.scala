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

  private val lastSeen = scala.collection.mutable.Map[String, (Long, Long, Long)]()
  private val pending = scala.collection.mutable.Set[String]()

  /** Change fingerprint: (max mtime incl. the dir itself, file count,
    * total bytes). The dir mtime catches entry deletion; count+bytes
    * catch replacement with older-mtime data and same-second rewrites
    * that a bare max-mtime comparison would miss. */
  private def fingerprint(p: String): (Long, Long, Long) = {
    val path = new Path(p)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) (0L, 0L, 0L)
    else {
      val st = fs.getFileStatus(path)
      if (!st.isDirectory) (st.getModificationTime, 1L, st.getLen)
      else {
        val children = Option(fs.listStatus(path)).toSeq.flatten
        ((st.getModificationTime +: children.map(_.getModificationTime)).max,
          children.size.toLong, children.map(_.getLen).sum)
      }
    }
  }

  /** Record current state WITHOUT marking anything dirty. Call BEFORE
    * backfill (any change landing during backfill then still compares
    * unequal on the next drain — worst case an extra idempotent
    * refresh, never a lost update; reference creates its slot around
    * setup for the same reason — runner.py:56-64). */
  def mark(): Unit = synchronized {
    tables.foreach { case (t, p) => lastSeen(t) = fingerprint(p) }
  }

  override def drain(): Seq[ChangeEvent] = synchronized {
    tables.foreach { case (t, p) =>
      val f = fingerprint(p)
      if (lastSeen.get(t).exists(_ != f)) { pending += t; lastSeen(t) = f }
      else if (!lastSeen.contains(t)) lastSeen(t) = f
    }
    val out = pending.toSeq.sorted.map(t =>
      ChangeEvent("public", t, "UPDATE", "*", None, "mtime", 0L))
    pending.clear()
    out
  }

  override def requeue(events: Seq[ChangeEvent]): Unit = synchronized {
    pending ++= events.map(_.table)
  }
}
