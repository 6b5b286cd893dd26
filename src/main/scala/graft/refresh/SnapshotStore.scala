package graft.refresh

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Keyed `(id, doc)` snapshot table with MVCC versions — the engine's
  * stand-in for the reference's materialized view storage
  * (reference: src/sinker/query_templates.py:11-12 — MV with a unique
  * index on id).
  *
  * Layout: `<path>/v<N>/` parquet dirs plus a `_CURRENT` pointer file.
  * Writers [[stage]] a full new version (never touching the current one)
  * and [[commit]] by atomically swapping the pointer — readers always see
  * a consistent snapshot, and the diff refresher can read old and new
  * versions side by side without recomputing the view twice. This is the
  * same snapshot-isolation pattern Delta/Iceberg give on a cluster; the
  * pointer file is the only piece that assumes an atomic rename, which
  * HDFS and local filesystems provide (object stores would swap in a
  * catalog/log here).
  *
  * Uniqueness of `id` is an invariant of the view computation (the diff
  * and sinks key on it), matching the reference's mandatory unique index.
  */
class SnapshotStore(spark: SparkSession, path: String) {

  private val root = new Path(path)
  private def fs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val currentPtr = new Path(root, "_CURRENT")

  def exists: Boolean = fs.exists(currentPtr)

  def currentVersion: Option[String] =
    if (!exists) None
    else {
      val in = fs.open(currentPtr)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }

  /** Write `df` (must be `(id, doc)`) as the next version; returns the
    * version id. Does NOT move the pointer — call [[commit]]. */
  def stage(df: DataFrame): String = {
    val v = "v" + (currentVersion.map(_.drop(1).toLong).getOrElse(0L) + 1)
    df.select("id", "doc").write.mode("overwrite").parquet(new Path(root, v).toString)
    v
  }

  /** Atomically repoint `_CURRENT` at `v`: write-temp then
    * rename-with-OVERWRITE (atomic on POSIX/HDFS — no
    * delete-then-rename window in which no pointer exists). Prunes
    * versions older than the PREVIOUS one, so a reader holding a lazy
    * DataFrame over the prior snapshot survives one refresh cycle
    * (bounded MVCC grace; Delta/Iceberg generalize this with retention
    * policies). */
  def commit(v: String): Unit = {
    val tmp = new Path(root, s"_CURRENT.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      currentPtr.toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(tmp, currentPtr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    Option(fs.globStatus(new Path(root, "v*"))).toSeq.flatten
      .map(_.getPath)
      .filter(p => versionNum(p.getName) < versionNum(v) - 1)
      .foreach(p => fs.delete(p, true))
  }

  private def versionNum(v: String): Long = v.drop(1).toLong

  def readVersion(v: String): DataFrame =
    spark.read.parquet(new Path(root, v).toString)

  /** Current committed snapshot `(id, doc)`. */
  def read(): DataFrame =
    readVersion(currentVersion.getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $path")))
}
