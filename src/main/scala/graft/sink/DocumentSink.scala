package graft.sink

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Keyed, idempotent document index (A5-A7, A16) — the engine's
  * equivalent of the reference's Elasticsearch index: full-document
  * upsert by `_id` ("index" action overwrites whatever is there —
  * reference: src/sinker/bulk_action_generator.py:75-90), delete by
  * `_id` (:60-73), and a declared strict mapping enforced on every
  * batch (sinker.py:74-86).
  *
  * Applying the same action batch twice converges to the same state
  * (at-least-once delivery + idempotent upsert, SURVEY §2C).
  */
trait DocumentSink {
  def index: String
  def mapping: StructType

  /** Transient-failure retry budget per batch, the reference's ES bulk
    * `max_retries` (src/sinker/settings.py:25,36-41). Schema violations
    * are NOT retried — they fail deterministically before any write. */
  def maxRetries: Int = 5

  /** Apply a batch of actions `(op: "index"|"delete", id, doc)`.
    * Validates strictness first and fails the whole batch on any
    * violation (ES `raise_on_error=True` semantics —
    * reference: src/sinker/settings.py:36-41); writes retry up to
    * [[maxRetries]] times (idempotent actions make a retry after a
    * partial write safe). */
  final def applyActions(actions: DataFrame): Unit = {
    StrictSchema.validate(actions, mapping, index)
    var attempt = 0
    var done = false
    while (!done) {
      try { doApply(actions); done = true }
      catch {
        // NonFatal only: VM errors and interrupts must surface at once
        case scala.util.control.NonFatal(_) if attempt < maxRetries =>
          attempt += 1
          Thread.sleep(50L * attempt)
      }
    }
  }

  protected def doApply(actions: DataFrame): Unit

  def get(id: String): Option[String]
  def count(): Long
}

/** Test/driver-side sink: a concurrent map. Collects each batch to the
  * driver — ONLY for golden tests and interactive inspection; the scale
  * path is [[ParquetIndex]]. */
class InMemoryIndex(val index: String, val mapping: StructType)
    extends DocumentSink {
  private val docs = TrieMap.empty[String, String]

  override protected def doApply(actions: DataFrame): Unit =
    actions.select("op", "id", "doc").collect().foreach { r =>
      r.getString(0) match {
        case "index" => docs.put(r.getString(1), r.getString(2))
        case "delete" => docs.remove(r.getString(1))
        case other => throw new IllegalArgumentException(s"unknown op $other")
      }
    }

  override def get(id: String): Option[String] = docs.get(id)
  override def count(): Long = docs.size.toLong
  def ids: Set[String] = docs.keySet.toSet
}

/** Distributed sink: a versioned keyed parquet table, merged per batch
  * with one anti-join + union (MERGE-by-key shape; on a real cluster
  * this is a Delta MERGE or an external bulk API). Batch writes are
  * Spark tasks — the analogue of the reference's 100-doc ES bulk chunks
  * with task-level retry (reference: src/sinker/settings.py:23-41). */
class ParquetIndex(spark: SparkSession, val index: String,
    val mapping: StructType, path: String) extends DocumentSink {

  private val store = new graft.refresh.SnapshotStore(spark, path)

  /** Initialize empty (A16 recreate_index: delete + recreate). */
  def recreate(): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    import spark.implicits._
    store.commit(store.stage(
      Seq.empty[(String, String)].toDF("id", "doc")))
  }

  override protected def doApply(actions: DataFrame): Unit = this.synchronized {
    val acts = actions.cache()
    try {
      val current = store.read()
      val touched = acts.select(col("id"))
      val upserts = acts.filter(col("op") === "index").select("id", "doc")
      val merged = current
        .join(touched, Seq("id"), "left_anti")
        .unionByName(upserts)
      store.commit(store.stage(merged))
    } finally acts.unpersist()
  }

  def read(): DataFrame = store.read()
  override def get(id: String): Option[String] =
    read().filter(col("id") === id).collect().headOption.map(_.getString(1))
  override def count(): Long = read().count()
}

/** The 100 TB sink: the index is hash-bucketed by id
  * (`bucket = pmod(xxhash64(id), n)`), and a batch rewrites ONLY the
  * buckets containing touched ids — dynamic partition overwrite leaves
  * the other `n - |touched|` buckets' files untouched. Merge I/O is
  * proportional to change volume, not index size (the property
  * [[ParquetIndex]]'s full-snapshot MVCC rewrite gives up).
  *
  * Tradeoff, stated honestly: per-bucket overwrite is not atomic across
  * buckets (Delta/Iceberg would add the transaction log). A crashed
  * batch leaves some buckets new and some old; replaying the batch
  * converges because actions are idempotent full-document upserts and
  * deletes — exactly the §2C at-least-once contract the reference
  * lives with too (destructive slot reads, re-refresh as "harmless
  * no-op").
  */
class BucketedParquetIndex(spark: SparkSession, val index: String,
    val mapping: StructType, path: String, numBuckets: Int = 64)
    extends DocumentSink {

  private def bucketOf(c: Column): Column = pmod(xxhash64(c), lit(numBuckets))
  private def empty: DataFrame = {
    import spark.implicits._
    Seq.empty[(String, String)].toDF("id", "doc")
      .withColumn("bucket", bucketOf(col("id")))
  }

  def recreate(): Unit = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    empty.write.partitionBy("bucket").parquet(path)
  }

  def read(): DataFrame =
    spark.read.schema("id STRING, doc STRING, bucket BIGINT").parquet(path)
      .select("id", "doc")

  // serialized per instance: several pipelines may feed one index, and
  // concurrent merges over the same files would race
  override protected def doApply(actions: DataFrame): Unit = this.synchronized {
    val acts = actions
      .withColumn("bucket", bucketOf(col("id")))
      .cache()
    try {
      val touched = acts.select("bucket").distinct()
        .collect().map(_.getLong(0))
      if (touched.isEmpty) return
      // partition pruning: only the touched buckets are read
      val current = spark.read
        .schema("id STRING, doc STRING, bucket BIGINT").parquet(path)
        .filter(col("bucket").isin(touched.toSeq: _*))
      val merged = current
        .join(acts.select(col("id")), Seq("id"), "left_anti")
        .unionByName(acts.filter(col("op") === "index")
          .select(col("id"), col("doc"), col("bucket")))
      // dynamic overwrite: only partitions present in `merged` rewrite;
      // a touched bucket emptied of all docs keeps stale files, so make
      // sure every touched bucket appears (possibly with zero rows kept
      // -> write its empty frame too via union of bucket markers)
      // stage the merged buckets first: the merge READS the same files
      // the dynamic overwrite would replace, so writing in place would
      // delete inputs mid-scan. Staging I/O is still proportional to
      // the touched buckets only.
      val root = new Path(path)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val staging = new Path(root.getParent,
        s".${root.getName}-staging-${java.util.UUID.randomUUID()}")
      try {
        merged.repartition(col("bucket"))
          .write.partitionBy("bucket").parquet(staging.toString)
        spark.read
          .schema("id STRING, doc STRING, bucket BIGINT")
          .parquet(staging.toString)
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("bucket")
          .parquet(path)
        // dynamic overwrite skips buckets whose merged content is empty;
        // delete their stale partition dirs explicitly
        val written = spark.read
          .schema("id STRING, doc STRING, bucket BIGINT")
          .parquet(staging.toString)
          .select("bucket").distinct().collect().map(_.getLong(0)).toSet
        touched.filterNot(written).foreach { b =>
          fs.delete(new Path(root, s"bucket=$b"), true)
        }
      } finally fs.delete(staging, true)
    } finally acts.unpersist()
  }

  override def get(id: String): Option[String] =
    spark.read.schema("id STRING, doc STRING, bucket BIGINT").parquet(path)
      .filter(col("bucket") === bucketOf(lit(id)) && col("id") === id)
      .collect().headOption.map(_.getString(1))
  override def count(): Long = read().count()
}
