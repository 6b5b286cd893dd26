package graft.ops

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** On-disk LSH-bucketed ANN index: the storage layout that makes
  * multi-probe ANN IO-PRUNED at scale instead of recomputed per query.
  *
  * [[Similarity.topKNeighborsLshMultiProbe]] buckets the corpus on the
  * fly — correct, but at 100 TB the bucketing scan is the dominant
  * cost and it repeats for every query batch. This operator persists
  * the corpus PARTITIONED BY its hyperplane bucket
  * (`write.partitionBy("bucket")`), so a probe reads ONLY its buckets'
  * files: the probe set becomes a literal `IN` filter on the partition
  * column and Spark's scan planner drops every other directory before
  * a single byte is read (`PartitionFilters` in the plan — pinned by
  * AnnIndexSpec). With `planes ≈ log₂(n / targetBucketSize)` the
  * per-query read volume is (planes+1)·targetBucketSize rows
  * regardless of corpus size.
  *
  * The bucketing parameters (planes, dims, centering mean) are
  * persisted NEXT TO the data (`_graft_ann_meta`, an
  * underscore-prefixed file Spark's parquet reader ignores) and
  * rebuilt at query time, because the query side must hash with the
  * INDEX's statistics — in particular the corpus mean μ at WRITE time:
  * recomputing μ from a grown corpus would silently shift every plane
  * bias and probe the wrong buckets. Doubles round-trip through
  * `java.lang.Double.toString` / `parseDouble` (exact for all finite
  * doubles), so the rebuilt bucket expression is bit-identical to the
  * one that wrote the index.
  *
  * Driver state: the probe-bucket collect is ≤ Q·(planes+1) short
  * strings — the parameter-bounded collect class (probe queries are
  * small by contract; the corpus never collects).
  */
object AnnIndex {

  private val MetaFile = "_graft_ann_meta"

  final case class Meta(planes: Int, dims: Int, centered: Boolean,
      mu: Seq[Double])

  /** Write `corpus` (vec_id, embedding) as a bucket-partitioned parquet
    * index at `path`, plus the bucketing metadata. `centered` uses the
    * exact corpus mean ([[Similarity.dimMeans]]) — the deployment
    * default for non-zero-mean embedding spaces (q201 measures why). */
  def write(corpus: DataFrame, planes: Int, path: String,
      centered: Boolean = false): Unit = {
    require(planes > 0 && planes <= 32, s"planes must be in [1,32], got $planes")
    val dims = Similarity.embDims(corpus)
    val mu = if (centered) Similarity.dimMeans(corpus, dims)
      else Seq.empty[Double]
    // "b"-prefix the bucket key: a bare digit string ("0101") would be
    // read back as an INTEGER by partition-column type inference,
    // collapsing distinct bit-strings once planes outgrow a double's
    // exact-integer range and turning every bucket comparison into an
    // implicit cast. A non-numeric first char keeps the partition
    // column a string end to end.
    corpus
      .select(col("vec_id"), col("embedding"),
        concat(lit("b"),
          Similarity.bucketKey(col("embedding"), planes, dims, mu))
          .as("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
    val muStr = mu.map(java.lang.Double.toString).mkString(",")
    val body = s"planes=$planes\ndims=$dims\ncentered=$centered\nmu=$muStr\n"
    Files.write(Paths.get(path, MetaFile),
      body.getBytes(StandardCharsets.UTF_8))
  }

  /** Append `delta` (vec_id, embedding) to an existing index WITHOUT
    * touching the resident data: the delta is bucketed with the
    * INDEX's persisted planes/dims/μ — never statistics recomputed
    * from the grown corpus, which would silently shift every plane
    * bias and strand the resident rows in stale buckets — and written
    * `mode("append")` into the same partition scheme, so each delta
    * row lands as new files inside its bucket's directory. The
    * deployment shape for embedding deltas at 100 TB: only the delta
    * is hashed and written; existing bucket files are never read or
    * rewritten, and a probe read afterwards sees old and new rows
    * through the same partition filter. q205 gates the end-to-end
    * contract (half-written, half-appended index ≡ raw full table);
    * AnnIndexSpec pins the μ-stability semantics under `centered`. */
  def append(delta: DataFrame, path: String): Unit = {
    val meta = readMeta(path)
    delta
      .select(col("vec_id"), col("embedding"),
        concat(lit("b"),
          Similarity.bucketKey(col("embedding"), meta.planes, meta.dims,
            meta.mu))
          .as("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(path)
  }

  /** Read the bucketing metadata the index was written with. */
  def readMeta(path: String): Meta = {
    val kv = new String(Files.readAllBytes(Paths.get(path, MetaFile)),
      StandardCharsets.UTF_8)
      .linesIterator.filter(_.contains("=")).map { l =>
        val i = l.indexOf('='); l.substring(0, i) -> l.substring(i + 1)
      }.toMap
    Meta(kv("planes").toInt, kv("dims").toInt, kv("centered").toBoolean,
      if (kv("mu").isEmpty) Seq.empty
      else kv("mu").split(",").toSeq.map(java.lang.Double.parseDouble))
  }

  /** Multi-probe top-k over the persisted index: query buckets are
    * rebuilt with the INDEX's planes/μ, the (planes+1)·Q probe set is
    * collected (parameter-bounded) into a literal partition filter, and
    * only the probed buckets' files are scanned. Result is identical to
    * [[Similarity.topKNeighborsLshMultiProbe]] over the same corpus and
    * parameters (AnnIndexSpec pins the equality); `multiProbe = false`
    * restricts to each query's own bucket (q32's rung).
    *
    * Output: (q_id, rank, vec_id, cos_sim), rank 1..k by
    * (cos desc, vec_id). */
  def topK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
      multiProbe: Boolean = true): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(spark)
    require(k > 0, s"k must be positive, got $k")
    val meta = readMeta(path)
    val qB = queries.select(col("q_id"),
      Similarity.toDouble(col("q_vec")).as("q"),
      Similarity.bucketKey(col("q_vec"), meta.planes, meta.dims, meta.mu)
        .as("raw_bucket"))
    // probe generation flips bits on the RAW bit string; the on-disk
    // partition key carries the "b" prefix (see write), so prefix after
    val probes =
      (if (multiProbe) qB.select(col("q_id"),
        explode(Similarity.probeBuckets(col("raw_bucket"), meta.planes))
          .as("raw_bucket"))
      else qB.select(col("q_id"), col("raw_bucket")))
        .select(col("q_id"), concat(lit("b"), col("raw_bucket")).as("bucket"))
    // the ONLY collect: ≤ Q·(planes+1) bucket strings, turned into a
    // literal isin so the scan planner prunes partitions up front — a
    // join would ship probe keys to the executors but still list and
    // read every bucket directory
    val probeBucketList = probes.select(col("bucket")).distinct()
      .collect().map(_.getString(0)).toSeq
    val idx = spark.read.parquet(path)
      .filter(col("bucket").isin(probeBucketList: _*))
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"),
        col("bucket"))
    val cand = idx.select(col("vec_id"), col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .join(qB.select(col("q_id"), col("q")), "q_id")
      .join(idx.select(col("vec_id"), col("v")), "vec_id")
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }
}
