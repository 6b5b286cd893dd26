package graft.ops

import org.apache.hadoop.fs.{Path => HPath}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted partial-aggregate state: incremental view maintenance for
  * metric tables, laid out so a delta refresh costs the DELTA's bucket
  * footprint — never a re-aggregation of the base.
  *
  * The q212 gate proves the algebra (merge(partial(base),
  * partial(delta)) ≡ aggregate(base ∪ delta) for count + quantized
  * sum); this operator is the 100 TB layout for it, the same
  * persisted-index move as [[DedupIndex]] (band keys) and
  * [[AnnIndex]] (LSH buckets), applied to aggregation state:
  *
  *  - [[write]] aggregates the base ONCE into (group cols, n, sv)
  *    partials — n a count, sv an order-independent quantized integer
  *    sum (the q120/q172 discipline: exact, so a 1000-executor merge
  *    reproduces a serial recompute bit-for-bit) — and persists them
  *    PARTITIONED BY a caller-chosen pruning bucket over the leading
  *    group column (`pbucket`), each bucket co-located into one file.
  *  - [[refresh]] answers "what are these groups' aggregates NOW":
  *    the delta's partials are computed (delta-sized work), the
  *    distinct buckets they land in are collected (parameter-bounded:
  *    ≤ |delta groups| longs), and ONLY those partition directories
  *    are read and merged — resident buckets the delta never touches
  *    are not listed, opened, or scanned.
  *  - [[absorb]] folds a delta into the store by rewriting ONLY its
  *    touched partitions (dynamic partition overwrite): the rewritten
  *    content is the touched buckets' full-outer merge, untouched
  *    partitions stay byte-identical (AggStateSpec pins this). Crash
  *    shape: dynamic overwrite stages to a Spark staging dir and
  *    commits per partition — a crash before commit leaves the old
  *    partition content readable; unlike [[AnnIndex.delete]] no
  *    cross-partition manifest is needed because absorb is a pure
  *    UPSERT (re-running it with the same delta converges: n/sv are
  *    recomputed from resident-at-read + delta, not incremented
  *    blindly — but see the at-most-once note on [[absorb]]).
  *
  * At 100 TB: the raw fact table is enormous, the partials table is
  * |distinct groups| rows, and a daily refresh touches |delta groups|
  * of them. The recompute alternative re-scans every fact row for the
  * touched groups — a full scan unless facts are themselves
  * group-partitioned. ScaleSoak's `ivm_refresh_scaled` arm measures
  * the contrast.
  */
object AggState {

  /** Order-independent partial aggregates: one row per group with a
    * count `n` and the `quantScale`-quantized integer sum `sv` of
    * `valueCol`. Exact while |Σ| < 2⁶³/quantScale. */
  def partials(df: DataFrame, groupCols: Seq[String], valueCol: String,
      quantScale: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(round(col(valueCol) * quantScale, 0).cast("long")).as("sv"))

  /** Aggregate `base` once and persist the partials at `path`,
    * partitioned by `bucketOf` (an expression over the group columns —
    * the SAME expression must be passed to [[refresh]]/[[absorb]];
    * choose it so a typical delta's groups land in few buckets, e.g.
    * a key-range floor for range-affine deltas or a hash mod for
    * uniformly spread ones). Each bucket is co-located to one file. */
  def write(base: DataFrame, groupCols: Seq[String], valueCol: String,
      quantScale: Int, bucketOf: Column, path: String): Unit =
    partials(base, groupCols, valueCol, quantScale)
      .withColumn("pbucket", bucketOf)
      .repartition(col("pbucket"))
      .write.mode("overwrite").partitionBy("pbucket").parquet(path)

  /** Merge-read: the refreshed aggregates for exactly the DELTA's
    * groups, computed from the persisted partials plus the delta —
    * reading only the partition directories the delta's buckets name
    * (the [[AnnIndex.topK]] probe pattern: the read set is known
    * BEFORE the scan, so untouched buckets cost nothing, not even a
    * directory listing). Output: group cols, `n`, `sv` — the merged
    * integer domain; presentation (descale, round) is the caller's. */
  def refresh(spark: SparkSession, path: String, delta: DataFrame,
      groupCols: Seq[String], valueCol: String, quantScale: Int,
      bucketOf: Column): DataFrame = {
    val d = partials(delta, groupCols, valueCol, quantScale)
      .withColumn("pbucket", bucketOf)
      .select(groupCols.map(col) :+ col("n").as("dn") :+
        col("sv").as("ds") :+ col("pbucket"): _*)
    val dirs = touchedDirs(spark, path, d)
    if (dirs.isEmpty) {
      // store has no bucket for any delta group: everything is new
      return d.select(groupCols.map(col) :+ col("dn").as("n") :+
        col("ds").as("sv"): _*)
    }
    val resident = spark.read.option("basePath", path).parquet(dirs: _*)
      .select(groupCols.map(col) :+ col("n").as("bn") :+
        col("sv").as("bs"): _*)
    d.join(resident, groupCols, "left")
      .select(groupCols.map(col) :+
        (coalesce(col("bn"), lit(0L)) + col("dn")).as("n") :+
        (coalesce(col("bs"), lit(0L)) + col("ds")).as("sv"): _*)
  }

  /** Fold the delta INTO the store: touched partitions are rewritten
    * with their full-outer merge (resident groups the delta missed
    * survive untouched inside the rewritten bucket), untouched
    * partitions are never read or written (dynamic partition
    * overwrite). AT-MOST-ONCE per delta: absorb folds the delta's
    * counts into the stored n/sv, so replaying the same delta
    * double-counts — drive it from an exactly-once batch boundary
    * (e.g. a checkpointed foreachBatch epoch id gating, the
    * [[AnnIndex.appendStream]] discussion) or dedupe upstream. */
  def absorb(spark: SparkSession, path: String, delta: DataFrame,
      groupCols: Seq[String], valueCol: String, quantScale: Int,
      bucketOf: Column): Unit = {
    val d = partials(delta, groupCols, valueCol, quantScale)
      .withColumn("pbucket", bucketOf)
      .select(groupCols.map(col) :+ col("n").as("dn") :+
        col("sv").as("ds") :+ col("pbucket"): _*)
    val dirs = touchedDirs(spark, path, d)
    val merged =
      if (dirs.isEmpty)
        d.select(groupCols.map(col) :+ col("dn").as("n") :+
          col("ds").as("sv") :+ col("pbucket"): _*)
      else {
        val resident = spark.read.option("basePath", path)
          .parquet(dirs: _*)
          .select(groupCols.map(col) :+ col("n").as("bn") :+
            col("sv").as("bs") :+ col("pbucket"): _*)
        // full outer: resident-only groups keep their bucket; the
        // bucket of delta-only groups comes from the delta side
        d.join(resident, groupCols.map(c => d(c) === resident(c))
            .reduce(_ && _), "full_outer")
          .select(
            groupCols.map(c => coalesce(d(c), resident(c)).as(c)) :+
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n") :+
            (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L)))
              .as("sv") :+
            coalesce(d("pbucket"), resident("pbucket")).as("pbucket"): _*)
      }
    merged.repartition(col("pbucket"))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("pbucket").parquet(path)
  }

  /** The delta's distinct bucket directories that exist in the store —
    * the parameter-bounded collect (≤ |delta groups| longs). */
  private def touchedDirs(spark: SparkSession, path: String,
      deltaPartials: DataFrame): Seq[String] = {
    val fs = new HPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    deltaPartials.select(col("pbucket")).distinct()
      .collect().map(_.getLong(0)).toSeq
      .map(b => new HPath(path, s"pbucket=$b"))
      .filter(fs.exists(_)).map(_.toString)
  }
}
