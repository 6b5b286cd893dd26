package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-band index: the storage layout that makes
  * INCREMENTAL near-dup detection resident-shuffle-free at scale.
  *
  * [[Dedup.bandKeys]] + [[Dedup.candidatePairs]] recompute and
  * re-shuffle the whole corpus's band keys for every dedup pass —
  * correct for one-shot jobs, but the deployment reality at 100 TB is
  * a small daily delta probed against an enormous resident corpus.
  * This operator persists the resident band keys ONCE as a
  * bucketed+sorted table (`bucketBy(buckets, "bk")` — the shuffle is
  * paid at write time), so a probe batch joins against co-located
  * files: only the delta's band keys are computed and shuffled, and
  * the resident side's scan carries NO Exchange in the plan
  * (DedupIndexSpec pins this with broadcast disabled). The join key is
  * the FOLDED band identity `bk = band || ':' || band_key` —
  * equivalent to equality on the (band, band_key) pair (the ':'
  * separator is unambiguous: band is an int, band_key fixed-width
  * hex) — because co-partitioned joins require the bucketing keys to
  * be EXACTLY the join keys (`requireAllClusterKeysForCoPartition`),
  * so bucketing on a subset would force the resident re-shuffle this
  * layout exists to avoid. Band keys are ~bands rows of (id, short
  * string) per document — the index is a tiny fraction of the corpus
  * it guards.
  *
  * The hashing parameters live in the table's metadata-free contract:
  * callers pass the same (bands, rowsPerBand, shingleK) to [[probe]]
  * that built the index — q207's gate runs both sides through the
  * shared [[Dedup.bandKeys]] so they cannot drift.
  */
object DedupIndex {

  /** Write `resident`'s band keys as a bucketed+sorted external table.
    * The one full shuffle this layout ever pays. */
  def write(resident: DataFrame, textCol: String, idCol: String,
      bands: Int, rowsPerBand: Int, shingleK: Int,
      path: String, table: String, buckets: Int = 32): Unit = {
    Dedup.bandKeys(resident, textCol, idCol, bands, rowsPerBand, shingleK)
      .select(col("id"), foldedKey)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "bk").sortBy("bk")
      .option("path", path).saveAsTable(table)
  }

  /** band ‖ ':' ‖ band_key as ONE column — see the class doc. */
  private def foldedKey =
    concat_ws(":", col("band").cast("string"), col("band_key")).as("bk")

  /** Absorb a checked batch into the resident index: its band keys are
    * appended INTO the bucketed table (same bucket spec — Spark
    * validates it), so tomorrow's delta probes against today's corpus
    * without any rewrite of the resident files. The daily cycle is
    * probe → verify → [[absorb]]. `buckets` must match [[write]]'s. */
  def absorb(batch: DataFrame, textCol: String, idCol: String,
      bands: Int, rowsPerBand: Int, shingleK: Int,
      path: String, table: String, buckets: Int = 32): Unit = {
    Dedup.bandKeys(batch, textCol, idCol, bands, rowsPerBand, shingleK)
      .select(col("id"), foldedKey)
      .write.mode(SaveMode.Append)
      .bucketBy(buckets, "bk").sortBy("bk")
      .option("path", path).saveAsTable(table)
  }

  /** Rewrite the bucketed table so each bucket is ONE sorted file
    * again: a bucketed write does NOT coalesce per-bucket output (each
    * task emits its own file per bucket it holds), and every [[absorb]]
    * adds another generation of files — after many days the probe's
    * cost shifts from rows to file-open overhead (the
    * [[AnnIndex.compact]] moment). The rows are rewritten
    * `repartition(buckets, bk)` — the same murmur3 hash bucketing
    * uses — so each task holds exactly one bucket and emits exactly
    * one file. The rewrite stages to a sibling generation directory
    * under a temporary catalog name, then swaps with DROP + ALTER
    * RENAME and deletes the old generation; the location alternates
    * between `_genA`/`_genB` suffixes, so the caller addresses the
    * index by TABLE name only (as [[probe]] does). Crash honesty: the
    * catalog is session-scoped and the index is rebuildable from the
    * corpus, so a crash mid-swap costs a rebuild, never data — the
    * full swap protocol [[AnnIndex.recover]] implements is not needed
    * here and deliberately not duplicated. */
  def compact(spark: SparkSession, table: String,
      buckets: Int = 32): Unit = {
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val oldLoc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(ident).location)
    val newName =
      if (oldLoc.getName.endsWith("_genA"))
        oldLoc.getName.stripSuffix("_genA") + "_genB"
      else if (oldLoc.getName.endsWith("_genB"))
        oldLoc.getName.stripSuffix("_genB") + "_genA"
      else oldLoc.getName + "_genA"
    val newLoc = new org.apache.hadoop.fs.Path(oldLoc.getParent, newName)
    val tmpTable = table + "_compacting"
    spark.sql(s"DROP TABLE IF EXISTS $tmpTable")
    // read the FILES, not the table: a table read advertises its
    // bucketing, so Catalyst deems HashPartitioning(bk, buckets)
    // already satisfied and ELIDES the repartition — while the actual
    // scan may coalesce mixed-bucket file splits (auto-bucketed-scan
    // is per-query), leaving every writer task holding every bucket
    // and emitting tasks×buckets files. The raw-parquet read forces a
    // real shuffle whose partition index IS the writer's bucket id
    // (both are pmod(murmur3(bk), buckets)), so each task holds
    // exactly one bucket and emits exactly one file.
    spark.read.parquet(oldLoc.toString)
      .repartition(buckets, col("bk"))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, "bk").sortBy("bk")
      .option("path", newLoc.toString).saveAsTable(tmpTable)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmpTable RENAME TO $table")
    val fs = oldLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(oldLoc, true)
  }

  /** Candidate near-dup pairs between a probe `batch` and the resident
    * index: (new_id, resident_id), distinct, any shared band. Only the
    * batch's band keys are computed and shuffled; the resident table
    * streams from its co-located buckets. Verification (exact Jaccard
    * on the candidate pairs) composes downstream exactly as with
    * [[Dedup.candidatePairs]]. */
  def probe(spark: SparkSession, table: String, batch: DataFrame,
      textCol: String, idCol: String,
      bands: Int, rowsPerBand: Int, shingleK: Int): DataFrame = {
    val probeKeys = Dedup
      .bandKeys(batch, textCol, idCol, bands, rowsPerBand, shingleK)
      .select(col("id").as("new_id"), foldedKey)
    spark.table(table)
      .join(probeKeys, Seq("bk"))
      .filter(col("id") =!= col("new_id"))
      .select(col("new_id"), col("id").as("resident_id"))
      .distinct()
  }
}
