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
