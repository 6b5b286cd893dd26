package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained winnowing-fingerprint index: substring-level
  * partial-overlap search ([[Dedup.winnowOverlapPairs]] — the
  * plagiarism-detector shape, Schleimer et al. SIGMOD'03) against a
  * PERSISTED resident corpus instead of an all-corpus self-join per
  * pass.
  *
  * The composition is the [[SearchIndex]] shape applied to overlap
  * search: fingerprint postings (one row per (doc, distinct window
  * minimum), bk = the 48-bit fingerprint itself) ride
  * [[DedupIndex.writeKeys]]'s bucketed layout, and the per-fingerprint
  * document frequency — the input to q52's boilerplate cap — rides a
  * fingerprint-keyed [[AggState]] count store maintained in lockstep.
  * The cap CANNOT be evaluated from the index at probe time without a
  * full-index groupBy (index-sized work per probe); the maintained df
  * store turns it into a point-lookup over the batch fingerprints'
  * buckets, which is what makes the probe delta-sized.
  *
  * The daily cycle: [[absorb]] a batch (delta-sized fingerprinting +
  * bucket append + df absorb), then [[overlapProbe]] it — the probe
  * reads ≤ the batch fingerprints' buckets, drops boilerplate
  * fingerprints via the maintained dfs BEFORE the join (so one hot
  * fingerprint can never fan a probe out corpus-wide), and reports
  * exactly q52's decision surface: pairs sharing ≥ `minShared` live
  * fingerprints, both pair orders folded. Probe-after-absorb is the
  * contract (the read-your-writes discipline): the cap's dfs must
  * cover the batch itself, exactly as the from-scratch pass counts
  * the whole corpus.
  *
  * [[forget]] (right-to-be-forgotten) takes the victim DOCUMENTS, not
  * just ids: the postings tombstone is O(|ids|), but the df store has
  * no inverse without the victims' fingerprints — retracting them
  * exactly ([[AggState.retract]] — integers) means a fingerprint
  * whose df drops back under the cap STARTS generating pairs again,
  * which the survivors-only oracle pins (q290).
  *
  * Redelivery honesty: a replayed absorb appends byte-identical
  * posting rows (collapsed by the probe's distinct) but would
  * double-count the df store — so STREAM maintenance
  * ([[maintainStream]]) rides the layered epoch path instead: each
  * micro-batch's df partials land as one epoch layer
  * ([[AggState.appendDelta]] — delta-sized, byte-identical under
  * redelivery, collapsed by the (group, epoch) dedupe every read
  * applies), so a crash replay can neither double a df past the cap
  * nor double a pair count. The batch [[absorb]] assumes the
  * single-producer exactly-once contract the other stores' batch
  * paths assume.
  */
object WinnowIndex {
  private val Scheme = "winnow-fp"

  private def stamp(k: Int, w: Int,
      maxDocsPerFp: Int): Map[String, String] =
    Map("scheme" -> Scheme, "k" -> k.toString, "w" -> w.toString,
      "maxDocsPerFp" -> maxDocsPerFp.toString)

  private[ops] def dfBucket = AggState.hashBucketsOf("fp", 8)

  /** One row per (doc, DISTINCT window minimum): id = the doc, bk =
    * the fingerprint — the same native `winnow_mins` kernel as the
    * from-scratch pass, so the maintained probe lands on the oracle's
    * fingerprint sets. */
  private def fpRows(docs: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(docs.sparkSession)
    Dedup.spread(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("id"),
        explode(call_function("winnow_mins", col(textCol), lit(k),
          lit(w))).as("bk"))
  }

  private def dfRows(fps: DataFrame): DataFrame =
    fps.select(col("bk").as("fp")).withColumn("one", lit(1.0))

  /** Persist the resident corpus's fingerprint postings + df store —
    * the one full fingerprinting pass the composition ever pays. */
  def write(corpus: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, maxDocsPerFp: Int, dfPath: String,
      idxPath: String, table: String, buckets: Int = 32): Unit = {
    val fps = fpRows(corpus, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupIndex.writeKeys(fps, idxPath, table, buckets,
        stamp(k, w, maxDocsPerFp))
      AggState.write(dfRows(fps), Seq("fp"), "one", 1, dfBucket, dfPath)
    } finally fps.unpersist()
  }

  /** Absorb a day's batch: delta-sized fingerprinting, bucket append
    * into the postings, exact df absorb — resident files untouched. */
  def absorb(batch: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, maxDocsPerFp: Int, dfPath: String,
      idxPath: String, table: String, buckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    DedupIndex.checkProps(spark, table, ("scheme", Scheme),
      ("k", k.toString), ("w", w.toString),
      ("maxDocsPerFp", maxDocsPerFp.toString))
    val fps = fpRows(batch, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupIndex.absorbKeys(fps, idxPath, table, buckets,
        stamp(k, w, maxDocsPerFp))
      AggState.absorb(spark, dfPath, dfRows(fps), Seq("fp"), "one", 1,
        dfBucket)
    } finally fps.unpersist()
  }

  /** One micro-batch of stream maintenance under an explicit epoch id
    * — the body [[maintainStream]] checkpoints, exposed so a gate can
    * replay a crashed batch under ITS OWN epoch (the q272 manifest
    * discipline): postings append (probe-distinct collapses replays) +
    * one df epoch layer (the (group, epoch) dedupe collapses
    * replays). */
  def absorbEpoch(batch: DataFrame, epochId: Long, textCol: String,
      idCol: String, k: Int, w: Int, maxDocsPerFp: Int, dfPath: String,
      idxPath: String, table: String, buckets: Int = 32): Unit = {
    val spark = batch.sparkSession
    DedupIndex.checkProps(spark, table, ("scheme", Scheme),
      ("k", k.toString), ("w", w.toString),
      ("maxDocsPerFp", maxDocsPerFp.toString))
    val fps = fpRows(batch, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupIndex.absorbKeys(fps, idxPath, table, buckets,
        stamp(k, w, maxDocsPerFp))
      AggState.appendDelta(dfPath, dfRows(fps), epochId, Seq("fp"),
        "one", 1, dfBucket)
    } finally fps.unpersist()
  }

  /** Maintain from a STREAM of document arrivals: each micro-batch
    * [[absorbEpoch]]ed under its stream batch id (see the object
    * doc's redelivery argument — at-least-once replays are invisible
    * to both the postings read and the layered df read). */
  def maintainStream(stream: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, maxDocsPerFp: Int, dfPath: String,
      idxPath: String, table: String, checkpoint: String,
      buckets: Int = 32): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        absorbEpoch(batch, batchId, textCol, idCol, k, w, maxDocsPerFp,
          dfPath, idxPath, table, buckets)
      }
      .start()

  /** Right-to-be-forgotten: tombstone the victims out of the postings
    * (O(|ids|)) and retract their fingerprints from the df store
    * exactly — takes the victim DOCUMENTS (see the object doc). */
  def forget(victims: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, dfPath: String, table: String): Unit = {
    val spark = victims.sparkSession
    val fps = fpRows(victims, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupIndex.delete(spark, table, victims.select(col(idCol)))
      AggState.retract(spark, dfPath, dfRows(fps), Seq("fp"), "one", 1,
        dfBucket)
    } finally fps.unpersist()
  }

  /** All overlap pairs TOUCHING `batch` (probe-after-absorb — see the
    * object doc): (id_a, id_b, n_shared) with id_a < id_b, exactly
    * q52's decision surface restricted to pairs with a batch side.
    * The batch's fingerprints are df-capped via the maintained store
    * BEFORE the posting join, so the join reads ≤ the surviving
    * fingerprints' buckets and fans out ≤ maxDocsPerFp per key. */
  def overlapProbe(spark: SparkSession, table: String, dfPath: String,
      batch: DataFrame, textCol: String, idCol: String,
      k: Int, w: Int, minShared: Int, maxDocsPerFp: Int): DataFrame = {
    DedupIndex.checkProps(spark, table, ("scheme", Scheme),
      ("k", k.toString), ("w", w.toString),
      ("maxDocsPerFp", maxDocsPerFp.toString))
    // feeds the df lookup's key set AND the posting join — persist,
    // or each consumer re-runs the fingerprint kernel (the session
    // cache-clear between queries releases it)
    val bf = fpRows(batch, textCol, idCol, k, w)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val live = AggState
      .mergedFor(spark, dfPath, bf.select(col("bk").as("fp")),
        Seq("fp"), dfBucket)
      .filter(col("n") <= maxDocsPerFp)
      .select(col("fp").as("bk"))
    val capped = bf.join(live, Seq("bk"), "left_semi")
    val shared = DedupIndex.probeKeys(spark, table,
        capped.select(col("bk"), col("id").as("new_id")))
      .filter(col("id") =!= col("new_id"))
      .select(least(col("id"), col("new_id")).as("id_a"),
        greatest(col("id"), col("new_id")).as("id_b"), col("bk"))
      .distinct()
    shared.groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
