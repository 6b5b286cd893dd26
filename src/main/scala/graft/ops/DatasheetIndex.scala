package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintained corpus datasheet — the per-source release report card
  * (doc/token masses, language spread, exact-duplicate rate; the
  * "datasheets for datasets" table q147 computes from scratch) kept
  * current INCREMENTALLY, so the daily report never re-scans the
  * corpus. A pure composition over the repo's persisted stores
  * (the [[ContamIndex]]/[[SearchIndex]]/[[WinnowIndex]] discipline —
  * no new storage kind):
  *
  *  - a content-hash index on [[DedupIndex.writeKeys]]'s bucketed
  *    layout (bk = md5(text), the doc's source riding as payload) —
  *    the ONLY corpus-sized state, and it is exactly the exact-dedup
  *    index a curation deployment already keeps;
  *  - three [[AggState]] fact stores: (source) doc/token masses,
  *    (source, lang) doc counts (the language spread is the count of
  *    live groups per source), and (source) CURRENTLY-DUPLICATE doc
  *    counts.
  *
  * The interesting maintenance is the duplicate rate: "dup" is a
  * corpus-global property (does this text recur ANYWHERE), so a new
  * batch can flip RESIDENT docs — a unique resident becomes a
  * duplicate the moment a second copy arrives. [[absorb]] detects
  * exactly those transitions with one bucket-pruned probe of the
  * batch's hashes (store rows for the batch's keys, batch ids
  * excluded): a hash with one prior distinct owner and ≥ 1 arrival
  * flips that owner (+1 its source); a batch doc is a duplicate on
  * arrival iff its hash had ≥ 1 prior owner or recurs within the
  * batch. [[forget]] runs the inverse transition: a victim that was
  * duplicated stops counting, and a hash left with exactly ONE
  * survivor flips that survivor BACK to unique (−1 its source) — the
  * [[WinnowIndex]] cap-re-entry symmetry, applied to dup tracking.
  *
  * At-least-once discipline: [[absorb]] derives its transition facts
  * against the store EXCLUDING the batch's own ids, so a crash
  * replay re-derives byte-identical rows; every store write is an
  * [[AggState.appendDelta]] epoch layer (the (group, epoch) dedupe
  * collapses the replay) and the hash-index read side counts
  * DISTINCT doc ids (a replayed [[DedupIndex.absorbKeys]] append is
  * invisible). [[forget]] uses [[AggState.retract]] — at-most-once,
  * the repo-wide retraction contract. Inherited maintenance
  * (compact/rebucket/policies) rides [[DedupIndex]] and [[AggState]]
  * unchanged.
  *
  * 100 TB shape: the [[datasheet]] read touches only the three
  * parameter-bounded summaries (≤ \|sources\| + \|sources × langs\|
  * rows) — never the corpus, never the hash index; [[absorb]] pays
  * delta work only (the probe reads ≤ the batch's hash buckets).
  * Reference: the reference ships per-table sync stats the same way —
  * maintained counters, not re-scans (`sinker.py:52-72`). */
object DatasheetIndex {
  private val Scheme = "datasheet-md5-v1"
  private[ops] def srcBucket: Column = AggState.hashBucketsOf("source", 8)
  private[ops] def srcLangBucket: Column =
    pmod(hash(col("source"), col("lang")), lit(8)).cast("long")

  private def basePath(dir: String) = s"$dir/base"
  private def langPath(dir: String) = s"$dir/lang"
  private def dupPath(dir: String) = s"$dir/dup"
  private def idxPath(dir: String) = s"$dir/idx"

  /** One row per doc: (id, source, lang, toks, h) — md5 content key
    * and the q147 whitespace token count, computed in the scan. */
  private def docRows(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("id"), col("source"), col("lang"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("toks"),
      md5(col(textCol)).as("h"))

  /** Build the composition from the initial corpus: the one
    * from-scratch pass (the dup facts need the full hash
    * doc-frequency once — after this, [[absorb]]/[[forget]] keep
    * them current from deltas). */
  def write(docs: DataFrame, textCol: String, idCol: String,
      outDir: String, table: String, buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    val rows = docRows(docs, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      DedupIndex.writeKeys(
        rows.select(col("h").as("bk"), col("id"), col("source").as("src")),
        idxPath(outDir), table, buckets, Map("scheme" -> Scheme))
      AggState.write(rows, Seq("source"), "toks", 1, srcBucket,
        basePath(outDir))
      AggState.write(rows.withColumn("one", lit(1.0)),
        Seq("source", "lang"), "one", 1, srcLangBucket, langPath(outDir))
      val dupH = rows.groupBy(col("h"))
        .agg(countDistinct(col("id")).as("nh"))
        .filter(col("nh") >= 2).select(col("h"))
      val dupFacts = rows.join(dupH, Seq("h"), "left_semi")
        .select(col("source"), lit(1.0).as("one"))
      // one zero-valued seed row per source: keeps the store
      // materialized (and its groups live — n counts the seed, reads
      // use sv) even when the initial corpus holds no duplicates at
      // all, so a later absorb/retract always finds a stamped store
      val seeds = rows.select(col("source")).distinct()
        .withColumn("one", lit(0.0))
      AggState.write(dupFacts.unionByName(seeds), Seq("source"), "one",
        1, srcBucket, dupPath(outDir))
    } finally rows.unpersist()
  }

  /** Absorb an arriving batch as epoch `epochId` — delta-sized work:
    * one bucket-pruned hash probe + three epoch-layer appends + the
    * bucketed index append. Safe under at-least-once redelivery of
    * the same (batch, epochId): see the class doc. */
  def absorb(delta: DataFrame, textCol: String, idCol: String,
      outDir: String, table: String, epochId: Long,
      buckets: Int = 32): Unit = {
    val spark = delta.sparkSession
    DedupIndex.checkProps(spark, table, ("scheme", Scheme))
    val rows = docRows(delta, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // prior owners of the batch's hashes, batch ids excluded — the
      // exclusion is what makes a crash replay re-derive byte-identical
      // transitions (on redelivery the store already holds the batch's
      // rows; without it every batch doc would see itself as a prior
      // owner). countDistinct absorbs duplicate index rows from a
      // replayed append.
      val prior = DedupIndex
        .probeKeys(spark, table, rows.select(col("h").as("bk")).distinct())
        .join(rows.select(col("id")), Seq("id"), "left_anti")
      val priorAgg = prior.groupBy(col("bk"))
        .agg(countDistinct(col("id")).as("pc"),
          // pc == 1 ⇒ one distinct id: max(struct) picks it (and its
          // source) deterministically even if a replayed append left
          // duplicate rows for it
          max(struct(col("id"), col("src"))).as("owner"))
      val bCnt = rows.groupBy(col("h"))
        .agg(countDistinct(col("id")).as("bc"))
      // batch docs that arrive as duplicates: a prior owner exists, or
      // the batch itself carries a second copy
      val batchDups = rows
        .join(bCnt, Seq("h"))
        .join(priorAgg.select(col("bk").as("h"), col("pc")), Seq("h"),
          "left")
        .filter(coalesce(col("pc"), lit(0L)) >= 1 || col("bc") >= 2)
        .select(col("source"), lit(1.0).as("one"))
      // residents flipped unique → duplicate by the batch's arrival
      val flips = priorAgg.filter(col("pc") === 1)
        .select(col("owner.src").as("source"), lit(1.0).as("one"))
      AggState.appendDelta(dupPath(outDir), batchDups.unionAll(flips),
        epochId, Seq("source"), "one", 1, srcBucket)
      AggState.appendDelta(basePath(outDir), rows, epochId,
        Seq("source"), "toks", 1, srcBucket)
      AggState.appendDelta(langPath(outDir),
        rows.withColumn("one", lit(1.0)), epochId,
        Seq("source", "lang"), "one", 1, srcLangBucket)
      DedupIndex.absorbKeys(
        rows.select(col("h").as("bk"), col("id"), col("source").as("src")),
        idxPath(outDir), table, buckets, Map("scheme" -> Scheme))
    } finally rows.unpersist()
  }

  /** Right-to-be-forgotten: withdraw the victim DOCUMENTS (the fact
    * stores have no inverse without their masses — the
    * [[WinnowIndex.forget]] contract). Tombstones the hash index by
    * id and retracts exact fact rows, including the dup flip-backs: a
    * hash left with exactly one survivor stops counting that survivor
    * as a duplicate. AT-MOST-ONCE per victim batch. */
  def forget(victims: DataFrame, textCol: String, idCol: String,
      outDir: String, table: String): Unit = {
    val spark = victims.sparkSession
    DedupIndex.checkProps(spark, table, ("scheme", Scheme))
    val vRows = docRows(victims, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // live view of the victims' hashes BEFORE the tombstones land
      val live = DedupIndex
        .probeKeys(spark, table, vRows.select(col("h").as("bk")).distinct())
      val vIds = vRows.select(col("id"))
      val vCnt = vRows.groupBy(col("h"))
        .agg(countDistinct(col("id")).as("vc"))
      val totalAgg = live.groupBy(col("bk"))
        .agg(countDistinct(col("id")).as("tc"))
      val survAgg = live.join(vIds, Seq("id"), "left_anti")
        .groupBy(col("bk"))
        .agg(countDistinct(col("id")).as("sc"),
          max(struct(col("id"), col("src"))).as("survivor"))
      val perH = vCnt
        .join(totalAgg.select(col("bk").as("h"), col("tc")), Seq("h"))
        .join(survAgg.select(col("bk").as("h"), col("sc"),
          col("survivor")), Seq("h"), "left")
        .select(col("h"), col("tc"),
          coalesce(col("sc"), lit(0L)).as("sc"), col("survivor"))
      // victims that were duplicates stop counting
      val victimDups = vRows
        .join(perH.select(col("h"), col("tc")), Seq("h"))
        .filter(col("tc") >= 2)
        .select(col("source"), lit(1.0).as("one"))
      // a hash left with exactly ONE survivor flips it back to unique
      val flipBacks = perH.filter(col("tc") >= 2 && col("sc") === 1)
        .select(col("survivor.src").as("source"), lit(1.0).as("one"))
      AggState.retract(spark, dupPath(outDir),
        victimDups.unionAll(flipBacks), Seq("source"), "one", 1,
        srcBucket)
      AggState.retract(spark, basePath(outDir), vRows, Seq("source"),
        "toks", 1, srcBucket)
      AggState.retract(spark, langPath(outDir),
        vRows.withColumn("one", lit(1.0)), Seq("source", "lang"), "one",
        1, srcLangBucket)
      DedupIndex.delete(spark, table, vIds)
    } finally vRows.unpersist()
  }

  /** The report — q147's exact column tree, answered ENTIRELY from
    * the three parameter-bounded summaries (≤ \|sources\| +
    * \|sources × langs\| rows; the corpus and the hash index are
    * never read). */
  def datasheet(spark: SparkSession, outDir: String): DataFrame = {
    val base = AggState.merged(spark, basePath(outDir), Seq("source"))
      .select(col("source"), col("n").as("n_docs"),
        col("sv").as("n_tokens"))
    val langs = AggState.merged(spark, langPath(outDir),
        Seq("source", "lang"))
      .groupBy(col("source")).agg(count(lit(1)).as("n_langs"))
    val dups = AggState.merged(spark, dupPath(outDir), Seq("source"))
      .select(col("source"), col("sv").as("dup_sv"))
    base.join(langs, Seq("source"))
      .join(dups, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6)
          .as("avg_tokens"),
        col("n_langs"),
        coalesce(col("dup_sv"), lit(0L)).as("n_dup_docs"),
        round(coalesce(col("dup_sv"), lit(0L)).cast("double") /
          col("n_docs"), 6).as("dup_frac"))
  }
}
