package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted INVERTED INDEX for incremental BM25 retrieval — the
  * maintained form of [[TextAnalysis.bm25]] (q49), and the retrieval
  * store a training-data pipeline needs once decontamination and
  * dedup queries run DAILY against a growing corpus: re-scoring the
  * whole corpus per query is a full scan ([[TextAnalysis.bm25]]'s
  * honest cost), while a maintained postings index answers the same
  * query from ≤ \|terms\| bucket files.
  *
  * Pure COMPOSITION over three existing-kind stores — no new
  * persistence machinery:
  *
  *  - POSTINGS ride [[DedupIndex.writeKeys]]'s key-agnostic
  *    bucketed+sorted table: one row per (doc, term) with `bk` = the
  *    term and the payload columns `tf` (term frequency) and `dl`
  *    (document length) beside it, so scoring needs NO second lookup
  *    (the dHash-index payload argument; the maintain-a-search-index-
  *    incrementally deployment shape is the reference's own —
  *    `src/sinker/sinker.py:52-72` backfills a search index once and
  *    `runner.py` keeps it fresh per delta — re-expressed here with
  *    the index as a native Spark bucketed table instead of an
  *    external ES cluster). Absorb is an append into the bucketed
  *    layout (resident files untouched), delete is the inherited
  *    tombstone + compact purge, geometry migration is the inherited
  *    rebucket/maybeRebucket.
  *  - CORPUS STATS (n_docs, Σdl — the BM25 normalizer inputs) ride a
  *    single-group [[AggState]] sum store: absorb/retract at delta
  *    cost, exact integers (quantScale 1 on an integral dl).
  *  - PER-TERM DOCUMENT FREQUENCIES ride a term-keyed [[AggState]]
  *    count store beside the stats store (path convention
  *    `statsPath + "_df"`): one counter per vocabulary term,
  *    absorb/retract/layered-epoch at delta cost — the [[bm25TopK]]
  *    `maxDf` gatekeeper that drops stop-word-class terms BEFORE
  *    their corpus-sized posting bucket is read.
  *
  * ==Determinism==
  * The scoring expression is IDENTICAL to [[TextAnalysis.bm25]]'s
  * column tree (same cast/fold order), over the same exact-integer
  * inputs: tf/dl from the postings payload, df = distinct live docs
  * per term (a count over the probed buckets only), n_docs/avgdl from
  * the stats store — so the maintained top-k is bit-identical to the
  * from-scratch q49 computation restricted to docs that contain ≥ 1
  * query term (docs with zero hits score exactly 0 and have no
  * postings to read; the q270 oracle applies the same restriction).
  *
  * ==Replay safety==
  * An at-least-once redelivered absorb appends byte-identical
  * (id, bk, tf, dl) rows. Every read collapses them: tf via
  * max-per-(doc, term), df via countDistinct, dl rides the group key —
  * so a replay is invisible to scoring (q272 gates it), and the next
  * [[DedupIndex.compact]] removes the duplicates physically (its
  * (id, bk) dedupe keeps payloads, which are identical by
  * construction).
  *
  * ==100 TB shape==
  * A query reads ≤ \|terms\| buckets of the postings table (literal
  * `isin` bucket pruning — [[DedupIndex.liveLiteralKeys]]), aggregates
  * ≤ Σᵢ dfᵢ posting rows, broadcasts one stats row, and top-k's with
  * TakeOrderedAndProject. The honest skew point — a stop-word-class
  * term whose posting list is corpus-sized — is CODE, not caller
  * discipline: a third maintained store (per-term document
  * frequencies, an [[AggState]] count store beside the corpus stats)
  * lets [[bm25TopK]] drop any term whose LIVE df exceeds `maxDf`
  * BEFORE the posting read (finite default [[DefaultMaxDf]] — the
  * [[Multimodal.dHashNearDupPairs]] `maxBucket` discipline, retrieval
  * edition), so no probe ever reads more than \|terms\| · maxDf
  * posting rows no matter what the user types. Nothing here
  * materializes an uncapped list on the driver. */
object SearchIndex {

  private val Scheme = "bm25-postings-v1"
  private def statsBucket = lit(0L)
  private val StatsGroup = Seq("g")

  /** The df store rides beside the stats store — derived, so no public
    * signature carries a third path. */
  private def dfPath(statsPath: String): String = statsPath + "_df"
  /** The derived df-store location — exposed for gates/telemetry
    * (e.g. layer-count checks after [[compact]]). */
  def dfPathOf(statsPath: String): String = dfPath(statsPath)
  private val DfGroup = Seq("t")
  private def dfBucket = AggState.hashBucketsOf("t", 32)

  /** One (t, one) row per (doc, term) — grouped by the store, n per
    * term IS the document frequency (postings are one row per
    * (doc, term) by construction). */
  private def dfRows(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    postings(docs, textCol, idCol)
      .select(col("bk").as("t")).withColumn("one", lit(1.0))

  /** One row per (doc, term): (id, bk = term, tf, dl) — the postings
    * of `docs`, exact integers, empty documents contribute none (they
    * can never match; they still count in the STATS store). */
  def postings(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        TextAnalysis.words(col(textCol)).as("__ws"))
      .select(col("id"), size(col("__ws")).cast("long").as("dl"),
        explode(col("__ws")).as("bk"))
      .groupBy(col("id"), col("bk"), col("dl"))
      .agg(count(lit(1)).as("tf"))
      .select(col("id"), col("bk"), col("tf"), col("dl"))

  /** The (g, dl) rows the stats store aggregates — one per document,
    * INCLUDING empty ones (BM25's n_docs and avgdl are corpus-wide). */
  private def docLens(docs: DataFrame, textCol: String,
      idCol: String): DataFrame =
    docs.select(col(idCol),
        size(TextAnalysis.words(col(textCol))).cast("double").as("dl"))
      .withColumn("g", lit(0L))

  /** Build the index triple: postings as a bucketed external table
    * (the one full shuffle this layout pays), stats as a single-group
    * sum store, per-term document frequencies as a term-keyed count
    * store (the [[bm25TopK]] `maxDf` gatekeeper). */
  def write(docs: DataFrame, textCol: String, idCol: String,
      statsPath: String, path: String, table: String,
      buckets: Int = 32): Unit = {
    DedupIndex.writeKeys(postings(docs, textCol, idCol), path, table,
      buckets, Map("scheme" -> Scheme))
    AggState.write(docLens(docs, textCol, idCol), StatsGroup, "dl", 1,
      statsBucket, statsPath)
    AggState.write(dfRows(docs, textCol, idCol), DfGroup, "one", 1,
      dfBucket, dfPath(statsPath))
  }

  /** Fold a document batch in: postings APPEND into the bucketed
    * layout (resident files untouched — tomorrow's queries see
    * today's corpus with no rewrite), stats absorb at delta cost. */
  def absorb(docs: DataFrame, textCol: String, idCol: String,
      statsPath: String, path: String, table: String,
      buckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    DedupIndex.absorbKeys(postings(docs, textCol, idCol), path, table,
      buckets, Map("scheme" -> Scheme))
    AggState.absorb(spark, statsPath, docLens(docs, textCol, idCol),
      StatsGroup, "dl", 1, statsBucket)
    AggState.absorb(spark, dfPath(statsPath),
      dfRows(docs, textCol, idCol), DfGroup, "one", 1, dfBucket)
  }

  /** Right-to-be-forgotten: the victims' postings tombstone
    * (O(\|victims\|), purged physically by the next
    * [[DedupIndex.compact]]), their dl mass retracts EXACTLY from the
    * stats store (counts/sums are abelian). Scoring excludes them the
    * moment this returns: live reads anti-join the tombstones, df is
    * a live count, and the stats row already reflects the
    * retraction. */
  def deleteDocs(victims: DataFrame, textCol: String, idCol: String,
      statsPath: String, table: String): Unit = {
    val spark = victims.sparkSession
    DedupIndex.delete(spark, table, victims.select(col(idCol)))
    AggState.retract(spark, statsPath,
      docLens(victims, textCol, idCol), StatsGroup, "dl", 1,
      statsBucket)
    AggState.retract(spark, dfPath(statsPath),
      dfRows(victims, textCol, idCol), DfGroup, "one", 1, dfBucket)
  }

  /** Maintain the pair from a STREAM of documents — the
    * [[DedupIndex.maintainStream]] shape: each micro-batch is one
    * [[absorb]] under a checkpointed foreachBatch. A crash between
    * the absorb and the checkpoint commit replays the batch; the
    * postings side collapses at read (see the class doc) and the
    * stats side ... does NOT (absorb is at-most-once) — so the stream
    * wrapper routes stats through the LAYERED path instead:
    * [[AggState.appendDelta]] under the batch's epoch id, whose
    * (group, epoch) dedupe makes the replay invisible (q215's
    * contract). Compact both sides on their usual schedules. */
  def maintainStream(stream: DataFrame, textCol: String, idCol: String,
      statsPath: String, path: String, table: String,
      checkpoint: String, buckets: Int = 32)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        appendEpoch(batch, textCol, idCol, statsPath, path, table,
          epochId, buckets)
      }
      .start()

  /** One micro-batch's maintenance under an explicit epoch id — the
    * foreachBatch body of [[maintainStream]], public so a crash
    * redelivery (same batch, same epoch id) can be driven and gated
    * directly: the postings append collapses at read (max/
    * countDistinct), the stats and df layers dedupe on
    * (group, epoch). */
  def appendEpoch(docs: DataFrame, textCol: String, idCol: String,
      statsPath: String, path: String, table: String, epochId: Long,
      buckets: Int = 32): Unit = {
    DedupIndex.absorbKeys(postings(docs, textCol, idCol), path, table,
      buckets, Map("scheme" -> Scheme))
    AggState.appendDelta(statsPath, docLens(docs, textCol, idCol),
      epochId, StatsGroup, "dl", 1, statsBucket)
    AggState.appendDelta(dfPath(statsPath),
      dfRows(docs, textCol, idCol), epochId, DfGroup, "one", 1,
      dfBucket)
  }

  /** Scheduled maintenance for the whole triple, one entry point so
    * the three stores share a schedule: the postings table is
    * rewritten (tombstones purged physically, redelivery duplicates
    * dropped, one sorted file per bucket — [[DedupIndex.compact]]),
    * and the stats/df stores fold their epoch layers back into the
    * consolidated generation when more than `maxLayers` are resident
    * ([[AggState.maybeCompactState]] — a no-op between stream runs
    * that appended fewer). Answers are invariant by construction:
    * every read already collapses what compaction removes. */
  def compact(spark: SparkSession, table: String, statsPath: String,
      buckets: Int = 32,
      maxLayers: Long = AggState.DefaultMaxLayers): Unit = {
    DedupIndex.compact(spark, table, buckets)
    AggState.maybeCompactState(spark, statsPath, StatsGroup, maxLayers)
    AggState.maybeCompactState(spark, dfPath(statsPath), DfGroup,
      maxLayers)
  }

  /** The maintained per-term LIVE document frequencies — the (t, df)
    * view over the df store (layers collapsed, retractions applied).
    * Summary-sized: \|vocabulary\| rows, never the corpus. A literal
    * term filter on top pushes to the store's parquet scan. */
  def termDfs(spark: SparkSession, statsPath: String): DataFrame =
    AggState.merged(spark, dfPath(statsPath), DfGroup)
      .select(col("t"), col("n").as("df"))

  /** Live df for a literal term bag — the pruned point-lookup
    * ([[AggState.mergedFor]]: ≤ \|terms\| partition directories read,
    * never the whole vocabulary), ≤ \|terms\| rows collected (the
    * parameter-bounded driver read [[bm25TopK]]'s cap decision needs);
    * terms absent from the store map to 0. */
  def termDf(spark: SparkSession, statsPath: String,
      terms: Seq[String]): Map[String, Long] = {
    val keys = spark.createDataFrame(terms.map(Tuple1(_))).toDF("t")
    val stored = AggState
      .mergedFor(spark, dfPath(statsPath), keys, DfGroup, dfBucket)
      .select(col("t"), col("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    terms.map(t => t -> stored.getOrElse(t, 0L)).toMap
  }

  /** Posting-read budget per query term, in live-document rows: a term
    * whose maintained df exceeds this is dropped BEFORE the posting
    * read (see [[bm25TopK]]). 2^20 — a few tens of MB of posting rows
    * per term, readable on any executor; `Long.MaxValue` to uncap. */
  val DefaultMaxDf: Long = 1L << 20

  /** BM25 top-k for a literal term bag over the maintained triple —
    * (id, dl, score) ordered by (rounded score desc, id asc), the q49
    * presentation. Reads ≤ \|terms\| df rows + ≤ \|terms\| pruned
    * posting buckets + one stats row; never the corpus.
    *
    * `maxDf` is the stop-term discipline as code: each query term's
    * LIVE df is looked up in the maintained df store first (a
    * summary-sized read, ≤ \|terms\| rows collected), and terms whose
    * df exceeds `maxDf` are dropped before any posting bucket is
    * touched — so a stop-word-class term can never force a
    * corpus-sized posting read. RECALL SEMANTICS, stated: a dropped
    * term contributes 0 to every score instead of its true value
    * (≈ 0 when df ≈ n_docs — the motivating stop-word case — but
    * material when maxDf is set far below a rare-at-this-corpus-size
    * term's relevance), and a doc matching ONLY dropped terms leaves
    * the candidate set entirely; all terms dropped returns an empty
    * top-k. Size `maxDf` as a read budget, like
    * [[Multimodal.dHashNearDupPairs]]'s `maxBucket`. */
  def bm25TopK(spark: SparkSession, table: String, statsPath: String,
      terms: Seq[String], k: Int, k1: Double = 1.2,
      b: Double = 0.75, maxDf: Long = DefaultMaxDf): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(maxDf > 0, s"maxDf must be positive, got $maxDf")
    DedupIndex.checkProps(spark, table, "scheme" -> Scheme)
    val liveDf = termDf(spark, statsPath, terms)
    val kept = terms.filter(liveDf(_) <= maxDf)
    if (kept.isEmpty)
      return spark.table(table)
        .select(col("id"), col("dl"), lit(0.0).as("score")).limit(0)
    val hits = DedupIndex.liveLiteralKeys(spark, table, kept)
    // per-doc tf per term: max (not sum) collapses at-least-once
    // redelivery duplicates; dl rides the group key
    val tfCols = kept.zipWithIndex.map { case (t, i) =>
      coalesce(max(when(col("bk") === lit(t), col("tf"))), lit(0L))
        .as(s"tf$i")
    }
    val perDoc = hits.groupBy(col("id"), col("dl"))
      .agg(tfCols.head, tfCols.tail: _*)
    // per-term document frequencies over the SAME probed rows
    // (countDistinct: replay-safe — the df STORE is exact too, but
    // scoring from the probed rows keeps the q49 bit-identity
    // argument local to one input), corpus stats from the sum store
    val dfCols = kept.zipWithIndex.map { case (t, i) =>
      countDistinct(when(col("bk") === lit(t), col("id"))).as(s"df$i")
    }
    val dfRow = hits.agg(dfCols.head, dfCols.tail: _*)
    val stats = AggState.merged(spark, statsPath, StatsGroup)
      .select(col("n").as("n_docs"),
        (col("sv").cast("double") / col("n")).as("avgdl"))
    // the EXACT TextAnalysis.bm25 column tree, so the maintained path
    // lands on bit-identical doubles
    val score = kept.indices.map { i =>
      val idf = log(
        ((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5)) + lit(1.0))
      val inner = lit(1.0) - lit(b) +
        lit(b) * (col("dl").cast("double") / col("avgdl"))
      idf * ((col(s"tf$i").cast("double") * (lit(k1) + lit(1.0))) /
        (col(s"tf$i").cast("double") + lit(k1) * inner))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(dfRow)).crossJoin(broadcast(stats))
      .select(col("id"), col("dl"), round(score, 6).as("score"))
      .orderBy(col("score").desc, col("id").asc)
      .limit(k)
  }
}
