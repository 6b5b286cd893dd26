package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{GraftSession, Tables}
import graft.ops.{AggState, AnnIndex, ContamIndex, Dedup, DedupIndex, SearchIndex, SemDedupIndex, Similarity, TextAnalysis, WinnowIndex}

/** Scale-evidence soak (VERDICT r8, next-round item 1): every 100 TB
  * claim in SCALE.md rested on sf0.1 measurements alone, so this main
  * synthesizes larger corpora LOCALLY (no driver involvement) and
  * measures how the structurally-risky query family actually grows.
  *
  * Corpus synthesis — a re-keyed union of sf0.1, NOT a naive copy:
  * naively unioning N identical copies gives every document N exact
  * clones, which inflates the near-dup pair count quadratically and
  * would make every LSH/similarity query look super-linear for a
  * data-construction reason, not an algorithmic one. Instead each copy
  * i > 0 is salted so copies are mutually dissimilar while keeping the
  * same per-copy length/frequency SHAPE the algorithms key on:
  *  - documents: every token gets a copy-specific prefix (`s3x`), so
  *    shingle sets across copies are disjoint — near-dup structure is
  *    exactly N disjoint replicas of the base corpus's structure;
  *  - embeddings: a deterministic per-copy, per-dimension offset keeps
  *    vectors in the same range but off the clone diagonal;
  *  - events: user/event ids are re-keyed into disjoint ranges so
  *    sessions and per-user series replicate instead of merging.
  * TPC-H tables are byte-copied (the risky family doesn't read them,
  * but queries must be runnable against the dir unchanged).
  *
  * Measurement: each (scale, query) runs `RUNS` interleaved rounds
  * (same throttle discipline as [[Bench]]); the reported statistic is
  * the MIN — the warm-run floor sandbox contention cannot raise. The
  * growth exponent is the least-squares slope of log(time) vs
  * log(scale): ~1.0 = linear, and anything materially above the
  * query's documented contract is a bug, not noise.
  *
  * Output: one JSON line to stdout + the full record at
  * `bench/SCALE_soak.json` (same artifact-capture discipline as Bench).
  */
object ScaleSoak {
  private val RUNS = 2
  /** Override with SPARK_GRAFT_SCALES, e.g. "1,10,30". */
  private val Scales: Seq[Int] = sys.env.get("SPARK_GRAFT_SCALES")
    .map(_.split(",").toSeq.map(_.trim.toInt))
    .getOrElse(Seq(1, 3, 10))
  private val IdStride = 10000000L

  /** The deployment planes budget shared by every parameter-scaled ANN
    * arm: log₂(scale) planes on top of the sf0.1 base of 6, so
    * per-bucket population stays ~constant as the corpus grows. */
  private def soakPlanes(n: Int): Int =
    6 + math.round(math.log(n.toDouble) / math.log(2.0)).toInt

  /** The structurally-risky family named by the r8 verdict: iterative
    * (pagerank, recursive walk, CC), super-linear-by-contract (exact
    * all-pairs Jaccard), and fan-out-heavy (substring/sentence dedup,
    * triangles). Everything else in the registry is single-keyed-shuffle
    * linear and is covered by the per-round bench. */
  private val Risky: Seq[String] = sys.env.get("SPARK_GRAFT_SOAK_QUERIES")
    .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    .getOrElse(Seq(
      "q130_pagerank",
      "q133_exact_jaccard_join",
      "q143_substring_dedup",
      "q97_neardup_triangles",
      "q68_dupchain_walk",
      "q152_sentence_dedup",
      "q161_cluster_size_hist"))

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workRoot = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "target/scale")
    val spark = GraftSession.get()
    spark.range(1000).selectExpr("sum(id) as s")
      .write.format("noop").mode("overwrite").save()

    // synthesis is deterministic (ScaleSoakSpec pins it), so a corpus
    // already on disk from an earlier sweep is byte-equivalent — a
    // _SOAK_OK marker stamped with (base, n, SynthVersion) lets repeat
    // sweeps skip the ~minutes-long rewrite. The version token makes a
    // synthesize() change invalidate stale corpora automatically (the
    // old (base, n)-only stamp silently reused bytes from an earlier
    // formula — ADVICE r10); deleting target/scale still force-rebuilds.
    val dirs: Map[Int, String] = Scales.map { n =>
      val out = s"$workRoot/x$n"
      if (n == 1) n -> base
      else {
        val marker = Paths.get(s"$out/_SOAK_OK")
        val stamp = s"$base|x$n|synth=$SynthVersion"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          synthesize(spark, base, n, out)
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> out
      }
    }.toMap

    // SPARK_GRAFT_SOAK_ARMS selects a subset of arms by name (applies
    // to the appended structural arms too, which SPARK_GRAFT_SOAK_QUERIES
    // cannot reach) — a focused sweep, e.g. index-vs-from-scratch only.
    val armFilter: Option[Set[String]] = sys.env.get("SPARK_GRAFT_SOAK_ARMS")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def armOn(name: String): Boolean = armFilter.forall(_.contains(name))

    // annindex_topk_scaled's indexes are built ONCE per scale, OUTSIDE
    // the timed loop (the deployment shape: write once, query many) —
    // the arm then times ONLY the probe-pruned read path, the number
    // the index exists to improve. Same planes ≈ log₂(scale) budget as
    // the from-scratch multi-probe arm it is compared against.
    val annIdx: Map[Int, String] =
      if (!armOn("annindex_topk_scaled") && !armOn("annindex_delete_scaled") &&
          !armOn("annindex_rebucket_scaled"))
        Map.empty
      else dirs.map { case (n, d) =>
      val planes = soakPlanes(n)
      val out = s"$workRoot/annidx/x$n"
      val marker = Paths.get(s"$out/_IDX_OK")
      val stamp = s"$d|planes=$planes|synth=$SynthVersion|idx=${AnnIndex.LayoutVersion}"
      if (!(Files.exists(marker) &&
          new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
        AnnIndex.write(Tables.embeddings(spark, d), planes, s"$out/idx")
        Files.write(marker, stamp.getBytes("UTF-8"))
      }
      n -> s"$out/idx"
    }

    // round-14 persisted-index arms: the banded and IVF layouts' probe
    // paths under the same constant-bucket-population discipline as
    // annindex_topk_scaled. Banded: bands fixed at 3, planesPerBand
    // grows as log₂(scale) so each band's per-bucket population stays
    // ~constant — probe IO is Q·bands directories of ~fixed size.
    // IVF: nClusters grows ∝ scale so cell size stays ~constant —
    // probe IO is Q·nProbe cells of ~fixed size. Both indexes are
    // built once per scale OUTSIDE the timed loop (write once, query
    // many); the arms time only the partition-pruned read.
    def soakPlanesPerBand(n: Int): Int =
      2 + math.round(math.log(n.toDouble) / math.log(2.0)).toInt
    val bandedIdx: Map[Int, String] =
      if (!armOn("bandedidx_topk_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val ppb = soakPlanesPerBand(n)
        val out = s"$workRoot/bandedidx/x$n"
        val marker = Paths.get(s"$out/_IDX_OK")
        val stamp = s"$d|ppb=$ppb|synth=$SynthVersion|idx=${AnnIndex.LayoutVersion}"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          AnnIndex.writeBanded(Tables.embeddings(spark, d), 3, ppb,
            s"$out/idx")
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/idx"
      }
    val ivfIdx: Map[Int, String] =
      if (!armOn("ivfidx_topk_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val nClusters = 8 * n
        val out = s"$workRoot/ivfidx/x$n"
        val marker = Paths.get(s"$out/_IDX_OK")
        val stamp = s"$d|nc=$nClusters|synth=$SynthVersion|idx=${AnnIndex.LayoutVersion}"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          AnnIndex.writeIvf(Tables.embeddings(spark, d), nClusters,
            s"$out/idx")
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/idx"
      }

    // bandprobe arms: a FIXED delta (the base corpus's doc_id%10=0
    // docs) probed against a resident corpus that grows with scale —
    // the incremental-dedup deployment shape. The index is built
    // outside the timed loop (bucketed tables live in the session
    // catalog, so it is rebuilt per JVM — untimed either way); the
    // timed work is what a daily run pays: delta band keys + the join.
    // The scratch control pays the full corpus re-hash + shuffle.
    val bandIdx: Map[Int, String] =
      if (!armOn("bandprobe_index_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val table = s"graft_soak_bandidx_x$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files.createTempDirectory(s"graft-soak-bandidx-x$n").toString
        DedupIndex.write(Tables.documents(spark, d), "text", "doc_id",
          4, 4, 3, s"$out/idx", table)
        n -> table
      }

    // retrieval-index probe arm (round 18): the bm25 read's claim is
    // that a query pays ≤ |terms| literal-pruned buckets + one stats
    // row NO MATTER how large the indexed corpus — but the pruned
    // buckets themselves hold the query terms' full posting lists,
    // which GROW with the corpus, so the honest expectation is
    // sub-linear (bucket-file read ∝ posting mass of 3 common terms),
    // well below the from-scratch scorer's full-corpus scan. The
    // index is built per scale, untimed (write once, query many).
    val bm25Idx: Map[Int, (String, String)] =
      if (!armOn("bm25_topk_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val table = s"graft_soak_bm25_x$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files.createTempDirectory(s"graft-soak-bm25-x$n").toString
        SearchIndex.write(Tables.documents(spark, d), "text", "doc_id",
          s"$out/stats", s"$out/idx", table)
        n -> (table, s"$out/stats")
      }

    // incremental-DSIR scorer arm (round 19): a FIXED batch (the base
    // corpus's doc_id%10=0 docs) scored against a maintained bigram
    // LM store that grows with scale — the daily-delta deployment
    // shape (q277). The batch's per-gram counts ride the pruned
    // AggState.mergedFor point-lookup (only the batch grams' buckets
    // are read), so the honest expectation is SUB-LINEAR: the touched
    // buckets hold the batch grams' occurrence rows, which grow with
    // the corpus's use of those grams, never with the corpus row
    // count — well below the from-scratch scorer's full recount. The
    // store is built per scale, untimed (write once, score daily).
    val dsirStore: Map[Int, String] =
      if (!armOn("dsir_batch_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val out = Files
          .createTempDirectory(s"graft-soak-dsir-x$n").toString
        AggState.write(
          graft.queries.CurationQueries.dsirStoreRows(
            Tables.documents(spark, d)),
          Seq("g"), "tgtocc", 1,
          graft.queries.CurationQueries.DsirBucket, s"$out/state")
        n -> s"$out/state"
      }

    // maintained-decontamination arms (round 19): the eval-set gram
    // index grows with scale (every copy contributes its doc_id%50
    // bench docs), the timed bodies are what a daily run pays.
    //  - contam_screen_scaled: a FIXED train batch (the base corpus's
    //    %50<>0 docs) screened against the grown index — the cost is
    //    the fixed train scan + doc-keyed aggregation plus the LIVE
    //    GRAM distinct+broadcast, which tracks the EVAL STORE (tiny
    //    even at 30x), never a gram-keyed shuffle of the train side.
    //  - contam_absorb_scaled: a FIXED suite absorbed — a blind
    //    delta-sized bucket append, resident files untouched: flat.
    //    Replayed absorbs are invisible to answers (every screen
    //    distincts), so runs share one table per scale; separate
    //    tables per arm so appends never contaminate the screen arm.
    val ContamSoakN = 3
    def buildContamIdx(tag: String): Map[Int, (String, String)] =
      dirs.map { case (n, d) =>
        val table = s"graft_soak_$tag$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files.createTempDirectory(s"graft-soak-$tag$n").toString
        ContamIndex.write(
          Tables.documents(spark, d).filter(col("doc_id") % 50 === 0),
          "text", "doc_id", ContamSoakN, s"$out/idx", table)
        n -> (table, s"$out/idx")
      }
    val contamIdx: Map[Int, (String, String)] =
      if (!armOn("contam_screen_scaled")) Map.empty
      else buildContamIdx("contam")
    val contamAbsIdx: Map[Int, (String, String)] =
      if (!armOn("contam_absorb_scaled")) Map.empty
      else buildContamIdx("contamabs")

    // maintained-winnow arms (round 19): the plagiarism-search
    // composition's daily cycle against a resident corpus growing
    // with scale.
    //  - winnow_probe_scaled: a FIXED batch (base %10=0, absorbed
    //    untimed at prep so the read-your-writes cap contract holds)
    //    probed — the read is ≤ the batch fingerprints' buckets with
    //    fan-out capped at maxDocsPerFp per key, so the contract is
    //    ~flat; the df point-lookup reads only the batch
    //    fingerprints' buckets.
    //  - winnow_absorb_scaled: the FIXED batch absorbed — delta
    //    fingerprinting + bucket append + df absorb into touched
    //    buckets: flat. Separate tables per arm (the contam
    //    discipline) so the absorb arm's repeat appends never drift
    //    the probe arm's cap decisions.
    val WinSoak = (8, 4, 3, 10) // (k, w, minShared, maxDocsPerFp)
    // the fixed daily batch, re-keyed FAR outside every synthesized
    // copy's id range (copies use i·IdStride for i < 30) so it is a
    // genuinely new arrival at every scale — never an id collision
    // with a resident replica
    def winSoakBatch(s: SparkSession): DataFrame =
      Tables.documents(s, base).filter(col("doc_id") % 10 === 0)
        .withColumn("doc_id", col("doc_id") + 1000L * IdStride)
    def buildWinnowIdx(tag: String,
        preAbsorbProbeBatch: Boolean): Map[Int, (String, String)] =
      dirs.map { case (n, d) =>
        val (wk, ww, _, wcap) = WinSoak
        val table = s"graft_soak_$tag$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files.createTempDirectory(s"graft-soak-$tag$n").toString
        WinnowIndex.write(Tables.documents(spark, d), "text", "doc_id",
          wk, ww, wcap, s"$out/df", s"$out/idx", table)
        if (preAbsorbProbeBatch)
          WinnowIndex.absorb(winSoakBatch(spark), "text", "doc_id",
            wk, ww, wcap, s"$out/df", s"$out/idx", table)
        n -> (table, s"$out/df")
      }
    val winnowProbeIdx: Map[Int, (String, String)] =
      if (!armOn("winnow_probe_scaled")) Map.empty
      else buildWinnowIdx("winprobe", preAbsorbProbeBatch = true)
    val winnowAbsorbIdx: Map[Int, (String, String)] =
      if (!armOn("winnow_absorb_scaled")) Map.empty
      else buildWinnowIdx("winabs", preAbsorbProbeBatch = false)

    // maintained-SemDeDup arm (round 19): a FIXED embedding delta
    // absorbed into a store grown with scale UNDER THE
    // RE-QUANTIZATION SCHEDULE (nClusters ∝ scale so cell population
    // stays ~constant — the soakPlanes/IVF discipline applied to the
    // coarse quantizer; holding k fixed would grow every cell
    // linearly and time a mis-operated store). Timed: assign (one
    // codegen pass, O(|batch|·k) — k here grows with scale, at
    // production sized ~√N), the touched cells' probe (~constant
    // population by the discipline), the batch's within-cell
    // self-join, delta-contracted CC. Absorb mutates, but a replayed
    // absorb is invisible by construction (the q285 argument), so
    // runs share one store per scale. State built untimed per scale.
    val SemSoakCells = 8
    val SemSoakTau = 0.35
    val semIdx: Map[Int, (String, String)] =
      if (!armOn("semdedup_absorb_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val table = s"graft_soak_semdedup_x$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files
          .createTempDirectory(s"graft-soak-semdedup-x$n").toString
        SemDedupIndex.write(Tables.embeddings(spark, d),
          SemSoakCells * n, SemSoakTau, s"$out/cent", s"$out/idx",
          table, s"$out/cc", s"$out/edges")
        n -> (table, out)
      }

    // maintained-funnel arm pair (round 19, q295's read): the WHOLE
    // cleaning pass over a corpus growing with scale, both ways.
    //  - funnel_maintained_scaled: the stateful stages answer from
    //    stores built UNTIMED per scale (the write-once deployment
    //    shape) — the timed read pays the one mandatory corpus scan
    //    (canonical window + fused quality scoring decide membership
    //    for every doc, so ~linear is the honest contract) plus the
    //    screen's broadcast live grams and two anti joins against
    //    parameter-bounded sides. Zero state re-derivation.
    //  - funnel_scratch_scaled: the same funnel re-deriving both
    //    states in-query (q61's full eval re-shingle + q122's full
    //    assign/pair/CC closure) — the per-run cost maintenance
    //    deletes. Same quantizer discipline both arms (cells ∝ scale)
    //    so the gap measures maintenance, not a mis-sized store.
    //    Cost-only arms: set parity is gated at sf0.01 (q295 vs q67's
    //    oracle chain), not re-checked here.
    val funnelSem: Map[Int, String] =
      if (!armOn("funnel_maintained_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val table = s"graft_soak_funnelsem_x$n"
        spark.sql(s"DROP TABLE IF EXISTS $table")
        val out = Files
          .createTempDirectory(s"graft-soak-funnelsem-x$n").toString
        SemDedupIndex.write(Tables.embeddings(spark, d),
          SemSoakCells * n, SemSoakTau, s"$out/cent", s"$out/idx",
          table, s"$out/cc", s"$out/edges")
        n -> s"$out/cc"
      }
    val funnelContam: Map[Int, (String, String)] =
      if (!armOn("funnel_maintained_scaled")) Map.empty
      else buildContamIdx("funnelc")
    def funnelRead(s: SparkSession, d: String,
        contaminated: DataFrame, pruned: DataFrame): DataFrame = {
      val docs = Tables.documents(s, d)
      val canonical = Dedup.exactDedup(docs, "text", "doc_id")
        .filter(col("is_canonical")).select(col("doc_id"))
      docs
        .select(col("doc_id"), col("lang"),
          TextAnalysis.qualityScore(col("text"), col("n_chars"))
            .as("quality"))
        .filter(col("doc_id") % 50 =!= 0)
        .filter(col("quality") >= 0.5)
        .join(canonical, Seq("doc_id"), "left_semi")
        .join(contaminated, Seq("doc_id"), "left_anti")
        .join(pruned, Seq("doc_id"), "left_anti")
    }

    // band-index delete/compact arms (round 15; per-run tables since
    // round 16 — ADVICE r15: the shared-table version let each run
    // re-append the same tombstone batch, so later runs probed a grown
    // _del table and the compact arm's input drifted run-to-run).
    // Each timed run now gets its OWN freshly built table (the
    // delCopies/ccCopies fresh-copy discipline; bucketed tables can't
    // be file-copied without re-registering bucket metadata, so the
    // copies are rebuilt — untimed either way). Separate tables from
    // bandprobe's — deletes must not contaminate that arm's answers.
    // The compact copies get the tombstone batch pre-appended untimed,
    // so every compact run folds the same tombstone state.
    def buildBandDelTables(tag: String, withTombstones: Boolean)
        : Map[Int, scala.collection.mutable.Queue[String]] =
      dirs.map { case (n, d) =>
        val q = scala.collection.mutable.Queue[String]()
        (1 to RUNS).foreach { r =>
          val table = s"graft_soak_$tag${n}_r$r"
          spark.sql(s"DROP TABLE IF EXISTS $table")
          spark.sql(s"DROP TABLE IF EXISTS ${table}_del")
          val out = Files.createTempDirectory(s"graft-soak-$tag$n-$r")
            .toString
          DedupIndex.write(Tables.documents(spark, d), "text", "doc_id",
            4, 4, 3, s"$out/idx", table)
          if (withTombstones)
            DedupIndex.delete(spark,
              table, Tables.documents(spark, base)
                .filter(col("doc_id") % 20 === 0).select(col("doc_id")))
          q.enqueue(table)
        }
        n -> q
      }
    val bandDelCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("bandindex_delete_scaled")) Map.empty
      else buildBandDelTables("banddel", withTombstones = false)
    val bandCompactCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("bandindex_compact_scaled")) Map.empty
      else buildBandDelTables("bandcpt", withTombstones = true)
    // band-index geometry migration (round 17): the generation rewrite
    // into 2x the bucket count — the same full-rewrite cost class as
    // bandindex_compact (shared compactTo path), measured so the
    // DedupIndex.rebucket row is its own evidence.
    val bandRebucketCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("bandindex_rebucket_scaled")) Map.empty
      else buildBandDelTables("bandrbk", withTombstones = false)

    // ccstate arm (round 15): incremental connected components — a
    // FIXED delta of verified-pair edges absorbed into a clustering
    // whose resident corpus grows with scale. State built untimed per
    // scale with buckets ∝ scale (constant rows per bucket — CcState's
    // sizing budget), over the scaled corpus's candidate pairs minus
    // the delta; the fixed delta (base-corpus pairs touching a
    // doc_id%10=0 doc) is precomputed once to parquet so the timed
    // body is exactly what a daily run pays: bucket-pruned lookups,
    // |delta|-edge contraction + CC, log/bucket appends. absorb
    // mutates, so each timed run gets an untimed copy (the
    // annindex_delete discipline). The recompute control is the
    // existing cc_contraction_arm (exponent ~0.9 at r12): that is the
    // daily cost this operator deletes.
    val ccArmsOn = armOn("ccstate_absorb_scaled") ||
      armOn("ccstate_labels_scaled") || armOn("ccstate_compact_scaled") ||
      armOn("ccstate_rebucket_scaled") || armOn("ccstate_deletenode_scaled")
    val ccDelta: String =
      if (!ccArmsOn) ""
      else {
        val out = s"$workRoot/ccdelta"
        val marker = Paths.get(s"$out/_CC_OK")
        val stamp = s"$base|synth=$SynthVersion|cc=2"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          val bands = Dedup.bandKeys(Tables.documents(spark, base),
            "text", "doc_id", 4, 4, 3)
          // a DAILY-sized delta: base-corpus pairs touching a
          // doc_id%100=0 doc — pruning pays when the delta's node
          // count is well under the bucket count (CcState's sizing
          // budget), and %100 keeps it ~tens of docs' pairs, the
          // annindex_delete batch-size discipline. NOTE: the resident
          // exclusion below deliberately under-covers — scaled-corpus
          // pairs linking a base %100 doc to a replica doc land in
          // neither resident nor delta, so absorbed state ≠ the full
          // clustering; this arm measures ABSORB COST, not clustering
          // parity (q233/q234 gate parity)
          Dedup.candidatePairs(bands)
            .filter(col("id_a") % 100 === 0 || col("id_b") % 100 === 0)
            .write.mode("overwrite").parquet(s"$out/edges")
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        s"$out/edges"
      }
    def ccResidentPairs(d: String): DataFrame = {
      val bands = Dedup.bandKeys(Tables.documents(spark, d),
        "text", "doc_id", 4, 4, 3)
      Dedup.candidatePairs(bands)
        .filter(!(col("id_a") < IdStride && col("id_a") % 100 === 0) &&
          !(col("id_b") < IdStride && col("id_b") % 100 === 0))
    }
    val ccIdx: Map[Int, String] =
      if (!ccArmsOn) Map.empty
      else dirs.map { case (n, d) =>
        val out = s"$workRoot/ccstate/x$n"
        val marker = Paths.get(s"$out/_CC_OK")
        // buckets ∝ corpus (constant rows per bucket), sized so the
        // delta's ~hundred nodes stay well under the bucket count at
        // every scale — the regime the class doc's budget names
        val stamp = s"$d|synth=$SynthVersion|cc=2|b=${256 * n}"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          graft.ops.CcState.write(ccResidentPairs(d), s"$out/cc",
            buckets = 256 * n)
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/cc"
      }
    // the edge-retention pair's truth side, built untimed per scale
    // with the SAME bucket budget as the labels (the lockstep rule)
    val ccEdgeIdx: Map[Int, String] =
      if (!armOn("ccstate_deletenode_scaled")) Map.empty
      else dirs.map { case (n, d) =>
        val out = s"$workRoot/ccedges/x$n"
        val marker = Paths.get(s"$out/_CC_OK")
        val stamp = s"$d|synth=$SynthVersion|cce=1|b=${256 * n}"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          graft.ops.CcState.writeEdges(ccResidentPairs(d), s"$out/edges",
            buckets = 256 * n)
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/edges"
      }
    def copyState(st: String, tag: String, n: Int, r: Int): String = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = Files.createTempDirectory(s"graft-soak-$tag-x$n-$r")
        .toString + "/cc"
      val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(conf)
      org.apache.hadoop.fs.FileUtil.copy(fs,
        new org.apache.hadoop.fs.Path(st), fs,
        new org.apache.hadoop.fs.Path(dst), false, conf)
      // the merge log is a SIBLING of the state dir — carry it too
      if (fs.exists(new org.apache.hadoop.fs.Path(st + "_merges")))
        org.apache.hadoop.fs.FileUtil.copy(fs,
          new org.apache.hadoop.fs.Path(st + "_merges"), fs,
          new org.apache.hadoop.fs.Path(dst + "_merges"), false, conf)
      dst
    }
    val ccCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("ccstate_absorb_scaled")) Map.empty
      else ccIdx.map { case (n, st) =>
        n -> scala.collection.mutable.Queue(
          (1 to RUNS).map(r => copyState(st, "ccstate", n, r)): _*)
      }

    // ccstate labels/compact arms (round 16, VERDICT r15 item 6): the
    // STORE-SIZED controls to the flat absorb arm — the full-view
    // labels read and the scheduled compact rewrite both track the
    // resident corpus by design (documented: compact is the
    // amortization absorb's delta pricing buys; labels is the VIEW,
    // not the probe path). Each per-scale state gets the fixed delta
    // absorbed UNTIMED first, so a real merge log is resolved by
    // labels and folded by compact. labels is read-only (one prepped
    // state per scale, shared across runs); compact mutates (per-run
    // copies, the ccCopies discipline). The delta also carries the
    // merge log's _merges sibling in the copy.
    val ccPrepped: Map[Int, String] =
      if (!armOn("ccstate_labels_scaled") &&
          !armOn("ccstate_compact_scaled") &&
          !armOn("ccstate_rebucket_scaled")) Map.empty
      else ccIdx.map { case (n, st) =>
        val dst = copyState(st, "ccprep", n, 0)
        graft.ops.CcState.absorb(spark, spark.read.parquet(ccDelta), dst)
        n -> dst
      }
    val ccCompactCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("ccstate_compact_scaled")) Map.empty
      else ccPrepped.map { case (n, st) =>
        n -> scala.collection.mutable.Queue(
          (1 to RUNS).map(r => copyState(st, "cccpt", n, r)): _*)
      }
    val ccRebucketCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("ccstate_rebucket_scaled")) Map.empty
      else ccPrepped.map { case (n, st) =>
        n -> scala.collection.mutable.Queue(
          (1 to RUNS).map(r => copyState(st, "ccrbk", n, r)): _*)
      }
    // deleteNodes mutates BOTH stores — per-run copies of the pair.
    // The fixed victim: the smallest base-corpus node, resolved once
    // from the x1 store (scale replicas are id-disjoint, so the same
    // node with the SAME component exists at every scale — the arm
    // isolates the store-size term, which the operator's contract
    // names: one column-pruned label scan + component-priced rest).
    val ccDelPairCopies
        : Map[Int, scala.collection.mutable.Queue[(String, String)]] =
      if (!armOn("ccstate_deletenode_scaled")) Map.empty
      else ccIdx.map { case (n, st) =>
        n -> scala.collection.mutable.Queue(
          (1 to RUNS).map { r =>
            (copyState(st, "ccdeln", n, r),
              copyState(ccEdgeIdx(n), "ccdele", n, r))
          }: _*)
      }
    val ccDelNode: Long =
      if (!armOn("ccstate_deletenode_scaled")) 0L
      else spark.read.parquet(ccIdx(1)).agg(min(col("node")))
        .collect().head.getLong(0)

    // ivm_refresh arm: per-scale persisted partial-aggregate state
    // (AggState over the FULL scaled events table), built outside the
    // timed loop — write once, refresh daily. The fixed delta (the
    // base corpus's event_id%10=0 events) touches only the BASE user
    // range's buckets, so the refresh read set is a fixed directory
    // set no matter how large the resident corpus grows.
    val ivmBucket = floor(col("user_id") / 4).cast("long")
    val ivmGroup = Seq("user_id", "event_type")
    val aggIdx: Map[Int, String] =
      if (!armOn("ivm_refresh_scaled") && !armOn("ivm_absorb_scaled"))
        Map.empty
      else dirs.map { case (n, d) =>
        val out = s"$workRoot/aggstate/x$n"
        val marker = Paths.get(s"$out/_AGG_OK")
        val stamp = s"$d|synth=$SynthVersion|agg=2"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          AggState.write(Tables.events(spark, d), ivmGroup, "value",
            10000, ivmBucket, s"$out/state")
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/state"
      }

    // ivm_absorb mutates its state store, so each timed run gets its
    // own untimed copy (the annindex_delete discipline).
    val aggCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("ivm_absorb_scaled")) Map.empty
      else {
        val conf = spark.sparkContext.hadoopConfiguration
        aggIdx.map { case (n, st) =>
          val q = scala.collection.mutable.Queue[String]()
          (1 to RUNS).foreach { r =>
            val dst = Files.createTempDirectory(s"graft-soak-aggstate-x$n-$r")
              .toString + "/state"
            val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(conf)
            org.apache.hadoop.fs.FileUtil.copy(fs,
              new org.apache.hadoop.fs.Path(st), fs,
              new org.apache.hadoop.fs.Path(dst), false, conf)
            q.enqueue(dst)
          }
          n -> q
        }
      }

    // mg heavy-hitter store (round 17): the summary is ≤ |groups|·k
    // rows BY CONSTRUCTION, so the resident side of a daily absorb is
    // a constant no matter how large the corpus that produced it — the
    // arm's cost should be the delta's own tokenize+aggregate (fixed
    // here), i.e. ~flat. The synthesized copies' salted tokens push
    // per-source vocabulary far past k at 10×/30×, so the compression
    // path (not just the exact small-vocabulary case) is what's timed.
    val mgBucket = AggState.hashBucketsOf("source", 4)
    def mgToks(d: DataFrame): DataFrame =
      d.select(col("source"),
        explode(TextAnalysis.words(col("text"))).as("w"))
    val mgArms =
      Seq("mgstate_absorb_scaled", "mgstate_append_scaled",
        "mgstate_compact_scaled")
    val mgIdx: Map[Int, String] =
      if (!mgArms.exists(armOn)) Map.empty
      else dirs.map { case (n, d) =>
        val out = s"$workRoot/mgstate/x$n"
        val marker = Paths.get(s"$out/_MG_OK")
        val stamp = s"$d|synth=$SynthVersion|mg=1"
        if (!(Files.exists(marker) &&
            new String(Files.readAllBytes(marker), "UTF-8") == stamp)) {
          AggState.writeMg(mgToks(Tables.documents(spark, d)),
            Seq("source"), "w", 63, mgBucket, s"$out/state")
          Files.write(marker, stamp.getBytes("UTF-8"))
        }
        n -> s"$out/state"
      }
    def copyMgStores(
        tag: String): Map[Int, scala.collection.mutable.Queue[String]] = {
      val conf = spark.sparkContext.hadoopConfiguration
      mgIdx.map { case (n, st) =>
        val q = scala.collection.mutable.Queue[String]()
        (1 to RUNS).foreach { r =>
          val dst = Files.createTempDirectory(s"graft-soak-$tag-x$n-$r")
            .toString + "/state"
          val fs = new org.apache.hadoop.fs.Path(st).getFileSystem(conf)
          org.apache.hadoop.fs.FileUtil.copy(fs,
            new org.apache.hadoop.fs.Path(st), fs,
            new org.apache.hadoop.fs.Path(dst), false, conf)
          q.enqueue(dst)
        }
        n -> q
      }
    }
    val mgCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("mgstate_absorb_scaled")) Map.empty
      else copyMgStores("mgstate")
    val mgAppendCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("mgstate_append_scaled")) Map.empty
      else copyMgStores("mgappend")
    // the compact arm's copies carry two UNTIMED appendMgDelta layers,
    // so the timed compact folds a realistic layered store
    val mgCompactCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("mgstate_compact_scaled")) Map.empty
      else {
        val m = copyMgStores("mgcompact")
        val docs = Tables.documents(spark, base)
        m.values.foreach(_.foreach { st =>
          AggState.appendMgDelta(st,
            mgToks(docs.filter(col("doc_id") % 20 === 0)), 0L,
            Seq("source"), "w", 63, mgBucket)
          AggState.appendMgDelta(st,
            mgToks(docs.filter(col("doc_id") % 20 === 10)), 1L,
            Seq("source"), "w", 63, mgBucket)
        })
        m
      }

    // annindex_delete_scaled mutates its index, so each timed run gets
    // its own UNTIMED copy of the per-scale index — the arm then times
    // only what a retention/right-to-be-forgotten batch pays: hashing
    // the batch, reading its ≤|batch| bucket dirs, rewriting them.
    def copyAnnIdx(tag: String): Map[Int, scala.collection.mutable.Queue[String]] = {
      val conf = spark.sparkContext.hadoopConfiguration
      annIdx.map { case (n, idx) =>
        val q = scala.collection.mutable.Queue[String]()
        (1 to RUNS).foreach { r =>
          val dst = Files.createTempDirectory(s"graft-soak-$tag-x$n-$r")
            .toString + "/idx"
          val fs = new org.apache.hadoop.fs.Path(idx).getFileSystem(conf)
          org.apache.hadoop.fs.FileUtil.copy(fs,
            new org.apache.hadoop.fs.Path(idx), fs,
            new org.apache.hadoop.fs.Path(dst), false, conf)
          q.enqueue(dst)
        }
        n -> q
      }
    }
    val delCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("annindex_delete_scaled")) Map.empty
      else copyAnnIdx("delidx")
    // ANN geometry migration (round 17): re-plane the whole store to
    // soakPlanes(n)+1 — the full-store rewrite the class doc budgets to
    // the compact schedule; per-run copies, the delete discipline.
    val annRebucketCopies: Map[Int, scala.collection.mutable.Queue[String]] =
      if (!armOn("annindex_rebucket_scaled")) Map.empty
      else copyAnnIdx("rbkidx")

    // confirm the corpora actually scale (and prime the file cache so
    // scale-1 reads aren't unfairly warm relative to freshly-written dirs)
    val rows = dirs.toSeq.sortBy(_._1).map { case (n, d) =>
      n -> Seq("documents", "embeddings", "events")
        .map(t => Tables.table(spark, d, t).count()).sum
    }
    rows.foreach { case (n, r) => println(s"scale x$n: $r rows (docs+emb+events)") }

    // cc_contraction: the distributed large/small-star arm of
    // connectedComponents, which the registry queries only exercise
    // when edges exceed maxDriverEdges — force it here so BOTH arms
    // have measured growth, per the verdict's "CC both arms".
    // q199_planes_scaled: the nn-distance histogram run the way a
    // deployment runs it — planes grows as log₂(scale) with the corpus
    // (6 + round(log₂ n)), so per-bucket population and therefore
    // per-vector pair work stays ~constant; its exponent should sit
    // near 1.0 where the FIXED-planes registry form measured 0.79
    // rising (VERDICT r9 item 7). Bodies receive the scale factor so
    // parameter-scaled arms can derive their parameters from it.
    val bodies: Seq[(String, (SparkSession, String, Int) => DataFrame)] =
      Risky.map { n =>
        val fn = SparkEntry.queries(n)
        n -> ((s: SparkSession, d: String, _: Int) => fn(s, d))
      } :+
        ("cc_contraction_arm" -> { (s: SparkSession, d: String, _: Int) =>
          val bands = Dedup.bandKeys(Tables.documents(s, d), "text", "doc_id", 4, 4, 3)
          Dedup.connectedComponents(Dedup.candidatePairs(bands), maxDriverEdges = 0L)
        }) :+
        ("q199_planes_scaled" -> { (s: SparkSession, d: String, n: Int) =>
          graft.queries.CurationQueries.nnDistanceHistogram(s, d, soakPlanes(n))
        }) :+
        // multiprobe_planes_scaled (VERDICT r10 item 4): the multi-probe
        // ANN operator under the same planes ≈ log₂(scale) budget q199
        // proved out — (planes+1)·Q probes against a corpus that grows
        // with scale. Bucket population stays ~constant under the
        // budget, so the candidate set (and the time exponent) should
        // grow ~linearly in the corpus, nowhere near quadratic.
        ("multiprobe_planes_scaled" -> { (s: SparkSession, d: String, n: Int) =>
          val planes = soakPlanes(n)
          val emb = Tables.embeddings(s, d)
          val qs = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          graft.ops.Similarity.topKNeighborsLshMultiProbe(emb, qs, 10, planes)
        }) :+
        // annindex_topk_scaled (VERDICT r11 item 5): the SAME query as
        // multiprobe_planes_scaled answered from the persisted
        // bucket-partitioned index instead of bucketing the corpus on
        // the fly. The index's promise is that the read volume is the
        // probe set — (planes+1)·Q partitions — independent of corpus
        // size, so this arm's wall time should stay flat-to-log where
        // the from-scratch arm grows with the corpus scan.
        ("annindex_topk_scaled" -> { (s: SparkSession, d: String, n: Int) =>
          val emb = Tables.embeddings(s, d)
          val qs = emb.filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          AnnIndex.topK(s, annIdx(n), qs, 10)
        }) :+
        // bandprobe pair (round 12): a FIXED delta — the base corpus's
        // doc_id%10=0 docs — against a resident corpus growing with
        // scale. Index arm: delta band keys + co-located bucket join.
        // Scratch control: full resident re-hash + shuffle per run.
        ("bm25_topk_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (table, stats) = bm25Idx(n)
          SearchIndex.bm25TopK(s, table, stats,
            Seq("join", "spark", "window"), 20)
        }) :+
        // dsir pair: the FIXED base-corpus delta scored against the
        // per-scale maintained LM store (pruned point-lookups + one
        // summary aggregate) — vs recounting the whole corpus.
        ("dsir_batch_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          graft.queries.CurationQueries.dsirBatchScore(s, dsirStore(n),
            Tables.documents(s, base).filter(col("doc_id") % 10 === 0))
        }) :+
        ("bandprobe_index_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val batch = Tables.documents(s, base).filter(col("doc_id") % 10 === 0)
          DedupIndex.probe(s, bandIdx(n), batch, "text", "doc_id", 4, 4, 3)
        }) :+
        // annindex_delete_scaled (round 12): a FIXED 10-vector delete
        // batch against the per-scale index — cost should be flat
        // (∝ the batch's bucket footprint, never the store). The body
        // performs the delete eagerly on a fresh copy, then returns a
        // 1-row frame so the harness's noop sink adds only ~ms.
        ("annindex_delete_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val victims = Tables.embeddings(s, base)
            .filter(col("vec_id") < 10)
            .select(col("vec_id"), col("embedding"))
          AnnIndex.delete(s, victims, delCopies(n).dequeue())
          s.range(1).toDF("ok")
        }) :+
        // ivm arms (round 13): a FIXED daily metric delta against a
        // resident corpus growing with scale.
        //  - ivm_refresh_scaled: the read side — delta partials merged
        //    against ONLY the delta's bucket dirs of the persisted
        //    state (fixed read set: should be flat).
        //  - ivm_absorb_scaled vs ivm_rebuild_scaled: the maintenance
        //    contrast — absorb rewrites the delta's touched partitions
        //    only (fixed work), the rebuild control is what a
        //    non-incremental pipeline runs daily: re-aggregate the
        //    whole corpus and rewrite the whole partitioned state
        //    (scan + bucket-file count both track the corpus).
        ("ivm_refresh_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val delta = Tables.events(s, base).filter(col("event_id") % 10 === 0)
          AggState.refresh(s, aggIdx(n), delta, ivmGroup, "value",
            10000, ivmBucket)
        }) :+
        ("ivm_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val delta = Tables.events(s, base).filter(col("event_id") % 10 === 0)
          AggState.absorb(s, aggCopies(n).dequeue(), delta, ivmGroup,
            "value", 10000, ivmBucket)
          s.range(1).toDF("ok")
        }) :+
        ("ivm_rebuild_scaled" -> { (s: SparkSession, d: String, _: Int) =>
          val out = Files.createTempDirectory("graft-soak-ivm-rebuild")
            .toString + "/state"
          AggState.write(Tables.events(s, d), ivmGroup, "value", 10000,
            ivmBucket, out)
          s.range(1).toDF("ok")
        }) :+
        ("mgstate_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val delta = mgToks(Tables.documents(s, base)
            .filter(col("doc_id") % 10 === 0))
          AggState.absorbMg(s, mgCopies(n).dequeue(), delta,
            Seq("source"), "w", 63, mgBucket)
          s.range(1).toDF("ok")
        }) :+
        // the layered pair (round 18): append is the cheapest possible
        // maintenance write (resident files untouched — a fixed delta's
        // tokenize+aggregate+append, flat by construction); compact
        // folds the layers back through the MG compression, and for
        // THIS store kind even that full rewrite is parameter-bounded
        // (summary ≤ |groups|·k resident + delta-sized layers, 4 bucket
        // dirs), so BOTH exponents should be ~flat — unlike the sum
        // store, whose compact tracks its group population.
        ("mgstate_append_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val delta = mgToks(Tables.documents(s, base)
            .filter(col("doc_id") % 10 === 0))
          AggState.appendMgDelta(mgAppendCopies(n).dequeue(), delta, 0L,
            Seq("source"), "w", 63, mgBucket)
          s.range(1).toDF("ok")
        }) :+
        ("mgstate_compact_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          AggState.compactMgState(s, mgCompactCopies(n).dequeue(),
            Seq("source"), 63)
          s.range(1).toDF("ok")
        }) :+
        // round-14 persisted-index probe arms: banded (Q·bands fixed-
        // size directories) and IVF (Q·nProbe fixed-size cells) —
        // both should be flat like annindex_topk_scaled, proving the
        // whole persisted-index matrix holds its probe contract as
        // the resident corpus grows 30×.
        ("bandedidx_topk_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val qs = Tables.embeddings(s, base).filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          AnnIndex.topKBanded(s, bandedIdx(n), qs, 10)
        }) :+
        ("ivfidx_topk_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val qs = Tables.embeddings(s, base).filter(col("vec_id") < 10)
            .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
          AnnIndex.topKIvf(s, ivfIdx(n), qs, 10, 2)
        }) :+
        // band-index delete pair (round 15, the annindex_delete
        // discipline applied to DedupIndex):
        //  - bandindex_delete_scaled times what a right-to-be-forgotten
        //    batch pays: a FIXED tombstone batch (O(|batch|) append to
        //    the side table) plus the probe that must exclude it via
        //    the broadcast anti-join — both independent of the resident
        //    corpus, so the exponent should be ~flat.
        //  - bandindex_compact_scaled times the scheduled physical
        //    purge: a full bucketed rewrite whose cost SHOULD track the
        //    store (expected and documented — the tombstone design
        //    exists precisely so deletes never pay this; compact rides
        //    a rewrite that runs on a schedule anyway).
        ("bandindex_delete_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val table = bandDelCopies(n).dequeue()
          val victims = Tables.documents(s, base)
            .filter(col("doc_id") % 20 === 0).select(col("doc_id"))
          DedupIndex.delete(s, table, victims)
          val batch = Tables.documents(s, base)
            .filter(col("doc_id") % 10 === 0)
          DedupIndex.probe(s, table, batch, "text", "doc_id",
            4, 4, 3)
        }) :+
        ("bandindex_compact_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          DedupIndex.compact(s, bandCompactCopies(n).dequeue())
          s.range(1).toDF("ok")
        }) :+
        ("ccstate_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          graft.ops.CcState.absorb(s, s.read.parquet(ccDelta),
            ccCopies(n).dequeue())
          s.range(1).toDF("ok")
        }) :+
        // the store-sized controls to the flat absorb arm (see the
        // ccPrepped comment): labels SHOULD grow ~linearly (full-store
        // read + broadcast merge resolve), compact SHOULD grow
        // ~linearly (full bucketed rewrite) — measured so the
        // amortization claim has its own rows, like band compact.
        ("ccstate_labels_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          graft.ops.CcState.labels(s, ccPrepped(n))
        }) :+
        ("ccstate_compact_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          graft.ops.CcState.compact(s, ccCompactCopies(n).dequeue())
          s.range(1).toDF("ok")
        }) :+
        // bucket-geometry migration: a compact into 2x the bucket
        // count — the same full-rewrite cost class as compact (shared
        // compactTo path), measured so the rebucket operator's row is
        // its own evidence, not an analogy.
        ("ccstate_rebucket_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          graft.ops.CcState.rebucket(s, ccRebucketCopies(n).dequeue(),
            512 * n)
          s.range(1).toDF("ok")
        }) :+
        // round-17 geometry-migration arms: both are full-store
        // rewrites by contract (the compact cost class — scheduled,
        // never a tax on daily appends/absorbs), measured so each
        // operator's SCALE.md row is its own evidence.
        // edge-retention right-to-be-forgotten: a FIXED single-node
        // deletion against the store pair growing with scale. The
        // contract has two terms — component-priced work (fixed here:
        // replicas are disjoint, the victim's component never grows)
        // plus ONE column-pruned label scan (tracks |nodes| — the
        // summary, tiny vs the corpus) — so the exponent sits between
        // flat and the label-scan slope, never the corpus's.
        ("ccstate_deletenode_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (cc, ed) = ccDelPairCopies(n).dequeue()
          graft.ops.CcState.deleteNodes(s,
            s.sql(s"SELECT CAST($ccDelNode AS BIGINT) AS node"), cc, ed)
          s.range(1).toDF("ok")
        }) :+
        ("annindex_rebucket_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          AnnIndex.rebucket(s, annRebucketCopies(n).dequeue(),
            soakPlanes(n) + 1)
          s.range(1).toDF("ok")
        }) :+
        ("bandindex_rebucket_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          DedupIndex.rebucket(s, bandRebucketCopies(n).dequeue(), 64)
          s.range(1).toDF("ok")
        }) :+
        ("bandprobe_scratch_scaled" -> { (s: SparkSession, d: String, _: Int) =>
          val batch = Tables.documents(s, base).filter(col("doc_id") % 10 === 0)
          val rb = Dedup.bandKeys(Tables.documents(s, d), "text", "doc_id", 4, 4, 3)
          val nb = Dedup.bandKeys(batch, "text", "doc_id", 4, 4, 3)
            .select(col("id").as("new_id"), col("band"), col("band_key"))
          rb.join(nb, Seq("band", "band_key"))
            .filter(col("id") =!= col("new_id"))
            .select(col("new_id"), col("id").as("resident_id"))
            .distinct()
        }) :+
        // round-19 maintained-composition arms (see the prep blocks):
        ("contam_screen_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          ContamIndex.screen(s, contamIdx(n)._1,
            Tables.documents(s, base).filter(col("doc_id") % 50 =!= 0),
            "text", "doc_id", ContamSoakN)
        }) :+
        ("contam_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (table, path) = contamAbsIdx(n)
          ContamIndex.absorb(
            Tables.documents(s, base).filter(col("doc_id") % 50 === 0),
            "text", "doc_id", ContamSoakN, path, table)
          s.range(1).toDF("ok")
        }) :+
        ("semdedup_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (table, out) = semIdx(n)
          SemDedupIndex.absorb(
            Tables.embeddings(s, base).filter(col("vec_id") % 10 === 7),
            SemSoakCells * n, SemSoakTau, s"$out/cent", s"$out/idx",
            table, s"$out/cc", s"$out/edges")
          s.range(1).toDF("ok")
        }) :+
        ("winnow_probe_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (wk, ww, wmin, wcap) = WinSoak
          val (table, dfPath) = winnowProbeIdx(n)
          WinnowIndex.overlapProbe(s, table, dfPath, winSoakBatch(s),
            "text", "doc_id", wk, ww, wmin, wcap)
        }) :+
        ("winnow_absorb_scaled" -> { (s: SparkSession, _: String, n: Int) =>
          val (wk, ww, _, wcap) = WinSoak
          val (table, dfPath) = winnowAbsorbIdx(n)
          WinnowIndex.absorb(winSoakBatch(s), "text", "doc_id",
            wk, ww, wcap, dfPath, s"unused-$table", table)
          s.range(1).toDF("ok")
        }) :+
        ("funnel_maintained_scaled" -> { (s: SparkSession, d: String, n: Int) =>
          val docs = Tables.documents(s, d)
          val contaminated = ContamIndex.screen(s, funnelContam(n)._1,
            docs.filter(col("doc_id") % 50 =!= 0), "text", "doc_id",
            ContamSoakN).select(col("doc_id"))
          val pruned = SemDedupIndex.keep(s, funnelSem(n))
            .filter(!col("kept")).select(col("vec_id").as("doc_id"))
          funnelRead(s, d, contaminated, pruned)
        }) :+
        ("funnel_scratch_scaled" -> { (s: SparkSession, d: String, n: Int) =>
          val docs = Tables.documents(s, d)
          val contaminated = Dedup.decontaminate(
            train = docs.filter(col("doc_id") % 50 =!= 0),
            bench = docs.filter(col("doc_id") % 50 === 0),
            textCol = "text", idCol = "doc_id", n = ContamSoakN)
            .select(col("doc_id"))
          val pruned = Similarity.semDedupKeep(Tables.embeddings(s, d),
            SemSoakCells * n, SemSoakTau)
            .filter(!col("kept")).select(col("vec_id").as("doc_id"))
          funnelRead(s, d, contaminated, pruned)
        })

    val selected = bodies.filter(b => armOn(b._1))

    val times = scala.collection.mutable.LinkedHashMap[(String, Int), List[Double]]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    (1 to RUNS).foreach { _ =>
      for ((name, fn) <- selected; n <- Scales) {
        val t0 = System.nanoTime()
        try {
          fn(spark, dirs(n), n).write.format("noop").mode("overwrite").save()
          val el = (System.nanoTime() - t0) / 1e9
          times((name, n)) = times.getOrElse((name, n), Nil) :+ el
        } catch { case e: Throwable =>
          errors(s"$name@x$n") =
            s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(200)}"
        }
        spark.catalog.clearCache()
      }
    }

    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    val perQuery = bodies.map(_._1).map { name =>
      val mins = Scales.flatMap { n =>
        times.get((name, n)).map(ts => n -> ts.min)
      }
      // least-squares slope of log(t) on log(scale)
      val exponent =
        if (mins.size < 2) Double.NaN
        else {
          val pts = mins.map { case (n, t) => (math.log(n.toDouble), math.log(math.max(t, 1e-3))) }
          val mx = pts.map(_._1).sum / pts.size
          val my = pts.map(_._2).sum / pts.size
          val num = pts.map { case (x, y) => (x - mx) * (y - my) }.sum
          val den = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
          if (den == 0) Double.NaN else num / den
        }
      val minsJson = mins.map { case (n, t) => s""""x$n":${f"$t%.3f"}""" }.mkString("{", ",", "}")
      name -> s"""{"min_sec":$minsJson,"exponent":${if (exponent.isNaN) "null" else f"$exponent%.3f"}}"""
    }
    val qJson = perQuery.map { case (k, v) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jq(k)}:${jq(v)}" }.mkString("{", ",", "}")
    val rowsJson = rows.map { case (n, r) => s""""x$n":$r""" }.mkString("{", ",", "}")
    val out = s"""{"metric":"scale_soak","scales":[${Scales.mkString(",")}],"runs":$RUNS,"rows":$rowsJson,"queries":$qJson,"errors":$errJson,"base":${jq(base)}}"""
    val p = Paths.get("bench/SCALE_soak.json")
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, (out + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(out)
    spark.stop()
  }

  /** Bump on ANY change to [[synthesize]]'s output bytes — the token
    * is part of the `_SOAK_OK` stamp, so old on-disk corpora rebuild
    * instead of being silently reused. */
  val SynthVersion = 1

  /** Write a salted N-times corpus of documents/embeddings/events to
    * `out`, byte-copying the TPC-H tables. Deterministic: no RNG, the
    * salt is a pure function of the copy index. */
  def synthesize(spark: SparkSession, base: String, n: Int, out: String): Unit = {
    Files.createDirectories(Paths.get(out))
    for (t <- Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")) {
      Files.copy(Paths.get(s"$base/$t.parquet"), Paths.get(s"$out/$t.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = Tables.documents(spark, base)
    (0 until n).map { i =>
      if (i == 0) docs
      else docs.selectExpr(
        s"doc_id + ${i}L * $IdStride AS doc_id",
        s"array_join(transform(split(text, ' '), t -> concat('s${i}x', t)), ' ') AS text",
        "lang", "source", "length(array_join(transform(split(text, ' '), " +
          s"t -> concat('s${i}x', t)), ' ')) AS n_chars")
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = Tables.embeddings(spark, base)
    (0 until n).map { i =>
      if (i == 0) emb
      else emb.selectExpr(
        s"vec_id + ${i}L * $IdStride AS vec_id",
        s"transform(embedding, (x, j) -> cast(x + 0.05 * sin($i * 2.1 + j * 0.37) as float)) AS embedding",
        "label")
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    val ev = Tables.events(spark, base)
    (0 until n).map { i =>
      if (i == 0) ev
      else ev.selectExpr(
        s"event_id + ${i}L * $IdStride AS event_id",
        "ts",
        s"user_id + ${i}L * $IdStride AS user_id",
        "event_type", "value", "props")
    }.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$out/events.parquet")
  }
}
