package graft

/** Plan-shape regression guard: no query in the CORRECTNESS gate may
  * plan a Cartesian product, and nested-loop broadcast joins are
  * allowed only where the design INTENDS a bounded broadcast (a 1-row
  * stats aggregate, a parameter-bounded query/codebook side). A change
  * that silently turns a keyed join into an all-pairs join — the
  * classic 100 TB killer — fails here before it ever reaches a
  * cluster. Plans are inspected at sf0.001 without executing the
  * queries (join strategy is visible pre-execution; AQE can only
  * IMPROVE an exchange, not introduce a cross join).
  */
class PlanGuardSpec extends SparkSpec {

  /** Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
    * the broadcast side is bounded by construction, not by the corpus. */
  private val allowedNestedLoop = Set(
    "q31_ann_cosine",    // query side: vec_id < 10, broadcast by design
    "q43_ann_ivf",       // centroid codebook: bounded by nClusters
    "q49_bm25",          // corpus stats: exactly one aggregate row
    "q66_token_budget",  // rate table: one row per SOURCE
    "q72_unigram_lm",    // corpus total: exactly one aggregate row
    "q81_hard_negatives", // query side: vec_id < 10, broadcast by design
    "q82_tfidf_terms",   // corpus doc count: exactly one aggregate row
    "q96_bigram_pmi",    // corpus totals: exactly one aggregate row
    "q107_semantic_decontaminate", // bench side: bounded by construction
    "q115_mixture_weights", // feasible-budget min: exactly one aggregate row
    "q131_hybrid_rrf",   // probe vector: exactly one broadcast row
    "q132_source_drift", // snapshot totals: exactly one aggregate row
    "q140_score_fusion", // probe vector + per-list min/max: 1-row sides
    "q146_bigram_xent",  // vocab size: exactly one aggregate row
    "q149_tfidf_neighbors", // corpus doc count: exactly one aggregate row
    "q150_dsir_weights", // LM totals: exactly one aggregate row
    "q151_temperature_mix", // corpus total + normalizer: 1-row sides
    "q155_decay_activity", // anchor timestamp: exactly one aggregate row
    "q158_vocab_coverage", // coverage sums: exactly one aggregate row
    "q175_lsh_recall",   // truth/cand/hit counts: three 1-row aggregates
    "q177_ann_recall",   // query side: vec_id < 10, broadcast by design (q31)
    "q178_dedup_funnel", // stage-0 total: exactly one aggregate row
    "q191_trigram_cond_entropy", // context-entropy sum: exactly one aggregate row
    "q181_source_similarity", // |sources|x16 sketches: bounded by construction
    "q202_recall_ladder", // truth pass: vec_id < 10 query side, broadcast by design (q31)
    "q203_quantized_recall", // truth + dequant pass: vec_id < 10 query side, broadcast by design (q31)
    "q219_ivf_index",    // probe assignment: centroid codebook bounded by nClusters (q43)
    "q221_ivf_lifecycle", // same probe assignment as q219 over the maintained index
    "q227_ivf_quantized", // same bounded-codebook probe assignment as q219/q221
    "q232_ivf_quantized_lifecycle", // same bounded-codebook probe assignment as q219/q221
    "q250_ivf_rebucket", // same bounded-codebook probe assignment, re-trained 12-cell quantizer
    "q270_incremental_bm25", // df + corpus stats: two 1-row broadcast aggregates (q49)
    "q271_bm25_rtbf",    // same two 1-row broadcast sides as q270
    "q272_bm25_stream_lifecycle", // same two 1-row broadcast sides as q270
    "q273_ivm_temperature_mix", // corpus total + share normalizer: 1-row sides (q151)
    "q274_bm25_rebucket_policy", // same two 1-row broadcast sides as q270
    "q275_temperature_mix_rtbf", // same 1-row sides as q273/q151
    "q276_bm25_df_cap", // same two 1-row broadcast sides as q270
    "q277_ivm_dsir",    // LM totals: exactly one aggregate row (q150)
    "q278_dsir_rtbf",   // same 1-row LM-totals side as q277/q150
    "q287_ivm_surprisal", // LM total: exactly one aggregate row (q72)
    "q288_surprisal_rtbf", // same 1-row LM-total side as q287/q72
    "q292_hybrid_maintained") // per-list min/max stats: 1-row sides (q140)

  test("no query plans a cartesian product; nested loops only where bounded") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val cartesian = plan.contains("CartesianProduct")
        val nlj = plan.contains("BroadcastNestedLoopJoin") &&
          !allowedNestedLoop.contains(name)
        if (cartesian) Some(s"$name: CartesianProduct")
        else if (nlj) Some(s"$name: unexpected BroadcastNestedLoopJoin")
        else None
    }
    offenders shouldBe empty
  }

  test("q02's filter reaches the parquet scan and columns are pruned") {
    val plan = SparkEntry.queries("q02_filter_project")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // predicate pushdown: the quantity filter must appear in PushedFilters,
    // not only as a post-scan Filter node
    plan should include regex "PushedFilters: \\[.*GreaterThan\\(l_quantity"
    // column pruning: a 5-column projection over the 16-column lineitem
    // table must not read the full schema (scan keeps file column order)
    plan should include("ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint")
    plan should not include "l_comment"
  }

  test("q63's sampling predicate is evaluated in the scan, not a shuffle later") {
    val plan = SparkEntry.queries("q63_stratified_sample")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the md5 predicate can't prune row groups, but it must run as a
    // scan-level DataFilter (one pass, zero exchanges in the whole plan)
    plan should include("DataFilters: [")
    plan should not include "Exchange"
  }

  test("q103's normalization chain is one exchange-free codegen pass") {
    val plan = SparkEntry.queries("q103_normalize_text")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // per-row kernels compose into the scan's projection: no shuffle at
    // all, and the projection runs inside whole-stage codegen (the `*(n)`
    // marker in the plan string)
    plan should not include "Exchange"
    plan should include("*(1) Project")
  }

  test("q104's centroid aggregation partial-aggregates before its single exchange") {
    val exec = SparkEntry.queries("q104_label_centroids")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan
    val plan = exec.toString
    // exactly one shuffle (the keyed (label, pos) exchange) and a
    // map-side partial HashAggregate below it — the order-free integer
    // sums are what make that partial aggregation safe
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
    plan should include("HashAggregate")
  }

  test("q106's centroid join broadcasts; top-k is a WindowGroupLimit, not a global sort") {
    val plan = SparkEntry.queries("q106_centroid_outliers")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should include("WindowGroupLimit")
  }

  test("q112 quantization and q114 entropy are exchange-free scan projections") {
    Seq("q112_int8_quant", "q114_char_entropy").foreach { q =>
      val plan = SparkEntry.queries(q)(
        spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
      withClue(s"$q: ") { plan should not include "Exchange" }
    }
  }

  test("q135 classifier inference is an exchange-free codegen'd scan projection") {
    val plan = SparkEntry.queries("q135_linear_classifier")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the whole model (4 dot products + argmax) must ride the scan's
    // projection — no shuffle, no UDF object row, and the projection
    // stays inside whole-stage codegen (the `*(n)` marker; unrolled
    // element_at products, not CodegenFallback HOFs)
    plan should not include "Exchange"
    plan should not include "BatchEvalPython"
    plan should include("*(1) Project")
  }

  test("q113's bloom probe is a native scan-level filter, not a UDF") {
    val plan = SparkEntry.queries("q113_bloom_dedup")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the membership probe must evaluate inside the batch scan's
    // DataFilters (whole-stage codegen) — the r6 Scala UDF cut the
    // codegen span exactly there
    plan should include regex "DataFilters: \\[.*bloommightcontain"
    plan should not include "UDF"
  }

  test("q119 reads the fact once and plans its top-k as TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q119_basket_pairs")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // per-group combination expansion, NOT the oracle's self-join: one
    // lineitem scan; top-k as per-partition heads + driver merge of k
    "lineitem\\.parquet".r.findAllIn(plan).size shouldBe 1
    plan should include("TakeOrderedAndProject")
    plan should not include "SortMergeJoin"
  }

  test("q121 plans multi-distinct via Expand, one exchange per phase") {
    val plan = SparkEntry.queries("q121_multi_distinct")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("Expand")
    plan should include("HashAggregate")
  }

  test("q117's flag join reuses the passage key the aggregate shuffled on") {
    val plan = SparkEntry.queries("q117_boilerplate")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // both sides hash-partition on the chunk text — no extra exchange
    // beyond the three keyed ones (passage agg, flag join, doc rollup)
    plan should not include "CartesianProduct"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 4
  }

  test("q125's weighted draw is an exchange-free TakeOrderedAndProject") {
    val plan = SparkEntry.queries("q125_weighted_sample")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // score is scan-side codegen; top-k = per-partition heads + driver
    // merge of k — no shuffle anywhere
    plan should include("TakeOrderedAndProject")
    plan should not include "Exchange"
  }

  test("q126's quantile thresholds broadcast; the fact side never shuffles") {
    val plan = SparkEntry.queries("q126_winsorize")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
  }

  test("q124's anomaly window rides two keyed exchanges, no join at all") {
    // daily-count aggregation shuffles on (event_type, day); the
    // trailing-moments window re-keys on event_type alone — exactly two
    // keyed exchanges, the z-score itself is pure per-row arithmetic
    val plan = SparkEntry.queries("q124_count_anomaly")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("Window")
    plan should not include "Join"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("q133's prefix self-join stays a gram-keyed equi-join over persisted frames") {
    // the expected-slowest query by design (exact all-pairs Jaccard) —
    // its cost must stay the published PPJoin shape, not degrade into
    // an all-pairs product or a re-derived shingle chain:
    //  - candidates come from an equi-join keyed on the prefix gram `w`
    //    (never cartesian/nested-loop — a regression here is the
    //    100 TB killer hiding inside an already-big number);
    //  - the shingle-set, exploded-gram, and prefix frames are
    //    persisted (InMemoryTableScan), so the scan→shingle chain runs
    //    once, not once per consumer;
    //  - verification rides the candidate frame (jaccard is computed
    //    AFTER the prefix join, visible as intersection arithmetic over
    //    the cached sets, not a second documents scan).
    val plan = SparkEntry.queries("q133_exact_jaccard_join")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[w#"
    // the sets/tok/prefix caches appear as InMemoryTableScans (each
    // cached plan's text still prints its own file scan, so a raw
    // scan count over the plan STRING would overcount — the cache
    // nodes themselves are the single-scan evidence)
    "InMemoryTableScan".r.findAllIn(plan).size should be >= 4
  }

  test("q128's eval shingle set broadcasts; train side never shuffles on the shingle") {
    val plan = SparkEntry.queries("q128_ngram_decontam")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("BroadcastHashJoin")
    plan should not include "SortMergeJoin"
    // one exchange distincts the (tiny) eval side, one feeds the
    // doc-keyed rollup — the train shingle stream itself never shuffles
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("q129's moment aggregation is a single dim-keyed exchange") {
    val plan = SparkEntry.queries("q129_dimension_stats")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // explode + scaled projection stay in the scan stage; partial
    // aggregates shuffle once on dim
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("q137's final M-step is one keyed exchange over a scan-side E-step") {
    val plan = SparkEntry.queries("q137_kmeans")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // the E-step is a nearest_centroid projection in the scan stage (no
    // N×k join), so the returned plan holds exactly one shuffle: the
    // (cluster, pos) moment aggregation
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
    plan should include("HashAggregate")
    plan should not include "CartesianProduct"
  }

  test("q160's shard bucket is scan-side: two keyed exchanges, no join") {
    // md5-bucket + token count ride the scan projection; one 32-key
    // aggregation, one single-partition rollup — and never a join
    val plan = SparkEntry.queries("q160_shard_skew")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include("HashAggregate")
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("q162's predictor is scan-side: exactly one exchange, no join") {
    // the stopword-argmax prediction is a codegen projection in the
    // scan stage; the only shuffle is the (lang, pred)-keyed aggregate
    val plan = SparkEntry.queries("q162_langid_confusion")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include("HashAggregate")
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
  }

  test("q165's power-iteration round is one keyed exchange, dims-bounded output") {
    // the round frame (scalar s in the scan projection, posexplode,
    // pos-keyed scaled-long aggregation) must shuffle exactly once —
    // that pre-collect frame is ALL that runs per round, and its
    // output is bounded by the dimension count, never the corpus
    val emb = graft.core.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val round = graft.ops.Similarity.powerIterationRound(
      emb, "embedding", Seq.fill(64)(0.125))
    val plan = round.queryExecution.executedPlan.toString
    plan should not include "Join"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
    round.count() should be <= 64L
  }

  test("q166's JL projection is an exchange-free codegen'd scan projection") {
    // all 8 output dims are unrolled ±1/√8 literal dots riding the
    // scan's projection inside whole-stage codegen (the q135 pattern)
    val plan = SparkEntry.queries("q166_jl_projection")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Exchange"
    plan should not include "BatchEvalPython"
    plan should include("*(1) Project")
  }

  test("q167's candidate pairs come from the band equi-join, never a product") {
    // the histogram sweeps ALL candidate pairs, but candidates must
    // still be generated by the (band, band_key) equi-join over the
    // persisted band frame — a cartesian here is the 100 TB killer
    val plan = SparkEntry.queries("q167_jaccard_histogram")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \\[band"
    "InMemoryTableScan".r.findAllIn(plan).size should be >= 1
  }

  test("q173's lag rides one user_id exchange; transition aggs stay keyed") {
    // the ONLY corpus-sized shuffle is the user_id exchange feeding the
    // lag window; everything after aggregates on |types|²-bounded keys
    val plan = SparkEntry.queries("q173_event_markov")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should include regex "Exchange hashpartitioning\\(user_id"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 3
  }

  test("q181 reads the corpus ONCE; sketches aggregate on source") {
    // the per-source sketch (min of doc signatures) must come from a
    // single parquet pass — the |sources|² comparison joins the
    // persisted sketch frame against itself, never the corpus
    val plan = SparkEntry.queries("q181_source_similarity")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    // both |sources|² comparison sides read the PERSISTED sketch frame
    // (InMemoryTableScan ×2); the plan string prints the cached
    // lineage's parquet scan per reference, but at runtime the cache
    // materializes once — so the guard pins the cache reads, plus the
    // single source-keyed exchange that builds the sketches
    plan should include regex "Exchange hashpartitioning\\(source"
    "InMemoryTableScan".r.findAllIn(plan).size should be >= 2
  }

  test("q182's entropy is two keyed exchanges, no join, no window") {
    // (user_id, event_type) counts then user_id totals — the quantized
    // Σ c·ln c identity needs no second pass over events and no join
    val plan = SparkEntry.queries("q182_user_entropy")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    plan should not include "Window"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 2
  }

  test("q171's split bucket is scan-side; one aggregate plus the lang window") {
    // the md5 bucket is a codegen projection in the scan stage — a
    // join or global window here would be a rewrite regression
    val plan = SparkEntry.queries("q171_stratified_split")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 2
    plan should include("Window")
  }

  test("q198's seasonality is keyed aggregates + a type window, no join") {
    // one scan; the (type, hour) aggregate and the per-type share
    // window both key on bounded cardinalities
    val plan = SparkEntry.queries("q198_hourly_profile")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "Join"
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size should be <= 2
  }

  test("q200's recipe stages reuse persisted survivors, never rescanning the corpus") {
    // each funnel stage aggregates the PREVIOUS stage's persisted
    // frame: the plan must read caches (InMemoryTableScan) many times
    // but the parquet documents table only via the first stage's
    // lineage — and no stage may plan a cartesian
    val plan = SparkEntry.queries("q200_curation_recipe")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    "InMemoryTableScan".r.findAllIn(plan).size should be >= 4
  }

  test("q187's assignment is band equi-joins plus a left join to cc — no product") {
    // the new-batch × base candidate generation must stay a (band,
    // band_key) equi-join and the cluster lookup a LEFT equi-join; a
    // rewrite that loses a join key here becomes all-pairs at corpus
    // scale (the global no-cartesian sweep would catch the product,
    // this pin catches the KEYS)
    val plan = SparkEntry.queries("q187_incremental_assign")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "band#\\d+, band_key#\\d+"
    plan should include("LeftOuter")
  }

  test("q188's multi-probe explode keeps candidates a bucket equi-join") {
    // (planes+1) probes per query explode BEFORE the join; the join
    // itself must remain keyed on bucket — probing must never degrade
    // to comparing queries against every vector
    val plan = SparkEntry.queries("q188_multiprobe_ann")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include("Generate explode")
    plan should include regex "(?i)join[^\\n]*bucket#\\d+"
  }

  test("q199's neighbor pairs come from a within-bucket self-join only") {
    // the pair generator must be the bucket-keyed self-join (n²/2^planes
    // work under the planes ≈ log₂(n) deployment contract) — an unkeyed
    // pair pass is the exact 100 TB killer this query exists to avoid
    val plan = SparkEntry.queries("q199_nn_distance_histogram")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
    plan should include regex "(?i)join[^\\n]*bucket#\\d+"
  }

  test("q212's IVM merge pre-aggregates both sides before one keyed full-outer join") {
    // the algebra only scales if base and delta each reduce to partial
    // aggregates BEFORE meeting: the join must be keyed on the group
    // columns and see two HashAggregate inputs — a rewrite that joins
    // raw events rows first re-aggregates the 100 TB base every refresh
    val plan = SparkEntry.queries("q212_incremental_agg")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    plan should include("FullOuter")
    plan should include regex "(?i)join[^\\n]*user_id#\\d+"
    plan should not include "CartesianProduct"
    "HashAggregate".r.findAllIn(plan).size should be >= 4 // partial+final x2
  }

  test("q111's cap is one keyed exchange feeding a WindowGroupLimit") {
    val plan = SparkEntry.queries("q111_source_cap")(
      spark, "/root/testdata/sf0.001").queryExecution.executedPlan.toString
    "(?<!Broadcast)Exchange".r.findAllIn(plan).size shouldBe 1
    // rank<=cap prunes map-side before the window exchange
    plan should include("WindowGroupLimit")
  }
}
