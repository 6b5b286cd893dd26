package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *  - [[topKNeighbors]] — exact brute force: the correctness baseline.
  *    Fine when one side (the query set) is small enough to broadcast;
  *    cost is |queries| × |corpus| dot products, all codegen'd
  *    higher-order functions, top-k via per-query window.
  *  - [[lshBuckets]] + [[topKNeighborsLsh]] — the scale path: random-
  *    hyperplane signatures bucket the corpus so candidate generation is
  *    an equi-join on the bucket key; dot products only run within
  *    buckets. Hyperplane weights are derived from `sin(p·12.9898 +
  *    d·78.233·p)` — deterministic, seedless, identical in any engine,
  *    with per-plane frequencies so the planes are decorrelated (see
  *    [[lshBucketsCentered]] and the planeWeights scaladoc).
  *
  * All arithmetic is done in DOUBLE after an exact float→double cast so
  * results are reproducible bit-for-bit across engines.
  */
object Similarity {

  /** Float[] → Double[] (exact widening). */
  def toDouble(vec: Column): Column = transform(vec, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0d), _ + _)

  def norm(a: Column): Column = sqrt(aggregate(transform(a, x => x * x), lit(0.0d), _ + _))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors of each query vector.
    * @param queries  (q_id, q_vec) — small; broadcast
    * @param corpus   (vec_id, embedding) */
  def topKNeighbors(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val joined = corpus
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(queries
        .select(col("q_id"), toDouble(col("q_vec")).as("q"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Exact top-k cosine with a candidate predicate evaluated BEFORE the
    * similarity math (pre-filter ANN — the semantics vector stores call
    * "filtered search"): each query's k fills whenever ≥ k candidates
    * satisfy the predicate; a query whose predicate eliminates (almost)
    * all candidates returns fewer — or zero — rows, by design, rather
    * than padding with post-filter leftovers. `keep` may reference
    * corpus columns and any extra query attributes (queries carry
    * `q_id`, `q_vec`, plus whatever attribute columns the predicate
    * needs). Query-side attribute columns must NOT share a name with a
    * corpus column (rename them `q_*`) — the predicate would otherwise
    * hit an ambiguous-reference error on the joined frame.
    *
    * Hard-negative mining for contrastive training is the canonical
    * use: `keep = col("label") =!= col("q_label")` returns each query's
    * most-similar vectors with a DIFFERENT label.
    *
    * Scale shape: identical to [[topKNeighbors]] — the query side
    * broadcasts, the corpus streams once; the predicate prunes
    * candidates before the dot product runs, so a selective filter cuts
    * the similarity work proportionally. Compose with [[lshBuckets]] /
    * IVF for sub-linear candidate generation when the query set grows. */
  def topKNeighborsWhere(corpus: DataFrame, queries: DataFrame, k: Int,
      keep: Column): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val joined = corpus
      .withColumn("v", toDouble(col("embedding")))
      .crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id") && keep)
      .withColumn("q", toDouble(col("q_vec")))
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Deterministic pseudo-random hyperplane weights for plane `p` over
    * `dims` dimensions: `sin(p·12.9898 + d·78.233·p)` — uniform-ish in
    * [-1, 1], reproducible everywhere. The per-plane FREQUENCY factor
    * (·p) is load-bearing: the earlier same-frequency form
    * `sin(p·12.9898 + d·78.233)` made every plane a phase-shifted copy
    * of one sinusoid, so consecutive planes correlated at
    * cos(12.9898 mod 2π) ≈ 0.91 — nearly parallel hyperplanes whose
    * sign bits mostly agree. Measured on the test corpus at 6 planes:
    * 12 of 64 buckets occupied, within-bucket pair work 23 256;
    * distinct frequencies decorrelate the planes (max |corr| 0.11) and
    * the same corpus fills all 64 buckets with pair work 4 126 — the
    * difference between the n²/2^planes LSH bound being real and being
    * fiction (q201 pins the occupancy report). Weights depend only on
    * (plane, dim), so they are computed ONCE on the driver
    * (java.lang.Math.sin — the same libm call Spark's Sin expression
    * makes, so oracle SQL recomputing sin
    * per row still bit-matches) and shipped as a literal array: the hot
    * path is a pure multiply-add dot product instead of per-element
    * trigonometry (embeddings·planes sin() calls per ROW otherwise).
    *
    * Degeneracy envelope (ADVICE r10): plane `p`'s effective angular
    * frequency is `78.233·p mod 2π`, and a plane is near-degenerate —
    * weights nearly constant across dims, i.e. a mean-direction-
    * correlated hyperplane — only when that folded frequency · dims
    * ≲ π (the sinusoid never completes a half cycle over the vector).
    * The smallest folded frequencies below p=40 are p=31 (0.087
    * rad/dim), p=20 (0.147) and p=11 (0.233); at dims ≥ 64 even the
    * worst of these spans ≥ 5.5 rad ≈ 0.9 cycles, so every p ≤ 40 is
    * sign-mixing (OpsSpec's "plane-weight degeneracy envelope" test
    * pins this: both signs present,
    * |mean|≪rms for all p ≤ 40 at dims 64). The contract to respect
    * when scaling planes ≈ log₂(n) on LOW-dim embeddings: require
    * `(78.233·p mod 2π) · dims > π` for every plane in the budget, or
    * skip the offending p. */
  private def planeWeightSeq(p: Int, dims: Int): Seq[Double] =
    (0 until dims).map(d => math.sin(p * 12.9898d + d * 78.233d * p))

  private def planeWeights(p: Int, dims: Int): Column =
    typedLit(planeWeightSeq(p, dims))

  /** μ·w_p — the mean-centering bias for plane `p`, a driver-side
    * constant (left-to-right sum in dim order, matching the oracle's
    * list_sum, so the subtraction is bit-identical cross-engine). */
  private def planeBias(p: Int, dims: Int, mu: Seq[Double]): Double =
    mu.zip(planeWeightSeq(p, dims)).map { case (m, w) => m * w }.sum

  /** One plane's sign bit: `sign(v·w_p − μ·w_p)` — THE single
    * implementation of the (optionally mean-centered) hyperplane test.
    * Every bucket scheme in this file ([[lshBucket]],
    * [[lshBucketsCentered]], [[lshBandKeys]],
    * [[topKNeighborsLshMultiProbe]]) routes through here, so the
    * centering algebra cannot drift between the single-bucket, banded,
    * and multi-probe families. `mu` empty ⇒ raw projection, no
    * subtraction in the plan (bit-identical to the historical form). */
  private def planeBit(v: Column, p: Int, dims: Int, mu: Seq[Double]): Column = {
    val raw = aggregate(
      zip_with(v, planeWeights(p, dims), _ * _), lit(0.0d), _ + _)
    val proj = if (mu.isEmpty) raw else raw - lit(planeBias(p, dims, mu))
    when(proj >= 0, lit("1")).otherwise(lit("0"))
  }

  /** Bucket key = concatenated sign bits of planes
    * `firstPlane … firstPlane+planes−1` (banded schemes pass a band's
    * plane offset), optionally mean-centered when `mu` is non-empty.
    * `private[ops]`: [[AnnIndex]] persists/rebuilds the same key. */
  private[ops] def bucketKey(vec: Column, planes: Int, dims: Int,
      mu: Seq[Double] = Seq.empty, firstPlane: Int = 1): Column = {
    val v = toDouble(vec)
    concat((0 until planes).map(i => planeBit(v, firstPlane + i, dims, mu)): _*)
  }

  /** Fixed-width embedding dimensionality, probed from one row (the
    * standard contract for an embedding column). 0 for an empty corpus. */
  private[ops] def embDims(corpus: DataFrame): Int =
    corpus.select(size(col("embedding")).as("d"))
      .take(1).headOption.map(_.getInt(0)).getOrElse(0)

  /** Sign pattern of `planes` hyperplane projections → one bucket key
    * per vector (a `planes`-character bit string). Vectors only compete
    * within their bucket. */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    bucketKey(vec, planes, dims)

  /** (vec_id, bucket) assignment for the corpus. */
  def lshBuckets(corpus: DataFrame, planes: Int): DataFrame =
    corpus.select(col("vec_id"),
      lshBucket(col("embedding"), planes, embDims(corpus)).as("bucket"))

  /** Exact per-dimension corpus mean as a driver-side vector (≤ dims
    * doubles — parameter-bounded, the PCA/codebook collect class). Sums
    * are scaled integers (`round(v·10⁶)` longs), so the mean is
    * bit-identical across partitionings and engines; only the final
    * two divisions are float. */
  def dimMeans(corpus: DataFrame, dims: Int): Seq[Double] = {
    val rows = corpus
      .select(posexplode(toDouble(col("embedding"))).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(sum(round(col("x") * 1e6).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect()
    val m = rows.map(r => r.getInt(0) -> (r.getLong(1).toDouble / 1e6) / r.getLong(2)).toMap
    (0 until dims).map(d => m.getOrElse(d, 0.0d))
  }

  /** MEAN-CENTERED hyperplane buckets: sign pattern of `(v − μ)·w_p`
    * where μ is the exact per-dimension corpus mean ([[dimMeans]]).
    * Raw projections `v·w` are dominated by the corpus's mean vector
    * whenever embeddings aren't zero-centered (e.g. all-positive
    * feature ranges — ReLU activations, count features): almost every
    * vector lands on the mean's side of every plane, occupancy
    * collapses and the n²/2^planes pair-work bound is fiction because
    * the effective plane count is ~log₂(occupied buckets). Centering
    * restores balanced splits, which is what makes the
    * `planes ≈ log₂(n)` deployment contract REAL for such corpora —
    * the form a production ANN/nn-histogram pass should default to
    * (q201 reports both schemes' occupancy so the choice is measured,
    * not guessed; plane DECORRELATION, the other occupancy killer, is
    * fixed in [[planeWeights]] itself). Cost: one dims-bounded
    * aggregate + the same codegen multiply-add per row (μ ships as a
    * literal, `(v−μ)·w = v·w − μ·w` is folded into the same
    * zip_with). */
  def lshBucketsCentered(corpus: DataFrame, planes: Int): DataFrame = {
    val dims = embDims(corpus)
    val mu = dimMeans(corpus, dims)
    lshBucketsWith(corpus, planes, dims, mu)
  }

  /** [[lshBuckets]]/[[lshBucketsCentered]] with the corpus statistics
    * supplied by the caller — pass `mu = Seq.empty` for the raw scheme.
    * Exists so a multi-scheme evaluation (q201/q202's ladder) probes
    * `dims` and aggregates the exact mean ONCE instead of re-running
    * the two driver-side jobs per scheme; values are identical to the
    * self-computing forms by construction. */
  def lshBucketsWith(corpus: DataFrame, planes: Int, dims: Int,
      mu: Seq[Double] = Seq.empty): DataFrame =
    corpus.select(col("vec_id"),
      bucketKey(col("embedding"), planes, dims, mu).as("bucket"))

  /** Banded hyperplane buckets for near-dup detection: `bands`
    * independent bucket keys per vector (band b uses planes
    * b·R+1 … b·R+R). Two vectors are candidates when ANY band matches —
    * the OR-construction that buys recall at moderate thresholds, same
    * shape as MinHash banding. `centered = true` subtracts the exact
    * corpus mean from every projection ([[lshBucketsCentered]]'s
    * scheme, via the same [[planeBit]] helper): on a non-zero-mean
    * corpus (ReLU features, count vectors) RAW banded buckets collapse
    * to the mean's side exactly as q201 measures for single buckets —
    * every band's occupancy degrades together, so the OR-construction
    * recovers none of it and the banded recall/cost claims are
    * fiction. q201's banded rows pin both schemes' occupancy.
    * Output: (vec_id, band, bucket). */
  def lshBandKeys(corpus: DataFrame, bands: Int, planesPerBand: Int,
      centered: Boolean = false): DataFrame = {
    val dims = embDims(corpus)
    val mu = if (centered) dimMeans(corpus, dims) else Seq.empty[Double]
    lshBandKeysWith(corpus, bands, planesPerBand, dims, mu)
  }

  /** [[lshBandKeys]] with caller-supplied corpus statistics (see
    * [[lshBucketsWith]]); `mu = Seq.empty` selects the raw scheme. */
  def lshBandKeysWith(corpus: DataFrame, bands: Int, planesPerBand: Int,
      dims: Int, mu: Seq[Double] = Seq.empty): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        bucketKey(col("embedding"), planesPerBand, dims, mu,
          firstPlane = b * planesPerBand + 1).as("bucket")).as(s"b$b")
    }
    corpus
      .select(col("vec_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("vec_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** One probe of the embedding dimensionality + one exact-mean
    * aggregate, for feeding the `*With` builders across several
    * schemes. */
  def corpusStats(corpus: DataFrame): (Int, Seq[Double]) = {
    val dims = embDims(corpus)
    (dims, dimMeans(corpus, dims))
  }

  /** Embedding near-dup pairs: banded-LSH candidates (equi-join on
    * (band, bucket) — never an all-pairs product) verified by exact
    * cosine ≥ `threshold`. The verify join reads the corpus keyed by
    * vec_id; candidate volume, not corpus size, drives its cost.
    * `centered` forwards to [[lshBandKeys]] — the deployment default
    * for non-zero-mean embedding spaces. */
  def nearDupPairs(corpus: DataFrame, bands: Int, planesPerBand: Int,
      threshold: Double, centered: Boolean = false): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val keys = lshBandKeys(corpus, bands, planesPerBand, centered)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = keys.select(col("band"), col("bucket"), col("vec_id").as("id_a"))
    val b = keys.select(col("band"), col("bucket"), col("vec_id").as("id_b"))
    val pairs = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    val vecs = corpus.select(col("vec_id"), toDouble(col("embedding")).as("vv"))
    pairs
      .join(vecs.select(col("vec_id").as("id_a"), col("vv").as("va")), Seq("id_a"))
      .join(vecs.select(col("vec_id").as("id_b"), col("vv").as("vb")), Seq("id_b"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
      // dedup AFTER the verify filter: a pair matching in k bands costs k
      // extra codegen'd cosines, but the distinct shuffles only the
      // SURVIVORS (≈ output size) instead of every candidate — at scale
      // the all-candidates shuffle is the near-dup pipeline's bottleneck
      .distinct()
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into `nClusters` Voronoi cells by k-means (MLlib, fixed seed);
    * each query probes its `nProbe` nearest centroids and brute-forces
    * only those cells — the standard coarse-quantization ANN layout.
    * Centroids are tiny (`nClusters` rows) and broadcast; the corpus is
    * touched once for assignment (a fit + transform, amortized across
    * queries) and candidate generation is an equi-join on `cluster`.
    * Expected work per query: nProbe/nClusters of the corpus.
    *
    * k-means is iterative and seeded — deterministic for a fixed seed
    * and Spark version, but not SQL-reproducible, so this op is
    * spec-verified (recall vs brute force) rather than oracle-gated. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, seed: Long = 42L): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpusVec = corpus
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("fv", array_to_vector(col("v")))
    val model = new KMeans().setK(nClusters).setSeed(seed)
      .setFeaturesCol("fv").fit(corpusVec)
    val assigned = model.transform(corpusVec)
      .select(col("vec_id"), col("v"), col("prediction").as("cluster"))
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cluster", "c")
    ivfSearch(assigned, centroids, queries, k, nProbe)
  }

  /** Squared euclidean distance via the dot-product identity
    * `‖a-b‖² = a·a − 2a·b + b·b` — every term is the SAME left-fold
    * [[dot]], so the value (and therefore distance-based rankings)
    * reproduces bit-for-bit in engines whose dot product folds
    * sequentially (DuckDB `list_dot_product` — proven by the q31 gate). */
  def sqDist(a: Column, b: Column): Column =
    dot(a, a) - lit(2.0d) * dot(a, b) + dot(b, b)

  /** SEMANTIC decontamination — the embedding-space complement of the
    * n-gram eval-leak check ([[Dedup.decontaminate]]): a training
    * vector is contaminated when ANY benchmark vector sits within
    * `threshold` cosine of it (paraphrases and translations leak past
    * n-gram overlap; embeddings catch them). Emits every corpus row
    * with its max benchmark similarity and the flag, so the caller can
    * quarantine, hard-filter, or audit the margin distribution.
    *
    * Scale shape: same asymmetry as [[Dedup.decontaminate]] — the
    * benchmark side is bounded by construction, so it BROADCASTS and
    * the 100 TB training side streams once through the codegen'd
    * `cosine_sim` kernel; max-per-row partial-aggregates map-side
    * (max is order-free, no float-sum nondeterminism). Never shuffles
    * the corpus. Compose with [[lshBuckets]]/IVF candidate generation
    * if the benchmark suite ever outgrows broadcast size.
    *
    * An EMPTY benchmark set yields an empty result (no row has a max
    * to report), not an all-false flag column — callers guarding a
    * conditional eval suite should check `bench.isEmpty` first. */
  def semanticDecontaminate(corpus: DataFrame, bench: DataFrame,
      idCol: String, embCol: String, threshold: Double): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    corpus
      .select(col(idCol), toDouble(col(embCol)).as("__v"))
      .crossJoin(broadcast(bench.select(toDouble(col(embCol)).as("__bv"))))
      .select(col(idCol),
        graft.functions.CosineSimilarity(col("__bv"), col("__v")).as("__cos"))
      .groupBy(col(idCol))
      .agg(round(max(col("__cos")), 6).as("max_cos"))
      .withColumn("contaminated", col("max_cos") >= threshold)
  }

  /** Per-group centroid-distance outliers — the embedding-cleaning pass
    * that drops mislabeled / off-distribution vectors before training:
    * for each group, the `k` vectors farthest from the group centroid.
    *
    * Arithmetic is EXACT end-to-end: with `vi = round(v·10⁶)` (integer)
    * and the group centroid `Σvi / cnt`, the scaled deviation
    * `vi·cnt − Σvi` is an integer, so `dist2_scaled = Σ_pos (vi·cnt −
    * Σvi)²` is an order-free integer sum — identical bits under any
    * plan. The squares accumulate in DECIMAL(38,0), NOT long: with
    * unit-scale embeddings the deviation is ~10⁶·cnt, so its square
    * crosses Long.MaxValue around cnt ≈ 1000 over 64 dims and a long
    * sum would wrap silently under non-ANSI arithmetic (VERDICT r6
    * ADVICE) — decimal keeps the ranking exact to ~10³⁸, far past any
    * realistic group. The readable `dist` (= √dist2_scaled / (cnt·10⁶),
    * the true Euclidean distance to the centroid) derives from it in
    * one deterministic double expression.
    *
    * Scale shape: centroids from [[labelCentroids]] roll up to one row
    * per group (array-packed, sorted by pos — collect_list order never
    * leaks) and BROADCAST; the corpus side is one pass of per-row
    * zip_with/aggregate codegen plus a per-group top-k window. No
    * corpus-sized shuffle beyond the window's group partitioning.
    *
    * Output: (groupCol, rank 1..k, idCol, dist2_scaled, dist). */
  def centroidOutliers(corpus: DataFrame, embCol: String, idCol: String,
      groupCol: String, k: Int): DataFrame = {
    val cents = labelCentroids(corpus, embCol, groupCol)
      .groupBy(col(groupCol))
      .agg(
        array_sort(collect_list(struct(col("pos"), col("sum_scaled"))))
          .as("__cs"),
        max(col("cnt")).as("__cnt"))
      .select(col(groupCol),
        transform(col("__cs"), _.getField("sum_scaled")).as("__sums"),
        col("__cnt"))
    val vi = transform(col(embCol),
      v => round(v.cast("double") * 1000000d, 0).cast("long"))
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val d2 = aggregate(
      zip_with(col("__vi"), col("__sums"), (a, b) => {
        val d = (a.cast(dec) * col("__cnt") - b).cast(dec)
        (d * d).cast(dec)
      }),
      lit(0L).cast(dec), (acc, x) => (acc + x).cast(dec))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("dist2_scaled").desc, col(idCol).asc)
    corpus
      .select(col(idCol), col(groupCol), vi.as("__vi"))
      .join(broadcast(cents), Seq(groupCol))
      .select(col(idCol), col(groupCol), d2.as("dist2_scaled"), col("__cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(groupCol), col("rank"), col(idCol), col("dist2_scaled"),
        round(sqrt(col("dist2_scaled")) / (col("__cnt") * lit(1000000d)), 6)
          .as("dist"))
  }

  /** Element-wise mean embedding per group — the E-step primitive every
    * k-means / IVF / PQ training loop runs, exposed as a first-class
    * op. Floating-point sums are order-dependent, so a naive
    * `avg(element)` differs run-to-run as partial-aggregation order
    * shifts; this instead sums EXACT scaled integers (`round(v·10⁶)` as
    * long — associative, so any shuffle/combine order yields identical
    * bits) and divides once at the end. The same discipline a
    * production pipeline needs for reproducible checkpointed training
    * stats.
    *
    * Scale shape: `posexplode` is per-row (no shuffle, output = rows ×
    * dims); the single shuffle keys on (group, pos) and map-side
    * combine collapses traffic to |groups| × dims records per input
    * partition — independent of corpus size. At 100 TB the reduce side
    * holds |groups| × dims longs: trivially small.
    *
    * Output: (groupCol, pos, sum_scaled, cnt, centroid), one row per
    * group × dimension, `centroid` rounded to 6 places.
    */
  def labelCentroids(corpus: DataFrame, embCol: String,
      groupCol: String): DataFrame =
    corpus
      .select(col(groupCol), posexplode(col(embCol)).as(Seq("pos", "v")))
      .groupBy(col(groupCol), col("pos").cast("int").as("pos"))
      .agg(
        sum(round(col("v").cast("double") * 1000000d, 0).cast("long"))
          .as("sum_scaled"),
        count(lit(1)).as("cnt"))
      .select(col(groupCol), col("pos"), col("sum_scaled"), col("cnt"),
        round(col("sum_scaled") / col("cnt") / 1000000d, 6).as("centroid"))

  /** Deterministic distributed k-means (Lloyd's) — the full clustering
    * loop as a gated operator, not just the E-step (q104) or the
    * offline codebook path ([[pqCodebookTrainedOf]]). Per iteration:
    * the E-step rides the scan as a [[graft.functions.NearestCentroid]]
    * projection (codebook broadcast as literals — no N×k join, no
    * shuffle), and the M-step is ONE keyed aggregation of exact
    * scaled-integer moments ([[labelCentroids]]: Σ round(vᵢ·10⁶) longs
    * — associative, identical on any partitioning). Between iterations
    * the k·dims moment rows collect to the driver (the bounded-collect
    * codebook rule) and the next codebook is `s/n/10⁶` in one fixed
    * division order.
    *
    * Deterministic end to end: seeds are the k lowest-id vectors (the
    * [[ivfTopKFixed]] rule), assignment ties break to the lowest
    * cluster id (strict-< scan in the kernel), and every float enters
    * the moments through the same round-half-away scaling both engines
    * share — so a DuckDB oracle can unroll the recursion CTE-per-
    * iteration (the q130 PageRank pattern) and match bit-for-bit.
    * Clusters that lose all members drop out of the codebook (both
    * engines identically).
    *
    * Output after `iters` assignments: (cluster, pos, sum_scaled, cnt,
    * centroid) — the refreshed centroid table of the FINAL E-step. */
  def kmeans(corpus: DataFrame, vecCol: String, idCol: String, k: Int,
      iters: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(iters > 0, s"iters must be positive, got $iters")
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    // seeds: the k lowest-id vectors, cluster ids 0..k-1 in id order
    var cents: Seq[(Long, Seq[Double])] = corpus.orderBy(col(idCol)).limit(k)
      .select(toDouble(col(vecCol)).as("c"))
      .collect().zipWithIndex
      .map { case (r, i) => (i.toLong, r.getSeq[Double](0)) }
    var moments: DataFrame = null
    for (it <- 1 to iters) {
      val assigned = corpus.select(
        call_function("nearest_centroid", col(vecCol),
          typedLit(cents.map(_._1)), typedLit(cents.map(_._2))).as("cluster"),
        col(vecCol))
      moments = labelCentroids(assigned, vecCol, "cluster")
      if (it < iters) {
        // bounded collect: ≤ k·dims moment rows rebuild the codebook;
        // unrounded s/n/1e6 — rounding is for the OUTPUT edge only
        cents = moments.select(col("cluster"), col("pos"),
            (col("sum_scaled").cast("double") / col("cnt") / lit(1000000d))
              .as("c"))
          .collect()
          .groupBy(_.getLong(0)).toSeq
          .map { case (cl, rows) =>
            (cl, rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq) }
          .sortBy(_._1)
      }
    }
    moments
  }

  /** Reciprocal-rank fusion (Cormack et al.) of N ranked candidate
    * lists — the standard way a hybrid retrieval stack merges lexical
    * (BM25) and semantic (ANN) evidence without score calibration:
    * each list contributes `1/(kRrf + rank)`, absent docs contribute
    * 0. Inputs carry (idCol, rankCol); ranks should be computed over
    * ROUNDED scores with an id tie-break (the q96 rule) so the fused
    * order is engine-reproducible.
    *
    * Scale shape: candidate lists are top-N cuts — parameter-bounded,
    * a few hundred rows each — so the full-outer join chain is
    * driver-trivial regardless of corpus size; all the heavy lifting
    * happened in the retrievers that produced the lists.
    *
    * Output: (idCol, r_0 … r_{n-1}, rrf), ranks null where absent. */
  def rrfFuse(lists: Seq[DataFrame], idCol: String, rankCol: String,
      kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val terms = lists.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(rankCol).cast("long").as(s"r_$i")) }
    val joined = terms.reduce((l, r) => l.join(r, Seq(idCol), "full_outer"))
    val score = terms.indices
      .map(i => coalesce(lit(1.0) / (lit(kRrf) + col(s"r_$i")), lit(0.0)))
      .reduce(_ + _)
    joined.select(col(idCol) +: terms.indices.map(i => col(s"r_$i")) :+
      round(score, 6).as("rrf"): _*)
  }

  /** Exact per-dimension mean and population variance over an
    * embedding column — the statistics a whitening / standardization
    * pass (or a drift monitor comparing corpus snapshots) consumes.
    * Values are scaled to integers at the scan (`round(v·10⁶)` — the
    * q104/q106 trick) so both moment sums are exact and associative:
    * any partitioning, any shuffle order, any engine produces the
    * same bits. The variance is then one fixed double expression over
    * the two exact sums (computed as E[x²]−E[x]², each term divided
    * before combining, so no intermediate exceeds the scaled-square
    * range).
    *
    * Scale shape: one corpus scan, explode ∝ N·dims, and a single
    * aggregation whose state is `dims` rows of two longs — nothing
    * grows with N. At trillion-vector scale the scaled-square sum
    * approaches Long range; swap the two sums to DECIMAL(38,0) (the
    * q120 note) — the shape is unchanged.
    *
    * Output: (dim, n, mean, variance), one row per dimension. */
  def dimensionStats(corpus: DataFrame, embCol: String): DataFrame =
    corpus
      .select(posexplode(col(embCol)).as(Seq("dim", "v")))
      .select(col("dim").cast("long").as("dim"),
        round(col("v").cast("double") * 1000000d, 0).cast("long").as("sv"))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("sv")).as("__s"),
        sum(col("sv") * col("sv")).as("__ss"))
      .select(col("dim"), col("n"),
        round(col("__s").cast("double") / col("n") / 1000000d, 6).as("mean"),
        round((col("__ss").cast("double") / col("n") -
            (col("__s").cast("double") / col("n")) *
            (col("__s").cast("double") / col("n"))) / 1000000000000d, 6)
          .as("variance"))

  /** IVF with DETERMINISTIC coarse centroids: the `nClusters`
    * lowest-id corpus vectors serve as the quantizer (sample-as-
    * centroids — the standard IVF *initialization*, skipping the
    * k-means refinement [[ivfTopK]] adds). Selection is by id RANK
    * (order by vec_id, take nClusters), so sparse or offset id spaces
    * still yield a full quantizer. Fully SQL-reproducible, so this
    * variant is oracle-gated (q43) while [[ivfTopK]] is spec-verified
    * by recall.
    *
    * Same scale shape as [[ivfTopK]]: centroids broadcast (tiny),
    * assignment is one corpus pass (O(N·nClusters) dot products,
    * amortized across queries — persisted in a real deployment),
    * candidates via equi-join on `cluster`; per-query work ≈
    * nProbe/nClusters of the corpus. */
  def ivfTopKFixed(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(spark)
    // the quantizer is nClusters rows — the codebook every IVF engine
    // holds in memory; collecting it is bounded by the parameter, not
    // the data (same class of collect as BucketedParquetIndex's bucket
    // ids). Baking it into a literal makes assignment a pure per-row
    // map: no |corpus|×nClusters expanded join, no shuffle, no window.
    val centRows = corpus
      .orderBy(col("vec_id")).limit(nClusters)
      .select(col("vec_id"), toDouble(col("embedding")).as("c"))
      .collect()
      .sortBy(_.getLong(0))
    val ids = centRows.map(_.getLong(0)).toSeq
    val cvecs = centRows.map(_.getSeq[Double](1)).toSeq
    import spark.implicits._
    val cents = ids.zip(cvecs).toDF("cluster", "c")
    val assigned = corpus
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("cluster", call_function("nearest_centroid",
        col("v"), typedLit(ids), typedLit(cvecs)))
    ivfSearch(assigned, cents, queries, k, nProbe)
  }

  /** Shared IVF search tail: rank each query's `nProbe` nearest
    * centroids (squared-euclidean via [[sqDist]], ties by cluster id),
    * then exact cosine top-k within the probed cells only. Both IVF
    * variants route through here so tie-breaking/rounding can never
    * diverge between the oracle-gated and recall-tested paths. */
  private def ivfSearch(assigned: DataFrame, cents: DataFrame,
      queries: DataFrame, k: Int, nProbe: Int): DataFrame = {
    val probes = ivfProbes(queries, cents, nProbe)
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    assigned.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Probe selection shared by every IVF path — from-scratch
    * ([[ivfSearch]]) and persisted ([[AnnIndex.topKIvf]]): rank each
    * query's centroids by squared euclidean ([[sqDist]], ties to the
    * lowest cluster id) and keep the `nProbe` nearest. One shared
    * definition so the persisted index can never probe different
    * cells than the from-scratch scheme it is the storage for.
    * Output: (q_id, q double-vec, cluster). */
  private[ops] def ivfProbes(queries: DataFrame, cents: DataFrame,
      nProbe: Int): DataFrame = {
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist").asc, col("cluster").asc)
    queries.select(col("q_id"), toDouble(col("q_vec")).as("q"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", sqDist(col("q"), col("c")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), col("q"), col("cluster"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) candidate pairs:
    * WITHIN-CORPUS semantic near-duplicates via the cluster-then-prune
    * discipline — coarse-quantize every vector to its nearest centroid
    * (the same deterministic lowest-id-rank quantizer as
    * [[ivfTopKFixed]], so the op is SQL-reproducible and oracle-gated),
    * then compare pairs ONLY inside each cell and keep those with
    * cosine >= `threshold`. Output `(id_a, id_b, cos_sim)` with
    * id_a < id_b; feed it to [[Dedup.connectedComponents]] + a keep
    * policy for the full SemDeDup prune, exactly as the text-side LSH
    * pairs feed q50/q89.
    *
    * Scale shape: centroids are a bounded broadcastable literal;
    * assignment is one per-row codegen pass (no shuffle); the pair
    * join is a single self-equi-join keyed on `cluster`, so comparison
    * cost is Σ|cell|², never N² — the entire point of the cluster
    * step. Cell skew is the known hazard: one degenerate cell (a
    * boilerplate-embedding storm, a zero-vector dump) is a quadratic
    * blow-up, so `maxCell` caps it the way [[Dedup.candidatePairs]]'s
    * `maxBucket` caps LSH buckets — each cell keeps only its `maxCell`
    * LOWEST-ID members (deterministic truncation, planned as a
    * `WindowGroupLimit`: per-partition heads, no full sort), every
    * oversize cell is logged with its size, and comparison cost is
    * bounded by nClusters·maxCell². Truncated members lose only
    * within-cell pairs a storm makes operationally useless (the exact
    * pass catches true dups); at 100 TB also run the k-means-refined
    * quantizer offline so cells balance toward N/k. */
  def semDedupPairs(corpus: DataFrame, nClusters: Int,
      threshold: Double, maxCell: Int = Int.MaxValue): DataFrame = {
    require(maxCell > 1, s"maxCell must be > 1, got $maxCell")
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val centRows = corpus
      .orderBy(col("vec_id")).limit(nClusters)
      .select(col("vec_id"), toDouble(col("embedding")).as("c"))
      .collect()
      .sortBy(_.getLong(0))
    val ids = centRows.map(_.getLong(0)).toSeq
    val cvecs = centRows.map(_.getSeq[Double](1)).toSeq
    val allAssigned = corpus
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("cluster", call_function("nearest_centroid",
        col("v"), typedLit(ids), typedLit(cvecs)))
    val assigned =
      if (maxCell == Int.MaxValue) allAssigned
      else {
        // bounded by construction: at most nClusters rows can be oversize
        val oversize = allAssigned.groupBy(col("cluster"))
          .agg(count(lit(1)).as("n")).filter(col("n") > maxCell)
          .collect()
        oversize.foreach { r =>
          System.err.println(s"semDedupPairs: cell ${r.getLong(0)} has " +
            s"${r.getLong(1)} members; truncating to $maxCell lowest ids")
        }
        val w = Window.partitionBy(col("cluster")).orderBy(col("vec_id").asc)
        allAssigned.withColumn("__cr", row_number().over(w))
          .filter(col("__cr") <= maxCell).drop("__cr")
      }
    val left = assigned
      .select(col("cluster"), col("vec_id").as("id_a"), col("v").as("va"))
    val right = assigned
      .select(col("cluster"), col("vec_id").as("id_b"), col("v").as("vb"))
    left.join(right, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos",
        graft.functions.CosineSimilarity(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos_sim"))
  }

  /** The full SemDeDup prune decision (pairs → transitive clusters →
    * keep policy): vectors whose cosine-similarity graph connects them
    * form one semantic-duplicate cluster; the lowest id is kept, the
    * rest are marked for drop — exactly how the text-side LSH pairs
    * feed q50/q89. Output `(vec_id, cluster_rep, kept)` for every
    * CLUSTERED vector; singletons never appear (they are implicitly
    * kept, and materializing a corpus-sized "kept" column would dwarf
    * the duplicate set it reports on).
    *
    * Scale shape: [[semDedupPairs]] bounds the pair volume
    * (Σ|cell|², `maxCell`-capped); [[Dedup.connectedComponents]]
    * resolves clusters driver-side under `maxDriverEdges` and falls
    * back to large-star/small-star contraction above it. */
  def semDedupKeep(corpus: DataFrame, nClusters: Int, threshold: Double,
      maxCell: Int = Int.MaxValue): DataFrame = {
    val pairs = semDedupPairs(corpus, nClusters, threshold, maxCell)
      .select(col("id_a"), col("id_b"))
    Dedup.connectedComponents(pairs)
      .select(col("node").as("vec_id"), col("cluster").as("cluster_rep"),
        (col("node") === col("cluster")).as("kept"))
  }

  /** Product-quantization codebook: per subspace, the sub-vectors of
    * the `k` lowest-id corpus vectors (sample-as-codewords — the same
    * deterministic initialization [[ivfTopKFixed]] uses for its coarse
    * quantizer, skipping the k-means refinement a production build
    * would run offline). Bounded by k·dims doubles — the structure
    * every PQ engine broadcasts. Returns, per subspace, the k codeword
    * sub-vectors in code order. */
  private def pqCodebook(corpus: DataFrame, m: Int, k: Int,
      dsub: Int): IndexedSeq[IndexedSeq[Seq[Double]]] = {
    val rows = corpus
      .orderBy(col("vec_id")).limit(k)
      .select(col("vec_id"), toDouble(col("embedding")).as("c"))
      .collect()
      .sortBy(_.getLong(0))
    require(rows.length == k, s"PQ codebook needs $k vectors, got ${rows.length}")
    (0 until m).map { mi =>
      rows.toIndexedSeq.map(_.getSeq[Double](1).slice(mi * dsub, (mi + 1) * dsub))
    }
  }

  /** The per-subspace PQ code columns (`code0..code{m-1}`): one
    * `nearest_centroid` codegen kernel per subspace over a slice of the
    * embedding. */
  private def pqCodeCols(cb: IndexedSeq[IndexedSeq[Seq[Double]]], m: Int,
      ksub: Int, dsub: Int): Seq[Column] = {
    val codeIds = (0L until ksub.toLong).toSeq
    val v = toDouble(col("embedding"))
    (0 until m).map { mi =>
      call_function("nearest_centroid",
        slice(v, mi * dsub + 1, dsub),
        typedLit(codeIds), typedLit(cb(mi))).cast("int").as(s"code$mi")
    }
  }

  /** Asymmetric PQ distance: sum over subspaces of the squared distance
    * from the query's sub-vector (column `q`) to the candidate's
    * codeword (looked up from the literal codebook by `code{mi}`). */
  private def adcDist(cb: IndexedSeq[IndexedSeq[Seq[Double]]], m: Int,
      dsub: Int): Column =
    (0 until m).map { mi =>
      sqDist(slice(col("q"), mi * dsub + 1, dsub),
        element_at(typedLit(cb(mi)), col(s"code$mi") + 1))
    }.reduce(_ + _)

  /** A trained PQ codebook: `cents(mi)(code)` is the codeword
    * sub-vector for subspace `mi`. Kept as a first-class value so a
    * STREAMING encode can reuse a codebook trained offline — codes are
    * only comparable across batches when they come from one codebook;
    * re-deriving it per micro-batch would silently re-map code space. */
  case class PqCodebook(m: Int, dsub: Int,
      cents: IndexedSeq[IndexedSeq[Seq[Double]]]) {
    def ksub: Int = cents.head.length
  }

  /** Train (sample-as-codewords) a PQ codebook from a batch corpus:
    * bounded collect of the `k` lowest-id vectors, split into `m`
    * subspaces. */
  def pqCodebookOf(corpus: DataFrame, m: Int, k: Int): PqCodebook = {
    val dims = embDims(corpus)
    require(m > 0 && dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    PqCodebook(m, dsub, pqCodebook(corpus, m, k, dsub))
  }

  /** Lloyd's-refined PQ codebook — the OFFLINE TRAINING path a
    * production build runs before encoding (VERDICT r5 item 4). Starts
    * from [[pqCodebookOf]]'s sample-as-codewords initialization and
    * runs `iters` fixed iterations of k-means per subspace over a
    * deterministic, id-hash-ordered sample of `trainSize` vectors.
    *
    * The training set is a bounded driver-side collect BY DESIGN:
    * production PQ trains on ~10^5-10^6 vectors regardless of corpus
    * size (codebook quality saturates long before the corpus is
    * exhausted — the codebook is only k·m codewords), so the collect is
    * parameter-bounded like the codebook itself, and driver-side
    * Lloyd's buys full determinism: fixed iteration count, points
    * visited in a fixed order, ties to the lowest code, empty clusters
    * keep their previous codeword. Hash-ordering the sample
    * (xxhash64 of vec_id) makes it unbiased w.r.t. id locality while
    * staying engine-reproducible. */
  def pqCodebookTrainedOf(corpus: DataFrame, m: Int, k: Int,
      iters: Int = 10, trainSize: Int = 4096): PqCodebook = {
    val dims = embDims(corpus)
    require(m > 0 && dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(trainSize >= k, s"trainSize $trainSize must cover k=$k codewords")
    val dsub = dims / m
    val train = corpus
      .select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id")).limit(trainSize)
      .collect()
      .sortBy(_.getLong(0))
      .map(_.getSeq[Double](1).toArray)
    val init = pqCodebook(corpus, m, k, dsub)
    val cents = (0 until m).map { mi =>
      val pts = train.map(v => java.util.Arrays.copyOfRange(v, mi * dsub, (mi + 1) * dsub))
      lloyd(pts, init(mi).map(_.toArray).toArray, iters)
        .map(_.toSeq).toIndexedSeq
    }
    PqCodebook(m, dsub, cents)
  }

  /** Deterministic in-memory Lloyd's (see [[pqCodebookTrainedOf]] for
    * why driver-side): squared-euclidean assignment with ties to the
    * lowest code, mean update, empty clusters retain their codeword. */
  private def lloyd(points: Array[Array[Double]],
      init: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    val k = init.length
    val d = if (points.isEmpty) 0 else points(0).length
    var cents = init.map(_.clone)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      points.foreach { p =>
        var best = 0
        var bd = Double.PositiveInfinity
        var c = 0
        while (c < k) {
          var dist = 0.0
          var j = 0
          while (j < d) { val t = p(j) - cents(c)(j); dist += t * t; j += 1 }
          if (dist < bd) { bd = dist; best = c }
          c += 1
        }
        val s = sums(best)
        var j = 0
        while (j < d) { s(j) += p(j); j += 1 }
        counts(best) += 1
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) cents(c)
        else Array.tabulate(d)(j => sums(c)(j) / counts(c))
      }
      it += 1
    }
    cents
  }

  /** Encode (vec_id, embedding) rows against an EXISTING codebook —
    * a pure stateless per-row projection (one `nearest_centroid`
    * codegen kernel per subspace, then an unpivot), so it applies
    * unchanged to a Structured Streaming DataFrame: new vectors
    * arriving on a stream get codes append-only, and the index grows
    * incrementally without touching old rows (StreamingOpsSpec).
    *
    * Output: (vec_id, subspace, code). */
  def pqEncodeWith(df: DataFrame, cb: PqCodebook): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(df.sparkSession)
    val codeCols = pqCodeCols(cb.cents, cb.m, cb.ksub, cb.dsub)
    val stackArgs = (0 until cb.m)
      .map(mi => s"$mi, code$mi").mkString(s"stack(${cb.m}, ", ", ", ") AS (subspace, code)")
    df.select(col("vec_id") +: codeCols: _*)
      .select(col("vec_id"), expr(stackArgs))
  }

  /** Product-quantization encode: split each vector into `m` subspaces
    * and store, per subspace, the index of the nearest codeword
    * (squared euclidean, ties to the lowest code) — 64 raw floats
    * become `m` small ints. This is the compression layer of IVF-PQ,
    * the layout 100 TB vector indexes actually ship: at m=4, k=16 a
    * 256-byte vector rides in 4 bytes, so a billion-vector index fits
    * in executor memory instead of spilling per probe.
    *
    * Scale shape: the codebook is a bounded collect (k·dims doubles)
    * baked into a literal; assignment is one pure per-row
    * `nearest_centroid` kernel per subspace — zero shuffles, zero
    * joins, the whole encode is a projection over one corpus scan.
    *
    * Output: (vec_id, subspace, code) — oracle-gated (q85). */
  def pqEncode(corpus: DataFrame, m: Int, k: Int): DataFrame =
    pqEncodeWith(corpus, pqCodebookOf(corpus, m, k))

  /** PQ asymmetric-distance top-k: corpus vectors are represented ONLY
    * by their PQ codes; each query scores a candidate as the sum of
    * per-subspace squared distances to the candidate's codewords. The
    * scan side carries m small ints per vector instead of the raw
    * embedding — the memory/bandwidth win that makes exhaustive ADC
    * scans viable where raw-vector scans spill.
    *
    * The per-subspace distance here is recomputed per row from the
    * literal codebook (still codegen'd, k·dsub multiply-adds); a
    * production kernel would precompute the m×k lookup table per query
    * — an engine-level optimization with identical semantics.
    * Approximate by construction (quantization error), so spec-gated
    * by recall vs the exact scan, like [[ivfTopK]]. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int, ksub: Int): DataFrame =
    pqTopKWith(corpus, queries, k, pqCodebookOf(corpus, m, ksub))

  /** [[pqTopK]] against an EXPLICIT codebook — the entry point for a
    * codebook trained offline ([[pqCodebookTrainedOf]]) or reused
    * across batches; same scan shape (codes-only corpus state, ADC
    * scoring, window top-k). */
  def pqTopKWith(corpus: DataFrame, queries: DataFrame, k: Int,
      cb: PqCodebook): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(spark)
    require(embDims(corpus) == cb.m * cb.dsub,
      s"codebook covers ${cb.m * cb.dsub} dims, corpus has ${embDims(corpus)}")
    // the codes table is all the corpus state the scan needs
    val codes = corpus.select(
      col("vec_id") +: pqCodeCols(cb.cents, cb.m, cb.ksub, cb.dsub): _*)
    val q = queries.select(col("q_id"), toDouble(col("q_vec")).as("q"))
    val approx = adcDist(cb.cents, cb.m, cb.dsub)
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    codes.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", approx)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("adist"), 6).as("approx_dist"))
  }

  /** IVF-PQ: the composed layout 100 TB vector indexes actually ship.
    * Coarse routing (deterministic sample centroids, as in
    * [[ivfTopKFixed]]) restricts each query to `nProbe` cells; within
    * the probed cells candidates are scored by PQ asymmetric distance
    * over their codes only ([[pqTopK]]'s scoring). The scan state per
    * vector is (cluster, m codes) — a few bytes — and per-query work is
    * ~nProbe/nClusters of the corpus with no raw-vector reads at all.
    * Doubly approximate (routing + quantization), so spec-gated by
    * recall + determinism like the other approximate tiers. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      nClusters: Int, nProbe: Int, m: Int, ksub: Int,
      codebook: Option[PqCodebook] = None): DataFrame = {
    val spark = corpus.sparkSession
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val dims = embDims(corpus)
    require(m > 0 && dims % m == 0, s"dims $dims must split evenly into $m subspaces")
    val dsub = dims / m
    codebook.foreach { c =>
      require(c.m == m && c.dsub == dsub && c.ksub == ksub,
        s"codebook shape (m=${c.m}, dsub=${c.dsub}, ksub=${c.ksub}) " +
          s"must match (m=$m, dsub=$dsub, ksub=$ksub)")
    }
    // coarse quantizer: bounded by nClusters (the broadcastable codebook)
    val centRows = corpus
      .orderBy(col("vec_id")).limit(nClusters)
      .select(col("vec_id"), toDouble(col("embedding")).as("c"))
      .collect()
      .sortBy(_.getLong(0))
    val cids = centRows.map(_.getLong(0)).toSeq
    val cvecs = centRows.map(_.getSeq[Double](1)).toSeq
    import spark.implicits._
    val cents = cids.zip(cvecs).toDF("cluster", "c")
    val cb = codebook.map(_.cents).getOrElse(pqCodebook(corpus, m, ksub, dsub))
    // ONE corpus projection pass emits cluster + codes together
    val codes = corpus.select(
      col("vec_id") +:
        call_function("nearest_centroid", toDouble(col("embedding")),
          typedLit(cids), typedLit(cvecs)).as("cluster") +:
        pqCodeCols(cb, m, ksub, dsub): _*)
    val wProbe = Window.partitionBy(col("q_id"))
      .orderBy(col("cdist").asc, col("cluster").asc)
    val probes = queries.select(col("q_id"), toDouble(col("q_vec")).as("q"))
      .crossJoin(broadcast(cents))
      .withColumn("cdist", sqDist(col("q"), col("c")))
      .withColumn("prank", row_number().over(wProbe))
      .filter(col("prank") <= nProbe)
      .select(col("q_id"), col("q"), col("cluster"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("adist").asc, col("vec_id").asc)
    codes.join(broadcast(probes), Seq("cluster"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adist", adcDist(cb, m, dsub))
      .withColumn("rank", row_number().over(wk))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("adist"), 6).as("approx_dist"))
  }

  /** Approximate top-k: candidates share the query's bucket; exact
    * cosine + window only within buckets. The equi-join on `bucket`
    * replaces the cross join — at N corpus vectors and B buckets the
    * work drops from |Q|·N to ~|Q|·N/B comparisons. */
  def topKNeighborsLsh(corpus: DataFrame, queries: DataFrame,
      k: Int, planes: Int): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    val dims = embDims(corpus)
    val corpusB = corpus.select(col("vec_id"),
      toDouble(col("embedding")).as("v"),
      lshBucket(col("embedding"), planes, dims).as("bucket"))
    val queriesB = queries.select(col("q_id"),
      toDouble(col("q_vec")).as("q"),
      lshBucket(col("q_vec"), planes, dims).as("bucket"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpusB.join(broadcast(queriesB), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** The multi-probe probe set for a bucket key: the bucket itself
    * plus every 1-bit-flip neighbor — `planes + 1` bucket strings as
    * an array column. THE single implementation of the flip expression
    * ([[topKNeighborsLshMultiProbe]] and q202's recall ladder both
    * consume it; the dominance spec pins multi ⊇ single through it). */
  def probeBuckets(bucket: Column, planes: Int): Column = {
    val flips = (1 to planes).map { i =>
      concat(substring(bucket, 1, i - 1),
        when(substring(bucket, i, 1) === "1", "0").otherwise("1"),
        substring(bucket, i + 1, planes - i))
    }
    array(bucket +: flips: _*)
  }

  /** Multi-probe LSH top-k: each query searches its own hyperplane
    * bucket PLUS every 1-bit-flip neighbor bucket — the standard
    * recall recovery for bucketed ANN (a vector near a hyperplane
    * falls on either side; probing both catches it) at (planes+1)×
    * probe cost instead of 2^planes brute force. `centered = true`
    * buckets both sides with the CORPUS mean subtracted
    * ([[lshBucketsCentered]]'s scheme — the index's statistic centers
    * the queries too, the deployment semantic for non-zero-mean
    * embedding spaces). q202 measures what each probing rung buys.
    *
    * Scale shape: the probe set is (planes+1)·Q rows, broadcast; the
    * candidate pass stays a bucket equi-join; dedup and the per-query
    * rank window run over candidate rows only, never the corpus.
    *
    * Output: (q_id, rank, vec_id, cos_sim), rank 1..k by
    * (cos desc, vec_id). */
  def topKNeighborsLshMultiProbe(corpus: DataFrame, queries: DataFrame,
      k: Int, planes: Int, centered: Boolean = false): DataFrame = {
    graft.functions.GraftExtensions.ensureRegistered(corpus.sparkSession)
    require(k > 0, s"k must be positive, got $k")
    val dims = embDims(corpus)
    val mu = if (centered) dimMeans(corpus, dims) else Seq.empty[Double]
    // persisted: the frame feeds BOTH the candidate bucket join and the
    // payload re-join — without the persist the per-plane dot products
    // run twice per corpus row (ADVICE r10)
    val corpusB = corpus.select(col("vec_id"),
      toDouble(col("embedding")).as("v"),
      bucketKey(col("embedding"), planes, dims, mu).as("bucket"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val qB = queries.select(col("q_id"),
      toDouble(col("q_vec")).as("q"),
      bucketKey(col("q_vec"), planes, dims, mu).as("bucket"))
    val probes = qB.select(col("q_id"),
      explode(probeBuckets(col("bucket"), planes)).as("bucket"))
    // candidate dedup on SLIM (q_id, vec_id) keys before scoring: a
    // vector reachable through several probes must rank once, the
    // cosine kernel runs once per (query, candidate) — and the
    // distinct never shuffles vector payloads, which re-join by id
    // afterwards (q188's shape)
    val cand = corpusB.select(col("vec_id"), col("bucket"))
      .join(broadcast(probes), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .join(qB.select(col("q_id"), col("q")), "q_id")
      .join(corpusB.select(col("vec_id"), col("v")), "vec_id")
      .withColumn("cos", graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  /** Symmetric max-abs int8 quantization — the storage layout a 100 TB
    * embedding corpus actually ships (4× smaller than float32, and the
    * format GPU inference kernels consume directly). Per vector:
    * `scale = max(|vᵢ|)` and `codeᵢ = ⌊vᵢ/scale·127 + 0.5⌋ ∈ [−127,127]`.
    * Zero shuffle: scale and codes are array expressions inside the
    * scan's projection; `posexplode` emits the long-form (vec_id, pos,
    * code) layout the q112 oracle checks (same shape q85 uses for PQ
    * codes). `⌊x+0.5⌋` rather than `round` because floor of an
    * identical IEEE double agrees across engines while round-half
    * conventions differ; the 1e-12 floor keeps the all-zero vector
    * defined (codes 0) instead of NaN.
    *
    * At scale the exploded form is for the gate only — a production
    * writer keeps `codes` as the array column (see the q112 scaladoc).
    */
  def maxAbsQuantize(corpus: DataFrame, vecCol: String = "embedding",
      idCol: String = "vec_id"): DataFrame = {
    val vd = toDouble(col(vecCol))
    val scale = greatest(array_max(transform(vd, x => abs(x))), lit(1e-12))
    corpus
      .select(col(idCol), round(scale, 6).as("scale"),
        transform(vd, x => floor(x / scale * 127 + lit(0.5)).cast("int"))
          .as("codes"))
      .select(col(idCol), col("scale"), posexplode(col("codes")))
      .select(col(idCol), col("pos").cast("int").as("pos"),
        col("col").as("code"), col("scale"))
  }

  /** EXACT Hamming-≤`maxHam` neighbor search over 16-bit SimHash codes
    * via pigeonhole banding: split each code into 4 nibbles; any pair
    * within Hamming distance 3 MUST agree on at least one nibble (3
    * flips cannot touch all 4 bands), so candidates = equi-join on
    * (band, nibble) and the `bit_count(xor)` verify keeps the true
    * positives — complete by pigeonhole for `maxHam ≤ 3`, no recall
    * loss. The bitwise sibling of [[graft.ops.Dedup.candidatePairs]]
    * (probabilistic) and [[graft.ops.Dedup.prefixFilterPairs]]
    * (set-exact): near-dup search when the representation is a
    * fingerprint, at 4 bytes of state per document.
    *
    * Scale shape: corpus side explodes ×4 into (band, nibble) keys —
    * all integer arithmetic in the scan projection; the query side
    * broadcasts; verify ∝ candidates. Per-query top-k is a window over
    * candidate rows only.
    *
    * Output: (qIdCol, rank, idCol, hamming), rank 1..k by (hamming,
    * id). */
  def hammingNeighbors(codes: DataFrame, idCol: String, codeCol: String,
      queries: DataFrame, qIdCol: String, qCodeCol: String,
      k: Int, maxHam: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxHam >= 0 && maxHam <= 3,
      s"pigeonhole banding over 4 nibbles is complete only for maxHam <= 3, got $maxHam")
    def banded(df: DataFrame, id: String, code: String, pfx: String) = df
      .select(col(id), col(code).cast("long").as(s"${pfx}code"))
      .select(col(id), col(s"${pfx}code"), posexplode(array(
        (0 until 4).map(b =>
          shiftright(col(s"${pfx}code"), 4 * b).bitwiseAND(lit(15L))): _*))
        .as(Seq("band", "nib")))
    val c = banded(codes, idCol, codeCol, "c_")
    val q = banded(queries, qIdCol, qCodeCol, "q_")
    val w = Window.partitionBy(col(qIdCol))
      .orderBy(col("hamming").asc, col(idCol).asc)
    c.join(broadcast(q), Seq("band", "nib"))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol), col("q_code"), col("c_code"))
      .distinct() // a pair can agree on several bands
      .withColumn("hamming",
        bit_count(col("q_code").bitwiseXOR(col("c_code"))).cast("long"))
      .filter(col("hamming") <= maxHam)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank").cast("int").as("rank"),
        col(idCol), col("hamming"))
  }

  /** Linear-classifier inference over an embedding column — the
    * fastText/logreg-style quality- or domain-classifier scoring pass
    * every curation pipeline runs over its full corpus (CCNet's quality
    * LM, Llama's Wikipedia-likeness classifier). The model (per-class
    * weight vectors + biases) is broadcast as literals into the scan's
    * projection: per row, C dot products, a max, and a first-strict-max
    * argmax — zero shuffle, whole-stage codegen, no UDF. Softmax is
    * monotone so argmax and max-score ranking don't need it.
    *
    * Returns `(pred, score)` as a struct column: `pred` = the LOWEST
    * class index attaining the max (left-scan, replaced only on strict
    * improvement — deterministic on exact ties), `score` = the winning
    * raw margin. Reproducible across engines when weights are exact
    * binary fractions: float→double widening is exact, each product
    * rounds once, and the sum is left-to-right in both the unrolled
    * chain here and DuckDB's sequential list_dot_product.
    *
    * The dot products are UNROLLED into per-element `element_at`
    * products instead of [[dot]]'s `aggregate(zip_with(...))`:
    * higher-order functions are CodegenFallback expressions, and a
    * fallback in the hot projection would drop the whole scan stage
    * out of whole-stage codegen (PlanGuardSpec pins the span). */
  def linearArgmax(vec: Column, weights: Seq[Seq[Double]],
      bias: Seq[Double]): Column = {
    val best = argmaxStruct(linearScores(vec, weights, bias))
    struct(best("c").as("pred"), best("s").as("score"))
  }

  /** The per-class unrolled score expressions of [[linearArgmax]],
    * exposed separately so a caller can materialize them as columns in
    * a FIRST projection and run [[argmaxStruct]] over cheap column
    * refs in a second — the argmax chain references each score ~2^C
    * times, and inlining the 64-term dots at every reference bloats
    * the generated code (q135 does the two-step split). */
  def linearScores(vec: Column, weights: Seq[Seq[Double]],
      bias: Seq[Double]): Seq[Column] = {
    require(weights.nonEmpty && weights.size == bias.size,
      s"need one bias per class: ${weights.size} weight rows, ${bias.size} biases")
    weights.zip(bias).map { case (w, b) =>
      w.zipWithIndex
        .map { case (wi, i) => element_at(vec, i + 1).cast("double") * lit(wi) }
        .reduceLeft(_ + _) + lit(b)
    }
  }

  /** First-strict-max scan over score columns: (s, c) struct per class,
    * replaced only on strict improvement — lowest class wins exact
    * ties. */
  def argmaxStruct(scores: Seq[Column]): Column =
    scores.zipWithIndex
      .map { case (s, c) => struct(s.as("s"), lit(c).as("c")) }
      .reduceLeft((a, b) => when(b("s") > a("s"), b).otherwise(a))

  /** Leading principal direction of the (uncentered) Gram matrix XᵀX
    * by DISTRIBUTED power iteration — the dimensionality-reduction /
    * whitening primitive a 100 TB embedding store runs without ever
    * materializing a d×d matrix: each round is one corpus pass
    * computing, per row, the scalar s = x·v (an unrolled literal dot
    * in the scan projection — the q135 [[linearScores]] shape) and,
    * per dimension, t_j = Σ_rows x_j·s. Nothing but the d-vector ever
    * reaches the driver (the k-means codebook discipline).
    *
    * Determinism (the q130/q137 discipline): every per-row
    * contribution x_j·s is rounded to a 1e6-scaled long BEFORE the
    * per-dimension sum — long addition is associative, so t is
    * bit-identical on any partitioning — and the normalization
    * divides exact longs by `sqrt(Σ t²)` computed in BigInt, one
    * fixed double expression an oracle replays. Init is the uniform
    * unit vector 1/√d (exactly representable when d is a power of
    * two), so runs are seed-free reproducible.
    *
    * Output: (pos, loading) — the unit-norm component after `iters`
    * rounds, pos 0-based, loading rounded 6. */
  /** One power-iteration round BEFORE its collect: the (pos, t)
    * aggregate frame — per-row scalar s = x·v in the scan projection,
    * scaled-long contributions, one pos-keyed aggregation. Exposed
    * separately so PlanGuardSpec can pin the round's shape (exactly
    * one exchange; output bounded by `dims` rows). */
  private[graft] def powerIterationRound(corpus: DataFrame, vecCol: String,
      v: Seq[Double]): DataFrame = {
    val s = linearScores(col(vecCol), Seq(v), Seq(0.0)).head
    corpus
      .select(toDouble(col(vecCol)).as("xv"), s.as("s"))
      .select(col("s"), posexplode(col("xv")).as(Seq("pos", "x")))
      .select(col("pos"),
        round(col("x") * col("s") * lit(1e6), 0).cast("long").as("c"))
      .groupBy(col("pos")).agg(sum(col("c")).as("t"))
  }

  def powerIterationPC1(corpus: DataFrame, vecCol: String, dims: Int,
      iters: Int): DataFrame = {
    require(dims > 0, s"dims must be positive, got $dims")
    require(iters >= 1 && iters <= 10, s"iters must be in [1,10], got $iters")
    var v: Seq[Double] = Seq.fill(dims)(1.0 / math.sqrt(dims.toDouble))
    for (_ <- 1 to iters) {
      val ts = powerIterationRound(corpus, vecCol, v)
        .collect()                       // bounded: exactly `dims` rows
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2).toSeq
      val nrm = math.sqrt(ts.map(t => BigInt(t) * BigInt(t)).sum.toDouble)
      v = ts.map(_.toDouble / nrm)
    }
    val sp = corpus.sparkSession
    import sp.implicits._
    v.zipWithIndex.map { case (l, p) =>
      (p, BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("pos", "loading")
  }
}
