package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("shingles: k-grams, short docs yield empty not reversed sequence") {
    val df = Seq((1L, "a b c d"), (2L, "a b"), (3L, "a")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    sh(1L) shouldBe Seq("a b c", "b c d")
    sh(2L) shouldBe Seq.empty
    sh(3L) shouldBe Seq.empty
  }

  test("words treats regex-metacharacter delimiters literally") {
    // '.' as a regex would split between EVERY character; quoted it
    // splits only on literal dots ('|' likewise)
    val df = Seq("a.b.c").toDF("text")
    df.select(Dedup.words(col("text"), ".").as("w"))
      .head().getSeq[String](0) shouldBe Seq("a", "b", "c")
    df.select(TextAnalysis.words(col("text"), ".").as("w"))
      .head().getSeq[String](0) shouldBe Seq("a", "b", "c")
    Seq("x|y z").toDF("text")
      .select(Dedup.words(col("text"), "|").as("w"))
      .head().getSeq[String](0) shouldBe Seq("x", "y z")
  }

  test("exact dedup marks one canonical row per content key") {
    val df = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "text", "doc_id")
      .select("doc_id", "is_canonical").as[(Long, Boolean)].collect().toMap
    out shouldBe Map(1L -> true, 2L -> false, 3L -> true)
  }

  test("minhash LSH surfaces a true near-dup pair; jaccard verifies") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "completely different words nothing shared here at all ever done"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val pairs = Dedup.candidatePairs(
      Dedup.bandKeys(df, "text", "doc_id", bands = 8, rowsPerBand = 1))
    val verified = Dedup.jaccardVerify(pairs, df, "text", "doc_id", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    verified shouldBe Set((1L, 2L))
  }

  test("native simhash16 and winnow_fp kernels equal their composed HOF forms") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
      // edge rows the corpus lacks: single word, short-of-one-k-gram
      .unionByName(Seq((9001L, "word"), (9002L, "ab")).toDF("doc_id", "text"))
    val simNative = docs.select(col("doc_id"),
      Dedup.simhash16Native(docs, Dedup.words(col("text"))).as("simhash"))
    val simComposed = docs
      .select(col("doc_id"), Dedup.wordHashes(Dedup.words(col("text"))).as("wh"))
      .select(col("doc_id"), Dedup.simhash16FromHashes(col("wh")).as("simhash"))
    simNative.exceptAll(simComposed).count() shouldBe 0
    simComposed.exceptAll(simNative).count() shouldBe 0

    val winNative = Dedup.winnowFingerprint(docs, "text", "doc_id", 8, 4)
    val winComposed = Dedup.winnowFingerprintComposed(docs, "text", "doc_id", 8, 4)
    winNative.exceptAll(winComposed).count() shouldBe 0
    winComposed.exceptAll(winNative).count() shouldBe 0
  }

  test("xxhash64 minhash family: same near-dups, no md5, deterministic") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val b = "the quick brown fox jumps over the lazy cat again and again"
    val c = "completely different words nothing shared here at all ever done"
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    def pairsWith(fam: String) = Dedup.jaccardVerify(
      Dedup.candidatePairs(Dedup.bandKeys(df, "text", "doc_id",
        bands = 8, rowsPerBand = 1, shingleK = 3, hashFamily = fam)),
      df, "text", "doc_id", 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairsWith("xxhash64") shouldBe Set((1L, 2L)) // same truth as md5 family
    // the families are genuinely different hash functions
    def sigs(fam: String) = Dedup.bandKeys(df, "text", "doc_id",
      8, 1, 3, fam).select("band_key").as[String].collect().toSet
    sigs("xxhash64") should not be sigs("md5")
    sigs("xxhash64") shouldBe sigs("xxhash64") // deterministic across runs
    intercept[Exception](sigs("fnv"))
  }

  test("native simhash16 matches the composed form on null tokens (-1 every bit)") {
    // arrays with null elements never come from words(), but the kernel
    // and the composed HOF form must still agree if one sneaks in
    val df = Seq(1L, 2L, 3L).toDF("doc_id").select(col("doc_id"),
      when(col("doc_id") === 1L,
          array(lit("alpha"), lit(null).cast("string"), lit("beta")))
        .when(col("doc_id") === 2L, array(lit(null).cast("string")))
        .otherwise(array(lit("alpha"), lit("beta"))).as("ws"))
    val native = df.select(col("doc_id"),
      Dedup.simhash16Native(df, col("ws")).as("simhash"))
    val composed = df
      .select(col("doc_id"), Dedup.wordHashes(col("ws")).as("wh"))
      .select(col("doc_id"), Dedup.simhash16FromHashes(col("wh")).as("simhash"))
    native.exceptAll(composed).count() shouldBe 0
    composed.exceptAll(native).count() shouldBe 0
  }

  test("nearest_centroid rejects dimension mismatches instead of truncating") {
    graft.functions.GraftExtensions.ensureRegistered(spark)
    val df = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("vec_id", "v")
    val bad = df.withColumn("cluster", call_function("nearest_centroid",
      col("v"), typedLit(Seq(10L)), typedLit(Seq(Seq(1.0, 2.0)))))
    val e = intercept[Exception](bad.collect())
    e.getMessage should include("dims")
  }

  test("connectedComponents labels chains, stars, and singleton pairs correctly") {
    // component 1: a 6-node chain (worst diameter — needs >1 round);
    // component 2: a star around 10; component 3: a lone pair.
    // Run BOTH paths: driver union-find (default) and distributed
    // star contraction (maxDriverEdges = 0).
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (10L, 11L), (10L, 12L), (10L, 13L),
      (20L, 21L)).toDF("id_a", "id_b")
    for (cap <- Seq(2000000L, 0L)) {
      val got = Dedup.connectedComponents(edges, maxDriverEdges = cap)
        .as[(Long, Long)].collect().toMap
      (1L to 6L).foreach(n => got(n) shouldBe 1L)
      (10L to 13L).foreach(n => got(n) shouldBe 10L)
      got(20L) shouldBe 20L
      got(21L) shouldBe 20L
      got.size shouldBe 12
    }
  }

  test("connectedComponents ignores null-id rows consistently on both paths") {
    val withNulls = Seq(
      (Some(1L), Some(2L)), (None, Some(5L)), (Some(5L), Some(6L)),
      (Some(7L), None)).toDF("id_a", "id_b")
    for (cap <- Seq(2000000L, 0L)) {
      val got = Dedup.connectedComponents(withNulls, maxDriverEdges = cap)
        .as[(Long, Long)].collect().toMap
      got shouldBe Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L)
    }
  }

  test("connectedComponents rejects mismatched id types up front") {
    val bad = Seq((1L, "a"), (2L, "b")).toDF("id_a", "id_b")
    val e = intercept[IllegalArgumentException](
      Dedup.connectedComponents(bad))
    e.getMessage should include("same type")
  }

  test("connectedComponents agrees with a union-find reference on a random graph") {
    val rnd = new scala.util.Random(42)
    val n = 200
    val edges = (1 to 240)
      .map { _ =>
        val a = rnd.nextInt(n); val b = rnd.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }
      .filter(p => p._1 != p._2).distinct
    // union-find, always attaching the larger root under the smaller,
    // so every root IS its component's minimum
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    edges.foreach { case (a, b) =>
      val ra = find(a.toInt); val rb = find(b.toInt)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = edges.flatMap(e => Seq(e._1, e._2)).distinct
      .map(v => v -> find(v.toInt).toLong).toMap
    // both the driver fast path and the distributed star contraction
    // must reproduce the reference exactly
    for (cap <- Seq(2000000L, 0L)) {
      val got = Dedup
        .connectedComponents(edges.toDF("id_a", "id_b"), maxDriverEdges = cap)
        .as[(Long, Long)].collect().toMap
      got shouldBe expect
    }
  }

  test("candidatePairs maxBucket drops storm buckets, keeps genuine near-dups") {
    val storm = (10L to 109L).map(i =>
      (i, "identical boilerplate header repeated across the whole corpus verbatim"))
    val pair = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"))
    val df = (storm ++ pair).toDF("doc_id", "text")
    val bands = Dedup.bandKeys(df, "text", "doc_id", bands = 8, rowsPerBand = 1)
    // uncapped: the 100-doc storm emits ~100²/2 pairs per band
    Dedup.candidatePairs(bands)
      .filter(col("id_a") >= 10L).count() shouldBe 100L * 99 / 2
    // capped: storm buckets vanish, the genuine near-dup pair survives
    val capped = Dedup.candidatePairs(bands, maxBucket = 50)
      .as[(Long, Long)].collect().toSet
    capped shouldBe Set((1L, 2L))
  }

  test("simhash: identical texts collide, similar texts are close") {
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon eta")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simhash16(col("text")).as("s"))
      .as[(Long, Long)].collect().toMap
    sh(1L) shouldBe sh(2L)
    val dist = spark.range(1)
      .select(Dedup.hamming(lit(sh(1L)), lit(sh(3L))).cast("long"))
      .first().getLong(0)
    assert(dist <= 8, s"similar docs should be close, hamming=$dist")
  }

  test("brute-force topK finds the exact nearest neighbor") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("q_id", "q_vec")
    val top = Similarity.topKNeighbors(corpus, queries, 2)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    top(0)._3 shouldBe 2L // nearest (excluding self)
    top(1)._3 shouldBe 3L
  }

  test("filtered topK: predicate prunes candidates, k still filled") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f), 0), (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 1), (4L, Array(0.0f, 1.0f), 1),
      (5L, Array(-1.0f, 0.0f), 1)).toDF("vec_id", "embedding", "label")
    val queries = Seq((1L, Array(1.0f, 0.0f), 0))
      .toDF("q_id", "q_vec", "q_label")
    val top = Similarity.topKNeighborsWhere(corpus, queries, 2,
      col("label") =!= col("q_label"))
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    // vec 2 (same label) is the nearest overall but must be excluded
    top.map(_._3).toSeq shouldBe Seq(3L, 4L)
    // an always-true predicate reproduces the unfiltered operator
    val unfiltered = Similarity.topKNeighbors(
      corpus.select("vec_id", "embedding"),
      queries.select("q_id", "q_vec"), 2)
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    val allPass = Similarity.topKNeighborsWhere(corpus, queries, 2, lit(true))
      .orderBy("rank").as[(Long, Int, Long, Double)].collect()
    allPass.toSeq shouldBe unfiltered.toSeq
  }

  test("tfidf: corpus-wide terms score zero, rare terms rank first") {
    val docs = Seq(
      (1L, "common rare1 rare1 common"),
      (2L, "common mid x"),
      (3L, "common mid y")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(docs, "text", "doc_id", 2)
      .as[(Long, String, Long, Int, Double)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._4) }
    // doc 1: rare1 (tf=2, df=1) far outranks common (in all docs, idf=0)
    top(1L).head._2 shouldBe "rare1"
    top(1L).head._5 shouldBe (2.0 * math.log(3.0)) +- 1e-6
    // common appears in every doc -> ln(3/3) = 0 exactly
    val common = top(1L).find(_._2 == "common")
    common.foreach(_._5 shouldBe 0.0)
    // ties (mid/x at tf=1: df 2 vs 1) rank by score then term text
    top(2L).map(_._2).toSeq shouldBe Seq("x", "mid")
  }

  test("LSH planes are decorrelated: real embeddings fill the bucket space") {
    // the regression this pins: with same-frequency (phase-shifted)
    // plane weights, consecutive planes correlate at ~0.91 and the
    // 500-vector corpus collapsed into 12 of 64 buckets (pair work
    // 23k); decorrelated frequencies must keep occupancy near the
    // birthday-bound expectation, or every 2^planes efficiency claim
    // in the ANN family is fiction
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val occ = Similarity.lshBuckets(emb, planes = 6)
      .select("bucket").distinct().count()
    occ should be >= 48L
  }

  test("dimMeans is exact and order-independent; centering fixes offset corpora") {
    // 2 vectors whose dim-0 mean is exactly 1.5, dim-1 mean 0.25
    val tiny = Seq((1L, Array(1.0f, 0.5f)), (2L, Array(2.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    Similarity.dimMeans(tiny, 2) shouldBe Seq(1.5, 0.25)

    // an all-positive corpus (every dim offset by +10): raw buckets
    // collapse onto the mean's side of each plane, centered buckets
    // must recover a spread comparable to the zero-mean corpus
    val n = 200
    val base = (0 until n).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin(i * 1.7 + d * 2.3)).toFloat))
    }
    val shifted = base.map { case (id, v) => (id, v.map(_ + 10.0f)) }
    val zeroMean = base.toDF("vec_id", "embedding")
    val offset = shifted.toDF("vec_id", "embedding")
    def occupied(b: org.apache.spark.sql.DataFrame): Long =
      b.select("bucket").distinct().count()
    val occZero = occupied(Similarity.lshBuckets(zeroMean, 6))
    val occRawOffset = occupied(Similarity.lshBuckets(offset, 6))
    val occCentered = occupied(Similarity.lshBucketsCentered(offset, 6))
    occRawOffset should be < (occZero / 2) // collapse is real
    occCentered should be >= occZero // centering restores the spread
    // and centering a zero-mean corpus is a near no-op
    occupied(Similarity.lshBucketsCentered(zeroMean, 6)) should
      be >= (occZero - 4)
  }

  test("centered banded LSH keys recover per-band occupancy on a shifted corpus") {
    val n = 200
    val base = (0 until n).map { i =>
      (i.toLong, Array.tabulate(16)(d =>
        (math.sin(i * 1.7 + d * 2.3)).toFloat))
    }
    val zeroMean = base.toDF("vec_id", "embedding")
    val offset = base.map { case (id, v) => (id, v.map(_ + 10.0f)) }
      .toDF("vec_id", "embedding")
    // occupancy counted per (band, bucket) cell — the OR-construction
    // only buys recall if EACH band splits the corpus
    def cells(b: org.apache.spark.sql.DataFrame): Long =
      b.select("band", "bucket").distinct().count()
    val cZero = cells(Similarity.lshBandKeys(zeroMean, 3, 3))
    val cRawOffset = cells(Similarity.lshBandKeys(offset, 3, 3))
    val cCentered = cells(Similarity.lshBandKeys(offset, 3, 3, centered = true))
    cRawOffset should be < cZero // the collapse hits every band
    cCentered should be >= cZero // centering restores each band's split
    // centered and raw keys agree on a zero-mean corpus's cell count
    cells(Similarity.lshBandKeys(zeroMean, 3, 3, centered = true)) should
      be >= (cZero - 2)
    // and nearDupPairs' centered path returns the same exact-verified
    // pairs semantics: every emitted pair really clears the threshold
    val nd = Similarity.nearDupPairs(offset, 3, 3, 0.9, centered = true)
    nd.filter(col("cos_sim") < 0.9).count() shouldBe 0L
  }

  test("plane-weight degeneracy envelope: every p <= 40 sign-mixes at dims 64") {
    // pins the planeWeights scaladoc contract: folded frequency
    // (78.233·p mod 2π) · dims > π for all plane budgets the engine
    // uses, i.e. no plane's weight vector is near-constant (a
    // mean-direction-correlated hyperplane). Recomputes the published
    // formula directly — the property must hold of the FORMULA, not of
    // any private helper.
    val dims = 64
    for (p <- 1 to 40) {
      val w = (0 until dims).map(d => math.sin(p * 12.9898d + d * 78.233d * p))
      w.count(_ > 0) should (be > 8 and be < dims - 8)
      val mean = w.sum / dims
      val rms = math.sqrt(w.map(x => x * x).sum / dims)
      math.abs(mean) should be < (0.5 * rms)
    }
  }

  test("multi-probe LSH operator dominates single-probe and is deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val single = Similarity.topKNeighborsLsh(emb, qs, 5, 4)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cs"))
    val multi = Similarity.topKNeighborsLshMultiProbe(emb, qs, 5, 4)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cm"))
    // superset candidates: at every (q_id, rank) the multi-probe top-k
    // cosine can only be >= the single-bucket one
    single.join(multi, Seq("q_id", "rank"))
      .filter(col("cm") < col("cs")).count() shouldBe 0L
    multi.count() should be >= single.count()
    // deterministic across runs
    val again = Similarity.topKNeighborsLshMultiProbe(emb, qs, 5, 4)
      .collect().toSet
    Similarity.topKNeighborsLshMultiProbe(emb, qs, 5, 4)
      .collect().toSet shouldBe again
    // the centered variant runs end-to-end and respects k
    val cent = Similarity.topKNeighborsLshMultiProbe(emb, qs, 5, 4,
      centered = true)
    cent.groupBy("q_id").count().agg(max("count")).collect()(0)
      .getLong(0) should be <= 5L
  }

  test("LSH buckets: identical vectors share a bucket, opposites don't") {
    val corpus = Seq(
      (1L, Array.fill(8)(0.5f)), (2L, Array.fill(8)(0.5f)),
      (3L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val b = Similarity.lshBuckets(corpus, planes = 4)
      .as[(Long, String)].collect().toMap
    b(1L) shouldBe b(2L)
    b(1L) should not be b(3L)
  }

  test("IVF ANN: deterministic and high recall vs brute force on real embeddings") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.topKNeighbors(emb, queries, 5)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, queries, 5, nClusters = 8, nProbe = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF recall too low: $recall")
    // deterministic under a fixed seed
    val again = Similarity.ivfTopK(emb, queries, 5, nClusters = 8, nProbe = 3)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    again shouldBe ivf
  }

  test("PQ encode: codebook vectors quantize to their own code") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val codes = Similarity.pqEncode(emb, m = 4, k = 16)
      .filter(col("vec_id") < 16)
      .as[(Long, Int, Int)].collect()
    codes should have length (16 * 4)
    // a codeword's nearest codeword in every subspace is itself
    codes.foreach { case (id, _, code) => code.toLong shouldBe id }
  }

  test("PQ ADC topK: reasonable recall vs the exact L2 scan") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(queries.select(col("q_id"),
        Similarity.toDouble(col("q_vec")).as("q"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", Similarity.sqDist(col("q"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rank") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, queries, 10, m = 4, ksub = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.3, s"PQ recall too low: $recall")
    // deterministic: same codebook, same codes, same ranking
    val again = Similarity.pqTopK(emb, queries, 10, m = 4, ksub = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    again shouldBe pq
  }

  test("IVF-PQ: codes-only routed search attains reasonable recall, deterministic") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(queries.select(col("q_id"),
        Similarity.toDouble(col("q_vec")).as("q"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", Similarity.sqDist(col("q"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rank") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(emb, queries, 10,
      nClusters = 8, nProbe = 4, m = 4, ksub = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivfpq).size.toDouble / exact.size
    assert(recall >= 0.2, s"IVF-PQ recall too low: $recall")
    val again = Similarity.ivfPqTopK(emb, queries, 10,
      nClusters = 8, nProbe = 4, m = 4, ksub = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    again shouldBe ivfpq
  }

  test("PQ trained codebook: k-means refinement matches or beats the sampled codebook") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = emb.select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(queries.select(col("q_id"),
        Similarity.toDouble(col("q_vec")).as("q"))))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("d", Similarity.sqDist(col("q"), col("v")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("d").asc, col("vec_id").asc)))
      .filter(col("rank") <= 10)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val sampled = Similarity.pqTopK(emb, queries, 10, m = 4, ksub = 16)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val cb = Similarity.pqCodebookTrainedOf(emb, m = 4, k = 16,
      iters = 10, trainSize = 2000)
    val trained = Similarity.pqTopKWith(emb, queries, 10, cb)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val recallSampled = (exact & sampled).size.toDouble / exact.size
    val recallTrained = (exact & trained).size.toDouble / exact.size
    assert(recallTrained >= recallSampled,
      s"trained-codebook recall $recallTrained fell below sampled $recallSampled")
    // determinism: seeded sample + fixed-iteration Lloyd's — bitwise-equal codebooks
    val cb2 = Similarity.pqCodebookTrainedOf(emb, m = 4, k = 16,
      iters = 10, trainSize = 2000)
    cb2 shouldBe cb
    // trained codebook slots into the composed IVF-PQ path deterministically
    val ivfpq = Similarity.ivfPqTopK(emb, queries, 10,
      nClusters = 8, nProbe = 4, m = 4, ksub = 16, codebook = Some(cb))
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpqAgain = Similarity.ivfPqTopK(emb, queries, 10,
      nClusters = 8, nProbe = 4, m = 4, ksub = 16, codebook = Some(cb))
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    ivfpqAgain shouldBe ivfpq
    assert((exact & ivfpq).size.toDouble / exact.size >= 0.2,
      "IVF-PQ with trained codebook lost too much recall")
  }

  test("winnowing: overlap guarantee — a shared (w+k-1)-char run shares a fingerprint") {
    val k = 8; val w = 4
    val common = "the quick brown fox jumps over the lazy dog" // >> w+k-1 chars
    val docs = Seq(
      (1L, s"AAAA $common BBBB"),
      (2L, s"zzz $common qqq"),
      (3L, "completely unrelated content with no shared run at all"),
      (4L, ""), // empty text -> no fingerprints, null summary
      (5L, "tiny")) // shorter than k -> no grams
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), Dedup.gramHashes(col("text"), k).as("hs"))
      .select(col("doc_id"), Dedup.winnowMins(col("hs"), w).as("wins"))
      .select(col("doc_id"), array_distinct(col("wins")).as("fps"))
      .as[(Long, Seq[Long])].collect().toMap
    // Schleimer et al.: any match of length >= w + k - 1 must share a
    // window minimum between the two documents
    fps(1L).intersect(fps(2L)) should not be empty
    fps(3L).intersect(fps(1L)) shouldBe empty
    fps(4L) shouldBe empty
    fps(5L) shouldBe empty
    // summary shape: identical docs get identical fingerprints
    val sum = Dedup.winnowFingerprint(
      Seq((1L, "same text body here"), (2L, "same text body here"),
        (3L, "different text body")).toDF("doc_id", "text"),
      "text", "doc_id", k, w)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    sum(1L) shouldBe sum(2L)
    sum(3L)._2 should not be sum(1L)._2
  }

  test("sketches: approx distinct within rsd bound, quantiles near exact") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val stats = Sketches.distinctStats(events, "event_type", "user_id")
      .join(events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct")), Seq("event_type"))
      .withColumn("err",
        abs(col("approx_distinct").cast("double") - col("exact_distinct").cast("double")) /
          greatest(col("exact_distinct").cast("double"), lit(1.0d)))
      .collect()
    stats.length should be > 0
    stats.foreach { r =>
      assert(r.getAs[Double]("err") <= 0.15,
        s"approx distinct too far off: $r")
    }
    val q = Sketches.quantiles(events, "event_type", "value", Seq(0.5, 0.99))
      .collect()
    q.foreach { r =>
      val qs = r.getSeq[Double](1)
      assert(qs(0) <= qs(1), s"median above p99: $r")
    }
  }

  test("multimodal: resize resamples bytes to the target grid deterministically") {
    val media = Seq(
      (1L, "application/x-img", (0 until 100).map(_.toByte).toArray),
      (2L, "application/x-img", Array.empty[Byte]))
      .toDF("id", "mime", "blob")
    val thumbs = Multimodal.resizeStub(spark, media, w = 4, h = 3)
      .collect().map(t => t.id -> t).toMap
    thumbs(1L).width shouldBe 4
    thumbs(1L).height shouldBe 3
    thumbs(1L).thumb.length shouldBe 12
    // nearest-neighbor: index i maps to blob[(i * len) / (w*h)]
    thumbs(1L).thumb.toSeq shouldBe (0 until 12).map(i => (i * 100 / 12).toByte)
    thumbs(2L).thumb.toSeq shouldBe Seq.fill(12)(0.toByte)
    // deterministic across runs
    Multimodal.resizeStub(spark, media, 4, 3).collect()
      .map(t => t.id -> t.thumb.toSeq).toMap shouldBe
      thumbs.map { case (k, v) => k -> v.thumb.toSeq }
  }

  test("multimodal: batched decode is deterministic with typed schema") {
    val docs = Seq((1L, "hello world", "en", "srcA", 11L),
      (2L, "spark engine", "en", "srcB", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.mediaFromDocuments(docs)
    media.schema("blob").dataType.typeName shouldBe "binary"
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 1, partitions = 2)
    feats.rdd.getNumPartitions shouldBe 2
    val rows = feats.collect().sortBy(_.id)
    rows.map(_.byte_len).toSeq shouldBe Seq(11, 12)
    rows.head.features.length shouldBe 8
    rows.head.mime shouldBe "application/x-src-srcA"
    // determinism: same input -> same features
    val again = Multimodal.extractFeatures(spark, media, batchSize = 64)
      .collect().sortBy(_.id)
    again.map(_.features.toSeq).toSeq shouldBe rows.map(_.features.toSeq).toSeq
  }

  test("multimodal: real ImageIO decode reads true PNG dimensions and color stats") {
    // synthesize a REAL PNG: 8x6, left half pure red, right half pure blue
    val img = new java.awt.image.BufferedImage(8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val png = baos.toByteArray

    val media = Seq(
      (1L, "image/png", png),
      (2L, "image/png", Array[Byte](1, 2, 3)),            // corrupt image bytes
      (3L, "application/x-src-a", "hello world".getBytes)) // stub path
      .toDF("id", "mime", "blob")
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap

    // true dimensions from the decoder, not the stub's len-derived fake
    feats(1L).width shouldBe 8
    feats(1L).height shouldBe 6
    feats(1L).byte_len shouldBe png.length
    // color statistics: half red half blue
    val f = feats(1L).features
    f(0) shouldBe 0.5f +- 1e-3f  // mean R
    f(1) shouldBe 0.0f +- 1e-3f  // mean G
    f(2) shouldBe 0.5f +- 1e-3f  // mean B
    // quadrant lumas: left quadrants pure red (0.299), right pure blue (0.114)
    f(4) shouldBe 0.299f +- 1e-3f // top-left
    f(5) shouldBe 0.114f +- 1e-3f // top-right
    f(6) shouldBe 0.299f +- 1e-3f // bottom-left
    f(7) shouldBe 0.114f +- 1e-3f // bottom-right

    // corrupt image/* bytes degrade to (-1,-1), never a thrown task
    feats(2L).width shouldBe -1
    feats(2L).height shouldBe -1
    feats(2L).features.toSeq shouldBe Seq.fill(8)(0f)

    // non-image mimes still take the deterministic stub path
    feats(3L).byte_len shouldBe 11
    feats(3L).features.length shouldBe 8
  }

  test("multimodal: real javax.sound WAV decode reads format and RMS envelope") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // synthesize a REAL 16-bit mono PCM WAV at 8 kHz: 0.8 s where the
    // first half is silence and the second half a full-scale square wave
    val sr = 8000
    val n = 6400
    val pcm = new Array[Byte](n * 2)
    for (f <- n / 2 until n) {
      val v: Short = if ((f / 8) % 2 == 0) 30000 else -30000
      pcm(f * 2) = (v & 0xff).toByte           // little-endian
      pcm(f * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
      AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val media = Seq(
      (1L, "audio/wav", wav),
      (2L, "audio/wav", Array[Byte](9, 9, 9)),     // corrupt audio bytes
      (3L, "video/mp4", "framesframes".getBytes))  // stub path survives
      .toDF("id", "mime", "blob")
    val feats = Multimodal.extractFeatures(spark, media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap

    // real format metadata, not the stub's len-derived fake
    feats(1L).width shouldBe sr   // sample rate
    feats(1L).height shouldBe 1   // channels
    val env = feats(1L).features
    // silence half: segments 0-3 ~ 0; square half: segments 4-7 ~ 30000/32768
    for (i <- 0 until 4) env(i) shouldBe 0.0f +- 1e-4f
    for (i <- 4 until 8) env(i) shouldBe (30000f / 32768f) +- 1e-3f

    feats(2L).width shouldBe -1
    feats(2L).features.toSeq shouldBe Seq.fill(8)(0f)
    feats(3L).features.length shouldBe 8
  }

  test("multimodal: real Y4M and MJPEG video decode — dims, frames, luma; corrupt blobs degrade") {
    // Y4M round-trip: encode 3 constant-luma 8x6 frames, decode back
    val y4m = Multimodal.encodeY4m(8, 6, Seq(10, 200, 60))
    val truncated = y4m.dropRight(10)   // last frame incomplete
    val corrupt = y4m.clone(); corrupt(0) = 'X'.toByte
    val media = Seq(
      (1L, "video/x-y4m", y4m),
      (2L, "video/x-y4m", truncated),
      (3L, "video/x-y4m", corrupt))
      .toDF("id", "mime", "blob")
    val feats = Multimodal.extractVideoFeatures(spark, media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    feats(1L).width shouldBe 8
    feats(1L).height shouldBe 6
    feats(1L).frames shouldBe 3
    feats(1L).mean_luma.get shouldBe (270.0 / 3 / 255.0) +- 1e-12
    // envelope: 3 frames spread into 8 segments at ⌊i·8/n⌋ → 0, 2, 5
    feats(1L).features(0) shouldBe (10f / 255f) +- 1e-6f
    feats(1L).features(2) shouldBe (200f / 255f) +- 1e-6f
    feats(1L).features(5) shouldBe (60f / 255f) +- 1e-6f
    // truncated trailing frame: not counted, the prefix still decodes
    feats(2L).frames shouldBe 2
    feats(2L).mean_luma.get shouldBe (210.0 / 2 / 255.0) +- 1e-12
    // corrupt header: -1 dims, 0 frames, no luma — never a thrown task
    feats(3L).width shouldBe -1
    feats(3L).frames shouldBe 0
    feats(3L).mean_luma shouldBe None

    // MJPEG round-trip: 2 constant-gray 16x16 JPEGs concatenated —
    // real ImageIO decode per frame; JPEG is lossy so luma is close,
    // dims/frames exact
    val mjpeg = Multimodal.encodeMjpeg(16, 16, Seq(40, 220))
    val mmedia = Seq(
      (4L, "video/x-mjpeg", mjpeg),
      (5L, "video/x-mjpeg", mjpeg.take(20))) // truncated first frame
      .toDF("id", "mime", "blob")
    val mfeats = Multimodal.extractVideoFeatures(spark, mmedia, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    mfeats(4L).width shouldBe 16
    mfeats(4L).height shouldBe 16
    mfeats(4L).frames shouldBe 2
    mfeats(4L).mean_luma.get shouldBe (130.0 / 255.0) +- 0.02
    mfeats(5L).frames shouldBe 0
    mfeats(5L).width shouldBe -1

    // the generic extractFeatures path routes video/* through the real
    // decoder too (adapted shape: true dims + envelope)
    val gen = Multimodal.extractFeatures(spark, media, batchSize = 2)
      .collect().map(f => f.id -> f).toMap
    gen(1L).width shouldBe 8
    gen(1L).height shouldBe 6
    gen(3L).width shouldBe -1

    // decode-aware frame sampling: stride over REAL frame boundaries
    val five = Multimodal.encodeY4m(8, 6, Seq(0, 50, 100, 150, 200))
    val smedia = Seq((7L, "video/x-y4m", five),
      (8L, "video/x-y4m", corrupt)).toDF("id", "mime", "blob")
    val samples = Multimodal.frameSampleVideo(spark, smedia, maxFrames = 4)
      .collect().map(s => (s.id, s.frame_idx) -> s.frame_luma).toMap
    // 5 frames, maxFrames 4 → stride 2 → frames 0, 2, 4
    samples.keySet shouldBe Set((7L, 0), (7L, 2), (7L, 4))
    samples((7L, 2)) shouldBe (100.0 / 255.0) +- 1e-12
    samples((7L, 4)) shouldBe (200.0 / 255.0) +- 1e-12
  }

  test("multimodal: Y4M colourspace variants size their chroma planes correctly") {
    // hand-built containers (the encoder only emits C420jpeg): a wrong
    // chroma size would misalign every frame after the first — frame
    // count or luma would come out wrong
    def mk(cs: String, w: Int, h: Int, lumas: Seq[Int],
        chromaPerFrame: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"YUV4MPEG2 W$w H$h F25:1$cs\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      lumas.foreach { v =>
        out.write("FRAME\n"
          .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        val y = new Array[Byte](w * h)
        java.util.Arrays.fill(y, (v & 0xff).toByte)
        out.write(y)
        val c = new Array[Byte](chromaPerFrame)
        java.util.Arrays.fill(c, 128.toByte)
        out.write(c)
      }
      out.toByteArray
    }
    val cases = Seq(
      (" C422", (8 / 2) * 6 * 2),  // 4:2:2 — half-width chroma
      (" C444", 8 * 6 * 2),        // 4:4:4 — full-size chroma
      (" Cmono", 0),               // no chroma planes
      ("", (8 / 2) * (6 / 2) * 2)) // no C tag — 4:2:0 default
    cases.foreach { case (cs, chroma) =>
      withClue(s"colourspace '$cs': ") {
        val blob = mk(cs, 8, 6, Seq(30, 90, 150), chroma)
        val f = Multimodal.decodeY4m(MediaBlob(1L, "video/x-y4m", blob))
        f.width shouldBe 8
        f.height shouldBe 6
        f.frames shouldBe 3
        f.mean_luma.get shouldBe (270.0 / 3 / 255.0) +- 1e-12
      }
    }
  }

  test("multimodal: dHash — gradient bits, resample invariance, corrupt blobs hash to None") {
    def png(w: Int, h: Int, lum: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = lum(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // strictly increasing left-to-right: every neighbor brighter → all
    // 64 bits set; strictly decreasing → none
    Multimodal.dHash(MediaBlob(1L, "image/png",
      png(9, 8, (x, _) => x * 10))) shouldBe Some(-1L)
    Multimodal.dHash(MediaBlob(2L, "image/png",
      png(9, 8, (x, _) => 200 - x * 10))) shouldBe Some(0L)
    // a single brighter column: exactly the bits entering it (x=2) set
    val one = Multimodal.dHash(MediaBlob(3L, "image/png",
      png(9, 8, (x, _) => if (x == 3) 200 else 50))).get
    java.lang.Long.bitCount(one) shouldBe 8
    (0 until 8).foreach { y => ((one >> (y * 8 + 2)) & 1L) shouldBe 1L }
    // nearest-neighbor resample: a 2x-upscaled image hashes identically
    val base = png(9, 8, (x, y) => ((x * 37 + y * 91) % 251))
    val up = png(18, 16, (x, y) => (((x / 2) * 37 + (y / 2) * 91) % 251))
    Multimodal.dHash(MediaBlob(4L, "image/png", base)) shouldBe
      Multimodal.dHash(MediaBlob(5L, "image/png", up))
    // corrupt bytes: None, never a throw
    Multimodal.dHash(MediaBlob(6L, "image/png",
      base.take(10))) shouldBe None
  }

  test("multimodal: dHash near-dup banding finds every pair within maxDist and cuts the rest") {
    // hand-placed hashes around h0: every pairwise Hamming distance is
    // known, so both sides of the cut are pinned —
    //   1-2: 1 bit   1-3: 3 bits (one quarter)   2-3: 2 bits
    //   2-4: 3 bits (shares quarter 0 — a pigeonhole catch)
    //   1-4: 4 bits, one per quarter (> maxDist, correctly cut)
    //   3-4: 5 bits (> maxDist)     5: NULL hash, never pairs
    val h0 = 0x0123456789abcdefL
    val rows = Seq(
      (1L, Some(h0)),
      (2L, Some(h0 ^ 1L)),
      (3L, Some(h0 ^ 7L)),
      (4L, Some(h0 ^ 0x0001000100010001L)),
      (5L, Option.empty[Long]))
      .toDF("id", "dhash")
    val pairs = Multimodal.dHashNearDupPairs(rows, maxDist = 3)
      .as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L))
    // maxDist=0 degenerates to the exact-dup join
    Multimodal.dHashNearDupPairs(rows, maxDist = 0)
      .count() shouldBe 0L
    intercept[IllegalArgumentException] {
      Multimodal.dHashNearDupPairs(rows, maxDist = 4)
    }
  }

  test("multimodal: a 1k-image identical farm never enters the banding; the bucket cap bounds distinct skew") {
    // the workload that breaks naive banding: 1000 images sharing ONE
    // dHash (a template farm) — banding ids would self-join N²/2
    // candidate rows in one bucket; here they collapse to one DISTINCT
    // hash and pair through the exact-equality join instead
    val h0 = 0x0123456789abcdefL
    val farm = (1L to 1000L).map(i => (i, Some(h0)))
    val near = (2000L, Some(h0 ^ 1L)) // Hamming 1 from the farm
    val far = (3000L, Some(h0 ^ 0x0101010101010101L)) // 8 bits, cut
    val rows = (farm :+ near :+ far).toDF("id", "dhash")
    // complete answer: C(1000,2) farm pairs + 1000 (farm, near) pairs
    Multimodal.dHashNearDupPairs(rows, maxDist = 3)
      .count() shouldBe (1000L * 999 / 2 + 1000)
    // maxBucket caps the BANDED (distinct-hash) candidates only: at
    // cap 1 every shared quarter bucket (2 distinct hashes) is dropped,
    // so near pairs vanish — while the farm's exact pairs all survive,
    // proving identical images ride the equality join, not the banding
    Multimodal.dHashNearDupPairs(rows, maxDist = 3, maxBucket = 1)
      .count() shouldBe (1000L * 999 / 2)
    intercept[IllegalArgumentException] {
      Multimodal.dHashNearDupPairs(rows, maxBucket = 0)
    }
  }

  test("multimodal: MJPEG frames with EXIF-embedded thumbnails split at the frame's EOI, not the thumbnail's SOI") {
    // craft frame 1 with an APP1 segment whose payload embeds a fake
    // thumbnail JPEG (interior SOI *and* EOI) — the real-world shape
    // that inflates frame counts when the stream is split at every SOI
    val f1 = Multimodal.encodeMjpeg(16, 16, Seq(40))
    val f2 = Multimodal.encodeMjpeg(16, 16, Seq(220))
    val thumb = Array(0xFF, 0xD8, 0xFF, 0xDB, 0x01, 0x02, 0x03,
      0xFF, 0xD9).map(_.toByte)
    val payload =
      "Exif  ".getBytes("ISO-8859-1") ++ thumb
    val len = payload.length + 2
    val app1 = Array(0xFF, 0xE1, (len >> 8) & 0xff, len & 0xff)
      .map(_.toByte) ++ payload
    val withExif = f1.take(2) ++ app1 ++ f1.drop(2)
    // the outer JPEG still decodes (ImageIO skips the unknown APP1)
    javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(withExif)) should not be null
    val v = Multimodal.decodeMjpeg(
      MediaBlob(1L, "video/x-mjpeg", withExif ++ f2))
    v.frames shouldBe 2 // NOT 3: the thumbnail's SOI starts no frame
    v.width shouldBe 16
    v.height shouldBe 16
    // per-frame luma from the REAL frames, not a thumbnail fragment
    v.features(0) shouldBe (40f / 255f) +- 0.02f
    v.features(4) shouldBe (220f / 255f) +- 0.02f
  }

  test("multimodal: frameSampleVideo rejects a non-positive maxFrames on the driver") {
    val media = Seq((1L, "video/x-y4m",
      Multimodal.encodeY4m(8, 6, Seq(10)))).toDF("id", "mime", "blob")
    intercept[IllegalArgumentException] {
      Multimodal.frameSampleVideo(spark, media, maxFrames = 0)
    }
  }

  test("Graphs.triangles: K4 yields all 4 oriented triangles; chains none") {
    // K4 on {1,2,3,4} (some edges reversed + one duplicate: canonicalization)
    val k4 = Seq((1L, 2L), (3L, 1L), (1L, 4L), (2L, 3L), (4L, 2L), (3L, 4L),
      (2L, 1L)).toDF("id_a", "id_b")
    val tris = Graphs.triangles(k4).as[(Long, Long, Long)].collect().toSet
    tris shouldBe Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L))
    // a chain has wedges but no closures
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    Graphs.triangles(chain).count() shouldBe 0L
    // self-loops never fabricate triangles
    val loops = Seq((1L, 1L), (1L, 2L), (2L, 3L), (1L, 3L)).toDF("id_a", "id_b")
    Graphs.triangles(loops).as[(Long, Long, Long)].collect().toSet shouldBe
      Set((1L, 2L, 3L))
    Graphs.degrees(k4).as[(Long, Long)].collect().toMap shouldBe
      Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L)
  }

  test("orientByDegree: a hub graph builds zero hub wedges, triangles still exact") {
    // worst case for id-ordering: the hub has the LOWEST id (0), so an
    // id-oriented edge list would give it out-degree 50 → C(50,2)
    // wedges; degree orientation points every spoke INTO the hub
    val star = (1L to 50L).map(i => (0L, i))
    val edges = (star :+ ((1L, 2L))).toDF("id_a", "id_b")
    val oriented = Graphs.orientByDegree(edges)
    val outDeg = oriented.groupBy("src").agg(count(lit(1)).as("d"))
      .as[(Long, Long)].collect().toMap
    outDeg.getOrElse(0L, 0L) shouldBe 0L  // all spokes point at the hub
    outDeg.values.max should be <= 2L     // leaves carry the out-edges
    // the one triangle (0,1,2) survives, id-ordered in the output
    Graphs.triangles(edges).as[(Long, Long, Long)].collect().toSet shouldBe
      Set((0L, 1L, 2L))
  }

  test("semDedupPairs maxCell truncates a degenerate cell deterministically") {
    // 12 near-identical vectors -> ONE cell (nClusters=1): uncapped
    // pair count is C(12,2); capped, the cell keeps its 4 lowest ids
    val storm = (1L to 12L).map(i =>
      (i, Seq(1.0f, (0.001f * i), 0.0f)))
    val df = storm.toDF("vec_id", "embedding")
    Similarity.semDedupPairs(df, 1, -1.0).count() shouldBe 12L * 11 / 2
    val capped = Similarity.semDedupPairs(df, 1, -1.0, maxCell = 4)
    capped.count() shouldBe 4L * 3 / 2
    capped.select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    // non-degenerate data (every cell under the cap): capped == uncapped
    val spread2 = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)), (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.9f, 0.1f, 0.0f)), (4L, Seq(0.1f, 0.9f, 0.0f)))
      .toDF("vec_id", "embedding")
    val plain = Similarity.semDedupPairs(spread2, 2, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    Similarity.semDedupPairs(spread2, 2, 0.5, maxCell = 3)
      .as[(Long, Long, Double)].collect().toSet shouldBe plain
  }

  test("semDedupKeep: lowest id survives each transitive cluster, singletons absent") {
    // two tight families far apart; nClusters=1 puts everything in one
    // cell, so only the cosine threshold separates them
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.01f)), (3L, Seq(1.0f, 0.02f)),
      (4L, Seq(0.0f, 1.0f)), (5L, Seq(0.01f, 1.0f)),
      (9L, Seq(-1.0f, -1.0f)))  // singleton: similar to nothing
      .toDF("vec_id", "embedding")
    val got = Similarity.semDedupKeep(df, 1, 0.9)
      .as[(Long, Long, Boolean)].collect().toSet
    got shouldBe Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 4L, false))
  }

  test("Cooccur.pairCounts maxBasket bounds a pathological basket") {
    // group 1 is a 40-item storm (C(40,2)=780 pairs uncapped); group 2
    // is a genuine 2-item basket repeated nowhere
    val storm = (1L to 40L).map(i => (1L, i))
    val df = (storm ++ Seq((2L, 1L), (2L, 2L))).toDF("g", "item")
    Cooccur.pairCounts(df, "g", "item", 10000).count() shouldBe 780L + 0L
    val capped = Cooccur.pairCounts(df, "g", "item", 10000, maxBasket = 5)
      .as[(Long, Long, Long)].collect().toSet
    // storm truncated to items 1..5 -> C(5,2)=10 pairs; (1,2) counted
    // in BOTH groups
    capped should have size 10
    capped should contain((1L, 2L, 2L))
    capped.foreach { case (a, b, _) => b should be <= 5L }
    // baskets under the cap are untouched: capped == uncapped
    val small = Seq((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L), (2L, 2L))
      .toDF("g", "item")
    Cooccur.pairCounts(small, "g", "item", 100, maxBasket = 5)
      .as[(Long, Long, Long)].collect().toSet shouldBe
      Cooccur.pairCounts(small, "g", "item", 100)
        .as[(Long, Long, Long)].collect().toSet
  }

  test("rrfFuse merges ranked lists with 1/(k+r) and nulls for absentees") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val sem = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    val got = Similarity.rrfFuse(Seq(lex, sem), "id", "rank")
      .as[(Long, Option[Long], Option[Long], Double)].collect().toSet
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got shouldBe Set(
      (10L, Some(1L), None, r6(1.0 / 61)),
      (20L, Some(2L), Some(1L), r6(1.0 / 62 + 1.0 / 61)),
      (30L, Some(3L), None, r6(1.0 / 63)),
      (40L, None, Some(2L), r6(1.0 / 62)))
  }

  test("sourceDrift reports exact masses, shares, and KL terms over common groups") {
    val a = Seq(("s1", 60L), ("s1", 40L), ("s2", 100L), ("s3", 5L))
      .toDF("source", "t")
    val b = Seq(("s1", 50L), ("s2", 150L))  // s3 vanished -> excluded
      .toDF("source", "t")
    val got = Layout.sourceDrift(a, b, "source", "t")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSet
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (ta, tb) = (200.0, 200.0)
    def row(s: String, xa: Long, xb: Long) =
      (s, xa, xb, r6(xa / ta), r6(xb / tb),
        r6(xb / tb * math.log((xb / tb) / (xa / ta))))
    got shouldBe Set(row("s1", 100L, 50L), row("s2", 100L, 150L))
  }

  test("pageRank matches a driver-side reference and is partition-order-invariant") {
    // path + triangle + bridge: 1-2, 2-3, 3-4, 4-5, 5-3
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L))
      .toDF("id_a", "id_b")
    val iters = 5; val d = 0.85; val scale = 1e12
    // reference: same scaled-integer recursion, sequential
    val adj = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L, 4L, 5L),
      4L -> Seq(3L, 5L), 5L -> Seq(4L, 3L))
    val n = adj.size
    val base = math.round((1 - d) * scale / n)
    var s = adj.keys.map(_ -> math.round(scale / n)).toMap
    for (_ <- 1 to iters)
      s = adj.keys.map(v => v -> (base + adj.filter(_._2.contains(v))
        .keys.toSeq.map(u => math.round(s(u) * d / adj(u).size)).sum)).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = s.map { case (v, sv) => (v, r6(sv / scale)) }.toSet
    val got = Graphs.pageRank(pairs, iters, d)
      .as[(Long, Double)].collect().toSet
    got shouldBe expect
    // hub 3 (degree 3) must outrank leaf 1 (degree 1)
    val m = got.toMap
    m(3L) should be > m(1L)
    Graphs.pageRank(pairs.repartition(7), iters, d)
      .as[(Long, Double)].collect().toSet shouldBe got
  }

  test("ngramDecontaminate counts eval-overlapping shingles exactly") {
    val train = Seq(
      (1L, "a b c d e f"),   // 5-shingles: "a b c d e", "b c d e f"
      (2L, "x y z w v"),     // single shingle, present in the eval doc
      (3L, "p q r"))         // under k tokens: absent from the output
      .toDF("doc_id", "text")
    val ev = Seq((100L, "x y z w v u"), (101L, "m n o p q"))
      .toDF("doc_id", "text")
    val got = Dedup.ngramDecontaminate(train, ev, "text", "doc_id", 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    got shouldBe Set((1L, 2L, 0L, 0.0), (2L, 1L, 1L, 1.0))
  }

  test("ngramNovelty: originals score 1, copies 0, partial quotes in between") {
    val docs = Seq(
      (1L, "a b c d"),    // shingles: "a b c", "b c d" — both first-owned
      (2L, "a b c d"),    // verbatim copy: owns nothing
      (3L, "a b c x"),    // quotes "a b c" (owned by 1), owns "b c x"
      (4L, "a b"))        // under k tokens: no shingles, absent
      .toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(docs, "text", "doc_id", 3)
      .as[(Long, Long, Double)].collect().toSet
    got shouldBe Set((1L, 2L, 1.0), (2L, 2L, 0.0), (3L, 2L, 0.5))
  }

  test("prefixFilterPairs equals the brute-force all-pairs join (no false negatives)") {
    // seeded corpus with planted near-dups: ~a third are light edits
    // of an earlier doc, the rest random — the LSH-hostile mix where
    // exactness matters
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    (0 until 40).foreach { i =>
      if (i % 3 == 2 && texts.nonEmpty) {
        val base = texts(rnd.nextInt(texts.size)).split(" ").toBuffer
        base(rnd.nextInt(base.size)) = vocab(rnd.nextInt(40))   // one edit
        texts += base.mkString(" ")
      } else texts += Seq.fill(6 + rnd.nextInt(20))(
        vocab(rnd.nextInt(40))).mkString(" ")
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
    val n = 3; val t = 0.5
    val got = Dedup.prefixFilterPairs(docs.toDF("doc_id", "text"),
        "text", "doc_id", n, t)
      .as[(Long, Long, Double)].collect().toSet
    // brute force over every pair
    def grams(s: String) = s.split(" ").sliding(n).filter(_.size == n)
      .map(_.mkString(" ")).toSet
    val gs = docs.map { case (id, s) => id -> grams(s) }
    val expect = (for {
      (ia, ga) <- gs; (ib, gb) <- gs if ia < ib
      c = (ga & gb).size; u = (ga | gb).size
      if u > 0 && c.toDouble / u >= t
    } yield (ia, ib, BigDecimal(c.toDouble / u)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)).toSet
    got shouldBe expect
    expect.size should be > 3  // the planted edits must actually surface
  }

  test("globalCumsum equals the driver running sum on any partitioning") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 500).map(i => (i.toLong, rnd.nextInt(50).toLong))
    val df = rows.toDF("id", "v").repartition(13)
    val got = Layout.globalCumsum(df, "v", col("id").asc)
      .select("id", "cumsum").as[(Long, Long)].collect().toSet
    var run = 0L
    val expect = rows.sortBy(_._1).map { case (id, v) => run += v; (id, run) }
    got shouldBe expect.toSet
    // non-long value columns are refused, not silently lossy
    intercept[IllegalArgumentException] {
      Layout.globalCumsum(rows.toDF("id", "v")
        .select(col("id"), col("v").cast("double").as("v")), "v", col("id"))
    }
  }

  test("kmeans matches a driver-side Lloyd reference and is repartition-invariant") {
    val rnd = new scala.util.Random(5)
    // three well-separated blobs in 4 dims; ids 0,1,2 seed one blob each
    val pts = (0 until 60).map { i =>
      val c = i % 3
      val base = Array(c * 10.0, -c * 5.0, c * 2.0, 3.0 - c)
      (i.toLong, base.map(x => (x + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }
    val df = pts.toDF("vec_id", "embedding")
    def run(d: org.apache.spark.sql.DataFrame) =
      Similarity.kmeans(d, "embedding", "vec_id", k = 3, iters = 2)
        .select("cluster", "pos", "sum_scaled", "cnt")
        .as[(Long, Int, Long, Long)].collect().toSet
    val got = run(df)
    // driver reference replicating the exact arithmetic: strict-< argmin
    // over v·v − 2v·c + c·c, HALF_UP scaled-integer moments, s/n/1e6
    def scaled(x: Double) =
      BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val vecs = pts.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def assign(cents: Seq[(Long, Array[Double])], v: Array[Double]): Long = {
      var best = Double.PositiveInfinity; var bestId = -1L
      cents.foreach { case (cl, c) =>
        var vv = 0.0; var vc = 0.0; var cc = 0.0
        v.indices.foreach { i => vv += v(i) * v(i); vc += v(i) * c(i); cc += c(i) * c(i) }
        val d = vv - 2.0 * vc + cc
        if (d < best) { best = d; bestId = cl }
      }
      bestId
    }
    var cents: Seq[(Long, Array[Double])] =
      (0L until 3L).map(i => i -> vecs(i))
    var moments: Map[(Long, Int), (Long, Long)] = Map.empty
    (1 to 2).foreach { it =>
      val byCluster = vecs.toSeq.map { case (_, v) => assign(cents, v) -> v }
        .groupBy(_._1)
      moments = byCluster.flatMap { case (cl, vs) =>
        (0 until 4).map { p =>
          (cl, p) -> (vs.map(x => scaled(x._2(p))).sum, vs.size.toLong) }
      }
      if (it < 2) cents = byCluster.keys.toSeq.sorted.map { cl =>
        cl -> (0 until 4).map { p =>
          val (s, n) = moments((cl, p)); s.toDouble / n / 1e6 }.toArray
      }
    }
    val expect = moments.map { case ((cl, p), (s, n)) => (cl, p, s, n) }.toSet
    got shouldBe expect
    run(df.repartition(7)) shouldBe got
  }

  test("hammingNeighbors equals the brute-force Hamming rank (pigeonhole completeness)") {
    val rnd = new scala.util.Random(31)
    val codes = (0 until 200).map(i => (i.toLong, rnd.nextInt(65536).toLong))
    val df = codes.toDF("doc_id", "code")
    val probes = codes.take(6).toDF("q_id", "qc")
    val got = Similarity.hammingNeighbors(df, "doc_id", "code",
        probes, "q_id", "qc", k = 4, maxHam = 3)
      .as[(Long, Int, Long, Long)].collect().toSet
    val expect = codes.take(6).flatMap { case (q, qc) =>
      codes.filter(_._1 != q)
        .map { case (id, c) => (id, java.lang.Long.bitCount(qc ^ c).toLong) }
        .filter(_._2 <= 3)
        .sortBy { case (id, h) => (h, id) }
        .take(4).zipWithIndex
        .map { case ((id, h), r) => (q, r + 1, id, h) }
    }.toSet
    got shouldBe expect
    got.nonEmpty shouldBe true // at 200 random 16-bit codes some pairs land <= 3
  }

  test("substringDupStats matches a brute-force window recount") {
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 30).map(i => s"w$i")
    // random docs; every third doc appends a 10-token span copied from
    // an earlier doc, planting cross-doc duplicated substrings
    val texts = scala.collection.mutable.ArrayBuffer[String]()
    (0 until 30).foreach { i =>
      val base = Seq.fill(12 + rnd.nextInt(15))(vocab(rnd.nextInt(30)))
      val t = if (i % 3 == 2 && texts.nonEmpty) {
        val src = texts(rnd.nextInt(texts.size)).split(" ")
        (base ++ src.slice(0, math.min(10, src.length))).mkString(" ")
      } else base.mkString(" ")
      texts += t
    }
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toSeq
    val w = 4
    val got = Dedup.substringDupStats(docs.toDF("doc_id", "text"),
        "text", "doc_id", w)
      .as[(Long, Long, Long, Long)].collect().toSet
    val wins = docs.map { case (id, t) =>
      val a = t.split(" ")
      id -> (0 to a.length - w).map(p => a.slice(p, p + w).mkString(" "))
    }.toMap
    val docsPerWin = wins.toSeq
      .flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
    val expect = wins.flatMap { case (id, ws) =>
      val dupPos = ws.zipWithIndex
        .filter { case (x, _) => docsPerWin(x) >= 2 }.map(_._2)
      if (dupPos.isEmpty) None
      else {
        var best = 1; var cur = 1
        dupPos.sorted.sliding(2).foreach {
          case Seq(a, b) =>
            if (b == a + 1) { cur += 1; best = math.max(best, cur) }
            else cur = 1
          case _ => ()
        }
        Some((id, ws.size.toLong, dupPos.size.toLong, (best + w - 1).toLong))
      }
    }.toSet
    got shouldBe expect
    expect.size should be > 5 // the planted spans must actually surface
  }

  test("boilerplateStats matches a brute-force recount on a seeded random corpus") {
    // seeded corpus: 30 docs, 8-60 tokens each; a third open with the
    // same 8-token boilerplate header (chunk-aligned by construction)
    val rnd = new scala.util.Random(42)
    val vocab = (0 until 25).map(i => s"w$i")
    val boiler = "hdr0 hdr1 hdr2 hdr3 hdr4 hdr5 hdr6 hdr7"
    val docs = (1 to 30).map { i =>
      val body = Seq.fill(8 + rnd.nextInt(53))(vocab(rnd.nextInt(25)))
      val text = if (i % 3 == 0) (boiler +: body).mkString(" ")
        else body.mkString(" ")
      (i.toLong, text)
    }
    val got = Dedup.boilerplateStats(docs.toDF("doc_id", "text"),
        "text", "doc_id", 8, 2)
      .select("doc_id", "n_passages", "n_boiler", "boiler_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map { case (id, np, nb, f) => id -> ((np, nb, f)) }.toMap
    // brute force with the same fixed-window chunking
    val chunksOf = docs.map { case (id, t) =>
      id -> t.split(" ").grouped(8).map(_.mkString(" ")).toSeq
    }.toMap
    val df = chunksOf.values.flatten.toSeq
      .groupBy(identity).map { case (p, _) =>
        p -> chunksOf.count { case (_, cs) => cs.contains(p) }
      }
    val expect = chunksOf.map { case (id, cs) =>
      val boilerN = cs.count(c => df(c) >= 2)
      id -> ((cs.size.toLong, boilerN.toLong,
        BigDecimal(boilerN.toDouble / cs.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    got shouldBe expect
  }

  test("bigramPmi: hand-computed PMI on a tiny corpus, minCount guard") {
    // one doc "a b a b": bigrams (a,b) (b,a) (a,b) -> c12(a,b)=2, nb=3;
    // unigrams a:2 b:2, nw=4. PMI(a,b) = ln((2/3)/((2/4)*(2/4))) = ln(8/3)
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val rows = TextAnalysis.bigramPmi(docs, "text", minCount = 2, topN = 5)
      .as[(String, String, Long, Double)].collect().toSeq
    rows shouldBe Seq(("a", "b", 2L, BigDecimal(math.log(8.0 / 3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))
    // minCount filters the hapax pair (b,a)
    TextAnalysis.bigramPmi(docs, "text", minCount = 1, topN = 5)
      .count() shouldBe 2L
    // single-token and empty docs contribute no bigrams and don't throw
    val tiny = Seq((1L, "solo"), (2L, "a b")).toDF("doc_id", "text")
    TextAnalysis.bigramPmi(tiny, "text", minCount = 1, topN = 5)
      .count() shouldBe 1L
  }

  test("lengthHistogram: exact integer buckets with per-bucket extremes") {
    val docs = Seq(
      ("s1", 0L), ("s1", 199L), ("s1", 200L), ("s1", 399L), ("s2", 1000L))
      .toDF("source", "n_chars")
    val got = TextAnalysis.lengthHistogram(docs, "n_chars", "source", 200L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    got shouldBe Set(
      ("s1", 0L, 2L, 0L, 199L),
      ("s1", 200L, 2L, 200L, 399L),
      ("s2", 1000L, 1L, 1000L, 1000L))
  }

  test("labelCentroids: exact scaled-integer means, partition-order-invariant") {
    val df = Seq(
      (0, Seq(1.0f, -2.0f)),
      (0, Seq(3.0f, 4.0f)),
      (1, Seq(0.5f, 0.25f))).toDF("label", "embedding")
    val out = Similarity.labelCentroids(df, "embedding", "label")
      .orderBy("label", "pos")
      .select("label", "pos", "sum_scaled", "cnt", "centroid")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    out shouldBe Seq(
      (0, 0, 4000000L, 2L, 2.0),
      (0, 1, 2000000L, 2L, 1.0),
      (1, 0, 500000L, 1L, 0.5),
      (1, 1, 250000L, 1L, 0.25))
    // repartitioning (different partial-agg order) yields identical bits
    val re = Similarity.labelCentroids(df.repartition(7), "embedding", "label")
      .orderBy("label", "pos")
      .select("label", "pos", "sum_scaled", "cnt", "centroid")
      .as[(Int, Int, Long, Long, Double)].collect().toSeq
    re shouldBe out
  }

  test("dimensionStats: exact per-dim moments, partition-order-invariant") {
    val df = Seq(
      Seq(1.0f, -2.0f), Seq(3.0f, 4.0f), Seq(0.5f, 0.25f))
      .toDF("embedding")
    def expect(vs: Seq[Double]): (Long, Double, Double) = {
      val sv = vs.map(v => math.round(v * 1e6))
      val n = sv.size
      val s = sv.sum.toDouble; val ss = sv.map(x => x * x).sum.toDouble
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (n.toLong, r6(s / n / 1e6), r6((ss / n - (s / n) * (s / n)) / 1e12))
    }
    val out = Similarity.dimensionStats(df, "embedding")
      .orderBy("dim").as[(Long, Long, Double, Double)].collect().toSeq
    out shouldBe Seq(0, 1).map { d =>
      val (n, m, v) = expect(Seq(1.0, 3.0, 0.5, -2.0, 4.0, 0.25)
        .grouped(3).toSeq(d))
      (d.toLong, n, m, v)
    }
    val re = Similarity.dimensionStats(df.repartition(5), "embedding")
      .orderBy("dim").as[(Long, Long, Double, Double)].collect().toSeq
    re shouldBe out
  }

  test("centroidOutliers: farthest-from-centroid ranking with exact integer distances") {
    // label 0 centroid is (1.5, 0): distances 1.5, 0.5, 0.5, 1.5 —
    // the d=1.5 tie between vecs 1 and 4 breaks by vec_id.
    val df = Seq(
      (1L, 0, Seq(0.0f, 0.0f)),
      (2L, 0, Seq(1.0f, 0.0f)),
      (3L, 0, Seq(2.0f, 0.0f)),
      (4L, 0, Seq(3.0f, 0.0f)),
      (5L, 1, Seq(10.0f, 10.0f))).toDF("vec_id", "label", "embedding")
    val out = Similarity.centroidOutliers(df, "embedding", "vec_id", "label", 2)
      .orderBy("label", "rank")
      .select("label", "rank", "vec_id", "dist")
      .as[(Int, Int, Long, Double)].collect().toSeq
    out shouldBe Seq(
      (0, 1, 1L, 1.5),  // d=1.5, min vec_id wins the tie with vec 4
      (0, 2, 4L, 1.5),
      (1, 1, 5L, 0.0))  // singleton group: distance zero
  }

  test("tokenBalancedShards: round-robin deal bounds the per-shard token spread") {
    // 12 docs with token counts 12..1 onto 3 shards: ranks deal
    // 12,9,6,3 / 11,8,5,2 / 10,7,4,1 -> totals 30, 26, 22
    val docs = (1 to 12).map { i =>
      (i.toLong, (1 to (13 - i)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val out = graft.ops.Layout.tokenBalancedShards(docs, "text", "doc_id", 3)
    out.count() shouldBe 12L
    val totals = out.groupBy("shard")
      .agg(sum("n_tokens").as("t")).orderBy("shard")
      .as[(Int, Long)].collect().toSeq
    totals shouldBe Seq((0, 30L), (1, 26L), (2, 22L))
    // every doc keeps exactly one shard, and the deal is deterministic
    val again = graft.ops.Layout.tokenBalancedShards(docs, "text", "doc_id", 3)
      .orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
    again shouldBe out.orderBy("doc_id").as[(Long, Long, Int)].collect().toSeq
  }

  test("containmentVerify: short doc quoted in long doc clears containment, not Jaccard") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),                         // A: 4 tokens
      (2L, "alpha beta gamma delta x1 x2 x3 x4 x5 x6 x7 x8"), // B contains A
      (3L, "zeta eta theta iota")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.containmentVerify(pairs, docs, "text", "doc_id", 0.9)
      .as[(Long, Long, Double, Double)].collect().toSeq
    // A fully inside B: contain_ab = 1.0 while Jaccard = 4/12 = 0.33;
    // the disjoint pair never survives
    out shouldBe Seq((1L, 2L, 1.0, 0.3333))
    // same pair fails the Jaccard verify at the same threshold
    Dedup.jaccardVerify(pairs, docs, "text", "doc_id", 0.9)
      .count() shouldBe 0L
  }

  test("stopwordRatio: function-word share separates prose from keyword soup") {
    val df = Seq(
      "the cat sat on the mat and it was a good day for naps",
      "buy cheap widgets discount widgets best widgets deal").toDF("text")
    val out = df.select(TextAnalysis.stopwordRatio(col("text")).as("r"))
      .as[Double].collect().toSeq
    out.head should be > 0.3   // prose: the/and/it/a/for all hit
    out(1) shouldBe 0.0        // keyword stuffing: zero function words
  }

  test("semanticDecontaminate: max bench cosine flags near-bench vectors only") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)),   // parallel to bench vec: cos = 1
      (2L, Seq(1.0f, 1.0f)),   // 45 degrees: cos ~ 0.707107
      (3L, Seq(0.0f, 1.0f)))   // orthogonal: cos = 0
      .toDF("vec_id", "embedding")
    val bench = Seq((9L, Seq(2.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.semanticDecontaminate(
      corpus, bench, "vec_id", "embedding", 0.9)
      .orderBy("vec_id")
      .as[(Long, Double, Boolean)].collect().toSeq
    out shouldBe Seq(
      (1L, 1.0, true),
      (2L, 0.707107, false),
      (3L, 0.0, false))
  }

  test("passageDedupStats: first occurrence survives, later copies counted as dropped") {
    val boiler = (1 to 16).map(i => s"b$i").mkString(" ")
    val uniq = (1 to 16).map(i => s"u$i").mkString(" ")
    val df = Seq(
      (1L, s"$boiler $uniq"),          // chunk0 = boiler (first), chunk1 = uniq
      (2L, s"$boiler tail words only") // chunk0 = boiler (dup), chunk1 = partial
    ).toDF("doc_id", "text")
    val out = Dedup.passageDedupStats(df, "text", "doc_id", 16)
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    out shouldBe Seq(
      (1L, 2L, 2L),  // both passages globally first
      (2L, 2L, 1L))  // boiler already seen in doc 1; partial tail kept
  }

  test("normalizeText: NFC converges composed/decomposed, strips accents, collapses ws") {
    val df = Seq(
      "Café  du   Monde",          // composed é + runs of spaces
      "Café du Monde",            // decomposed e + combining acute
      "  ÈCOLE\tfrançaise\n", // case, cedilla, mixed whitespace
      "plain ascii text").toDF("text")
    val out = df.select(TextAnalysis.normalizeText(col("text")).as("t"))
      .as[String].collect().toSeq
    out shouldBe Seq(
      "cafe du monde",
      "cafe du monde", // decomposed input converges to the same bytes
      "ecole francaise",
      "plain ascii text")
    // the ASCII fast path returns the input buffer untouched
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = UTF8String.fromString("already ascii")
    graft.functions.NfcNormalize.compute(ascii) should be theSameInstanceAs ascii
  }

  test("redactPii scrubs emails, phones, and digit runs; order protects emails") {
    val df = Seq(
      "contact bob.smith+x@corp.example.com or +1 (555) 123-4567",
      "ssn 123456789 pin 1234 ok 123",     // ≥4-digit runs only
      "no pii here at all").toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text")).as("t"))
      .as[String].collect().toSeq
    out shouldBe Seq(
      "contact <PII> or <PII>",
      "ssn <PII> pin <PII> ok 123",
      "no pii here at all")
  }

  test("chunk: boundaries — overlap honored, no token lost, short docs kept") {
    val docs = Seq(
      (1L, (1 to 30).map(i => s"w$i").mkString(" ")), // 30 toks: chunks at 0,12,24
      (2L, (1 to 16).map(i => s"w$i").mkString(" ")), // exactly one chunk
      (3L, (1 to 20).map(i => s"w$i").mkString(" ")), // trailing chunk holds 4 new toks
      (4L, "a b"),                                    // shorter than overlap: kept whole
      (5L, (1 to 17).map(i => s"w$i").mkString(" "))) // tail = 1 new tok -> chunk at 12
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "text", "doc_id", chunkTokens = 16, overlap = 4)
      .select("doc_id", "chunk_id", "start_tok", "n_toks")
      .as[(Long, Long, Long, Long)].collect().toSet
    out shouldBe Set(
      (1L, 0L, 0L, 16L), (1L, 1L, 12L, 16L), (1L, 2L, 24L, 6L),
      (2L, 0L, 0L, 16L), // exactly chunkTokens: NO empty tail chunk
      (3L, 0L, 0L, 16L), (3L, 1L, 12L, 8L), // w17-w20 would be lost otherwise
      (4L, 0L, 0L, 2L),
      (5L, 0L, 0L, 16L), (5L, 1L, 12L, 5L))
    // reconstructed text matches the slice
    val texts = TextAnalysis.chunk(docs, "text", "doc_id", 16, 4)
      .filter(col("doc_id") === 1L && col("chunk_id") === 2L)
      .select("chunk_text").as[String].head()
    texts shouldBe (25 to 30).map(i => s"w$i").mkString(" ")
  }

  test("decontaminate shuffle path (broadcastBench=false) equals broadcast path") {
    val train = Seq((1L, "alpha beta gamma delta"),
      (2L, "beta gamma delta epsilon"), (3L, "zeta eta theta iota"))
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bc = Dedup.decontaminate(train, bench, "text", "doc_id", 3)
      .as[(Long, Long)].collect().toMap
    val sh = Dedup.decontaminate(train, bench, "text", "doc_id", 3,
        broadcastBench = false)
      .as[(Long, Long)].collect().toMap
    sh shouldBe bc
    bc shouldBe Map(1L -> 2L, 2L -> 1L)
  }

  test("editDistanceVerify: classic distances kept, over-threshold pairs cut") {
    val docs = Seq((1L, "kitten"), (2L, "sitting"), (3L, "kitten"),
      (4L, "completely unrelated string")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.editDistanceVerify(pairs, docs, "text", "doc_id", maxDist = 5)
      .as[(Long, Long, Long)].collect().toSet
    out shouldBe Set((1L, 2L, 3L), (1L, 3L, 0L)) // kitten->sitting = 3 edits
  }

  test("incrementalExactDedup: fresh per batch, idempotent on replay") {
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("content_key", StringType))))
    val b1 = Seq((1L, "aaa"), (2L, "aaa"), (3L, "bbb")).toDF("doc_id", "text")
    val (f1, s1) = Dedup.incrementalExactDedup(b1, empty, "text", "doc_id")
    f1.select("doc_id").as[Long].collect().sorted.toSeq shouldBe Seq(1L, 3L)
    // batch 2: one repeat of history, one in-batch dup, one new
    val b2 = Seq((4L, "bbb"), (5L, "ccc"), (6L, "ccc")).toDF("doc_id", "text")
    val (f2, s2) = Dedup.incrementalExactDedup(b2, s1, "text", "doc_id")
    f2.select("doc_id").as[Long].collect().sorted.toSeq shouldBe Seq(5L)
    s2.count() shouldBe 3L // aaa, bbb, ccc
    // replay of batch 2 is a no-op: at-least-once upstream is safe
    val (f3, s3) = Dedup.incrementalExactDedup(b2, s2, "text", "doc_id")
    f3.count() shouldBe 0L
    s3.count() shouldBe 3L
  }

  test("decontaminate counts distinct shared n-grams vs the bench set only") {
    val train = Seq(
      (1L, "alpha beta gamma delta"),      // shares "alpha beta gamma" + "beta gamma delta"
      (2L, "beta gamma delta epsilon"),    // shares "beta gamma delta"
      (3L, "zeta eta theta iota"),         // no overlap
      (4L, "alpha beta gamma alpha beta gamma")) // repeated gram counted ONCE
      .toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val hits = Dedup.decontaminate(train, bench, "text", "doc_id", n = 3)
      .as[(Long, Long)].collect().toMap
    hits shouldBe Map(1L -> 2L, 2L -> 1L, 4L -> 1L)
  }

  test("exactHeavyHitters matches the brute-force groupBy on a skewed corpus") {
    // zipf-ish: item i drawn with weight ~ 1/(i+1); tiny summaryK so
    // the sketch is under real pressure and pass-2 must do the work
    val rnd = new scala.util.Random(11)
    val draws = (0 until 5000).map { _ =>
      val r = rnd.nextDouble()
      val i = math.min((1.0 / (r + 0.002) - 1).toInt, 999)
      s"item$i"
    }
    val df = draws.toDF("w")
    // distinct items (several hundred) exceed summaryK, so the sketch
    // actually evicts; threshold 50 clears the N/(k+1)=19 bound
    val thresholdOf: Long => Long = n => math.max(20L, n / 100)
    val got = Freq.exactHeavyHitters(df, "w", summaryK = 256)(thresholdOf)
      .as[(String, Long)].collect().toSet
    val n = draws.size.toLong
    val expect = draws.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= thresholdOf(n)).toSet
    got shouldBe expect
    got.size should be > 3 // the skewed head must actually surface
  }

  test("exactHeavyHitters refuses thresholds below the Misra-Gries bound") {
    val df = (0 until 1000).map(i => s"x$i").toDF("w")
    // k=9 -> bound N/(k+1) = 100; a threshold of 50 loses completeness
    val ex = intercept[IllegalArgumentException] {
      Freq.exactHeavyHitters(df, "w", summaryK = 9)(_ => 50L)
    }
    ex.getMessage should include("Misra-Gries bound")
  }

  test("linearArgmax scores match manual dot products; ties pick the lowest class") {
    val w = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(1.0, 0.0)) // class 2 duplicates class 0
    val b = Seq(0.0, 0.0, 0.0)
    val vecs = Seq((1L, Seq(3.0f, 1.0f)), (2L, Seq(1.0f, 5.0f)))
      .toDF("id", "v")
    val r = Similarity.linearArgmax(col("v"), w, b)
    val got = vecs.select(col("id"), r.getField("pred").as("pred"),
        r.getField("score").as("score"))
      .as[(Long, Int, Double)].collect().toSet
    // id 1: s0 = 3, s1 = 1, s2 = 3 -> tie 0 vs 2 -> lowest class 0
    // id 2: s1 = 5 wins outright
    got shouldBe Set((1L, 0, 3.0), (2L, 1, 5.0))
  }

  test("sortedNeighborhoodPairs equals the rank-window brute force, any n and window") {
    val rnd = new scala.util.Random(23)
    for (n <- Seq(1, 7, 40); w <- Seq(1, 3)) {
      val rows = (0 until n).map(i => (i.toLong, f"k${rnd.nextInt(30)}%03d"))
      val df = rows.toDF("id", "key")
      val got = Dedup.sortedNeighborhoodPairs(df, "id", "key", w)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val order = rows.sortBy { case (id, k) => (k, id) }.map(_._1)
      val expect = (for {
        i <- order.indices; j <- (i + 1) until math.min(i + w + 1, order.size)
      } yield (order(i), order(j))).toSet
      withClue(s"n=$n w=$w: ") { got shouldBe expect }
    }
  }

  test("powerIterationPC1 matches a driver-side reference, finds the dominant " +
      "direction, and is partition-order-invariant") {
    // 8 vectors: strong mass along dim 0, a little along dim 2
    val rows = Seq(
      Seq(4.0f, 0.5f, 0.0f, 0.0f), Seq(3.5f, -0.5f, 1.0f, 0.0f),
      Seq(4.5f, 0.0f, -1.0f, 0.5f), Seq(3.0f, 0.5f, 0.5f, -0.5f),
      Seq(-4.0f, 0.5f, 1.0f, 0.0f), Seq(-3.5f, 0.0f, 0.5f, 0.5f),
      Seq(0.5f, 2.0f, 3.0f, 0.0f), Seq(0.0f, -2.0f, 2.5f, 0.5f))
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val iters = 2; val d = 4

    // sequential reference: same scaled-long recursion
    var v = Seq.fill(d)(1.0 / math.sqrt(d.toDouble))
    for (_ <- 1 to iters) {
      // HALF_UP (away from zero), the round(col, 0) rule — math.round
      // would disagree on exact negative .5 ties these fixtures can hit
      val ts = (0 until d).map { j =>
        rows.map { x =>
          val s = x.zip(v).map { case (xi, vi) => xi.toDouble * vi }.sum
          BigDecimal(x(j).toDouble * s * 1e6)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        }.sum
      }
      val nrm = math.sqrt(ts.map(t => BigInt(t) * BigInt(t)).sum.toDouble)
      v = ts.map(_.toDouble / nrm)
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = v.zipWithIndex.map { case (l, p) => (p, r6(l)) }.toSet

    val got = Similarity.powerIterationPC1(df, "embedding", d, iters)
      .as[(Int, Double)].collect().toSet
    got shouldBe expect
    // the unit vector points dominantly along dim 0
    val m = got.toMap
    math.abs(m(0)) should be > math.abs(m(1))
    math.abs(m(0)) should be > math.abs(m(3))
    math.abs(math.sqrt(m.values.map(x => x * x).sum) - 1.0) should be < 1e-5
    // partitioning must not change a single bit
    Similarity.powerIterationPC1(df.repartition(7), "embedding", d, iters)
      .as[(Int, Double)].collect().toSet shouldBe got
  }

  test("multimodal: imageDHash spreads narrow sources by id and skips the " +
      "blob shuffle when the source already has enough splits") {
    def png(seed: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9)
        img.setRGB(x, y, ((seed * 31 + y * 9 + x) * 37) & 0xffffff)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val parts = spark.sessionState.conf.numShufflePartitions
    val media = (0 until 6).map(i => (i.toLong, "image/png", png(i)))
      .toDF("id", "mime", "blob")
    // driver-local rows: one keyed exchange fills the cores (no keyless
    // round-robin — that pre-sorts every partition's blob rows)
    val narrowPlan = Multimodal.imageDHash(spark, media)
      .queryExecution.executedPlan.toString
    assert(narrowPlan.contains("Exchange hashpartitioning"), narrowPlan)
    // an already-spread source: the decode runs where the rows sit —
    // no exchange carries the blob bytes at all
    val wide = media.repartition(parts + 1).localCheckpoint(true)
    val widePlan = Multimodal.imageDHash(spark, wide)
      .queryExecution.executedPlan.toString
    assert(!widePlan.contains("Exchange"), widePlan)
    // identical hashes either way
    val a = Multimodal.imageDHash(spark, media).collect()
      .map(h => h.id -> h.dhash).toMap
    val b = Multimodal.imageDHash(spark, wide).collect()
      .map(h => h.id -> h.dhash).toMap
    b shouldBe a
    a.values.foreach(_.isDefined shouldBe true)
  }
}
