package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AnnIndexSpec extends SparkSpec {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("index topK equals the from-scratch multi-probe operator, raw and centered") {
    for (centered <- Seq(false, true)) {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-annidx").toString
      AnnIndex.write(emb, planes = 4, path = s"$dir/idx", centered = centered)
      val fromIndex = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
        .collect().toSet
      val fromScratch = Similarity
        .topKNeighborsLshMultiProbe(emb, qs, k = 5, planes = 4,
          centered = centered)
        .collect().toSet
      withClue(s"centered=$centered: ") { fromIndex shouldBe fromScratch }
    }
  }

  test("single-probe index read is a subset ranked consistently") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 4, path = s"$dir/idx")
    val single = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5,
      multiProbe = false)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cs"))
    val multi = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
      .select(col("q_id"), col("rank"), col("cos_sim").as("cm"))
    // at each (q_id, rank) the multi-probe cosine can only be >= —
    // candidate supersets cannot rank worse
    single.join(multi, Seq("q_id", "rank"))
      .filter(col("cm") < col("cs")).count() shouldBe 0L
    multi.count() should be >= single.count()
  }

  test("probe read PRUNES partitions: the scan carries a bucket PartitionFilter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 4, path = s"$dir/idx")
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.planes shouldBe 4
    meta.centered shouldBe false
    // the "b" prefix keeps the partition column a STRING through
    // partition-column type inference — a bare digit key reads back as
    // Integer and every bucket comparison becomes an implicit cast
    spark.read.parquet(s"$dir/idx").schema("bucket").dataType.typeName shouldBe "string"
    val topK = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5)
    // the probe set must reach the scan as a partition filter (IO
    // pruning), not as a post-scan Filter over all buckets
    topK.queryExecution.executedPlan.toString should
      include regex "PartitionFilters: \\[.*bucket"
    // the analytically-expected probe set: each query's own bucket plus
    // its 4 one-bit flips — at most 5 queries x 5 probes distinct keys
    val probeSet = emb.filter(col("vec_id") < 5)
      .select(explode(Similarity.probeBuckets(
        Similarity.bucketKey(col("embedding"), 4, meta.dims), 4)).as("b"))
      .select(concat(lit("b"), col("b")).as("b"))
      .distinct().collect().map(_.getString(0)).toSet
    probeSet.size should be <= 25
    // every bucket a returned candidate came from lies inside that set
    // (i.e. the read really was restricted to the probed partitions)
    val readBuckets = topK
      .join(spark.read.parquet(s"$dir/idx"), "vec_id")
      .select("bucket").distinct().collect().map(_.getString(0)).toSet
    readBuckets.subsetOf(probeSet) shouldBe true
  }

  test("append: half-written + half-appended index answers exactly as one-shot") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb.filter(col("vec_id") % 2 === 0), planes = 4,
      path = s"$dir/idx")
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), s"$dir/idx")
    val oneShot = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 4, path = s"$oneShot/idx")
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$oneShot/idx", qs, k = 5).collect().toSet
  }

  test("append buckets the delta with the index's persisted mean, not the grown corpus's") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    val half = emb.filter(col("vec_id") % 2 === 0)
    val delta = emb.filter(col("vec_id") % 2 =!= 0)
    AnnIndex.write(half, planes = 4, path = s"$dir/idx", centered = true)
    AnnIndex.append(delta, s"$dir/idx")
    val meta = AnnIndex.readMeta(s"$dir/idx")
    // the persisted mean is the WRITE-time (half-corpus) mean — the
    // grown corpus's mean differs, and using it would shift the planes
    meta.mu shouldBe Similarity.dimMeans(half, meta.dims)
    meta.mu should not be Similarity.dimMeans(emb, meta.dims)
    // every stored row — resident and appended — carries the bucket the
    // write-time statistics assign, so probes keep finding both
    val expected = emb.select(col("vec_id"),
      concat(lit("b"),
        Similarity.bucketKey(col("embedding"), 4, meta.dims, meta.mu))
        .as("b2"))
    spark.read.parquet(s"$dir/idx").select("vec_id", "bucket")
      .join(expected, "vec_id")
      .filter(col("bucket") =!= col("b2")).count() shouldBe 0L
  }

  test("quantized storage: candidates identical to the raw index, scores from int8 reconstruction") {
    val raw = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    val qz = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 4, path = s"$raw/idx")
    AnnIndex.write(emb, planes = 4, path = s"$qz/idx", quantized = true)
    AnnIndex.readMeta(s"$qz/idx").quantized shouldBe true
    // buckets come from the ORIGINAL floats, so the candidate sets (and
    // therefore the (q_id, vec_id) pairs considered) are identical
    val fromRaw = AnnIndex.topK(spark, s"$raw/idx", qs, k = 5)
      .select("q_id", "vec_id").collect().toSet
    val fromQz = AnnIndex.topK(spark, s"$qz/idx", qs, k = 5)
      .select("q_id", "vec_id").collect().toSet
    // int8 scoring may re-rank inside a bucket, but on this corpus the
    // top-5 survives almost intact (q203 measured 49/50) — assert a
    // conservative floor rather than exact equality
    (fromRaw intersect fromQz).size.toDouble should be >= fromRaw.size * 0.8
    // the quantized store must NOT contain the raw embedding column
    val cols = spark.read.parquet(s"$qz/idx").columns.toSet
    cols should contain allOf ("code", "qscale")
    cols should not contain "embedding"
  }

  test("each bucket is exactly one file per generation (no small-files explosion)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb.filter(col("vec_id") % 2 === 0), planes = 4,
      path = s"$dir/idx")
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), s"$dir/idx")
    val buckets = new java.io.File(s"$dir/idx").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
    buckets should not be empty
    for (b <- buckets) {
      val parts = b.listFiles().count(_.getName.endsWith(".parquet"))
      withClue(s"${b.getName}: ") { parts should be <= 2 } // one per generation
    }
  }

  test("compact restores one file per bucket and changes no answer") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb.filter(col("vec_id") % 3 === 0), planes = 4,
      path = s"$dir/idx")
    AnnIndex.append(emb.filter(col("vec_id") % 3 === 1), s"$dir/idx")
    AnnIndex.append(emb.filter(col("vec_id") % 3 === 2), s"$dir/idx")
    def maxFilesPerBucket(): Int =
      new java.io.File(s"$dir/idx").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(_.listFiles().count(_.getName.endsWith(".parquet"))).max
    maxFilesPerBucket() should be > 1 // three generations accumulated
    val before = AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet
    AnnIndex.compact(spark, s"$dir/idx")
    maxFilesPerBucket() shouldBe 1
    AnnIndex.readMeta(s"$dir/idx").planes shouldBe 4 // meta survived the swap
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe before
  }

  test("delete rewrites only the affected buckets; untouched buckets stay byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 4, path = s"$dir/idx")
    val victims = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id"), col("embedding"))
    def bucketFiles(): Map[String, Set[String]] =
      new java.io.File(s"$dir/idx").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(d => d.getName ->
          d.listFiles().filter(_.getName.endsWith(".parquet"))
            .map(f => s"${f.getName}:${f.length}").toSet).toMap
    val before = bucketFiles()
    val victimBuckets = spark.read.parquet(s"$dir/idx")
      .join(victims.select("vec_id"), "vec_id")
      .select("bucket").distinct().collect()
      .map(r => s"bucket=${r.getString(0)}").toSet
    AnnIndex.delete(spark, victims, s"$dir/idx")
    val after = bucketFiles()
    // untouched buckets: exactly the same part files, byte for byte
    for ((b, files) <- before if !victimBuckets(b))
      withClue(s"$b: ") { after(b) shouldBe files }
    // affected buckets were rewritten (or emptied away entirely)
    for (b <- victimBuckets)
      withClue(s"$b: ") { after.getOrElse(b, Set.empty) should not be before(b) }
    // and the index now answers as if the victims were never written
    val control = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb.filter(col("vec_id") % 7 =!= 3), planes = 4,
      path = s"$control/idx")
    AnnIndex.topK(spark, s"$dir/idx", qs, k = 5).collect().toSet shouldBe
      AnnIndex.topK(spark, s"$control/idx", qs, k = 5).collect().toSet
  }

  test("centered meta round-trips the exact write-time mean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    AnnIndex.write(emb, planes = 3, path = s"$dir/idx", centered = true)
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.centered shouldBe true
    meta.mu shouldBe Similarity.dimMeans(emb, meta.dims)
    // a grown corpus must NOT shift the persisted buckets: the index's
    // bucket column equals the write-time key, not a recomputed one
    val stored = spark.read.parquet(s"$dir/idx")
      .select("vec_id", "bucket")
    val recomputed = Similarity.lshBucketsCentered(emb, 3)
    stored.join(recomputed.withColumnRenamed("bucket", "b2"), "vec_id")
      .filter(col("bucket") =!= concat(lit("b"), col("b2")))
      .count() shouldBe 0L
  }
}
