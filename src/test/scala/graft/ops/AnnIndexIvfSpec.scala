package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Persisted IVF index: must answer exactly as the from-scratch
  * [[Similarity.ivfTopKFixed]] pass, keep the quantizer stable under
  * appends (deltas assigned with the PERSISTED centroids), and hand
  * the probe read only the probed cell directories. */
class AnnIndexIvfSpec extends SparkSpec {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  test("persisted topKIvf equals the from-scratch fixed-centroid IVF") {
    val dir = Files.createTempDirectory("graft-annivf").toString
    AnnIndex.writeIvf(emb, nClusters = 8, path = s"$dir/idx")
    val got = AnnIndex.topKIvf(spark, s"$dir/idx", qs, k = 5, nProbe = 2)
      .collect().toSet
    val expected = Similarity.ivfTopKFixed(emb, qs, 5, 8, 2).collect().toSet
    got shouldBe expected
    got.size should be > 0
  }

  test("quantized IVF stores codes, not floats; probe answers from the reconstruction") {
    val dir = Files.createTempDirectory("graft-annivf").toString
    AnnIndex.writeIvf(emb.filter(col("vec_id") % 2 === 0), nClusters = 8,
      path = s"$dir/idx", quantized = true)
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), s"$dir/idx")
    val cols = spark.read.parquet(s"$dir/idx").columns
    cols should contain allOf ("code", "qscale")
    cols should not contain "embedding"
    AnnIndex.readMeta(s"$dir/idx").quantized shouldBe true
    // same candidates as the raw store (cells from original floats);
    // scores shift by at most the quantization error
    val raw = s"$dir/raw"
    AnnIndex.writeIvf(emb, nClusters = 8, path = raw)
    val gotQ = AnnIndex.topKIvf(spark, s"$dir/idx", qs, k = 5, nProbe = 2)
      .collect()
    val gotR = AnnIndex.topKIvf(spark, raw, qs, k = 5, nProbe = 2)
      .collect()
    gotQ.length shouldBe gotR.length
    gotQ.length should be > 0
    val rScore = gotR.map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    // every quantized hit that also ranks in the raw store scores
    // within one int8 step of its full-precision cosine
    gotQ.foreach { r =>
      rScore.get((r.getLong(0), r.getLong(2))).foreach { exact =>
        math.abs(r.getDouble(3) - exact) should be < 0.05
      }
    }
  }

  test("append assigns with the persisted quantizer: grown ≡ one-shot-with-resident-centroids") {
    // resident = even ids; its quantizer is the 8 lowest EVEN ids —
    // different from the full corpus's 8 lowest ids, so this test
    // fails if append re-derives centroids from the grown corpus
    val dir = Files.createTempDirectory("graft-annivf").toString
    val resident = emb.filter(col("vec_id") % 2 === 0)
    AnnIndex.writeIvf(resident, nClusters = 8, path = s"$dir/idx")
    val metaBefore = AnnIndex.readMeta(s"$dir/idx")
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), s"$dir/idx")
    val metaAfter = AnnIndex.readMeta(s"$dir/idx")
    metaAfter shouldBe metaBefore
    metaBefore.centIds shouldBe (0L until 16L by 2).toSeq

    // every appended row's stored cell must be the nearest RESIDENT
    // centroid (squared euclidean, ties to the lowest cluster id) —
    // recomputed independently driver-side from the persisted meta
    val cents = metaBefore.centIds.zip(metaBefore.centroids)
    val stored = spark.read.parquet(s"$dir/idx")
      .filter(col("vec_id") % 2 =!= 0)
      .select(col("vec_id"), Similarity.toDouble(col("embedding")).as("v"),
        col("cell"))
      .collect()
    stored.length should be > 0
    // same numeric form as the nearest_centroid kernel: the dot
    // identity with left-to-right folds (NearestCentroid.scala:19-23)
    def dot(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    stored.foreach { r =>
      val v = r.getSeq[Double](1)
      val best = cents.minBy { case (id, c) =>
        (dot(v, v) - 2 * dot(v, c) + dot(c, c), id)
      }._1
      r.getString(2) shouldBe s"c$best"
    }
  }

  test("probe read touches only the probed cell directories") {
    val dir = Files.createTempDirectory("graft-annivf").toString
    AnnIndex.writeIvf(emb, nClusters = 8, path = s"$dir/idx")
    val one = emb.filter(col("vec_id") === 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val res = AnnIndex.topKIvf(spark, s"$dir/idx", one, k = 5, nProbe = 2)
    val cells = res.inputFiles
      .flatMap(_.split("/").find(_.startsWith("cell=c"))).distinct
    cells.length should be <= 2
    res.collect().length should be > 0
  }

  test("meta round-trips the quantizer exactly") {
    val dir = Files.createTempDirectory("graft-annivf").toString
    AnnIndex.writeIvf(emb, nClusters = 8, path = s"$dir/idx")
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.ivf shouldBe true
    meta.banded shouldBe false
    meta.centIds shouldBe (0L until 8L).toSeq
    meta.centroids.length shouldBe 8
    meta.centroids.foreach(_.length shouldBe meta.dims)
    // bit-exact round-trip vs the corpus vectors themselves
    val want = emb.filter(col("vec_id") < 8).orderBy(col("vec_id"))
      .select(Similarity.toDouble(col("embedding")).as("c"))
      .collect().map(_.getSeq[Double](0)).toSeq
    meta.centroids shouldBe want
  }
}
