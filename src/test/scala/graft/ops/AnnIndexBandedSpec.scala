package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Banded persisted index: must hash exactly as the from-scratch
  * [[Similarity.lshBandKeys]] scheme (same per-band plane offsets) and
  * answer top-k identically to an inline banded candidate pass. */
class AnnIndexBandedSpec extends SparkSpec {

  private val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private def qs = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))

  /** Inline reference: banded candidates from lshBandKeys, scored and
    * ranked exactly as the index's contract specifies. */
  private def expected(centered: Boolean) = {
    val keys = Similarity.lshBandKeys(emb, 3, 3, centered)
    val probes = keys.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("band"), col("bucket"))
    val cand = keys.select(col("band"), col("bucket"), col("vec_id"))
      .join(probes, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val vecs = emb.select(col("vec_id"),
      Similarity.toDouble(col("embedding")).as("v"))
    val qv = emb.filter(col("vec_id") < 5).select(
      col("vec_id").as("q_id"),
      Similarity.toDouble(col("embedding")).as("q"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    cand.join(qv, "q_id").join(vecs, "vec_id")
      .withColumn("cos",
        graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
  }

  test("banded index topK equals the from-scratch banded pass, raw and centered") {
    for (centered <- Seq(false, true)) {
      val dir = Files.createTempDirectory("graft-annbanded").toString
      AnnIndex.writeBanded(emb, bands = 3, planesPerBand = 3,
        path = s"$dir/idx", centered = centered)
      val got = AnnIndex.topKBanded(spark, s"$dir/idx", qs, k = 5)
        .collect().toSet
      withClue(s"centered=$centered: ") {
        got shouldBe expected(centered).collect().toSet
      }
      got.size should be > 0
    }
  }

  test("quantized banded: candidates from original-float keys, scores from int8 reconstruction; appends encode identically") {
    val dir = Files.createTempDirectory("graft-annbanded").toString
    // grown index: half written, half appended — append must encode
    // the delta as quantized banded rows (the layout dispatch)
    AnnIndex.writeBanded(emb.filter(col("vec_id") % 2 === 0),
      bands = 3, planesPerBand = 3, path = s"$dir/idx", quantized = true)
    AnnIndex.append(emb.filter(col("vec_id") % 2 =!= 0), s"$dir/idx")
    val got = AnnIndex.topKBanded(spark, s"$dir/idx", qs, k = 5)
      .collect().toSet
    // inline reference: banded candidates from the RAW floats, scored
    // over the same max-abs int8 reconstruction
    val keys = Similarity.lshBandKeys(emb, 3, 3, centered = false)
    val probes = keys.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("band"), col("bucket"))
    val cand = keys.select(col("band"), col("bucket"), col("vec_id"))
      .join(probes, Seq("band", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id")).distinct()
    val vd = Similarity.toDouble(col("embedding"))
    val scale = greatest(array_max(transform(vd, x => abs(x))), lit(1e-12))
    val vq = transform(vd, x =>
      floor(x / scale * 127 + lit(0.5)).cast("byte").cast("double") *
        scale / 127)
    val vecs = emb.select(col("vec_id"), vq.as("v"))
    val qv = emb.filter(col("vec_id") < 5).select(
      col("vec_id").as("q_id"), vd.as("q"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val expected = cand.join(qv, "q_id").join(vecs, "vec_id")
      .withColumn("cos",
        graft.functions.CosineSimilarity(col("q"), col("v")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id"),
        round(col("cos"), 6).as("cos_sim"))
      .collect().toSet
    got shouldBe expected
    got should not be empty
    // the store really is codes, not floats
    val cols = spark.read.parquet(s"$dir/idx").columns
    cols should contain allOf ("code", "qscale")
    cols should not contain "embedding"
    AnnIndex.readMeta(s"$dir/idx").quantized shouldBe true
  }

  test("banded layout stores each vector once per band; meta round-trips") {
    val dir = Files.createTempDirectory("graft-annbanded").toString
    AnnIndex.writeBanded(emb, bands = 3, planesPerBand = 3,
      path = s"$dir/idx")
    spark.read.parquet(s"$dir/idx").count() shouldBe emb.count() * 3
    val meta = AnnIndex.readMeta(s"$dir/idx")
    meta.banded shouldBe true
    meta.bands shouldBe 3
    meta.planesPerBand shouldBe 3
    meta.planes shouldBe 9
    meta.vecIdType shouldBe "bigint"
  }
}
