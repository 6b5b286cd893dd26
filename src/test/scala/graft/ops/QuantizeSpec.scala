package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[Similarity.maxAbsQuantize]] invariants the q112 oracle can't see:
  * reconstruction error bound (the point of the format), code range,
  * and the all-zero-vector guard. */
class QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
    (1L, Array(0.001f, 0.002f, -0.003f, 0.004f)),
    (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)), // degenerate: all-zero
    (3L, Array(100.0f, -100.0f, 50.0f, -25.0f))
  ).toDF("vec_id", "embedding")

  test("codes stay in [-127, 127] and the max-abs element maps to ±127") {
    val q = Similarity.maxAbsQuantize(vecs).collect()
    q.foreach { r => math.abs(r.getInt(2)) should be <= 127 }
    val v0 = q.filter(_.getLong(0) == 0L).sortBy(_.getInt(1)).map(_.getInt(2))
    v0 shouldBe Array(64, -127, 32, 0) // 0.5/1.0*127+0.5 floors to 64
  }

  test("all-zero vector quantizes to all-zero codes, not NaN") {
    val q = Similarity.maxAbsQuantize(vecs)
      .filter(col("vec_id") === 2L).collect()
    q.map(_.getInt(2)).toSet shouldBe Set(0)
  }

  test("dequantized reconstruction error is within one quantization step") {
    val q = Similarity.maxAbsQuantize(vecs)
    val orig = vecs.select(col("vec_id"),
      posexplode(transform(col("embedding"), _.cast("double"))))
      .toDF("vec_id", "pos", "v")
    val err = q.join(orig, Seq("vec_id", "pos"))
      .select(abs(col("code") * col("scale") / 127 - col("v")).as("e"))
      .agg(max("e")).as[Double].head()
    // half a step of scale/127, plus rounded-scale slack
    err should be < 0.5
    err should be >= 0.0
  }
}
