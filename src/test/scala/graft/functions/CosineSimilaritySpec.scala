package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches the composed higher-order form bit-for-bit") {
    val df = Seq(
      (Array(1.0f, 2.0f, -3.0f), Array(0.5f, -1.5f, 2.0f)),
      (Array(0.1f, 0.2f, 0.3f), Array(0.1f, 0.2f, 0.3f)),
      (Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))
    ).toDF("a", "b")
      .select(Similarity.toDouble($"a").as("ad"), Similarity.toDouble($"b").as("bd"))
    val rows = df.select(
      Similarity.cosine($"ad", $"bd").as("hof"),
      CosineSimilarity($"ad", $"bd").as("native"),
      CosineSimilarity($"ad", $"bd").cast("string").as("nativeStr"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"hof=${r.getDouble(0)} native=${r.getDouble(1)}")
    }
  }

  test("consumes float arrays directly (exact widening)") {
    val df = Seq((Array(1.0f, 2.0f), Array(2.0f, 1.0f))).toDF("a", "b")
    val direct = df.select(CosineSimilarity($"a", $"b")).first().getDouble(0)
    val widened = df
      .select(Similarity.toDouble($"a").as("ad"), Similarity.toDouble($"b").as("bd"))
      .select(CosineSimilarity($"ad", $"bd")).first().getDouble(0)
    direct shouldBe widened
  }

  test("null input yields null; registered in SQL as cosine_sim") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c, " +
        "cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").first()
    r.getDouble(0) shouldBe 1.0
    r.isNullAt(1) shouldBe true
  }
}
