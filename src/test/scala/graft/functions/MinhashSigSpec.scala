package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Dedup

class MinhashSigSpec extends SparkSpec {
  import spark.implicits._

  test("native minhash_sig matches the composed HOF form exactly") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "spark engine builds training data pipelines at scale"),
      (3L, "a b")) // < k words -> null signature
      .toDF("doc_id", "text")
    val h = 8
    val composed = df
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .select(col("doc_id"), Dedup.shinglesOfWords(col("ws"), 3).as("sh"))
      .filter(org.apache.spark.sql.functions.size(col("sh")) > 0)
      .select(col("doc_id"), Dedup.shingleHashPairs(col("sh")).as("hs"))
      .select(col("doc_id") +:
        (0 until h).map(i => Dedup.minhash(col("hs"), i).as(s"m$i")): _*)
      .collect().map(r => r.getLong(0) -> (1 to h).map(r.getLong).toSeq).toMap
    val native = df
      .select(col("doc_id"), Dedup.words(col("text")).as("ws"))
      .select(col("doc_id"),
        call_function("minhash_sig", col("ws"), lit(3), lit(h)).as("sig"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    native(1L) shouldBe composed(1L)
    native(2L) shouldBe composed(2L)
    native(3L) shouldBe null
    composed.contains(3L) shouldBe false
  }
}
