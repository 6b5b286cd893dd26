package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

class WinnowIndexSpec extends SparkSpec {

  private val (k, w, minShared, maxDf) = (8, 4, 3, 10)
  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  private def pairMap(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  /** Pairs touching `sidePred` from the from-scratch operator over
    * `corpus` — the independent reference every probe is held to. */
  private def fromScratch(corpus: DataFrame,
      sidePred: org.apache.spark.sql.Column): Map[(Long, Long), Long] =
    pairMap(Dedup.winnowOverlapPairs(corpus, "text", "doc_id",
        k, w, minShared, maxDf)
      .filter(sidePred))

  test("absorb+probe equals from-scratch overlap pairs touching the batch") {
    val out = Files.createTempDirectory("graft-winnow").toString
    val batch = docs.filter(col("doc_id") % 10 === 0)
    WinnowIndex.write(docs.filter(col("doc_id") % 10 =!= 0),
      "text", "doc_id", k, w, maxDf, s"$out/df", s"$out/idx", "widx_eq")
    try {
      WinnowIndex.absorb(batch, "text", "doc_id", k, w, maxDf,
        s"$out/df", s"$out/idx", "widx_eq")
      val probed = pairMap(WinnowIndex.overlapProbe(spark, "widx_eq",
        s"$out/df", batch, "text", "doc_id", k, w, minShared, maxDf))
      probed shouldBe fromScratch(docs,
        col("id_a") % 10 === 0 || col("id_b") % 10 === 0)
      probed should not be empty // seeded near-dups overlap substrings
    } finally spark.sql("DROP TABLE IF EXISTS widx_eq")
  }

  test("forget retracts the dfs exactly: survivors' pairs match the survivors-only reference") {
    val out = Files.createTempDirectory("graft-winnow").toString
    WinnowIndex.write(docs, "text", "doc_id", k, w, maxDf,
      s"$out/df", s"$out/idx", "widx_rtbf")
    try {
      WinnowIndex.forget(docs.filter(col("doc_id") % 20 === 0),
        "text", "doc_id", k, w, s"$out/df", "widx_rtbf")
      val batch = docs.filter(col("doc_id") % 20 === 10)
      val probed = pairMap(WinnowIndex.overlapProbe(spark, "widx_rtbf",
        s"$out/df", batch, "text", "doc_id", k, w, minShared, maxDf))
      probed shouldBe fromScratch(
        docs.filter(col("doc_id") % 20 =!= 0),
        col("id_a") % 20 === 10 || col("id_b") % 20 === 10)
    } finally spark.sql("DROP TABLE IF EXISTS widx_rtbf")
  }

  test("probe with a drifted k fails loudly against the stamp") {
    val out = Files.createTempDirectory("graft-winnow").toString
    WinnowIndex.write(docs, "text", "doc_id", k, w, maxDf,
      s"$out/df", s"$out/idx", "widx_drift")
    try {
      val e = intercept[IllegalArgumentException] {
        WinnowIndex.overlapProbe(spark, "widx_drift", s"$out/df",
          docs.limit(5), "text", "doc_id", k + 1, w, minShared, maxDf)
      }
      e.getMessage should include("k=8")
    } finally spark.sql("DROP TABLE IF EXISTS widx_drift")
  }
}
